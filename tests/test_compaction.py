"""Segment compaction: merge many append-created segments down, search
results identical, sentinel stats still derive the same IndexMeta."""

from __future__ import annotations

import json
import tempfile

from pyspark.sql import functions as F

from sgpt_spark.operators.index_search import search_index
from sgpt_spark.operators.indexer import (
    assign_doc_ids,
    build_index,
    compact_index,
    read_index,
    release_doc_ids,
)
from sgpt_spark.sources.pages import generate_pages, make_page
from sgpt_spark.streaming.incremental import append_to_index


def test_compaction_preserves_results_and_stats(spark, tmp_path):
    idx = str(tmp_path / "idx")
    base = generate_pages(spark, 400, partitions=4).persist()
    assigned = assign_doc_ids(base.select("url", "text"))
    build_index(assigned.select("doc_id", "text"), idx, segment_size=100)
    release_doc_ids(assigned)

    # two appends -> many small segments
    all_pages = generate_pages(spark, 560, partitions=4).persist()
    seen = {r["url"] for r in base.select("url").collect()}
    batch2 = all_pages.filter(~F.col("url").isin(list(seen))).limit(80)
    append_to_index(spark, batch2, idx)
    seen |= {r["url"] for r in batch2.select("url").collect()}
    batch3 = all_pages.filter(~F.col("url").isin(list(seen)))
    append_to_index(spark, batch3, idx)

    postings_before, meta_before = read_index(spark, idx)
    n_seg_before = postings_before.select("segment").distinct().count()
    assert n_seg_before >= 6

    body = make_page(3)[3].split("\n")[1].split(" ")
    queries = spark.createDataFrame(
        [(1, " ".join(body[:4])), (2, " ".join(body[4:9]))], "qid long, query string"
    )
    before = sorted(
        tuple(r) for r in search_index(spark, postings_before, meta_before, queries, k=20).collect()
    )
    sent_before = (
        spark.read.parquet(f"{idx}/postings")
        .filter(F.col("term").isNull())
        .agg(F.sum("df").alias("n"), F.sum("max_tf").alias("total"), F.max("min_dl").alias("mx"))
        .collect()[0]
    )

    new_n = compact_index(spark, idx, target_segments=2)
    assert new_n == 2
    postings_after, meta_after = read_index(spark, idx)
    assert postings_after.select("segment").distinct().count() == 2
    after = sorted(
        tuple(r) for r in search_index(spark, postings_after, meta_after, queries, k=20).collect()
    )
    assert after == before and before

    # sentinel data is preserved through the merge (append-created
    # segments carry no sentinels — meta.json stays authoritative; the
    # invariant is that compaction loses nothing it was given)
    row = (
        spark.read.parquet(f"{idx}/postings")
        .filter(F.col("term").isNull())
        .agg(F.sum("df").alias("n"), F.sum("max_tf").alias("total"), F.max("min_dl").alias("mx"))
        .collect()[0]
    )
    assert (int(row["n"]), int(row["total"]), int(row["mx"])) == (
        int(sent_before["n"]), int(sent_before["total"]), int(sent_before["mx"])
    )

    # WAND strategy agrees post-compaction too (block metadata rebuilt)
    wand = sorted(
        tuple(r)
        for r in search_index(
            spark, postings_after, meta_after, queries, k=20, strategy="wand"
        ).collect()
    )
    assert wand == before


def test_append_after_compaction(spark, tmp_path):
    """Compaction renumbers segments 0..target-1; a subsequent append
    must pick fresh segment ids and the index must stay exact."""
    from sgpt_spark.operators.search import bm25_search

    idx = str(tmp_path / "idx2")
    base = generate_pages(spark, 200, partitions=4).persist()
    assigned = assign_doc_ids(base.select("url", "text"))
    build_index(assigned.select("doc_id", "text"), idx, segment_size=50)
    release_doc_ids(assigned)
    compact_index(spark, idx, target_segments=2)

    more = generate_pages(spark, 260, partitions=2)
    seen = {r["url"] for r in base.select("url").collect()}
    batch = more.filter(~F.col("url").isin(list(seen)))
    append_to_index(spark, batch, idx)

    postings, meta = read_index(spark, idx)
    segs = sorted(r["segment"] for r in postings.select("segment").distinct().collect())
    assert len(segs) == len(set(segs)) and len(segs) >= 3

    body = make_page(7)[3].split("\n")[1].split(" ")
    queries = spark.createDataFrame(
        [(1, " ".join(body[:5])), (2, " ".join(body[5:9]))], "qid long, query string"
    )
    got = sorted(tuple(r) for r in search_index(spark, postings, meta, queries, k=15).collect())

    # ground truth: exhaustive search over union docs with index ids
    union = spark.createDataFrame(
        [(r["doc_id"], r["text"]) for r in _index_docs(spark, base, batch, meta)],
        "doc_id long, text string",
    )
    want = sorted(tuple(r) for r in bm25_search(union, queries, k=15).collect())
    assert got == want and got


def _index_docs(spark, base, batch, meta):
    """Reconstruct the (doc_id, text) mapping the index used: base docs
    by url order starting at 0, appended docs by url order at the old
    next id."""
    rows = []
    base_rows = sorted(base.select("url", "text").collect(), key=lambda r: r["url"])
    for i, r in enumerate(base_rows):
        rows.append({"doc_id": i, "text": r["text"]})
    batch_rows = sorted(batch.select("url", "text").collect(), key=lambda r: r["url"])
    off = len(base_rows)
    for j, r in enumerate(batch_rows):
        rows.append({"doc_id": off + j, "text": r["text"]})
    return rows


def test_compact_rows_exceeding_one_block(spark, tmp_path):
    """Regression (round-4 bench find): posting rows with MORE than one
    block (df > 128 within a segment) arrive in the compaction merge as
    multi-element numpy arrays; the run filter must test len(), not
    truthiness. Head term df = 300 per segment -> 3 blocks per row."""
    from pyspark.sql import functions as F

    from sgpt_spark.operators.indexer import build_index, compact_index, read_index
    from sgpt_spark.operators.index_search import search_index

    rows = [(i, f"the the alpha{i % 11} unique{i}") for i in range(600)]
    docs = spark.createDataFrame(rows, "doc_id long, text string").repartition(2)
    path = str(tmp_path / "multiblock")
    build_index(docs, path)
    postings, meta = read_index(spark, path)
    nblocks = (
        postings.filter(F.col("term") == "the")
        .select(F.size("blocks").alias("nb")).agg(F.max("nb")).collect()[0][0]
    )
    assert nblocks > 1  # the regression precondition is real
    queries = spark.createDataFrame(
        [(1, "the alpha3"), (2, "the unique77")], "qid long, query string"
    )
    before = sorted(
        tuple(r) for r in search_index(spark, postings, meta, queries, k=10).collect()
    )
    assert compact_index(spark, path, 1) == 1
    postings2, meta2 = read_index(spark, path)
    after = sorted(
        tuple(r) for r in search_index(spark, postings2, meta2, queries, k=10).collect()
    )
    assert after == before and before


def test_merge_disjoint_runs_is_verbatim_append():
    """Doc-disjoint runs (the segment-partitioned case) must take the
    append fast path: full blocks are copied VERBATIM (same objects, no
    re-encode), short tail blocks are coalesced, and the decoded result
    is the exact concatenation."""
    import numpy as np

    from sgpt_spark.functions.compress import (
        decode_blocks,
        encode_blocks,
        merge_runs_streaming,
    )

    rng = np.random.default_rng(11)
    runs, parts = [], []
    base = 0
    for i in range(4):
        n = int(rng.integers(150, 400))  # 1-3 full blocks + a short tail
        ids = base + np.sort(rng.choice(10_000, n, replace=False)).astype(np.int64)
        base = int(ids[-1]) + 1
        tfs = (ids % 7 + 1).astype(np.uint64)
        dls = (ids % 50 + 10).astype(np.uint64)
        runs.append(encode_blocks(ids, tfs, dls, presorted=True))
        parts.append((ids, tfs, dls))
    merged = merge_runs_streaming(runs)
    d, tf, dl = decode_blocks(merged)
    assert np.array_equal(d, np.concatenate([p[0] for p in parts]))
    assert np.array_equal(tf, np.concatenate([p[1] for p in parts]))
    assert np.array_equal(dl, np.concatenate([p[2] for p in parts]))
    # full input blocks are reused by identity (zero re-encode), except
    # at most ONE per run boundary that coalesces with the previous
    # run's short tail
    merged_ids = {id(b) for b in merged}
    full = [blk for r in runs for blk in r if blk["count"] >= 128]
    reencoded = sum(1 for blk in full if id(blk) not in merged_ids)
    assert reencoded <= len(runs)
    # and docs stay globally ascending across the merged block list
    assert all(
        merged[j]["last_doc"] < merged[j + 1]["first_doc"]
        for j in range(len(merged) - 1)
    )


def test_merge_partition_arrow_incremental_flush(monkeypatch):
    """The partition merger must NOT require the whole partition in
    memory: with a tiny accumulation chunk it flushes complete groups
    per batch and carries the trailing group — output must equal the
    single-shot merge (groups split across batch boundaries included)."""
    import numpy as np
    import pyarrow as pa

    import sgpt_spark.operators.indexer as ix
    from sgpt_spark.functions.compress import decode_blocks, encode_blocks

    rng = np.random.default_rng(13)
    rows = []  # (term, seg, df, max_tf, min_dl, blocks) sorted by (term, seg)
    base = 0
    for t in range(12):
        for run in range(4):  # 4 doc-disjoint source rows per merged group
            n = int(rng.integers(3, 200))
            ids = base + np.sort(rng.choice(5_000, n, replace=False)).astype(np.int64)
            base = int(ids[-1]) + 1
            tfs = (ids % 7 + 1).astype(np.uint64)
            dls = (ids % 50 + 10).astype(np.uint64)
            rows.append((f"t{t:03d}", 0, n, int(tfs.max()), int(dls.min()),
                         encode_blocks(ids, tfs, dls, presorted=True)))

    def batch(rs):
        return pa.RecordBatch.from_arrays(
            [
                pa.array([r[0] for r in rs], pa.string()),
                pa.array([r[1] for r in rs], pa.int32()),
                pa.array([r[2] for r in rs], pa.int64()),
                pa.array([r[3] for r in rs], pa.int64()),
                pa.array([r[4] for r in rs], pa.int64()),
                pa.array([r[5] for r in rs]),
            ],
            names=["term", "_new_seg", "df", "max_tf", "min_dl", "blocks"],
        )

    def run_merge(batches):
        out = {}
        for rb in ix._merge_partition_arrow(iter(batches), "varint"):
            for row in rb.to_pylist():
                d, tf, dl = decode_blocks(row["blocks"])
                out[(row["term"], row["segment"])] = (
                    row["df"], row["max_tf"], row["min_dl"],
                    d.tolist(), tf.tolist(), dl.tolist(),
                )
        return out

    single = run_merge([batch(rows)])
    # tiny chunk: flush after every ~5 rows, groups straddle batches
    monkeypatch.setattr(ix, "_MERGE_CHUNK_ROWS", 5)
    split_batches = [batch(rows[i : i + 3]) for i in range(0, len(rows), 3)]
    incremental = run_merge(split_batches)
    assert incremental == single and len(single) == 12


def test_merge_partition_arrow_giant_group_spanning_batches(monkeypatch):
    """A single (term, seg) group spanning MANY accumulation chunks (a
    df~N head term) takes the constant-work-per-batch giant-group path
    (round-4 advice: no O(chunks^2) buffer re-scans) and must merge
    identically — including when the group ends mid-batch, when the
    giant is a NULL-term sentinel run, and when the partition ends
    inside the giant."""
    import numpy as np
    import pyarrow as pa

    import sgpt_spark.operators.indexer as ix
    from sgpt_spark.functions.compress import decode_blocks, encode_blocks

    rng = np.random.default_rng(7)

    def term_row(term, seg, lo, n):
        ids = lo + np.sort(rng.choice(10_000, n, replace=False)).astype(np.int64)
        tfs = (ids % 5 + 1).astype(np.uint64)
        dls = (ids % 30 + 8).astype(np.uint64)
        return (term, seg, n, int(tfs.max()), int(dls.min()),
                encode_blocks(ids, tfs, dls, presorted=True)), int(ids[-1]) + 1

    rows = []
    base = 0
    for _ in range(40):  # head term: 40 doc-disjoint runs, ONE group
        r, base = term_row("head", 0, base, int(rng.integers(5, 60)))
        rows.append(r)
    r, _ = term_row("tail", 0, 0, 20)  # group ends mid-batch before this
    rows.append(r)
    # trailing NULL-term sentinel giant (partition ends inside it)
    rows += [(None, 1, 10 + i, 100 + i, 50 - i, []) for i in range(12)]

    def batch(rs):
        return pa.RecordBatch.from_arrays(
            [
                pa.array([r[0] for r in rs], pa.string()),
                pa.array([r[1] for r in rs], pa.int32()),
                pa.array([r[2] for r in rs], pa.int64()),
                pa.array([r[3] for r in rs], pa.int64()),
                pa.array([r[4] for r in rs], pa.int64()),
                pa.array([r[5] for r in rs], batch_blocks_type()),
            ],
            names=["term", "_new_seg", "df", "max_tf", "min_dl", "blocks"],
        )

    def batch_blocks_type():
        return pa.list_(pa.struct([
            pa.field("first_doc", pa.int64()),
            pa.field("last_doc", pa.int64()),
            pa.field("count", pa.int32()),
            pa.field("max_tf", pa.int64()),
            pa.field("min_dl", pa.int64()),
            pa.field("doc_deltas", pa.binary()),
            pa.field("tfs", pa.binary()),
            pa.field("dls", pa.binary()),
        ]))

    def run_merge(batches):
        out = {}
        for rb in ix._merge_partition_arrow(iter(batches), "varint"):
            for row in rb.to_pylist():
                d, tf, dl = decode_blocks(row["blocks"])
                out[(row["term"], row["segment"])] = (
                    row["df"], row["max_tf"], row["min_dl"],
                    d.tolist(), tf.tolist(), dl.tolist(),
                )
        return out

    single = run_merge([batch(rows)])
    monkeypatch.setattr(ix, "_MERGE_CHUNK_ROWS", 4)
    for bs in (2, 3, 7):  # group boundaries land at different offsets
        split = [batch(rows[i : i + bs]) for i in range(0, len(rows), bs)]
        assert run_merge(split) == single
    assert set(single) == {("head", 0), ("tail", 0), (None, 1)}
    # the head group really merged all 40 runs
    assert single[("head", 0)][0] == sum(r[2] for r in rows if r[0] == "head")


def test_merge_partition_arrow_sentinel_only_partition():
    """A shuffle partition holding ONLY sentinel stats rows (blocks all
    empty -> EMPTY block child array) must merge without touching block
    fences — the (null-term, seg) hash keys routinely land in a
    partition with no term keys (round-4 flake root cause)."""
    import pyarrow as pa

    import sgpt_spark.operators.indexer as ix

    rb = pa.RecordBatch.from_arrays(
        [
            pa.array([None, None, None], pa.string()),
            pa.array([0, 0, 1], pa.int32()),
            pa.array([10, 20, 5], pa.int64()),
            pa.array([100, 200, 50], pa.int64()),
            pa.array([99, 199, 49], pa.int64()),
            pa.array(
                [[], [], []],
                pa.list_(pa.struct([
                    pa.field("first_doc", pa.int64()),
                    pa.field("last_doc", pa.int64()),
                    pa.field("count", pa.int32()),
                    pa.field("max_tf", pa.int64()),
                    pa.field("min_dl", pa.int64()),
                    pa.field("doc_deltas", pa.binary()),
                    pa.field("tfs", pa.binary()),
                    pa.field("dls", pa.binary()),
                ])),
            ),
        ],
        names=["term", "_new_seg", "df", "max_tf", "min_dl", "blocks"],
    )
    out = [row for b in ix._merge_partition_arrow(iter([rb]), "varint")
           for row in b.to_pylist()]
    got = {(r["term"], r["segment"]): (r["df"], r["max_tf"], r["min_dl"])
           for r in out}
    # sentinels merge additively: df/token totals sum, max doc id maxes
    assert got == {(None, 0): (30, 300, 199), (None, 1): (5, 50, 49)}
    assert all(r["blocks"] == [] for r in out)


def test_merge_runs_streaming_bounded_peak_and_identity():
    """Adversarial head term (appears in EVERY doc) merged from many
    runs into one target segment: the streaming merge must produce the
    exact sorted posting list while never holding more than
    O(n_runs x block + flush buffer) decoded postings — NOT O(df)."""
    import numpy as np

    from sgpt_spark.functions.compress import (
        BLOCK_SIZE,
        decode_blocks,
        encode_blocks,
        merge_runs_streaming,
    )

    rng = np.random.default_rng(5)
    n_runs, per_run = 16, 4000  # df = 64k postings
    all_ids = rng.permutation(n_runs * per_run)
    runs, want = [], []
    for i in range(n_runs):
        ids = np.sort(all_ids[i * per_run : (i + 1) * per_run])
        tfs = (ids % 7 + 1).astype(np.uint64)
        dls = (ids % 50 + 10).astype(np.uint64)
        runs.append(encode_blocks(ids, tfs, dls, presorted=True))
        want.append((ids, tfs, dls))
    peak: list = []
    flush = 8192
    merged = merge_runs_streaming(runs, flush_postings=flush, _peak_out=peak)
    d, tf, dl = decode_blocks(merged)
    wd = np.sort(np.concatenate([w[0] for w in want]))
    assert np.array_equal(d, wd)
    assert np.array_equal(tf, (d % 7 + 1)) and np.array_equal(dl, (d % 50 + 10))
    # full blocks except possibly the last
    assert all(b["count"] == BLOCK_SIZE for b in merged[:-1])
    # the bound: decoded working set stays O(k x block), never O(df)
    assert peak[0] <= n_runs * BLOCK_SIZE + flush
    assert peak[0] < n_runs * per_run / 4
