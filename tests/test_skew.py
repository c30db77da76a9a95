"""Term-dimension skew evidence (round-3 verdict item 5).

The build never shuffles postings at all (partition-local segments), so
the Zipf head term can't create a giant build group. The two stages
that DO key by term — compaction's (term, bucket) merge and the join
query path's probe — are exercised here with an adversarial corpus
where one term appears in EVERY document:

- compaction: the shuffle key is (term, target_bucket), so a group's
  input row count is the number of SOURCE SEGMENTS mapped to the
  bucket — bounded by ceil(n_segments / target) regardless of the
  term's df; the in-task merge is the streaming k-way merge whose peak
  is O(runs x block), tested in test_compaction.py.
- join path: with a broadcastable query-term set AQE broadcasts and no
  posting row ever shuffles (skew moot). With broadcast disabled the
  probe is a shuffle join whose head-term partition is the skew case —
  results must stay identical; AQE's skew-join splitting is the
  runtime mitigation for the millions-of-queries regime (documented in
  SURVEY §7.4(3)).
- cogroup path (round 5): its relational pre-stages (query-vocab
  left-semi prune, (term, df) weight join) key by TERM, but the
  cogroup itself keys by SEGMENT — the head term contributes one
  candidate row per segment (the segment id is the salt, same bound as
  the build), so term skew cannot concentrate a cogroup task. Forced
  shuffle joins on the pre-stages must leave results identical.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from sgpt_spark.operators.index_search import search_index, search_index_join
from sgpt_spark.operators.indexer import build_index, compact_index, read_index


def _head_term_corpus(spark, n=600, parts=12):
    """Every doc contains the head term 'the' (df == n) plus a few
    docs-specific terms."""
    rows = [
        (i, f"the the alpha{i % 17} beta{i % 5} unique{i}") for i in range(n)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string").repartition(parts)


def test_head_term_group_rows_bounded_by_segments_not_df(spark, tmp_path):
    """Per-term posting ROWS equal the segment count (the segment id is
    the deterministic salt), so both the compaction shuffle and the
    query-time scans see O(segments) rows for a df==N term — never
    O(df)."""
    path = str(tmp_path / "skew_idx")
    meta = build_index(_head_term_corpus(spark), path)
    postings, meta = read_index(spark, path)
    head = postings.filter(F.col("term") == "the")
    n_rows = head.count()
    df_total = head.agg(F.sum("df")).collect()[0][0]
    n_segs = postings.select("segment").distinct().count()
    assert df_total == meta.n_docs  # truly a 100%-df term
    assert n_rows == n_segs <= 12  # rows bounded by segments, not df

    # compaction 12 -> 3: each (term, bucket) merge group receives at
    # most ceil(12/3) source rows — bounded input regardless of df —
    # and search results are identical before/after
    queries = spark.createDataFrame(
        [(1, "the alpha3"), (2, "the unique77 beta2")], "qid long, query string"
    )
    before = sorted(
        tuple(r) for r in search_index(spark, postings, meta, queries, k=10).collect()
    )
    segs = sorted(r["segment"] for r in postings.select("segment").distinct().collect())
    target = 3
    bucket = {s: (i * target) // len(segs) for i, s in enumerate(segs)}
    per_bucket = np.bincount([b for b in bucket.values()])
    assert per_bucket.max() <= -(-len(segs) // target) + 1

    n_new = compact_index(spark, path, target)
    assert n_new == target
    postings2, meta2 = read_index(spark, path)
    head2 = postings2.filter(F.col("term") == "the")
    assert head2.count() == target  # one merged row per bucket
    assert int(head2.agg(F.sum("df")).collect()[0][0]) == meta.n_docs
    after = sorted(
        tuple(r) for r in search_index(spark, postings2, meta2, queries, k=10).collect()
    )
    assert after == before and before


def test_join_path_identical_under_total_skew_without_broadcast(spark, tmp_path):
    """Force the probe to a real shuffle join (broadcast disabled): the
    head term hashes every one of its candidate rows to one reducer —
    the adversarial case — and the result must still be identical to
    the TAAT path. (Candidate volume per (query, head-term) stays
    bounded by segments x blocks decoded, and AQE skew-join splits the
    sort-merge side at real scale.)"""
    path = str(tmp_path / "skew_join_idx")
    build_index(_head_term_corpus(spark), path)
    postings, meta = read_index(spark, path)
    queries = spark.createDataFrame(
        [(q, f"the beta{q % 5} alpha{q % 17}") for q in range(8)],
        "qid long, query string",
    )
    want = sorted(
        tuple(r) for r in search_index(spark, postings, meta, queries, k=10).collect()
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        got = sorted(
            tuple(r)
            for r in search_index_join(spark, postings, meta, queries, k=10).collect()
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert got == want and got


def test_cogroup_path_identical_under_total_skew_without_broadcast(spark, tmp_path):
    """Cogroup twin of the join-path skew test: with broadcast disabled
    the (term, df) weight join and the query-vocab left-semi prune run
    as real shuffle joins whose head-term partition is the skew case,
    but the cogroup key is SEGMENT — the df==N term still hands each
    task exactly one candidate row per segment. Results must be
    identical to the broadcast TAAT path, single- and multifield."""
    from sgpt_spark.operators.index_search import (
        search_index_cogroup,
        search_multifield_index,
        search_multifield_index_cogroup,
    )
    from sgpt_spark.operators.indexer import build_multifield_index

    path = str(tmp_path / "skew_cg_idx")
    corpus = _head_term_corpus(spark)
    build_index(corpus, path)
    postings, meta = read_index(spark, path)
    queries = spark.createDataFrame(
        [(q, f"the beta{q % 5} alpha{q % 17}") for q in range(8)],
        "qid long, query string",
    )
    want = sorted(
        tuple(r) for r in search_index(spark, postings, meta, queries, k=10).collect()
    )

    mf = str(tmp_path / "skew_cg_mf")
    docs = corpus.withColumn("title", F.concat(F.lit("the t"), F.col("doc_id") % 7))
    build_multifield_index(
        docs.select("doc_id", "title", "text"), mf, segment_size=60
    )
    mf_want = sorted(
        tuple(r)
        for r in search_multifield_index(spark, mf, queries, k=10).collect()
    )

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        got = sorted(
            tuple(r)
            for r in search_index_cogroup(
                spark, postings, meta, queries, k=10
            ).collect()
        )
        mf_got = sorted(
            tuple(r)
            for r in search_multifield_index_cogroup(
                spark, mf, queries, k=10
            ).collect()
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert got == want and got
    assert mf_got == mf_want and mf_got
