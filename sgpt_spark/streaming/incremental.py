"""Incremental index maintenance — append-only segment model.

The reference rebuilds its ES index from scratch on every run
(``BM25Search(initialize=True)`` deletes + reindexes,
crossencoder_beir_bm25.ipynb:304). This engine appends instead: a new
batch of pages becomes NEW segments (the Lucene segment model); corpus
stats (N, total token count -> avgdl) are updated exactly; nothing
already written is touched.

Correctness under appends is what the avgdl-independent (max_tf, min_dl)
block metadata buys (schema.POSTINGS): WAND bounds stay valid when
avgdl shifts, so an incrementally-built index returns *identical*
results to a full rebuild over the union corpus (tested).

Two entry points:
- ``append_to_index``       batch append (also the foreachBatch body)
- ``incremental_index_stream``  Structured Streaming: watch a directory
  of page files, append each micro-batch (exactly-once per batch via
  the checkpointLocation + idempotent segment ids per epoch).
"""

from __future__ import annotations

import json
from dataclasses import replace

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sgpt_spark.operators.indexer import (
    IndexMeta,
    assign_doc_ids,
    build_postings,
    read_index,
    release_doc_ids,
)
from sgpt_spark.schema import PAGES


def _max_doc_id(postings: DataFrame) -> int:
    """Largest doc id in the index: blocks are doc-sorted, so the last
    block's last_doc per row bounds the row; one tiny agg."""
    row = postings.select(
        F.max(F.element_at("blocks", -1)["last_doc"]).alias("m")
    ).collect()[0]
    return int(row["m"]) if row["m"] is not None else -1


def append_to_index(
    spark: SparkSession,
    new_pages: DataFrame,
    index_path: str,
    py_tokenizer=None,
) -> IndexMeta:
    """Append a batch of pages as new segments; returns the merged meta.

    New doc ids continue after the current max (url-ordered within the
    batch); new segment ids continue after the current max segment.
    ``py_tokenizer`` is required for custom-analyzer indexes (the
    resolver raises rather than silently whitespace-analyzing them).
    """
    postings_old, meta_old = read_index(spark, index_path)
    if getattr(meta_old, "positions", False):
        # a plain append would silently leave the positional sidecar
        # behind the postings (phrase results missing the new docs with
        # no error anywhere) — delegate to the positional append, which
        # writes positions first and DERIVES the postings from them
        from sgpt_spark.operators.positions import append_to_positional_index

        return append_to_positional_index(
            spark, new_pages, index_path, py_tokenizer=py_tokenizer
        )
    id_offset = meta_old.next_doc_id or (_max_doc_id(postings_old) + 1)
    seg_offset = _next_segment_id(spark, index_path)

    assigned = assign_doc_ids(new_pages.select("url", "text"))
    docs = assigned.withColumn("doc_id", F.col("doc_id") + id_offset)
    # appended segments MUST analyze with the index's analyzer — a
    # ws-tokenized append into a standard-analyzed index would silently
    # split the vocabulary
    from sgpt_spark.functions.analyzer import resolve_py_analyzer

    new_postings, new_meta = build_postings(
        docs,
        segment_size=meta_old.segment_size,
        py_tokenizer=py_tokenizer or resolve_py_analyzer(meta_old.analyzer),
        codec=meta_old.codec,
    )
    if new_meta.n_docs == 0:
        release_doc_ids(assigned)
        return meta_old

    merged = _commit_append(
        spark, index_path, new_postings, new_meta, meta_old, seg_offset,
        fallback_next_id=id_offset,
    )
    release_doc_ids(assigned)  # terminal action done — free the ranged cache
    return merged


def _next_segment_id(spark: SparkSession, index_path: str) -> int:
    """max(segment) + 1 over the RAW parquet, sentinel rows included: a
    build_index segment whose docs were all empty-text exists only as
    its sentinel stats row, and its id must not be reused by appends
    (read_index's term-null filter would hide it)."""
    return int(
        spark.read.parquet(f"{index_path}/postings")
        .agg(F.max("segment"))
        .collect()[0][0]
        or 0
    ) + 1


def _commit_append(
    spark: SparkSession,
    index_path: str,
    new_postings: DataFrame,
    new_meta: IndexMeta,
    meta_old: IndexMeta,
    seg_offset: int,
    fallback_next_id: int,
) -> IndexMeta:
    """Durably append already-built postings to one index: shift segment
    ids, append parquet, refresh the (term, df) side table, merge meta.

    Failure-atomicity of the (postings, termstats) pair: termstats is a
    derived cache, so it is taken OFFLINE (rename aside) BEFORE the
    postings append. A crash anywhere between here and the rebuild
    below leaves NO termstats dir -> read_term_stats falls back to
    re-aggregation over postings, which is always consistent. The old
    order (append postings, then rewrite termstats) could strand a
    silently-stale side table that inflates IDF with no error (tested:
    test_termstats_crash_window_is_safe).
    """
    import os
    import shutil

    ts_dir = f"{index_path}/termstats"
    ts_aside = f"{index_path}/termstats_prev"
    had_ts = os.path.isdir(ts_dir)
    if os.path.isdir(ts_aside):  # leftover from an earlier crash: stale
        shutil.rmtree(ts_aside)  # (postings may have advanced) — drop it
    if had_ts:
        os.rename(ts_dir, ts_aside)

    new_postings = new_postings.withColumn("segment", F.col("segment") + seg_offset)
    new_postings.write.mode("append").parquet(f"{index_path}/postings")

    # rebuild the global (term, df) side table: merge the set-aside
    # stats with the APPENDED segments' dfs only (never a full rescan)
    if had_ts:
        old_ts = spark.read.parquet(ts_aside)
        new_ts = (
            spark.read.parquet(f"{index_path}/postings")
            .filter(F.col("term").isNotNull() & (F.col("segment") >= seg_offset))
            .groupBy("term")
            .agg(F.sum("df").alias("df"))
        )
        merged_ts = (
            old_ts.unionByName(new_ts)
            .groupBy("term")
            .agg(F.sum("df").alias("df"))
            .sortWithinPartitions("term")
        )
        tmp = f"{index_path}/termstats_new"
        merged_ts.write.mode("overwrite").parquet(tmp)
        os.rename(tmp, ts_dir)  # publish the fresh table last
        shutil.rmtree(ts_aside)

    total_len = meta_old.total_len + new_meta.total_len
    n_docs = meta_old.n_docs + new_meta.n_docs
    merged = replace(
        meta_old,
        n_docs=n_docs,
        total_len=total_len,
        avgdl=(total_len / n_docs) if n_docs else 0.0,
        # build_postings already saw the offset ids, so its next_doc_id
        # is absolute — adding the offset again would leave ever-growing
        # id gaps between appends
        next_doc_id=new_meta.next_doc_id or fallback_next_id,
    )
    with open(f"{index_path}/meta.json", "w") as fp:
        json.dump(merged.__dict__, fp)
    return merged


def append_to_multifield_index(
    spark: SparkSession,
    new_pages: DataFrame,
    path: str,
    py_tokenizer=None,
    tokenizer=None,
) -> dict:
    """Append a batch to every field index of a
    ``build_multifield_index`` layout, preserving co-segmentation.

    Per-field ``append_to_index`` calls would break BOTH shared spaces:
    each field's id offset is its own max (a field that missed trailing
    empty-value docs is behind), and each would pick its own segment
    ids. Here doc ids are assigned ONCE (url order, offset = max
    next_doc_id across fields) and one shared segment offset (max
    segment across all fields + 1) applies to every field; the batch is
    range-partitioned once and every field builds from that one layout,
    exactly like the initial build. Returns {field: merged IndexMeta}.
    """
    import json as _json

    from sgpt_spark.functions.analyzer import resolve_py_analyzer
    from sgpt_spark.operators.indexer import _multifield_jvm_twin

    with open(f"{path}/fields.json") as fp:
        fields = _json.load(fp)["fields"]
    metas_old = {}
    analyzer = None
    for f in fields:
        _, m = read_index(spark, f"{path}/{f}_index")
        metas_old[f] = m
        if analyzer is None:
            analyzer = m.analyzer
        elif m.analyzer != analyzer:
            raise ValueError(
                f"field indexes disagree on analyzer: {analyzer!r} vs {m.analyzer!r} ({f})"
            )
    py_tok = py_tokenizer or resolve_py_analyzer(analyzer)
    jvm_tok = _multifield_jvm_twin(py_tok, tokenizer)

    id_offset = max(
        m.next_doc_id or (_max_doc_id(read_index(spark, f"{path}/{f}_index")[0]) + 1)
        for f, m in metas_old.items()
    )
    seg_offset = max(_next_segment_id(spark, f"{path}/{f}_index") for f in fields)

    assigned = assign_doc_ids(new_pages.select("url", *fields))
    docs = assigned.withColumn("doc_id", F.col("doc_id") + id_offset)
    seg_size = metas_old[fields[0]].segment_size
    n = docs.count()
    if n == 0:
        release_doc_ids(assigned)
        return metas_old
    n_seg = max(1, -(-n // seg_size))
    src = docs.repartitionByRange(n_seg, "doc_id")
    src.persist().count()

    merged = {}
    try:
        for f in fields:
            fd = src.select("doc_id", F.col(f).alias("text")).filter(
                F.size(jvm_tok(F.col("text"))) > 0
            )
            new_postings, new_meta = build_postings(
                fd, segment_size=seg_size, py_tokenizer=py_tok, tokenizer=jvm_tok,
                codec=metas_old[f].codec,
            )
            if new_meta.n_docs == 0:
                merged[f] = metas_old[f]
                continue
            merged[f] = _commit_append(
                spark, f"{path}/{f}_index", new_postings, new_meta,
                metas_old[f], seg_offset, fallback_next_id=id_offset + n,
            )
            # fields share one id space: next id advances past the whole
            # batch for every field, matched or not
            if merged[f].next_doc_id < id_offset + n:
                merged[f] = replace(merged[f], next_doc_id=id_offset + n)
                with open(f"{path}/{f}_index/meta.json", "w") as fp:
                    _json.dump(merged[f].__dict__, fp)
    finally:
        src.unpersist()
        release_doc_ids(assigned)
    return merged


def incremental_index_stream(
    spark: SparkSession,
    pages_dir: str,
    index_path: str,
    checkpoint_dir: str,
    trigger_available_now: bool = True,
):
    """Structured Streaming driver: every new pages file appended to
    ``pages_dir`` becomes new index segments.

    foreachBatch gives exactly-once per micro-batch (offsets tracked in
    ``checkpoint_dir``); the append itself is idempotent at the segment
    level because each batch writes fresh segment ids.
    """
    stream = spark.readStream.schema(PAGES).parquet(pages_dir)

    def handle(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        append_to_index(spark, batch_df, index_path)

    writer = stream.writeStream.foreachBatch(handle).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
