"""Inverted-index construction — the pipeline Elasticsearch hides from
the reference (BM25Search(initialize=True) bulk-index,
crossencoder/beir/crossencoder_beir_bm25.ipynb cell 10; SURVEY.md §7.2
step 3-4).

Plan shape (all shuffles explicit and bounded):

  pages ──repartitionByRange(url)──> sorted ranges ──> dense doc_id
        (two-pass zipWithIndex-equivalent, Arrow-vectorized, deterministic)
  docs ──explode(terms)──groupBy(term, doc_id)──> tf   [high-cardinality
        key: NOT skewed even for stopwords — map-side combine applies]
  tf ──groupBy(term, segment)──applyInPandas──> compressed posting blocks

**Skew handling (SURVEY.md §7.4(3))**: grouping by term alone would give
the Zipf head terms groups of size O(N). The segment id (doc_id range
bucket) acts as a deterministic salt: group sizes are bounded by
segment_size regardless of term frequency, and the per-term merge across
segments happens at query time on pre-aggregated data (the same
partial/final split as the reference's chunked top-k + heap merge,
exact_search.py:121-132). Document-partitioned segments are also what
make the index embarrassingly mergeable and resumable.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sgpt_spark.functions.analyzer import tokenize_py_ws, tokenize_ws
from sgpt_spark.functions.bm25 import B, K1
from sgpt_spark.functions.compress import BLOCK_SIZE, encode_blocks, encode_blocks_batch
from sgpt_spark.operators.stats import CorpusStats, corpus_stats, doc_terms, term_freqs
from sgpt_spark.schema import POSTINGS

Tokenizer = Callable[[Column], Column]

DEFAULT_SEGMENT_SIZE = 100_000


def assign_doc_ids(
    pages: DataFrame, id_source: str = "url", num_partitions: int | None = None
) -> DataFrame:
    """Dense, deterministic int64 doc_ids by global ``id_source`` order.

    Scalable zipWithIndex-equivalent, fully JVM-side (no Arrow round-trip
    of the corpus through Python): range-partition + sort by url, count
    rows per partition (pass 1 — the sorted frame is persisted so both
    passes see the identical partitioning), then
    ``doc_id = partition_offset + (row_number within partition - 1)``
    via a window keyed by the stable partition id plus a broadcast join
    against the tiny (pid, offset) table.

    Determinism: urls are unique, global url order is total, so doc_id
    is a pure function of the input regardless of scheduling
    (SURVEY.md §7.4(4)).
    """
    if num_partitions is None:
        num_partitions = max(pages.rdd.getNumPartitions(), 1)
    ranged = (
        pages.repartitionByRange(num_partitions, id_source)
        .sortWithinPartitions(id_source)
        .persist()
    )
    sizes = {
        r["_pid"]: r["n"]
        for r in ranged.groupBy(F.spark_partition_id().alias("_pid"))
        .agg(F.count("*").alias("n"))
        .collect()
    }
    offsets, acc = [], 0
    for pid in sorted(sizes):
        offsets.append((pid, acc))
        acc += sizes[pid]
    spark = pages.sparkSession
    offsets_df = spark.createDataFrame(offsets, "_pid int, _offset long")

    # monotonically_increasing_id() == (partition_index << 33) | local_row
    # on the *persisted* sorted partitions — decompose it to get the
    # within-partition rank with zero additional shuffle of the corpus.
    mono = F.monotonically_increasing_id()
    with_pid = ranged.withColumn("_pid", F.shiftright(mono, 33).cast("int")).withColumn(
        "_local", mono.bitwiseAND(F.lit((1 << 33) - 1))
    )
    return (
        with_pid.join(F.broadcast(offsets_df), "_pid")
        .withColumn("doc_id", (F.col("_offset") + F.col("_local")).cast("long"))
        .drop("_pid", "_local", "_offset")
    )


@dataclass(frozen=True)
class IndexMeta:
    n_docs: int
    avgdl: float
    segment_size: int
    k1: float
    b: float
    block_size: int
    analyzer: str
    # exact token total — lets incremental appends recompute avgdl
    # exactly instead of approximating (streaming/incremental.py)
    total_len: int = 0
    # first unassigned doc id (covers empty-text docs that never reach
    # the postings) — the append offset for incremental builds
    next_doc_id: int = 0


def _fused_term_freqs(docs: DataFrame, py_tokenizer, text_col: str) -> DataFrame:
    """docs -> (term, doc_id, tf, doc_len) in one Arrow-batched pass.

    Tokenize and count per document inside the batch (np.unique per doc,
    vectorized counting) — term frequencies are doc-local, so this needs
    no shuffle.
    """
    from sgpt_spark.operators.corpus import non_empty_text

    from itertools import chain

    def tok_count(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            ids = pdf["doc_id"].to_numpy(dtype=np.int64)
            toks_per_doc = [py_tokenizer(t) for t in pdf[text_col]]
            lens = np.fromiter((len(t) for t in toks_per_doc), dtype=np.int64, count=n)
            total = int(lens.sum())
            if total == 0:
                continue
            # One flat factorize over the whole batch: tokens become int
            # codes, then (doc, term) pair counting is pure int math.
            flat = np.empty(total, dtype=object)
            flat[:] = list(chain.from_iterable(toks_per_doc))
            codes, uniques = pd.factorize(flat, sort=False)
            doc_idx = np.repeat(np.arange(n, dtype=np.int64), lens)
            n_uniq = len(uniques)
            key = doc_idx * n_uniq + codes
            uk, counts = np.unique(key, return_counts=True)
            pair_doc_idx = uk // n_uniq
            yield pd.DataFrame(
                {
                    "term": np.asarray(uniques, dtype=object)[uk % n_uniq],
                    "doc_id": ids[pair_doc_idx],
                    "tf": counts.astype(np.int64),
                    "doc_len": lens[pair_doc_idx],
                }
            )

    return non_empty_text(docs, text_col).select("doc_id", text_col).mapInPandas(
        tok_count, schema="term string, doc_id long, tf long, doc_len long"
    )


def build_postings(
    docs: DataFrame,
    segment_size: int = DEFAULT_SEGMENT_SIZE,
    tokenizer: Tokenizer = tokenize_ws,
    py_tokenizer=None,
    text_col: str = "text",
    k1: float = K1,
    b: float = B,
) -> tuple[DataFrame, IndexMeta]:
    """docs(doc_id long, text) -> (POSTINGS DataFrame, IndexMeta).

    Per (term, segment) group: sort by doc_id, delta+varint encode in
    blocks, record segment df and block-max tf-norm (df-independent WAND
    bound; idf is applied at query time from the global df).

    ``py_tokenizer`` (a plain str -> list[str] function) selects the
    fused single-pass build; it defaults to the Python twin of the
    default JVM tokenizer. Passing a custom JVM ``tokenizer`` without a
    Python twin falls back to the explode + groupBy plan.
    """
    if py_tokenizer is None and tokenizer is tokenize_ws:
        py_tokenizer = tokenize_py_ws

    from sgpt_spark.operators.corpus import non_empty_text

    if py_tokenizer is not None:
        # Corpus stats from a cheap JVM-only scan (count + avg of token
        # counts stays inside whole-stage codegen).
        row = (
            non_empty_text(docs, text_col)
            .select(F.size(tokenizer(F.col(text_col))).alias("dl"))
            .agg(F.count("*").alias("n"), F.sum("dl").alias("total"))
            .collect()[0]
        )
        n_docs = int(row["n"])
        total_len = int(row["total"] or 0)
        stats = CorpusStats(n_docs=n_docs, avgdl=(total_len / n_docs) if n_docs else 0.0)
        analyzer_name = getattr(py_tokenizer, "__name__", "custom")
    else:
        dt = doc_terms(docs, id_col="doc_id", text_col=text_col, tokenizer=tokenizer).persist()
        stats = corpus_stats(dt)
        total_len = int(round(stats.avgdl * stats.n_docs))
        analyzer_name = getattr(tokenizer, "__name__", "custom")

    max_id = docs.agg(F.max("doc_id")).collect()[0][0]
    meta = IndexMeta(
        n_docs=stats.n_docs,
        avgdl=stats.avgdl,
        segment_size=segment_size,
        k1=k1,
        b=b,
        block_size=BLOCK_SIZE,
        analyzer=analyzer_name,
        total_len=total_len,
        next_doc_id=(int(max_id) + 1) if max_id is not None else 0,
    )
    avgdl = stats.avgdl

    if py_tokenizer is not None:
        # PARTITION-LOCAL SEGMENTS (the Lucene-shard pattern): each input
        # partition becomes one index segment, built entirely inside a
        # single Arrow-batched Python pass — tokenize, count, group by
        # term, delta+varint encode — with NO shuffle of the posting
        # relation at all. Every doc lives in exactly one partition, so
        # the query-side per-segment top-k + global merge stays exact.
        # Skew: the Zipf head term contributes one posting row per
        # segment, never a giant group; segment size is bounded by the
        # input partition size (maxPartitionBytes / repartition upstream).
        src = (
            non_empty_text(docs, text_col)
            .select("doc_id", text_col)
            .withColumn("_seg", F.spark_partition_id())
        )

        def build_segment(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            chunks = list(batches)
            if not chunks:
                return
            pdf = pd.concat(chunks, ignore_index=True) if len(chunks) > 1 else chunks[0]
            if len(pdf) == 0:
                return
            seg = int(pdf["_seg"].iloc[0])
            ids = pdf["doc_id"].to_numpy(dtype=np.int64)
            order = np.argsort(ids, kind="stable")  # doc order within segment
            ids = ids[order]
            texts = pdf[text_col].to_numpy(dtype=object)[order]
            toks_per_doc = [py_tokenizer(t) for t in texts]
            lens = np.fromiter((len(t) for t in toks_per_doc), dtype=np.int64, count=len(ids))
            total = int(lens.sum())
            if total == 0:
                return
            from itertools import chain

            flat = np.empty(total, dtype=object)
            flat[:] = list(chain.from_iterable(toks_per_doc))
            codes, uniques = pd.factorize(flat, sort=True)
            doc_idx = np.repeat(np.arange(len(ids), dtype=np.int64), lens)
            # (term_code, doc) pair counts; key sorted by (code, doc)
            key = codes.astype(np.int64) * len(ids) + doc_idx
            uk, counts = np.unique(key, return_counts=True)
            p_code = uk // len(ids)
            p_docidx = uk % len(ids)
            p_doc = ids[p_docidx]
            p_tf = counts.astype(np.uint64)
            p_dl = lens[p_docidx].astype(np.uint64)
            bounds = np.flatnonzero(p_code[1:] != p_code[:-1]) + 1
            starts = np.concatenate(([0], bounds))
            ends = np.concatenate((bounds, [len(uk)]))
            terms_arr = np.asarray(uniques, dtype=object)
            blocks = encode_blocks_batch(p_doc, p_tf, p_dl, starts, ends)
            yield pd.DataFrame(
                {
                    "term": terms_arr[p_code[starts]],
                    "segment": seg,
                    "df": (ends - starts).astype(np.int64),
                    "max_tf": np.maximum.reduceat(p_tf.astype(np.int64), starts),
                    "min_dl": np.minimum.reduceat(p_dl.astype(np.int64), starts),
                    "blocks": blocks,
                }
            )

        postings = src.mapInPandas(build_segment, schema=POSTINGS)
        return postings, meta

    # Fallback (custom JVM tokenizer without a Python twin): explode +
    # groupBy plan with doc_id-range segments and partition-wise encode.
    tf = term_freqs(dt).withColumn("segment", (F.col("doc_id") / segment_size).cast("int"))
    spark = docs.sparkSession
    n_part = max(int(spark.conf.get("spark.sql.shuffle.partitions", "32")), 1)

    def encode_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        chunks = list(batches)
        if not chunks:
            return
        pdf = pd.concat(chunks, ignore_index=True) if len(chunks) > 1 else chunks[0]
        if len(pdf) == 0:
            return
        terms = pdf["term"].to_numpy()
        segs = pdf["segment"].to_numpy()
        docs_a = pdf["doc_id"].to_numpy(dtype=np.int64)
        tfs_a = pdf["tf"].to_numpy(dtype=np.uint64)
        dls_a = pdf["doc_len"].to_numpy(dtype=np.uint64)
        bounds = np.flatnonzero((terms[1:] != terms[:-1]) | (segs[1:] != segs[:-1])) + 1
        starts = np.concatenate(([0], bounds))
        ends = np.concatenate((bounds, [len(pdf)]))
        blocks = encode_blocks_batch(docs_a, tfs_a, dls_a, starts, ends)
        yield pd.DataFrame(
            {
                "term": terms[starts],
                "segment": segs[starts].astype(np.int32),
                "df": (ends - starts).astype(np.int64),
                "max_tf": np.maximum.reduceat(tfs_a.astype(np.int64), starts),
                "min_dl": np.minimum.reduceat(dls_a.astype(np.int64), starts),
                "blocks": blocks,
            }
        )

    postings = (
        tf.repartition(n_part, "term", "segment")
        .sortWithinPartitions("term", "segment", "doc_id")
        .mapInPandas(encode_partition, schema=POSTINGS)
    )
    return postings, meta


def write_index(postings: DataFrame, meta: IndexMeta, path: str) -> None:
    """Persist the index: postings parquet + meta JSON.

    ``build_postings`` emits one segment per partition with terms already
    sorted (factorize(sort=True)), so no repartition/sort is needed
    before the write and parquet row-group min/max stats on ``term``
    prune query scans for free.

    On a real cluster this would target an Iceberg table
    (``writeTo(...).createOrReplace()``) for snapshot-based resumability;
    Iceberg jars are absent in this environment so the layout is plain
    parquet + a sidecar meta file (see plans/pipeline.py for the
    checkpoint protocol).
    """
    import json
    import os

    postings.write.mode("overwrite").parquet(f"{path}/postings")
    os.makedirs(path, exist_ok=True)
    with open(f"{path}/meta.json", "w") as fp:
        json.dump(meta.__dict__, fp)


def read_index(spark, path: str) -> tuple[DataFrame, IndexMeta]:
    import json

    with open(f"{path}/meta.json") as fp:
        meta = IndexMeta(**json.load(fp))
    return spark.read.parquet(f"{path}/postings"), meta
