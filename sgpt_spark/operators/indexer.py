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

from sgpt_spark.functions.analyzer import tokenize_ws
from sgpt_spark.functions.bm25 import B, K1
from sgpt_spark.functions.compress import BLOCK_SIZE, encode_blocks
from sgpt_spark.operators.stats import CorpusStats, corpus_stats, doc_terms, term_freqs
from sgpt_spark.schema import POSTINGS

Tokenizer = Callable[[Column], Column]

DEFAULT_SEGMENT_SIZE = 100_000


def assign_doc_ids(
    pages: DataFrame, id_source: str = "url", num_partitions: int | None = None
) -> DataFrame:
    """Dense, deterministic int64 doc_ids by global ``id_source`` order.

    Scalable zipWithIndex-equivalent without the RDD slow path:
    range-partition + sort by url, count rows per partition (pass 1),
    broadcast cumulative offsets, then assign offset+local-index inside
    ``mapInPandas`` (pass 2). The sorted DataFrame is persisted between
    the passes so both see the identical partitioning.

    Determinism: urls are unique, global url order is total, so doc_id
    is a pure function of the input regardless of scheduling
    (SURVEY.md §7.4(4)).
    """
    if num_partitions is None:
        num_partitions = max(pages.rdd.getNumPartitions(), 1)
    ranged = (
        pages.repartitionByRange(num_partitions, id_source)
        .sortWithinPartitions(id_source)
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    sizes = {
        r["_pid"]: r["n"]
        for r in ranged.groupBy("_pid").agg(F.count("*").alias("n")).collect()
    }
    offsets = {}
    acc = 0
    for pid in sorted(sizes):
        offsets[pid] = acc
        acc += sizes[pid]
    spark = pages.sparkSession
    b_offsets = spark.sparkContext.broadcast(offsets)

    out_schema = ranged.drop("_pid").schema.add("doc_id", "long", False)

    def add_ids(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        local = 0
        for pdf in batches:
            if len(pdf) == 0:
                continue
            base = b_offsets.value[int(pdf["_pid"].iloc[0])]
            ids = np.arange(local, local + len(pdf), dtype=np.int64) + base
            local += len(pdf)
            yield pdf.drop(columns=["_pid"]).assign(doc_id=ids)

    return ranged.mapInPandas(add_ids, schema=out_schema)


@dataclass(frozen=True)
class IndexMeta:
    n_docs: int
    avgdl: float
    segment_size: int
    k1: float
    b: float
    block_size: int
    analyzer: str


def build_postings(
    docs: DataFrame,
    segment_size: int = DEFAULT_SEGMENT_SIZE,
    tokenizer: Tokenizer = tokenize_ws,
    text_col: str = "text",
    k1: float = K1,
    b: float = B,
) -> tuple[DataFrame, IndexMeta]:
    """docs(doc_id long, text) -> (POSTINGS DataFrame, IndexMeta).

    Per (term, segment) group: sort by doc_id, delta+varint encode in
    blocks, record segment df and block-max tf-norm (df-independent WAND
    bound; idf is applied at query time from the global df).
    """
    dt = doc_terms(docs, id_col="doc_id", text_col=text_col, tokenizer=tokenizer)
    stats = corpus_stats(dt)
    meta = IndexMeta(
        n_docs=stats.n_docs,
        avgdl=stats.avgdl,
        segment_size=segment_size,
        k1=k1,
        b=b,
        block_size=BLOCK_SIZE,
        analyzer="ws" if tokenizer is tokenize_ws else getattr(tokenizer, "__name__", "custom"),
    )
    tf = term_freqs(dt).withColumn(
        "segment", (F.col("doc_id") / segment_size).cast("int")
    )
    avgdl = stats.avgdl

    def encode_group(key, pdf: pd.DataFrame) -> pd.DataFrame:
        term, segment = key
        docs_a = pdf["doc_id"].to_numpy(dtype=np.int64)
        tfs_a = pdf["tf"].to_numpy(dtype=np.uint64)
        dls_a = pdf["doc_len"].to_numpy(dtype=np.uint64)
        tfn = tfs_a.astype(np.float64) / (
            tfs_a + k1 * (1.0 - b + b * dls_a.astype(np.float64) / avgdl)
        )
        blocks = encode_blocks(docs_a, tfs_a, dls_a, tfn)
        return pd.DataFrame(
            {
                "term": [term],
                "segment": [int(segment)],
                "df": [len(pdf)],
                "max_score": [float(tfn.max())],
                "blocks": [blocks],
            }
        )

    postings = tf.groupBy("term", "segment").applyInPandas(encode_group, schema=POSTINGS)
    return postings, meta


def write_index(
    postings: DataFrame,
    meta: IndexMeta,
    path: str,
    files_per_segment: int = 1,
) -> None:
    """Persist the index: postings parquet (term-sorted within files so
    parquet row-group min/max stats prune query-term scans) + meta JSON.

    On a real cluster this would target an Iceberg table
    (``writeTo(...).createOrReplace()``) for snapshot-based resumability;
    Iceberg jars are absent in this environment so the layout is plain
    parquet + a sidecar meta file (see plans/pipeline.py for the
    checkpoint protocol).
    """
    import json
    import os

    n_seg = max(1, math.ceil(meta.n_docs / meta.segment_size))
    (
        postings.repartition(max(1, n_seg * files_per_segment), "segment")
        .sortWithinPartitions("term")
        .write.mode("overwrite")
        .parquet(f"{path}/postings")
    )
    os.makedirs(path, exist_ok=True)
    with open(f"{path}/meta.json", "w") as fp:
        json.dump(meta.__dict__, fp)


def read_index(spark, path: str) -> tuple[DataFrame, IndexMeta]:
    import json

    with open(f"{path}/meta.json") as fp:
        meta = IndexMeta(**json.load(fp))
    return spark.read.parquet(f"{path}/postings"), meta
