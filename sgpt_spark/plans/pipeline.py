"""Resumable index-build pipeline with per-partition lineage + metrics.

North-rule requirements implemented here:
- **resumable from checkpoint**: every stage writes to its own directory
  and records a manifest; a re-run skips stages whose manifest exists
  and whose params match — the distributed generalization of the
  reference's skip-if-exists guards (beir_dense_retriever.py:434-437)
  and per-chunk pickle cache (:311-323,336-342).
- **per-partition lineage + posting-count/bytes metrics**: the metrics
  stage aggregates, per index segment, posting rows, postings, encoded
  bytes, and term counts, and stores them next to the index.

On a cluster with Iceberg on the classpath the same structure maps to
snapshot-tagged Iceberg tables (stage commit = snapshot, resume =
read-latest-snapshot); this environment has no Iceberg jars (SURVEY.md
§2.10), so checkpoints are parquet directories + JSON manifests with
identical semantics.
"""

from __future__ import annotations

import json
import time
from dataclasses import asdict
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sgpt_spark.operators.indexer import (
    DEFAULT_SEGMENT_SIZE,
    IndexMeta,
    assign_doc_ids,
    build_index,
    read_index,
    release_doc_ids,
)

MANIFEST = "_MANIFEST.json"


def _manifest_path(stage_dir: str) -> Path:
    return Path(stage_dir) / MANIFEST


def stage_done(stage_dir: str, params: dict) -> bool:
    """True iff the stage completed previously WITH the same params."""
    p = _manifest_path(stage_dir)
    if not p.exists():
        return False
    try:
        recorded = json.loads(p.read_text())
    except (OSError, json.JSONDecodeError):
        return False
    return recorded.get("params") == params and recorded.get("status") == "done"


def write_manifest(stage_dir: str, stage: str, params: dict, extra: dict | None = None) -> None:
    Path(stage_dir).mkdir(parents=True, exist_ok=True)
    _manifest_path(stage_dir).write_text(
        json.dumps(
            {
                "stage": stage,
                "status": "done",
                "params": params,
                "finished_unix": time.time(),
                **(extra or {}),
            },
            indent=2,
        )
    )


def build_index_pipeline(
    spark: SparkSession,
    pages: DataFrame | str,
    out_path: str,
    segment_size: int = DEFAULT_SEGMENT_SIZE,
    num_partitions: int | None = None,
    analyzer: str = "whitespace",
    codec: str = "varint",
    positions: bool = False,
) -> tuple[DataFrame, IndexMeta]:
    """pages (DataFrame or parquet path) -> persisted index at out_path.

    Stages (each independently resumable):
      1. docs/      — doc_id assignment (url-ordered, deterministic)
      2. postings/  — compressed posting segments + meta.json
                      (``positions=True``: positional sidecar written
                      first, postings DERIVED from it — phrase-capable)
      3. metrics/   — per-segment lineage + posting-count/bytes metrics

    Returns (postings DataFrame read back from disk, IndexMeta).
    """
    if isinstance(pages, str):
        pages_src = pages
        pages_df = spark.read.parquet(pages)
    else:
        pages_src = "<inline>"
        pages_df = pages

    # -- stage 1: doc ids -------------------------------------------------
    docs_dir = f"{out_path}/docs"
    docs_params = {"src": pages_src, "order_by": "url"}
    if not stage_done(docs_dir, docs_params):
        assigned = assign_doc_ids(
            pages_df.select("url", "text"), num_partitions=num_partitions
        )
        assigned.write.mode("overwrite").parquet(f"{docs_dir}/data")
        release_doc_ids(assigned)  # stage materialized — free the cache
        n = spark.read.parquet(f"{docs_dir}/data").count()
        write_manifest(docs_dir, "docs", docs_params, {"rows": n})
    docs = spark.read.parquet(f"{docs_dir}/data")

    # -- stage 2: postings -------------------------------------------------
    from sgpt_spark.functions.analyzer import analyze_py, tokenize_py_ws

    if analyzer not in ("whitespace", "standard"):
        raise ValueError(f"unknown analyzer {analyzer!r}: whitespace|standard")
    py_tok = tokenize_py_ws if analyzer == "whitespace" else analyze_py
    index_dir = f"{out_path}/index"
    post_params = {"segment_size": segment_size, "analyzer": py_tok.__name__,
                   "codec": codec, "positions": positions}
    if not stage_done(index_dir, post_params):
        n_rows = json.loads(_manifest_path(docs_dir).read_text())["rows"]
        n_seg = max(1, -(-n_rows // segment_size))
        # one segment per partition: range-partition by doc_id so each
        # segment holds a contiguous doc range (dense deltas compress
        # well, and positional compaction merges verbatim)
        seg_docs = docs.repartitionByRange(n_seg, "doc_id")
        # single-pass build: one scan of the checkpointed docs (stats come
        # from per-segment sentinel rows, not extra corpus scans)
        if positions:
            from sgpt_spark.operators.positions import build_positional_index

            meta = build_positional_index(
                seg_docs, index_dir, segment_size=segment_size,
                py_tokenizer=py_tok, codec=codec,
            )
        else:
            meta = build_index(seg_docs, index_dir, segment_size=segment_size,
                               py_tokenizer=py_tok, codec=codec)
        write_manifest(index_dir, "postings", post_params, {"meta": asdict(meta)})
    postings, meta = read_index(spark, index_dir)

    # -- stage 3: per-partition lineage + metrics ---------------------------
    metrics_dir = f"{out_path}/metrics"
    metrics_params = {"from": "index"}
    if not stage_done(metrics_dir, metrics_params):
        seg_metrics = postings.groupBy("segment").agg(
            F.count("*").alias("term_rows"),
            F.sum("df").alias("postings"),
            F.sum(
                F.aggregate(
                    "blocks",
                    F.lit(0).cast("long"),
                    lambda acc, blk: acc
                    + F.octet_length(blk["doc_deltas"])
                    + F.octet_length(blk["tfs"])
                    + F.octet_length(blk["dls"]),
                )
            ).alias("encoded_bytes"),
            F.countDistinct("term").alias("distinct_terms"),
        )
        seg_metrics.write.mode("overwrite").parquet(f"{metrics_dir}/data")
        totals = (
            spark.read.parquet(f"{metrics_dir}/data")
            .agg(
                F.sum("postings").alias("postings"),
                F.sum("encoded_bytes").alias("encoded_bytes"),
                F.count("*").alias("segments"),
            )
            .collect()[0]
        )
        write_manifest(
            metrics_dir,
            "metrics",
            metrics_params,
            {
                "postings": int(totals["postings"]),
                "encoded_bytes": int(totals["encoded_bytes"]),
                "segments": int(totals["segments"]),
            },
        )

    return postings, meta
