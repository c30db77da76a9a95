"""Sinks matching the reference's output formats (SURVEY.md §2.1)."""

from __future__ import annotations

import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """JSONL sink (the reference's jsonlines corpus/queries writers)."""
    df.write.mode(mode).json(path)


def write_qrels_tsv(qrels: DataFrame, path: str, mode: str = "overwrite") -> None:
    """BEIR qrels TSV: header 'query-id\tcorpus-id\tscore'
    (crossencoder_bioasq_bm25.ipynb cell 5)."""
    (
        qrels.select(
            F.col("qid").alias("query-id"),
            F.col("doc_id").alias("corpus-id"),
            F.col("relevance").alias("score"),
        )
        .write.mode(mode)
        .option("sep", "\t")
        .option("header", "true")
        .csv(path)
    )


def write_results_json(results: DataFrame, path: str) -> None:
    """BEIR run format {qid: {doc_id: score}} as ONE json file
    (beir_dense_retriever.py:444-445). Collects — the run is k rows per
    query, driver-sized by construction; use ``write_jsonl`` for runs
    that aren't."""
    out: dict[str, dict[str, float]] = {}
    for r in results.collect():
        out.setdefault(str(r["qid"]), {})[str(r["doc_id"])] = float(r["score"])
    with open(path, "w") as fp:
        json.dump(out, fp)


def write_results_parquet(results: DataFrame, path: str, mode: str = "overwrite") -> None:
    results.write.mode(mode).parquet(path)
