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


# Hard ceiling for the single-file JSON sink: above this the run is not
# "driver-sized by construction" any more and the distributed sinks
# (write_jsonl / write_results_parquet) must be used instead.
RESULTS_JSON_MAX_ROWS = 10_000_000


def write_results_json(
    results: DataFrame, path: str, max_rows: int = RESULTS_JSON_MAX_ROWS
) -> None:
    """BEIR run format {qid: {doc_id: score}} as ONE json file
    (beir_dense_retriever.py:444-445). Collects — the run is k rows per
    query, driver-sized by construction; the ``max_rows`` ceiling
    ENFORCES that contract (raises instead of OOMing the driver). Use
    ``write_jsonl`` / ``write_results_parquet`` for bigger runs."""
    # one job, not count()+collect(): fetch at most max_rows+1 rows and
    # fail if the extra row shows up
    rows = results.limit(max_rows + 1).collect()
    if len(rows) > max_rows:
        raise ValueError(
            f"write_results_json: run exceeds max_rows={max_rows}; this "
            "sink collects to the driver — use write_jsonl or "
            "write_results_parquet for runs this size"
        )
    out: dict[str, dict[str, float]] = {}
    for r in rows:
        out.setdefault(str(r["qid"]), {})[str(r["doc_id"])] = float(r["score"])
    with open(path, "w") as fp:
        json.dump(out, fp)


def write_results_parquet(results: DataFrame, path: str, mode: str = "overwrite") -> None:
    results.write.mode(mode).parquet(path)
