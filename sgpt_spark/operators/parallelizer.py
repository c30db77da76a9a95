"""Batched row-UDF application with the reference's error-handling
modes — the Spark re-expression of DataFrameParallelizer
(/root/reference/biencoder/beir/parallelizer/parallelizer.py:71-311).

The reference fans a per-row function over a pandas DataFrame with a
thread pool and two error policies (parallelizer.py:32-37,174-228):

- FAIL: first exception aborts the run;
- LOG:  failed rows keep flowing, with ``error_message`` / ``error_type``
  columns appended instead of output values.

Spark already provides the fan-out (task parallelism + Arrow batches);
this module adds the LOG-mode contract, which matters at 100 TB ingest:
one malformed document must not kill a 10^6-task job, and the failures
must land in the OUTPUT TABLE (filterable, countable) rather than in
executor logs.

Shape: ``fn`` maps an input pandas batch to a same-length, same-order
output batch (1:1 row contract). In LOG mode a failing batch is retried
row by row so only the genuinely bad rows carry errors.
"""

from __future__ import annotations

from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame

ERROR_COLUMNS = ("error_message", "error_type")

BatchFn = Callable[[pd.DataFrame], pd.DataFrame]


def apply_batched(
    df: DataFrame,
    fn: BatchFn,
    output_schema: str,
    error_mode: str = "fail",
) -> DataFrame:
    """Apply ``fn`` over Arrow batches of ``df`` -> DataFrame with
    ``output_schema`` (+ ``error_message``/``error_type`` columns in LOG
    mode; both NULL for clean rows).

    ``error_mode``: 'fail' (reference FAIL: exception fails the task,
    Spark's native behavior) or 'log' (reference LOG: per-row error
    columns, job completes).
    """
    if error_mode not in ("fail", "log"):
        raise ValueError(f"unknown error_mode {error_mode!r}: use fail|log")
    # column names via Spark's DDL parser (naive comma-splitting breaks
    # on parameterized/nested types like decimal(10,2) or map<...>)
    from pyspark.sql.types import _parse_datatype_string

    out_cols = list(_parse_datatype_string(output_schema).fieldNames())

    if error_mode == "fail":

        def run_fail(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                if len(pdf):
                    yield fn(pdf)[out_cols]

        return df.mapInPandas(run_fail, schema=output_schema)

    log_schema = f"{output_schema}, error_message string, error_type string"

    def run_log(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            try:
                out = fn(pdf)[out_cols].copy()
                out["error_message"] = None
                out["error_type"] = None
                yield out
            except Exception:
                # isolate the bad rows: retry one row at a time
                # (reference LOG mode records the error per request row,
                # parallelizer.py:174-228). Accumulate as row dicts to
                # avoid pandas all-NA concat dtype churn.
                rows = []
                for i in range(len(pdf)):
                    row = pdf.iloc[i : i + 1]
                    try:
                        good = fn(row)[out_cols]
                        rec = {c: good[c].iloc[0] for c in out_cols}
                        rec["error_message"] = None
                        rec["error_type"] = None
                    except Exception as exc_row:
                        rec = {c: None for c in out_cols}
                        # passthrough columns shared with the input keep
                        # their values so failed rows stay identifiable
                        for c in out_cols:
                            if c in row.columns:
                                rec[c] = row[c].iloc[0]
                        rec["error_message"] = str(exc_row)
                        rec["error_type"] = type(exc_row).__name__
                    rows.append(rec)
                yield pd.DataFrame(rows, columns=out_cols + list(ERROR_COLUMNS))

    return df.mapInPandas(run_log, schema=log_schema)
