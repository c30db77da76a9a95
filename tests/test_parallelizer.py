"""Parallelizer error modes (reference parallelizer.py:32-37,174-228),
truncation projections, and correlation stats."""

from __future__ import annotations

import math

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql.utils import PythonException

from sgpt_spark.operators.corpus import truncate_chars, truncate_tokens, truncation_stats
from sgpt_spark.operators.parallelizer import apply_batched
from sgpt_spark.operators.relational import corr_stats


def _make_inv():
    # defined inside a factory so cloudpickle serializes it by VALUE
    # (module-level test functions aren't importable on executors)
    def _inv(pdf: pd.DataFrame) -> pd.DataFrame:
        import pandas as _pd

        vals = [round(1.0 / (int(i) % 3), 6) for i in pdf["id"]]
        return _pd.DataFrame({"id": pdf["id"].to_numpy(), "inv": vals})

    return _inv


def test_log_mode_emits_error_rows(spark):
    df = spark.range(0, 12, numPartitions=2)
    out = apply_batched(df, _make_inv(), "id long, inv double", error_mode="log").collect()
    assert len(out) == 12
    by_id = {r["id"]: r for r in out}
    for i in range(12):
        r = by_id[i]
        if i % 3 == 0:
            assert r["inv"] is None
            assert r["error_type"] == "ZeroDivisionError"
            assert "division by zero" in r["error_message"]
        else:
            assert r["error_message"] is None and r["error_type"] is None
            assert math.isclose(r["inv"], round(1.0 / (i % 3), 6))


def test_fail_mode_fails_the_task(spark):
    df = spark.range(0, 6, numPartitions=1)
    with pytest.raises(PythonException):
        apply_batched(df, _make_inv(), "id long, inv double", error_mode="fail").collect()


def test_fail_mode_clean_input_passes(spark):
    df = spark.range(1, 3, numPartitions=1)
    rows = apply_batched(df, _make_inv(), "id long, inv double", error_mode="fail").collect()
    assert {r["id"]: r["inv"] for r in rows} == {1: 1.0, 2: 0.5}


def test_truncate_chars_and_tokens(spark):
    df = spark.createDataFrame(
        [("x" * 100,), ("short",), (None,)], "text string"
    )
    rows = df.select(
        truncate_chars(F.col("text"), 10).alias("t"),
        F.size(truncate_tokens(F.split(F.coalesce("text", F.lit("")), " "), 3)).alias("n"),
    ).collect()
    assert rows[0]["t"] == "x" * 10 + "..."
    assert rows[1]["t"] == "short"
    assert rows[2]["t"] == ""


def test_truncation_stats(spark):
    df = spark.createDataFrame(
        [(["a"] * 10,), (["b"] * 3,)], "terms array<string>"
    )
    row = truncation_stats(df, max_tokens=5).collect()[0]
    assert row["n_docs"] == 2 and row["n_truncated"] == 1
    assert row["tokens_before"] == 13 and row["tokens_after"] == 8
    assert math.isclose(row["truncated_frac"], 0.5)


def test_corr_stats_against_scipy_formulas(spark):
    # hand-checkable: b = 2a + noise-free -> pearson = spearman = 1
    df = spark.createDataFrame([(float(i), 2.0 * i) for i in range(20)], "a double, b double")
    row = corr_stats(df, "a", "b").collect()[0]
    assert row["pearson"] == 1.0 and row["spearman"] == 1.0
    # anti-monotone nonlinear: spearman exactly -1, pearson > -1
    df2 = spark.createDataFrame(
        [(float(i), float(-(i ** 3))) for i in range(1, 15)], "a double, b double"
    )
    row2 = corr_stats(df2, "a", "b").collect()[0]
    assert row2["spearman"] == -1.0
    assert -1.0 < row2["pearson"] < -0.8
    # ties get average ranks (scipy convention): verified vs a direct
    # computation on a small sample with duplicates
    data = [(1.0, 3.0), (1.0, 1.0), (2.0, 2.0), (3.0, 2.0), (3.0, 5.0)]
    df3 = spark.createDataFrame(data, "a double, b double")
    row3 = corr_stats(df3, "a", "b").collect()[0]

    def avg_ranks(xs):
        order = {}
        for v in sorted(set(xs)):
            idxs = [i for i, x in enumerate(xs) if x == v]
            base = sum(1 for x in xs if x < v)
            for i in idxs:
                order[i] = base + (len(idxs) + 1) / 2.0
        return [order[i] for i in range(len(xs))]

    ra = avg_ranks([a for a, _ in data])
    rb = avg_ranks([b for _, b in data])
    n = len(data)
    ma, mb = sum(ra) / n, sum(rb) / n
    cov = sum((x - ma) * (y - mb) for x, y in zip(ra, rb))
    var = math.sqrt(sum((x - ma) ** 2 for x in ra) * sum((y - mb) ** 2 for y in rb))
    assert math.isclose(row3["spearman"], round(cov / var, 6), abs_tol=1e-6)
