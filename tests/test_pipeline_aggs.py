"""ES pipeline aggregations (derivative / cumulative_sum / moving_fn
avg / bucket_script / bucket_sort / sibling *_bucket): from-scratch
brute force over a hand-made bucket stream (NULL metrics, gaps, ties),
the end-to-end histogram -> pipeline composition on the match-set
fixture, guards, and the gate's DuckDB equality."""

from __future__ import annotations

import math

import pytest

from sgpt_spark.operators.pipeline_aggs import (
    bucket_script,
    bucket_sort,
    cumulative_sum,
    derivative,
    moving_avg,
    sibling_bucket,
)

pytestmark = pytest.mark.usefixtures("spark")

# (qid, bucket, doc_count, metric) — metric has NULLs (gap policy) and
# a tie (sibling max explodes tying keys). Two queries, interleaved
# bucket orders on input so the window ordering is doing real work.
BUCKETS = [
    (1, 300, 2, None),
    (1, 0, 3, 10),
    (1, 100, 1, 4),
    (1, 200, 0, 10),
    (2, 100, 5, 7),
    (2, 0, 2, None),
]
SCHEMA = "qid long, bucket long, doc_count long, metric long"


def _df(spark):
    return spark.createDataFrame(BUCKETS, SCHEMA)


def _rows(df, *cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_derivative_skip(spark):
    """ES gap_policy=skip: first bucket NULL; a NULL metric yields NULL;
    the next non-NULL bucket differentiates against the LAST non-NULL."""
    got = _rows(derivative(_df(spark), "metric"), "qid", "bucket", "metric_deriv")
    assert got == sorted(
        [
            (1, 0, None),      # first bucket
            (1, 100, 4 - 10),
            (1, 200, 10 - 4),
            (1, 300, None),    # NULL metric -> NULL derivative
            (2, 0, None),
            (2, 100, None),    # prev metric NULL and skip -> no prior value
        ]
    )


def test_derivative_insert_zeros(spark):
    got = _rows(
        derivative(_df(spark), "metric", gap_policy="insert_zeros"),
        "qid", "bucket", "metric_deriv",
    )
    assert got == sorted(
        [
            (1, 0, None),
            (1, 100, -6),
            (1, 200, 6),
            (1, 300, -10),    # NULL reads as 0
            (2, 0, None),
            (2, 100, 7),      # prev NULL reads as 0
        ]
    )


def test_derivative_skip_resumes_after_gap(spark):
    """After a NULL bucket, skip differentiates vs the last non-NULL."""
    df = spark.createDataFrame(
        [(1, 0, 0, 5), (1, 100, 0, None), (1, 200, 0, 9)], SCHEMA
    )
    got = _rows(derivative(df, "metric"), "bucket", "metric_deriv")
    assert got == [(0, None), (100, None), (200, 4)]


def test_cumulative_sum(spark):
    got = _rows(
        cumulative_sum(_df(spark), "metric"), "qid", "bucket", "metric_cumsum"
    )
    assert got == sorted(
        [
            (1, 0, 10),
            (1, 100, 14),
            (1, 200, 24),
            (1, 300, 24),   # NULL contributes 0, bucket still valued
            (2, 0, 0),
            (2, 100, 7),
        ]
    )


def test_moving_avg(spark):
    """Window 2 ending at the PREVIOUS bucket; partial head windows;
    empty window (first bucket) -> NULL; NULLs skipped inside a slice."""
    got = _rows(
        moving_avg(_df(spark), "metric", window=2),
        "qid", "bucket", "metric_mov2_avg",
    )
    assert got == sorted(
        [
            (1, 0, None),
            (1, 100, 10.0),          # partial window: [10]
            (1, 200, (10 + 4) / 2),
            (1, 300, (4 + 10) / 2),
            (2, 0, None),
            (2, 100, None),          # window = [NULL] -> no values
        ]
    )


def test_bucket_script_and_guards(spark):
    out = bucket_script(_df(spark), "per_doc", "metric / doc_count")
    got = _rows(out.filter("qid = 1 and bucket = 0"), "per_doc")
    assert got == [(10 / 3,)]
    from pyspark.errors import AnalysisException

    with pytest.raises(AnalysisException):
        bucket_script(_df(spark), "x", "no_such_col + 1").collect()


def test_bucket_sort_ranks_and_pages(spark):
    """Sort by metric desc: NULLs last, ties by bucket key asc; from/size
    slice re-ranks 1..size."""
    full = bucket_sort(_df(spark), sort=[("metric", "desc")])
    got = _rows(full.filter("qid = 1"), "sort_rank", "bucket")
    assert got == [(1, 0), (2, 200), (3, 100), (4, 300)]  # 10,10(tie),4,NULL
    page2 = bucket_sort(_df(spark), sort=[("metric", "desc")], size=2, from_=2)
    got2 = _rows(page2.filter("qid = 1"), "sort_rank", "bucket")
    assert got2 == [(1, 100), (2, 300)]


def test_bucket_sort_truncation_mode(spark):
    """No sort keys: from/size truncate the bucket-key order (ES)."""
    got = _rows(
        bucket_sort(_df(spark), size=2).filter("qid = 1"),
        "sort_rank", "bucket",
    )
    assert got == [(1, 0), (2, 100)]
    with pytest.raises(ValueError, match="asc|desc"):
        bucket_sort(_df(spark), sort=[("metric", "down")])


def test_sibling_buckets(spark):
    df = _df(spark)
    got_max = _rows(sibling_bucket(df, "metric", "max"), "qid", "bucket_key", "value")
    assert got_max == [(1, "0", 10), (1, "200", 10), (2, "100", 7)]  # tie explodes
    got_min = _rows(sibling_bucket(df, "metric", "min"), "qid", "bucket_key", "value")
    assert got_min == [(1, "100", 4), (2, "100", 7)]
    got_avg = _rows(sibling_bucket(df, "metric", "avg"), "qid", "value")
    assert got_avg == [(1, 8.0), (2, 7.0)]
    got_sum = _rows(sibling_bucket(df, "metric", "sum"), "qid", "value")
    assert got_sum == [(1, 24), (2, 7)]
    got_stats = _rows(
        sibling_bucket(df, "metric", "stats"),
        "qid", "bucket_count", "min_value", "max_value", "avg_value", "sum_value",
    )
    assert got_stats == [(1, 3, 4, 10, 8.0, 24), (2, 1, 7, 7, 7.0, 7)]
    with pytest.raises(ValueError, match="sibling op"):
        sibling_bucket(df, "metric", "median")
    with pytest.raises(ValueError, match="not in bucket columns"):
        derivative(df, "absent")


def test_histogram_pipeline_end_to_end(spark):
    """histogram_agg -> derivative + cumulative_sum + moving_avg over the
    aggs fixture's real match set, vs a from-scratch Python walk."""
    from tests.test_aggs import _brute_histogram, _build

    cand, dv = _build(spark)
    from sgpt_spark.operators.aggs import histogram_agg

    buckets = histogram_agg(cand, dv, "n_chars", interval=100)
    out = moving_avg(
        cumulative_sum(derivative(buckets, "doc_count"), "doc_count"),
        "doc_count", window=3,
    )
    got = _rows(
        out, "qid", "bucket", "doc_count",
        "doc_count_deriv", "doc_count_cumsum", "doc_count_mov3_avg",
    )
    # brute force: per qid, walk filled buckets in key order
    by_qid: dict = {}
    for qid, b, c in _brute_histogram(100):
        by_qid.setdefault(qid, []).append((b, c))
    want = []
    for qid, bs in by_qid.items():
        bs.sort()
        prev_counts: list[int] = []
        cum = 0
        for i, (b, c) in enumerate(bs):
            deriv = None if i == 0 else c - bs[i - 1][1]
            cum += c
            slice_ = prev_counts[-3:]
            mov = sum(slice_) / len(slice_) if slice_ else None
            want.append((qid, b, c, deriv, cum, mov))
            prev_counts.append(c)
    assert got == sorted(want) and len(got) > 3


def _duck(sf):
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    return con


def test_pipeline_gate_duckdb_equality(spark):
    """Gate row histogram_pipeline_agg: exact registry query vs exact
    registry SQL at sf0.001 (the driver repeats this at sf0.01)."""
    import __spark_entry__ as entry

    sf = "/root/testdata/sf0.001"
    got = sorted(
        (
            r["qid"], r["bucket"], r["doc_count"], r["cum_count"],
            r["deriv_count"],
            None if r["mov3_avg"] is None else round(r["mov3_avg"], 9),
        )
        for r in entry._q_histogram_pipeline(spark, sf).collect()
    )
    want = sorted(
        (q, int(b), int(c), int(cu), None if d is None else int(d),
         None if m is None else round(float(m), 9))
        for q, b, c, cu, d, m in _duck(sf)
        .execute(entry._HISTOGRAM_PIPELINE_SQL)
        .fetchall()
    )
    assert got == want and len(got) > 0


def test_range_agg_registry_twin_still_equal(spark):
    """match_range_agg ceded its window slot to histogram_pipeline_agg
    (round 5): the exact-registry DuckDB equality lives on in
    test_aggs.test_range_agg_gate_duckdb_equality — assert the entry is
    still registered (beyond the window) and runnable."""
    import __spark_entry__ as entry

    names = list(entry.queries())
    assert "match_range_agg" in names
    assert names.index("match_range_agg") >= 50
    assert names.index("histogram_pipeline_agg") < 50
    assert "histogram_pipeline_agg" in entry.oracle_sql()


def test_moving_avg_guard(spark):
    with pytest.raises(ValueError, match="window"):
        moving_avg(_df(spark), "metric", window=0)
    assert math.isnan(float("nan"))  # keep math import purposeful
