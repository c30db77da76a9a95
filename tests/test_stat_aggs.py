"""ES weighted_avg / median_absolute_deviation / boxplot / t_test
(operators/stat_aggs.py): from-scratch python brute forces (type-7
quantiles included), NULL-handling rules, the Welch formula vs a
hand computation, and guards."""

from __future__ import annotations

import math

import pytest

from sgpt_spark.operators.stat_aggs import (
    boxplot_agg,
    median_absolute_deviation_agg,
    t_test_agg,
    weighted_avg_agg,
)

pytestmark = pytest.mark.usefixtures("spark")

# (doc_id, v, w, b)
DV = [
    (0, 10.0, 1.0, 9.0),
    (1, 20.0, 3.0, 8.0),
    (2, 40.0, None, 30.0),
    (3, None, 5.0, 2.0),
    (4, 35.0, 2.0, None),
    (5, 15.0, 1.0, 12.0),
]
CAND = [(1, 0), (1, 1), (1, 2), (1, 3), (1, 4), (2, 5), (2, 3)]


def _build(spark):
    cand = spark.createDataFrame(CAND, "qid long, doc_id long")
    dv = spark.createDataFrame(DV, "doc_id long, v double, w double, b double")
    return cand, dv


def _q7(xs, frac):
    """Type-7 linear-interpolated quantile (Spark percentile/DuckDB
    quantile_cont)."""
    xs = sorted(xs)
    if not xs:
        return None
    h = (len(xs) - 1) * frac
    lo, hi = int(math.floor(h)), int(math.ceil(h))
    return xs[lo] + (h - lo) * (xs[hi] - xs[lo])


def test_weighted_avg(spark):
    cand, dv = _build(spark)
    got = {r["qid"]: r["weighted_avg"] for r in weighted_avg_agg(
        cand, dv, "v", "w").collect()}
    # q1: docs 0,1,4 have both v and w (2 skipped: null w; 3: null v)
    want = (10 * 1 + 20 * 3 + 35 * 2) / (1 + 3 + 2)
    assert got[1] == pytest.approx(want)
    assert got[2] == pytest.approx(15.0)
    got_m = {r["qid"]: r["weighted_avg"] for r in weighted_avg_agg(
        cand, dv, "v", "w", weight_missing=1.0).collect()}
    want_m = (10 * 1 + 20 * 3 + 40 * 1 + 35 * 2) / (1 + 3 + 1 + 2)
    assert got_m[1] == pytest.approx(want_m)


def test_mad_exact(spark):
    cand, dv = _build(spark)
    got = {r["qid"]: r["mad"] for r in median_absolute_deviation_agg(
        cand, dv, "v").collect()}
    xs = [10.0, 20.0, 40.0, 35.0]  # q1's non-null values
    med = _q7(xs, 0.5)
    want = _q7([abs(x - med) for x in xs], 0.5)
    assert got[1] == pytest.approx(want)
    assert got[2] == pytest.approx(0.0)  # single value: MAD 0


def test_boxplot(spark):
    cand, dv = _build(spark)
    r = {x["qid"]: x.asDict() for x in boxplot_agg(cand, dv, "v").collect()}[1]
    xs = [10.0, 20.0, 40.0, 35.0]
    q1, q2, q3 = (_q7(xs, f) for f in (0.25, 0.5, 0.75))
    assert r["min_value"] == 10.0 and r["max_value"] == 40.0
    assert r["q1"] == pytest.approx(q1)
    assert r["q2"] == pytest.approx(q2)
    assert r["q3"] == pytest.approx(q3)
    iqr = q3 - q1
    assert r["lower"] == pytest.approx(max(q1 - 1.5 * iqr, 10.0))
    assert r["upper"] == pytest.approx(min(q3 + 1.5 * iqr, 40.0))


def test_t_test_welch(spark):
    cand, dv = _build(spark)
    r = {x["qid"]: x.asDict() for x in t_test_agg(cand, dv, "v", "b").collect()}
    a = [10.0, 20.0, 40.0, 35.0]          # q1 non-null v
    b = [9.0, 8.0, 30.0, 2.0]             # q1 non-null b
    ma, mb = sum(a) / len(a), sum(b) / len(b)
    va = sum((x - ma) ** 2 for x in a) / (len(a) - 1)
    vb = sum((x - mb) ** 2 for x in b) / (len(b) - 1)
    want = (ma - mb) / math.sqrt(va / len(a) + vb / len(b))
    r1 = r[1]
    assert r1["n_a"] == 4 and r1["n_b"] == 4
    assert r1["t_statistic"] == pytest.approx(want)
    # q2: one v value / one b value -> NULL statistic, counts reported
    r2 = r[2]
    assert r2["t_statistic"] is None and r2["n_a"] == 1


def test_guards(spark):
    cand, dv = _build(spark)
    with pytest.raises(ValueError, match="not in docvalues"):
        weighted_avg_agg(cand, dv, "v", "nope")
    with pytest.raises(ValueError, match="not in docvalues"):
        boxplot_agg(cand, dv, "nope")


# ---- matrix_stats -----------------------------------------------------------


def test_matrix_stats_brute_force(spark):
    from sgpt_spark.operators.stat_aggs import matrix_stats_agg

    cand, dv = _build(spark)
    got = {
        (r["qid"], r["field_a"], r["field_b"]): r.asDict()
        for r in matrix_stats_agg(cand, dv, ["v", "b"]).collect()
    }
    # q1 docs with BOTH v and b non-null: 0, 1, 2 -> pairs over those
    vs = [10.0, 20.0, 40.0]
    bs = [9.0, 8.0, 30.0]
    n = 3
    mv, mb = sum(vs) / n, sum(bs) / n
    cov_vb = sum(x * y for x, y in zip(vs, bs)) / n - mv * mb
    var_v = sum(x * x for x in vs) / n - mv * mv
    var_b = sum(x * x for x in bs) / n - mb * mb
    r = got[(1, "v", "b")]
    assert r["count"] == 3
    assert r["mean_a"] == pytest.approx(mv)
    assert r["mean_b"] == pytest.approx(mb)
    assert r["covariance"] == pytest.approx(cov_vb)
    assert r["correlation"] == pytest.approx(
        cov_vb / math.sqrt(var_v * var_b)
    )
    # diagonal: variance as self-covariance, correlation exactly 1
    d = got[(1, "v", "v")]
    assert d["covariance"] == pytest.approx(var_v)
    assert d["correlation"] == pytest.approx(1.0)
    # q2 has one complete row -> zero variance -> NULL correlation
    assert got[(2, "v", "b")]["correlation"] is None


def test_matrix_stats_guards(spark):
    from sgpt_spark.operators.stat_aggs import matrix_stats_agg

    cand, dv = _build(spark)
    with pytest.raises(ValueError, match=">= 2 fields"):
        matrix_stats_agg(cand, dv, ["v"])
    with pytest.raises(ValueError, match="not in docvalues"):
        matrix_stats_agg(cand, dv, ["v", "nope"])


# ---- scripted_metric (Spark-SQL script dialect) --------------------------


def test_scripted_metric_profit_idiom(spark):
    from sgpt_spark.operators.stat_aggs import scripted_metric_agg

    cand, dv = _build(spark)
    got = {
        r["qid"]: (r["total"], r["n_pos"])
        for r in scripted_metric_agg(
            cand, dv,
            {"profit": "coalesce(v, 0) - coalesce(b, 0)"},
            {"total": "sum(profit)", "n_pos": "count_if(profit > 0)"},
        ).collect()
    }
    want: dict = {}
    for q, d in CAND:
        row = dict(zip([r[0] for r in DV], DV))[d]
        p = (row[1] or 0.0) - (row[3] or 0.0)
        t, n = want.get(q, (0.0, 0))
        want[q] = (t + p, n + (1 if p > 0 else 0))
    for q, (t, n) in want.items():
        assert got[q][0] == pytest.approx(t)
        assert got[q][1] == n


def test_scripted_metric_guards(spark):
    from sgpt_spark.operators.stat_aggs import scripted_metric_agg

    cand, dv = _build(spark)
    with pytest.raises(ValueError, match="needs map_exprs"):
        scripted_metric_agg(cand, dv, {}, {"x": "sum(v)"})
    with pytest.raises(ValueError, match="shadow"):
        scripted_metric_agg(cand, dv, {"qid": "v"}, {"x": "sum(qid)"})
