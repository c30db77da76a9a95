"""ES string_stats / percentile_ranks / top_metrics / value_count /
missing (operators/stat_aggs.py): from-scratch python brute forces
(Shannon entropy via Counter, the inverse type-7 rank), the
percentiles<->percentile_ranks mutual-inverse property, NULL rules,
and guards."""

from __future__ import annotations

import collections
import math

import pytest

from sgpt_spark.operators.stat_aggs import (
    missing_agg,
    percentile_ranks_agg,
    string_stats_agg,
    top_metrics_agg,
    value_count_agg,
)

pytestmark = pytest.mark.usefixtures("spark")

# (doc_id, s, v, m)
DV = [
    (0, "abca", 10.0, 5.0),
    (1, "bb", 20.0, 7.0),
    (2, "cc d", 20.0, 2.0),
    (3, None, 40.0, None),
    (4, "e", None, 1.0),
    (5, "ffff gg", 35.0, 9.0),
    (6, None, None, 4.0),
]
CAND = [(1, 0), (1, 1), (1, 2), (1, 3), (1, 4), (2, 5), (2, 4), (3, 3), (3, 6)]


def _build(spark):
    cand = spark.createDataFrame(CAND, "qid long, doc_id long")
    dv = spark.createDataFrame(DV, "doc_id long, s string, v double, m double")
    return cand, dv


def _q_strings(qid):
    by_id = {d[0]: d for d in DV}
    return [by_id[d][1] for q, d in CAND if q == qid and by_id[d][1] is not None]


def _entropy(strings):
    cnt = collections.Counter("".join(strings))
    tot = sum(cnt.values())
    return -sum(n / tot * math.log2(n / tot) for n in cnt.values())


def test_string_stats_vs_brute(spark):
    cand, dv = _build(spark)
    got = {r["qid"]: r for r in string_stats_agg(cand, dv, "s").collect()}
    for qid in (1, 2):
        ss = _q_strings(qid)
        r = got[qid]
        assert r["count"] == len(ss)
        assert r["min_length"] == min(len(s) for s in ss)
        assert r["max_length"] == max(len(s) for s in ss)
        assert r["avg_length"] == pytest.approx(
            sum(len(s) for s in ss) / len(ss)
        )
        assert r["entropy"] == pytest.approx(_entropy(ss), rel=1e-12)
    # qid 3: all-NULL strings -> the ES empty-stats shape
    r3 = got[3]
    assert r3["count"] == 0 and r3["min_length"] is None
    assert r3["avg_length"] is None and r3["entropy"] is None


def test_string_stats_entropy_uniform(spark):
    """4 equiprobable characters -> exactly 2 bits."""
    import pyspark.sql.functions as F

    dv = spark.createDataFrame([(0, "abcd"), (1, "dcba")], "doc_id long, s string")
    cand = dv.select(F.lit(9).alias("qid"), "doc_id")
    [r] = string_stats_agg(cand, dv, "s").collect()
    assert r["entropy"] == pytest.approx(2.0, rel=1e-12)


def _rank_py(xs, v):
    """Inverse type-7 quantile, from scratch."""
    a = sorted(xs)
    n = len(a)
    c = sum(1 for x in a if x <= v)
    if c == 0:
        return 0.0
    if c == n:
        return 100.0
    lo, hi = a[c - 1], a[c]
    return 100.0 * ((c - 1) + (v - lo) / (hi - lo)) / (n - 1)


def test_percentile_ranks_vs_brute(spark):
    cand, dv = _build(spark)
    req = [5.0, 10.0, 15.0, 20.0, 39.0, 40.0, 99.0]
    got = {
        (r["qid"], r["value"]): r["percentile"]
        for r in percentile_ranks_agg(cand, dv, "v", req).collect()
    }
    by_id = {d[0]: d for d in DV}
    for qid in (1, 2, 3):
        xs = [by_id[d][2] for q, d in CAND if q == qid and by_id[d][2] is not None]
        for v in req:
            assert got[(qid, v)] == pytest.approx(_rank_py(xs, v), rel=1e-12), (qid, v)


def test_percentile_ranks_inverse_of_percentiles(spark):
    """rank(quantile(p)) == p on strictly increasing data — the two
    exact paths are mutual inverses."""
    import pyspark.sql.functions as F

    from sgpt_spark.operators.aggs import percentiles_agg

    dv = spark.createDataFrame(
        [(i, float(3 * i * i + 1)) for i in range(11)], "doc_id long, v double"
    )
    cand = dv.select(F.lit(1).alias("qid"), "doc_id")
    ps = [10.0, 25.0, 42.0, 75.0, 90.0]
    qv = {
        r["percent"]: r["value"]
        for r in percentiles_agg(cand, dv, "v", percents=ps).collect()
    }
    ranks = {
        r["value"]: r["percentile"]
        for r in percentile_ranks_agg(cand, dv, "v", [qv[p] for p in ps]).collect()
    }
    for p in ps:
        assert ranks[qv[p]] == pytest.approx(p, rel=1e-9)


def test_percentile_ranks_duplicates_edges(spark):
    """Duplicates collapse to their highest index; ends clamp 0/100."""
    import pyspark.sql.functions as F

    dv = spark.createDataFrame(
        [(i, v) for i, v in enumerate([1.0, 2.0, 2.0, 2.0, 5.0])],
        "doc_id long, v double",
    )
    cand = dv.select(F.lit(1).alias("qid"), "doc_id")
    got = {
        r["value"]: r["percentile"]
        for r in percentile_ranks_agg(cand, dv, "v", [0.5, 2.0, 5.0, 7.0]).collect()
    }
    assert got[0.5] == 0.0 and got[5.0] == 100.0 and got[7.0] == 100.0
    # v=2.0: c=4, h=3 exactly -> 75
    assert got[2.0] == pytest.approx(75.0)


def test_top_metrics_vs_brute(spark):
    cand, dv = _build(spark)
    got = sorted(
        (r["qid"], r["top_rank"], r["sort_value"], r["m"])
        for r in top_metrics_agg(cand, dv, ["m"], "v", size=2).collect()
    )
    by_id = {d[0]: d for d in DV}
    want = []
    for qid in (1, 2, 3):
        rows = [
            (by_id[d][2], d, by_id[d][3])
            for q, d in CAND
            if q == qid and by_id[d][2] is not None
        ]
        rows.sort(key=lambda t: (-t[0], t[1]))
        for rk, (v, d, m) in enumerate(rows[:2], 1):
            want.append((qid, rk, v, m))
    assert got == sorted(want) and got
    # ascending flips the winner
    asc = {
        r["qid"]: r["sort_value"]
        for r in top_metrics_agg(cand, dv, ["m"], "v", ascending=True).collect()
    }
    assert asc[1] == 10.0 and asc[2] == 35.0  # qid 2: doc 4's NULL v skipped


def test_top_metrics_tie_breaks_doc_id(spark):
    """docs 1 and 2 tie at v=20 for qid 1 — doc 1 wins rank 1."""
    cand, dv = _build(spark)
    rows = {
        (r["qid"], r["top_rank"]): r["m"]
        for r in top_metrics_agg(cand, dv, ["m"], "v", size=3).collect()
    }
    assert rows[(1, 2)] == 7.0 and rows[(1, 3)] == 2.0


def test_value_count_and_missing(spark):
    cand, dv = _build(spark)
    vc = {r["qid"]: r["value_count"] for r in value_count_agg(cand, dv, "v").collect()}
    assert vc == {1: 4, 2: 1, 3: 1}
    ms = {r["qid"]: r["doc_count"] for r in missing_agg(cand, dv, "m").collect()}
    assert ms == {1: 1, 2: 0, 3: 1}  # doc 3 is the only NULL m in qids 1/3


def test_missing_counts_absent_docs(spark):
    """A matched doc with NO docvalues row counts as missing."""
    import pyspark.sql.functions as F

    cand = spark.createDataFrame([(1, 0), (1, 99)], "qid long, doc_id long")
    dv = spark.createDataFrame([(0, 1.0)], "doc_id long, m double")
    [r] = missing_agg(cand, dv, "m").collect()
    assert r["doc_count"] == 1


def test_guards(spark):
    cand, dv = _build(spark)
    with pytest.raises(ValueError, match="not in docvalues"):
        string_stats_agg(cand, dv, "nope")
    with pytest.raises(ValueError, match="at least one value"):
        percentile_ranks_agg(cand, dv, "v", [])
    with pytest.raises(ValueError, match="duplicate values"):
        percentile_ranks_agg(cand, dv, "v", [1.0, 1.0])
    with pytest.raises(ValueError, match="size"):
        top_metrics_agg(cand, dv, ["m"], "v", size=0)
    with pytest.raises(ValueError, match="not in docvalues"):
        missing_agg(cand, dv, "nope")
