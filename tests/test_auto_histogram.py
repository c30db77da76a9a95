"""ES auto_date_histogram (operators/auto_histogram.py): a from-scratch
python brute force over the full ladder (span-based interval choice,
calendar truncation, empty-bucket fill), per-query interval
independence, the <=buckets invariant, min_doc_count=1, and guards."""

from __future__ import annotations

import datetime as dt

import pytest

from sgpt_spark.operators.auto_histogram import auto_date_histogram_agg

pytestmark = pytest.mark.usefixtures("spark")

TS = {
    # q1: three consecutive days -> day rung at buckets=4
    0: dt.datetime(2021, 1, 1, 10),
    1: dt.datetime(2021, 1, 2, 11),
    2: dt.datetime(2021, 1, 3, 12),
    # q2: January..July -> 7 months; day/week spans overflow 8,
    # month span 7 <= 8 -> month rung, fill emits all 7 months
    3: dt.datetime(2021, 1, 15),
    4: dt.datetime(2021, 3, 20),
    5: dt.datetime(2021, 7, 1),
    # q3: two dates years apart -> only the year rung fits 4
    6: dt.datetime(2019, 5, 10),
    7: dt.datetime(2023, 11, 30),
}

CAND = [(1, 0), (1, 1), (1, 2), (2, 3), (2, 4), (2, 5), (3, 6), (3, 7)]


def _trunc(d: dt.date, rung: str) -> dt.date:
    if rung == "day":
        return d
    if rung == "week":
        return d - dt.timedelta(days=d.weekday())
    if rung == "month":
        return d.replace(day=1)
    if rung == "quarter":
        return d.replace(month=((d.month - 1) // 3) * 3 + 1, day=1)
    return d.replace(month=1, day=1)


def _step(d: dt.date, rung: str) -> dt.date:
    if rung == "day":
        return d + dt.timedelta(days=1)
    if rung == "week":
        return d + dt.timedelta(days=7)
    if rung == "month":
        y, m = divmod(d.month, 12)
        return d.replace(year=d.year + y, month=m + 1)
    if rung == "quarter":
        m0 = d.month - 1 + 3
        return d.replace(year=d.year + m0 // 12, month=m0 % 12 + 1)
    return d.replace(year=d.year + 1)


def _span(lo: dt.date, hi: dt.date, rung: str) -> int:
    n, cur = 1, lo
    while cur < hi:
        cur = _step(cur, rung)
        n += 1
    return n


def _brute(buckets, min_doc_count=0):
    by_q: dict = {}
    for qid, d in CAND:
        by_q.setdefault(qid, []).append(TS[d].date())
    out = []
    for qid, dates in by_q.items():
        rung = "year"
        for name in ("day", "week", "month", "quarter", "year"):
            lo = _trunc(min(dates), name)
            hi = _trunc(max(dates), name)
            if _span(lo, hi, name) <= buckets:
                rung = name
                break
        counts: dict = {}
        for d in dates:
            b = _trunc(d, rung)
            counts[b] = counts.get(b, 0) + 1
        if min_doc_count == 1:
            for b, c in counts.items():
                out.append((qid, rung, b, c))
        else:
            cur, hi = min(counts), max(counts)
            while cur <= hi:
                out.append((qid, rung, cur, counts.get(cur, 0)))
                cur = _step(cur, rung)
    return sorted(out)


def _build(spark):
    cand = spark.createDataFrame(CAND, "qid long, doc_id long")
    dv = spark.createDataFrame(
        [(d, ts) for d, ts in TS.items()], "doc_id long, ts timestamp"
    )
    return cand, dv


def _rows(df):
    return sorted(
        (r["qid"], r["interval"], r["bucket"], r["doc_count"])
        for r in df.collect()
    )


@pytest.mark.parametrize("buckets", [4, 8, 40])
@pytest.mark.parametrize("mdc", [0, 1])
def test_matches_brute_force(spark, buckets, mdc):
    cand, dv = _build(spark)
    got = _rows(
        auto_date_histogram_agg(cand, dv, "ts", buckets=buckets,
                                min_doc_count=mdc)
    )
    assert got == _brute(buckets, min_doc_count=mdc) and len(got) > 0


def test_per_query_intervals_differ(spark):
    cand, dv = _build(spark)
    got = _rows(auto_date_histogram_agg(cand, dv, "ts", buckets=4))
    ivals = {q: i for q, i, _, _ in got}
    assert ivals == {1: "day", 2: "quarter", 3: "year"}
    # the filled response respects the target wherever any rung fits;
    # q3 (5 distinct years) overflows even the coarsest rung — the
    # documented year fallback
    from collections import Counter

    per_q = Counter(q for q, *_ in got)
    assert per_q[1] <= 4 and per_q[2] <= 4 and per_q[3] == 5
    # q2 fill is contiguous quarters with a zero bucket (Q2 has no doc;
    # Q1 holds both the January and March docs)
    q2 = [(b, c) for q, _, b, c in got if q == 2]
    assert [c for _, c in q2] == [2, 0, 1]


def test_guards(spark):
    cand, dv = _build(spark)
    with pytest.raises(ValueError, match="not in docvalues"):
        auto_date_histogram_agg(cand, dv, "nope")
    with pytest.raises(ValueError, match="buckets"):
        auto_date_histogram_agg(cand, dv, "ts", buckets=0)
    with pytest.raises(ValueError, match="min_doc_count"):
        auto_date_histogram_agg(cand, dv, "ts", min_doc_count=2)


# ---- variable_width_histogram -------------------------------------------


def _q7_edges(xs, m):
    import math

    xs = sorted(xs)
    out = []
    for i in range(1, m):
        h = (len(xs) - 1) * (i / m)
        lo, hi = int(math.floor(h)), int(math.ceil(h))
        out.append(xs[lo] + (h - lo) * (xs[hi] - xs[lo]))
    # array_distinct keeps first occurrences; edges are non-decreasing
    seen, dedup = set(), []
    for e in out:
        if e not in seen:
            seen.add(e)
            dedup.append(e)
    return dedup


def _brute_vwh(by_qid, buckets, factor=2):
    out = []
    for qid, vals in by_qid.items():
        if not vals:
            continue
        edges = _q7_edges(vals, buckets * factor)
        summ = {}
        for v in vals:
            o = sum(1 for e in edges if e < v)
            n, s, lo, hi = summ.get(o, (0, 0.0, v, v))
            summ[o] = (n + 1, s + v, min(lo, v), max(hi, v))
        bs = [list(summ[o]) for o in sorted(summ)]
        while len(bs) > buckets:
            best, best_d = 0, float("inf")
            for i in range(len(bs) - 1):
                d = bs[i + 1][1] / bs[i + 1][0] - bs[i][1] / bs[i][0]
                if d < best_d:
                    best, best_d = i, d
            a, b = bs[best], bs[best + 1]
            bs[best] = [a[0] + b[0], a[1] + b[1], min(a[2], b[2]), max(a[3], b[3])]
            del bs[best + 1]
        for n, s, lo, hi in bs:
            out.append((qid, round(lo, 9), round(s / n, 9), round(hi, 9), n))
    return sorted(out)


def test_variable_width_histogram_brute_force(spark):
    from sgpt_spark.operators.auto_histogram import variable_width_histogram_agg

    import random

    rng = random.Random(7)
    # two clusters + outliers per query: adaptive widths must separate
    vals1 = [rng.gauss(10, 1) for _ in range(40)] + [
        rng.gauss(100, 2) for _ in range(40)
    ] + [500.0, -50.0]
    vals2 = [float(i) for i in range(25)]
    rows = []
    did = 0
    by_qid = {1: [], 2: []}
    for q, vs in ((1, vals1), (2, vals2)):
        for v in vs:
            rows.append((did, v))
            by_qid[q].append(v)
            did += 1
    dv = spark.createDataFrame(rows, "doc_id long, x double")
    cand = spark.createDataFrame(
        [(q, d) for q in (1, 2) for d in range(did)], "qid long, doc_id long"
    )
    # candidates restrict each qid to its own docs
    cand = spark.createDataFrame(
        [(1, d) for d in range(len(vals1))]
        + [(2, d) for d in range(len(vals1), did)],
        "qid long, doc_id long",
    )
    got = sorted(
        (r["qid"], round(r["bucket_min"], 9), round(r["key"], 9),
         round(r["bucket_max"], 9), r["doc_count"])
        for r in variable_width_histogram_agg(cand, dv, "x", buckets=4).collect()
    )
    assert got == _brute_vwh(by_qid, 4)
    # invariants: <= buckets per qid, counts conserved, disjoint ordered
    per_q = {}
    for q, lo, key, hi, n in got:
        per_q.setdefault(q, []).append((lo, key, hi, n))
    for q, bs in per_q.items():
        assert len(bs) <= 4
        assert sum(n for _, _, _, n in bs) == len(by_qid[q])
        bs.sort()
        for (lo, k, hi, _), (lo2, k2, hi2, _) in zip(bs, bs[1:]):
            assert lo <= k <= hi and hi < lo2  # disjoint, centroid inside
    # partition independence: same result from a repartitioned input
    got2 = sorted(
        (r["qid"], round(r["bucket_min"], 9), round(r["key"], 9),
         round(r["bucket_max"], 9), r["doc_count"])
        for r in variable_width_histogram_agg(
            cand.repartition(7), dv.repartition(5), "x", buckets=4
        ).collect()
    )
    assert got2 == got


def test_variable_width_histogram_guards(spark):
    from sgpt_spark.operators.auto_histogram import variable_width_histogram_agg

    dv = spark.createDataFrame([(0, 1.0)], "doc_id long, x double")
    cand = spark.createDataFrame([(1, 0)], "qid long, doc_id long")
    with pytest.raises(ValueError, match="not in docvalues"):
        variable_width_histogram_agg(cand, dv, "nope")
    with pytest.raises(ValueError, match="buckets"):
        variable_width_histogram_agg(cand, dv, "x", buckets=0)
    # degenerate: fewer distinct values than buckets -> one bucket each
    got = variable_width_histogram_agg(cand, dv, "x", buckets=5).collect()
    assert [(r["bucket_min"], r["key"], r["bucket_max"], r["doc_count"])
            for r in got] == [(1.0, 1.0, 1.0, 1)]
