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
