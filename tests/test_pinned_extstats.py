"""ES pinned query (operators/pinned.py) and extended_stats
(operators/aggs_ext.py): from-scratch brute forces, the pin-order /
unmatched-pin / dedup semantics, exact-moment math vs python, and
guards."""

from __future__ import annotations

import math

import pytest

from sgpt_spark.functions.bm25 import score_py
from sgpt_spark.operators.aggs_ext import extended_stats_agg
from sgpt_spark.operators.indexer import build_postings
from sgpt_spark.operators.pinned import pinned_search_index

pytestmark = pytest.mark.usefixtures("spark")

DOCS = [
    (0, "alpha beta gamma"),
    (1, "alpha beta"),
    (2, "alpha"),
    (3, "delta epsilon"),
    (4, "beta beta beta"),
]

QUERIES = [(1, "alpha beta"), (2, "delta")]


def _docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def _rows(df):
    return sorted(
        (
            r["qid"],
            r["doc_id"],
            None if r["score"] is None else round(r["score"], 6),
            r["rank"],
        )
        for r in df.collect()
    )


def _organic(k1=1.2, b=0.75):
    toks = {d: t.split() for d, t in DOCS}
    n = len(toks)
    avgdl = sum(len(t) for t in toks.values()) / n
    df: dict = {}
    for t in toks.values():
        for w in set(t):
            df[w] = df.get(w, 0) + 1
    out: dict = {}
    for qid, q in QUERIES:
        for d, t in toks.items():
            s = sum(
                score_py(t.count(w), df[w], len(t), n, avgdl)
                for w in q.split()
                if w in t
            )
            if s > 0:
                out[(qid, d)] = round(s, 6)
    return out


def test_pinned_brute_force(spark):
    docs = _docs(spark)
    postings, meta = build_postings(docs, segment_size=2)
    # q1 pins: doc 3 (does NOT match 'alpha beta') then doc 1 (does);
    # q2 pins: doc 0 (no 'delta')
    pins = [(1, [3, 1]), (2, [0])]
    got = _rows(
        pinned_search_index(spark, postings, meta, QUERIES, pins, k=4)
    )
    org = _organic()
    # expected: pins in order (score = organic or None), then organic
    # by score desc / doc_id asc, pinned duplicates removed
    want = []
    for qid, pin_ids in pins:
        page = [(d, org.get((qid, d))) for d in pin_ids]
        rest = sorted(
            ((d, s) for (q, d), s in org.items()
             if q == qid and d not in pin_ids),
            key=lambda x: (-x[1], x[0]),
        )
        for rk, (d, s) in enumerate((page + rest)[:4], 1):
            want.append((qid, d, s, rk))
    assert got == sorted(want) and len(got) > 0
    # the unmatched pin leads with a NULL score
    assert (1, 3, None, 1) in got and (2, 0, None, 1) in got
    # doc 1 is pinned at rank 2 for q1, not duplicated organically
    assert len([r for r in got if r[0] == 1 and r[1] == 1]) == 1


def test_pinned_guards(spark):
    docs = _docs(spark)
    postings, meta = build_postings(docs, segment_size=2)
    with pytest.raises(ValueError, match="empty pins"):
        pinned_search_index(spark, postings, meta, QUERIES, [])


# ---- extended_stats ----------------------------------------------------------


def test_extended_stats_brute_force(spark):
    cand = spark.createDataFrame(
        [(1, 0), (1, 1), (1, 2), (2, 3)], "qid long, doc_id long"
    )
    dv = spark.createDataFrame(
        [(0, 10), (1, 20), (2, 40), (3, None), (4, 99)],
        "doc_id long, v long",
    )
    got = {
        r["qid"]: r.asDict()
        for r in extended_stats_agg(cand, dv, "v", sigma=2.0).collect()
    }
    vals = [10, 20, 40]
    n = len(vals)
    mean = sum(vals) / n
    var = (sum(v * v for v in vals) - sum(vals) ** 2 / n) / n
    std = math.sqrt(var)
    r1 = got[1]
    assert r1["value_count"] == 3 and r1["sum_value"] == 70
    assert r1["min_value"] == 10 and r1["max_value"] == 40
    assert r1["avg_value"] == pytest.approx(mean)
    assert r1["sum_of_squares"] == pytest.approx(sum(v * v for v in vals))
    assert r1["variance"] == pytest.approx(var)
    assert r1["std_deviation"] == pytest.approx(std)
    assert r1["std_upper"] == pytest.approx(mean + 2 * std)
    assert r1["std_lower"] == pytest.approx(mean - 2 * std)
    # q2 matched only a NULL value: ES empty-stats shape
    r2 = got[2]
    assert r2["value_count"] == 0 and r2["min_value"] is None


def test_extended_stats_guards(spark):
    cand = spark.createDataFrame([(1, 0)], "qid long, doc_id long")
    dv = spark.createDataFrame([(0, 1)], "doc_id long, v long")
    with pytest.raises(ValueError, match="not in docvalues"):
        extended_stats_agg(cand, dv, "nope")
    with pytest.raises(ValueError, match="sigma"):
        extended_stats_agg(cand, dv, "v", sigma=-1)
