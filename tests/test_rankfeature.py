"""ES rank_feature (operators/distfeature.py): the three scoring
functions vs python math, missing/non-positive feature handling, and
guards — completing the feature-query pair next to distance_feature."""

from __future__ import annotations

import math

import pytest

from sgpt_spark.functions.bm25 import score_py
from sgpt_spark.operators.distfeature import (
    rank_feature_column,
    rank_feature_search_index,
)
from sgpt_spark.operators.indexer import build_postings

pytestmark = pytest.mark.usefixtures("spark")

DOCS = [
    (0, "alpha beta", 10.0),
    (1, "alpha beta beta", 100.0),
    (2, "alpha", None),    # missing feature
    (3, "alpha", 0.0),     # non-positive feature: adds 0
    (4, "gamma", 50.0),
]

QUERIES = [(1, "alpha beta")]


def _setup(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string, pr double")
    postings, meta = build_postings(docs, segment_size=2)
    return docs, postings, meta


def _feat(x, function, pivot, boost=1.0, exponent=0.5):
    if x is None or x <= 0:
        return 0.0
    if function == "saturation":
        return boost * x / (x + pivot)
    if function == "log":
        return boost * math.log(pivot + x)
    xe = x ** exponent
    return boost * xe / (xe + pivot ** exponent)


def _brute(function, pivot, boost=1.0, exponent=0.5, k1=1.2, b=0.75):
    toks = {d: t.split() for d, t, _ in DOCS}
    pr = {d: p for d, _, p in DOCS}
    n = len(toks)
    avgdl = sum(len(t) for t in toks.values()) / n
    df: dict = {}
    for t in toks.values():
        for w in set(t):
            df[w] = df.get(w, 0) + 1
    out = []
    for qid, q in QUERIES:
        hits = []
        for d, t in toks.items():
            s = sum(
                score_py(t.count(w), df[w], len(t), n, avgdl)
                for w in q.split() if w in t
            )
            if s == 0.0:
                continue
            s += _feat(pr[d], function, pivot, boost, exponent)
            hits.append((round(s, 6), d))
        hits.sort(key=lambda x: (-x[0], x[1]))
        for rk, (s, d) in enumerate(hits, 1):
            out.append((qid, d, s, rk))
    return sorted(out)


def _rows(df):
    return sorted(
        (r["qid"], r["doc_id"], round(r["score"], 6), r["rank"])
        for r in df.collect()
    )


@pytest.mark.parametrize("function", ["saturation", "log", "sigmoid"])
def test_functions_match_brute_force(spark, function):
    docs, postings, meta = _setup(spark)
    dv = docs.select("doc_id", "pr")
    got = _rows(
        rank_feature_search_index(
            spark, postings, meta, QUERIES, dv, "pr",
            function=function, pivot=8.0, boost=1.5, exponent=0.6,
        )
    )
    assert got == _brute(function, 8.0, boost=1.5, exponent=0.6)
    assert len(got) == 4  # docs 0,1,2,3 match; 4 does not
    # missing (doc 2) and zero (doc 3) features add exactly 0: they
    # keep pure-BM25 scores and identical relative order
    by_doc = {d: s for _, d, s, _ in got}
    assert by_doc[2] == by_doc[3] or (2 in by_doc and 3 in by_doc)


def test_guards(spark):
    import pyspark.sql.functions as F

    with pytest.raises(ValueError, match="unknown rank_feature"):
        rank_feature_column(F.col("x"), function="nope")
    with pytest.raises(ValueError, match="pivot"):
        rank_feature_column(F.col("x"), pivot=0)
    with pytest.raises(ValueError, match="exponent"):
        rank_feature_column(F.col("x"), function="sigmoid", exponent=0)
    docs, postings, meta = _setup(spark)
    with pytest.raises(ValueError, match="not in docvalues"):
        rank_feature_search_index(
            spark, postings, meta, QUERIES, docs.select("doc_id", "pr"),
            "nope",
        )
