"""ES ``boosting`` compound query (operators/boosting.py): from-scratch
brute force (demotion flips, negative-only docs never appear, nb=0
keeps demoted hits at score 0, nb=1 identity), guards, index ==
exhaustive, gate equality vs DuckDB, and the
bm25_multifield_cogroup_top10 displaced-row twin."""

from __future__ import annotations

import math

import pytest

from sgpt_spark.operators.boosting import (
    boosting_combine,
    boosting_search,
    boosting_search_index,
)

pytestmark = pytest.mark.usefixtures("spark")

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "quick brown fox and quick brown fox again"),
    (2, "a lazy lazy afternoon"),          # negative-only for qid 200
    (3, "brown quick fox"),
    (4, "the fox is quick and brown"),
    (5, "quick brown wolf"),
    (6, "nothing relevant here"),
]
# positive queries
QUERIES = [(200, "quick brown fox"), (201, "lazy dog")]
# negatives: 200 demotes docs containing 'lazy' (docs 0, 2);
# 201's negative term is corpus-absent -> no-op
NEG = [(200, "lazy"), (201, "unicornium")]


def _brute(k, nb, k1=1.2, b=0.75):
    toks = {d: t.split() for d, t in DOCS}
    n = len(toks)
    avgdl = sum(len(t) for t in toks.values()) / n
    df = {}
    for t in toks.values():
        for w in set(t):
            df[w] = df.get(w, 0) + 1
    out = []
    for qid, q in QUERIES:
        neg_terms = dict(NEG)[qid].split()
        rows = []
        for d, t in toks.items():
            s = 0.0
            for w in q.split():
                if w not in df or w not in t:
                    continue
                tf = t.count(w)
                idf = math.log(1 + (n - df[w] + 0.5) / (df[w] + 0.5))
                s += idf * tf / (tf + k1 * (1 - b + b * len(t) / avgdl))
            if s == 0.0 and not any(w in t for w in q.split()):
                continue  # not a positive hit
            s = round(s, 6)
            if any(w in t for w in neg_terms):
                s *= nb
            rows.append((round(s, 6), d))
        rows.sort(key=lambda r: (-r[0], r[1]))
        for rk, (s, d) in enumerate(rows[:k], 1):
            out.append((qid, d, s, rk))
    return sorted(out)


def _rows(df):
    return sorted(
        (r["qid"], r["doc_id"], round(r["score"], 6), r["rank"]) for r in df.collect()
    )


@pytest.mark.parametrize("nb", [0.5, 0.0, 1.0])
def test_brute_force_exhaustive(spark, nb):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    q = spark.createDataFrame(QUERIES, "qid long, query string")
    neg = spark.createDataFrame(NEG, "qid long, query string")
    got = _rows(boosting_search(docs, q, neg, k=10, negative_boost=nb))
    want = _brute(10, nb)
    # ids and ranks exact; scores within one 6-dp rounding boundary (the
    # Python brute force sums query-term contributions in a different
    # order than Spark, so the last pre-round ULP can flip digit 6)
    assert [(q_, d, rk) for q_, d, s, rk in got] == [
        (q_, d, rk) for q_, d, s, rk in want
    ] and got
    for (_, _, gs, _), (_, _, ws, _) in zip(got, want):
        assert gs == pytest.approx(ws, abs=2e-6)
    # the negative clause never ADDS documents: doc 2 matches only the
    # negative query and must not appear for qid 200
    assert not any(qid == 200 and d == 2 for qid, d, s, rk in got)
    if nb == 0.0:
        # demoted hits stay in the result set at score 0 (ES: the
        # boosting query is not must_not)
        assert any(qid == 200 and d == 0 and s == 0.0 for qid, d, s, rk in got)


@pytest.mark.parametrize("nb", [0.5, 0.25])
def test_index_equals_exhaustive(spark, nb):
    from sgpt_spark.operators.indexer import build_postings

    docs = spark.createDataFrame(DOCS, "doc_id long, text string").repartition(
        3, "doc_id"
    )
    q = spark.createDataFrame(QUERIES, "qid long, query string")
    neg = spark.createDataFrame(NEG, "qid long, query string")
    postings, meta = build_postings(docs, segment_size=3)
    got = _rows(
        boosting_search_index(spark, postings, meta, q, neg, k=10, negative_boost=nb)
    )
    want = _rows(boosting_search(docs, q, neg, k=10, negative_boost=nb))
    assert got == want and got


def test_demotion_flips_order(spark):
    """The canonical boosting effect: qid 200's doc 0 (contains 'lazy')
    must rank below un-demoted docs at nb=0.25 that it outranks at
    nb=1.0."""
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    q = spark.createDataFrame(QUERIES, "qid long, query string")
    neg = spark.createDataFrame(NEG, "qid long, query string")

    def rank_of(nb, doc):
        rows = _rows(boosting_search(docs, q, neg, k=10, negative_boost=nb))
        return next(rk for qid, d, s, rk in rows if qid == 200 and d == doc)

    assert rank_of(0.25, 0) > rank_of(1.0, 0)


def test_guards(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    p = docs.selectExpr("doc_id as qid", "doc_id", "1.0 as score")
    with pytest.raises(ValueError, match="negative_boost"):
        boosting_combine(p, p.select("qid", "doc_id"), negative_boost=1.5)
    with pytest.raises(ValueError, match="negative_boost"):
        boosting_combine(p, p.select("qid", "doc_id"), negative_boost=-0.1)


def _duck(sf):
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    return con


def test_boosting_gate_duckdb_equality(spark):
    """Gate row boosting_top10: exact registry query vs exact registry
    SQL at sf0.001 (the driver repeats this at sf0.01)."""
    import __spark_entry__ as entry

    sf = "/root/testdata/sf0.001"
    got = _rows(entry._q_boosting(spark, sf))
    want = sorted(
        (q, int(d), round(s, 6), int(rk))
        for q, d, s, rk in _duck(sf).execute(entry._BOOSTING_SQL).fetchall()
    )
    assert got == want and len(got) > 0


def test_multifield_cogroup_displaced_duckdb_equality(spark):
    """bm25_multifield_cogroup_top10 left the driver window for
    boosting_top10 (round 5 — the multifield oracle stays gated via the
    top10/index/join gates, the cogroup strategy via
    bm25_index_cogroup_top10 + bm25_bool_cogroup_top10); exact registry
    query vs exact registry SQL at sf0.001."""
    import __spark_entry__ as entry

    sf = "/root/testdata/sf0.001"
    got = _rows(entry._q_bm25_multifield_cogroup(spark, sf))
    want = sorted(
        (q, int(d), round(s, 6), int(rk))
        for q, d, s, rk in _duck(sf).execute(entry._BM25_MULTIFIELD_SQL).fetchall()
    )
    assert got == want and len(got) > 0
