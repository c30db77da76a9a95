"""Slice-1 correctness: Spark BM25 vs the pure-Python brute-force oracle.

Mirrors the reference's oracle pattern (computed metrics vs published
numbers, SURVEY.md §5.1) but hermetic: rank-identical, score-equal ±1e-6.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from oracle.bm25_oracle import bm25_topk
from sgpt_spark.operators.search import bm25_search
from sgpt_spark.sources.queryset import derived_queries
from tests.conftest import SF_SMOKE

CORPUS = {
    "d1": "the quick brown fox jumps over the lazy dog",
    "d2": "the quick quick fox",
    "d3": "lazy dog sleeps all day the dog",
    "d4": "a completely unrelated document about spark shuffles",
    "d5": "",  # empty doc — must be filtered
    "d6": "fox fox fox fox fox",
}
QUERIES = {"q1": "quick fox", "q2": "lazy dog", "q3": "spark", "q4": "fox the fox"}


@pytest.fixture(scope="module")
def tiny(spark):
    corpus = spark.createDataFrame(
        [(k, v) for k, v in CORPUS.items()], "doc_id string, text string"
    )
    queries = spark.createDataFrame(
        [(k, v) for k, v in QUERIES.items()], "qid string, query string"
    )
    return corpus, queries


def collect_run(df):
    out = {}
    for r in df.collect():
        out.setdefault(r["qid"], []).append((r["doc_id"], r["score"], r["rank"]))
    for qid in out:
        out[qid].sort(key=lambda h: h[2])
    return out


def test_rank_and_score_identity_tiny(spark, tiny):
    corpus, queries = tiny
    got = collect_run(bm25_search(corpus, queries, k=10))
    want = bm25_topk(CORPUS, QUERIES, k=10)
    assert set(got) == {q for q, hits in want.items() if hits}
    for qid, hits in got.items():
        assert [h[0] for h in hits] == [h[0] for h in want[qid]], qid
        for (gd, gs, gr), (wd, ws, wr) in zip(hits, want[qid]):
            assert gr == wr
            assert math.isclose(gs, ws, abs_tol=1e-6), (qid, gd, gs, ws)


def test_empty_doc_never_retrieved(spark, tiny):
    corpus, queries = tiny
    got = bm25_search(corpus, queries, k=10)
    assert got.filter(got.doc_id == "d5").count() == 0


def test_duplicate_query_terms_score_double(spark, tiny):
    # "fox the fox" must score fox-matches twice (Lucene occurrence semantics)
    corpus, _ = tiny
    q_single = spark.createDataFrame([("q", "fox")], "qid string, query string")
    q_double = spark.createDataFrame([("q", "fox fox")], "qid string, query string")
    s1 = {r["doc_id"]: r["score"] for r in bm25_search(corpus, q_single, k=10).collect()}
    s2 = {r["doc_id"]: r["score"] for r in bm25_search(corpus, q_double, k=10).collect()}
    for d in s1:
        assert math.isclose(s2[d], 2 * s1[d], abs_tol=1e-5)


def test_rank_identity_testdata(spark):
    """Engine vs oracle on the driver documents table (sf0.001).

    Int doc_ids kept as ints on both sides so the tie-break order
    (doc_id asc) is type-identical.
    """
    docs_df = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    corpus = {r["doc_id"]: r["text"] for r in docs_df.collect()}
    queries = {r["qid"]: r["query"] for r in derived_queries(docs_df).collect()}
    got = collect_run(bm25_search(docs_df, spark.createDataFrame(
        list(queries.items()), "qid long, query string"), k=10))
    want = bm25_topk(corpus, queries, k=10)
    assert set(got) == {q for q, hits in want.items() if hits}
    for qid, hits in got.items():
        assert [h[0] for h in hits] == [w[0] for w in want[qid]], qid
        for g, w in zip(hits, want[qid]):
            assert g[2] == w[2]
            assert math.isclose(g[1], w[1], abs_tol=1e-6)


def test_randomized_differential_vs_oracle(spark):
    """Randomized corpora/queries: the Spark engine (exhaustive AND all
    index strategies AND the join path) must be rank- and score-identical
    to the pure-Python brute-force oracle."""
    import random

    from sgpt_spark.operators.index_search import search_index, search_index_join
    from sgpt_spark.operators.indexer import build_postings

    rng = random.Random(20240816)
    vocab = [f"w{i}" for i in range(60)] + ["the", "a", "of"]
    for trial in range(3):
        n_docs = rng.randint(15, 60)
        # zero-padded keys: the oracle tie-breaks on STRING doc ids, the
        # engine on numeric — padding makes the two orders coincide
        corpus = {
            f"{d:04d}": " ".join(rng.choices(vocab, k=rng.randint(0, 30)))
            for d in range(n_docs)
        }
        queries = {
            f"{100 + q}": " ".join(rng.choices(vocab, k=rng.randint(1, 4)))
            for q in range(6)
        }
        k = rng.choice([3, 10])
        want = {
            qid: [(int(doc), round(sc, 6), rk) for doc, sc, rk in hits]
            for qid, hits in bm25_topk(corpus, queries, k=k).items()
            if hits
        }
        cdf = spark.createDataFrame(
            [(int(i), t) for i, t in corpus.items()], "doc_id long, text string"
        )
        qdf = spark.createDataFrame(
            [(int(i), t) for i, t in queries.items()], "qid long, query string"
        )

        def runs(df):
            got: dict = {}
            for r in df.collect():
                got.setdefault(str(r["qid"]), []).append(
                    (int(r["doc_id"]), r["score"], r["rank"])
                )
            return {q: sorted(v, key=lambda t: t[2]) for q, v in got.items()}

        assert runs(bm25_search(cdf, qdf, k=k)) == want, f"exhaustive trial {trial}"
        postings, meta = build_postings(cdf, segment_size=7)
        for strat in ("taat", "wand", "exhaustive"):
            got = runs(search_index(spark, postings, meta, qdf, k=k, strategy=strat))
            assert got == want, f"{strat} trial {trial}"
        assert runs(search_index_join(spark, postings, meta, qdf, k=k)) == want, trial


# --- multi-field BM25 (ES multi_match best_fields, tie_breaker=0.5) ------

TITLES = {
    "d1": "fox report",
    "d2": "quick summary",
    "d3": "",  # empty title — absent from the title index
    "d4": "spark shuffles explained",
    "d5": "orphan title",  # doc with title but empty body
    "d6": "fox",
}


@pytest.fixture(scope="module")
def tiny_mf(spark):
    rows = [(k, TITLES.get(k, ""), v) for k, v in CORPUS.items()]
    corpus = spark.createDataFrame(rows, "doc_id string, title string, text string")
    queries = spark.createDataFrame(
        [(k, v) for k, v in QUERIES.items()], "qid string, query string"
    )
    return corpus, queries


@pytest.mark.parametrize("tie_breaker", [0.0, 0.5, 1.0])
def test_multifield_matches_oracle(spark, tiny_mf, tie_breaker):
    from oracle.bm25_oracle import bm25_multifield_topk
    from sgpt_spark.operators.search import bm25_multifield_search

    corpus, queries = tiny_mf
    got = collect_run(
        bm25_multifield_search(corpus, queries, k=10, tie_breaker=tie_breaker)
    )
    want = bm25_multifield_topk(
        {"title": TITLES, "text": CORPUS}, QUERIES, k=10, tie_breaker=tie_breaker
    )
    want = {q: hits for q, hits in want.items() if hits}
    assert set(got) == set(want)
    for qid, hits in got.items():
        assert [h[0] for h in hits] == [h[0] for h in want[qid]], qid
        for (gd, gs, gr), (wd, ws, wr) in zip(hits, want[qid]):
            assert gr == wr
            assert math.isclose(gs, ws, abs_tol=1e-6), (qid, gd, gs, ws)


def test_multifield_all_empty_titles_degenerates_to_single_field(spark, tiny):
    """With every title empty the title index is empty, so best_fields
    over (title, text) must equal plain single-field BM25 over text —
    for ANY tie_breaker."""
    from sgpt_spark.operators.search import bm25_multifield_search

    corpus, queries = tiny
    mf = corpus.withColumn("title", F.lit(""))
    got = collect_run(bm25_multifield_search(mf, queries, k=10, tie_breaker=0.5))
    want = collect_run(bm25_search(corpus, queries, k=10))
    assert got == want
