"""Self-match filter (reference exact_search.py:117-119) — exhaustive
and index paths, exactness of the per-segment k+1 retrieval."""

from __future__ import annotations

import pytest

from sgpt_spark.operators.index_search import search_index
from sgpt_spark.operators.indexer import build_postings
from sgpt_spark.operators.search import bm25_search
from sgpt_spark.sources.pages import _VOCAB, _doc_terms


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [(i, " ".join(_VOCAB[_doc_terms(i)][:50])) for i in range(60)]
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def queries(spark, corpus):
    # qid == doc_id of the source doc (quora-style id collision)
    rows = [(r["doc_id"], " ".join(r["text"].split(" ")[:6]))
            for r in corpus.collect() if r["doc_id"] % 7 == 0]
    return spark.createDataFrame(rows, "qid long, query string")


def test_exhaustive_excludes_self(spark, corpus, queries):
    run = bm25_search(corpus, queries, k=10, exclude_self=True).collect()
    assert run, "non-empty run"
    assert all(r["doc_id"] != r["qid"] for r in run)
    # and it is the true top-k of the non-self candidates: deep
    # retrieval without the filter, drop self, re-rank, take 10
    deep = bm25_search(corpus, queries, k=60).collect()
    want: dict = {}
    for r in sorted(deep, key=lambda r: (r["qid"], r["rank"])):
        if r["doc_id"] != r["qid"]:
            want.setdefault(r["qid"], []).append(r["doc_id"])
    got: dict = {}
    for r in sorted(run, key=lambda r: (r["qid"], r["rank"])):
        got.setdefault(r["qid"], []).append(r["doc_id"])
    for qid, docs in got.items():
        assert docs == want[qid][:10], qid


def test_index_path_matches_exhaustive_noself(spark, corpus, queries):
    postings, meta = build_postings(corpus, segment_size=16)
    via_index = sorted(
        tuple(r)
        for r in search_index(
            spark, postings, meta, queries, k=10, exclude_self=True
        ).collect()
    )
    exhaustive = sorted(
        tuple(r) for r in bm25_search(corpus, queries, k=10, exclude_self=True).collect()
    )
    assert via_index == exhaustive
    # all three index strategies agree under exclude_self
    for strat in ("wand", "exhaustive"):
        alt = sorted(
            tuple(r)
            for r in search_index(
                spark, postings, meta, queries, k=10, strategy=strat, exclude_self=True
            ).collect()
        )
        assert alt == exhaustive, strat


def test_exclude_self_rejects_string_qids(spark, corpus):
    import pytest as _pytest

    queries = spark.createDataFrame([("q1", "whatever")], "qid string, query string")
    postings, meta = build_postings(corpus, segment_size=16)
    with _pytest.raises(ValueError, match="exclude_self"):
        search_index(spark, postings, meta, queries, k=5, exclude_self=True)


def test_iterable_int_qids_exclude_self_matches_dataframe(spark, corpus, queries):
    """Round-3 verdict bug: iterable-of-tuples queries with INT qids
    declared `qid string` in the output schema, so exclude_self=True
    (which requires int qids) crashed in the Arrow conversion. The qid
    type must now follow the first tuple's qid, and the iterable path
    must return exactly the DataFrame path's rows."""
    postings, meta = build_postings(corpus, segment_size=16)
    pairs = [(r["qid"], r["query"]) for r in queries.collect()]
    via_iter = search_index(
        spark, postings, meta, iter(pairs), k=10, exclude_self=True
    )
    assert via_iter.schema["qid"].dataType.simpleString() == "bigint"
    got = sorted(tuple(r) for r in via_iter.collect())
    want = sorted(
        tuple(r)
        for r in search_index(
            spark, postings, meta, queries, k=10, exclude_self=True
        ).collect()
    )
    assert got == want and got
    # string-qid iterables still raise under exclude_self, and still
    # declare a string schema without it
    import pytest as _pytest

    with _pytest.raises(ValueError, match="integer qids"):
        search_index(
            spark, postings, meta, [("q1", "whatever")], k=5, exclude_self=True
        )
    s = search_index(spark, postings, meta, [("q1", pairs[0][1])], k=5)
    assert s.schema["qid"].dataType.simpleString() == "string"
    assert s.count() > 0
