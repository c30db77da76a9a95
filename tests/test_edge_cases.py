"""Edge-condition robustness: empty corpora, queries with no matches,
empty query sets, punctuation-only docs — none of these may crash or
return wrong shapes."""

from __future__ import annotations

import tempfile

from sgpt_spark.functions.analyzer import analyze_py
from sgpt_spark.operators.index_search import search_index
from sgpt_spark.operators.indexer import build_index, build_postings, read_index
from sgpt_spark.operators.search import bm25_search


def test_empty_corpus_build_and_search(spark):
    docs = spark.createDataFrame([], "doc_id long, text string")
    queries = spark.createDataFrame([(1, "anything")], "qid long, query string")
    path = tempfile.mkdtemp(prefix="sgpt_empty_idx_")
    meta = build_index(docs, path)
    assert meta.n_docs == 0 and meta.next_doc_id == 0
    postings, meta2 = read_index(spark, path)
    assert search_index(spark, postings, meta2, queries, k=10).count() == 0
    assert bm25_search(docs, queries, k=10).count() == 0


def test_all_empty_text_corpus(spark):
    docs = spark.createDataFrame(
        [(0, ""), (1, "   "), (2, None)], "doc_id long, text string"
    )
    queries = spark.createDataFrame([(1, "x")], "qid long, query string")
    path = tempfile.mkdtemp(prefix="sgpt_blank_idx_")
    meta = build_index(docs, path)
    assert meta.n_docs == 0  # trim-empty docs never count
    postings, meta2 = read_index(spark, path)
    assert search_index(spark, postings, meta2, queries, k=10).count() == 0


def test_queries_with_no_matches_or_empty(spark):
    docs = spark.createDataFrame(
        [(0, "alpha beta gamma"), (1, "delta epsilon")], "doc_id long, text string"
    )
    queries = spark.createDataFrame(
        [(1, "zzzz qqqq"), (2, ""), (3, None), (4, "alpha")],
        "qid long, query string",
    )
    run = bm25_search(docs, queries, k=10).collect()
    assert {r["qid"] for r in run} == {4}
    postings, meta = build_postings(docs)
    run_idx = search_index(spark, postings, meta, queries, k=10).collect()
    assert sorted(map(tuple, run_idx)) == sorted(map(tuple, run))


def test_punct_only_docs_standard_analyzer(spark):
    docs = spark.createDataFrame(
        [(0, "!!! ... ???"), (1, "real words here")], "doc_id long, text string"
    )
    path = tempfile.mkdtemp(prefix="sgpt_punct_idx_")
    meta = build_index(docs, path, py_tokenizer=analyze_py)
    assert meta.n_docs == 2  # punct-only doc counts toward N (non-empty text)
    assert meta.total_len == 3
    postings, meta2 = read_index(spark, path)
    queries = spark.createDataFrame([(9, "WORDS!")], "qid long, query string")
    hits = search_index(spark, postings, meta2, queries, k=5).collect()
    assert [r["doc_id"] for r in hits] == [1]


def test_exclude_self_when_everything_is_self(spark):
    docs = spark.createDataFrame([(7, "only doc here")], "doc_id long, text string")
    queries = spark.createDataFrame([(7, "only doc")], "qid long, query string")
    assert bm25_search(docs, queries, k=5, exclude_self=True).count() == 0
    postings, meta = build_postings(docs)
    assert search_index(spark, postings, meta, queries, k=5, exclude_self=True).count() == 0
