"""Phrase search (ES match_phrase, slop=0): unit math, brute-force
Python oracle over an adversarial fixture (overlapping self-repeats,
duplicate phrase terms, phrase longer than doc, absent terms), the
single-term-phrase == match-query BM25 identity, the no-broadcast scale
contract, and the standard analyzer. Also carries the DuckDB equality
evidence for event_type_counts, whose driver-window slot the phrase
gate took (registry round-5 swap)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from sgpt_spark.functions.analyzer import tokenize_standard, tokenize_ws
from sgpt_spark.functions.bm25 import idf_py
from sgpt_spark.operators.phrase import (
    phrase_freq_py,
    phrase_score_py,
    phrase_search,
)
from sgpt_spark.operators.search import bm25_search

# ---- pure-python units ---------------------------------------------------


def test_phrase_freq_py():
    assert phrase_freq_py(list("abcab"), list("ab")) == 2
    assert phrase_freq_py(["a", "a", "a"], ["a", "a"]) == 2  # overlaps count
    assert phrase_freq_py(["a", "b"], ["b", "a"]) == 0  # order matters
    assert phrase_freq_py(["a"], ["a", "b"]) == 0  # phrase longer than doc
    assert phrase_freq_py([], ["a"]) == 0
    assert phrase_freq_py(["x", "y", "x", "y", "x"], ["x", "y", "x"]) == 2


# ---- brute-force oracle over an adversarial fixture ----------------------

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "quick brown fox and quick brown fox again"),  # pf=2 for 3-gram
    (2, "a a a a"),  # self-overlapping repeats
    (3, "brown quick fox"),  # all terms, wrong order
    (4, "the fox is quick and brown"),  # all terms, never adjacent
    (5, "quick brown wolf"),  # shares a 2-gram prefix only
    (6, "x y x y x"),  # overlapping alternation
    (7, "singleton"),
]

QUERIES = [
    (100, "quick brown fox"),
    (101, "a a"),  # duplicate phrase term, overlapping hits
    (102, "x y x"),  # overlapping alternation
    (103, "lazy dog"),
    (104, "fox quick"),  # terms present somewhere, phrase nowhere
    (105, "quick brown unicorn"),  # absent term -> no hit anywhere
    (106, "singleton"),  # single-term phrase == term query
]


def brute_force(docs, queries, k=10, k1=1.2, b=0.75):
    toks = {d: t.split() for d, t in docs}
    toks = {d: [x for x in t if x] for d, t in toks.items() if any(t)}
    n = len(toks)
    avgdl = sum(len(t) for t in toks.values()) / n
    df: dict[str, int] = {}
    for t in toks.values():
        for term in set(t):
            df[term] = df.get(term, 0) + 1
    out = []
    for qid, q in queries:
        qt = [x for x in q.split() if x]
        if not qt or any(t not in df for t in qt):
            # an absent term means no doc can contain the phrase
            hits = []
        else:
            hits = []
            for d, dt in toks.items():
                pf = phrase_freq_py(dt, qt)
                if pf:
                    sc = phrase_score_py(pf, len(dt), qt, df, n, avgdl, k1, b)
                    hits.append((d, round(sc, 6)))
        hits.sort(key=lambda x: (-x[1], x[0]))
        for r, (d, sc) in enumerate(hits[:k], start=1):
            out.append((qid, d, sc, r))
    return sorted(out)


def run_rows(df):
    return sorted(
        (r["qid"], r["doc_id"], round(r["score"], 6), r["rank"]) for r in df.collect()
    )


def test_phrase_search_matches_brute_force(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    qs = spark.createDataFrame(QUERIES, "qid long, query string")
    got = run_rows(phrase_search(docs, qs, k=10))
    want = brute_force(DOCS, QUERIES)
    assert got == want
    # spot-check semantic corners the fixture encodes
    by_q = {}
    for qid, d, sc, r in got:
        by_q.setdefault(qid, []).append((d, sc, r))
    assert {d for d, _, _ in by_q[100]} == {0, 1}  # exact 3-gram docs only
    assert 3 not in {d for d, _, _ in by_q.get(100, [])}  # wrong order
    assert 4 not in {d for d, _, _ in by_q.get(100, [])}  # never adjacent
    assert 105 not in by_q  # absent term matches nothing
    assert {d for d, _, _ in by_q[101]} == {2}  # 'a a' only in doc 2
    assert {d for d, _, _ in by_q[102]} == {6}


def test_overlapping_pf_raises_score(spark):
    """pf saturation: doc 2 ('a a a a', pf=3 for 'a a') must outscore a
    doc with a single occurrence at equal length."""
    docs = spark.createDataFrame(
        [(1, "a a b b"), (2, "a a a a")], "doc_id long, text string"
    )
    qs = spark.createDataFrame([(9, "a a")], "qid long, query string")
    rows = {r["doc_id"]: r["score"] for r in phrase_search(docs, qs).collect()}
    assert rows[2] > rows[1]


def test_single_term_phrase_equals_match_query(spark):
    """A one-term phrase IS the term query: pf == tf, summed idf == idf,
    so phrase_search must reproduce bm25_search exactly (Lucene rewrites
    single-term PhraseQuery to TermQuery)."""
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    qs = spark.createDataFrame(
        [(1, "quick"), (2, "singleton"), (3, "fox")], "qid long, query string"
    )
    assert run_rows(phrase_search(docs, qs, k=10)) == run_rows(
        bm25_search(docs, qs, k=10)
    )


def test_no_broadcast_identity(spark):
    """broadcast_queries=False (millions-of-queries contract) is value
    identical to the broadcast plan."""
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    qs = spark.createDataFrame(QUERIES, "qid long, query string")
    assert run_rows(phrase_search(docs, qs, broadcast_queries=False)) == run_rows(
        phrase_search(docs, qs)
    )


def test_standard_analyzer_phrase(spark):
    """tokenize_standard lowercases and strips punctuation on BOTH
    sides, so 'Quick, Brown FOX!' matches the 'quick brown fox' docs."""
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    qs = spark.createDataFrame([(1, "Quick, Brown FOX!")], "qid long, query string")
    got = run_rows(phrase_search(docs, qs, tokenizer=tokenize_standard))
    want = brute_force(DOCS, [(1, "quick brown fox")])
    assert got == want


def test_empty_inputs(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    empty_q = spark.createDataFrame([], "qid long, query string")
    assert phrase_search(docs, empty_q).count() == 0
    blank_q = spark.createDataFrame([(1, "   "), (2, None)], "qid long, query string")
    assert phrase_search(docs, blank_q).count() == 0


def test_phrase_score_py_math():
    """score = (sum of member idfs) * pf / (pf + k1*(1-b+b*dl/avgdl)),
    duplicates contributing once per occurrence."""
    df = {"a": 3, "b": 1}
    n, avgdl, dl, pf = 10, 5.0, 4, 2
    want = (2 * idf_py(3, n) + idf_py(1, n)) * pf / (
        pf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl)
    )
    got = phrase_score_py(pf, dl, ["a", "b", "a"], df, n, avgdl)
    assert math.isclose(got, want, rel_tol=1e-12)


# ---- migrated gate evidence ---------------------------------------------


def test_event_type_counts_duckdb_equality(spark):
    """event_type_counts left the driver's 50-entry window for the
    phrase gate; its DuckDB value equality lives here instead."""
    import duckdb

    from sgpt_spark.operators.relational import event_type_counts

    sf = "/root/testdata/sf0.001"
    got = sorted(
        (r["event_type"], r["n"])
        for r in event_type_counts(
            spark.read.parquet(f"{sf}/events.parquet"), n=10
        ).collect()
    )
    con = duckdb.connect()
    want = sorted(
        con.execute(
            f"""SELECT event_type, count(*) AS n
                FROM read_parquet('{sf}/events.parquet')
                GROUP BY event_type ORDER BY n DESC, event_type ASC LIMIT 10"""
        ).fetchall()
    )
    assert [(a, int(b)) for a, b in got] == [(a, int(b)) for a, b in want]
