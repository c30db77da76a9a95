"""ES _termvectors (operators/termvectors.py): per-doc term vectors
vs a from-scratch python brute force (freqs + 0-based positions),
global-exact doc_freq/ttf vs corpus recounts, the side-table and
postings-derived df paths agreeing, both analyzers, sum(term_freq) ==
doc length identity, and guards."""

from __future__ import annotations

import collections

import pytest

from sgpt_spark.operators.indexer import build_postings
from sgpt_spark.operators.termvectors import term_vectors

pytestmark = pytest.mark.usefixtures("spark")

DOCS = [
    (0, "the quick brown fox the quick"),
    (1, "quick dog"),
    (2, "the the the"),
    (3, "lazy dog sleeps today"),
    (4, ""),
    (5, "unrelated words entirely"),
]
REQ = [0, 2, 3]


def _brute():
    out = {}
    for d, t in DOCS:
        if d not in REQ:
            continue
        toks = [w for w in t.split(" ") if w]
        pos = collections.defaultdict(list)
        for i, w in enumerate(toks):
            pos[w].append(i)
        for w, ps in pos.items():
            out[(d, w)] = (len(ps), ps)
    return out


def _corpus_stats():
    df = collections.Counter()
    ttf = collections.Counter()
    for _, t in DOCS:
        toks = [w for w in t.split(" ") if w]
        for w in set(toks):
            df[w] += 1
        for w in toks:
            ttf[w] += 1
    return df, ttf


def _build(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    postings, meta = build_postings(docs.repartition(2), segment_size=2)
    ids = spark.createDataFrame([(i,) for i in REQ], "doc_id long")
    return docs, postings, meta, ids


def test_term_vectors_vs_brute(spark):
    docs, postings, meta, ids = _build(spark)
    got = {
        (r["doc_id"], r["term"]): (r["term_freq"], list(r["positions"]))
        for r in term_vectors(docs, ids, meta).collect()
    }
    assert got == _brute() and got
    # positions are 0-based ascending; repeated term carries both slots
    assert got[(0, "the")] == (2, [0, 4]) and got[(0, "quick")] == (2, [1, 5])


def test_term_statistics_exact(spark):
    docs, postings, meta, ids = _build(spark)
    rows = term_vectors(
        docs, ids, meta, postings=postings, term_statistics=True
    ).collect()
    df_c, ttf_c = _corpus_stats()
    assert rows
    for r in rows:
        assert r["doc_freq"] == df_c[r["term"]], r
        assert r["ttf"] == ttf_c[r["term"]], r
    # 'the' appears beyond the request set: df counts docs 0 and 2,
    # ttf counts all five occurrences — GLOBAL, not request-local
    the = next(r for r in rows if r["term"] == "the" and r["doc_id"] == 2)
    assert the["doc_freq"] == 2 and the["ttf"] == 5


def test_side_table_df_path_agrees(spark):
    docs, postings, meta, ids = _build(spark)
    import pyspark.sql.functions as F

    side = postings.groupBy("term").agg(F.sum("df").alias("df"))
    a = sorted(
        map(tuple, term_vectors(
            docs, ids, meta, postings=postings, term_statistics=True
        ).collect())
    )
    b = sorted(
        map(tuple, term_vectors(
            docs, ids, meta, postings=postings, term_stats=side,
            term_statistics=True,
        ).collect())
    )
    assert a == b and a


def test_sum_term_freq_is_doc_len(spark):
    docs, postings, meta, ids = _build(spark)
    import pyspark.sql.functions as F

    got = {
        r["doc_id"]: r["n"]
        for r in term_vectors(docs, ids, meta)
        .groupBy("doc_id")
        .agg(F.sum("term_freq").alias("n"))
        .collect()
    }
    want = {d: len([w for w in t.split(" ") if w]) for d, t in DOCS if d in REQ}
    assert got == want


def test_standard_analyzer_vocabulary(spark):
    """With the standard analyzer the vectors live in ITS vocabulary."""
    docs = spark.createDataFrame(
        [(0, "The QUICK fox! The fox."), (1, "other")], "doc_id long, text string"
    )
    from sgpt_spark.functions.analyzer import analyze_py, tokenize_standard

    postings, meta = build_postings(
        docs, segment_size=2, tokenizer=tokenize_standard, py_tokenizer=analyze_py
    )
    ids = spark.createDataFrame([(0,)], "doc_id long")
    got = {
        r["term"]: (r["term_freq"], list(r["positions"]))
        for r in term_vectors(docs, ids, meta).collect()
    }
    assert got == {"the": (2, [0, 3]), "quick": (1, [1]), "fox": (2, [2, 4])}


def test_guard_needs_postings(spark):
    docs, postings, meta, ids = _build(spark)
    with pytest.raises(ValueError, match="needs the postings"):
        term_vectors(docs, ids, meta, term_statistics=True)
