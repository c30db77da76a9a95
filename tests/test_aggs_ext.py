"""ES rare_terms / multi_terms / adjacency_matrix / diversified_sampler
(operators/aggs_ext.py): from-scratch Python brute forces over the
shared toy corpus + match set, ES bucket-order and exclusion semantics,
sampler-degeneration identities, and the guards."""

from __future__ import annotations

import pytest

from sgpt_spark.operators.aggs import match_candidates, sampler_candidates
from sgpt_spark.operators.aggs_ext import (
    adjacency_matrix_agg,
    diversified_sampler_candidates,
    multi_terms_agg,
    rare_terms_agg,
)
from sgpt_spark.operators.indexer import build_postings_with_docvalues

pytestmark = pytest.mark.usefixtures("spark")

DOCS = [
    (0, "quick brown fox", "en", 150),
    (1, "quick dog", "en", 40),
    (2, "lazy dog sleeps", "es", 260),
    (3, "quick quick brown", "es", 155),
    (4, "a cat", "fr", 30),
    (5, "brown bear quick", None, 520),  # null lang
    (6, "unrelated words only", "de", 99),
    (7, "quick brown dance", "en", 41),
]
SCHEMA = "doc_id long, text string, lang string, n_chars long"
QUERIES = [(100, "quick"), (101, "brown dog"), (102, "absentterm")]
ROWS = {d[0]: d for d in DOCS}


def _brute_match():
    out = set()
    for qid, q in QUERIES:
        for d, t, *_ in DOCS:
            if any(w in t.split() for w in q.split()):
                out.add((qid, d))
    return out


def _build(spark):
    docs = spark.createDataFrame(DOCS, SCHEMA)
    postings, dv, meta = build_postings_with_docvalues(
        docs.repartition(3), ["lang", "n_chars"], segment_size=3
    )
    cand = match_candidates(
        spark, postings, meta,
        spark.createDataFrame(QUERIES, "qid long, query string"),
    )
    return cand, dv


# ---- rare_terms -------------------------------------------------------------


def _brute_rare(max_doc_count):
    counts: dict = {}
    for qid, d in _brute_match():
        v = ROWS[d][2]
        if v is None:
            continue
        counts[(qid, v)] = counts.get((qid, v), 0) + 1
    by_qid: dict = {}
    for (qid, v), c in counts.items():
        if c <= max_doc_count:
            by_qid.setdefault(qid, []).append((c, v))
    out = []
    for qid, vs in by_qid.items():
        vs.sort()
        for rk, (c, v) in enumerate(vs, 1):
            out.append((qid, v, c, rk))
    return sorted(out)


@pytest.mark.parametrize("mdc", [1, 2])
def test_rare_terms_brute_force(spark, mdc):
    cand, dv = _build(spark)
    got = sorted(
        (r["qid"], r["value"], r["doc_count"], r["bucket_rank"])
        for r in rare_terms_agg(cand, dv, "lang", max_doc_count=mdc).collect()
    )
    assert got == _brute_rare(mdc) and len(got) > 0
    assert all(c <= mdc for _, _, c, _ in got)
    # rare_terms is the complement of a frequent-terms cut: 'en' has 3
    # quick-matching docs -> excluded at mdc=1, still excluded at 2
    assert not [r for r in got if r[0] == 100 and r[1] == "en"]


# ---- multi_terms ------------------------------------------------------------


def _brute_multi(size):
    counts: dict = {}
    for qid, d in _brute_match():
        lang, n = ROWS[d][2], ROWS[d][3]
        if lang is None or n is None:
            continue
        counts[(qid, lang, str(n))] = counts.get((qid, lang, str(n)), 0) + 1
    by_qid: dict = {}
    for (qid, l, v), c in counts.items():
        by_qid.setdefault(qid, []).append((-c, l, v))
    out = []
    for qid, ks in by_qid.items():
        ks.sort()
        for rk, (nc, l, v) in enumerate(ks[:size], 1):
            out.append((qid, l, v, -nc, rk))
    return sorted(out)


def test_multi_terms_brute_force(spark):
    cand, dv = _build(spark)
    got = sorted(
        (r["qid"], r["value_lang"], r["value_n_chars"], r["doc_count"],
         r["bucket_rank"])
        for r in multi_terms_agg(cand, dv, ["lang", "n_chars"], size=3).collect()
    )
    assert got == _brute_multi(3) and len(got) > 0
    # doc 5 (null lang) excluded even though n_chars is present
    assert not [r for r in got if r[2] == "520"]


def test_multi_terms_guards(spark):
    cand, dv = _build(spark)
    with pytest.raises(ValueError, match=">= 2 fields"):
        multi_terms_agg(cand, dv, ["lang"])
    with pytest.raises(ValueError, match="not in docvalues"):
        multi_terms_agg(cand, dv, ["lang", "nope"])


# ---- adjacency_matrix -------------------------------------------------------

FILTERS = {
    "en": "lang = 'en'",
    "es": "lang = 'es'",
    "long": "n_chars >= 100",
}


def _brute_adjacency():
    counts: dict = {}
    for qid, d in _brute_match():
        lang, n = ROWS[d][2], ROWS[d][3]
        names = []
        if lang == "en":
            names.append("en")
        if lang == "es":
            names.append("es")
        if n >= 100:
            names.append("long")
        names.sort()
        for i, a in enumerate(names):
            counts[(qid, a)] = counts.get((qid, a), 0) + 1
            for b in names[i + 1:]:
                key = f"{a}&{b}"
                counts[(qid, key)] = counts.get((qid, key), 0) + 1
    return sorted((q, k, c) for (q, k), c in counts.items())


def test_adjacency_matrix_brute_force(spark):
    cand, dv = _build(spark)
    got = sorted(
        (r["qid"], r["key"], r["doc_count"])
        for r in adjacency_matrix_agg(cand, dv, FILTERS).collect()
    )
    assert got == _brute_adjacency() and len(got) > 0
    # intersections exist (doc 0: en & long for q100) and empty pairs
    # are omitted (nothing is both en and es)
    assert [r for r in got if r[1] == "en&long"]
    assert not [r for r in got if r[1] == "en&es"]


def test_adjacency_matrix_guards(spark):
    cand, dv = _build(spark)
    with pytest.raises(ValueError, match="at least one"):
        adjacency_matrix_agg(cand, dv, {})
    with pytest.raises(ValueError, match="separator"):
        adjacency_matrix_agg(cand, dv, {"a&b": "lang = 'en'"})


# ---- diversified_sampler ----------------------------------------------------


def _scored(spark):
    # deterministic scored match set: higher doc_id scores lower
    rows = [(q, d, float(10 - d)) for q, d in sorted(_brute_match())]
    return spark.createDataFrame(rows, "qid long, doc_id long, score double")


def test_diversified_dedups_per_value(spark):
    _, dv = _build(spark)
    got = sorted(
        (r["qid"], r["doc_id"])
        for r in diversified_sampler_candidates(
            _scored(spark), dv, "lang", shard_size=10, max_docs_per_value=1
        ).collect()
    )
    # per (qid, lang) only the best-scoring (lowest doc_id) survives:
    # q100 matches docs 0,1,3,5,7 -> en keeps 0 (not 1/7), es keeps 3,
    # null-lang group keeps 5
    q100 = [d for q, d in got if q == 100]
    assert q100 == [0, 3, 5]


def test_diversified_degenerates_to_sampler(spark):
    _, dv = _build(spark)
    scored = _scored(spark)
    a = sorted(
        (r["qid"], r["doc_id"])
        for r in diversified_sampler_candidates(
            scored, dv, "lang", shard_size=3, max_docs_per_value=99
        ).collect()
    )
    b = sorted(
        (r["qid"], r["doc_id"])
        for r in sampler_candidates(scored, shard_size=3).collect()
    )
    assert a == b and len(a) > 0


def test_diversified_guards(spark):
    _, dv = _build(spark)
    scored = _scored(spark)
    with pytest.raises(ValueError, match="not in docvalues"):
        diversified_sampler_candidates(scored, dv, "nope")
    with pytest.raises(ValueError, match=">= 1"):
        diversified_sampler_candidates(scored, dv, "lang", shard_size=0)
