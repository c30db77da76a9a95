"""Round-6 reroute identity: the function_score_multi docvalues-cogroup
kernel (default) == the pinned relational spelling — full-battery
functions (gauss + filtered weighted fvf + md5 random_score), every
boost_mode, min_score, max_boost, NULL field values, multi-segment."""

from __future__ import annotations

import pytest

from sgpt_spark.operators.funcscore import function_score_multi

pytestmark = pytest.mark.usefixtures("spark")

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog", "en", 120),
    (1, "quick brown fox and quick brown fox again", "es", 40),
    (2, "a lazy lazy afternoon", "en", None),
    (3, "brown quick fox", "de", 310),
    (4, "the fox is quick and brown", "en", 55),
    (5, "quick brown wolf", "fr", 900),
    (6, "nothing relevant here", "en", 10),
    (7, "fox fox fox lazy", "es", 77),
]
QUERIES = [(200, "quick brown fox"), (201, "lazy dog"), (202, "fox")]
FUNCS = [
    {"gauss": {"field": "n_chars", "origin": 500.0, "scale": 400.0,
               "decay": 0.4}},
    {"field_value_factor": {"field": "n_chars", "modifier": "sqrt",
                            "factor": 0.01},
     "weight": 0.5, "filter": "lang = 'en'"},
    {"random_score": {"seed": "42"}, "weight": 0.2},
]


def _setup(spark, segsize=3):
    from sgpt_spark.operators.indexer import build_postings_with_docvalues

    docs = spark.createDataFrame(
        DOCS, "doc_id long, text string, lang string, n_chars long"
    )
    postings, dv, meta = build_postings_with_docvalues(
        docs, ["lang", "n_chars"], segment_size=segsize
    )
    q = spark.createDataFrame(QUERIES, "qid long, query string")
    return postings, dv, meta, q


def _norm(rows):
    return sorted(
        (r["qid"], r["rank"], r["doc_id"], round(r["score"], 9))
        for r in rows
    )


@pytest.mark.parametrize("boost_mode", [
    "multiply", "replace", "sum", "avg", "max", "min",
])
def test_kernel_equals_relational_boost_modes(spark, boost_mode):
    postings, dv, meta, q = _setup(spark)
    kw = dict(score_mode="sum", boost_mode=boost_mode, max_boost=3.0, k=5)
    a = function_score_multi(spark, postings, meta, q, dv, FUNCS, **kw)
    b = function_score_multi(spark, postings, meta, q, dv, FUNCS,
                             strategy="relational", **kw)
    assert _norm(a.collect()) == _norm(b.collect())


@pytest.mark.parametrize("score_mode", ["multiply", "first", "max"])
def test_kernel_equals_relational_score_modes(spark, score_mode):
    postings, dv, meta, q = _setup(spark, segsize=100)
    kw = dict(score_mode=score_mode, boost_mode="multiply", k=5,
              min_score=0.1, boost=1.5)
    a = function_score_multi(spark, postings, meta, q, dv, FUNCS, **kw)
    b = function_score_multi(spark, postings, meta, q, dv, FUNCS,
                             strategy="relational", **kw)
    assert _norm(a.collect()) == _norm(b.collect())


def test_score_script_falls_back_to_relational(spark):
    """A script referencing _score cannot pre-evaluate per doc; the
    default must still answer (via the relational path) and equal the
    pinned spelling."""
    postings, dv, meta, q = _setup(spark)
    funcs = [{"script_score": {"source": "sqrt(_score) + n_chars / 100"}}]
    a = function_score_multi(spark, postings, meta, q, dv, funcs, k=5)
    b = function_score_multi(spark, postings, meta, q, dv, funcs, k=5,
                             strategy="relational")
    assert _norm(a.collect()) == _norm(b.collect())


def test_strategy_guard(spark):
    postings, dv, meta, q = _setup(spark)
    with pytest.raises(ValueError):
        function_score_multi(spark, postings, meta, q, dv, FUNCS,
                             strategy="nope")
