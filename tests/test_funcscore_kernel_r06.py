"""Round-6 reroute identity: the function_score docvalues-cogroup
kernel (default) must equal the pinned relational spelling across
modifiers, boost modes, NULL/missing field values, and multi-segment
splits."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from sgpt_spark.operators.funcscore import function_score_index

pytestmark = pytest.mark.usefixtures("spark")

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog", 120),
    (1, "quick brown fox and quick brown fox again", 40),
    (2, "a lazy lazy afternoon", None),     # NULL field value -> missing
    (3, "brown quick fox", 310),
    (4, "the fox is quick and brown", 55),
    (5, "quick brown wolf", 900),
    (6, "nothing relevant here", 10),
    (7, "fox fox fox lazy", 77),
]
QUERIES = [(200, "quick brown fox"), (201, "lazy dog"), (202, "fox")]


@pytest.mark.parametrize("modifier,boost_mode", [
    ("log1p", "multiply"),
    ("none", "sum"),
    ("sqrt", "multiply"),
    ("reciprocal", "sum"),
])
@pytest.mark.parametrize("segsize", [3, 100])
def test_kernel_equals_relational(spark, modifier, boost_mode, segsize):
    from sgpt_spark.operators.indexer import build_postings_with_docvalues

    docs = spark.createDataFrame(
        DOCS, "doc_id long, text string, n_chars long"
    ).select("doc_id", "text", "n_chars")
    # build_postings_with_docvalues assigns its own ids off the staged
    # corpus; feed text with the side column
    postings, dv, meta = build_postings_with_docvalues(
        docs, ["n_chars"], segment_size=segsize
    )
    q = spark.createDataFrame(QUERIES, "qid long, query string")
    kern = function_score_index(
        spark, postings, meta, q, dv, "n_chars", factor=2.0,
        modifier=modifier, missing=1.5, boost_mode=boost_mode, k=5,
    ).collect()
    rel = function_score_index(
        spark, postings, meta, q, dv, "n_chars", factor=2.0,
        modifier=modifier, missing=1.5, boost_mode=boost_mode, k=5,
        strategy="relational",
    ).collect()
    assert sorted(
        [(r["qid"], r["rank"], r["doc_id"], round(r["score"], 9))
         for r in kern]
    ) == sorted(
        [(r["qid"], r["rank"], r["doc_id"], round(r["score"], 9))
         for r in rel]
    )


def test_kernel_strategy_guard(spark):
    from sgpt_spark.operators.indexer import build_postings_with_docvalues

    docs = spark.createDataFrame(
        DOCS, "doc_id long, text string, n_chars long"
    )
    postings, dv, meta = build_postings_with_docvalues(
        docs, ["n_chars"], segment_size=3
    )
    q = spark.createDataFrame(QUERIES, "qid long, query string")
    with pytest.raises(ValueError):
        function_score_index(spark, postings, meta, q, dv, "n_chars",
                             strategy="nope")


def test_segmentless_docvalues_fall_back_to_relational(spark):
    """A docvalues relation WITHOUT a segment column (external sidecar)
    silently takes the relational path — same results."""
    from sgpt_spark.operators.indexer import build_postings_with_docvalues

    docs = spark.createDataFrame(
        DOCS, "doc_id long, text string, n_chars long"
    )
    postings, dv, meta = build_postings_with_docvalues(
        docs, ["n_chars"], segment_size=3
    )
    q = spark.createDataFrame(QUERIES, "qid long, query string")
    noseg = dv.drop("segment")
    out = function_score_index(
        spark, postings, meta, q, noseg, "n_chars", modifier="log1p", k=5
    ).collect()
    ref = function_score_index(
        spark, postings, meta, q, dv, "n_chars", modifier="log1p", k=5,
        strategy="relational",
    ).collect()
    assert sorted([(r["qid"], r["rank"], r["doc_id"]) for r in out]) == \
        sorted([(r["qid"], r["rank"], r["doc_id"]) for r in ref])
