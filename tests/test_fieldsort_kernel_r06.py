"""Round-6 reroute identity: the sort-by-field segment kernel (default)
== the pinned relational spelling — multi-key asc/desc, NULL values
under _last/_first, string + numeric keys, multi-segment splits."""

from __future__ import annotations

import pytest

from sgpt_spark.operators.fieldsort import sort_search_index

pytestmark = pytest.mark.usefixtures("spark")

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog", "en", 120),
    (1, "quick brown fox and quick brown fox again", "es", 40),
    (2, "a lazy lazy afternoon", None, 40),
    (3, "brown quick fox", "de", None),
    (4, "the fox is quick and brown", "en", 55),
    (5, "quick brown wolf", "fr", 900),
    (6, "nothing relevant here", "en", 10),
    (7, "fox fox fox lazy", "es", 120),
]
QUERIES = [(200, "quick brown fox"), (201, "lazy dog"), (202, "fox")]


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
        tuple(r[c] for c in r.asDict()) for r in rows
    )


@pytest.mark.parametrize("by", [
    [("lang", "asc"), ("n_chars", "desc")],
    [("n_chars", "asc")],
    [("n_chars", "desc"), ("lang", "desc")],
])
@pytest.mark.parametrize("missing", ["_last", "_first"])
@pytest.mark.parametrize("segsize", [3, 100])
def test_kernel_equals_relational(spark, by, missing, segsize):
    postings, dv, meta, q = _setup(spark, segsize)
    a = sort_search_index(spark, postings, meta, q, dv, by, k=5,
                          missing=missing)
    b = sort_search_index(spark, postings, meta, q, dv, by, k=5,
                          missing=missing, strategy="relational")
    assert _norm(a.collect()) == _norm(b.collect())


def test_strategy_guard(spark):
    postings, dv, meta, q = _setup(spark)
    with pytest.raises(ValueError):
        sort_search_index(spark, postings, meta, q, dv,
                          [("lang", "asc")], strategy="nope")
