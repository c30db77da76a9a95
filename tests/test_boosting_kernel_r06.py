"""Round-6 reroute identity: the boosting segment kernel (default) must
equal the pinned relational spelling row for row, across negative_boost
values, multi-segment splits, and corpus-absent negative terms (the
dis_max kernel==relational convention)."""

from __future__ import annotations

import pytest

from sgpt_spark.operators.boosting import boosting_search_index

pytestmark = pytest.mark.usefixtures("spark")

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "quick brown fox and quick brown fox again"),
    (2, "a lazy lazy afternoon"),
    (3, "brown quick fox"),
    (4, "the fox is quick and brown"),
    (5, "quick brown wolf"),
    (6, "nothing relevant here"),
    (7, "fox fox fox lazy"),
    (8, "dog dog quick"),
]
QUERIES = [(200, "quick brown fox"), (201, "lazy dog"), (202, "fox")]
NEG = [(200, "lazy"), (201, "unicornium"), (202, "dog wolf")]


@pytest.mark.parametrize("nb", [0.0, 0.5, 0.3, 1.0])
@pytest.mark.parametrize("segsize", [3, 100])
def test_kernel_equals_relational(spark, nb, segsize):
    from sgpt_spark.operators.indexer import build_postings

    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    q = spark.createDataFrame(QUERIES, "qid long, query string")
    neg = spark.createDataFrame(NEG, "qid long, query string")
    postings, meta = build_postings(docs, segment_size=segsize)
    kern = boosting_search_index(
        spark, postings, meta, q, neg, k=5, negative_boost=nb
    ).collect()
    rel = boosting_search_index(
        spark, postings, meta, q, neg, k=5, negative_boost=nb,
        strategy="relational",
    ).collect()
    key = lambda r: (r["qid"], r["rank"])  # noqa: E731
    assert sorted(
        [(r["qid"], r["rank"], r["doc_id"], round(r["score"], 9))
         for r in kern]
    ) == sorted(
        [(r["qid"], r["rank"], r["doc_id"], round(r["score"], 9))
         for r in rel]
    )


def test_kernel_strategy_guard(spark):
    from sgpt_spark.operators.indexer import build_postings

    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    q = spark.createDataFrame(QUERIES, "qid long, query string")
    neg = spark.createDataFrame(NEG, "qid long, query string")
    postings, meta = build_postings(docs, segment_size=3)
    with pytest.raises(ValueError):
        boosting_search_index(spark, postings, meta, q, neg,
                              strategy="nope")
