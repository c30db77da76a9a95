"""Round-6 reroute identity: terms_set kernel (default, per-query msm)
== pinned relational spelling, across msm_min values and segment
splits; msm_field stays relational."""

from __future__ import annotations

import pytest

from sgpt_spark.operators.termset import terms_set_search_index

pytestmark = pytest.mark.usefixtures("spark")

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "quick brown fox and quick brown fox again"),
    (2, "a lazy lazy afternoon"),
    (3, "brown quick fox"),
    (4, "the fox is quick and brown"),
    (5, "quick brown wolf"),
    (6, "nothing relevant here"),
    (7, "fox dog wolf lazy quick"),
]
SETS = [
    (200, ["quick", "brown", "fox"]),
    (201, ["lazy", "dog"]),
    (202, ["fox", "missingterm", "wolf"]),
]


@pytest.mark.parametrize("msm_min", [1, 2, 3])
@pytest.mark.parametrize("segsize", [3, 100])
def test_kernel_equals_relational(spark, msm_min, segsize):
    from sgpt_spark.operators.indexer import build_postings

    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    sets = spark.createDataFrame(SETS, "qid long, terms array<string>")
    postings, meta = build_postings(docs, segment_size=segsize)
    kern = terms_set_search_index(
        spark, postings, meta, sets, k=5, msm_min=msm_min
    ).collect()
    rel = terms_set_search_index(
        spark, postings, meta, sets, k=5, msm_min=msm_min,
        strategy="relational",
    ).collect()
    assert sorted(
        [(r["qid"], r["rank"], r["doc_id"], round(r["score"], 9))
         for r in kern]
    ) == sorted(
        [(r["qid"], r["rank"], r["doc_id"], round(r["score"], 9))
         for r in rel]
    )


def test_strategy_guard(spark):
    from sgpt_spark.operators.indexer import build_postings

    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    sets = spark.createDataFrame(SETS, "qid long, terms array<string>")
    postings, meta = build_postings(docs, segment_size=3)
    with pytest.raises(ValueError):
        terms_set_search_index(spark, postings, meta, sets, msm_min=1,
                               strategy="nope")
