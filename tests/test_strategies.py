"""All three query strategies (taat / wand / exhaustive) must return
bit-identical results."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sgpt_spark.operators.index_search import search_index
from sgpt_spark.operators.indexer import assign_doc_ids, build_postings
from sgpt_spark.sources.pages import generate_pages


@pytest.fixture(scope="module")
def setup(spark):
    pages = generate_pages(spark, 1200, partitions=6)
    docs = assign_doc_ids(pages, num_partitions=5)
    docs.persist().count()
    postings, meta = build_postings(docs, segment_size=250)
    postings.persist().count()
    q = (
        docs.filter((F.col("doc_id") % 40 == 3) & (F.length("text") > 0))
        .select(
            F.col("doc_id").cast("string").alias("qid"),
            F.array_join(
                F.slice(F.split(F.element_at(F.split("text", "\n"), 2), " ", -1), 1, 5), " "
            ).alias("query"),
        )
    )
    q.persist().count()
    return postings, meta, q


@pytest.mark.parametrize("k", [1, 10, 50])
def test_strategies_identical(spark, setup, k):
    postings, meta, q = setup
    runs = {
        s: sorted(
            map(tuple, search_index(spark, postings, meta, q, k=k, strategy=s).collect())
        )
        for s in ["taat", "wand", "exhaustive"]
    }
    assert len(runs["taat"]) > 0
    assert runs["taat"] == runs["wand"] == runs["exhaustive"]
