"""Cogroup query paths: in-plan queries with collect-path numpy
scoring. Must be value-identical to the broadcast paths (which are
oracle-gated) for every variant."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sgpt_spark.operators.index_search import (
    search_index,
    search_index_cogroup,
    search_multifield_index,
    search_multifield_index_cogroup,
)
from sgpt_spark.operators.indexer import (
    assign_doc_ids,
    build_index,
    build_multifield_index,
    read_index,
    release_doc_ids,
)
from sgpt_spark.sources.pages import generate_pages, make_page


@pytest.fixture(scope="module")
def corpus_indexes(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("cogroup")
    pages = generate_pages(spark, 400, partitions=4)
    a = assign_doc_ids(pages.select("url", "text"))
    build_index(a.select("doc_id", "text"), str(tmp / "idx"), segment_size=80)
    docs = a.withColumn(
        "title", F.array_join(F.slice(F.split("text", " ", -1), 1, 4), " ")
    ).select("doc_id", "title", "text")
    build_multifield_index(docs, str(tmp / "mf"), segment_size=80)
    release_doc_ids(a)
    return tmp


def _queries(spark, as_str=False):
    qs = []
    for i in (3, 7, 42, 99, 250):
        body = make_page(i)[3].split("\n")[1].split(" ")
        qid = f"q{i}" if as_str else i
        qs.append((qid, " ".join(body[:5])))
    t = "string" if as_str else "long"
    return spark.createDataFrame(qs, f"qid {t}, query string")


def test_cogroup_identity_with_broadcast_path(spark, corpus_indexes):
    postings, meta = read_index(spark, str(corpus_indexes / "idx"))
    queries = _queries(spark)
    ref = sorted(
        tuple(r) for r in search_index(spark, postings, meta, queries, k=12).collect()
    )
    got = sorted(
        tuple(r)
        for r in search_index_cogroup(spark, postings, meta, queries, k=12).collect()
    )
    assert got == ref and ref


def test_cogroup_string_qids_and_iterable(spark, corpus_indexes):
    postings, meta = read_index(spark, str(corpus_indexes / "idx"))
    queries = _queries(spark, as_str=True)
    ref = sorted(
        tuple(r) for r in search_index(spark, postings, meta, queries, k=8).collect()
    )
    got = sorted(
        tuple(r)
        for r in search_index_cogroup(spark, postings, meta, queries, k=8).collect()
    )
    assert got == ref and ref
    # iterable form routes through normalize_queries the same way
    pairs = [(r["qid"], r["query"]) for r in queries.collect()]
    got2 = sorted(
        tuple(r)
        for r in search_index_cogroup(spark, postings, meta, iter(pairs), k=8).collect()
    )
    assert got2 == ref


def test_cogroup_exclude_self(spark, corpus_indexes):
    postings, meta = read_index(spark, str(corpus_indexes / "idx"))
    queries = _queries(spark)
    ref = sorted(
        tuple(r)
        for r in search_index(
            spark, postings, meta, queries, k=12, exclude_self=True
        ).collect()
    )
    got = sorted(
        tuple(r)
        for r in search_index_cogroup(
            spark, postings, meta, queries, k=12, exclude_self=True
        ).collect()
    )
    assert got == ref and ref
    assert not any(r[0] == r[1] for r in got)
    with pytest.raises(ValueError):
        search_index_cogroup(
            spark, postings, meta, _queries(spark, as_str=True), k=5, exclude_self=True
        )


@pytest.mark.parametrize("tie", [0.0, 0.5, 1.0])
def test_multifield_cogroup_identity(spark, corpus_indexes, tie):
    queries = _queries(spark)
    ref = sorted(
        tuple(r)
        for r in search_multifield_index(
            spark, str(corpus_indexes / "mf"), queries, k=12, tie_breaker=tie
        ).collect()
    )
    got = sorted(
        tuple(r)
        for r in search_multifield_index_cogroup(
            spark, str(corpus_indexes / "mf"), queries, k=12, tie_breaker=tie
        ).collect()
    )
    assert got == ref and ref


def test_multifield_cogroup_exclude_self(spark, corpus_indexes):
    queries = _queries(spark)
    ref = sorted(
        tuple(r)
        for r in search_multifield_index(
            spark, str(corpus_indexes / "mf"), queries, k=12, exclude_self=True
        ).collect()
    )
    got = sorted(
        tuple(r)
        for r in search_multifield_index_cogroup(
            spark, str(corpus_indexes / "mf"), queries, k=12, exclude_self=True
        ).collect()
    )
    assert got == ref and ref
