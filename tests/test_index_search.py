"""Compressed-index path: doc-id assignment determinism, index build,
and rank/score identity vs the exhaustive DataFrame path and the
brute-force oracle (SURVEY.md §7.2 steps 3-5)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from oracle.bm25_oracle import bm25_topk
from sgpt_spark.operators.index_search import search_index
from sgpt_spark.operators.indexer import assign_doc_ids, build_postings
from sgpt_spark.operators.search import bm25_search
from sgpt_spark.sources.pages import generate_pages

N_DOCS = 1500
SEGMENT_SIZE = 300  # forces multi-segment merge


@pytest.fixture(scope="module")
def indexed(spark):
    pages = generate_pages(spark, N_DOCS, partitions=8)
    docs = assign_doc_ids(pages, num_partitions=6).select("doc_id", "url", "text")
    docs.persist().count()
    postings, meta = build_postings(docs, segment_size=SEGMENT_SIZE)
    postings.persist().count()
    return docs, postings, meta


@pytest.fixture(scope="module")
def queryset(spark, indexed):
    docs, _, _ = indexed
    # known-item queries: first 4 body terms of every 100th doc
    q = (
        docs.filter((F.col("doc_id") % 100 == 3) & (F.length("text") > 0))
        .select(
            F.col("doc_id").cast("string").alias("qid"),
            F.array_join(
                F.slice(F.split(F.element_at(F.split("text", "\n"), 2), " ", -1), 1, 4), " "
            ).alias("query"),
        )
    )
    q.persist().count()
    return q


def test_doc_id_assignment(spark, indexed):
    docs, _, meta = indexed
    rows = docs.select("doc_id", "url").collect()
    ids = sorted(r["doc_id"] for r in rows)
    assert ids == list(range(len(rows)))  # dense 0..n-1
    by_url = sorted(rows, key=lambda r: r["url"])
    assert [r["doc_id"] for r in by_url] == list(range(len(rows)))  # url order


def test_doc_id_assignment_partitioning_invariant(spark):
    pages = generate_pages(spark, 400, partitions=3).select("url", "text")
    a = {r["url"]: r["doc_id"] for r in assign_doc_ids(pages, num_partitions=2).collect()}
    b = {r["url"]: r["doc_id"] for r in assign_doc_ids(pages, num_partitions=5).collect()}
    assert a == b


def test_postings_stats(indexed):
    docs, postings, meta = indexed
    n_nonempty = docs.filter(F.length(F.trim("text")) > 0).count()
    assert meta.n_docs == n_nonempty
    # df summed over segments == distinct docs containing the term
    seg_df = {r["term"]: r["df"] for r in
              postings.groupBy("term").agg(F.sum("df").alias("df")).collect()
              if r["term"] == "term000000"}
    truth = (
        docs.filter(F.length(F.trim("text")) > 0)
        .filter(F.array_contains(F.split("text", " "), "term000000"))
        .count()
    )
    assert seg_df["term000000"] == truth


def test_index_search_matches_exhaustive(spark, indexed, queryset):
    docs, postings, meta = indexed
    got = search_index(spark, postings, meta, queryset, k=10).collect()
    want = bm25_search(docs, queryset, k=10).collect()
    g = sorted((r["qid"], r["rank"], r["doc_id"], r["score"]) for r in got)
    w = sorted((r["qid"], r["rank"], r["doc_id"], r["score"]) for r in want)
    assert len(g) == len(w) > 0
    for a, b in zip(g, w):
        assert a[:3] == b[:3]
        assert math.isclose(a[3], b[3], abs_tol=1e-6)


def test_index_search_matches_oracle(spark, indexed, queryset):
    docs, postings, meta = indexed
    corpus = {r["doc_id"]: r["text"] for r in docs.collect()}
    queries = {r["qid"]: r["query"] for r in queryset.collect()}
    got: dict = {}
    for r in search_index(spark, postings, meta, queryset, k=10).collect():
        got.setdefault(r["qid"], []).append((r["rank"], r["doc_id"], r["score"]))
    want = bm25_topk(corpus, queries, k=10)
    assert set(got) == {q for q, h in want.items() if h}
    for qid, hits in got.items():
        hits.sort()
        assert [(h[1]) for h in hits] == [int(w[0]) for w in want[qid]], qid
        for h, w in zip(hits, want[qid]):
            assert math.isclose(h[2], w[1], abs_tol=1e-6)


def test_unknown_query_terms(spark, indexed):
    _, postings, meta = indexed
    q = spark.createDataFrame(
        [("qx", "zzznotaterm qqqalsonot")], "qid string, query string"
    )
    assert search_index(spark, postings, meta, q, k=10).count() == 0


def test_build_index_single_pass_equivalent(spark, indexed, queryset, tmp_path_factory):
    """build_index (one corpus pass, sentinel stats rows) produces the
    same IndexMeta and identical query results as build_postings +
    write_index (three passes)."""
    from sgpt_spark.operators.indexer import build_index, read_index, write_index

    docs, postings, meta = indexed
    base = str(tmp_path_factory.mktemp("idx"))
    write_index(postings, meta, f"{base}/three_pass")
    meta1 = build_index(docs, f"{base}/one_pass", segment_size=SEGMENT_SIZE)
    assert meta1.n_docs == meta.n_docs
    assert meta1.total_len == meta.total_len
    assert abs(meta1.avgdl - meta.avgdl) < 1e-9
    assert meta1.next_doc_id == meta.next_doc_id

    p1, m1 = read_index(spark, f"{base}/one_pass")
    # sentinel rows are invisible through read_index
    assert p1.filter(F.col("term").isNull()).count() == 0
    got = search_index(spark, p1, m1, queryset, k=10).collect()
    want = search_index(spark, postings, meta, queryset, k=10).collect()
    g = sorted((r["qid"], r["rank"], r["doc_id"], round(r["score"], 6)) for r in got)
    w = sorted((r["qid"], r["rank"], r["doc_id"], round(r["score"], 6)) for r in want)
    assert g == w and len(g) > 0


def test_build_index_stats_count_whitespace_and_empty(spark, tmp_path_factory):
    """Sentinel stats match the non_empty_text semantics: space-only
    docs are excluded from N/avgdl but still advance next_doc_id."""
    from sgpt_spark.operators.indexer import build_index

    docs = spark.createDataFrame(
        [(0, "alpha beta"), (1, "   "), (2, ""), (3, None), (4, "gamma")],
        "doc_id long, text string",
    ).repartition(2)
    path = str(tmp_path_factory.mktemp("idx2") / "i")
    meta = build_index(docs, path, segment_size=10)
    assert meta.n_docs == 2
    assert meta.total_len == 3
    assert meta.next_doc_id == 5


def test_assign_doc_ids_fast_deterministic(spark, tmp_path_factory):
    """Fast (shuffle-free) ids: dense 0..n-1, and identical across two
    scans of the same parquet snapshot under the same session conf."""
    from sgpt_spark.operators.indexer import assign_doc_ids_fast

    path = str(tmp_path_factory.mktemp("fastids") / "pages")
    generate_pages(spark, 500, partitions=4).write.parquet(path)
    src = spark.read.parquet(path).select("url", "text")
    a = {r["url"]: r["doc_id"] for r in assign_doc_ids_fast(src).collect()}
    b = {r["url"]: r["doc_id"] for r in
         assign_doc_ids_fast(spark.read.parquet(path).select("url", "text")).collect()}
    assert a == b
    assert sorted(a.values()) == list(range(500))


def test_join_path_matches_collect_path(spark):
    """search_index_join (no driver-side query collect) is rank- and
    score-identical to the broadcast TAAT path, including the standard
    analyzer resolved from IndexMeta and exclude_self."""
    import tempfile

    from sgpt_spark.functions.analyzer import analyze_py
    from sgpt_spark.operators.index_search import search_index, search_index_join
    from sgpt_spark.operators.indexer import build_index, build_postings, read_index
    from sgpt_spark.sources.pages import _VOCAB, _doc_terms

    rows = [(i, " ".join(_VOCAB[_doc_terms(i)][:40])) for i in range(80)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    queries = spark.createDataFrame(
        [(i, " ".join(rows[i][1].split(" ")[:5])) for i in range(0, 80, 9)],
        "qid long, query string",
    )
    postings, meta = build_postings(docs, segment_size=20)
    a = sorted(tuple(r) for r in search_index(spark, postings, meta, queries, k=10).collect())
    b = sorted(tuple(r) for r in search_index_join(spark, postings, meta, queries, k=10).collect())
    assert a == b and a
    # exclude_self agreement
    a2 = sorted(tuple(r) for r in
                search_index(spark, postings, meta, queries, k=10, exclude_self=True).collect())
    b2 = sorted(tuple(r) for r in
                search_index_join(spark, postings, meta, queries, k=10, exclude_self=True).collect())
    assert a2 == b2 and a2
    # standard analyzer resolved from meta
    path = tempfile.mkdtemp(prefix="sgpt_join_std_")
    build_index(docs.repartition(4, "doc_id"), path, py_tokenizer=analyze_py)
    p2, m2 = read_index(spark, path)
    qs2 = spark.createDataFrame([(1, rows[3][1].split(" ")[0].upper() + "!")],
                                "qid long, query string")
    s1 = sorted(tuple(r) for r in search_index(spark, p2, m2, qs2, k=10).collect())
    s2 = sorted(tuple(r) for r in search_index_join(spark, p2, m2, qs2, k=10).collect())
    assert s1 == s2 and s1


def test_term_stats_dict_equals_dataframe(spark, tmp_path):
    """A pre-collected {term: df} dict (read_term_stats_dict — the
    long-running-service shape) must give bit-identical results to the
    DataFrame side table and to no side table at all."""
    from pyspark.sql import functions as F

    from sgpt_spark.operators.index_search import search_index
    from sgpt_spark.operators.indexer import (
        assign_doc_ids,
        build_index,
        read_index,
        read_term_stats,
        read_term_stats_dict,
        release_doc_ids,
    )
    from sgpt_spark.sources.pages import generate_pages

    idx = str(tmp_path / "idx")
    assigned = assign_doc_ids(generate_pages(spark, 200, partitions=2).select("url", "text"))
    build_index(assigned.select("doc_id", "text"), idx, segment_size=50)
    release_doc_ids(assigned)
    postings, meta = read_index(spark, idx)
    some = (
        generate_pages(spark, 200, partitions=2)
        .filter(F.length("text") > 20).select("text").first()["text"]
    )
    queries = [("q1", " ".join(some.split()[:4])), ("q2", " ".join(some.split()[4:7]))]
    runs = []
    for ts in (None, read_term_stats(spark, idx), read_term_stats_dict(spark, idx)):
        runs.append(sorted(
            tuple(r) for r in search_index(spark, postings, meta, queries, k=10,
                                           term_stats=ts).collect()
        ))
    assert runs[0] == runs[1] == runs[2] and runs[0]
