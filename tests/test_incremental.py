"""Incremental appends must be result-identical to a full rebuild over
the union corpus — the property the avgdl-independent block metadata
guarantees (streaming/incremental.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sgpt_spark.operators.index_search import search_index
from sgpt_spark.operators.indexer import assign_doc_ids, build_postings, read_index, write_index
from sgpt_spark.sources.pages import generate_pages
from sgpt_spark.streaming.incremental import append_to_index, incremental_index_stream


def _queries(docs):
    return (
        docs.filter((F.col("doc_id") % 97 == 1) & (F.length("text") > 0))
        .select(
            F.col("doc_id").cast("string").alias("qid"),
            F.array_join(
                F.slice(F.split(F.element_at(F.split("text", "\n"), 2), " ", -1), 1, 4), " "
            ).alias("query"),
        )
    )


def _run_by_url(spark, postings, meta, queries, docs, k=10000):
    """Resolve doc ids to urls; with k covering every candidate the
    result SET is invariant to the id assignment (ids differ between an
    incremental build and a rebuild because url order interleaves langs,
    so tie order on doc_id is not comparable across the two — scores and
    membership are)."""
    run = search_index(spark, postings, meta, queries, k=k)
    rows = run.join(docs.select("doc_id", "url"), "doc_id").collect()
    return sorted((r["qid"], r["url"], r["score"]) for r in rows)


def test_append_equals_rebuild(spark, tmp_path):
    # batch 1 = docs [0, 800), batch 2 = docs [800, 1200): url order of
    # the union equals concatenation order, so doc ids line up exactly.
    all_pages = generate_pages(spark, 1200, partitions=5).persist()
    batch1 = all_pages.filter(F.col("url") < "https://example.org/en/doc00000800")
    # note: lang differs per url; filter on the doc number instead
    batch1 = all_pages.filter(F.substring_index("url", "doc", -1) < "00000800")
    batch2 = all_pages.subtract(batch1)

    # incremental: build on batch1, append batch2
    inc_path = str(tmp_path / "inc")
    docs1 = assign_doc_ids(batch1.select("url", "text"), num_partitions=3)
    p1, m1 = build_postings(docs1, segment_size=300)
    write_index(p1, m1, inc_path)
    merged = append_to_index(spark, batch2, inc_path)

    # full rebuild over the union
    full_docs = assign_doc_ids(all_pages.select("url", "text"), num_partitions=4)
    pf, mf = build_postings(full_docs, segment_size=300)

    assert merged.n_docs == mf.n_docs
    assert abs(merged.avgdl - mf.avgdl) < 1e-9
    assert merged.total_len == mf.total_len

    q = _queries(full_docs)
    q.persist().count()
    postings_inc, meta_inc = read_index(spark, inc_path)
    docs2 = assign_doc_ids(batch2.select("url", "text")).withColumn(
        "doc_id", F.col("doc_id") + docs1.count()
    )
    inc_docs = docs1.select("doc_id", "url").union(docs2.select("doc_id", "url"))
    got = _run_by_url(spark, postings_inc, meta_inc, q, inc_docs)
    want = _run_by_url(spark, pf, mf, q, full_docs)
    assert len(got) > 0 and got == want


def test_streaming_appends(spark, tmp_path):
    pages_dir = tmp_path / "pages_stream"
    pages_dir.mkdir()
    idx = str(tmp_path / "sidx")

    # initial index from the first file
    first = generate_pages(spark, 300, partitions=2)
    docs0 = assign_doc_ids(first.select("url", "text"))
    p0, m0 = build_postings(docs0, segment_size=200)
    write_index(p0, m0, idx)

    # two more files arrive "later"
    import pandas as pd

    from sgpt_spark.sources.pages import make_page

    for lo, hi, name in [(300, 500, "b1"), (500, 650, "b2")]:
        rows = [make_page(i) for i in range(lo, hi)]
        pdf = pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text", "lang"])
        pdf["warc_ts"] = pd.to_datetime(pdf["warc_ts"])
        spark.createDataFrame(pdf).write.parquet(str(pages_dir / name))

    q = incremental_index_stream(
        spark, str(pages_dir / "*"), idx, str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)

    postings, meta = read_index(spark, idx)
    assert meta.n_docs == 650 - 1  # doc 17 is the empty one in [0, 650)
    # every batch's docs are retrievable
    probe = spark.createDataFrame(
        [("p1", " ".join(make_page(640)[3].split("\n")[1].split(" ")[:4]))],
        "qid string, query string",
    )
    hits = search_index(spark, postings, meta, probe, k=5).collect()
    assert len(hits) > 0


def test_term_stats_fresh_after_append(spark, tmp_path):
    """build_index writes the (term, df) side table; appends merge it
    incrementally; search with term_stats == search with the fallback
    candidate aggregation."""
    from pyspark.sql import functions as F

    from sgpt_spark.operators.index_search import search_index
    from sgpt_spark.operators.indexer import read_index, read_term_stats
    from sgpt_spark.operators.indexer import build_index
    from sgpt_spark.sources.pages import generate_pages
    from sgpt_spark.streaming.incremental import append_to_index

    idx = str(tmp_path / "idx")
    pages = generate_pages(spark, 300, partitions=3)
    from sgpt_spark.operators.indexer import assign_doc_ids, release_doc_ids

    assigned = assign_doc_ids(pages.select("url", "text"))
    build_index(assigned.select("doc_id", "text"), idx, segment_size=100)
    release_doc_ids(assigned)

    batch2 = generate_pages(spark, 380, partitions=2).filter(
        ~F.col("url").isin([r["url"] for r in pages.select("url").collect()])
    )
    append_to_index(spark, batch2, idx)

    postings, meta = read_index(spark, idx)
    ts = read_term_stats(spark, idx)
    assert ts is not None
    # side table == re-aggregated postings
    want = {r["term"]: r["df"] for r in
            postings.groupBy("term").agg(F.sum("df").alias("df")).collect()}
    got = {r["term"]: r["df"] for r in ts.collect()}
    assert got == want
    # identical search results either way
    from sgpt_spark.sources.pages import make_page

    body = make_page(5)[3].split("\n")[1].split(" ")
    queries = spark.createDataFrame(
        [(1, " ".join(body[:4])), (2, " ".join(body[4:8]))], "qid long, query string"
    )
    a = sorted(tuple(r) for r in
               search_index(spark, postings, meta, queries, k=10).collect())
    b = sorted(tuple(r) for r in
               search_index(spark, postings, meta, queries, k=10, term_stats=ts).collect())
    assert a == b and a


def test_append_uses_index_analyzer(spark, tmp_path):
    """Appending to a standard-analyzer index must analyze the new docs
    with the standard analyzer — the incremental index must equal a full
    standard rebuild over the union corpus."""
    from sgpt_spark.functions.analyzer import analyze_py, tokenize_standard
    from sgpt_spark.operators.index_search import search_index
    from sgpt_spark.operators.indexer import (
        assign_doc_ids,
        build_index,
        read_index,
        release_doc_ids,
    )
    from sgpt_spark.operators.search import bm25_search

    rows1 = [(f"u{i:03d}", f"The Word{i % 7}, CASE tests! item {i}") for i in range(30)]
    # standalone "..." tokens: ws counts them, standard doesn't — so a
    # ws-tokenized stats scan would corrupt total_len/avgdl (regression
    # guard for the append stats-tokenizer bug)
    rows2 = [(f"v{i:03d}", f"More WORD{i % 5} ... doc {i} !!!") for i in range(12)]
    pages1 = spark.createDataFrame(rows1, "url string, text string")
    pages2 = spark.createDataFrame(rows2, "url string, text string")

    idx = str(tmp_path / "std_idx")
    a1 = assign_doc_ids(pages1)
    build_index(a1.select("doc_id", "text"), idx, py_tokenizer=analyze_py)
    release_doc_ids(a1)
    append_to_index(spark, pages2, idx)

    postings, meta = read_index(spark, idx)
    assert meta.analyzer == "analyze_py"
    from sgpt_spark.functions.analyzer import analyze_py as _ap

    want_total = sum(len(_ap(t)) for _, t in rows1 + rows2)
    assert meta.total_len == want_total  # stats counted with the INDEX analyzer
    queries = spark.createDataFrame(
        [(1, "word3 CASE"), (2, "punct doc"), (3, "THE more")], "qid long, query string"
    )
    got = sorted(tuple(r) for r in search_index(spark, postings, meta, queries, k=10).collect())

    # exhaustive standard search over the union corpus with the SAME ids
    union_docs = spark.createDataFrame(
        [(i, rows1[i][1]) for i in range(30)]
        + [(meta.next_doc_id - 12 + j, rows2[j][1]) for j in range(12)],
        "doc_id long, text string",
    )
    want = sorted(
        tuple(r)
        for r in bm25_search(union_docs, queries, k=10, tokenizer=tokenize_standard).collect()
    )
    assert got == want and got


def test_termstats_crash_window_is_safe(spark, tmp_path):
    """Failure atomicity of the (postings, termstats) pair: a job that
    dies in the window between the postings append and the termstats
    rebuild leaves NO termstats dir (only the set-aside copy). In that
    state (a) read_term_stats must fall back, never serve the stale
    side table, (b) search must equal the ground-truth aggregation, and
    (c) the next append must drop the stale set-aside and finish with a
    termstats table consistent with the postings."""
    import os
    import shutil

    from pyspark.sql import functions as F

    from sgpt_spark.operators.index_search import search_index
    from sgpt_spark.operators.indexer import (
        assign_doc_ids,
        build_index,
        read_index,
        read_term_stats,
        release_doc_ids,
    )
    from sgpt_spark.sources.pages import generate_pages, make_page
    from sgpt_spark.streaming.incremental import append_to_index

    idx = str(tmp_path / "idx")
    pages = generate_pages(spark, 200, partitions=2)
    assigned = assign_doc_ids(pages.select("url", "text"))
    build_index(assigned.select("doc_id", "text"), idx, segment_size=100)
    release_doc_ids(assigned)

    batch2 = generate_pages(spark, 260, partitions=2).filter(
        ~F.col("url").isin([r["url"] for r in pages.select("url").collect()])
    )
    append_to_index(spark, batch2, idx)

    # --- reconstruct the crash window: postings already appended (the
    # append above), termstats renamed aside, rebuild never ran ---------
    os.rename(f"{idx}/termstats", f"{idx}/termstats_prev")
    assert read_term_stats(spark, idx) is None  # (a) stale table not served

    postings, meta = read_index(spark, idx)
    body = make_page(5)[3].split("\n")[1].split(" ")
    queries = spark.createDataFrame([(1, " ".join(body[:4]))], "qid long, query string")
    want = sorted(tuple(r) for r in
                  search_index(spark, postings, meta, queries, k=10).collect())
    assert want  # (b) fallback aggregation serves correct results

    # --- (c) next append recovers: stale aside dropped, fresh termstats
    batch3 = generate_pages(spark, 300, partitions=2).filter(F.col("url").contains("9"))
    append_to_index(spark, batch3.limit(20), idx)
    assert not os.path.isdir(f"{idx}/termstats_prev")
    ts = read_term_stats(spark, idx)
    postings2, _ = read_index(spark, idx)
    if ts is not None:
        wantdf = {r["term"]: r["df"] for r in
                  postings2.groupBy("term").agg(F.sum("df").alias("df")).collect()}
        gotdf = {r["term"]: r["df"] for r in ts.collect()}
        assert gotdf == wantdf
    shutil.rmtree(idx, ignore_errors=True)
