"""Index-backed multi-field BM25 (ES multi_match best_fields through
the compressed per-field indexes) must be value-identical to the
exhaustive DataFrame operator — both analyzers, degenerate fields
included."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from sgpt_spark.functions.analyzer import analyze_py, tokenize_standard
from sgpt_spark.operators.index_search import search_multifield_index
from sgpt_spark.operators.indexer import build_multifield_index
from sgpt_spark.operators.search import bm25_multifield_search

SF = "/root/testdata/sf0.001"


def runs(rows):
    return sorted((r["qid"], r["rank"], r["doc_id"], r["score"]) for r in rows)


def test_matches_exhaustive_ws_on_documents(spark):
    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "text")
        .withColumn(
            "title", F.array_join(F.slice(F.split(F.col("text"), " ", -1), 1, 3), " ")
        )
    )
    queries = (
        docs.filter(F.col("doc_id") % 25 == 0)
        .select(
            F.col("doc_id").alias("qid"),
            F.array_join(F.slice(F.split("text", " ", -1), 1, 4), " ").alias("query"),
        )
    )
    want = runs(bm25_multifield_search(docs, queries, k=10).collect())

    out = tempfile.mkdtemp(prefix="sgpt_mf_")
    build_multifield_index(docs, out, fields=("title", "text"), segment_size=100)
    got = runs(search_multifield_index(spark, out, queries, k=10).collect())
    assert got == want and len(got) > 0


def test_matches_exhaustive_standard_with_degenerate_fields(spark):
    """Standard analyzer + adversarial fields: empty titles,
    punctuation-only titles (tokenize to NOTHING but are trim-nonempty
    — the per-field docCount trap), docs matching in one field only."""
    rows = []
    for i in range(60):
        title = (
            ""
            if i % 7 == 0
            else "!!! ..." if i % 7 == 1 else f"Shared Title alpha{i % 5}"
        )
        body = f"body token beta{i % 4} gamma{i % 9} common word filler number{i}"
        rows.append((i, title, body))
    docs = spark.createDataFrame(rows, "doc_id long, title string, text string")
    queries = spark.createDataFrame(
        [(1, "alpha1 beta2"), (2, "common word"), (3, "SHARED title."), (4, "zzz")],
        "qid long, query string",
    )
    want = runs(
        bm25_multifield_search(docs, queries, k=10, tokenizer=tokenize_standard).collect()
    )
    out = tempfile.mkdtemp(prefix="sgpt_mf_std_")
    build_multifield_index(
        docs, out, fields=("title", "text"), segment_size=17, py_tokenizer=analyze_py
    )
    got = runs(search_multifield_index(spark, out, queries, k=10).collect())
    assert got == want and len(got) > 0


def test_tie_breaker_variants(spark):
    """tie_breaker=0 (pure dis-max) and 1 (plain sum) must both match
    the exhaustive operator."""
    rows = [(i, f"alpha{i % 3} topic", f"alpha{i % 3} topic body word{i}") for i in range(30)]
    docs = spark.createDataFrame(rows, "doc_id long, title string, text string")
    queries = spark.createDataFrame([(1, "alpha1 topic")], "qid long, query string")
    out = tempfile.mkdtemp(prefix="sgpt_mf_tb_")
    build_multifield_index(docs, out, segment_size=10)
    for tb in (0.0, 1.0):
        want = runs(bm25_multifield_search(docs, queries, k=5, tie_breaker=tb).collect())
        got = runs(search_multifield_index(spark, out, queries, k=5, tie_breaker=tb).collect())
        assert got == want, tb


def test_join_path_matches_collect_path(spark, tmp_path):
    """search_multifield_index_join (no driver query collect) must be
    value-identical to the collect path — both analyzers, degenerate
    fields, every tie_breaker variant."""
    from sgpt_spark.operators.index_search import search_multifield_index_join

    rows = []
    for i in range(60):
        title = (
            "" if i % 7 == 0 else "!!! ..." if i % 7 == 1 else f"Shared Title alpha{i % 5}"
        )
        rows.append((i, title, f"body beta{i % 4} gamma{i % 9} common word filler number{i}"))
    docs = spark.createDataFrame(rows, "doc_id long, title string, text string")
    queries = spark.createDataFrame(
        [(1, "alpha1 beta2"), (2, "common word"), (3, "SHARED title."), (4, "zzz")],
        "qid long, query string",
    )
    for name, py_tok in (("ws", None), ("std", analyze_py)):
        out = str(tmp_path / f"mf_join_{name}")
        build_multifield_index(
            docs, out, fields=("title", "text"), segment_size=17, py_tokenizer=py_tok
        )
        for tb in (0.0, 0.5, 1.0):
            want = runs(search_multifield_index(spark, out, queries, k=10, tie_breaker=tb).collect())
            got = runs(
                search_multifield_index_join(spark, out, queries, k=10, tie_breaker=tb).collect()
            )
            assert got == want and got, (name, tb)


def test_multifield_exclude_self(spark, tmp_path):
    """exclude_self through the multifield index (per-segment k+1 +
    filter + global merge) == the exhaustive operator's filter — collect
    AND join paths; string qids must raise."""
    from sgpt_spark.operators.index_search import search_multifield_index_join

    rows = [
        (i, f"head alpha{i % 5}", f"body beta{i % 4} gamma{i % 7} word{i}")
        for i in range(60)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, title string, text string")
    # known-item queries: qid == source doc_id, so self would rank 1st
    queries = spark.createDataFrame(
        [(i, f"head alpha{i % 5} beta{i % 4}") for i in range(0, 60, 7)],
        "qid long, query string",
    )
    out = str(tmp_path / "mf_noself")
    build_multifield_index(docs, out, segment_size=20)
    want = runs(bm25_multifield_search(docs, queries, k=5, exclude_self=True).collect())
    got = runs(search_multifield_index(spark, out, queries, k=5, exclude_self=True).collect())
    got_join = runs(
        search_multifield_index_join(spark, out, queries, k=5, exclude_self=True).collect()
    )
    assert got == want and got_join == want and want
    assert all(qid != doc for qid, _, doc, _ in got)

    sq = spark.createDataFrame([("a", "head body")], "qid string, query string")
    for fn in (search_multifield_index, search_multifield_index_join):
        with pytest.raises(ValueError, match="integer qids"):
            fn(spark, out, sq, k=5, exclude_self=True)


def test_k1_b_mismatch_raises(spark, tmp_path):
    import json
    import os

    rows = [(i, f"t{i}", f"b{i} c{i}") for i in range(10)]
    docs = spark.createDataFrame(rows, "doc_id long, title string, text string")
    out = str(tmp_path / "mf_k1b")
    build_multifield_index(docs, out, segment_size=5)
    mp = os.path.join(out, "title_index", "meta.json")
    meta = json.load(open(mp))
    meta["k1"] = 0.9
    json.dump(meta, open(mp, "w"))
    queries = spark.createDataFrame([(1, "b1")], "qid long, query string")
    with pytest.raises(ValueError, match="disagree on k1"):
        search_multifield_index(spark, out, queries, k=5)


def test_custom_tokenizer_multifield_build(spark, tmp_path):
    """A custom py_tokenizer + its JVM twin must build and query; the
    same py_tokenizer WITHOUT the twin raises the actionable error."""
    def tok_comma(s):
        return [t for t in (s or "").split(",") if t]

    def tok_comma_jvm(col):
        return F.filter(F.split(col, ",", -1), lambda t: t != F.lit(""))

    rows = [(i, f"t{i % 3},shared", f"b{i % 4},shared,x{i}") for i in range(20)]
    docs = spark.createDataFrame(rows, "doc_id long, title string, text string")
    out = str(tmp_path / "mf_custom")
    with pytest.raises(ValueError, match="tokenizer="):
        build_multifield_index(docs, out, segment_size=7, py_tokenizer=tok_comma)
    build_multifield_index(
        docs, out, segment_size=7, py_tokenizer=tok_comma, tokenizer=tok_comma_jvm
    )
    queries = spark.createDataFrame([(1, "shared,b1")], "qid long, query string")
    want = runs(
        bm25_multifield_search(docs, queries, k=5, tokenizer=tok_comma_jvm).collect()
    )
    got = runs(
        search_multifield_index(spark, out, queries, k=5, tokenize=tok_comma).collect()
    )
    assert got == want and got


def test_analyzer_mismatch_raises(spark, tmp_path):
    import json
    import os

    rows = [(i, f"t{i}", f"b{i} c{i}") for i in range(10)]
    docs = spark.createDataFrame(rows, "doc_id long, title string, text string")
    out = str(tmp_path / "mf")
    build_multifield_index(docs, out, segment_size=5)
    # corrupt one field's analyzer record
    mp = os.path.join(out, "title_index", "meta.json")
    meta = json.load(open(mp))
    meta["analyzer"] = "analyze_py"
    json.dump(meta, open(mp, "w"))
    queries = spark.createDataFrame([(1, "b1")], "qid long, query string")
    with pytest.raises(ValueError, match="disagree on analyzer"):
        search_multifield_index(spark, out, queries, k=5)


def test_compact_multifield_preserves_results_with_missing_segment(spark, tmp_path):
    """Co-segmented compaction: one field is missing a segment (a
    partition whose titles were ALL empty), so per-field contiguous
    renumbering would diverge — the shared union mapping must keep
    results identical, and per-field compaction must refuse."""
    from sgpt_spark.operators.indexer import (
        compact_index,
        compact_multifield_index,
    )

    rows = []
    for i in range(60):
        # docs 20..39 (the middle range partition) have empty titles
        title = "" if 20 <= i < 40 else f"head alpha{i % 5}"
        rows.append((i, title, f"body beta{i % 4} gamma{i % 7} word{i}"))
    docs = spark.createDataFrame(rows, "doc_id long, title string, text string")
    out = str(tmp_path / "mf")
    build_multifield_index(docs, out, segment_size=20)  # 3 segments; title misses one

    title_segs = {
        r["segment"]
        for r in spark.read.parquet(f"{out}/title_index/postings")
        .select("segment").distinct().collect()
    }
    text_segs = {
        r["segment"]
        for r in spark.read.parquet(f"{out}/text_index/postings")
        .select("segment").distinct().collect()
    }
    assert title_segs < text_segs  # the invariant-breaking setup is real

    queries = spark.createDataFrame(
        [(1, "alpha1 beta2"), (2, "gamma3 word25"), (3, "head body")],
        "qid long, query string",
    )
    before = runs(search_multifield_index(spark, out, queries, k=10).collect())

    with pytest.raises(ValueError, match="co-segmentation"):
        compact_index(spark, f"{out}/title_index", 2)

    n = compact_multifield_index(spark, out, 2)
    assert n == 2
    after = runs(search_multifield_index(spark, out, queries, k=10).collect())
    assert after == before and before


def test_append_multifield_equals_rebuild(spark, tmp_path):
    """Incremental multifield append == full rebuild over the union
    corpus, with shared id/segment spaces across fields even when a
    field skips docs (empty titles) in both batches."""
    from sgpt_spark.streaming.incremental import append_to_multifield_index

    def batch(lo, hi):
        rows = []
        for i in range(lo, hi):
            title = "" if i % 5 == 0 else f"head alpha{i % 4}"
            rows.append((f"https://x/{i:05d}", title, f"body beta{i % 3} word{i}"))
        return spark.createDataFrame(rows, "url string, title string, text string")

    from sgpt_spark.operators.indexer import assign_doc_ids, release_doc_ids

    inc = str(tmp_path / "inc")
    b1, b2 = batch(0, 40), batch(40, 70)
    a1 = assign_doc_ids(b1.select("url", "title", "text"))
    build_multifield_index(a1.select("doc_id", "title", "text"), inc, segment_size=15)
    release_doc_ids(a1)
    metas = append_to_multifield_index(spark, b2, inc)
    assert metas["text"].n_docs == 70

    full = str(tmp_path / "full")
    au = assign_doc_ids(b1.unionByName(b2).select("url", "title", "text"))
    build_multifield_index(au.select("doc_id", "title", "text"), full, segment_size=15)
    release_doc_ids(au)

    queries = spark.createDataFrame(
        [(1, "alpha1 beta2"), (2, "head body"), (3, "word55")], "qid long, query string"
    )
    got = runs(search_multifield_index(spark, inc, queries, k=10).collect())
    want = runs(search_multifield_index(spark, full, queries, k=10).collect())
    assert got == want and got


def test_randomized_differential_index_vs_exhaustive(spark, tmp_path):
    """Randomized (title, text) corpora and queries: the index-backed
    multifield path must be rank- and score-identical to the exhaustive
    operator (itself DuckDB-oracle-gated) across trials with empty
    fields, tiny segments, and varying tie_breakers."""
    import random

    rng = random.Random(20260817)
    vocab = [f"w{i}" for i in range(40)] + ["the", "of"]
    for trial in range(3):
        n_docs = rng.randint(12, 50)
        rows = []
        for d in range(n_docs):
            title = "" if rng.random() < 0.2 else " ".join(
                rng.choices(vocab, k=rng.randint(1, 5))
            )
            text = "" if rng.random() < 0.1 else " ".join(
                rng.choices(vocab, k=rng.randint(0, 25))
            )
            rows.append((d, title, text))
        docs = spark.createDataFrame(rows, "doc_id long, title string, text string")
        queries = spark.createDataFrame(
            [(q, " ".join(rng.choices(vocab, k=rng.randint(1, 3)))) for q in range(5)],
            "qid long, query string",
        )
        k = rng.choice([3, 10])
        tb = rng.choice([0.0, 0.5, 1.0])
        want = runs(bm25_multifield_search(docs, queries, k=k, tie_breaker=tb).collect())
        out = str(tmp_path / f"mf_rnd_{trial}")
        build_multifield_index(docs, out, segment_size=rng.choice([5, 9, 100]))
        got = runs(
            search_multifield_index(spark, out, queries, k=k, tie_breaker=tb).collect()
        )
        assert got == want, f"trial {trial} k={k} tb={tb}"
