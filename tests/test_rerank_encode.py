"""Rerank semantics (reference entry point C) + dense-path stub (B)."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from sgpt_spark.operators.encode import embed_text_py, encode_corpus, encode_queries
from sgpt_spark.operators.rerank import rerank, stub_cross_encoder
from sgpt_spark.operators.search import bm25_search
from sgpt_spark.operators.similarity import cosine_topk
from sgpt_spark.sources.pages import generate_pages


@pytest.fixture(scope="module")
def corpus_queries(spark):
    pages = generate_pages(spark, 400, partitions=2)
    from sgpt_spark.operators.indexer import assign_doc_ids

    docs = assign_doc_ids(pages.select("url", "text"))
    docs.persist().count()
    q = (
        docs.filter((F.col("doc_id") % 50 == 3) & (F.length("text") > 0))
        .select(
            F.col("doc_id").cast("string").alias("qid"),
            F.array_join(
                F.slice(F.split(F.element_at(F.split("text", "\n"), 2), " ", -1), 1, 5), " "
            ).alias("query"),
        )
    )
    q.persist().count()
    return docs, q


def test_rerank_semantics(spark, corpus_queries):
    docs, q = corpus_queries
    run = bm25_search(docs, q.select(F.col("qid").cast("long").alias("qid"), "query"), k=30)
    run.persist().count()
    rr = rerank(
        run,
        docs,
        q.select(F.col("qid").cast("long").alias("qid"), "query"),
        top_k=10,
        scorer=stub_cross_encoder,
    )
    got: dict = {}
    for r in rr.collect():
        got.setdefault(r["qid"], []).append((r["rank"], r["doc_id"], r["score"]))
    base: dict = {}
    for r in run.collect():
        base.setdefault(r["qid"], []).append((r["rank"], r["doc_id"], r["score"]))
    assert set(got) == set(base)
    for qid, rows in got.items():
        rows.sort()
        brows = sorted(base[qid])
        # same membership, same count
        assert {d for _, d, _ in rows} == {d for _, d, _ in brows}
        head_docs = {d for rk, d, _ in brows if rk <= 10}
        # reranked head occupies ranks 1..|head| (possibly reordered)
        n_head = len(head_docs)
        assert {d for rk, d, _ in rows if rk <= n_head} == head_docs
        # tail preserves the original relative order
        tail_got = [d for rk, d, _ in rows if rk > n_head]
        tail_base = [d for rk, d, _ in brows if rk > 10]
        assert tail_got == tail_base
        # head is sorted by the new score desc, doc asc
        head_rows = [(s, d) for rk, d, s in rows if rk <= n_head]
        assert head_rows == sorted(head_rows, key=lambda t: (-t[0], t[1]))


def test_rerank_prefers_lexical_overlap(spark):
    docs = spark.createDataFrame(
        [(1, "aa bb cc dd"), (2, "aa xx yy zz"), (3, "qq rr ss tt")],
        "doc_id long, text string",
    )
    run = spark.createDataFrame(
        [("q", 3, 1.0, 1), ("q", 2, 0.9, 2), ("q", 1, 0.8, 3)],
        "qid string, doc_id long, score double, rank int",
    )
    qs = spark.createDataFrame([("q", "aa bb")], "qid string, query string")
    rr = {r["doc_id"]: r["rank"] for r in rerank(run, docs, qs, top_k=3).collect()}
    assert rr[1] == 1  # most overlap wins after rerank
    assert rr[3] == 3


def test_encode_deterministic_and_normalized(spark, corpus_queries):
    docs, q = corpus_queries
    emb = encode_corpus(docs.limit(50))
    rows = emb.collect()
    assert len(rows) == 50
    for r in rows[:5]:
        v = np.asarray(r["embedding"])
        assert abs(np.linalg.norm(v) - 1.0) < 1e-5 or np.allclose(v, 0)
    # UDF output == python twin
    one = docs.limit(1).collect()[0]
    got = [r for r in rows if r["vec_id"] == one["doc_id"]][0]
    # exact: the md5-arithmetic embedding is float64 end-to-end
    assert np.asarray(got["embedding"]).tolist() == embed_text_py(one["text"]).tolist()


def test_dense_pipeline_end_to_end(spark, corpus_queries):
    """encode corpus + queries -> cosine top-k: full dense-path plumbing.

    The stub encoder is lexical-hash based, so known-item recall is not a
    meaningful target (a 5-token prefix vs a 200-token position-weighted
    pooled doc) — the contract here is shape, score range, determinism.
    """
    docs, q = corpus_queries
    emb = encode_corpus(docs)
    qemb = encode_queries(q)
    run = cosine_topk(
        emb, qemb, k=5, id_col="vec_id", emb_col="embedding",
        qid_col="qid", qemb_col="embedding",
    )
    rows = run.collect()
    got: dict = {}
    for r in rows:
        got.setdefault(r["qid"], []).append((r["rank"], r["vec_id"], r["score"]))
    assert len(got) == q.count()
    for qid, hits in got.items():
        assert [h[0] for h in sorted(hits)] == list(range(1, len(hits) + 1))
        assert all(-1.0 - 1e-6 <= h[2] <= 1.0 + 1e-6 for h in hits)
    rows2 = sorted(map(tuple, run.collect()))
    assert rows2 == sorted(map(tuple, rows))  # deterministic re-run


def test_md5_embedding_duckdb_twin_bit_exact():
    """The SQL twin (encode.md5_embedding_sql) reproduces the Spark
    stub's pre-normalization embedding BIT-FOR-BIT: both sides compute
    exact int64 num/den and one IEEE division. Normalizing the DuckDB
    vector then matches embed_text_py to fp-noise only."""
    import duckdb

    from sgpt_spark.operators.encode import DIM, md5_embedding_sql

    texts = [
        (1, "hello world foo bar"),
        (2, "a  b   c"),
        (3, "single"),
        (4, "repeat repeat repeat xyz " * 40),
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE t(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", texts)
    sql = (
        "WITH "
        + md5_embedding_sql("d", "t", "doc_id", "text")[1:]
        + "\nSELECT vec_id, e FROM d_emb ORDER BY vec_id"
    )
    by_id = dict(texts)
    rows = con.execute(sql).fetchall()
    assert len(rows) == len(texts)
    import hashlib

    for vid, e in rows:
        toks = [x for x in by_id[vid].split(" ") if x]
        num = np.zeros(DIM, dtype=np.int64)
        for i, tk in enumerate(toks, 1):
            num += i * np.array(
                [
                    int(hashlib.md5(f"{tk}:{d}".encode()).hexdigest()[:8], 16) - 2**31
                    for d in range(DIM)
                ],
                dtype=np.int64,
            )
        den = len(toks) * (len(toks) + 1) // 2
        exact = (num.astype(np.float64) / float(den)).tolist()
        assert list(e) == exact  # bit-for-bit
        en = np.asarray(e) / np.linalg.norm(e)
        assert np.allclose(en, embed_text_py(by_id[vid]), atol=1e-12)
