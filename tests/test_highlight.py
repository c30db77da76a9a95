"""Highlighting (ES search-response highlighter role): per-occurrence
match positions for top-k hits off the positional sidecar, verified
against a brute-force Python tokenizer walk; plus the migrated DuckDB
evidence for bm25_noself_top10, whose driver-window slot the highlight
gate took (registry round-5 swap)."""

from __future__ import annotations

import tempfile

import pytest

from sgpt_spark.operators.highlight import highlight_positions, highlight_search
from sgpt_spark.operators.indexer import read_term_stats
from sgpt_spark.operators.positions import build_positional_index
from tests.test_phrase import DOCS, QUERIES


@pytest.fixture(scope="module")
def pos_index(spark):
    path = tempfile.mkdtemp(prefix="hlidx_")
    docs = spark.createDataFrame(DOCS, "doc_id long, text string").repartition(
        3, "doc_id"
    )
    build_positional_index(docs, path, segment_size=3)
    return path


def brute_highlight(docs, hits, qterms):
    """hits: {(qid, doc_id)}; qterms: {qid: set(terms)} -> set of
    (qid, doc_id, term, pos)."""
    toks = {d: [x for x in t.split(" ") if x] for d, t in docs}
    out = set()
    for qid, d in hits:
        for p, term in enumerate(toks.get(d, []), start=1):
            if term in qterms.get(qid, ()):
                out.add((qid, d, term, p))
    return out


def test_highlight_positions_matches_brute_force(spark, pos_index):
    qs = spark.createDataFrame(QUERIES, "qid long, query string")
    results = spark.createDataFrame(
        [(100, 1), (100, 3), (101, 2), (102, 6), (106, 7)],
        "qid long, doc_id long",
    )
    got = {
        (r["qid"], r["doc_id"], r["term"], r["pos"])
        for r in highlight_positions(spark, pos_index, results, qs).collect()
    }
    qterms = {qid: set(q.split(" ")) for qid, q in QUERIES}
    want = brute_highlight(
        DOCS, {(100, 1), (100, 3), (101, 2), (102, 6), (106, 7)}, qterms
    )
    assert got == want and len(got) > 0
    # semantic corners: doc 3 has all three terms in the wrong order —
    # the highlighter still marks each occurrence (ES does too)
    assert (100, 3, "quick", 2) in got
    # doc 2 "a a a a": every position of the duplicate term
    assert {(101, 2, "a", p) for p in (1, 2, 3, 4)} <= got


def test_highlight_search_end_to_end(spark, pos_index):
    """Top-k + highlight in one call: every emitted (qid, doc_id) is a
    top-k hit, every occurrence of each matched query term is present,
    and positions are analyzer-exact."""
    from sgpt_spark.operators.index_search import search_index
    from sgpt_spark.operators.indexer import read_index

    qs = spark.createDataFrame(
        [(100, "quick brown fox"), (101, "a a")], "qid long, query string"
    )
    rows = highlight_search(
        spark, pos_index, qs, k=3, term_stats=read_term_stats(spark, pos_index)
    ).collect()
    run = {
        (r["qid"], r["doc_id"]): r["rank"]
        for r in search_index(
            spark, *read_index(spark, pos_index), qs, k=3
        ).collect()
    }
    got = {(r["qid"], r["doc_id"], r["term"], r["pos"]) for r in rows}
    assert got == brute_highlight(
        DOCS, set(run), {100: {"quick", "brown", "fox"}, 101: {"a"}}
    )
    for r in rows:  # rank column rides along correctly
        assert run[(r["qid"], r["doc_id"])] == r["rank"]


def test_highlight_empty_and_absent(spark, pos_index):
    qs = spark.createDataFrame(
        [(1, "unicornium"), (2, "   "), (3, None)], "qid long, query string"
    )
    results = spark.createDataFrame([(1, 0), (2, 0), (3, 0)], "qid long, doc_id long")
    assert highlight_positions(spark, pos_index, results, qs).count() == 0


def test_highlight_refuses_plain_index(spark):
    from sgpt_spark.operators.indexer import build_index

    plain = tempfile.mkdtemp(prefix="hlplain_")
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    build_index(docs, plain, segment_size=3)
    qs = spark.createDataFrame([(1, "quick")], "qid long, query string")
    res = spark.createDataFrame([(1, 0)], "qid long, doc_id long")
    with pytest.raises(ValueError, match="no positional sidecar"):
        highlight_positions(spark, plain, res, qs)


# ---- migrated gate evidence ---------------------------------------------------


def test_bm25_noself_duckdb_equality(spark):
    """bm25_noself_top10 left the driver window for bm25_highlight_top3
    (round 5; the index-backed bm25_index_noself_top10 stays gated);
    DuckDB equality here, exact registry query vs exact registry SQL."""
    import duckdb

    import __spark_entry__ as entry

    sf = "/root/testdata/sf0.001"
    got = sorted(
        (r["qid"], r["doc_id"], round(r["score"], 6), r["rank"])
        for r in entry._q_bm25_noself(spark, sf).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    want = sorted(
        (q, d, round(s, 6), int(r))
        for q, d, s, r in con.execute(entry._BM25_NOSELF_SQL).fetchall()
    )
    assert got == want and len(got) > 0
