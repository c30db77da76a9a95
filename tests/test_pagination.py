"""ES ``search_after`` keyset pagination: page N+1 must equal global
ranks N*k+1..(N+1)*k exactly (the sort (score desc, doc_id asc) is
total), across segments, codecs, score ties, and short result lists —
index path == exhaustive path == the single deep-k run."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sgpt_spark.operators.index_search import search_index
from sgpt_spark.operators.indexer import build_postings
from sgpt_spark.operators.search import bm25_search

pytestmark = pytest.mark.usefixtures("spark")

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "quick brown fox and quick brown foxtrot again"),
    (2, "a a a ab quick"),
    (3, "brown quick fox"),
    (4, "the fox is quick and brown"),
    (5, "quick brown wolf"),
    (6, "foam fog foil fond font quick"),
    (7, "quick singleton"),
    (8, "lazy dog lazy dog lazy quick brown"),
    (9, "quick dog"),
    # tie block: identical docs -> identical scores -> doc_id tie-break
    # must carry ACROSS page boundaries
    (10, "quick brown tie"),
    (11, "quick brown tie"),
    (12, "quick brown tie"),
    (13, "quick brown tie"),
    (14, "quick brown tie"),
]
QUERIES = [(100, "quick brown"), (101, "quick"), (102, "lazy dog"),
           (103, "singleton")]


def _rows(df):
    return sorted(
        (r["qid"], r["doc_id"], round(r["score"], 6), r["rank"]) for r in df.collect()
    )


def _paged_equals_deepk(spark, docs, queries, k, pages, runner):
    """Concatenating `pages` pages of size k (re-ranked with the page
    offset) must equal one deep run at k*pages."""
    deep = [
        (q, d, s, r)
        for q, d, s, r in _rows(runner(queries, k * pages, None))
    ]
    got = []
    after = None
    qdf = queries
    for p in range(pages):
        page = runner(qdf, k, after)
        rows = page.collect()
        got += [(r["qid"], r["doc_id"], round(r["score"], 6),
                 r["rank"] + p * k) for r in rows]
        # next page: cursors from this page's rank-k rows; qids with a
        # short page have no cursor and drop out (ES semantics)
        after = {
            r["qid"]: (r["score"], r["doc_id"]) for r in rows if r["rank"] == k
        }
        if not after:
            break
        qdf = queries.filter(F.col("qid").isin(list(after)))
    assert sorted(got) == sorted(deep) and got


@pytest.mark.parametrize("codec", ["varint", "pfor"])
def test_index_pagination_equals_deepk(spark, codec):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    queries = spark.createDataFrame(QUERIES, "qid long, query string")
    postings, meta = build_postings(docs, segment_size=4, codec=codec)

    def runner(qdf, k, after):
        return search_index(spark, postings, meta, qdf, k=k, after=after)

    _paged_equals_deepk(spark, docs, queries, 3, 4, runner)


def test_exhaustive_pagination_equals_deepk(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    queries = spark.createDataFrame(QUERIES, "qid long, query string")

    def runner(qdf, k, after):
        return bm25_search(docs, qdf, k=k, after=after)

    _paged_equals_deepk(spark, docs, queries, 3, 4, runner)


def test_index_page2_equals_exhaustive_page2(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    queries = spark.createDataFrame(QUERIES, "qid long, query string")
    postings, meta = build_postings(docs, segment_size=3)
    p1 = search_index(spark, postings, meta, queries, k=4)
    after = {r["qid"]: (r["score"], r["doc_id"])
             for r in p1.filter(F.col("rank") == 4).collect()}
    q2 = queries.filter(F.col("qid").isin(list(after)))
    got = _rows(search_index(spark, postings, meta, q2, k=4, after=after))
    want = _rows(bm25_search(docs, q2, k=4, after=after))
    assert got == want and got


def test_no_cursor_means_page_one(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    queries = spark.createDataFrame(QUERIES, "qid long, query string")
    postings, meta = build_postings(docs, segment_size=4)
    plain = _rows(search_index(spark, postings, meta, queries, k=5))
    # empty cursor dict and a cursor for ONE qid only
    assert _rows(search_index(spark, postings, meta, queries, k=5, after={})) == plain
    p1 = {r["qid"]: (r["score"], r["doc_id"])
          for r in search_index(spark, postings, meta, queries, k=5)
          .filter((F.col("rank") == 5) & (F.col("qid") == 101)).collect()}
    mixed = _rows(search_index(spark, postings, meta, queries, k=5, after=p1))
    # qid 101 advanced; everyone else identical to page 1
    assert [r for r in mixed if r[0] != 101] == [r for r in plain if r[0] != 101]
    assert {r[1] for r in mixed if r[0] == 101}.isdisjoint(
        {r[1] for r in plain if r[0] == 101}
    )


def test_after_refuses_non_taat(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    queries = spark.createDataFrame(QUERIES, "qid long, query string")
    postings, meta = build_postings(docs, segment_size=4)
    for strat in ("wand", "exhaustive"):
        with pytest.raises(ValueError, match="search_after"):
            search_index(spark, postings, meta, queries, k=3,
                         strategy=strat, after={100: (1.0, 3)})


def _duck(sf):
    import duckdb

    con = duckdb.connect()
    for t in ("documents", "orders"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    return con


def test_search_after_gate_duckdb_equality(spark):
    """The gate row bm25_search_after_top10: exact registry query vs the
    rank-11..20 oracle at sf0.001 (the driver repeats this at sf0.01)."""
    import __spark_entry__ as entry

    sf = "/root/testdata/sf0.001"
    got = sorted(
        (r["qid"], r["doc_id"], round(r["score"], 6), r["rank"])
        for r in entry._q_bm25_search_after(spark, sf).collect()
    )
    want = sorted(
        (q, d, round(s, 6), int(r))
        for q, d, s, r in _duck(sf).execute(entry._BM25_PAGE2_SQL).fetchall()
    )
    assert got == want and len(got) > 0


def test_topk_orders_duckdb_equality(spark):
    """topk_orders_per_customer left the driver window for
    bm25_search_after_top10 (round 5); its DuckDB value equality lives
    here, exact registry query vs exact registry SQL at sf0.001."""
    import __spark_entry__ as entry

    sf = "/root/testdata/sf0.001"
    got = sorted(
        (r["o_custkey"], r["o_orderkey"], round(r["o_totalprice"], 6), r["rank"])
        for r in entry._q_topk_orders(spark, sf).collect()
    )
    want = sorted(
        (ck, ok, round(tp, 6), int(r))
        for ck, ok, tp, r in _duck(sf).execute(entry._TOPK_ORDERS_SQL).fetchall()
    )
    assert got == want and len(got) > 0
