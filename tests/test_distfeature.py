"""ES distance_feature (operators/distfeature.py): numeric and date
brute forces over a toy corpus (feature math, missing-field zero, the
should-clause never-widens contract), guards, and a DuckDB twin at
gate rigor over the real sf0.001 corpus' n_chars field."""

from __future__ import annotations

import datetime as dt

import pytest

from sgpt_spark.functions.bm25 import score_py
from sgpt_spark.operators.distfeature import (
    distance_feature_column,
    distance_feature_search_index,
)
from sgpt_spark.operators.indexer import build_postings

pytestmark = pytest.mark.usefixtures("spark")

DOCS = [
    # (doc_id, text, n, ts)
    (0, "alpha beta", 100, dt.datetime(2021, 1, 1)),
    (1, "alpha beta beta", 300, dt.datetime(2021, 1, 8)),
    (2, "alpha", 200, None),  # missing date
    (3, "gamma delta", 200, dt.datetime(2021, 1, 2)),  # never matches q1
    (4, "alpha zeta", None, dt.datetime(2021, 1, 3)),  # missing numeric
]

QUERIES = [(1, "alpha beta"), (2, "gamma")]


def _docs(spark):
    return spark.createDataFrame(
        DOCS, "doc_id long, text string, n long, ts timestamp"
    )


def _rows(df):
    return sorted(
        (r["qid"], r["doc_id"], round(r["score"], 6), r["rank"])
        for r in df.collect()
    )


def _brute(field, origin, pivot, boost=1.0, k=10, k1=1.2, b=0.75):
    toks = {d[0]: d[1].split() for d in DOCS}
    vals = {d[0]: d[2] if field == "n" else d[3] for d in DOCS}
    n = len(toks)
    avgdl = sum(len(t) for t in toks.values()) / n
    df: dict = {}
    for t in toks.values():
        for w in set(t):
            df[w] = df.get(w, 0) + 1
    out = []
    for qid, q in QUERIES:
        hits = []
        for d, t in toks.items():
            s = sum(
                score_py(t.count(w), df[w], len(t), n, avgdl)
                for w in q.split()
                if w in t
            )
            if s == 0.0:
                continue
            v = vals[d]
            if v is not None:
                dist = (
                    abs(v - origin)
                    if field == "n"
                    else abs((v - origin).total_seconds()) / 86400.0
                )
                s += boost * pivot / (pivot + dist)
            hits.append((round(s, 6), d))
        hits.sort(key=lambda x: (-x[0], x[1]))
        for rk, (s, d) in enumerate(hits[:k], 1):
            out.append((qid, d, s, rk))
    return sorted(out)


def test_numeric_matches_brute_force(spark):
    docs = _docs(spark)
    postings, meta = build_postings(docs, segment_size=2)
    dv = docs.select("doc_id", "n", "ts")
    got = _rows(
        distance_feature_search_index(
            spark, postings, meta, QUERIES, dv, "n", origin=100, pivot=50
        )
    )
    assert got == _brute("n", 100, 50) and len(got) > 0
    # doc 4 (missing n) still ranks — feature contributes 0, BM25 stays
    assert [r for r in got if r[1] == 4]
    # the clause never widens the match set: doc 3 only under q2
    assert not [r for r in got if r[0] == 1 and r[1] == 3]


def test_date_matches_brute_force(spark):
    docs = _docs(spark)
    postings, meta = build_postings(docs, segment_size=2)
    dv = docs.select("doc_id", "n", "ts")
    origin = dt.datetime(2021, 1, 10)
    got = _rows(
        distance_feature_search_index(
            spark, postings, meta, QUERIES, dv, "ts",
            origin=origin, pivot=7.0, boost=2.0,
        )
    )
    assert got == _brute("ts", origin, 7.0, boost=2.0) and len(got) > 0
    # recency wins: doc 1 (Jan 8, closest to origin) outranks doc 0 for q1
    q1 = {d: rk for q, d, _, rk in got if q == 1}
    assert q1[1] < q1[0]


def test_guards(spark):
    import pyspark.sql.functions as F

    with pytest.raises(ValueError, match="pivot"):
        distance_feature_column(F.col("x"), 0, pivot=0)
    with pytest.raises(ValueError, match="boost"):
        distance_feature_column(F.col("x"), 0, pivot=1, boost=0)
    docs = _docs(spark)
    postings, meta = build_postings(docs, segment_size=2)
    with pytest.raises(ValueError, match="not in docvalues"):
        distance_feature_search_index(
            spark, postings, meta, QUERIES, docs.select("doc_id", "n"),
            "nope", origin=0, pivot=1,
        )


# ---- DuckDB twin at gate rigor ---------------------------------------------


def test_duckdb_equality_real_corpus(spark):
    """distance_feature on the real sf0.001 corpus' n_chars docvalue
    (origin 200, pivot 100) on top of the derived flagship queries,
    checked against a full DuckDB reimplementation."""
    import duckdb

    import __spark_entry__ as entry
    from sgpt_spark.sources.queryset import QUERIES_SQL, derived_queries
    from sgpt_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    docs = load_table(spark, sf, "documents")
    postings, meta = build_postings(docs, segment_size=200)
    q = derived_queries(docs).filter("qid < 500")
    dv = docs.select("doc_id", "n_chars")
    got = _rows(
        distance_feature_search_index(
            spark, postings, meta, q, dv, "n_chars",
            origin=200, pivot=100, k=10,
        )
    )

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    sql = f"""
WITH {entry._TOKENS_CTE},
  stats AS (SELECT count(*) AS n, avg(doc_len) AS avgdl FROM doclen),
  queryset AS (SELECT * FROM ({QUERIES_SQL}) WHERE qid < 500),
  qterms AS (
    SELECT qid, u.term AS term, count(*) AS qtf
    FROM queryset, unnest(string_split(query, ' ')) AS u(term)
    WHERE u.term <> '' GROUP BY qid, u.term
  ),
  bm25 AS (
    SELECT q.qid, tf.doc_id,
           sum(q.qtf * ln(1 + (s.n - tdf.df + 0.5) / (tdf.df + 0.5))
               * tf.tf / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.doc_len / s.avgdl))
           ) AS score
    FROM qterms q
    JOIN tf ON q.term = tf.term
    JOIN tdf ON tf.term = tdf.term
    JOIN doclen dl ON tf.doc_id = dl.doc_id
    CROSS JOIN stats s
    GROUP BY q.qid, tf.doc_id
  ),
  boosted AS (
    SELECT b.qid, b.doc_id,
           round(b.score + coalesce(
             1.0 * 100 / (100 + abs(d.n_chars - 200)), 0.0), 6) AS score
    FROM bm25 b LEFT JOIN documents d ON b.doc_id = d.doc_id
  )
SELECT qid, doc_id, score,
       CAST(row_number() OVER (PARTITION BY qid ORDER BY score DESC, doc_id ASC)
            AS INTEGER) AS rank
FROM boosted QUALIFY rank <= 10
"""
    want = sorted(
        (int(q_), d, float(s), int(rk))
        for q_, d, s, rk in con.execute(sql).fetchall()
    )
    assert got == want and len(got) > 0
