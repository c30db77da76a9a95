"""ES match_bool_prefix (operators/boolprefix.py): index == exhaustive
identity across codecs and knobs, a from-scratch brute force (pure
python clause algebra over the toy corpus), single-token degeneration,
operator/msm gating, guards, and a DuckDB twin at gate rigor over the
real sf0.001 documents corpus."""

from __future__ import annotations

import pytest

from sgpt_spark.functions.bm25 import score_py
from sgpt_spark.operators.boolprefix import (
    match_bool_prefix_search,
    match_bool_prefix_search_index,
)
from sgpt_spark.operators.indexer import build_postings

pytestmark = pytest.mark.usefixtures("spark")

DOCS = [
    (0, "spark part sort part"),
    (1, "fast hash part"),
    (2, "agg big a agg"),
    (3, "table tab tape"),
    (4, "spark sort"),
    (5, "part sort sorted sorting"),
]

QUERIES = [
    (1, "spark so"),      # term: spark; prefix 'so' -> sort/sorted/sorting
    (2, "part part s"),   # term: part (qtf 2); prefix 's'
    (3, "ta"),            # single token: pure prefix query
    (4, "zzz qqq"),       # nothing matches
]


def _docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def _rows(df):
    return sorted(
        (r["qid"], r["doc_id"], r["score"], r["rank"]) for r in df.collect()
    )


def _brute(queries, k=10, msm=0, operator="or"):
    toks = {d: t.split(" ") for d, t in DOCS}
    n = len(DOCS)
    avgdl = sum(len(t) for t in toks.values()) / n
    df = {}
    for t in toks.values():
        for w in set(t):
            df[w] = df.get(w, 0) + 1
    out = []
    for qid, q in queries:
        qtoks = q.split(" ")
        prefix = qtoks[-1]
        clauses = {}
        for w in qtoks[:-1]:
            clauses[w] = clauses.get(w, 0) + 1
        hits = []
        for d, t in toks.items():
            score, matched = 0.0, 0
            for w, qtf in clauses.items():
                if w in t:
                    score += qtf * score_py(t.count(w), df[w], len(t), n, avgdl)
                    matched += qtf
            if any(w.startswith(prefix) for w in t):
                score += 1.0
                matched += 1
            if matched == 0:
                continue
            need = (sum(clauses.values()) + 1) if operator == "and" else msm
            if matched < need:
                continue
            hits.append((round(score, 6), d))
        hits.sort(key=lambda x: (-x[0], x[1]))
        for rk, (s, d) in enumerate(hits[:k], 1):
            out.append((qid, d, s, rk))
    return sorted(out)


@pytest.mark.parametrize("codec", ["varint", "pfor"])
def test_index_matches_exhaustive(spark, codec):
    docs = _docs(spark)
    postings, meta = build_postings(docs, segment_size=2, codec=codec)
    a = _rows(match_bool_prefix_search(docs, QUERIES, k=5))
    b = _rows(match_bool_prefix_search_index(spark, postings, meta, QUERIES, k=5))
    assert a == b and len(a) > 0
    assert not [r for r in a if r[0] == 4]  # zzz qqq matches nothing


def test_matches_brute_force(spark):
    got = _rows(match_bool_prefix_search(_docs(spark), QUERIES, k=10))
    assert got == _brute(QUERIES) and len(got) > 0
    # doc 0 matches q1 via spark AND the so-prefix (sort); doc 1 only
    # via neither (no spark, no so*) -> absent for q1
    assert [r for r in got if r[0] == 1 and r[1] == 0]
    assert not [r for r in got if r[0] == 1 and r[1] == 1]
    # q3 (pure prefix 'ta') is constant-score: doc 3 only, score 1.0
    q3 = [r for r in got if r[0] == 3]
    assert q3 == [(3, 3, 1.0, 1)]


@pytest.mark.parametrize("msm", [2, 3])
def test_minimum_should_match(spark, msm):
    docs = _docs(spark)
    postings, meta = build_postings(docs, segment_size=2)
    a = _rows(match_bool_prefix_search(docs, QUERIES, k=10, minimum_should_match=msm))
    b = _rows(
        match_bool_prefix_search_index(
            spark, postings, meta, QUERIES, k=10, minimum_should_match=msm
        )
    )
    assert a == b == _brute(QUERIES, msm=msm)
    if msm == 2:
        # q2 needs 2 of (part, part, s*): doc 2 ('agg big a agg' — no
        # part, no s*) absent; doc 1 (part + no s*... 'part' qtf 2
        # counts both clauses) present
        assert [r for r in a if r[0] == 2 and r[1] == 1]
        assert not [r for r in a if r[0] == 2 and r[1] == 2]


def test_operator_and(spark):
    docs = _docs(spark)
    postings, meta = build_postings(docs, segment_size=2)
    a = _rows(match_bool_prefix_search(docs, QUERIES, k=10, operator="and"))
    b = _rows(
        match_bool_prefix_search_index(
            spark, postings, meta, QUERIES, k=10, operator="and"
        )
    )
    assert a == b == _brute(QUERIES, operator="and") and len(a) > 0
    # q1 'spark so' AND: docs 0 and 4 (spark + sort*) only
    assert sorted(r[1] for r in a if r[0] == 1) == [0, 4]


def test_max_expansions_and_no_broadcast(spark):
    docs = _docs(spark)
    postings, meta = build_postings(docs, segment_size=2)
    # cap the 's' expansion to its first 2 dictionary terms (term order:
    # sort, sorted, sorting, spark -> sort, sorted)
    a = _rows(
        match_bool_prefix_search(docs, [(1, "part s")], k=10, max_expansions=2)
    )
    b = _rows(
        match_bool_prefix_search_index(
            spark, postings, meta, [(1, "part s")], k=10, max_expansions=2
        )
    )
    assert a == b and len(a) > 0
    c = _rows(
        match_bool_prefix_search(
            docs, [(1, "part s")], k=10, max_expansions=2,
            broadcast_queries=False,
        )
    )
    assert a == c


def test_guards(spark):
    docs = _docs(spark)
    with pytest.raises(ValueError, match="operator"):
        match_bool_prefix_search(docs, QUERIES, operator="nope")
    with pytest.raises(ValueError, match="either"):
        match_bool_prefix_search(
            docs, QUERIES, operator="and", minimum_should_match=2
        )
    with pytest.raises(ValueError, match="minimum_should_match"):
        match_bool_prefix_search(docs, QUERIES, minimum_should_match=-1)


# ---- DuckDB twin at gate rigor ---------------------------------------------


def test_duckdb_equality_real_corpus(spark):
    """match_bool_prefix over the real sf0.001 documents table, index
    path vs a full DuckDB reimplementation (term-clause BM25 sum +
    LIKE-expanded constant-score prefix clause) — gate-rigor evidence
    for the clause fold."""
    import duckdb

    import __spark_entry__ as entry
    from sgpt_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    docs = load_table(spark, sf, "documents")
    postings, meta = build_postings(docs, segment_size=200)
    queries = [(1, "stream filt"), (2, "hash mer"), (3, "ag")]
    got = _rows(
        match_bool_prefix_search_index(spark, postings, meta, queries, k=10)
    )

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    sql = f"""
WITH {entry._TOKENS_CTE},
  stats AS (SELECT count(*) AS n, avg(doc_len) AS avgdl FROM doclen),
  qterms(qid, term, qtf) AS (VALUES (1, 'stream', 1), (2, 'hash', 1)),
  qprefix(qid, prefix) AS (VALUES (1, 'filt'), (2, 'mer'), (3, 'ag')),
  termscore AS (
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
  prefixhit AS (
    SELECT DISTINCT p.qid, tf.doc_id
    FROM qprefix p
    JOIN tdf ON tdf.term LIKE p.prefix || '%'
    JOIN tf ON tf.term = tdf.term
  ),
  parts AS (
    SELECT qid, doc_id, score FROM termscore
    UNION ALL
    SELECT qid, doc_id, 1.0 AS score FROM prefixhit
  ),
  total AS (
    SELECT qid, doc_id, round(sum(score), 6) AS score
    FROM parts GROUP BY qid, doc_id
  )
SELECT qid, doc_id, score,
       CAST(row_number() OVER (PARTITION BY qid ORDER BY score DESC, doc_id ASC)
            AS INTEGER) AS rank
FROM total QUALIFY rank <= 10
"""
    want = sorted(
        (int(q), d, float(s), int(rk))
        for q, d, s, rk in con.execute(sql).fetchall()
    )
    assert got == want and len(got) > 0


def test_mbp_kernel_matches_relational(spark):
    """r6: the default segment-kernel strategy is value-identical to
    the pinned relational spelling across msm/operator shapes."""
    from sgpt_spark.operators.boolprefix import match_bool_prefix_search_index
    from sgpt_spark.operators.indexer import build_postings
    from sgpt_spark.sources.queryset import derived_queries
    from sgpt_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.001"
    docs = load_table(spark, sf, "documents")
    postings, meta = build_postings(docs, segment_size=200)
    arr = F.split(F.col("query"), " ", -1)
    q = derived_queries(docs).select(
        "qid",
        F.trim(
            F.concat(
                F.array_join(F.slice(arr, 1, F.size(arr) - 1), " "),
                F.lit(" "),
                F.substring(F.element_at(arr, -1), 1, 3),
            )
        ).alias("query"),
    )
    for kwargs in ({}, {"minimum_should_match": 2}, {"operator": "and"}):
        a = sorted(map(tuple, match_bool_prefix_search_index(
            spark, postings, meta, q, k=10, max_expansions=64,
            **kwargs).collect()))
        b = sorted(map(tuple, match_bool_prefix_search_index(
            spark, postings, meta, q, k=10, max_expansions=64,
            strategy="relational", **kwargs).collect()))
        assert a == b and len(a) > 0, kwargs
