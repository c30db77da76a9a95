"""ES dis_max + constant_score (operators/compound.py): from-scratch
brute force of the combine across tie_breakers, index == exhaustive
identity (both codecs), heterogeneous clause mix (match + phrase +
constant), constant_score semantics, and a DuckDB equality at gate
rigor over the real sf0.001 corpus."""

from __future__ import annotations

import pytest

from sgpt_spark.functions.bm25 import idf_py
from sgpt_spark.operators.compound import (
    constant_score_index,
    constant_score_search,
    dis_max_combine,
    dis_max_match_index,
    dis_max_search,
)
from sgpt_spark.operators.indexer import build_postings

pytestmark = pytest.mark.usefixtures("spark")

DOCS = [
    (0, "quick brown fox jumps over the lazy dog"),
    (1, "quick dog barks"),
    (2, "lazy brown dog sleeps here all day"),
    (3, "quick quick brown fast fox"),
    (4, "a cat naps"),
    (5, "fox fox fox den"),
]
# two clauses per query: original text + a reformulation
CLAUSE_A = [(1, "quick brown"), (2, "lazy dog"), (3, "cat")]
CLAUSE_B = [(1, "fox"), (2, "dog sleeps"), (3, "absent")]
K1, B = 1.2, 0.75


def _docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def _clause_scores_py(queries):
    """{qid: {doc_id: 6dp BM25 score}} for one clause, whitespace terms."""
    toks = {d: t.split() for d, t in DOCS}
    n = len(toks)
    avgdl = sum(len(v) for v in toks.values()) / n
    df: dict = {}
    for ts in toks.values():
        for t in set(ts):
            df[t] = df.get(t, 0) + 1
    out: dict = {}
    for qid, q in queries:
        qtf: dict = {}
        for t in q.split():
            qtf[t] = qtf.get(t, 0) + 1
        for d, ts in toks.items():
            s = 0.0
            hit = False
            for t, qf in qtf.items():
                tf = ts.count(t)
                if tf == 0 or t not in df:
                    continue
                hit = True
                tf_norm = tf / (tf + K1 * (1 - B + B * len(ts) / avgdl))
                s += qf * idf_py(df[t], n) * tf_norm
            if hit:
                out.setdefault(qid, {})[d] = round(s, 6)
    return out


def _dismax_py(clause_maps, tie_breaker, k=10):
    """Brute-force dis-max over per-clause {qid: {doc: score}} maps,
    mirroring the engine's fixed-clause-order fold exactly."""
    qids = set()
    for m in clause_maps:
        qids |= set(m)
    rows = []
    for qid in qids:
        docs = set()
        for m in clause_maps:
            docs |= set(m.get(qid, {}))
        scored = []
        for d in docs:
            vals = [m.get(qid, {}).get(d) for m in clause_maps]
            mx = max(v for v in vals if v is not None)
            total = 0.0
            for v in vals:
                total = total + (v if v is not None else 0.0)
            scored.append((d, mx + tie_breaker * (total - mx)))
        scored.sort(key=lambda x: (-x[1], x[0]))
        rows.extend(
            (qid, d, s, rk) for rk, (d, s) in enumerate(scored[:k], 1)
        )
    return sorted(rows)


def _rows(df):
    return sorted(
        (r["qid"], r["doc_id"], r["score"], r["rank"]) for r in df.collect()
    )


@pytest.mark.parametrize("tie", [0.0, 0.3, 1.0])
def test_dis_max_brute_force(spark, tie):
    got = _rows(dis_max_search(_docs(spark), [CLAUSE_A, CLAUSE_B], tie_breaker=tie))
    want = _dismax_py(
        [_clause_scores_py(CLAUSE_A), _clause_scores_py(CLAUSE_B)], tie
    )
    assert got == want and len(got) > 3
    # qid 3: clause A matches (cat), clause B term absent -> single-clause rows
    assert [r for r in got if r[0] == 3]


@pytest.mark.parametrize("codec", ["varint", "pfor"])
def test_dis_max_index_matches_exhaustive(spark, codec):
    docs = _docs(spark)
    postings, meta = build_postings(docs, segment_size=2, codec=codec)
    for tie in (0.0, 0.5):
        a = _rows(dis_max_search(docs, [CLAUSE_A, CLAUSE_B], tie_breaker=tie))
        b = _rows(
            dis_max_match_index(
                spark, postings, meta, [CLAUSE_A, CLAUSE_B], tie_breaker=tie
            )
        )
        assert a == b and len(a) > 0


def test_dis_max_single_clause_is_the_match_ranking(spark):
    """One clause, any tie_breaker: dis_max degenerates to the clause's
    own rounded ranking (the gated search contract)."""
    from sgpt_spark.operators.search import bm25_search

    docs = _docs(spark)
    got = _rows(dis_max_search(docs, [CLAUSE_A], tie_breaker=0.7))
    want = _rows(bm25_search(docs, spark.createDataFrame(
        CLAUSE_A, "qid long, query string"), k=10))
    assert got == want and len(got) > 0


def test_dis_max_heterogeneous_clauses(spark, tmp_path):
    """match + phrase + constant_score clauses through the generic
    combiner == brute force over the same per-clause score maps."""
    from pyspark.sql import functions as F

    from sgpt_spark.operators.positions import build_positional_index, phrase_hits_index

    docs = _docs(spark)
    out = str(tmp_path / "idx")
    build_positional_index(docs, out, segment_size=2)
    phrase_q = [(1, "quick brown"), (2, "dog sleeps")]
    hits, _ = phrase_hits_index(spark, out, phrase_q)
    match = dis_max_search(docs, [CLAUSE_A], tie_breaker=0.0, k=10**6).select(
        "qid", "doc_id", "score"
    )
    const = (
        dis_max_search(docs, [CLAUSE_B], tie_breaker=0.0, k=10**6)
        .select("qid", "doc_id", F.lit(0.25).alias("score"))
    )
    got = _rows(dis_max_combine([match, hits.select("qid", "doc_id", "score"),
                                 const], tie_breaker=0.5))

    # brute-force maps: match scores; phrase hits scored as BM25 over
    # the engine's own hit relation; constant 0.25 on clause-B matches
    ph_map: dict = {}
    for r in hits.collect():
        ph_map.setdefault(r["qid"], {})[r["doc_id"]] = round(r["score"], 6)
    const_map = {
        q: {d: 0.25 for d in m} for q, m in _clause_scores_py(CLAUSE_B).items()
    }
    want = _dismax_py([_clause_scores_py(CLAUSE_A), ph_map, const_map], 0.5)
    assert got == want and len(got) > 0


def test_dis_max_guards(spark):
    with pytest.raises(ValueError, match="tie_breaker"):
        dis_max_search(_docs(spark), [CLAUSE_A], tie_breaker=1.5)
    with pytest.raises(ValueError, match="at least one clause"):
        dis_max_combine([])
    with pytest.raises(ValueError, match="qid type"):
        dis_max_match_index(
            spark, *build_postings(_docs(spark), segment_size=3),
            [CLAUSE_A, [("q1", "fox")]],
        )


@pytest.mark.parametrize("codec", ["varint", "pfor"])
def test_constant_score(spark, codec):
    docs = _docs(spark)
    postings, meta = build_postings(docs, segment_size=2, codec=codec)
    queries = [(1, "fox dog"), (2, "absent")]
    got = _rows(constant_score_index(spark, postings, meta, queries, boost=2.5))
    want = _rows(constant_score_search(docs, queries, boost=2.5))
    assert got == want
    # every matching doc scores exactly the boost; rank = doc_id order
    matches = sorted(
        d for d, t in DOCS if {"fox", "dog"} & set(t.split())
    )
    assert got == [(1, d, 2.5, rk) for rk, d in enumerate(matches, 1)]
    with pytest.raises(ValueError, match="boost"):
        constant_score_search(docs, queries, boost=0.0)


def test_dis_max_gate_shape_duckdb_equality(spark):
    """DuckDB twin at gate rigor over the real sf0.001 corpus: clause 1
    = the flagship derived queries, clause 2 = each query's FIRST token
    (a reformulation DuckDB derives identically); tie_breaker 0.5."""
    import duckdb

    import __spark_entry__ as entry
    from sgpt_spark.sources.queryset import QUERIES_SQL, derived_queries
    from sgpt_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    docs = load_table(spark, sf, "documents")
    postings, meta = build_postings(docs, segment_size=200)
    q1 = derived_queries(docs)
    q2 = q1.selectExpr("qid", "split_part(query, ' ', 1) AS query")
    got = _rows(
        dis_max_match_index(spark, postings, meta, [q1, q2], tie_breaker=0.5, k=10)
    )

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    sql = f"""
WITH {entry._TOKENS_CTE},
  stats AS (SELECT count(*) AS n, avg(doc_len) AS avgdl FROM doclen),
  q1 AS ({QUERIES_SQL}),
  qc AS (
    SELECT qid, 0 AS cid, query FROM q1
    UNION ALL
    SELECT qid, 1 AS cid, split_part(query, ' ', 1) AS query FROM q1
  ),
  qterms AS (
    SELECT qid, cid, u.term AS term, count(*) AS qtf
    FROM qc, unnest(string_split(query, ' ')) AS u(term)
    WHERE u.term <> '' GROUP BY qid, cid, u.term
  ),
  clause AS (
    SELECT q.qid, q.cid, tf.doc_id,
           round(sum(
             q.qtf * ln(1 + (s.n - tdf.df + 0.5) / (tdf.df + 0.5))
             * tf.tf / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.doc_len / s.avgdl))
           ), 6) AS score
    FROM qterms q
    JOIN tf ON q.term = tf.term
    JOIN tdf ON tf.term = tdf.term
    JOIN doclen dl ON tf.doc_id = dl.doc_id
    CROSS JOIN stats s
    GROUP BY q.qid, q.cid, tf.doc_id
  ),
  piv AS (
    SELECT qid, doc_id,
           max(CASE WHEN cid = 0 THEN score END) AS s0,
           max(CASE WHEN cid = 1 THEN score END) AS s1
    FROM clause GROUP BY qid, doc_id
  ),
  dm AS (
    SELECT qid, doc_id,
           greatest(coalesce(s0, s1), coalesce(s1, s0))
             + 0.5 * ((coalesce(s0, 0) + coalesce(s1, 0))
                      - greatest(coalesce(s0, s1), coalesce(s1, s0))) AS score
    FROM piv
  )
SELECT qid, doc_id, score,
       CAST(row_number() OVER (PARTITION BY qid ORDER BY score DESC, doc_id ASC)
            AS INTEGER) AS rank
FROM dm QUALIFY rank <= 10
"""
    want = sorted(
        (q, d, float(s), int(rk)) for q, d, s, rk in con.execute(sql).fetchall()
    )
    assert got == want and len(got) > 0


# ---- ids / match_all / match_none (the constant-score corner) -----------


def test_ids_query(spark):
    from sgpt_spark.operators.compound import ids_query

    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(20)], "doc_id long, text string"
    )
    got = sorted(
        (r["qid"], r["doc_id"], r["score"], r["rank"])
        for r in ids_query(
            docs, [(1, [3, 7, 99]), (2, [5])], boost=2.0
        ).collect()
    )
    # 99 is absent from the corpus -> silently unmatched (the ES rule);
    # constant score boost with doc_id-asc paging
    assert got == [(1, 3, 2.0, 1), (1, 7, 2.0, 2), (2, 5, 2.0, 1)]
    with pytest.raises(ValueError, match="at least one"):
        ids_query(docs, [])


def test_match_all_and_none(spark):
    from sgpt_spark.operators.compound import match_all_query, match_none_query

    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(30)], "doc_id long, text string"
    )
    got = sorted(
        (r["qid"], r["doc_id"], r["score"], r["rank"])
        for r in match_all_query(docs, [10, 20], boost=1.0, k=3).collect()
    )
    assert got == [
        (10, 0, 1.0, 1), (10, 1, 1.0, 2), (10, 2, 1.0, 3),
        (20, 0, 1.0, 1), (20, 1, 1.0, 2), (20, 2, 1.0, 3),
    ]
    none = match_none_query(docs, [10, 20])
    assert none.collect() == []
    assert none.columns == ["qid", "doc_id", "score", "rank"]


def test_dis_max_kernel_matches_relational_twin(spark):
    """r6: the default segment-kernel strategy is value-identical to the
    fully in-plan relational twin (the r5 spelling) on the gate shape."""
    from sgpt_spark.sources.queryset import derived_queries
    from sgpt_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    docs = load_table(spark, sf, "documents")
    postings, meta = build_postings(docs, segment_size=200)
    q1 = derived_queries(docs)
    q2 = q1.selectExpr("qid", "split_part(query, ' ', 1) AS query")
    for tie in (0.0, 0.5):
        a = _rows(dis_max_match_index(spark, postings, meta, [q1, q2],
                                      tie_breaker=tie, k=10))
        b = _rows(dis_max_match_index(spark, postings, meta, [q1, q2],
                                      tie_breaker=tie, k=10,
                                      strategy="relational"))
        assert a == b and len(a) > 0
