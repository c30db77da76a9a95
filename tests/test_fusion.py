"""RRF fusion: from-scratch Python brute force (ES rrf semantics —
windowed contribution, rank_constant, weights), guards, gate equality
vs DuckDB, and the dense_join_topk displaced-row twin."""

from __future__ import annotations

import pytest

from sgpt_spark.operators.fusion import rrf_fusion

pytestmark = pytest.mark.usefixtures("spark")

# two rankings over 2 queries: doc 3 only in A, doc 4 only in B, docs
# 1-2 in both at different ranks (the rank-disagreement RRF resolves)
RANK_A = [(0, 1, 1), (0, 2, 2), (0, 3, 3), (1, 2, 1), (1, 1, 2)]
RANK_B = [(0, 2, 1), (0, 1, 2), (0, 4, 3), (1, 9, 1)]
SCHEMA = "qid long, doc_id long, rank int"


def _brute(rankings, weights, rc, k):
    agg = {}
    for rows, w in zip(rankings, weights):
        for qid, doc, rank in rows:
            agg[(qid, doc)] = agg.get((qid, doc), 0.0) + w / (rc + rank)
    by_q = {}
    for (qid, doc), s in agg.items():
        by_q.setdefault(qid, []).append((round(s, 6), doc))
    out = []
    for qid, items in by_q.items():
        items.sort(key=lambda x: (-x[0], x[1]))
        for rk, (s, doc) in enumerate(items[:k], 1):
            out.append((qid, doc, s, rk))
    return sorted(out)


@pytest.mark.parametrize(
    "weights,rc,k",
    [([1.0, 1.0], 60, 10), ([2.0, 0.5], 60, 2), ([1.0, 1.0], 1, 3)],
)
def test_brute_force(spark, weights, rc, k):
    a = spark.createDataFrame(RANK_A, SCHEMA)
    b = spark.createDataFrame(RANK_B, SCHEMA)
    got = sorted(
        (r["qid"], r["doc_id"], round(r["score"], 6), r["rank"])
        for r in rrf_fusion([a, b], k=k, rank_constant=rc,
                            weights=weights).collect()
    )
    assert got == _brute([RANK_A, RANK_B], weights, rc, k) and got


def test_three_rankings_and_id_col(spark):
    a = spark.createDataFrame(RANK_A, SCHEMA)
    b = spark.createDataFrame(RANK_B, SCHEMA)
    c = spark.createDataFrame(
        [(0, 3, 1), (1, 1, 1)], "qid long, vec_id long, rank int"
    )
    got = sorted(
        (r["qid"], r["doc_id"], round(r["score"], 6), r["rank"])
        for r in rrf_fusion(
            [a, b, c.withColumnRenamed("vec_id", "doc_id")], k=5
        ).collect()
    )
    rows_c = [(0, 3, 1), (1, 1, 1)]
    want = _brute([RANK_A, RANK_B, rows_c], [1.0, 1.0, 1.0], 60, 5)
    assert got == want
    # doc 3 (rank 3 in A + rank 1 in C) must now beat doc 4 (B only)
    q0 = {r[1]: r[3] for r in got if r[0] == 0}
    assert q0[3] < q0[4]


def test_missing_doc_contributes_zero(spark):
    """A doc outside one retriever's window gets only the other's
    contribution — never a penalty term (the ES windowed semantics)."""
    a = spark.createDataFrame([(0, 1, 1)], SCHEMA)
    b = spark.createDataFrame([(0, 2, 1)], SCHEMA)
    got = {r["doc_id"]: round(r["score"], 6)
           for r in rrf_fusion([a, b], k=10).collect()}
    assert got == {1: round(1 / 61, 6), 2: round(1 / 61, 6)}


def test_guards(spark):
    a = spark.createDataFrame(RANK_A, SCHEMA)
    with pytest.raises(ValueError, match=">= 2 rankings"):
        rrf_fusion([a])
    with pytest.raises(ValueError, match="rank_constant"):
        rrf_fusion([a, a], rank_constant=0)
    with pytest.raises(ValueError, match="weights"):
        rrf_fusion([a, a], weights=[1.0])
    with pytest.raises(ValueError, match="weights"):
        rrf_fusion([a, a], weights=[1.0, -1.0])
    with pytest.raises(ValueError, match="missing column"):
        rrf_fusion([a, a.drop("rank")])


def _duck(sf, tables=("documents",)):
    import duckdb

    con = duckdb.connect()
    for t in tables:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    return con


def test_hybrid_gate_duckdb_equality(spark):
    """Gate row hybrid_rrf_top10: exact registry query vs exact registry
    SQL at sf0.001 (the driver repeats this at sf0.01)."""
    import __spark_entry__ as entry

    sf = "/root/testdata/sf0.001"
    got = sorted(
        (r["qid"], r["doc_id"], round(r["score"], 6), r["rank"])
        for r in entry._q_hybrid_rrf(spark, sf).collect()
    )
    want = sorted(
        (q, int(d), round(s, 6), int(rk))
        for q, d, s, rk in _duck(sf).execute(entry._HYBRID_RRF_SQL).fetchall()
    )
    assert got == want and len(got) > 0


def test_dense_join_topk_duckdb_equality(spark):
    """dense_join_topk left the driver window for hybrid_rrf_top10
    (round 5); exact registry query vs exact registry SQL at sf0.001."""
    import __spark_entry__ as entry

    sf = "/root/testdata/sf0.001"
    df = entry._q_dense_join_topk(spark, sf)
    cols = sorted(df.columns)
    got = sorted(
        tuple(round(r[c], 6) if isinstance(r[c], float) else r[c] for c in cols)
        for r in df.collect()
    )
    ores = (
        _duck(sf, tables=("documents", "embeddings"))
        .execute(entry._COSINE_SQL)
        .fetchdf()
    )
    assert sorted(ores.columns.tolist()) == cols
    want = sorted(
        tuple(
            round(row[c], 6) if isinstance(row[c], float) else int(row[c])
            for c in cols
        )
        for _, row in ores.iterrows()
    )
    assert got == want and len(got) > 0
