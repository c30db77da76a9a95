"""Metrics semantics vs the reference's InformationRetrievalEvaluator
formulas (via the pure-Python oracle) on hand-built rankings."""

from __future__ import annotations

import math

import pytest

from oracle.bm25_oracle import map_at_k, mrr_at_k, ndcg_at_k, precision_at_k, recall_at_k
from sgpt_spark.operators.metrics import (
    best_checkpoint,
    mean_metrics,
    mean_metrics_at,
    mean_metrics_by,
    per_query_metrics,
    per_query_metrics_at,
)

# qid -> (ranked doc list, relevant set)
CASES = {
    "q_top1": (["a", "b", "c", "d"], {"a"}),
    "q_mid": (["x", "a", "y", "b"], {"a", "b", "z"}),  # one relevant never retrieved
    "q_none": (["p", "q", "r"], {"m"}),
    "q_all": (["a", "b"], {"a", "b"}),
    "q_unretrieved": ([], {"a", "b"}),  # query missing from the run entirely
}
K = 3


@pytest.fixture(scope="module")
def dfs(spark):
    results = [
        (qid, doc, 1.0 / (i + 1), i + 1)
        for qid, (docs, _) in CASES.items()
        for i, doc in enumerate(docs)
    ]
    qrels = [
        (qid, doc, 1) for qid, (_, rel) in CASES.items() for doc in sorted(rel)
    ]
    rdf = spark.createDataFrame(
        results, "qid string, doc_id string, score double, rank int"
    )
    qdf = spark.createDataFrame(qrels, "qid string, doc_id string, relevance int")
    return rdf, qdf


def test_per_query_metrics_match_oracle(spark, dfs):
    rdf, qdf = dfs
    got = {r["qid"]: r for r in per_query_metrics(rdf, qdf, k=K).collect()}
    assert set(got) == set(CASES)
    for qid, (docs, rel) in CASES.items():
        g = got[qid]
        assert math.isclose(g["ndcg"], ndcg_at_k(docs, rel, K), abs_tol=1e-9), qid
        assert math.isclose(g["map"], map_at_k(docs, rel, K), abs_tol=1e-9), qid
        assert math.isclose(g["mrr"], mrr_at_k(docs, rel, K), abs_tol=1e-9), qid
        assert math.isclose(g["precision"], precision_at_k(docs, rel, K), abs_tol=1e-9), qid
        assert math.isclose(g["recall"], recall_at_k(docs, rel, K), abs_tol=1e-9), qid


def test_mean_metrics(spark, dfs):
    rdf, qdf = dfs
    row = mean_metrics(rdf, qdf, k=K).collect()[0]
    n = len(CASES)
    want_ndcg = sum(ndcg_at_k(d, r, K) for d, r in CASES.values()) / n
    want_map = sum(map_at_k(d, r, K) for d, r in CASES.values()) / n
    assert math.isclose(row["ndcg"], want_ndcg, abs_tol=1e-6)
    assert math.isclose(row["map"], want_map, abs_tol=1e-6)


def test_multi_k_matches_single_k(spark, dfs):
    """per_query_metrics_at at every cutoff == per_query_metrics run
    separately per cutoff (one-pass multi-k is a pure optimization)."""
    rdf, qdf = dfs
    ks = [1, 2, 3, 10]
    multi = {
        (r["qid"], r["k"]): r for r in per_query_metrics_at(rdf, qdf, ks).collect()
    }
    assert len(multi) == len(CASES) * len(ks)
    for k in ks:
        single = {r["qid"]: r for r in per_query_metrics(rdf, qdf, k=k).collect()}
        for qid in CASES:
            for m in ("ndcg", "map", "mrr", "precision", "recall"):
                assert math.isclose(
                    multi[(qid, k)][m], single[qid][m], abs_tol=1e-9
                ), (qid, k, m)
    # and the means line up too
    mm = {r["k"]: r for r in mean_metrics_at(rdf, qdf, ks).collect()}
    for k in ks:
        row = mean_metrics(rdf, qdf, k=k).collect()[0]
        assert math.isclose(mm[k]["ndcg"], row["ndcg"], abs_tol=1e-6)
        assert math.isclose(mm[k]["map"], row["map"], abs_tol=1e-6)


def test_mean_metrics_by_dataset(spark, dfs):
    rdf, qdf = dfs
    ds = spark.createDataFrame(
        [(q, "A" if i % 2 == 0 else "B") for i, q in enumerate(sorted(CASES))],
        "qid string, dataset string",
    )
    rows = {r["dataset"]: r for r in mean_metrics_by(rdf, qdf, ds, k=K).collect()}
    assert set(rows) == {"A", "B"}
    per_q = {r["qid"]: r for r in per_query_metrics(rdf, qdf, k=K).collect()}
    for name, members in (
        ("A", [q for i, q in enumerate(sorted(CASES)) if i % 2 == 0]),
        ("B", [q for i, q in enumerate(sorted(CASES)) if i % 2 == 1]),
    ):
        want = sum(per_q[q]["ndcg"] for q in members) / len(members)
        assert math.isclose(rows[name]["ndcg"], want, abs_tol=1e-6), name


def test_best_checkpoint_argmax_and_ties(spark):
    scores = spark.createDataFrame(
        [
            ("m1", 100, 0.5),
            ("m1", 200, 0.9),
            ("m1", 300, 0.7),
            ("m2", 100, 0.4),
            ("m2", 200, 0.4),  # tie -> largest checkpoint wins
        ],
        "model string, checkpoint long, score double",
    )
    got = {r["model"]: (r["checkpoint"], r["score"]) for r in best_checkpoint(scores).collect()}
    assert got == {"m1": (200, 0.9), "m2": (200, 0.4)}


def test_known_item_perfect_retrieval(spark):
    """Metric sanity probe from the reference (sgpt_utils.ipynb cell 13):
    the relevant doc at rank 1 => all metrics 1."""
    rdf = spark.createDataFrame(
        [("q", "a", 5.0, 1)], "qid string, doc_id string, score double, rank int"
    )
    qdf = spark.createDataFrame([("q", "a", 1)], "qid string, doc_id string, relevance int")
    row = per_query_metrics(rdf, qdf, k=10).collect()[0]
    assert row["ndcg"] == 1.0 and row["mrr"] == 1.0 and row["recall"] == 1.0
    assert math.isclose(row["map"], 1.0)
    assert math.isclose(row["precision"], 0.1)  # 1 hit / k=10


def _duck(sf):
    import duckdb

    con = duckdb.connect()
    for t in ("documents", "events"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    return con


def test_metrics_by_dataset_duckdb_equality(spark):
    """metrics_by_dataset left the driver window for
    match_terms_metric_agg (round 5); exact registry query vs exact
    registry SQL at sf0.001."""
    import __spark_entry__ as entry

    sf = "/root/testdata/sf0.001"
    df = entry._q_metrics_by_dataset(spark, sf)
    cols = sorted(df.columns)
    got = sorted(
        tuple(round(r[c], 6) if isinstance(r[c], float) else r[c] for c in cols)
        for r in df.collect()
    )
    ores = _duck(sf).execute(entry._METRICS_BY_DATASET_SQL).fetchdf()
    assert sorted(ores.columns.tolist()) == cols
    want = sorted(
        tuple(
            round(row[c], 6) if isinstance(row[c], float) else row[c]
            for c in cols
        )
        for _, row in ores.iterrows()
    )
    assert got == want and len(got) > 0


def test_best_checkpoint_duckdb_equality(spark):
    """best_checkpoint_argmax left the driver window for match_stats_agg
    (round 5); exact registry query vs exact registry SQL at sf0.001."""
    import __spark_entry__ as entry

    sf = "/root/testdata/sf0.001"
    df = entry._q_best_checkpoint(spark, sf)
    cols = sorted(df.columns)
    got = sorted(
        tuple(round(r[c], 6) if isinstance(r[c], float) else r[c] for c in cols)
        for r in df.collect()
    )
    ores = _duck(sf).execute(entry._BEST_CHECKPOINT_SQL).fetchdf()
    assert sorted(ores.columns.tolist()) == cols
    want = sorted(
        tuple(
            round(float(row[c]), 6) if not isinstance(row[c], str) else row[c]
            for c in cols
        )
        for _, row in ores.iterrows()
    )
    got_norm = [
        tuple(float(x) if not isinstance(x, str) else x for x in t) for t in got
    ]
    assert got_norm == want and len(got) > 0


def test_average_precision_duckdb_equality(spark):
    """average_precision_global left the driver window for
    match_range_agg (round 5); exact registry query vs exact registry
    SQL at sf0.001."""
    import __spark_entry__ as entry

    sf = "/root/testdata/sf0.001"
    df = entry._q_average_precision(spark, sf)
    cols = sorted(df.columns)
    got = sorted(
        tuple(round(r[c], 6) if isinstance(r[c], float) else r[c] for c in cols)
        for r in df.collect()
    )
    ores = _duck(sf).execute(entry._AP_SQL).fetchdf()
    assert sorted(ores.columns.tolist()) == cols
    want = sorted(
        tuple(
            round(row[c], 6) if isinstance(row[c], float) else int(row[c])
            for c in cols
        )
        for _, row in ores.iterrows()
    )
    assert got == want and len(got) > 0
