"""Metrics semantics vs the reference's InformationRetrievalEvaluator
formulas (via the pure-Python oracle) on hand-built rankings."""

from __future__ import annotations

import math

import pytest

from oracle.bm25_oracle import map_at_k, mrr_at_k, ndcg_at_k, precision_at_k, recall_at_k
from sgpt_spark.operators.metrics import mean_metrics, per_query_metrics

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
