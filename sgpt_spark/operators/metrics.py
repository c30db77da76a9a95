"""IR evaluation metrics — Spark-native re-expression of the reference's
InformationRetrievalEvaluator (biencoder/nli_msmarco/sentence-transformers/
sentence_transformers/evaluation/InformationRetrievalEvaluator.py:189-271).

Semantics preserved exactly (SURVEY.md §5.2):
- binary gains; nDCG ideal-DCG from len(relevant)   (:230-236)
- MAP@k denominator min(k, |relevant|)              (:238-249)
- MRR@k = 1/first-relevant-rank within top-k        (:223-228)
- averages over the queries present in qrels

The reference's per-query Python loops become one plan: results ⨝
broadcast(qrels) -> window cumsum over rank -> groupBy(qid) -> mean.
At scale the only large relation is the run (|queries| x k rows); qrels
are broadcast, so there is a single shuffle keyed by qid.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window


def per_query_metrics(results: DataFrame, qrels: DataFrame, k: int = 10) -> DataFrame:
    """-> (qid, ndcg, map, mrr, precision, recall) at cutoff k, one row per
    query present in qrels (queries with no retrieved hits score 0).

    ``results``: (qid, doc_id, score, rank) — rank 1-based, deterministic.
    ``qrels``:   (qid, doc_id, relevance>0).
    """
    n_rel = qrels.filter(F.col("relevance") > 0).groupBy("qid").agg(
        F.count("*").alias("n_rel")
    )
    labeled = (
        results.filter(F.col("rank") <= k)
        .join(
            F.broadcast(qrels.filter(F.col("relevance") > 0).withColumn("rel", F.lit(1))),
            ["qid", "doc_id"],
            "left",
        )
        .withColumn("rel", F.coalesce(F.col("rel"), F.lit(0)))
    )
    w = Window.partitionBy("qid").orderBy("rank")
    running = labeled.withColumn("cum_hits", F.sum("rel").over(w))
    per_q = running.groupBy("qid").agg(
        F.sum(F.col("rel") / F.log2(F.col("rank") + 1)).alias("dcg"),
        F.sum(
            F.when(F.col("rel") == 1, F.col("cum_hits") / F.col("rank")).otherwise(0.0)
        ).alias("precision_sum"),
        F.max(F.when(F.col("rel") == 1, 1.0 / F.col("rank")).otherwise(0.0)).alias("mrr"),
        F.sum("rel").alias("hits"),
    )
    # Right join onto qrels' query set: unretrieved queries score 0.
    joined = (
        n_rel.join(per_q, "qid", "left")
        .fillna(0.0, subset=["dcg", "precision_sum", "mrr"])
        .fillna(0, subset=["hits"])
    )
    # ideal DCG from min(k, n_rel) ones at the top (binary gains).
    idcg = F.aggregate(
        F.sequence(F.lit(1), F.least(F.lit(k), F.col("n_rel"))),
        F.lit(0.0),
        lambda acc, i: acc + 1.0 / F.log2(i.cast("double") + 1.0),
    )
    return joined.select(
        "qid",
        (F.col("dcg") / idcg).alias("ndcg"),
        (F.col("precision_sum") / F.least(F.lit(k), F.col("n_rel"))).alias("map"),
        F.col("mrr").cast("double").alias("mrr"),
        (F.col("hits") / F.lit(float(k))).alias("precision"),
        (F.col("hits") / F.col("n_rel")).alias("recall"),
    )


def mean_metrics(results: DataFrame, qrels: DataFrame, k: int = 10) -> DataFrame:
    """Averages over the qrels query set — the reference's headline
    numbers (e.g. BM25 nDCG@10 avg, BASELINE.md)."""
    pq = per_query_metrics(results, qrels, k)
    return pq.agg(
        F.round(F.avg("ndcg"), 6).alias("ndcg"),
        F.round(F.avg("map"), 6).alias("map"),
        F.round(F.avg("mrr"), 6).alias("mrr"),
        F.round(F.avg("precision"), 6).alias("precision"),
        F.round(F.avg("recall"), 6).alias("recall"),
    )
