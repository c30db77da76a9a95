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


def per_query_metrics_at(
    results: DataFrame, qrels: DataFrame, k_values: list[int]
) -> DataFrame:
    """-> (qid, k, ndcg, map, mrr, precision, recall): every cutoff in
    ``k_values`` evaluated in ONE pass over the run — the reference's
    ``k_values=[1,3,5,10,100,1000]`` evaluation
    (beir_dense_retriever.py:440,446), with the cutoff as a dimension
    instead of six jobs.

    Plan: label + window-cumsum once (same as ``per_query_metrics``),
    then explode the (tiny, constant) k list onto each run row, filter
    ``rank <= k``, and aggregate by (qid, k). The run expands by
    |k_values|x before the single shuffle — bounded by
    |queries| x max_k x |k_values| rows, independent of corpus size.
    """
    ks = sorted(set(int(k) for k in k_values))
    n_rel = qrels.filter(F.col("relevance") > 0).groupBy("qid").agg(
        F.count("*").alias("n_rel")
    )
    labeled = results.join(
        F.broadcast(qrels.filter(F.col("relevance") > 0).withColumn("rel", F.lit(1))),
        ["qid", "doc_id"],
        "left",
    ).withColumn("rel", F.coalesce(F.col("rel"), F.lit(0)))
    w = Window.partitionBy("qid").orderBy("rank")
    running = labeled.withColumn("cum_hits", F.sum("rel").over(w))
    exploded = running.select(
        "qid", "rank", "rel", "cum_hits",
        F.explode(F.array(*[F.lit(k) for k in ks])).alias("k"),
    ).filter(F.col("rank") <= F.col("k"))
    per_q = exploded.groupBy("qid", "k").agg(
        F.sum(F.col("rel") / F.log2(F.col("rank") + 1)).alias("dcg"),
        F.sum(
            F.when(F.col("rel") == 1, F.col("cum_hits") / F.col("rank")).otherwise(0.0)
        ).alias("precision_sum"),
        F.max(F.when(F.col("rel") == 1, 1.0 / F.col("rank")).otherwise(0.0)).alias("mrr"),
        F.sum("rel").alias("hits"),
    )
    # every (qrels query, k) scores — queries with nothing retrieved get 0
    grid = n_rel.crossJoin(
        results.sparkSession.createDataFrame([(k,) for k in ks], "k int")
    )
    # both sides are |queries| x |k_values| rows — broadcast the probe
    # side so the plan never sort-merge-joins at scale
    joined = (
        grid.join(F.broadcast(per_q), ["qid", "k"], "left")
        .fillna(0.0, subset=["dcg", "precision_sum", "mrr"])
        .fillna(0, subset=["hits"])
    )
    idcg = F.aggregate(
        F.sequence(F.lit(1), F.least(F.col("k"), F.col("n_rel"))),
        F.lit(0.0),
        lambda acc, i: acc + 1.0 / F.log2(i.cast("double") + 1.0),
    )
    return joined.select(
        "qid",
        "k",
        (F.col("dcg") / idcg).alias("ndcg"),
        (F.col("precision_sum") / F.least(F.col("k"), F.col("n_rel"))).alias("map"),
        F.col("mrr").cast("double").alias("mrr"),
        (F.col("hits") / F.col("k")).alias("precision"),
        (F.col("hits") / F.col("n_rel")).alias("recall"),
    )


def mean_metrics_at(
    results: DataFrame, qrels: DataFrame, k_values: list[int]
) -> DataFrame:
    """-> (k, ndcg, map, mrr, precision, recall), one row per cutoff —
    the reference's multi-k evaluation summary in one job."""
    pq = per_query_metrics_at(results, qrels, k_values)
    return pq.groupBy("k").agg(
        F.round(F.avg("ndcg"), 6).alias("ndcg"),
        F.round(F.avg("map"), 6).alias("map"),
        F.round(F.avg("mrr"), 6).alias("mrr"),
        F.round(F.avg("precision"), 6).alias("precision"),
        F.round(F.avg("recall"), 6).alias("recall"),
    )


def mean_metrics_by(
    results: DataFrame,
    qrels: DataFrame,
    datasets: DataFrame,
    k: int = 10,
) -> DataFrame:
    """Per-dataset metric averaging — the reference's cqadupstack
    12-forum averaging (beir_dense_retriever.py:471-495,
    crossencoder_beir_bm25.ipynb:3346-3377 cell 16).

    ``datasets``: (qid, dataset) mapping — broadcast-sized (one row per
    query). -> (dataset, ndcg, map, mrr, precision, recall) means over
    the queries of each dataset.
    """
    pq = per_query_metrics(results, qrels, k)
    return (
        pq.join(F.broadcast(datasets), "qid")
        .groupBy("dataset")
        .agg(
            F.round(F.avg("ndcg"), 6).alias("ndcg"),
            F.round(F.avg("map"), 6).alias("map"),
            F.round(F.avg("mrr"), 6).alias("mrr"),
            F.round(F.avg("precision"), 6).alias("precision"),
            F.round(F.avg("recall"), 6).alias("recall"),
        )
    )


def best_checkpoint(
    scores: DataFrame,
    group_col: str = "model",
    arg_col: str = "checkpoint",
    score_col: str = "score",
) -> DataFrame:
    """argmax-by-score per group — the reference's best-checkpoint scan
    (max avg NDCG@10 over a checkpoint group,
    beir_dense_retriever.py:543-592), as one ``max_by`` aggregate.

    ``max(struct(score, arg))`` is a plain map-side-combinable aggregate
    (one shuffle of one row per group — no window sort), and the struct
    ordering makes ties deterministic: equal scores pick the LARGEST
    ``arg_col`` (the latest checkpoint), documented behavior.
    """
    return scores.groupBy(group_col).agg(
        F.max(F.struct(F.col(score_col).alias(score_col), F.col(arg_col).alias(arg_col))).alias("m")
    ).select(group_col, F.col(f"m.{arg_col}").alias(arg_col), F.col(f"m.{score_col}").alias(score_col))


def average_precision(
    df: DataFrame,
    label_col: str = "label",
    score_col: str = "score",
    id_col: str = "doc_id",
) -> DataFrame:
    """Global average precision over one ranking — the reference's
    sklearn ``average_precision_score`` use (useb/.../twitterpara.py:
    110-117), with the engine-wide deterministic order (score desc, id
    asc; sklearn instead groups tied scores — identical when scores are
    distinct at 6 dp).

    AP = (1/n_pos) * sum over positive ranks of precision@rank. One
    global ranking -> one window; the global sort is inherent to the
    semantics (a single total ranking) and bounded by the candidate
    list size, matching the reference's single-list usage. For per-query
    AP at scale use ``per_query_metrics`` (its ``map`` column is AP@k,
    partitioned by qid).
    """
    w = Window.orderBy(F.col(score_col).desc(), F.col(id_col).asc())
    ranked = df.select(
        F.col(label_col).cast("int").alias("rel"),
        F.row_number().over(w).alias("rank"),
    )
    run = ranked.withColumn(
        "cum_hits", F.sum("rel").over(Window.orderBy("rank"))
    )
    return run.agg(
        F.round(
            F.sum(F.when(F.col("rel") == 1, F.col("cum_hits") / F.col("rank")).otherwise(0.0))
            / F.sum("rel"),
            6,
        ).alias("average_precision"),
        F.sum("rel").alias("n_pos"),
        F.count("*").alias("n"),
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
