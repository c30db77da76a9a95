"""ES ``pinned`` query — promote chosen documents above organic
results (the editorial/sponsored-slot primitive).

ES's pinned query takes a list of ids plus an organic query; the ids
rank first IN THE GIVEN ORDER (ES hands them descending constant
scores above any BM25 value) and appear even when they don't match the
organic query; organic hits follow by relevance with pinned duplicates
removed. The reference delegates query DSL to its ES indexes
(crossencoder/beir/crossencoder_beir_bm25.ipynb cell 10).

Relational spelling: pins are a (qid, doc_id, pin_rank) relation (or
(qid, [doc_ids]) arrays — posexploded in-plan); organic is the gated
``match_scores`` relation with pinned pairs anti-joined out; the final
page is ONE window over the union ordered (pinned first, pin_rank asc,
score desc, doc_id asc). Pinned rows carry their organic BM25 score
when they matched and NULL otherwise (ES's giant sentinel scores are a
sort trick, not information — the rank column IS the contract).

Scale shape: pins are request-sized; the anti join and union add one
query-keyed shuffle over candidate rows on top of the match plan.
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sgpt_spark.operators.topk import SCORE_DECIMALS

__all__ = ["pinned_search_index"]


def _normalize_pins(spark: SparkSession, pins) -> DataFrame:
    """(qid, doc_id, pin_rank) from a DataFrame with those columns, a
    (qid, doc_ids array) DataFrame, or an iterable of (qid, [ids])."""
    if not isinstance(pins, DataFrame):
        rows = list(pins)
        if not rows:
            raise ValueError("pinned: empty pins")
        qid_type = "bigint" if isinstance(rows[0][0], int) else "string"
        pins = spark.createDataFrame(
            rows, f"qid {qid_type}, doc_ids array<long>"
        )
    if "pin_rank" in pins.columns:
        return pins.select("qid", "doc_id", "pin_rank")
    return pins.select(
        "qid", F.posexplode("doc_ids").alias("_p", "doc_id")
    ).select("qid", "doc_id", (F.col("_p") + 1).alias("pin_rank"))


def pinned_search_index(
    spark: SparkSession,
    postings: DataFrame,
    meta,
    queries: DataFrame | Iterable[tuple],
    pins,
    k: int = 10,
    term_stats: DataFrame | None = None,
    tokenizer=None,
) -> DataFrame:
    """-> (qid, doc_id, score, rank): pins first in pin order (score =
    organic BM25 when the doc also matched, else NULL), organic hits
    after by (score desc, doc_id asc), top-k overall."""
    from sgpt_spark.operators.funcscore import match_scores

    pins = _normalize_pins(spark, pins)
    scored = match_scores(
        spark, postings, meta, queries, term_stats=term_stats,
        tokenizer=tokenizer,
    ).withColumn("score", F.round("score", SCORE_DECIMALS))
    pinned_rows = pins.join(scored, ["qid", "doc_id"], "left").select(
        "qid", "doc_id", "score", "pin_rank"
    )
    organic = scored.join(pins, ["qid", "doc_id"], "left_anti").select(
        "qid", "doc_id", "score", F.lit(None).cast("int").alias("pin_rank")
    )
    w = Window.partitionBy("qid").orderBy(
        F.col("pin_rank").asc_nulls_last(),
        F.col("score").desc_nulls_last(),
        F.col("doc_id").asc(),
    )
    return (
        pinned_rows.unionByName(organic)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "doc_id", "score", "rank")
    )
