"""ES ``distance_feature`` query — boost hits by closeness to an
origin (the recency/proximity ranking primitive).

ES's distance_feature scores a matching doc

    boost * pivot / (pivot + distance(value, origin))

and is used as a bool ``should`` clause so the closeness boost ADDS to
the text relevance score — the canonical web-search recency shape
("match the query, prefer recent pages"). The reference delegates this
DSL to its ES indexes (crossencoder/beir/crossencoder_beir_bm25.ipynb
cell 10); at the Common-Crawl scale this engine targets (pages carry a
``warc_ts`` crawl timestamp — BASELINE.json's input shape), recency
boosting is the first thing a production ranking adds on top of BM25.

Relational spelling: the FULL scored match set
(``funcscore.match_scores`` — the rescoring family's gated relation)
left-joins the doc-values sidecar once; the feature is a pure JVM
column; the sum ranks through the engine's deterministic top-k. Docs
missing the field contribute 0 from the clause (the ES should-clause
behavior for absent values); the match set itself is never widened —
distance_feature never matches on its own, exactly like a should
clause alongside a must.

Distance kinds: NUMERIC fields measure ``abs(value - origin)`` in the
field's own units; DATE/TIMESTAMP fields measure in fractional DAYS
(``abs(unix_seconds(value) - unix_seconds(origin)) / 86400``) with
``pivot`` in days — the one documented divergence from ES's
millisecond bookkeeping (identical ordering, saner units).

Scale shape: one match-scores plan + one doc_id-keyed sidecar join +
codegen arithmetic; nothing new shuffles beyond the join of candidate
rows.
"""

from __future__ import annotations

import datetime as _dt
from typing import Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sgpt_spark.operators.topk import topk_per_group

__all__ = [
    "distance_feature_column",
    "distance_feature_search_index",
    "rank_feature_column",
    "rank_feature_search_index",
]


def distance_feature_column(
    field_col, origin, pivot: float, boost: float = 1.0
):
    """The feature as a JVM column. ``origin``/``pivot``: numbers in
    the field's units, or a datetime origin with ``pivot`` in days."""
    if pivot <= 0:
        raise ValueError(f"pivot must be > 0, got {pivot}")
    if boost <= 0:
        raise ValueError(f"boost must be > 0, got {boost}")
    if isinstance(origin, (_dt.datetime, _dt.date)):
        dist = (
            F.abs(
                F.unix_timestamp(field_col)
                - F.unix_timestamp(F.lit(origin).cast("timestamp"))
            )
            / F.lit(86400.0)
        )
    else:
        dist = F.abs(field_col.cast("double") - F.lit(float(origin)))
    return F.lit(float(boost)) * F.lit(float(pivot)) / (F.lit(float(pivot)) + dist)


def rank_feature_column(
    field_col, function: str = "saturation", pivot: float = 1.0,
    boost: float = 1.0, exponent: float = 0.5,
):
    """ES ``rank_feature`` scoring functions as a JVM column over a
    positive static-feature field (pagerank, url_length, ...):
    saturation ``x/(x+pivot)``, log ``ln(scaling_factor + x)`` (pivot
    plays scaling_factor), sigmoid ``x^exp/(x^exp + pivot^exp)`` — each
    times ``boost``. The feature must be positive (the ES field-type
    contract); non-positive values contribute 0 at the call site."""
    if function not in ("saturation", "log", "sigmoid"):
        raise ValueError(
            f"unknown rank_feature function {function!r}: "
            "saturation|log|sigmoid"
        )
    if pivot <= 0:
        raise ValueError(f"pivot must be > 0, got {pivot}")
    if boost <= 0:
        raise ValueError(f"boost must be > 0, got {boost}")
    x = field_col.cast("double")
    if function == "saturation":
        f = x / (x + F.lit(float(pivot)))
    elif function == "log":
        f = F.log(F.lit(float(pivot)) + x)
    else:
        if exponent <= 0:
            raise ValueError(f"exponent must be > 0, got {exponent}")
        xe = F.pow(x, F.lit(float(exponent)))
        f = xe / (xe + F.lit(float(pivot) ** float(exponent)))
    return F.lit(float(boost)) * f


def rank_feature_search_index(
    spark: SparkSession,
    postings: DataFrame,
    meta,
    queries: DataFrame | Iterable[tuple],
    docvalues: DataFrame,
    field: str,
    function: str = "saturation",
    pivot: float = 1.0,
    boost: float = 1.0,
    exponent: float = 0.5,
    k: int = 10,
    term_stats: DataFrame | None = None,
    tokenizer=None,
) -> DataFrame:
    """match query + rank_feature should clause -> (qid, doc_id, score,
    rank): the static-feature sibling of ``distance_feature_search_index``
    (same plan — one sidecar join + codegen math on the gated
    match_scores relation; missing or non-positive features add 0)."""
    from sgpt_spark.operators.funcscore import match_scores

    if field not in docvalues.columns:
        raise ValueError(
            f"rank_feature field {field!r} not in docvalues columns "
            f"{docvalues.columns}"
        )
    feature = rank_feature_column(
        F.col(field), function=function, pivot=pivot, boost=boost,
        exponent=exponent,
    )
    scored = match_scores(
        spark, postings, meta, queries, term_stats=term_stats,
        tokenizer=tokenizer,
    )
    boosted = (
        scored.join(docvalues.select("doc_id", field), "doc_id", "left")
        .select(
            "qid",
            "doc_id",
            (
                F.col("score")
                + F.coalesce(
                    F.when(F.col(field) > 0, feature), F.lit(0.0)
                )
            ).alias("score"),
        )
    )
    return topk_per_group(boosted, k=k).select("qid", "doc_id", "score", "rank")


def distance_feature_search_index(
    spark: SparkSession,
    postings: DataFrame,
    meta,
    queries: DataFrame | Iterable[tuple],
    docvalues: DataFrame,
    field: str,
    origin,
    pivot: float,
    boost: float = 1.0,
    k: int = 10,
    term_stats: DataFrame | None = None,
    tokenizer=None,
) -> DataFrame:
    """match query + distance_feature should clause over the compressed
    index -> (qid, doc_id, score, rank): BM25 plus the closeness boost,
    deterministic top-k. ``docvalues``: the (doc_id, field) sidecar
    (``build_postings_with_docvalues`` / any projection)."""
    from sgpt_spark.operators.funcscore import match_scores

    if field not in docvalues.columns:
        raise ValueError(
            f"distance_feature field {field!r} not in docvalues columns "
            f"{docvalues.columns}"
        )
    feature = distance_feature_column(F.col(field), origin, pivot, boost)
    scored = match_scores(
        spark, postings, meta, queries, term_stats=term_stats,
        tokenizer=tokenizer,
    )
    boosted = (
        scored.join(docvalues.select("doc_id", field), "doc_id", "left")
        .select(
            "qid",
            "doc_id",
            (
                F.col("score")
                + F.coalesce(
                    F.when(F.col(field).isNotNull(), feature), F.lit(0.0)
                )
            ).alias("score"),
        )
    )
    return topk_per_group(boosted, k=k).select("qid", "doc_id", "score", "rank")
