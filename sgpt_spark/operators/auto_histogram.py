"""ES ``auto_date_histogram`` — date buckets where the REQUEST names a
target bucket count and the engine picks the interval.

ES's auto_date_histogram walks a rounding ladder (coarsening until the
bucket count fits the target); this engine carries the calendar rungs
its ``date_histogram`` supports — day, week, month, quarter, year —
and resolves the choice PER QUERY, relationally (ES resolves per
shard and re-coarsens at reduce; a global per-query choice is the
deterministic fixed point of that process, the same global-vs-shard
stance as the sampler/rare_terms operators). The reference delegates
aggregation DSL to its ES indexes (crossencoder/beir/
crossencoder_beir_bm25.ipynb cell 10).

Plan: ONE docvalues join computes all five date_trunc columns in
whole-stage codegen; one groupBy(qid) takes each rung's min/max key
(map-side combinable) from which the SPAN — the contiguous bucket
count the filled response would contain, ES's choice criterion — is a
scalar expression; a CASE picks the finest rung whose span fits
``buckets`` (falling back to year); the chosen rung joins back
query-sized and the final count is one groupBy(qid, bucket). Returns
(qid, interval, bucket, doc_count) — the interval column is part of
the ES response shape. min_doc_count=0 empty-bucket fill follows the
``date_histogram_agg`` sequence-explode idiom with a per-query CASE
step. NULL dates fall in no bucket.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["auto_date_histogram_agg"]

# finest -> coarsest; step spelled as make_interval so every rung is
# the SAME CalendarInterval type (a CASE cannot mix day-time and
# year-month interval types, which `interval 1 day` vs `interval 1
# month` literals are)
_LADDER = (
    ("day", "make_interval(0, 0, 0, 1)"),
    ("week", "make_interval(0, 0, 1, 0)"),
    ("month", "make_interval(0, 1, 0, 0)"),
    ("quarter", "make_interval(0, 3, 0, 0)"),
    ("year", "make_interval(1, 0, 0, 0)"),
)


def auto_date_histogram_agg(
    candidates: DataFrame,
    docvalues: DataFrame,
    field: str,
    buckets: int = 10,
    min_doc_count: int = 0,
) -> DataFrame:
    """-> (qid, interval, bucket, doc_count): per query the finest
    calendar interval (day/week/month/quarter/year) whose SPAN — the
    contiguous bucket count between the query's min and max key — is
    <= ``buckets`` (year if none fits), then that interval's
    date_histogram: empty buckets filled at min_doc_count=0 (the ES
    default; the filled row count then never exceeds ``buckets`` unless
    even the year rung overflows), skipped at 1."""
    if field not in docvalues.columns:
        raise ValueError(
            f"auto_date_histogram field {field!r} not in docvalues "
            f"columns {docvalues.columns}"
        )
    if buckets < 1:
        raise ValueError(f"buckets must be >= 1, got {buckets}")
    if min_doc_count not in (0, 1):
        raise ValueError(f"min_doc_count must be 0 or 1, got {min_doc_count}")
    vals = (
        candidates.join(docvalues.select("doc_id", field), "doc_id")
        .filter(F.col(field).isNotNull())
        .select(
            "qid",
            *[
                F.date_trunc(name, F.col(field)).cast("date").alias(f"_b_{name}")
                for name, _ in _LADDER
            ],
        )
    )
    # ES picks the interval from the SPAN (the contiguous bucket count
    # between the min and max key — what the filled response contains),
    # not from how many buckets happen to be non-empty
    per_q = vals.groupBy("qid").agg(
        *[
            f(F.col(f"_b_{name}")).alias(f"_{side}_{name}")
            for name, _ in _LADDER
            for side, f in (("lo", F.min), ("hi", F.max))
        ]
    )
    span = {
        "day": F.datediff("_hi_day", "_lo_day") + 1,
        "week": (F.datediff("_hi_week", "_lo_week") / 7).cast("long") + 1,
        "month": F.months_between("_hi_month", "_lo_month").cast("long") + 1,
        "quarter": (F.months_between("_hi_quarter", "_lo_quarter") / 3).cast(
            "long"
        )
        + 1,
        "year": (F.year("_hi_year") - F.year("_lo_year")) + 1,
    }
    per_q = per_q.select(
        "qid", *[span[name].alias(f"_n_{name}") for name, _ in _LADDER]
    )
    choice = F.lit(_LADDER[-1][0])
    for name, _ in reversed(_LADDER):
        choice = F.when(F.col(f"_n_{name}") <= buckets, F.lit(name)).otherwise(
            choice
        )
    chosen = per_q.select("qid", choice.alias("interval"))
    bucket = None
    for name, _ in _LADDER:
        c = F.when(F.col("interval") == name, F.col(f"_b_{name}"))
        bucket = c if bucket is None else F.coalesce(bucket, c)
    counts = (
        vals.join(chosen, "qid")
        .select("qid", "interval", bucket.alias("bucket"))
        .groupBy("qid", "interval", "bucket")
        .agg(F.count("*").alias("doc_count"))
    )
    if min_doc_count == 1:
        return counts
    step = None
    for name, sql in _LADDER:
        c = F.when(F.col("interval") == name, F.expr(sql))
        step = c if step is None else F.coalesce(step, c)
    spans = counts.groupBy("qid", "interval").agg(
        F.min("bucket").alias("_lo"), F.max("bucket").alias("_hi")
    )
    full = spans.select(
        "qid",
        "interval",
        F.explode(F.sequence(F.col("_lo"), F.col("_hi"), step)).alias("bucket"),
    )
    return full.join(counts, ["qid", "interval", "bucket"], "left").select(
        "qid",
        "interval",
        "bucket",
        F.coalesce(F.col("doc_count"), F.lit(0)).alias("doc_count"),
    )
