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

__all__ = ["auto_date_histogram_agg", "variable_width_histogram_agg"]

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


def variable_width_histogram_agg(
    candidates: DataFrame,
    docvalues: DataFrame,
    field: str,
    buckets: int = 10,
    initial_factor: int = 2,
) -> DataFrame:
    """ES ``variable_width_histogram`` — numeric buckets whose WIDTHS
    adapt to the data (dense regions get narrow buckets), the request
    naming only a target ``buckets`` count. -> (qid, bucket_min, key,
    bucket_max, doc_count) per query, ES's response shape (key = the
    bucket centroid), buckets disjoint and ordered, at most ``buckets``
    per query.

    ES's algorithm is an order-dependent one-pass streaming clusterer
    (collect up to shard_size values, merge nearest clusters as new
    values arrive) whose result depends on document iteration order.
    This engine substitutes the DETERMINISTIC fixed point of the same
    idea — documented divergence, same response shape and the same
    adaptive-width contract:

      1. exact equal-frequency seeding: ``buckets x initial_factor``
         interior type-7 percentile cut points per query (one
         map-side-combinable groupBy; duplicate cut points collapse,
         so heavy ties cannot over-split);
      2. assignment in codegen: bucket ordinal = |{edges < value}| via
         a ``filter``/``size`` lambda over the per-query edge array
         (broadcast-joined back, query-sized);
      3. per-(query, ordinal) summaries (count/sum/min/max — one more
         map-side-combinable groupBy);
      4. agglomerative merge of the ADJACENT pair with the nearest
         centroids until <= ``buckets`` remain — per query over
         <= buckets x initial_factor summary rows, an applyInPandas
         island whose input is bucket summaries, never values (the
         tiny-relation contract; ties break on the lower ordinal, so
         the result is partition- and order-independent).

    Scale: values are touched exactly twice (percentile agg, summary
    agg), both aggregations combine map-side; the Python island sees
    O(buckets) rows per query. NULL values fall in no bucket."""
    import pandas as pd

    if field not in docvalues.columns:
        raise ValueError(
            f"variable_width_histogram field {field!r} not in docvalues "
            f"columns {docvalues.columns}"
        )
    if buckets < 1:
        raise ValueError(f"buckets must be >= 1, got {buckets}")
    if initial_factor < 1:
        raise ValueError(f"initial_factor must be >= 1, got {initial_factor}")
    m = int(buckets) * int(initial_factor)
    vals = candidates.join(
        docvalues.select("doc_id", F.col(field).cast("double").alias("_v")),
        "doc_id",
    ).filter(F.col("_v").isNotNull())
    fracs = F.array(*[F.lit(i / m) for i in range(1, m)])
    edges = vals.groupBy("qid").agg(
        F.array_distinct(F.percentile(F.col("_v"), fracs)).alias("_edges")
    )
    assigned = vals.join(F.broadcast(edges), "qid").select(
        "qid",
        "_v",
        F.size(F.filter("_edges", lambda e: e < F.col("_v"))).alias("_ord"),
    )
    summ = assigned.groupBy("qid", "_ord").agg(
        F.count("*").alias("_n"),
        F.sum("_v").alias("_s"),
        F.min("_v").alias("_lo"),
        F.max("_v").alias("_hi"),
    )
    target = int(buckets)
    out_schema = (
        f"qid {dict(candidates.dtypes)['qid']}, bucket_min double, "
        "key double, bucket_max double, doc_count long"
    )

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        rows = sorted(
            zip(pdf["_ord"], pdf["_n"], pdf["_s"], pdf["_lo"], pdf["_hi"])
        )
        bs = [[int(n), float(s), float(lo), float(hi)] for _, n, s, lo, hi in rows]
        while len(bs) > target:
            best, best_d = 0, float("inf")
            for i in range(len(bs) - 1):
                d = bs[i + 1][1] / bs[i + 1][0] - bs[i][1] / bs[i][0]
                if d < best_d:  # strict: ties keep the LOWER ordinal
                    best, best_d = i, d
            a, b = bs[best], bs[best + 1]
            bs[best] = [a[0] + b[0], a[1] + b[1], min(a[2], b[2]), max(a[3], b[3])]
            del bs[best + 1]
        qid = pdf["qid"].iloc[0]
        return pd.DataFrame(
            {
                "qid": [qid] * len(bs),
                "bucket_min": [b[2] for b in bs],
                "key": [b[1] / b[0] for b in bs],
                "bucket_max": [b[3] for b in bs],
                "doc_count": [b[0] for b in bs],
            }
        )

    return summ.groupBy("qid").applyInPandas(
        lambda _k, pdf: merge(pdf), schema=out_schema
    )
