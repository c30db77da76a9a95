"""ES PIPELINE aggregations — second-order aggs computed over a parent
aggregation's BUCKET STREAM, not over documents (the ES ``buckets_path``
machinery: derivative, cumulative_sum, moving_fn, bucket_script,
bucket_sort, and the sibling max/min/avg/sum/stats_bucket family).

The reference rides ES for retrieval (crossencoder/beir/
crossencoder_beir_bm25.ipynb builds the search bodies); pipeline aggs
are the analytics layer those bodies can nest inside any histogram /
date_histogram / terms aggregation. Spark-first re-expression: a parent
bucket relation here IS a DataFrame (``aggs.histogram_agg`` /
``date_histogram_agg`` / ``terms_agg`` output, one row per (qid,
bucket)), so every pipeline agg is a WINDOW FUNCTION partitioned by qid
and ordered by the bucket key — no second scan of the match set, no
UDF, no driver loop. Sibling aggs (max_bucket & co) are one more
map-side-combinable groupBy over the same bucket relation.

ES semantics carried over exactly:

``derivative``       value[i] - value[i-1] in bucket-key order; the
                     FIRST bucket has no derivative (NULL). Parent must
                     be a histogram family (keys form a sequence — the
                     caller's contract; terms buckets are refused).
                     gap_policy: 'skip' (ES default — a NULL metric
                     yields a NULL derivative and the next non-NULL
                     bucket differentiates against the last non-NULL
                     value) or 'insert_zeros' (NULLs read as 0).
``cumulative_sum``   running sum in bucket-key order; NULL metric
                     contributes 0 (the ES gap behavior); every bucket
                     gets a value.
``moving_fn`` (avg)  trailing window of ``window`` buckets ENDING at
                     the previous bucket (the ES moving_fn default
                     shift=0 window [i-window, i-1]); partial windows
                     use what exists (ES passes the partial slice);
                     an empty window yields NULL. avg is spelled
                     sum/count so the one IEEE division is bit-identical
                     across engines.
``bucket_script``    per-bucket arithmetic over sibling metric columns,
                     as ONE Spark SQL expression (the Painless-script
                     role; a SQL expression is this engine's script
                     dialect — documented divergence).
``bucket_sort``      re-orders buckets by metric columns and applies
                     from/size (ES truncation semantics: sort is
                     optional, from/size alone truncate the incoming
                     order). Ties broken by the bucket key ascending so
                     the ranking is total (the engine-wide determinism
                     contract).
``sibling_bucket``   max_bucket / min_bucket / avg_bucket / sum_bucket /
                     stats_bucket -> ONE row per query. max/min return
                     one row per TYING bucket key (ES returns a keys[]
                     list; the exploded form is the relational spelling
                     and keeps the result hashable), NULL-metric buckets
                     skipped (ES gap policy).

Scale shape (10^12 docs): bucket relations are |queries| x |buckets|
rows — orders of magnitude below the match set — and every operator
here is one window pass or one groupBy over them; bucket_sort's
rank-filter compiles to Spark's partial/final WindowGroupLimit, so a
page never materializes the full per-query bucket sort on one task
beyond the parent's own bucket count.

Reference seam: no equivalent in /root/reference (it delegates all
analytics to ES); this is ES-parity surface per SURVEY.md §2.5.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_GAP_POLICIES = ("skip", "insert_zeros")


def _bucket_window(key_col: str) -> Window:
    return Window.partitionBy("qid").orderBy(F.col(key_col).asc())


def _check_cols(buckets: DataFrame, *cols: str) -> None:
    for c in cols:
        if c not in buckets.columns:
            raise ValueError(
                f"pipeline agg column {c!r} not in bucket columns "
                f"{buckets.columns}"
            )
    if "qid" not in buckets.columns:
        raise ValueError("bucket relation must carry a qid column")


def derivative(
    buckets: DataFrame,
    metric: str,
    key_col: str = "bucket",
    out_col: str | None = None,
    gap_policy: str = "skip",
) -> DataFrame:
    """ES ``derivative`` pipeline agg: adds ``out_col`` =
    metric[i] - metric[i-1] over each query's buckets in key order;
    the first bucket's derivative is NULL (the ES contract)."""
    _check_cols(buckets, metric, key_col)
    if gap_policy not in _GAP_POLICIES:
        raise ValueError(f"gap_policy {gap_policy!r} not in {_GAP_POLICIES}")
    out = out_col or f"{metric}_deriv"
    w = _bucket_window(key_col)
    if gap_policy == "insert_zeros":
        cur = F.coalesce(F.col(metric), F.lit(0))
        prev = F.lag(cur).over(w)
        return buckets.withColumn(out, cur - prev)
    # skip: a NULL metric has no derivative; the next non-NULL bucket
    # differentiates against the LAST non-NULL value before it.
    prev = F.last(F.col(metric), ignorenulls=True).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    return buckets.withColumn(out, F.col(metric) - prev)


def cumulative_sum(
    buckets: DataFrame,
    metric: str,
    key_col: str = "bucket",
    out_col: str | None = None,
) -> DataFrame:
    """ES ``cumulative_sum`` pipeline agg: running sum of ``metric`` in
    bucket-key order (NULL contributes 0; every bucket gets a value)."""
    _check_cols(buckets, metric, key_col)
    out = out_col or f"{metric}_cumsum"
    w = _bucket_window(key_col).rowsBetween(Window.unboundedPreceding, 0)
    return buckets.withColumn(
        out, F.sum(F.coalesce(F.col(metric), F.lit(0))).over(w)
    )


def moving_avg(
    buckets: DataFrame,
    metric: str,
    window: int,
    key_col: str = "bucket",
    out_col: str | None = None,
) -> DataFrame:
    """ES ``moving_fn`` with ``MovingFunctions.unweightedAvg``: the
    trailing window of ``window`` buckets ENDING AT THE PREVIOUS bucket
    (ES default shift=0 -> [i-window, i-1]); partial head windows
    average what exists; the first bucket (empty window) gets NULL.
    Spelled sum/count so the single IEEE division is bit-identical
    across engines (NULL metrics are skipped by both aggregates — the
    ES gap behavior for the slice)."""
    _check_cols(buckets, metric, key_col)
    if window < 1:
        raise ValueError(f"moving_avg window must be >= 1, got {window}")
    out = out_col or f"{metric}_mov{window}_avg"
    w = _bucket_window(key_col).rowsBetween(-window, -1)
    return buckets.withColumn(
        out,
        F.sum(metric).over(w).cast("double") / F.count(metric).over(w),
    )


def bucket_script(buckets: DataFrame, out_col: str, expr: str) -> DataFrame:
    """ES ``bucket_script`` pipeline agg: one derived column per bucket
    computed from sibling metric columns. ``expr`` is a Spark SQL
    expression over the bucket relation's columns — this engine's
    script dialect (ES uses Painless; documented divergence). Unknown
    columns fail at analysis time with Spark's own resolution error."""
    _check_cols(buckets)
    return buckets.withColumn(out_col, F.expr(expr))


def bucket_sort(
    buckets: DataFrame,
    sort: list[tuple[str, str]] | None = None,
    size: int | None = None,
    from_: int = 0,
    key_col: str = "bucket",
) -> DataFrame:
    """ES ``bucket_sort`` pipeline agg: re-rank each query's buckets by
    ``sort`` = [(column, 'asc'|'desc'), ...] and keep ranks
    (from_, from_ + size]; with no sort, from/size truncate the
    bucket-key order (the ES truncation mode). Adds ``sort_rank``
    (1-based, post-from_ offset removed so page rows rank 1..size).
    Ties break by the bucket key ascending — the determinism contract.
    Compiles to Spark's partial/final WindowGroupLimit via the
    rank-filter pattern."""
    _check_cols(buckets, key_col, *[c for c, _ in (sort or [])])
    order = []
    for col, direction in sort or []:
        if direction not in ("asc", "desc"):
            raise ValueError(
                f"bucket_sort direction {direction!r} must be asc|desc"
            )
        c = F.col(col)
        # ES gap policy for sorting: NULL metrics sort last either way.
        order.append(c.asc_nulls_last() if direction == "asc" else c.desc_nulls_last())
    order.append(F.col(key_col).asc())
    w = Window.partitionBy("qid").orderBy(*order)
    ranked = buckets.withColumn("_rnk", F.row_number().over(w))
    hi = None if size is None else from_ + size
    cond = F.col("_rnk") > from_
    if hi is not None:
        cond = cond & (F.col("_rnk") <= hi)
    return ranked.filter(cond).withColumn(
        "sort_rank", (F.col("_rnk") - F.lit(from_)).cast("int")
    ).drop("_rnk")


_SIBLING_OPS = ("max", "min", "avg", "sum", "stats")


def sibling_bucket(
    buckets: DataFrame,
    metric: str,
    op: str,
    key_col: str = "bucket",
) -> DataFrame:
    """ES sibling pipeline aggs (``max_bucket`` / ``min_bucket`` /
    ``avg_bucket`` / ``sum_bucket`` / ``stats_bucket``): collapse each
    query's bucket stream to one summary row. NULL-metric buckets are
    skipped (ES gap policy 'skip' — the default for sibling aggs).

    max/min return (qid, bucket_key, value): one row per TYING bucket
    key (the relational spelling of ES's keys[] list), keys in the
    bucket relation's key type cast to string. avg/sum return
    (qid, value); stats returns (qid, bucket_count, min_value,
    max_value, avg_value, sum_value). avg is spelled sum/count."""
    _check_cols(buckets, metric, key_col)
    if op not in _SIBLING_OPS:
        raise ValueError(f"sibling op {op!r} not in {_SIBLING_OPS}")
    nn = buckets.filter(F.col(metric).isNotNull())
    if op in ("max", "min"):
        agg_fn = F.max if op == "max" else F.min
        ext = nn.groupBy("qid").agg(agg_fn(metric).alias("value"))
        return (
            nn.join(ext, "qid")
            .filter(F.col(metric) == F.col("value"))
            .select(
                "qid",
                F.col(key_col).cast("string").alias("bucket_key"),
                "value",
            )
        )
    if op == "avg":
        return nn.groupBy("qid").agg(
            (F.sum(metric).cast("double") / F.count(metric)).alias("value")
        )
    if op == "sum":
        return nn.groupBy("qid").agg(F.sum(metric).alias("value"))
    return nn.groupBy("qid").agg(
        F.count(metric).alias("bucket_count"),
        F.min(metric).alias("min_value"),
        F.max(metric).alias("max_value"),
        (F.sum(metric).cast("double") / F.count(metric)).alias("avg_value"),
        F.sum(metric).alias("sum_value"),
    )
