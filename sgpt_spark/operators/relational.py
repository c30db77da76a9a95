"""General relational operators from the reference's inventory
(SURVEY.md §2.4-2.9) demonstrated over the TPC-H-ish driver tables.

The reference does these with dict lookups and Python loops (hash-join-
by-dict, running precision loops, Counter top-N); here each is the
idiomatic Catalyst plan with the join/window strategy chosen for scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pricing_summary(lineitem: DataFrame) -> DataFrame:
    """TPC-H Q1 shape: multi-agg groupBy with computed measures
    (map-side partial agg; mirrors the reference's metric averaging,
    InformationRetrievalEvaluator.py:251-268)."""
    return (
        lineitem.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 6).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 6).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 6
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def topk_orders_per_customer(orders: DataFrame, k: int = 3) -> DataFrame:
    """Per-group top-k via window rank (the reference's per-query top-k
    pattern, exact_search.py:102-108, generalized). Deterministic
    tie-break on o_orderkey."""
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        orders.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("o_custkey", "o_orderkey", F.round("o_totalprice", 6).alias("o_totalprice"), "rank")
    )


def customers_without_orders(
    customer: DataFrame, orders: DataFrame, since: str = "1998-01-01"
) -> DataFrame:
    """Anti join — the reference's query-doc pool exclusion
    (useb/evaluators/cqadupstack.py:63-64) as a left_anti: customers
    with no order on/after ``since`` (filter pushed below the join)."""
    recent = orders.filter(F.col("o_orderdate") >= F.lit(since)).select(
        F.col("o_custkey").alias("c_custkey")
    )
    return customer.join(recent, "c_custkey", "left_anti").select("c_custkey", "c_name")


def user_running_value(events: DataFrame) -> DataFrame:
    """Analytic window: per-user running sum + event rank ordered by
    time — the reference's running-precision loop
    (InformationRetrievalEvaluator.py:238-249) as a window frame."""
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    return events.select(
        "user_id",
        "event_id",
        F.row_number().over(w).alias("event_rank"),
        F.round(
            F.sum("value").over(w.rowsBetween(Window.unboundedPreceding, 0)), 6
        ).alias("running_value"),
    )


def event_type_counts(events: DataFrame, n: int = 10) -> DataFrame:
    """Counter.most_common(n) (sgpt_utils.ipynb cells 20-23) as
    groupBy + count + deterministic order + limit."""
    return (
        events.groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), F.col("event_type").asc())
        .limit(n)
    )


def corr_stats(df: DataFrame, col_a: str, col_b: str) -> DataFrame:
    """Pearson + Spearman correlation between two numeric columns — the
    reference computes these with scipy over score lists
    (useb/useb/useb/evaluators/twitterpara.py:110-117).

    Pearson is Spark's built-in ``corr`` aggregate. Spearman = Pearson
    over average ranks (scipy tie convention). Ranking avoids the
    single-partition global-window trap: per column, aggregate to
    (value, count) — |distinct values| rows, usually orders of magnitude
    below |rows| — compute the average rank with a window over THAT
    small relation (avg_rank = rows_before + (count+1)/2), and hash-join
    the ranks back. Shuffles are keyed by value (high cardinality, no
    skew beyond ties); nothing touches the driver.
    """
    a, b = F.col(col_a).cast("double"), F.col(col_b).cast("double")
    base = df.select(a.alias("_a"), b.alias("_b"))
    out = base
    for c in ("_a", "_b"):
        grp = base.groupBy(c).agg(F.count("*").alias("_cnt"))
        w = Window.orderBy(F.col(c)).rowsBetween(Window.unboundedPreceding, -1)
        ranks = grp.withColumn(
            f"{c}_rk",
            F.coalesce(F.sum("_cnt").over(w), F.lit(0)) + (F.col("_cnt") + 1) / 2.0,
        ).select(c, f"{c}_rk")
        out = out.join(ranks, c)
    return out.agg(
        F.round(F.corr("_a", "_b"), 6).alias("pearson"),
        F.round(F.corr("_a_rk", "_b_rk"), 6).alias("spearman"),
    )
