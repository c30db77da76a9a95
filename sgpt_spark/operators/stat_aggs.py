"""ES statistical aggregations, continued: ``weighted_avg``,
``median_absolute_deviation``, ``boxplot``, and ``t_test`` — the
numeric-analysis metric aggs a search request can carry, over the same
(candidates, docvalues) relations as ``operators.aggs``. The reference
delegates its aggregation DSL to ES (crossencoder/beir/
crossencoder_beir_bm25.ipynb cell 10).

``weighted_avg``      ES ``weighted_avg``: sum(value*weight) /
                      sum(weight) per query. ES skips docs missing the
                      VALUE; a missing WEIGHT counts as 1 only when
                      ``weight_missing`` says so (ES requires an
                      explicit ``missing`` for weights — mirrored
                      here). One exact two-sum fold, one IEEE division.
``median_absolute_deviation``  ES approximates MAD with a t-digest;
                      this engine computes it EXACTLY (median of
                      |x - median(x)|, type-7 interpolated like
                      ``percentiles_agg``) in two percentile passes —
                      the same global-exactness stance as rare_terms.
``boxplot``           ES ``boxplot``: min, q1, q2, q3, max (+ IQR
                      whisker fences, the ES response's upper/lower) —
                      one exact percentile call.
``t_test``            ES ``t_test``: Welch's two-sample t-statistic
                      between two FIELDS of the same match set
                      (the ES "paired fields, unpaired variance"
                      default is heteroscedastic = Welch). Derived from
                      exact integer-free moment sums; returns the
                      t-statistic (ES returns the p-value — a
                      documented divergence: the statistic is the
                      deterministic, engine-comparable part; the
                      p-value needs the t CDF, out of scope).

All four are single map-side-combinable groupBys (the MAD adds a
second, median-keyed pass). NULL handling follows the family rule:
missing values are ignored, all-NULL queries report NULL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "weighted_avg_agg",
    "median_absolute_deviation_agg",
    "boxplot_agg",
    "t_test_agg",
    "matrix_stats_agg",
    "string_stats_agg",
    "percentile_ranks_agg",
    "top_metrics_agg",
    "value_count_agg",
    "missing_agg",
]


def _vals(candidates: DataFrame, docvalues: DataFrame, fields: list) -> DataFrame:
    missing = [f for f in fields if f not in docvalues.columns]
    if missing:
        raise ValueError(
            f"fields {missing} not in docvalues columns {docvalues.columns}"
        )
    return candidates.join(docvalues.select("doc_id", *fields), "doc_id")


def weighted_avg_agg(
    candidates: DataFrame,
    docvalues: DataFrame,
    value_field: str,
    weight_field: str,
    weight_missing: float | None = None,
) -> DataFrame:
    """-> (qid, weighted_avg): sum(v*w)/sum(w) over docs with a value.
    Docs missing the weight use ``weight_missing`` when given, else the
    doc is skipped (ES errors without an explicit missing — skipping is
    this engine's loud-adjacent default, documented)."""
    vals = _vals(candidates, docvalues, [value_field, weight_field]).filter(
        F.col(value_field).isNotNull()
    )
    w = F.col(weight_field).cast("double")
    if weight_missing is not None:
        w = F.coalesce(w, F.lit(float(weight_missing)))
    else:
        vals = vals.filter(F.col(weight_field).isNotNull())
    return vals.groupBy("qid").agg(
        (
            F.sum(F.col(value_field).cast("double") * w) / F.sum(w)
        ).alias("weighted_avg")
    )


def median_absolute_deviation_agg(
    candidates: DataFrame,
    docvalues: DataFrame,
    field: str,
) -> DataFrame:
    """-> (qid, mad): EXACT median of |x - median(x)| per query (ES
    documents a t-digest approximation; a global shuffle computes the
    real thing — same request surface, stronger contract)."""
    vals = _vals(candidates, docvalues, [field]).filter(
        F.col(field).isNotNull()
    )
    med = vals.groupBy("qid").agg(
        F.percentile(field, 0.5).alias("_med")
    )
    return (
        vals.join(med, "qid")
        .select("qid", F.abs(F.col(field) - F.col("_med")).alias("_dev"))
        .groupBy("qid")
        .agg(F.percentile("_dev", 0.5).alias("mad"))
    )


def boxplot_agg(
    candidates: DataFrame,
    docvalues: DataFrame,
    field: str,
) -> DataFrame:
    """-> (qid, min_value, q1, q2, q3, max_value, lower, upper): the ES
    boxplot response — exact type-7 quartiles plus the 1.5*IQR whisker
    fences CLAMPED to the observed min/max (the ES whisker contract)."""
    vals = _vals(candidates, docvalues, [field]).filter(
        F.col(field).isNotNull()
    )
    agg = vals.groupBy("qid").agg(
        F.min(field).cast("double").alias("min_value"),
        F.percentile(field, [0.25, 0.5, 0.75]).alias("_q"),
        F.max(field).cast("double").alias("max_value"),
    )
    q1, q2, q3 = (F.col("_q")[i] for i in range(3))
    iqr = q3 - q1
    return agg.select(
        "qid",
        "min_value",
        q1.alias("q1"),
        q2.alias("q2"),
        q3.alias("q3"),
        "max_value",
        F.greatest(q1 - 1.5 * iqr, F.col("min_value")).alias("lower"),
        F.least(q3 + 1.5 * iqr, F.col("max_value")).alias("upper"),
    )


def matrix_stats_agg(
    candidates: DataFrame,
    docvalues: DataFrame,
    fields: list,
) -> DataFrame:
    """ES ``matrix_stats`` -> one row per (qid, field_a, field_b) with
    (count, mean_a, mean_b, covariance, correlation) — POPULATION
    covariance/correlation (the ES spelling), field_a <= field_b (the
    matrix is symmetric; the diagonal carries each field's variance as
    its self-covariance and correlation 1). Docs missing ANY of the
    fields are excluded entirely (the ES row-wise contract). Everything
    derives from one groupBy of exact sums (xi, xi*xj per pair), so
    each output double is a fixed IEEE chain. Correlation is NULL when
    either variance is 0. ES's skewness/kurtosis columns are the
    documented out-of-scope tail (different small-sample conventions
    across engines)."""
    fields = list(fields)
    if len(fields) < 2:
        raise ValueError("matrix_stats needs >= 2 fields")
    vals = _vals(candidates, docvalues, fields)
    for f in fields:
        vals = vals.filter(F.col(f).isNotNull())
    aggs = [F.count(F.lit(1)).cast("double").alias("_n")]
    for f in fields:
        aggs.append(F.sum(F.col(f).cast("double")).alias(f"_s_{f}"))
    pairs = [
        (fields[i], fields[j])
        for i in range(len(fields))
        for j in range(i, len(fields))
    ]
    for a, b_ in pairs:
        aggs.append(
            F.sum(F.col(a).cast("double") * F.col(b_).cast("double")).alias(
                f"_p_{a}_{b_}"
            )
        )
    agg = vals.groupBy("qid").agg(*aggs)

    def cov(a: str, b_: str):
        n = F.col("_n")
        return (
            F.col(f"_p_{a}_{b_}") - F.col(f"_s_{a}") * F.col(f"_s_{b_}") / n
        ) / n

    rows = []
    for a, b_ in pairs:
        # one formula covers the diagonal too: cov(a,a)/sqrt(va*va) is
        # exactly 1 when the variance is positive, NULL when constant
        denom = F.sqrt(cov(a, a) * cov(b_, b_))
        corr = F.when(denom > 0, cov(a, b_) / denom)
        rows.append(
            F.struct(
                F.lit(a).alias("field_a"),
                F.lit(b_).alias("field_b"),
                F.col("_n").cast("long").alias("count"),
                (F.col(f"_s_{a}") / F.col("_n")).alias("mean_a"),
                (F.col(f"_s_{b_}") / F.col("_n")).alias("mean_b"),
                cov(a, b_).alias("covariance"),
                corr.alias("correlation"),
            )
        )
    return agg.select(
        "qid", F.explode(F.array(*rows)).alias("_r")
    ).select("qid", "_r.*")


def t_test_agg(
    candidates: DataFrame,
    docvalues: DataFrame,
    field_a: str,
    field_b: str,
) -> DataFrame:
    """-> (qid, t_statistic, n_a, n_b): Welch's two-sample t between the
    two fields' non-NULL populations in the match set — t = (mean_a -
    mean_b) / sqrt(s2_a/n_a + s2_b/n_b) with UNBIASED sample variances
    (n-1), NULL when either side has < 2 values or both variances are
    zero."""
    vals = _vals(candidates, docvalues, [field_a, field_b])

    def moments(f: str, tag: str):
        c = F.count(f).cast("double")
        s = F.sum(F.col(f).cast("double"))
        s2 = F.sum(F.col(f).cast("double") * F.col(f).cast("double"))
        return [
            F.count(f).alias(f"n_{tag}"),
            s.alias(f"_s_{tag}"),
            s2.alias(f"_s2_{tag}"),
            c.alias(f"_c_{tag}"),
        ]

    agg = vals.groupBy("qid").agg(*moments(field_a, "a"), *moments(field_b, "b"))

    def var(tag: str):
        c, s, s2 = (F.col(f"_c_{tag}"), F.col(f"_s_{tag}"), F.col(f"_s2_{tag}"))
        return (s2 - s * s / c) / (c - 1)

    se2 = var("a") / F.col("_c_a") + var("b") / F.col("_c_b")
    t = F.when(
        (F.col("n_a") >= 2) & (F.col("n_b") >= 2) & (se2 > 0),
        (F.col("_s_a") / F.col("_c_a") - F.col("_s_b") / F.col("_c_b"))
        / F.sqrt(se2),
    )
    return agg.select("qid", t.alias("t_statistic"), "n_a", "n_b")


def string_stats_agg(
    candidates: DataFrame,
    docvalues: DataFrame,
    field: str,
) -> DataFrame:
    """ES ``string_stats`` metric aggregation over the match set -> one
    row per query: (qid, count, min_length, max_length, avg_length,
    entropy) over the field's non-NULL string values. Lengths are
    character counts; ``entropy`` is the Shannon entropy (bits) of the
    CHARACTER distribution pooled across all of the query's values —
    the ES definition. avg_length is spelled sum/count (one IEEE
    division); a query whose match set holds only NULLs reports count 0
    with NULL stats (the empty-stats shape) and NULL entropy.

    Plan shape: one docvalues join, one length groupBy, plus the
    entropy side — characters explode to (qid, char) rows and reduce in
    TWO map-side-combinable groupBys ((qid, char) counts, then the
    per-qid -sum(p log2 p) fold). The char relation is |match chars|
    rows pre-combine but collapses to |qid| x |alphabet| after the
    partial agg, so a 10^12-doc match set shuffles per-partition
    alphabet counts, never raw text. No UDF anywhere."""
    vals = _vals(candidates, docvalues, [field]).filter(
        F.col(field).isNotNull()
    )
    lens = vals.select("qid", F.length(field).alias("_len"))
    base = (
        candidates.select("qid").distinct().join(
            lens.groupBy("qid").agg(
                F.count("_len").alias("count"),
                F.min("_len").alias("min_length"),
                F.max("_len").alias("max_length"),
                (F.sum("_len").cast("double") / F.count("_len")).alias(
                    "avg_length"
                ),
            ),
            "qid",
            "left",
        )
    ).withColumn("count", F.coalesce(F.col("count"), F.lit(0)))
    chars = vals.select(
        "qid", F.explode(F.split(F.col(field), "")).alias("_ch")
    )
    per_char = chars.groupBy("qid", "_ch").agg(F.count("*").alias("_n"))
    ent = (
        per_char.groupBy("qid")
        .agg(
            F.sum("_n").alias("_tot"),
            F.sum(F.col("_n").cast("double") * F.log2(F.col("_n"))).alias(
                "_nlogn"
            ),
        )
        # -sum(p log2 p) refactored to log2(total) - sum(n log2 n)/total:
        # one fixed association order, no per-char division
        .select(
            "qid",
            (
                F.log2(F.col("_tot")) - F.col("_nlogn") / F.col("_tot")
            ).alias("entropy"),
        )
    )
    return base.join(ent, "qid", "left").select(
        "qid", "count", "min_length", "max_length", "avg_length", "entropy"
    )


def percentile_ranks_agg(
    candidates: DataFrame,
    docvalues: DataFrame,
    field: str,
    values: list,
) -> DataFrame:
    """ES ``percentile_ranks`` metric aggregation over the match set ->
    (qid, value, percentile): for each requested value, the percent of
    the query's non-NULL field values at or below it — computed EXACTLY
    as the inverse of the type-7 quantile ``percentiles_agg``'s exact
    path uses, so the two aggregations are mutual inverses on the same
    data (rank(quantile(p)) == p wherever the CDF is strictly
    increasing). ES runs a t-digest approximation of the same quantity;
    the engine's global-exactness stance (rare_terms, MAD) applies.

    For the sorted values a[0..n-1] and requested v: below a[0] -> 0,
    at or above a[n-1] -> 100, else h = i + (v - a[i])/(a[i+1] - a[i])
    with i the LARGEST index with a[i] <= v (duplicates collapse to
    their highest index — the type-7 inverse convention), percentile =
    100 h/(n-1).

    Plan shape: the requested values are a request-sized literal list —
    each contributes three conditional aggregates (count <= v, max <= v,
    min > v) to ONE map-side-combinable groupBy(qid), then a literal
    unpivot. No second pass over the data, no sort, no UDF; a 10^12-doc
    match set shuffles one row of partials per partition."""
    if not values:
        raise ValueError("percentile_ranks_agg needs at least one value")
    vs = [float(v) for v in values]
    if len(set(vs)) != len(vs):
        raise ValueError(f"duplicate values in {vs}")
    vals = _vals(candidates, docvalues, [field]).filter(
        F.col(field).isNotNull()
    )
    fv = F.col(field).cast("double")
    aggs = [F.count("*").alias("_n")]
    for j, v in enumerate(vs):
        le = fv <= F.lit(v)
        aggs += [
            F.sum(F.when(le, 1).otherwise(0)).alias(f"_c{j}"),
            F.max(F.when(le, fv)).alias(f"_lo{j}"),
            F.min(F.when(~le, fv)).alias(f"_hi{j}"),
        ]
    g = vals.groupBy("qid").agg(*aggs)
    rows = []
    for j, v in enumerate(vs):
        c, lo, hi = F.col(f"_c{j}"), F.col(f"_lo{j}"), F.col(f"_hi{j}")
        h = (c - 1).cast("double") + (F.lit(v) - lo) / (hi - lo)
        pct = (
            F.when(c == 0, F.lit(0.0))
            .when(c == F.col("_n"), F.lit(100.0))
            .otherwise(F.lit(100.0) * h / (F.col("_n") - 1).cast("double"))
        )
        rows.append(F.struct(F.lit(v).alias("value"), pct.alias("percentile")))
    return g.select("qid", F.explode(F.array(*rows)).alias("_r")).select(
        "qid", F.col("_r.value").alias("value"),
        F.col("_r.percentile").alias("percentile"),
    )


def top_metrics_agg(
    candidates: DataFrame,
    docvalues: DataFrame,
    metrics: list,
    sort_field: str,
    ascending: bool = False,
    size: int = 1,
) -> DataFrame:
    """ES ``top_metrics`` aggregation over the match set -> (qid,
    top_rank, sort_value, *metrics): the metric fields read off the
    doc(s) with the extreme sort value per query — the "value of m at
    max(t)" primitive (ES caps size at 10; the engine keeps the knob
    free). Docs whose sort field is NULL are skipped (the ES rule);
    ties break doc_id asc so the row set is deterministic. One
    docvalues join + one ranking window — the terms-agg top-size shape
    with the bucket key replaced by rank."""
    if size < 1:
        raise ValueError(f"size must be >= 1, got {size}")
    fields = [sort_field, *metrics]
    vals = _vals(candidates, docvalues, list(dict.fromkeys(fields))).filter(
        F.col(sort_field).isNotNull()
    )
    from pyspark.sql import Window

    order = F.col(sort_field).asc() if ascending else F.col(sort_field).desc()
    w = Window.partitionBy("qid").orderBy(order, F.col("doc_id").asc())
    return (
        vals.withColumn("top_rank", F.row_number().over(w))
        .filter(F.col("top_rank") <= size)
        .select(
            "qid", "top_rank", F.col(sort_field).alias("sort_value"), *metrics
        )
    )


def value_count_agg(
    candidates: DataFrame, docvalues: DataFrame, field: str
) -> DataFrame:
    """ES ``value_count`` metric aggregation -> (qid, value_count):
    non-NULL values of ``field`` in each query's match set (every
    matched qid reports, 0 included). One groupBy."""
    vals = _vals(candidates, docvalues, [field])
    return vals.groupBy("qid").agg(F.count(field).alias("value_count"))


def missing_agg(
    candidates: DataFrame, docvalues: DataFrame, field: str
) -> DataFrame:
    """ES ``missing`` bucket aggregation -> (qid, doc_count): matched
    docs whose ``field`` is NULL (docs absent from the docvalues
    relation count as missing — the left-join spelling of ES's
    missing-from-index rule)."""
    if field not in docvalues.columns:
        raise ValueError(
            f"fields [{field!r}] not in docvalues columns {docvalues.columns}"
        )
    vals = candidates.join(docvalues.select("doc_id", field), "doc_id", "left")
    return vals.groupBy("qid").agg(
        F.sum(F.when(F.col(field).isNull(), 1).otherwise(0)).alias("doc_count")
    )


def scripted_metric_agg(
    candidates: DataFrame,
    docvalues: DataFrame,
    map_exprs: dict,
    reduce_exprs: dict,
) -> DataFrame:
    """ES ``scripted_metric`` aggregation, speaking Spark SQL — the
    engine's script dialect (ES uses Painless; bucket_script set the
    documented-divergence precedent: scripts here are declarative
    expressions Catalyst can codegen, not a driver-side interpreter).

    ``map_exprs``: {name: sql} evaluated PER MATCHED DOC over the
    docvalues columns (the map_script role). ``reduce_exprs``:
    {out_col: sql} AGGREGATE expressions over the mapped names (the
    combine/reduce role — Spark's partial aggregation IS the
    combine_script: map-side partials merge before the shuffle, exactly
    the ES shard-combine contract). One row per query.

    init_script has no counterpart: Spark aggregates declare their own
    state. Unknown columns fail with Spark's resolution error at
    analysis time.

    Example (ES docs' profit idiom):
        scripted_metric_agg(cand, dv,
            {"profit": "price - cost"},
            {"total_profit": "sum(profit)"})
    """
    if not map_exprs or not reduce_exprs:
        raise ValueError("scripted_metric_agg needs map_exprs and reduce_exprs")
    overlap = set(map_exprs) & {"qid", "doc_id"}
    if overlap:
        raise ValueError(f"map_exprs may not shadow {sorted(overlap)}")
    vals = candidates.join(docvalues, "doc_id")
    mapped = vals.select(
        "qid",
        *[F.expr(sql).alias(name) for name, sql in map_exprs.items()],
    )
    return mapped.groupBy("qid").agg(
        *[F.expr(sql).alias(out) for out, sql in reduce_exprs.items()]
    )
