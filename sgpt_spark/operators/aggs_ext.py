"""ES aggregation surface, continued: ``rare_terms``, ``multi_terms``,
``adjacency_matrix``, and the ``diversified_sampler`` — the remaining
bucket aggregations a search request can carry, over the same two
relations every agg here consumes (the match-set candidates and the
doc-values sidecar; see ``operators.aggs``).

The reference delegates its search bodies to ES
(crossencoder/beir/crossencoder_beir_bm25.ipynb cell 10); these are the
Lucene doc-values aggregations those bodies could name, re-expressed as
pure DataFrame plans (no UDF, no driver loop):

``rare_terms_agg``    ES ``rare_terms``: the LONG-TAIL complement of
                      ``terms`` — buckets whose doc_count is <=
                      max_doc_count, ordered (doc_count asc, value
                      asc). ES approximates this with a CuckooFilter
                      because its shard-at-a-time model cannot see
                      global counts; a Spark groupBy counts globally in
                      one map-side-combinable pass, so this engine is
                      EXACT where ES documents false positives — same
                      request surface, strictly stronger contract.
``multi_terms_agg``   ES ``multi_terms``: compound bucket key over N
                      fields; a doc missing ANY key field is excluded
                      (the ES contract); buckets rank (doc_count desc,
                      key components asc). One groupBy over the N key
                      columns — the compound key never concatenates
                      into strings, so numeric fields keep their
                      doc-values comparison semantics until the output
                      casts for the bucket key.
``adjacency_matrix_agg``  ES ``adjacency_matrix``: named filter buckets
                      plus every pairwise INTERSECTION bucket
                      ("a&b"), empty buckets omitted (the ES
                      response shape). One doc-values scan evaluates
                      all predicates in whole-stage codegen into a
                      (qid, doc_id, name) matched relation; singles are
                      one groupBy, intersections one self-join on
                      (qid, doc_id) with name1 < name2 — rows bounded
                      by matches x matched-filter fan-out, never
                      |docs| x |filters|^2.
``diversified_sampler_candidates``  ES ``diversified_sampler``: the
                      sampler's top-shard_size candidate cut with a
                      diversity constraint — at most
                      ``max_docs_per_value`` docs per distinct value of
                      ``field`` survive (two stacked windows: per
                      (qid, value) then per qid, both on the engine's
                      (rounded score desc, doc_id asc) contract). NULL
                      field values form ONE diversity group (documented
                      choice — ES leaves missing-value behavior to the
                      value source). Like ``sampler_candidates``, the
                      global per-query cut is the deterministic twin of
                      ES's per-shard sample.

Scale notes: every operator is one or two map-side-combinable groupBys
or windows over match-set-bounded relations; the adjacency self-join
and the diversity windows shuffle only matched rows.
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "rare_terms_agg",
    "multi_terms_agg",
    "adjacency_matrix_agg",
    "extended_stats_agg",
    "diversified_sampler_candidates",
]


def rare_terms_agg(
    candidates: DataFrame,
    docvalues: DataFrame,
    field: str,
    max_doc_count: int = 1,
) -> DataFrame:
    """-> (qid, value, doc_count, bucket_rank): buckets of ``field``
    with doc_count <= ``max_doc_count`` in the query's match set,
    ordered (doc_count asc, value asc). NULL values excluded (the
    terms-agg convention). Exact — see module docstring."""
    if field not in docvalues.columns:
        raise ValueError(
            f"rare_terms field {field!r} not in docvalues columns "
            f"{docvalues.columns}"
        )
    if max_doc_count < 1:
        raise ValueError(f"max_doc_count must be >= 1, got {max_doc_count}")
    counts = (
        candidates.join(docvalues.select("doc_id", field), "doc_id")
        .filter(F.col(field).isNotNull())
        .groupBy("qid", F.col(field).cast("string").alias("value"))
        .agg(F.count("*").alias("doc_count"))
        .filter(F.col("doc_count") <= max_doc_count)
    )
    w = Window.partitionBy("qid").orderBy(
        F.col("doc_count").asc(), F.col("value").asc()
    )
    return counts.withColumn("bucket_rank", F.row_number().over(w))


def multi_terms_agg(
    candidates: DataFrame,
    docvalues: DataFrame,
    fields: Iterable[str],
    size: int = 10,
) -> DataFrame:
    """-> (qid, value_<f1>, ..., value_<fN>, doc_count, bucket_rank):
    top-``size`` compound buckets per query by (doc_count desc, key
    components asc, left to right). A doc with ANY NULL key field is
    excluded (the ES multi_terms contract)."""
    fields = list(fields)
    if len(fields) < 2:
        raise ValueError("multi_terms needs >= 2 fields (use terms_agg for 1)")
    missing = [f for f in fields if f not in docvalues.columns]
    if missing:
        raise ValueError(
            f"multi_terms fields {missing} not in docvalues columns "
            f"{docvalues.columns}"
        )
    vals = candidates.join(docvalues.select("doc_id", *fields), "doc_id")
    for f in fields:
        vals = vals.filter(F.col(f).isNotNull())
    keys = [F.col(f).cast("string").alias(f"value_{f}") for f in fields]
    counts = vals.groupBy("qid", *keys).agg(F.count("*").alias("doc_count"))
    w = Window.partitionBy("qid").orderBy(
        F.col("doc_count").desc(),
        *[F.col(f"value_{f}").asc() for f in fields],
    )
    return counts.withColumn("bucket_rank", F.row_number().over(w)).filter(
        F.col("bucket_rank") <= size
    )


def adjacency_matrix_agg(
    candidates: DataFrame,
    docvalues: DataFrame,
    filters: dict[str, str],
    separator: str = "&",
    strategy: str = "mask",
) -> DataFrame:
    """-> (qid, key, doc_count): one bucket per named filter plus one
    per pairwise intersection keyed ``"a&b"`` (names in sorted order —
    ES's deterministic key spelling), empty buckets omitted.
    ``filters``: name -> Spark SQL predicate over docvalues columns
    (the ``filters_agg`` contract; NULL predicate results don't
    match).

    ``strategy='mask'`` (default, r6): every predicate evaluates to one
    bit of a per-(qid, doc) long bitmask in whole-stage codegen, a
    map-side-combinable groupBy(qid, mask) collapses the match set to
    <= |qids| x 2^n observed-mask rows, and the singles + pairwise keys
    expand IN-PLAN from the mask bits of that tiny relation — the r5
    spelling self-joined the exploded (qid, doc_id, name) relation on
    (qid, doc_id), shuffling |matches| x fan-out rows twice (the worst
    agg row in the r5 bench). Falls back to the self-join above 62
    filters (mask bits; ES itself caps the agg at 100 filters).
    ``strategy='selfjoin'`` pins the r5 spelling (the verification
    twin, pytest-equated on randomized filter batteries)."""
    if strategy not in ("mask", "selfjoin"):
        raise ValueError(
            f"unknown strategy {strategy!r}: use mask|selfjoin"
        )
    if not filters:
        raise ValueError("adjacency_matrix needs at least one named filter")
    names = sorted(filters)
    bad = [n for n in names if separator in n]
    if bad:
        raise ValueError(
            f"filter names {bad} contain the separator {separator!r}"
        )
    vals = candidates.join(docvalues, "doc_id")
    n = len(names)
    if strategy == "mask" and n <= 62:
        bit = None
        for i, nm in enumerate(names):
            t = F.when(
                F.coalesce(F.expr(filters[nm]), F.lit(False)),
                F.lit(1 << i),
            ).otherwise(F.lit(0))
            bit = t if bit is None else bit + t
        mrel = (
            vals.select("qid", bit.cast("long").alias("_m"))
            .filter(F.col("_m") > 0)
            .groupBy("qid", "_m")
            .agg(F.count("*").alias("_c"))
        )
        key_exprs = [
            F.when(
                F.col("_m").bitwiseAND(F.lit(1 << i)) != 0, F.lit(names[i])
            )
            for i in range(n)
        ]
        for i in range(n):
            for j in range(i + 1, n):
                m = (1 << i) | (1 << j)
                key_exprs.append(
                    F.when(
                        F.col("_m").bitwiseAND(F.lit(m)) == F.lit(m),
                        F.lit(f"{names[i]}{separator}{names[j]}"),
                    )
                )
        return (
            mrel.select(
                "qid",
                "_c",
                F.explode(F.array_compact(F.array(*key_exprs))).alias("key"),
            )
            .groupBy("qid", "key")
            .agg(F.sum("_c").cast("long").alias("doc_count"))
        )
    matched_names = F.array_compact(
        F.array(
            *[
                F.when(
                    F.coalesce(F.expr(filters[n]), F.lit(False)), F.lit(n)
                )
                for n in names
            ]
        )
    )
    matched = vals.select(
        "qid", "doc_id", F.explode(matched_names).alias("name")
    )
    singles = matched.groupBy("qid", F.col("name").alias("key")).agg(
        F.count("*").alias("doc_count")
    )
    a = matched.select("qid", "doc_id", F.col("name").alias("_n1"))
    b = matched.select("qid", "doc_id", F.col("name").alias("_n2"))
    pairs = (
        a.join(b, ["qid", "doc_id"])
        .filter(F.col("_n1") < F.col("_n2"))
        .groupBy(
            "qid",
            F.concat_ws(separator, F.col("_n1"), F.col("_n2")).alias("key"),
        )
        .agg(F.count("*").alias("doc_count"))
    )
    return singles.unionByName(pairs)


def extended_stats_agg(
    candidates: DataFrame,
    docvalues: DataFrame,
    field: str,
    sigma: float = 2.0,
) -> DataFrame:
    """ES ``extended_stats`` metric aggregation -> one row per query:
    the ``stats`` fields plus sum_of_squares, variance (POPULATION —
    the ES spelling), std_deviation, and the sigma bounds
    (avg +- sigma * std_dev). Spelled from exact integer sums
    (sum, sum of squares, count) so every derived double is a fixed
    chain of IEEE steps both engines reproduce (the ``stats_agg`` /
    ``_metric_cols`` determinism rule); NULL values are ignored, and a
    query with only NULLs reports value_count 0 with NULL moments."""
    if field not in docvalues.columns:
        raise ValueError(
            f"extended_stats field {field!r} not in docvalues columns "
            f"{docvalues.columns}"
        )
    if sigma < 0:
        raise ValueError(f"sigma must be >= 0, got {sigma}")
    vals = candidates.join(docvalues.select("doc_id", field), "doc_id")
    c = F.count(field).cast("double")
    s = F.sum(field).cast("double")
    s2 = F.sum(F.col(field).cast("double") * F.col(field).cast("double"))
    base = vals.groupBy("qid").agg(
        F.count(field).alias("value_count"),
        F.min(field).alias("min_value"),
        F.max(field).alias("max_value"),
        (s / c).alias("avg_value"),
        F.sum(field).cast("long").alias("sum_value"),
        s2.alias("sum_of_squares"),
        ((s2 - s * s / c) / c).alias("variance"),
    )
    std = F.sqrt(F.col("variance"))
    return base.select(
        "*",
        std.alias("std_deviation"),
        (F.col("avg_value") + F.lit(float(sigma)) * std).alias("std_upper"),
        (F.col("avg_value") - F.lit(float(sigma)) * std).alias("std_lower"),
    )


def diversified_sampler_candidates(
    scored: DataFrame,
    docvalues: DataFrame,
    field: str,
    shard_size: int = 100,
    max_docs_per_value: int = 1,
) -> DataFrame:
    """-> (qid, doc_id): each query's ``shard_size`` best-scoring
    matched docs AFTER keeping at most ``max_docs_per_value`` docs per
    distinct ``field`` value (best-scoring docs win each value's
    slots). ``scored``: the full scored match set
    (funcscore.match_scores), like ``sampler_candidates``."""
    if field not in docvalues.columns:
        raise ValueError(
            f"diversified_sampler field {field!r} not in docvalues columns "
            f"{docvalues.columns}"
        )
    if shard_size < 1 or max_docs_per_value < 1:
        raise ValueError("shard_size and max_docs_per_value must be >= 1")
    vals = scored.join(docvalues.select("doc_id", field), "doc_id")
    order = [F.round("score", 6).desc(), F.col("doc_id").asc()]
    w_val = Window.partitionBy("qid", F.col(field).cast("string")).orderBy(*order)
    w_q = Window.partitionBy("qid").orderBy(*order)
    return (
        vals.withColumn("_rv", F.row_number().over(w_val))
        .filter(F.col("_rv") <= max_docs_per_value)
        .withColumn("_rq", F.row_number().over(w_q))
        .filter(F.col("_rq") <= shard_size)
        .select("qid", "doc_id")
    )
