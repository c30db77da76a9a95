"""Per-group top-k with a deterministic total order.

Re-expresses the reference's chunked-topk + heap-merge scan
(custommodels/exact_search.py:80-132, SURVEY.md §2.6) as a window rank.
The reference breaks ties by arrival order (underspecified); this engine
defines the total order **score desc, doc_id asc** so results are
reproducible under any partitioning (SURVEY.md §7.4(4)).

Scores are rounded to ``SCORE_DECIMALS`` *before* ranking: cross-engine
double math (JVM vs C libm, float summation order across partitions) can
differ in the last ULP, and ranking on the rounded value plus the doc_id
tie-break makes the output rank-stable across engines and runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SCORE_DECIMALS = 6


def topk_per_group(
    scored: DataFrame,
    group_col: str = "qid",
    score_col: str = "score",
    id_col: str = "doc_id",
    k: int = 10,
    round_scores: bool = True,
) -> DataFrame:
    """(qid, doc_id, score, ...) -> top-k rows per qid with 1-based rank.

    Physical shape: one shuffle keyed by qid (narrow — only candidate
    rows survive upstream filters), then a window sort within each qid
    group. This is the same partial/final structure as the reference's
    per-chunk topk + global heap merge; Spark's partial aggregation above
    this operator plays the "per-chunk" role.

    ``round_scores=False`` is for callers whose scores are ALREADY
    bit-identical across engines (e.g. a 6-dp-rounded score exactly
    scaled by a dyadic factor — boosting.py): re-rounding such a value
    can land on a decimal midpoint at digit 7 (…x5), which JVM
    BigDecimal HALF_UP and binary-double rounding resolve differently.
    """
    rounded = scored
    if round_scores:
        rounded = scored.withColumn(
            score_col, F.round(F.col(score_col), SCORE_DECIMALS)
        )
    w = Window.partitionBy(group_col).orderBy(
        F.col(score_col).desc(), F.col(id_col).asc()
    )
    return (
        rounded.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
