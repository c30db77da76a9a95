"""ES ``boosting`` compound query (the Lucene BoostingQuery role).

The last member of the ES compound-query family this engine covers
(``bool`` — boolquery.py, ``dis_max`` — the multifield best_fields
combine, ``function_score`` — funcscore.py, ``rescore`` — rescore.py):
the POSITIVE query selects and ranks, and any hit that ALSO matches the
NEGATIVE query is demoted by

    score = positive_score * negative_boost        (0 <= nb <= 1)

The negative clause never filters (unlike ``bool.must_not``) and never
adds documents — it only scales scores down, which is why ES recommends
it over must_not when "relevant but less so" beats "excluded".

Correct top-k demands the positive pass's FULL scored match set, not a
top-k window: a positive rank-100 doc can outrank every demoted head
doc, so the combine consumes ``funcscore.match_scores`` (the same
ALL-hits relation function_score uses; bounded by the sum of the query
terms' dfs — the aggregation-phase bound, never |corpus|). The negative
side only needs the binary match set (``aggs.match_candidates``).

Reference seam: the reference has no negative-evidence operator; this is
pure ES surface (SURVEY.md §2.5 ES-parity track), kept because a user of
the reference's ES index runs boosting queries against it today.

Scale shape: both sides are term-pruned postings scans with in-plan
query tokenization (no driver collect anywhere); the demote is ONE
left join keyed (qid, doc_id) between two query-bounded relations,
entirely JVM, followed by the engine's top-k window. Rounding contract:
positive scores round to SCORE_DECIMALS before the multiply, so with a
dyadic ``negative_boost`` (the 0.5 default) the demoted score is exact
in IEEE and bit-identical across Spark and the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sgpt_spark.operators.topk import SCORE_DECIMALS, topk_per_group


def _check_boost(negative_boost: float) -> float:
    nb = float(negative_boost)
    if not (0.0 <= nb <= 1.0):
        raise ValueError(
            f"negative_boost={negative_boost} outside [0, 1]: the ES "
            "boosting query demotes (a factor > 1 would promote negative "
            "matches; use function_score for that)"
        )
    return nb


def boosting_combine(
    pos_scores: DataFrame,
    neg_matches: DataFrame,
    negative_boost: float = 0.5,
    k: int = 10,
) -> DataFrame:
    """(full positive scored set) x (negative match set) -> top-k.

    ``pos_scores``: (qid, doc_id, score) — EVERY positive hit (no top-k
    cut; see module docstring). ``neg_matches``: (qid, doc_id[, ...]) —
    docs matching the negative query; extra rows for docs outside the
    positive set are harmless (left join keeps positive hits only — the
    negative clause never adds documents)."""
    nb = _check_boost(negative_boost)
    p = pos_scores.select(
        "qid", "doc_id", F.round(F.col("score"), SCORE_DECIMALS).alias("p_score")
    )
    n = (
        neg_matches.select("qid", "doc_id")
        .distinct()
        .withColumn("_neg", F.lit(True))
    )
    scored = p.join(n, ["qid", "doc_id"], "left").select(
        "qid",
        "doc_id",
        F.when(F.col("_neg").isNotNull(), F.col("p_score") * F.lit(nb))
        .otherwise(F.col("p_score"))
        .alias("score"),
    )
    # round_scores=False: p_score is already 6-dp rounded (bit-identical
    # across engines) and the demote is an exact IEEE scale when nb is
    # dyadic — re-rounding would hit a decimal midpoint at digit 7
    # (…x5 → HALF_UP vs binary rounding disagree between engines).
    return topk_per_group(scored, k=k, round_scores=False).select(
        "qid", "doc_id", "score", "rank"
    )


def boosting_search_index(
    spark: SparkSession,
    postings: DataFrame,
    meta,
    queries,
    negative_queries,
    k: int = 10,
    negative_boost: float = 0.5,
    term_stats: DataFrame | None = None,
    tokenizer=None,
) -> DataFrame:
    """Index-backed boosting query: positive = the full scored match set
    off the compressed postings (``match_scores`` — in-plan queries,
    term-pruned scan), negative = the distinct match candidates
    (``match_candidates``), one JVM demote join."""
    from sgpt_spark.operators.aggs import match_candidates
    from sgpt_spark.operators.funcscore import match_scores

    pos = match_scores(
        spark, postings, meta, queries, term_stats=term_stats, tokenizer=tokenizer
    )
    # single demote join consumes neg once: skip the request-sharing
    # checkpoint (r6)
    neg = match_candidates(spark, postings, meta, negative_queries,
                           tokenizer=tokenizer, materialize=False)
    return boosting_combine(pos, neg, negative_boost=negative_boost, k=k)


def boosting_search(
    corpus: DataFrame,
    queries: DataFrame,
    negative_queries: DataFrame,
    k: int = 10,
    negative_boost: float = 0.5,
    tokenizer=None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exhaustive declarative twin (no persisted index): the same
    positive/negative relations built from one corpus tokenize. Must be
    value-identical to ``boosting_search_index`` (tested)."""
    from sgpt_spark.functions.analyzer import tokenize_ws
    from sgpt_spark.operators.search import query_terms, score_candidates
    from sgpt_spark.operators.stats import corpus_stats, doc_terms, term_df, term_freqs

    tok = tokenizer or tokenize_ws
    dt = doc_terms(corpus, id_col=id_col, text_col=text_col, tokenizer=tok)
    tf = term_freqs(dt)
    pos = score_candidates(tf, query_terms(queries, tokenizer=tok), term_df(tf),
                           corpus_stats(dt))
    neg = (
        tf.join(
            F.broadcast(
                query_terms(negative_queries, tokenizer=tok).select("qid", "term")
            ),
            "term",
        )
        .select("qid", "doc_id")
    )
    return boosting_combine(pos, neg, negative_boost=negative_boost, k=k)
