"""ES ``function_score`` — rescoring a match query with a doc-values
function (the Lucene FunctionScoreQuery role), here the
``field_value_factor`` family: score' = boost_mode(BM25, modifier(
factor * field_value)).

The critical semantic: the function applies to EVERY matching doc
BEFORE the top-k cut (ES runs FunctionScoreQuery as the scoring query
itself), so "take BM25 top-k then multiply" is WRONG — a doc at BM25
rank 50 with a large field value may belong on page 1. The engine
therefore needs the FULL scored match set, which the join query path
already produces declaratively: term-pruned postings decode ->
``search.score_candidates`` (the plan shared with
``index_search.search_index_join``), then one docvalues join + the
modifier expression + the usual rounded top-k window. Fully in-plan,
no UDF, no driver step.

ES ``field_value_factor`` semantics carried:

* ``modifier``: none | log1p | ln1p | sqrt | square | reciprocal —
  ES spellings, with ES's log* meaning log BASE 10 (Lucene
  Math.log10), ln* natural. ``missing`` (default 1.0) substitutes for
  docs whose field is NULL before factor/modifier apply, exactly ES.
* ``factor`` multiplies the field value before the modifier.
* ``boost_mode``: multiply (ES default) | sum — how the function value
  combines with the query score.
* negative modifier inputs raise at plan build when detectable and
  produce NaN -> loud failure otherwise; ES likewise errors on
  negative log inputs at runtime.

Scale notes (10^12 docs): identical shape to the join query path —
the postings scan prunes to the query vocabulary at the parquet
reader, score_candidates shuffles per-(query, matched doc) partial
rows once, the docvalues join shuffles on doc_id, and the final
window compiles to partial/final WindowGroupLimit. The function adds
ONE projection over the already-materialized match relation.
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from sgpt_spark.operators.indexer import IndexMeta
from sgpt_spark.operators.topk import topk_per_group

MODIFIERS = ("none", "log1p", "ln1p", "sqrt", "square", "reciprocal")
BOOST_MODES = ("multiply", "sum")


def _modifier_col(val: Column, modifier: str) -> Column:
    # ES log* modifiers are base-10 (Lucene Math.log10); ln* natural.
    if modifier == "none":
        return val
    if modifier == "log1p":
        return F.log10(val + F.lit(1.0))
    if modifier == "ln1p":
        return F.log(val + F.lit(1.0))
    if modifier == "sqrt":
        return F.sqrt(val)
    if modifier == "square":
        return val * val
    if modifier == "reciprocal":
        return F.lit(1.0) / val
    raise ValueError(f"unknown modifier {modifier!r}: {MODIFIERS}")


def match_scores(
    spark: SparkSession,
    postings: DataFrame,
    meta: IndexMeta,
    queries: DataFrame | Iterable[tuple],
    term_stats: DataFrame | None = None,
    tokenizer=None,
) -> DataFrame:
    """FULL scored match set -> (qid, doc_id, score): BM25 over every
    (query, matching doc) pair with NO top-k cut — the relation a
    rescoring query needs. The plan is ``search_index_join``'s up to
    the cut: in-plan query tokenize, left-semi term prune at the scan,
    batched decode, shuffle probe, one groupBy partial-sum."""
    from sgpt_spark.functions.analyzer import resolve_jvm_analyzer
    from sgpt_spark.operators.index_search import flatten_postings, normalize_queries
    from sgpt_spark.operators.search import query_terms, score_candidates
    from sgpt_spark.operators.stats import CorpusStats

    queries, qid_type = normalize_queries(queries)
    if not isinstance(queries, DataFrame):
        queries = spark.createDataFrame(queries, f"qid {qid_type}, query string")
    tok = tokenizer or resolve_jvm_analyzer(meta.analyzer)
    qt = query_terms(queries, tokenizer=tok)
    cand = postings.join(qt.select("term").distinct(), "term", "left_semi")
    flat = flatten_postings(cand, codec=meta.codec)
    dfs = (
        term_stats
        if term_stats is not None
        else postings.groupBy("term").agg(F.sum("df").alias("df"))
    )
    return score_candidates(
        flat,
        qt,
        dfs,
        CorpusStats(n_docs=meta.n_docs, avgdl=meta.avgdl),
        k1=meta.k1,
        b=meta.b,
        broadcast_queries=False,
    )


def function_score_index(
    spark: SparkSession,
    postings: DataFrame,
    meta: IndexMeta,
    queries: DataFrame | Iterable[tuple],
    docvalues: DataFrame,
    field: str,
    factor: float = 1.0,
    modifier: str = "none",
    missing: float = 1.0,
    boost_mode: str = "multiply",
    k: int = 10,
    term_stats: DataFrame | None = None,
    tokenizer=None,
) -> DataFrame:
    """ES ``function_score`` with ``field_value_factor`` over the
    compressed index -> (qid, doc_id, score, rank): the match query's
    FULL scored set rescored by boost_mode(BM25, modifier(factor *
    field)), then the engine's rounded deterministic top-k. See the
    module docstring for semantics and plan shape."""
    if modifier not in MODIFIERS:
        raise ValueError(f"unknown modifier {modifier!r}: {MODIFIERS}")
    if boost_mode not in BOOST_MODES:
        raise ValueError(f"unknown boost_mode {boost_mode!r}: {BOOST_MODES}")
    if field not in docvalues.columns:
        raise ValueError(
            f"function_score field {field!r} not in docvalues columns "
            f"{docvalues.columns}"
        )
    scored = match_scores(
        spark, postings, meta, queries, term_stats=term_stats, tokenizer=tokenizer
    )
    fv = F.coalesce(F.col(field).cast("double"), F.lit(float(missing)))
    fn = _modifier_col(fv * F.lit(float(factor)), modifier)
    combined = (
        (F.col("score") * fn) if boost_mode == "multiply" else (F.col("score") + fn)
    )
    rescored = (
        scored.join(docvalues.select("doc_id", field), "doc_id", "left")
        .select("qid", "doc_id", combined.alias("score"))
    )
    return topk_per_group(rescored, k=k).select("qid", "doc_id", "score", "rank")
