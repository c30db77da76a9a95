"""ES ``rescore`` API — the query rescorer (two-pass ranking).

The search request's second pass: the FIRST query (a cheap ``match``)
ranks the corpus, and only its top ``window_size`` hits per query are
re-scored by a SECOND, more expensive query (canonically a
``match_phrase`` of the same text — the classic "phrase rescorer"
precision bump), combined as

    score = combine(query_weight * first, rescore_query_weight * second)

per ``score_mode`` (total | multiply | avg | max | min, ES defaults
total/1.0/1.0), where a window doc NOT matched by the rescore query
keeps ``query_weight * first`` untouched (the ES contract). The window
is then re-ranked under the engine's total (rounded score desc, doc_id
asc) order and cut to ``k`` (``k <= window_size`` enforced — ES pages
beyond the window fall back to first-pass order; this engine's query
contract is single-page top-k, so the guard keeps the two passes'
composition total).

Reference seam: this is the ES-native form of the reference's two-pass
pattern — BM25 top-k windows re-scored by a cross-encoder
(/root/reference/crossencoder/beir/sgptce.py:150-333); ``rerank.py``
carries that pluggable-scorer form, this module carries the query-vs-
query form where BOTH passes are index queries and the whole
composition stays declarative (no Python scorer in the loop).

Divergence note (same as aggs.sampler_candidates): ES rescores the top
``window_size`` hits PER SHARD; this engine takes the deterministic
GLOBAL top window per query — what a single shard computes, what the
per-shard windows converge to, and what keeps the composition
value-gateable against a global SQL oracle.

Scale shape: pass 1 is the gated ``search_index`` plan (term-pruned
postings scan, per-segment top-window, global merge — <= window_size+1
rows per (query, segment) shuffled); pass 2 is the gated phrase plan
whose hit set is bounded by the rarest phrase term's df; the combine is
one broadcast-sized left join on (qid, doc_id) — the window relation is
|queries| x window_size rows, query-batch-bounded, never corpus-bounded.

Both passes' scores are rounded to ``SCORE_DECIMALS`` BEFORE the
combine (each pass's ranking contract already rounds), so with
weights 1.0 the 'total' combine is ONE IEEE addition of two 6-dp
doubles — bit-identical across Spark and the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sgpt_spark.operators.topk import SCORE_DECIMALS, topk_per_group

SCORE_MODES = ("total", "multiply", "avg", "max", "min")


def combine_rescore(
    window: DataFrame,
    rescore_hits: DataFrame,
    k: int = 10,
    window_size: int | None = None,
    query_weight: float = 1.0,
    rescore_query_weight: float = 1.0,
    score_mode: str = "total",
) -> DataFrame:
    """(first-pass window) x (second-pass hits) -> rescored top-k.

    ``window``: (qid, doc_id, score[, rank]) — the first query's top
    ``window_size`` rows per qid (rank column optional and ignored).
    ``rescore_hits``: (qid, doc_id, score) — the rescore query's scored
    hits for ANY doc set covering the window (extra rows are harmless:
    the left join keeps only window docs — exactly ES, where the
    rescorer never ADDS hits, only re-orders the window).

    Generic combiner: any query family can play either pass (bool,
    multifield, function_score, ... all emit the same RESULTS shape).
    """
    if score_mode not in SCORE_MODES:
        raise ValueError(f"unknown score_mode {score_mode!r}: use {SCORE_MODES}")
    if window_size is not None and k > window_size:
        raise ValueError(
            f"k={k} > window_size={window_size}: ranks past the rescore "
            "window would interleave first-pass-ordered tails into a "
            "second-pass ordering — shrink k or widen the window"
        )
    w = window.select(
        "qid", "doc_id", F.round(F.col("score"), SCORE_DECIMALS).alias("w_score")
    )
    h = rescore_hits.select(
        "qid", "doc_id", F.round(F.col("score"), SCORE_DECIMALS).alias("r_score")
    )
    prim = F.lit(float(query_weight)) * F.col("w_score")
    sec = F.lit(float(rescore_query_weight)) * F.col("r_score")
    matched = F.col("r_score").isNotNull()
    if score_mode == "total":
        combined = prim + F.coalesce(sec, F.lit(0.0))
    elif score_mode == "multiply":
        combined = F.when(matched, prim * sec).otherwise(prim)
    elif score_mode == "avg":
        combined = F.when(matched, (prim + sec) / F.lit(2.0)).otherwise(prim)
    elif score_mode == "max":
        combined = F.when(matched, F.greatest(prim, sec)).otherwise(prim)
    else:  # min
        combined = F.when(matched, F.least(prim, sec)).otherwise(prim)
    scored = w.join(h, ["qid", "doc_id"], "left").select(
        "qid", "doc_id", combined.alias("score")
    )
    return topk_per_group(scored, k=k).select("qid", "doc_id", "score", "rank")


def rescore_index(
    spark: SparkSession,
    path: str,
    queries,
    k: int = 10,
    window_size: int = 50,
    rescore_queries=None,
    query_weight: float = 1.0,
    rescore_query_weight: float = 1.0,
    score_mode: str = "total",
    term_stats: DataFrame | None = None,
    tokenize=None,
) -> DataFrame:
    """Index-backed phrase rescorer over a POSITIONAL index: pass 1 =
    BM25 ``match`` through the derived block postings
    (``search_index``), pass 2 = ``match_phrase`` hits off the
    positional sidecar (``phrase_hits_index`` — ALL hits, no top-k cut,
    so every window doc that matches the phrase gets its second score).

    ``rescore_queries`` defaults to ``queries`` — the canonical ES
    phrase rescorer re-reads the SAME user text as a phrase. Both
    passes resolve the index's own analyzer (custom analyzers pass
    ``tokenize=``, the resolver refuses to guess).
    """
    from sgpt_spark.operators.index_search import search_index
    from sgpt_spark.operators.indexer import read_index
    from sgpt_spark.operators.positions import phrase_hits_index

    postings, meta = read_index(spark, path)
    window = search_index(
        spark, postings, meta, queries, k=window_size,
        term_stats=term_stats, tokenize=tokenize,
    )
    hits, _ = phrase_hits_index(
        spark, path,
        queries if rescore_queries is None else rescore_queries,
        tokenize=tokenize, term_stats=term_stats,
    )
    return combine_rescore(
        window, hits, k=k, window_size=window_size,
        query_weight=query_weight, rescore_query_weight=rescore_query_weight,
        score_mode=score_mode,
    )


def rescore_search(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    window_size: int = 50,
    rescore_queries=None,
    query_weight: float = 1.0,
    rescore_query_weight: float = 1.0,
    score_mode: str = "total",
    tokenizer=None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exhaustive declarative twin (no persisted index): pass 1 =
    ``search.bm25_search`` at depth ``window_size``, pass 2 = the
    exhaustive phrase pipeline's FULL scored candidate set
    (``phrase.score_phrase_candidates`` — phrase hits are bounded by
    the rarest term's df, never |corpus|), same combine. Must be
    value-identical to ``rescore_index`` (tested)."""
    from sgpt_spark.functions.analyzer import tokenize_ws
    from sgpt_spark.operators.phrase import (
        phrase_frequencies,
        phrase_idf_sums,
        positional_postings,
        query_phrases,
        score_phrase_candidates,
    )
    from sgpt_spark.operators.search import bm25_search
    from sgpt_spark.operators.stats import corpus_stats, doc_terms, term_df, term_freqs

    tok = tokenizer or tokenize_ws
    window = bm25_search(
        corpus, queries, k=window_size, tokenizer=tok,
        id_col=id_col, text_col=text_col,
    )
    dt = doc_terms(corpus, id_col=id_col, text_col=text_col, tokenizer=tok)
    stats = corpus_stats(dt)
    qp = query_phrases(
        queries if rescore_queries is None else rescore_queries, tokenizer=tok
    )
    pf_df = phrase_frequencies(positional_postings(dt), qp)
    sidf = phrase_idf_sums(qp, term_df(term_freqs(dt)), stats.n_docs)
    hits = score_phrase_candidates(pf_df, sidf, stats)
    return combine_rescore(
        window, hits, k=k, window_size=window_size,
        query_weight=query_weight, rescore_query_weight=rescore_query_weight,
        score_mode=score_mode,
    )
