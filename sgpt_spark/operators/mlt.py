"""ES ``more_like_this`` — find documents similar to given seed docs
(the Lucene MoreLikeThis role): select the seed's most interesting
terms by tf-idf, run them as a BM25 should-query with a
percentage minimum_should_match, exclude the seed itself.

The reference's nearest equivalent is its paraphrase-mining /
semantic-search loop over dense vectors; MLT is the LEXICAL version
every ES deployment ships, and it composes from relations this engine
already has:

1. **Term extraction**: the seed docs' texts re-analyze in-plan with
   the index analyzer (ES MLT without stored term vectors does exactly
   this) -> per-seed (term, tf).
2. **Interesting-term selection** (Lucene MoreLikeThis.createQueue):
   candidate terms keep ``min_term_freq <= tf`` and
   ``min_doc_freq <= df``, score = tf * idf with the SAME BM25 idf the
   engine scores with (Lucene's default similarity since 8.0), top
   ``max_query_terms`` per seed. The tf-idf is rounded to the engine's
   6-decimal contract BEFORE ranking and tie-broken (score desc, term
   asc) so the selected term set is deterministic and
   engine-reproducible.
3. **Execution**: the selected (qid, term) relation IS a match query
   with qtf=1 per term — it rides ``search.score_candidates`` (the
   join path's scorer: term-pruned postings decode, shuffle probe, one
   partial-sum groupBy) with a per-seed ``required`` gate =
   max(1, floor(min_should_pct% of selected terms)) — the ES MLT
   ``minimum_should_match: "30%"`` default, percentage floored the way
   ES rounds. The seed doc itself is excluded (ES ``include: false``
   default).

Fully in-plan: seeds, term selection, and scoring never touch the
driver. Scale notes (10^12 docs): seed term vectors are |seeds| x
|doc tokens| rows; the selection window cuts to max_query_terms per
seed BEFORE the probe, so the postings scan prunes to at most
|seeds| * max_query_terms terms at the parquet reader — the same
bounded-vocabulary contract as every query path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sgpt_spark.operators.indexer import IndexMeta
from sgpt_spark.operators.topk import SCORE_DECIMALS, topk_per_group


def interesting_terms(
    corpus: DataFrame,
    seeds: DataFrame,
    meta: IndexMeta,
    term_stats: DataFrame,
    max_query_terms: int = 25,
    min_term_freq: int = 2,
    min_doc_freq: int = 5,
    tokenizer=None,
    text_col: str = "text",
) -> DataFrame:
    """-> (qid, term, term_rank): each seed's top ``max_query_terms``
    terms by rounded tf*idf (see module docstring). ``seeds`` is
    (qid, doc_id); qid conventionally equals the seed doc_id."""
    from sgpt_spark.functions.analyzer import resolve_jvm_analyzer
    from sgpt_spark.operators.search import query_terms

    tok = tokenizer or resolve_jvm_analyzer(meta.analyzer)
    seed_text = seeds.join(corpus.select("doc_id", text_col), "doc_id").select(
        "qid", F.col(text_col).alias("query")
    )
    # query_terms -> (qid, term, qtf); qtf here is the seed-doc tf
    st = query_terms(seed_text, tokenizer=tok).filter(
        F.col("qtf") >= min_term_freq
    )
    cand = st.join(term_stats, "term").filter(F.col("df") >= min_doc_freq)
    idf = F.log(
        F.lit(1.0)
        + (F.lit(float(meta.n_docs)) - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    )
    scored = cand.select(
        "qid",
        "term",
        F.round(F.col("qtf") * idf, SCORE_DECIMALS).alias("_tfidf"),
    )
    w = Window.partitionBy("qid").orderBy(
        F.col("_tfidf").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("term_rank", F.row_number().over(w))
        .filter(F.col("term_rank") <= max_query_terms)
        .select("qid", "term", "term_rank")
    )


def more_like_this_index(
    spark: SparkSession,
    postings: DataFrame,
    meta: IndexMeta,
    corpus: DataFrame,
    seeds: DataFrame,
    k: int = 10,
    max_query_terms: int = 25,
    min_term_freq: int = 2,
    min_doc_freq: int = 5,
    min_should_pct: int = 30,
    term_stats: DataFrame | None = None,
    tokenizer=None,
    strategy: str = "cogroup",
) -> DataFrame:
    """ES ``more_like_this`` over the compressed index -> (qid, doc_id,
    score, rank). ``seeds``: (qid, doc_id) liked docs, qid = seed
    doc_id by convention (the exclude-seed filter compares them).
    Defaults mirror ES: max_query_terms 25, min_term_freq 2,
    min_doc_freq 5, minimum_should_match "30%". See module docstring.

    ``strategy='cogroup'`` (default, r6): the selected (qid, term)
    relation — still fully in-plan — feeds the numpy TAAT kernel via
    ``multiterm._cogroup_weighted`` (by-presence replication, per-
    segment msm gate, exclude-self with the k+1 spare) instead of the
    relational probe + groupBy; value-identical (tested), ~4x cheaper
    per seed batch. ``strategy='relational'`` pins the r5 relational
    spelling (the verification twin).
    """
    from sgpt_spark.operators.search import score_candidates
    from sgpt_spark.operators.index_search import flatten_postings
    from sgpt_spark.operators.stats import CorpusStats

    if not (0 <= min_should_pct <= 100):
        raise ValueError(
            f"min_should_pct must be 0..100, got {min_should_pct}"
        )
    if max_query_terms < 1:
        raise ValueError(f"max_query_terms must be >= 1, got {max_query_terms}")
    dfs = (
        term_stats
        if term_stats is not None
        else postings.groupBy("term").agg(F.sum("df").alias("df"))
    )
    sel = interesting_terms(
        corpus,
        seeds,
        meta,
        dfs,
        max_query_terms=max_query_terms,
        min_term_freq=min_term_freq,
        min_doc_freq=min_doc_freq,
        tokenizer=tokenizer,
    )
    if strategy not in ("cogroup", "relational"):
        raise ValueError(
            f"unknown strategy {strategy!r}: use cogroup|relational"
        )
    qt = sel.select("qid", "term", F.lit(1).alias("qtf"))
    required = qt.groupBy("qid").agg(
        F.greatest(
            F.floor(F.count("*") * F.lit(min_should_pct) / F.lit(100.0)),
            F.lit(1),
        )
        .cast("long")
        .alias("req")
    )
    if strategy == "cogroup":
        from sgpt_spark.functions.bm25 import idf as idf_col
        from sgpt_spark.operators.multiterm import _cogroup_weighted

        qtw = qt.join(dfs, "term").select(
            "qid", "term", idf_col(F.col("df"), float(meta.n_docs)).alias("w")
        )
        return _cogroup_weighted(
            spark, postings, meta, qtw,
            seeds.schema["qid"].dataType.simpleString(), k,
            required=required, exclude_self=True,
        )
    cand = postings.join(qt.select("term").distinct(), "term", "left_semi")
    flat = flatten_postings(cand, codec=meta.codec)
    scored = score_candidates(
        flat,
        qt,
        dfs,
        CorpusStats(n_docs=meta.n_docs, avgdl=meta.avgdl),
        k1=meta.k1,
        b=meta.b,
        broadcast_queries=False,
        required=required,
    ).filter(F.col("doc_id") != F.col("qid"))  # ES include:false default
    return topk_per_group(scored, k=k).select("qid", "doc_id", "score", "rank")
