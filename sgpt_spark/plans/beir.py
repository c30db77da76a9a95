"""The reference's whole BM25 benchmark lifecycle as one callable —
entry point A end to end (SURVEY.md §3.1, crossencoder_beir_bm25.ipynb
cells 2-16):

  load corpus/queries/qrels (BEIR JSONL/TSV)           cell 9
  -> index build (ES delegated there; native here)     cell 10
  -> top-k retrieval (k = max(k_values), default 1000) cell 10, :307-310
  -> optional cross-encoder rerank of the top slice    sgptce.py:343
  -> persist the run                                   cell 11
  -> evaluate at every cutoff in k_values              cell 12

A reference user's `run_bm25(dataset)` maps 1:1 onto this function.

Engine notes: BEIR ids are strings; the compressed index wants dense
int64 ids, so the pipeline assigns deterministic ids keyed on the
external id, searches, and joins the external ids back (the id side
table is |corpus| x 2 columns — the join is a broadcast of the RUN side,
never a corpus shuffle). Document text is the title+text concat
projection (beir_dense_retriever.py:341), analyzed with the
Lucene-standard analyzer by default (ES parity).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sgpt_spark.functions.analyzer import analyze_py, tokenize_py_ws
from sgpt_spark.operators.corpus import doc_fulltext
from sgpt_spark.operators.index_search import search_index
from sgpt_spark.operators.indexer import (
    assign_doc_ids,
    build_index,
    read_index,
    read_term_stats,
    release_doc_ids,
)
from sgpt_spark.operators.metrics import mean_metrics_at
from sgpt_spark.sources.readers import read_beir_corpus, read_beir_qrels, read_beir_queries
from sgpt_spark.sources.sinks import write_results_parquet

DEFAULT_K_VALUES = (1, 3, 5, 10, 100, 1000)


def run_beir_bm25(
    spark: SparkSession,
    corpus_path: str,
    queries_path: str,
    qrels_path: str,
    out_dir: str,
    k_values: tuple[int, ...] = DEFAULT_K_VALUES,
    analyzer: str = "standard",
    rerank_top_k: int | None = None,
    exclude_self: bool = False,
    fields: str = "concat",
    engine: str = "auto",
) -> DataFrame:
    """-> metrics DataFrame (k, ndcg, map, mrr, precision, recall), one
    row per cutoff; the ranked run is persisted at ``{out_dir}/run``
    and the index at ``{out_dir}/index``.

    ``rerank_top_k`` re-scores each query's head with the pluggable
    pair scorer (stub CE by default) above the untouched tail
    (sgptce.py:343 semantics). ``exclude_self`` drops doc_id == qid
    hits (quora/cqadupstack-style query sets).

    ``fields``: ``"concat"`` (default) indexes the title+text concat as
    one field; ``"multi"`` scores ``title`` and ``text`` as independent
    BM25 fields combined with ES ``best_fields, tie_breaker=0.5`` — the
    multi_match query the reference actually ran
    (crossencoder_beir_bm25.ipynb:298-310 cell 10).

    ``engine`` (multi mode only): ``"index"`` builds the co-segmented
    per-field compressed indexes and searches through them — the scale
    path; ``"exhaustive"`` runs the DataFrame plan directly on external
    ids (the value-oracle twin); ``"auto"`` = ``"index"``. Both return
    identical metrics (tested); everything downstream (run parquet,
    rerank, metrics) is shared.
    """
    if analyzer not in ("whitespace", "standard"):
        raise ValueError(f"unknown analyzer {analyzer!r}: whitespace|standard")
    if fields not in ("concat", "multi"):
        raise ValueError(f"unknown fields mode {fields!r}: concat|multi")
    if engine not in ("auto", "index", "exhaustive"):
        raise ValueError(f"unknown engine {engine!r}: auto|index|exhaustive")
    py_tok = analyze_py if analyzer == "standard" else tokenize_py_ws

    corpus = read_beir_corpus(spark, corpus_path)
    queries = read_beir_queries(spark, queries_path)
    qrels = read_beir_qrels(spark, qrels_path)

    if fields == "multi":
        return _run_multi(
            spark, corpus, queries, qrels, out_dir, k_values, analyzer,
            rerank_top_k, exclude_self, engine,
        )

    # Lifecycle resumability (north rule): the two expensive stages —
    # index build and retrieval — are manifest-checkpointed exactly like
    # plans/pipeline.build_index_pipeline. A job killed between stages
    # resumes from the last completed manifest and produces identical
    # metrics (tested); params mismatches (different analyzer/k/...)
    # invalidate the checkpoint rather than silently reusing it.
    from sgpt_spark.plans.pipeline import stage_done, write_manifest

    # title+text concat projection; deterministic dense ids by ext-id order
    docs_ext = corpus.select(
        F.col("doc_id").alias("ext_id"), doc_fulltext(F.col("title"), F.col("text")).alias("text")
    )
    k = max(k_values)
    index_params = {"src": corpus_path, "analyzer": analyzer, "fields": fields}
    if not stage_done(f"{out_dir}/index", index_params):
        assigned = assign_doc_ids(docs_ext, id_source="ext_id")
        docs = assigned.select("doc_id", "ext_id", "text")
        build_index(docs.select("doc_id", "text"), f"{out_dir}/index", py_tokenizer=py_tok)
        docs.select("doc_id", "ext_id").write.mode("overwrite").parquet(f"{out_dir}/ids")
        release_doc_ids(assigned)
        write_manifest(f"{out_dir}/index", "beir_index", index_params)

    run_params = {**index_params, "k": k, "exclude_self": exclude_self,
                  "rerank_top_k": rerank_top_k, "queries": queries_path}
    if not stage_done(f"{out_dir}/run", run_params):
        postings, meta = read_index(spark, f"{out_dir}/index")
        # self-matches are defined on EXTERNAL ids (qid strings), so the
        # filter happens after the id join: fetch one spare candidate (a
        # query has at most one self doc), drop it, re-cut to k.
        fetch_k = k + 1 if exclude_self else k
        run = search_index(
            spark, postings, meta, queries, k=fetch_k,
            term_stats=read_term_stats(spark, f"{out_dir}/index"),
        )
        # internal ids -> external BEIR ids. No explicit broadcast hint:
        # the run is |q| x k rows, which at the reference's defaults
        # (tens of thousands of queries x k=1000) can exceed the
        # broadcast/driver limit — a shuffle join on doc_id is always
        # safe, and AQE will still broadcast whichever side is actually
        # small at runtime.
        id_map = spark.read.parquet(f"{out_dir}/ids")
        run_ext = (
            run.join(id_map, "doc_id")
            .select("qid", F.col("ext_id").alias("doc_id"), "score", "rank")
        )
        if exclude_self:
            from sgpt_spark.operators.topk import topk_per_group

            run_ext = topk_per_group(
                run_ext.filter(F.col("doc_id") != F.col("qid")).select("qid", "doc_id", "score"),
                k=k,
            ).select("qid", "doc_id", "score", "rank")

        if rerank_top_k is not None:
            from sgpt_spark.operators.rerank import rerank

            corpus_texts = docs_ext.select(F.col("ext_id").alias("doc_id"), "text")
            run_ext = rerank(run_ext, corpus_texts, queries, top_k=rerank_top_k)

        write_results_parquet(run_ext, f"{out_dir}/run")
        write_manifest(f"{out_dir}/run", "beir_run", run_params)

    run_ext = spark.read.parquet(f"{out_dir}/run")
    return mean_metrics_at(run_ext, qrels, [kv for kv in k_values if kv <= k])


def _run_multi(
    spark: SparkSession,
    corpus: DataFrame,
    queries: DataFrame,
    qrels: DataFrame,
    out_dir: str,
    k_values: tuple[int, ...],
    analyzer: str,
    rerank_top_k: int | None,
    exclude_self: bool,
    engine: str = "auto",
) -> DataFrame:
    """fields="multi" body. engine="index" (and "auto"): dense ids by
    ext-id order, co-segmented per-field compressed indexes, dis-max
    through the index, ids mapped back — the scale path.
    engine="exhaustive": the DataFrame plan over external ids (both
    sides BEIR string ids, so the self filter pushes into the operator).
    Identical values either way (tie-break by internal id == by ext-id
    lexicographic order, because ids are assigned in ext-id order)."""
    from sgpt_spark.functions.analyzer import tokenize_standard, tokenize_ws
    from sgpt_spark.operators.search import bm25_multifield_search

    jvm_tok = tokenize_standard if analyzer == "standard" else tokenize_ws
    k = max(k_values)
    if engine in ("auto", "index"):
        from sgpt_spark.functions.analyzer import analyze_py, tokenize_py_ws
        from sgpt_spark.operators.index_search import search_multifield_index
        from sgpt_spark.operators.indexer import (
            assign_doc_ids,
            build_multifield_index,
            release_doc_ids,
        )
        from sgpt_spark.operators.topk import topk_per_group

        py_tok = analyze_py if analyzer == "standard" else tokenize_py_ws
        docs_ext = corpus.select(
            F.col("doc_id").alias("ext_id"), "title", "text"
        )
        assigned = assign_doc_ids(docs_ext, id_source="ext_id")
        docs = assigned.select("doc_id", "ext_id", "title", "text")
        build_multifield_index(
            docs.select("doc_id", "title", "text"), f"{out_dir}/mf_index",
            fields=("title", "text"), py_tokenizer=py_tok,
        )
        docs.select("doc_id", "ext_id").write.mode("overwrite").parquet(f"{out_dir}/ids")
        release_doc_ids(assigned)
        fetch_k = k + 1 if exclude_self else k
        run = search_multifield_index(
            spark, f"{out_dir}/mf_index", queries, k=fetch_k, tie_breaker=0.5
        )
        id_map = spark.read.parquet(f"{out_dir}/ids")
        run_ext = (
            run.join(id_map, "doc_id")
            .select("qid", F.col("ext_id").alias("doc_id"), "score", "rank")
        )
        if exclude_self:
            run_ext = topk_per_group(
                run_ext.filter(F.col("doc_id") != F.col("qid")).select(
                    "qid", "doc_id", "score"
                ),
                k=k,
            ).select("qid", "doc_id", "score", "rank")
    else:
        run_ext = bm25_multifield_search(
            corpus, queries, k=k, fields=("title", "text"), tie_breaker=0.5,
            tokenizer=jvm_tok, exclude_self=exclude_self,
        )

    if rerank_top_k is not None:
        from sgpt_spark.operators.rerank import rerank

        corpus_texts = corpus.select(
            "doc_id", doc_fulltext(F.col("title"), F.col("text")).alias("text")
        )
        run_ext = rerank(run_ext, corpus_texts, queries, top_k=rerank_top_k)

    write_results_parquet(run_ext, f"{out_dir}/run")
    run_ext = spark.read.parquet(f"{out_dir}/run")
    return mean_metrics_at(run_ext, qrels, [kv for kv in k_values if kv <= k])
