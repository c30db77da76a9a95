"""ES ``terms_set`` query — "match at least N of these exact terms",
where N is per-document or per-query.

Elasticsearch's ``terms_set`` (Lucene ``CoveringQuery``) takes a list
of exact (not analyzed) terms and matches a doc when the number of
DISTINCT supplied terms present in the field reaches a minimum that is
resolved per doc: either read from another field of the same document
(``minimum_should_match_field``) or computed by a script — in practice
almost always the documented idiom ``Math.min(params.num_terms, N)``
(``minimum_should_match_script``). Matching docs score like a bool
``should`` of the matched term queries: sum of the matched terms' BM25
contributions (each supplied term counts once — the terms form a set).
The reference delegates this query DSL wholesale to its ES indexes
(crossencoder/beir/crossencoder_beir_bm25.ipynb cell 10 builds the
index the DSL runs against), so the operator completes the engine's
structured-query surface next to bool / dis_max / constant_score.

Relational spelling (no new kernel — the match-count IS the groupBy):

  - query sets normalize to a distinct (qid, term) relation plus a
    per-query term count; the terms are exact keys, never analyzed
    (the ES contract — callers analyze themselves if they want that).
  - candidates = the flat postings pruned by a left-semi join against
    the distinct query vocabulary BEFORE decoding (the engine-wide
    multi-term idiom) joined to (qid, term): one row per matched
    (qid, doc, term), each carrying its BM25 partial.
  - one groupBy(qid, doc_id) folds ``matched = count(*)`` (distinct by
    construction: postings are unique per (term, doc), query terms are
    deduped) and ``score = sum(bm25)`` map-side.
  - the minimum joins in as a relation: per-doc from the doc-values
    sidecar (``minimum_should_match_field`` — the sidecar join is the
    structured-filter shape from boolquery), or per-query as
    ``least(N, n_terms)`` (``minimum_should_match_script`` min idiom,
    a pure JVM column on the query relation).
  - filter ``matched >= greatest(required, 1)`` then the engine's
    deterministic top-k window. The >=1 clamp is a documented
    divergence: a doc matching ZERO supplied terms never enters the
    candidate relation, so a non-positive minimum cannot resurrect the
    full corpus here (Lucene's CoveringQuery with minimumNumberMatch
    <= 0 degenerates to match-all — a shape no one queries on purpose
    and one this engine refuses to scan for).

Scale shape: rows are bounded by the supplied terms' document
frequencies (the aggregation-phase bound, never corpus-bounded); the
groupBy combines map-side; the sidecar join shuffles only candidate
rows. Query sets broadcast under the interactive contract —
``broadcast_queries=False`` switches every query-sized relation to
plain shuffle joins for offline million-query batches.
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sgpt_spark.functions.bm25 import B, K1, bm25_term_score
from sgpt_spark.operators.topk import topk_per_group

__all__ = ["terms_set_search", "terms_set_search_index"]


def _normalize_sets(
    spark: SparkSession, query_sets: DataFrame | Iterable[tuple]
) -> DataFrame:
    """-> (qid, terms array<string>) DataFrame from either a DataFrame
    with those columns or an iterable of (qid, [terms]) tuples."""
    if isinstance(query_sets, DataFrame):
        return query_sets.select("qid", "terms")
    rows = list(query_sets)
    if not rows:
        raise ValueError("terms_set: empty query set")
    qid_type = "bigint" if isinstance(rows[0][0], int) else "string"
    return spark.createDataFrame(
        rows, f"qid {qid_type}, terms array<string>"
    )


def _required_rel(
    qmeta: DataFrame,
    msm_field: str | None,
    msm_min: int | None,
    docvalues: DataFrame | None,
):
    """Resolve the minimum-to-match source -> ('doc'|'query', relation).

    Exactly one of ``msm_field`` (per-doc: (doc_id, required) from the
    doc-values sidecar) and ``msm_min`` (per-query:
    least(msm_min, n_terms), the ES min-script idiom) must be given.
    """
    if (msm_field is None) == (msm_min is None):
        raise ValueError(
            "terms_set: pass exactly one of msm_field= (per-doc, with "
            "docvalues=) or msm_min= (per-query min(N, num_terms))"
        )
    if msm_field is not None:
        if docvalues is None:
            raise ValueError(
                "terms_set: msm_field= needs the doc-values sidecar "
                "(docvalues= — build_postings_with_docvalues / a "
                "(doc_id, field) projection of the corpus)"
            )
        if msm_field not in docvalues.columns:
            raise ValueError(
                f"terms_set: field {msm_field!r} not in docvalues "
                f"columns {docvalues.columns}"
            )
        rel = docvalues.select(
            "doc_id", F.col(msm_field).cast("long").alias("_req")
        )
        return "doc", rel
    if msm_min < 1:
        raise ValueError("terms_set: msm_min must be >= 1")
    rel = qmeta.select(
        "qid", F.least(F.lit(int(msm_min)), F.col("n_terms")).alias("_req")
    )
    return "query", rel


def _score_terms_set(
    flat: DataFrame,
    qterms: DataFrame,
    qmeta: DataFrame,
    dfs: DataFrame,
    n_docs: float,
    avgdl: float,
    k: int,
    msm_field: str | None,
    msm_min: int | None,
    docvalues: DataFrame | None,
    broadcast_queries: bool,
    k1: float,
    b: float,
) -> DataFrame:
    kind, req = _required_rel(qmeta, msm_field, msm_min, docvalues)

    def _maybe_b(df: DataFrame) -> DataFrame:
        return F.broadcast(df) if broadcast_queries else df

    probe = qterms.join(dfs, "term", "inner")
    partial = flat.join(_maybe_b(probe), "term", "inner").select(
        "qid",
        "doc_id",
        bm25_term_score(
            F.col("tf"), F.col("df"), F.col("doc_len"), n_docs, avgdl, k1, b
        ).alias("partial"),
    )
    grouped = partial.groupBy("qid", "doc_id").agg(
        F.sum("partial").alias("score"), F.count("*").alias("matched")
    )
    if kind == "doc":
        # candidate rows join the sidecar; a doc missing from the
        # sidecar has no stated minimum -> unmatchable (kept strict)
        gated = grouped.join(req, "doc_id", "inner")
    else:
        gated = grouped.join(_maybe_b(req), "qid", "inner")
    kept = gated.filter(
        F.col("matched") >= F.greatest(F.col("_req"), F.lit(1))
    ).select("qid", "doc_id", "score")
    return topk_per_group(kept, k=k).select("qid", "doc_id", "score", "rank")


def terms_set_search(
    corpus: DataFrame,
    query_sets: DataFrame | Iterable[tuple],
    k: int = 10,
    msm_field: str | None = None,
    msm_min: int | None = None,
    tokenizer=None,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = K1,
    b: float = B,
    broadcast_queries: bool = True,
) -> DataFrame:
    """Exhaustive twin of ``terms_set_search_index``: tokenize the
    corpus in-plan instead of reading the persisted index.

    ``msm_field`` reads the per-doc minimum from that CORPUS column
    (the doc-values projection is derived right here); ``msm_min`` is
    the per-query ``min(N, num_terms)`` script idiom.
    """
    from sgpt_spark.functions.analyzer import tokenize_ws
    from sgpt_spark.operators.multiterm import _corpus_relations

    spark = corpus.sparkSession
    sets = _normalize_sets(spark, query_sets)
    qterms = sets.select("qid", F.explode("terms").alias("term")).distinct()
    qmeta = qterms.groupBy("qid").agg(F.count("*").alias("n_terms"))
    docvalues = None
    if msm_field is not None:
        if msm_field not in corpus.columns:
            raise ValueError(
                f"terms_set: field {msm_field!r} not in docvalues "
                f"columns {corpus.columns}"
            )
        docvalues = corpus.select(
            F.col(id_col).alias("doc_id"), F.col(msm_field)
        )
    flat, dfs, stats = _corpus_relations(
        corpus, tokenizer or tokenize_ws, id_col, text_col
    )
    return _score_terms_set(
        flat, qterms, qmeta, dfs, stats.n_docs, stats.avgdl, k,
        msm_field, msm_min, docvalues, broadcast_queries, k1, b,
    )


def terms_set_search_index(
    spark: SparkSession,
    postings: DataFrame,
    meta,
    query_sets: DataFrame | Iterable[tuple],
    k: int = 10,
    msm_field: str | None = None,
    msm_min: int | None = None,
    docvalues: DataFrame | None = None,
    term_stats: DataFrame | None = None,
    broadcast_queries: bool = True,
    strategy: str = "kernel",
) -> DataFrame:
    """``terms_set`` over the compressed index -> (qid, doc_id, score,
    rank). ``query_sets``: (qid, terms array<string>) rows — exact
    index terms, not analyzed text.

    ``msm_field`` + ``docvalues=`` is the per-doc
    ``minimum_should_match_field`` form (sidecar from
    ``build_postings_with_docvalues`` / ``read_docvalues``);
    ``msm_min`` the per-query ``min(N, num_terms)`` script idiom.
    Postings decode only after the left-semi vocabulary prune, so the
    scan stays term-pruned at the parquet reader like every multi-term
    path.

    ``strategy='kernel'`` (default, r6): the per-query msm form
    executes on ``multiterm._cogroup_weighted`` — a terms_set is a
    weighted-OR over exact terms with a per-query matched-count bar,
    exactly the relation shape that kernel takes ((qid, term, idf)
    in-plan weights + a (qid, req) gate); <= k rows per (query,
    segment) instead of the flatten -> probe join -> groupBy relation
    (rows ~= the sum of the set terms' dfs). The per-DOC
    ``msm_field`` form stays relational (its bar joins the doc-values
    sidecar per doc). ``strategy='relational'`` pins the r5 spelling
    (the verification twin)."""
    from sgpt_spark.operators.index_search import flatten_postings

    if strategy not in ("kernel", "relational"):
        raise ValueError(
            f"unknown strategy {strategy!r}: use kernel|relational"
        )
    sets = _normalize_sets(spark, query_sets)
    qterms = sets.select("qid", F.explode("terms").alias("term")).distinct()
    qmeta = qterms.groupBy("qid").agg(F.count("*").alias("n_terms"))
    if term_stats is None:
        term_stats = (
            postings.filter(F.col("term").isNotNull())
            .groupBy("term")
            .agg(F.sum("df").alias("df"))
        )
    if strategy == "kernel" and msm_field is None:
        from sgpt_spark.functions.bm25 import idf as idf_col
        from sgpt_spark.operators.multiterm import _cogroup_weighted

        kind, req = _required_rel(qmeta, None, msm_min, None)
        assert kind == "query"
        qtw = qterms.join(term_stats, "term").select(
            "qid",
            "term",
            idf_col(F.col("df"), meta.n_docs).alias("w"),
        )
        required = req.select(
            "qid", F.col("_req").cast("int").alias("req")
        )
        qid_type = sets.schema["qid"].dataType.simpleString()
        return _cogroup_weighted(
            spark, postings, meta, qtw, qid_type, k, required=required
        )
    vocab = qterms.select("term").distinct()
    cand = postings.join(vocab, "term", "left_semi")
    flat = flatten_postings(cand, codec=meta.codec)
    return _score_terms_set(
        flat, qterms, qmeta, term_stats, meta.n_docs, meta.avgdl, k,
        msm_field, msm_min, docvalues, broadcast_queries, meta.k1, meta.b,
    )
