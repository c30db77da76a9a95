"""ES ``match_bool_prefix`` — search-as-you-type over the FULL index:
every analyzed query term is a ``term`` clause except the LAST, which
becomes a ``prefix`` clause, all folded in one bool ``should``.

This is the query ES documents for type-ahead against a normal text
field (vs the ``completion`` suggester's dedicated weighted-input
field, ``operators.complete``): "quick brown f" matches docs containing
``quick``/``brown`` anywhere plus any term starting with ``f``, ranked
by relevance. The reference delegates this DSL to its ES indexes
(crossencoder/beir/crossencoder_beir_bm25.ipynb cell 10), so the
operator completes the match family: match, match_phrase,
match_phrase_prefix, multi_match, match_bool_prefix.

Scoring follows Lucene: term clauses contribute their BM25 term score
(one clause per analyzed token OCCURRENCE — the engine-wide qtf
convention from ``search.required_df``); the prefix clause rewrites
constant-score (Lucene's PrefixQuery default) and contributes exactly
1.0 when ANY dictionary expansion matches the doc — it is ONE clause
for ``minimum_should_match`` / ``operator='and'`` no matter how many
expansions hit. A single-token query degenerates to a pure prefix
query (constant 1.0, doc_id tie-break).

Relational spelling — pure composition of gated machinery:

  - queries tokenize IN-PLAN with the index's analyzer; the last array
    slot becomes the (qid, prefix) relation, the rest the (qid, term,
    qtf) clause relation.
  - the prefix expands against the termstats dictionary
    (``multiterm.expand_prefix`` — per-distinct-LENGTH hash joins, the
    only driver step being the handful of distinct lengths).
  - ONE flatten pass decodes the postings pruned to (term-clause vocab
    UNION expanded prefix vocab); term partials carry qtf x BM25 and
    qtf clause units, prefix partials collapse to distinct
    (qid, doc_id) at 1.0 and one clause unit.
  - one groupBy(qid, doc_id) folds score + matched clause units
    map-side; the msm/operator bar joins in query-sized; then the
    engine's deterministic top-k window.

Scale shape: rows bounded by clause-term dfs plus the expanded prefix
terms' dfs (cap with ``max_expansions``); nothing is corpus-bounded;
``broadcast_queries=False`` turns every query-sized relation into
shuffle joins for offline batches.
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sgpt_spark.functions.bm25 import B, K1, bm25_term_score
from sgpt_spark.operators.topk import topk_per_group

__all__ = ["match_bool_prefix_search", "match_bool_prefix_search_index"]


def _split_clauses(queries: DataFrame, tokenizer):
    """queries -> (term_clauses(qid, term, qtf), prefixes(qid, prefix)).
    The LAST analyzed token is the prefix; the rest are term clauses
    with occurrence multiplicity (the Lucene clause-per-token rule)."""
    toked = queries.select(
        "qid", tokenizer(F.col("query")).alias("toks")
    ).filter(F.size("toks") > 0)
    prefixes = toked.select(
        "qid", F.element_at("toks", -1).alias("prefix")
    )
    term_clauses = (
        toked.select(
            "qid",
            F.explode(F.slice("toks", 1, F.size("toks") - 1)).alias("term"),
        )
        .groupBy("qid", "term")
        .agg(F.count("*").alias("qtf"))
    )
    return term_clauses, prefixes


def _required(term_clauses: DataFrame, prefixes: DataFrame,
              minimum_should_match: int, operator: str) -> DataFrame | None:
    """-> optional (qid, req) clause bar. Units: qtf per term clause,
    1 for the prefix clause (it is one clause however many dictionary
    terms it expands to)."""
    if operator not in ("or", "and"):
        raise ValueError(f"operator must be or|and, got {operator!r}")
    if minimum_should_match < 0:
        raise ValueError("minimum_should_match must be >= 0")
    if operator == "and":
        if minimum_should_match:
            raise ValueError("pass either operator='and' or minimum_should_match")
        per_q = term_clauses.groupBy("qid").agg(F.sum("qtf").alias("_t"))
        return prefixes.join(per_q, "qid", "left").select(
            "qid",
            (F.coalesce(F.col("_t"), F.lit(0)) + F.lit(1)).cast("int").alias("req"),
        )
    if minimum_should_match > 1:
        return prefixes.select("qid").withColumn(
            "req", F.lit(int(minimum_should_match))
        )
    return None


def _score_bool_prefix(
    flat: DataFrame,
    term_clauses: DataFrame,
    exp: DataFrame,
    dfs: DataFrame,
    n_docs: float,
    avgdl: float,
    k: int,
    required: DataFrame | None,
    broadcast_queries: bool,
    k1: float,
    b: float,
) -> DataFrame:
    def _maybe_b(df: DataFrame) -> DataFrame:
        return F.broadcast(df) if broadcast_queries else df

    term_part = flat.join(
        _maybe_b(term_clauses.join(dfs, "term", "inner")), "term", "inner"
    ).select(
        "qid",
        "doc_id",
        F.col("qtf").alias("clauses"),
        (
            F.col("qtf")
            * bm25_term_score(
                F.col("tf"), F.col("df"), F.col("doc_len"), n_docs, avgdl, k1, b
            )
        ).alias("partial"),
    )
    # expansion hits collapse to ONE constant-score clause per (qid, doc)
    prefix_part = (
        flat.join(_maybe_b(exp.select("qid", "term")), "term", "inner")
        .select("qid", "doc_id")
        .distinct()
        .select(
            "qid",
            "doc_id",
            F.lit(1).alias("clauses"),
            F.lit(1.0).alias("partial"),
        )
    )
    grouped = (
        term_part.unionByName(prefix_part)
        .groupBy("qid", "doc_id")
        .agg(F.sum("partial").alias("score"), F.sum("clauses").alias("_nm"))
    )
    if required is not None:
        grouped = (
            grouped.join(_maybe_b(required), "qid", "left")
            .filter(F.col("_nm") >= F.coalesce(F.col("req"), F.lit(0)))
        )
    return topk_per_group(grouped.select("qid", "doc_id", "score"), k=k).select(
        "qid", "doc_id", "score", "rank"
    )


def match_bool_prefix_search(
    corpus: DataFrame,
    queries: DataFrame | Iterable[tuple],
    k: int = 10,
    minimum_should_match: int = 0,
    operator: str = "or",
    tokenizer=None,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = K1,
    b: float = B,
    max_expansions: int | None = None,
    broadcast_queries: bool = True,
) -> DataFrame:
    """Exhaustive twin of ``match_bool_prefix_search_index`` (tokenize
    the corpus in-plan instead of reading the persisted index)."""
    from sgpt_spark.functions.analyzer import tokenize_ws
    from sgpt_spark.operators.index_search import normalize_queries
    from sgpt_spark.operators.multiterm import _corpus_relations, expand_prefix

    spark = corpus.sparkSession
    queries, qid_type = normalize_queries(queries)
    if not isinstance(queries, DataFrame):
        queries = spark.createDataFrame(queries, f"qid {qid_type}, query string")
    tokenizer = tokenizer or tokenize_ws
    term_clauses, prefixes = _split_clauses(queries, tokenizer)
    required = _required(term_clauses, prefixes, minimum_should_match, operator)
    flat, dfs, stats = _corpus_relations(corpus, tokenizer, id_col, text_col)
    exp = expand_prefix(dfs, prefixes, max_expansions=max_expansions)
    return _score_bool_prefix(
        flat, term_clauses, exp, dfs, stats.n_docs, stats.avgdl, k,
        required, broadcast_queries, k1, b,
    )


def match_bool_prefix_search_index(
    spark: SparkSession,
    postings: DataFrame,
    meta,
    queries: DataFrame | Iterable[tuple],
    k: int = 10,
    minimum_should_match: int = 0,
    operator: str = "or",
    term_stats: DataFrame | None = None,
    tokenizer=None,
    max_expansions: int | None = None,
    broadcast_queries: bool = True,
    strategy: str = "kernel",
) -> DataFrame:
    """``match_bool_prefix`` over the compressed index -> (qid, doc_id,
    score, rank). ``queries``: (qid, query) analyzed text rows.

    ``strategy='kernel'`` (default, r6): the term-clause weights and the
    expanded prefix vocabulary — both still fully in-plan — cogroup
    with the term-pruned posting blocks per segment; the kernel
    bincounts each query's BM25 term partials, ORs the prefix
    expansion's doc arrays into the constant-score clause (numpy
    membership, one clause however many expansions hit), applies the
    msm/operator clause bar, and ships <= k rows per (query, segment)
    into the global deterministic top-k. The r5 relational spelling
    (one flatten decode, two probe joins, one groupBy fold) shuffles
    the full per-(query, doc) partial relation; ``strategy='relational'``
    pins it as the verification twin.

    Postings decode once, pruned to the union of the term-clause
    vocabulary and the expanded prefix vocabulary (left-semi before the
    Arrow decode — the engine-wide multi-term idiom). The dictionary is
    ``term_stats`` / the index's termstats side table; indexes built
    with a custom ``py_tokenizer`` must pass the JVM column twin via
    ``tokenizer=`` (the ``search_index_join`` escape hatch).
    """
    from sgpt_spark.functions.analyzer import resolve_jvm_analyzer
    from sgpt_spark.operators.index_search import flatten_postings, normalize_queries
    from sgpt_spark.operators.multiterm import expand_prefix

    if strategy not in ("kernel", "relational"):
        raise ValueError(
            f"unknown strategy {strategy!r}: use kernel|relational"
        )
    queries, qid_type = normalize_queries(queries)
    if not isinstance(queries, DataFrame):
        queries = spark.createDataFrame(queries, f"qid {qid_type}, query string")
    tokenizer = tokenizer or resolve_jvm_analyzer(meta.analyzer)
    term_clauses, prefixes = _split_clauses(queries, tokenizer)
    required = _required(term_clauses, prefixes, minimum_should_match, operator)
    if term_stats is None:
        term_stats = (
            postings.filter(F.col("term").isNotNull())
            .groupBy("term")
            .agg(F.sum("df").alias("df"))
        )
    exp = expand_prefix(term_stats, prefixes, max_expansions=max_expansions)
    if strategy == "kernel":
        return _mbp_kernel(
            spark, postings, meta, term_clauses, exp, term_stats, required,
            queries.schema["qid"].dataType.simpleString(), k,
        )
    vocab = (
        term_clauses.select("term")
        .unionByName(exp.select("term"))
        .distinct()
    )
    cand = postings.join(vocab, "term", "left_semi")
    flat = flatten_postings(cand, codec=meta.codec)
    return _score_bool_prefix(
        flat, term_clauses, exp, term_stats, meta.n_docs, meta.avgdl, k,
        required, broadcast_queries, meta.k1, meta.b,
    )


def _mbp_kernel(
    spark: SparkSession,
    postings: DataFrame,
    meta,
    term_clauses: DataFrame,
    exp: DataFrame,
    term_stats: DataFrame,
    required: DataFrame | None,
    qid_type: str,
    k: int,
) -> DataFrame:
    """The kernel strategy's body: one tagged query-side relation
    (kind 't' = BM25 term clause carrying qtf x idf; kind 'p' = one
    expanded prefix term of the constant-score clause), replicated
    by presence, cogrouped with the pruned blocks; scoring, the
    prefix-OR, and the clause bar all happen segment-locally (valid
    globally: a doc lives in one segment)."""
    import numpy as np
    import pandas as pd

    from sgpt_spark.functions.bm25 import idf as idf_col
    from sgpt_spark.operators.index_search import (
        _decode_terms,
        _emit_topk_frame,
        deterministic_topk,
    )
    from sgpt_spark.operators.topk import SCORE_DECIMALS, topk_per_group

    t_rows = term_clauses.join(term_stats, "term").select(
        "qid",
        "term",
        F.lit("t").alias("kind"),
        F.col("qtf").cast("int").alias("qtf"),
        (F.col("qtf") * idf_col(F.col("df"), float(meta.n_docs))).alias("w"),
    )
    p_rows = exp.select(
        "qid",
        "term",
        F.lit("p").alias("kind"),
        F.lit(1).alias("qtf"),
        F.lit(0.0).alias("w"),
    )
    tagged = t_rows.unionByName(p_rows)
    if required is not None:
        tagged = tagged.join(required, "qid", "left").withColumn(
            "req", F.coalesce(F.col("req"), F.lit(0)).cast("int")
        )
    cand = postings.join(
        tagged.select("term").distinct(), "term", "left_semi"
    ).select("segment", "term", "blocks")
    presence = postings.select(
        F.col("segment").cast("int").alias("segment"),
        F.col("term").cast("string").alias("term"),
    ).alias("_bp_presence")
    tagged_a = tagged.alias("_bp_tagged")
    sel_cols = [
        F.col("_bp_presence.segment").alias("segment"),
        F.col("_bp_tagged.qid").alias("qid"),
        F.col("_bp_tagged.term").alias("term"),
        F.col("_bp_tagged.kind").alias("kind"),
        F.col("_bp_tagged.qtf").alias("qtf"),
        F.col("_bp_tagged.w").alias("w"),
    ]
    if required is not None:
        sel_cols.append(F.col("_bp_tagged.req").alias("req"))
    qseg = tagged_a.join(
        presence, F.col("_bp_tagged.term") == F.col("_bp_presence.term")
    ).select(*sel_cols)
    codec, k1, b_, avgdl = meta.codec, meta.k1, meta.b, meta.avgdl
    kk = int(k)
    seg_schema = f"qid {qid_type}, doc_id long, score double"

    def score(pleft: pd.DataFrame, pright: pd.DataFrame) -> pd.DataFrame:
        if len(pleft) == 0 or len(pright) == 0:
            return _emit_topk_frame([])
        decoded = _decode_terms(pleft["term"], pleft["blocks"], codec, k1, b_, avgdl)
        if not decoded:
            return _emit_topk_frame([])
        has_req = "req" in pright.columns
        per_q: dict = {}
        req_of: dict = {}
        for i in range(len(pright)):
            qid = pright["qid"].iat[i]
            ent = decoded.get(pright["term"].iat[i])
            if ent is None:
                continue
            per_q.setdefault(qid, ([], [], []))
            kind = pright["kind"].iat[i]
            if kind == "t":
                per_q[qid][0].append(
                    (ent[0], ent[1] * float(pright["w"].iat[i]))
                )
                per_q[qid][1].append((ent[0], int(pright["qtf"].iat[i])))
            else:
                per_q[qid][2].append(ent[0])
            if has_req:
                req_of[qid] = int(pright["req"].iat[i])
        parts = []
        for qid, (t_pairs, t_counts, p_arrs) in per_q.items():
            ids_t = sc_t = None
            if t_pairs:
                docs_cat = np.concatenate([p[0] for p in t_pairs])
                w_cat = np.concatenate([p[1] for p in t_pairs])
                ids_t, inv = np.unique(docs_cat, return_inverse=True)
                sc_t = np.bincount(inv, weights=w_cat)
                cn_t = np.bincount(
                    inv,
                    weights=np.concatenate(
                        [np.full(len(d), q, dtype=np.float64)
                         for d, q in t_counts]
                    ),
                )
            ids_p = None
            if p_arrs:
                ids_p = (
                    p_arrs[0]
                    if len(p_arrs) == 1
                    else np.unique(np.concatenate(p_arrs))
                )
            if ids_t is None and ids_p is None:
                continue
            if ids_t is None:
                all_ids, score_v = ids_p, np.ones(len(ids_p))
                clause_v = np.ones(len(ids_p))
            elif ids_p is None:
                all_ids, score_v, clause_v = ids_t, sc_t, cn_t
            else:
                all_ids = np.union1d(ids_t, ids_p)
                score_v = np.zeros(len(all_ids))
                clause_v = np.zeros(len(all_ids))
                ti = np.searchsorted(all_ids, ids_t)
                score_v[ti] = sc_t
                clause_v[ti] = cn_t
                pi = np.searchsorted(all_ids, ids_p)
                score_v[pi] += 1.0
                clause_v[pi] += 1.0
            if has_req:
                keep = clause_v >= req_of.get(qid, 0)
                all_ids, score_v = all_ids[keep], score_v[keep]
                if len(all_ids) == 0:
                    continue
            scores = np.round(score_v, SCORE_DECIMALS)
            order = deterministic_topk(all_ids.astype(np.int64), scores, kk)
            parts.append(
                (qid, all_ids[order].astype(np.int64), scores[order])
            )
        return _emit_topk_frame(parts)

    seg_topk = (
        cand.groupBy("segment")
        .cogroup(qseg.groupBy("segment"))
        .applyInPandas(score, schema=seg_schema)
    )
    return topk_per_group(seg_topk, k=k).select("qid", "doc_id", "score", "rank")
