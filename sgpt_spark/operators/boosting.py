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
    strategy: str = "kernel",
) -> DataFrame:
    """Index-backed boosting query.

    ``strategy='kernel'`` (default, r6): segment-local numpy TAAT — one
    pruned postings scan over positive AND negative terms, per segment
    each query's positive bincount sum (rounded to SCORE_DECIMALS, the
    clause ranking contract), the demote applied against the segment's
    negative doc-id union via one searchsorted membership, <= k rows
    per (query, segment) shipped into the global top-k. Valid per
    segment because segments partition docs (the dis_max kernel
    argument); the full positive match set never leaves the executors.

    ``strategy='relational'`` pins the r5 spelling (the verification
    twin, pytest-equated): positive = ``match_scores``'s full scored
    set, negative = ``match_candidates``, one JVM demote join — the
    shape for unbounded query relations."""
    if strategy not in ("kernel", "relational"):
        raise ValueError(
            f"unknown strategy {strategy!r}: use kernel|relational"
        )
    if strategy == "kernel":
        return _boosting_kernel(
            spark, postings, meta, queries, negative_queries,
            negative_boost, k, term_stats, tokenizer,
        )
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


def _boosting_kernel(
    spark: SparkSession,
    postings: DataFrame,
    meta,
    queries,
    negative_queries,
    negative_boost: float,
    k: int,
    term_stats,
    tokenizer,
) -> DataFrame:
    """The kernel strategy's body (see ``boosting_search_index``).
    Follows ``compound._dis_max_kernel``'s collect contract: interactive
    query batches, the per-query term maps broadcast."""
    import numpy as np
    import pandas as pd

    from sgpt_spark.functions.analyzer import resolve_py_analyzer
    from sgpt_spark.functions.bm25 import idf_py
    from sgpt_spark.operators.index_search import (
        _decode_terms,
        _emit_topk_frame,
        collect_query_terms,
        deterministic_topk,
        normalize_queries,
    )

    nb = _check_boost(negative_boost)
    q, qid_type = normalize_queries(queries)
    if not isinstance(q, DataFrame):
        q = spark.createDataFrame(q, f"qid {qid_type}, query string")
    nq, _ = normalize_queries(negative_queries)
    if not isinstance(nq, DataFrame):
        nq = spark.createDataFrame(nq, f"qid {qid_type}, query string")
    tok = tokenizer or resolve_py_analyzer(meta.analyzer)
    qid_t = q.schema["qid"].dataType.simpleString()
    seg_schema = f"qid {qid_t}, doc_id long, score double"
    empty = spark.createDataFrame([], seg_schema + ", rank int")

    per_query_pos: dict = {}
    pos_terms: set = set()
    for qid, t, qtf in collect_query_terms(q, tokenize=tok):
        per_query_pos.setdefault(qid, []).append((t, int(qtf)))
        pos_terms.add(t)
    if not per_query_pos:
        return empty
    per_query_neg: dict = {}
    neg_terms: set = set()
    for qid, t, _qtf in collect_query_terms(nq, tokenize=tok):
        per_query_neg.setdefault(qid, set()).add(t)
        neg_terms.add(t)

    terms = sorted(pos_terms | neg_terms)
    cand = postings.filter(F.col("term").isin(terms))
    ptl = sorted(pos_terms)
    if isinstance(term_stats, dict):
        global_df = {t: int(term_stats[t]) for t in ptl if t in term_stats}
    elif term_stats is not None:
        global_df = {
            r["term"]: int(r["df"])
            for r in term_stats.filter(F.col("term").isin(ptl)).collect()
        }
    else:
        global_df = {
            r["term"]: int(r["df"])
            for r in cand.filter(F.col("term").isin(ptl))
            .groupBy("term").agg(F.sum("df").alias("df")).collect()
        }
    idf = {t: idf_py(d, meta.n_docs) for t, d in global_df.items()}
    weighted = {}
    for qid, tws in per_query_pos.items():
        tws = [(t, qtf * idf[t]) for t, qtf in tws if t in idf]
        if tws:
            weighted[qid] = tws
    if not weighted:
        return empty
    b_state = spark.sparkContext.broadcast(
        (weighted, {q_: sorted(s) for q_, s in per_query_neg.items()})
    )
    k1, b, avgdl, codec = meta.k1, meta.b, meta.avgdl, meta.codec
    kk, nbf = int(k), float(nb)

    def bst_wrapper(batches):
        chunks = list(batches)
        if not chunks:
            return
        pdf = (
            pd.concat(chunks, ignore_index=True)
            if len(chunks) > 1
            else chunks[0]
        )
        w_map, n_map = b_state.value
        for seg in pdf["segment"].unique():
            sdf = pdf[pdf["segment"] == seg]
            decoded = _decode_terms(
                sdf["term"], sdf["blocks"], codec, k1, b, avgdl
            )
            if not decoded:
                continue
            parts: list = []
            for qid, tws in w_map.items():
                present = [(t, w) for t, w in tws if t in decoded]
                if not present:
                    continue
                docs_cat = np.concatenate([decoded[t][0] for t, _ in present])
                w_cat = np.concatenate(
                    [decoded[t][1] * w for t, w in present]
                )
                ids, inv = np.unique(docs_cat, return_inverse=True)
                sc = np.round(
                    np.bincount(inv, weights=w_cat), SCORE_DECIMALS
                )
                negs = [
                    decoded[t][0]
                    for t in n_map.get(qid, ())
                    if t in decoded
                ]
                if negs:
                    nset = (
                        negs[0]
                        if len(negs) == 1
                        else np.unique(np.concatenate(negs))
                    )
                    pos_idx = np.searchsorted(nset, ids)
                    pos_idx[pos_idx == len(nset)] = 0
                    hit = nset[pos_idx] == ids
                    if len(nset):
                        sc = np.where(hit, sc * nbf, sc)
                order = deterministic_topk(ids, sc, kk)
                parts.append(
                    (qid, ids[order].astype(np.int64), sc[order])
                )
            if parts:
                yield _emit_topk_frame(parts)

    seg_topk = cand.repartition("segment").mapInPandas(
        bst_wrapper, schema=seg_schema
    )
    # round_scores=False: the demoted value is 6-dp-rounded x nb — the
    # boosting_combine determinism contract (re-rounding can land on a
    # decimal midpoint at digit 7)
    return topk_per_group(seg_topk, k=k, round_scores=False).select(
        "qid", "doc_id", "score", "rank"
    )


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
