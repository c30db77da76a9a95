"""ES ``dis_max`` and ``constant_score`` — the two compound queries the
engine carried only in fused forms until now, as standalone operators.

``dis_max`` (Lucene DisjunctionMaxQuery): given N arbitrary sub-query
clauses, each hit scores

    score = max_i(clause_i) + tie_breaker * (sum_i(clause_i) - max_i)

over the clauses that MATCHED the doc (an unmatched clause contributes
nothing — it is absent, not zero, which matters only for the max when a
clause could score negatively; BM25/phrase/constant clauses are all
strictly positive). The engine's multifield best_fields combine
(search.dismax_combine) is this formula fused over per-field partials of
ONE query text; the standalone form here combines WHOLE sub-queries —
match vs phrase vs constant_score clauses, or different query texts —
which is what the ES query actually wraps.

``constant_score`` (Lucene ConstantScoreQuery): every doc matching the
filter query scores exactly ``boost``. The match set is the analyzed
OR-match candidate set (``aggs.match_candidates``); ranking degenerates
to the engine's deterministic doc_id tie-break.

Correct top-k needs every clause's FULL scored match set (a doc at
clause-1 rank 200 can top the combined page via clause 2), so clause
inputs are the ALL-hits relations the rescoring family already exposes:
``funcscore.match_scores``, ``positions.phrase_hits_index``,
``match_candidates`` + a constant. None of these is corpus-bounded —
each is bounded by its query terms' dfs (the aggregation-phase bound).

Scale shape: ``dis_max_match_index`` keys ALL clauses into ONE
``match_scores`` call via the composite (qid, cid) uid (the
querystring.py idiom) — clause count never multiplies postings scans;
the combine is one groupBy(qid, doc_id) with per-clause conditional
aggregates (fixed-order fold, deterministic across runs and engines),
then the rounded-input top-k window. Fully in-plan: no UDF, no driver
collect.

Determinism contract: clause scores round to 6 dp on ingestion (each
clause's own ranking contract); max/greatest of 6-dp doubles is exact;
the tie_breaker fold multiplies/adds in a FIXED clause order so Spark,
the Python brute force, and the DuckDB twin produce bit-identical
doubles; the final window ranks with round_scores=False (re-rounding an
exact value can straddle a digit-7 midpoint across engines — the
boosting.py rule).

Reference seam: the reference's ES index answers dis_max/constant_score
today (BM25Search delegates the whole query DSL to ES,
crossencoder/beir/crossencoder_beir_bm25.ipynb:298-310 cell 10); pure
ES-parity surface per SURVEY.md §2.5.

Also here: the three trivial-by-design ES queries that complete the
constant-score corner of the DSL — ``ids_query`` (id-list filter,
constant-scored, broadcast probe of the corpus ids), ``match_all_query``
(every doc at _score = boost; the page head is cut corpus-side BEFORE
the per-qid fan-out), and ``match_none_query`` (the schema-stable empty
result).
"""

from __future__ import annotations

import math
from typing import Iterable, Sequence

import numpy as np

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sgpt_spark.operators.topk import SCORE_DECIMALS, topk_per_group

# composite (qid, cid) separator — U+001F, same as querystring.py
_SEP = "\x1f"


def _check_tie(tie_breaker: float) -> float:
    tb = float(tie_breaker)
    if not (0.0 <= tb <= 1.0):
        raise ValueError(
            f"tie_breaker={tie_breaker} outside [0, 1] (0 = pure dis-max, "
            "1 = plain sum)"
        )
    return tb


def _check_boost(boost: float) -> float:
    b = float(boost)
    if not math.isfinite(b) or b <= 0.0:
        raise ValueError(
            f"constant_score boost must be a positive finite number, got {boost}"
        )
    return b


def _combine_tagged(
    tagged: DataFrame, n_clauses: int, tie_breaker: float, k: int
) -> DataFrame:
    """(qid, doc_id, _cid, score) one row per matched (doc, clause) ->
    rounded dis-max top-k. Per-clause conditional max (duplicate rows
    within a clause collapse to the clause's best score, the Lucene
    disjunct semantics), fixed-order fold for the sum."""
    tb = _check_tie(tie_breaker)
    per = [
        F.max(
            F.when(F.col("_cid") == i,
                   F.round(F.col("score"), SCORE_DECIMALS))
        ).alias(f"_s{i}")
        for i in range(n_clauses)
    ]
    g = tagged.groupBy("qid", "doc_id").agg(*per)
    scols = [F.col(f"_s{i}") for i in range(n_clauses)]
    mx = F.greatest(*scols) if n_clauses > 1 else scols[0]
    total = F.coalesce(scols[0], F.lit(0.0))
    for c in scols[1:]:
        total = total + F.coalesce(c, F.lit(0.0))
    scored = g.select(
        "qid",
        "doc_id",
        (mx + F.lit(tb) * (total - mx)).alias("score"),
    )
    return topk_per_group(scored, k=k, round_scores=False).select(
        "qid", "doc_id", "score", "rank"
    )


def dis_max_combine(
    clauses: Sequence[DataFrame],
    tie_breaker: float = 0.0,
    k: int = 10,
) -> DataFrame:
    """Generic ES ``dis_max`` over ARBITRARY sub-query clause relations.

    Each clause: (qid, doc_id, score) — the clause's FULL scored match
    set (no top-k cut; see module docstring). Clauses may come from
    different query families (match, phrase, constant_score, ...);
    rows absent from a clause mean "clause did not match".
    -> (qid, doc_id, score, rank).
    """
    if not clauses:
        raise ValueError("dis_max needs at least one clause")
    tagged = None
    for i, c in enumerate(clauses):
        t = c.select("qid", "doc_id", "score").withColumn("_cid", F.lit(i))
        tagged = t if tagged is None else tagged.unionByName(t)
    return _combine_tagged(tagged, len(clauses), tie_breaker, k)


def _dismax_parts(
    decoded: dict, per_query_cl: dict, tie: float, kk: int
) -> list:
    """Segment-local dis-max over decoded postings ->
    [(qid, doc_ids, scores)]. ``per_query_cl``: qid -> {cid: [(term,
    w)]}. The combine mirrors ``_combine_tagged``'s determinism
    contract exactly: each clause's BM25 sum rounds to 6 dp (the
    clause's own ranking contract), the max of 6-dp doubles is exact,
    the tie_breaker fold adds in FIXED cid order, and the combined
    value is NOT re-rounded. Valid per segment because every doc lives
    in exactly one doc-partitioned segment."""
    from sgpt_spark.operators.index_search import deterministic_topk

    parts: list = []
    for qid, by_cid in per_query_cl.items():
        cscores = []  # (ids, rounded clause scores) in cid order
        for cid in sorted(by_cid):
            present = [(t, w) for t, w in by_cid[cid] if t in decoded]
            if not present:
                continue
            docs_cat = np.concatenate([decoded[t][0] for t, _ in present])
            w_cat = np.concatenate([decoded[t][1] * w for t, w in present])
            ids_c, inv = np.unique(docs_cat, return_inverse=True)
            sc_c = np.round(
                np.bincount(inv, weights=w_cat), SCORE_DECIMALS
            )
            cscores.append((ids_c, sc_c))
        if not cscores:
            continue
        if len(cscores) == 1:
            all_ids, combined = cscores[0]
        else:
            all_ids = cscores[0][0]
            for ids_c, _ in cscores[1:]:
                all_ids = np.union1d(all_ids, ids_c)
            mat = np.zeros((len(cscores), len(all_ids)))
            for r, (ids_c, sc_c) in enumerate(cscores):
                mat[r, np.searchsorted(all_ids, ids_c)] = sc_c
            # clause scores are strictly positive (module docstring), so
            # the zero fill stands in for "absent" under max and sum
            mx = mat.max(axis=0)
            total = mat[0].copy()
            for r in range(1, len(cscores)):
                total += mat[r]
            combined = mx + tie * (total - mx)
        order = deterministic_topk(all_ids, combined, kk)
        parts.append((qid, all_ids[order].astype(np.int64), combined[order]))
    return parts


def dis_max_match_index(
    spark: SparkSession,
    postings: DataFrame,
    meta,
    clause_queries: Sequence[DataFrame | Iterable[tuple]],
    tie_breaker: float = 0.0,
    k: int = 10,
    term_stats: DataFrame | None = None,
    tokenizer=None,
    strategy: str = "kernel",
) -> DataFrame:
    """Index-backed ``dis_max`` whose clauses are all match queries
    (e.g. the original query text plus reformulations).

    ``strategy='kernel'`` (default): segment-local numpy TAAT — decode
    each term once per segment, per-clause bincount sums, the dis-max
    fold in the kernel, <= k rows per (query, segment) shipped into the
    global deterministic top-k. Same plan family as ``search_index``;
    the full per-clause match sets never leave the executors (the r5
    relational spelling shuffled rows ~= the sum of every clause's term
    dfs). Queries follow the engine's collect contract (interactive
    clause batches; the clause-term maps broadcast).

    ``strategy='relational'``: the fully in-plan twin (value-identical,
    tested) — ONE ``match_scores`` call scores EVERY clause via the
    composite (qid, cid) uid, one groupBy combine; the shape for
    unbounded clause-query relations.
    """
    from sgpt_spark.operators.index_search import normalize_queries

    if not clause_queries:
        raise ValueError("dis_max needs at least one clause")
    if strategy not in ("kernel", "relational"):
        raise ValueError(
            f"unknown strategy {strategy!r}: use kernel|relational"
        )
    _check_tie(tie_breaker)
    uni = None
    qid_type = None
    qdfs = []
    for i, q in enumerate(clause_queries):
        q, qt = normalize_queries(q)
        if not isinstance(q, DataFrame):
            q = spark.createDataFrame(q, f"qid {qt}, query string")
        if uni is not None and q.schema["qid"].dataType != qid_type:
            raise ValueError(
                "dis_max clause queries disagree on qid type: "
                f"{qid_type} vs {q.schema['qid'].dataType}"
            )
        qid_type = q.schema["qid"].dataType
        qdfs.append(q)
        t = q.select("qid", F.lit(i).alias("_cid"), "query")
        uni = t if uni is None else uni.unionByName(t)
    if strategy == "kernel":
        return _dis_max_kernel(
            spark, postings, meta, qdfs, tie_breaker, k, term_stats, tokenizer
        )
    from sgpt_spark.operators.funcscore import match_scores

    uid = F.concat(
        F.col("qid").cast("string"), F.lit(_SEP), F.col("_cid").cast("string")
    )
    keyed = uni.select(uid.alias("qid"), "query")
    cmeta = uni.select(uid.alias("uid"), "qid", "_cid").distinct()
    scores = match_scores(
        spark, postings, meta, keyed, term_stats=term_stats, tokenizer=tokenizer
    )
    tagged = (
        scores.withColumnRenamed("qid", "uid")
        .join(F.broadcast(cmeta), "uid")
        .select("qid", "doc_id", "_cid", "score")
    )
    return _combine_tagged(tagged, len(clause_queries), tie_breaker, k)


def _dis_max_kernel(
    spark: SparkSession,
    postings: DataFrame,
    meta,
    qdfs: list,
    tie_breaker: float,
    k: int,
    term_stats,
    tokenizer,
) -> DataFrame:
    """The kernel strategy's body: collect per-clause analyzed terms,
    broadcast qid -> {cid: [(term, qtf * idf)]}, one pruned postings
    scan, per-segment ``_dismax_parts``, global top-k (round_scores
    =False — the combined value is already exact, _combine_tagged's
    rule)."""
    import pandas as pd

    from sgpt_spark.functions.analyzer import resolve_py_analyzer
    from sgpt_spark.functions.bm25 import idf_py
    from sgpt_spark.operators.index_search import (
        _decode_terms,
        _emit_topk_frame,
        collect_query_terms,
    )

    tok = tokenizer or resolve_py_analyzer(meta.analyzer)
    qid_type = qdfs[0].schema["qid"].dataType.simpleString()
    per_query_cl: dict = {}
    all_terms: set = set()
    for cid, q in enumerate(qdfs):
        for qid, t, qtf in collect_query_terms(q, tokenize=tok):
            per_query_cl.setdefault(qid, {}).setdefault(cid, []).append(
                (t, int(qtf))
            )
            all_terms.add(t)
    seg_schema = f"qid {qid_type}, doc_id long, score double"
    empty = spark.createDataFrame([], seg_schema + ", rank int")
    if not per_query_cl:
        return empty
    terms = sorted(all_terms)
    cand = postings.filter(F.col("term").isin(terms))
    if isinstance(term_stats, dict):
        global_df = {t: int(term_stats[t]) for t in terms if t in term_stats}
    elif term_stats is not None:
        global_df = {
            r["term"]: int(r["df"])
            for r in term_stats.filter(F.col("term").isin(terms)).collect()
        }
    else:
        global_df = {
            r["term"]: int(r["df"])
            for r in cand.groupBy("term").agg(F.sum("df").alias("df")).collect()
        }
    idf = {t: idf_py(d, meta.n_docs) for t, d in global_df.items()}
    weighted: dict = {}
    for qid, by_cid in per_query_cl.items():
        wcid = {}
        for cid, tws in by_cid.items():
            tws = [(t, qtf * idf[t]) for t, qtf in tws if t in idf]
            if tws:
                wcid[cid] = tws
        if wcid:
            weighted[qid] = wcid
    if not weighted:
        return empty
    b_queries = spark.sparkContext.broadcast(weighted)
    k1, b, avgdl, codec = meta.k1, meta.b, meta.avgdl, meta.codec
    tie, kk = float(tie_breaker), int(k)

    def dm_wrapper(batches):
        chunks = list(batches)
        if not chunks:
            return
        pdf = (
            pd.concat(chunks, ignore_index=True)
            if len(chunks) > 1
            else chunks[0]
        )
        for seg in pdf["segment"].unique():
            sdf = pdf[pdf["segment"] == seg]
            decoded = _decode_terms(sdf["term"], sdf["blocks"], codec, k1, b, avgdl)
            if not decoded:
                continue
            parts = _dismax_parts(decoded, b_queries.value, tie, kk)
            if parts:
                yield _emit_topk_frame(parts)

    seg_topk = cand.repartition("segment").mapInPandas(
        dm_wrapper, schema=seg_schema
    )
    return topk_per_group(seg_topk, k=k, round_scores=False).select(
        "qid", "doc_id", "score", "rank"
    )


def dis_max_search(
    corpus: DataFrame,
    clause_queries: Sequence[DataFrame | Iterable[tuple]],
    tie_breaker: float = 0.0,
    k: int = 10,
    tokenizer=None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exhaustive declarative twin of ``dis_max_match_index`` (no
    persisted index): each clause's full scored set from ONE corpus
    tokenize shared across clauses. Must be value-identical (tested)."""
    from sgpt_spark.functions.analyzer import tokenize_ws
    from sgpt_spark.operators.index_search import normalize_queries
    from sgpt_spark.operators.search import query_terms, score_candidates
    from sgpt_spark.operators.stats import corpus_stats, doc_terms, term_df, term_freqs

    if not clause_queries:
        raise ValueError("dis_max needs at least one clause")
    spark = corpus.sparkSession
    tok = tokenizer or tokenize_ws
    dt = doc_terms(corpus, id_col=id_col, text_col=text_col, tokenizer=tok)
    tf = term_freqs(dt)
    dfs = term_df(tf)
    stats = corpus_stats(dt)
    clauses = []
    for q in clause_queries:
        q, qt = normalize_queries(q)
        if not isinstance(q, DataFrame):
            q = spark.createDataFrame(q, f"qid {qt}, query string")
        clauses.append(
            score_candidates(tf, query_terms(q, tokenizer=tok), dfs, stats)
        )
    return dis_max_combine(clauses, tie_breaker=tie_breaker, k=k)


def constant_score_index(
    spark: SparkSession,
    postings: DataFrame,
    meta,
    queries: DataFrame | Iterable[tuple],
    boost: float = 1.0,
    k: int = 10,
    tokenizer=None,
) -> DataFrame:
    """ES ``constant_score`` off the compressed index: every doc
    matching >= 1 analyzed query term scores exactly ``boost``; the
    page is the deterministic doc_id-ascending head of the match set.
    -> (qid, doc_id, score, rank)."""
    from sgpt_spark.operators.aggs import match_candidates

    b = _check_boost(boost)
    # single paging window consumes cand once: skip the checkpoint (r6)
    cand = match_candidates(spark, postings, meta, queries,
                            tokenizer=tokenizer, materialize=False)
    scored = cand.select(
        "qid", "doc_id", F.round(F.lit(b), SCORE_DECIMALS).alias("score")
    )
    return topk_per_group(scored, k=k, round_scores=False).select(
        "qid", "doc_id", "score", "rank"
    )


def constant_score_search(
    corpus: DataFrame,
    queries: DataFrame | Iterable[tuple],
    boost: float = 1.0,
    k: int = 10,
    tokenizer=None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exhaustive twin of ``constant_score_index`` over a raw corpus."""
    from sgpt_spark.functions.analyzer import tokenize_ws
    from sgpt_spark.operators.index_search import normalize_queries
    from sgpt_spark.operators.search import query_terms
    from sgpt_spark.operators.stats import doc_terms

    spark = corpus.sparkSession
    b = _check_boost(boost)
    queries, qid_type = normalize_queries(queries)
    if not isinstance(queries, DataFrame):
        queries = spark.createDataFrame(queries, f"qid {qid_type}, query string")
    tok = tokenizer or tokenize_ws
    dt = (
        doc_terms(corpus, id_col=id_col, text_col=text_col, tokenizer=tok)
        .select("doc_id", F.explode("terms").alias("term"))
        .distinct()
    )
    qt = query_terms(queries, tokenizer=tok).select("qid", "term").distinct()
    cand = dt.join(F.broadcast(qt), "term").select("qid", "doc_id").distinct()
    scored = cand.select(
        "qid", "doc_id", F.round(F.lit(b), SCORE_DECIMALS).alias("score")
    )
    return topk_per_group(scored, k=k, round_scores=False).select(
        "qid", "doc_id", "score", "rank"
    )


def ids_query(
    corpus: DataFrame,
    id_sets: Iterable[tuple],
    boost: float = 1.0,
    k: int = 10,
    id_col: str = "doc_id",
) -> DataFrame:
    """ES ``ids`` query: docs whose id is in the request's value list,
    constant-scored at ``boost`` (Lucene rewrites ids to a constant-
    score bitset — same contract as ``constant_score``: deterministic
    doc_id-ascending paging). ``id_sets``: (qid, [doc_id, ...]) rows —
    requested ids missing from the corpus simply don't match (the ES
    rule). -> (qid, doc_id, score, rank).

    Plan: the request relation explodes to (qid, doc_id) pairs and
    broadcast-joins the corpus ids — one semi-join-shaped probe, no
    full-corpus scoring."""
    spark = corpus.sparkSession
    b = _check_boost(boost)
    rows = [(q, list(ids)) for q, ids in id_sets]
    if not rows:
        raise ValueError("ids_query needs at least one (qid, ids) row")
    # qid type follows the first row (the normalize_queries derivation):
    # string qids are first-class everywhere else in the engine and used
    # to die here on a hardcoded bigint schema
    import numpy as _np

    q0 = rows[0][0]
    qid_type = (
        "bigint"
        if isinstance(q0, (int, _np.integer)) and not isinstance(q0, bool)
        else "string"
    )
    req = spark.createDataFrame(
        rows, f"qid {qid_type}, ids array<long>"
    ).select("qid", F.explode("ids").alias("doc_id")).distinct()
    cand = req.join(
        corpus.select(F.col(id_col).alias("doc_id")).distinct(), "doc_id"
    )
    scored = cand.select(
        "qid", "doc_id", F.round(F.lit(b), SCORE_DECIMALS).alias("score")
    )
    return topk_per_group(scored, k=k, round_scores=False).select(
        "qid", "doc_id", "score", "rank"
    )


def match_all_query(
    corpus: DataFrame,
    qids: Iterable,
    boost: float = 1.0,
    k: int = 10,
    id_col: str = "doc_id",
) -> DataFrame:
    """ES ``match_all``: every doc matches at exactly ``boost`` (ES
    gives every doc _score = boost, default 1.0); the page is the
    deterministic doc_id-ascending head per qid. -> (qid, doc_id,
    score, rank). The corpus-side head is cut BEFORE the qid fan-out
    (match_all's page never depends on the query), so the cross join
    carries k rows per qid, not |corpus|."""
    spark = corpus.sparkSession
    b = _check_boost(boost)
    qdf = spark.createDataFrame([(q,) for q in qids], ["qid"])
    head = (
        corpus.select(F.col(id_col).alias("doc_id"))
        .orderBy("doc_id")
        .limit(int(k))
    )
    scored = qdf.crossJoin(head).select(
        "qid", "doc_id", F.round(F.lit(b), SCORE_DECIMALS).alias("score")
    )
    return topk_per_group(scored, k=k, round_scores=False).select(
        "qid", "doc_id", "score", "rank"
    )


def match_none_query(corpus: DataFrame, qids: Iterable) -> DataFrame:
    """ES ``match_none``: the empty result, schema-stable (qid, doc_id,
    score, rank) — the degenerate twin of ``match_all`` (completes the
    pair; useful as a bool-clause identity in composed requests)."""
    spark = corpus.sparkSession
    return spark.createDataFrame(
        [], "qid long, doc_id long, score double, rank int"
    )
