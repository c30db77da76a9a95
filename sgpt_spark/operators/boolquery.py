"""ES ``bool`` compound query — must / should / must_not / filter.

The reference delegates every query to Elasticsearch
(crossencoder/beir/crossencoder_beir_bm25.ipynb cell 10 builds
``multi_match`` bodies; the ES querystring surface it rides accepts
arbitrary ``bool`` composition). This module re-expresses the Lucene
BooleanQuery/BooleanScorer semantics (public docs/source) over this
engine's relations:

  * each clause is an ES ``match`` query (analyzed text, internal
    operator=or: the clause MATCHES a doc when >= 1 of its analyzed
    terms occurs);
  * ``must`` and ``filter`` clauses must ALL match; ``must_not``
    clauses must NONE match; ``should`` clauses must match at least
    ``minimum_should_match`` (ES default: 1 when the bool has no
    must/filter clause, else 0 — should becomes purely score-boosting);
  * score = sum of the BM25 scores of the matching ``must`` and
    ``should`` clauses (Lucene's disjunction sum); ``filter`` and
    ``must_not`` never contribute score (filter context). Because an
    unmatched should clause contributes exactly 0, the score is the
    plain BM25 sum over the union of scoring-clause terms — BM25's
    additivity is what lets one accumulator pass score the whole bool.
  * a must/filter clause whose analyzed text is empty or entirely
    corpus-absent matches no documents (ES ``zero_terms_query: none``
    -> MatchNoDocsQuery), so the whole bool matches nothing.

Both paths are CANDIDATE-DRIVEN: a document enters consideration only
by matching at least one clause term. Consequently pure-negation
queries (only must_not clauses) are refused loudly, and an explicit
``minimum_should_match=0`` on a should-only query returns the docs
matching >= 1 should term rather than ES's degenerate match-all (the
two paths and the SQL oracle agree with each other; the match-all tail
is score-0 docs below every match anyway).

Three value-identical paths:

``bool_search``        exhaustive/declarative — pure DataFrame ops over
                       the corpus (the DuckDB-oracle-parallel plan).
``bool_search_index``  ONE TAAT pass over the compressed inverted index
                       (the Lucene BooleanScorer role): every clause
                       term is decoded once per segment; a float64
                       accumulator carries the score sum while a uint64
                       accumulator ORs per-clause match BITS (clause i
                       of a query -> bit i, <= 63 clauses/query), and
                       the must/filter/must_not/should constraints
                       become three bitmask tests + one popcount per
                       candidate doc. must_not/filter correctness is
                       per-segment-global for the same reason msm is:
                       every doc lives in exactly one doc-partitioned
                       segment, so its full clause bitmap materializes
                       in that segment.
``bool_search_index_cogroup``
                       the same bitmap-TAAT kernel with the clause set
                       kept IN-PLAN (no driver collect): clause ids,
                       occur masks, and per-term weight/bit rows are
                       compiled by whole-stage-codegen bit arithmetic,
                       replicated across candidate segments, and
                       cogrouped with the term-pruned postings — the
                       bool twin of ``search_index_cogroup`` and the
                       path for query sets too large for the driver.

Scale notes (10^12 docs): the index path scans the postings relation
ONCE, pruned to the union of all clause terms at the parquet reader
(pushed In(term, ...)); <= k rows per (query, segment) reach the global
window merge. The non-scoring (filter/must_not) terms ride the same
decode with weight 0 — no second scan, no join against a doc relation.
"""

from __future__ import annotations

from typing import Iterable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sgpt_spark.functions.analyzer import resolve_py_analyzer, tokenize_ws
from sgpt_spark.functions.bm25 import B, K1, bm25_term_score, idf_py
from sgpt_spark.operators.index_search import (
    QUERY_CHUNK,
    _decode_terms,
    _emit_topk_frame,
    deterministic_topk,
)
from sgpt_spark.operators.indexer import IndexMeta
from sgpt_spark.operators.search import Tokenizer
from sgpt_spark.operators.stats import corpus_stats, doc_terms, term_df, term_freqs
from sgpt_spark.operators.topk import SCORE_DECIMALS, topk_per_group

OCCURS = ("must", "should", "must_not", "filter")
_SCORING = ("must", "should")
MAX_CLAUSES = 63  # uint64 bitmap, bit 63 reserved against sign confusion


def normalize_clauses(
    clauses: DataFrame | Iterable[tuple],
) -> tuple["DataFrame | list[tuple]", str]:
    """Clause input contract: a long-form relation (qid, occur, query) —
    one row per clause. Accepts a DataFrame or an iterable of
    (qid, occur, text) tuples; returns (materialized input, qid schema
    type) under the same dual contract as ``normalize_queries``."""
    if isinstance(clauses, DataFrame):
        return clauses, clauses.schema["qid"].dataType.simpleString()
    rows = list(clauses)
    if rows and isinstance(rows[0][0], (int, np.integer)):
        return rows, "bigint"
    return rows, "string"


def _validate_occurs_col(cl: DataFrame) -> DataFrame:
    """Fail loudly (per row, in-plan) on an unknown occur value — a
    typo'd 'mustnot' silently matching nothing would be a wrong-results
    bug, not an error."""
    return cl.withColumn(
        "occur",
        F.when(F.col("occur").isin(*OCCURS), F.col("occur")).otherwise(
            F.raise_error(F.concat(F.lit("unknown bool occur: "), F.col("occur")))
        ),
    )


def bool_search(
    corpus: DataFrame,
    clauses: DataFrame,
    k: int = 10,
    tokenizer: Tokenizer = tokenize_ws,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = K1,
    b: float = B,
    minimum_should_match: int | None = None,
    broadcast_queries: bool = True,
) -> DataFrame:
    """Exhaustive declarative bool query -> RESULTS (qid, doc_id, score,
    rank).

    ``clauses``: long-form (qid, occur, query) relation, occur in
    {must, should, must_not, filter}. ``minimum_should_match``: ES
    semantics — None picks the per-query default (1 when the query has
    no must/filter clause, else 0); an explicit value applies to every
    query that has >= 1 should clause (ES ignores the knob otherwise).

    Plan shape: clause set is query-sized -> broadcast against the one
    big (term, doc_id, tf, doc_len) scan; matched-clause counting and
    constraint filtering are candidate-bounded groupBys; one narrow
    window shuffle for the final top-k.
    """
    cl = _validate_occurs_col(clauses)
    # stable per-query clause ids (count-distinct per occur below needs
    # clause identity, not clause text — duplicate clauses count twice,
    # exactly as Lucene keeps duplicate BooleanClauses)
    cid_w = Window.partitionBy("qid").orderBy("occur", "query")
    cl = cl.withColumn("cid", F.row_number().over(cid_w))

    totals = cl.groupBy("qid").agg(
        F.sum(F.when(F.col("occur") == "must", 1).otherwise(0)).alias("n_must"),
        F.sum(F.when(F.col("occur") == "filter", 1).otherwise(0)).alias("n_filter"),
        F.sum(F.when(F.col("occur") == "should", 1).otherwise(0)).alias("n_should"),
    )
    # pure-negation queries (only must_not clauses) would need "all docs
    # minus" — a full corpus scan this candidate-driven plan cannot
    # express; refuse in-plan rather than silently returning empty
    totals = totals.withColumn(
        "n_must",
        F.when(
            F.col("n_must") + F.col("n_filter") + F.col("n_should") > 0,
            F.col("n_must"),
        ).otherwise(
            F.raise_error(
                F.concat(
                    F.lit("bool query has only must_not clauses (qid "),
                    F.col("qid").cast("string"),
                    F.lit("): pure negation needs a positive clause"),
                )
            )
        ),
    )

    # per-clause analyzed terms with multiplicity (Lucene scores a
    # duplicated clause term once per occurrence)
    qct = (
        cl.filter(F.col("query").isNotNull() & (F.length(F.trim(F.col("query"))) > 0))
        .select("qid", "cid", "occur", tokenizer(F.col("query")).alias("qterms"))
        .select("qid", "cid", "occur", F.explode("qterms").alias("term"))
        .groupBy("qid", "cid", "occur", "term")
        .agg(F.count("*").alias("qtf"))
    )

    dt = doc_terms(corpus, id_col=id_col, text_col=text_col, tokenizer=tokenizer)
    tf = term_freqs(dt)
    dfs = term_df(tf)
    stats = corpus_stats(dt)

    probe = qct.join(dfs, "term", "inner")
    if broadcast_queries:
        probe = F.broadcast(probe)
    hits = tf.join(probe, "term", "inner")

    # score: BM25 sum over the scoring clauses' term matches
    partial = hits.filter(F.col("occur").isin(*_SCORING)).select(
        "qid",
        "doc_id",
        (
            F.col("qtf")
            * bm25_term_score(
                F.col("tf"), F.col("df"), F.col("doc_len"), stats.n_docs, stats.avgdl, k1, b
            )
        ).alias("partial"),
    )
    scores = partial.groupBy("qid", "doc_id").agg(F.sum("partial").alias("score"))

    # matched clauses: distinct (qid, cid, doc) -> per-occur counts
    matched = hits.select("qid", "cid", "occur", "doc_id").distinct()
    agg = matched.groupBy("qid", "doc_id").agg(
        F.sum(F.when(F.col("occur") == "must", 1).otherwise(0)).alias("m_must"),
        F.sum(F.when(F.col("occur") == "filter", 1).otherwise(0)).alias("m_filter"),
        F.sum(F.when(F.col("occur") == "should", 1).otherwise(0)).alias("m_should"),
        F.sum(F.when(F.col("occur") == "must_not", 1).otherwise(0)).alias("m_not"),
    )
    tot = F.broadcast(totals) if broadcast_queries else totals
    if minimum_should_match is None:
        req = F.when(F.col("n_must") + F.col("n_filter") > 0, F.lit(0)).otherwise(F.lit(1))
    else:
        req = F.lit(int(minimum_should_match))
    cand = (
        agg.join(tot, "qid", "inner")
        .filter(
            (F.col("m_must") == F.col("n_must"))
            & (F.col("m_filter") == F.col("n_filter"))
            & (F.col("m_not") == 0)
            & ((F.col("n_should") == 0) | (F.col("m_should") >= req))
        )
        .select("qid", "doc_id")
    )
    scored = cand.join(scores, ["qid", "doc_id"], "left").select(
        "qid", "doc_id", F.coalesce(F.col("score"), F.lit(0.0)).alias("score")
    )
    return topk_per_group(scored, k=k).select("qid", "doc_id", "score", "rank")


def _popcount_u64(x: np.ndarray) -> np.ndarray:
    """Vectorized SWAR popcount over a uint64 array (numpy < 2 has no
    ``bitwise_count``)."""
    x = x.astype(np.uint64, copy=True)
    x = x - ((x >> np.uint64(1)) & np.uint64(0x5555555555555555))
    x = (x & np.uint64(0x3333333333333333)) + (
        (x >> np.uint64(2)) & np.uint64(0x3333333333333333)
    )
    x = (x + (x >> np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    return (x * np.uint64(0x0101010101010101)) >> np.uint64(56)


def _prepare_bool_queries(
    rows: list[tuple], tokenize, idf: dict, msm: int | None
) -> tuple[list, dict, dict]:
    """Driver-side clause compilation -> (qid_list, tmap, qmeta).

    ``rows``: [(qid, occur, text)]. ``idf``: global idf per term (for
    the scoring weights; non-scoring terms get weight 0 but still carry
    their clause bit). Returns
      qid_list  sorted qids with >= 1 corpus-present term,
      tmap      term -> (row indices int64[], weights float64[],
                bits uint64[]) — the TAAT scatter map,
      qmeta     qid -> (req_mask, not_mask, should_mask, req_should)
                as Python ints.
    """
    by_qid: dict = {}
    for qid, occur, text in rows:
        if occur not in OCCURS:
            raise ValueError(f"unknown bool occur {occur!r}: use {OCCURS}")
        toks = tokenize(text) if text is not None else []
        counts: dict[str, int] = {}
        for t in toks:
            counts[t] = counts.get(t, 0) + 1
        by_qid.setdefault(qid, []).append((occur, text, counts))

    qmeta: dict = {}
    per_query_terms: dict = {}
    for qid, cls in by_qid.items():
        if len(cls) > MAX_CLAUSES:
            raise ValueError(
                f"query {qid!r} has {len(cls)} clauses; the bitmap kernel "
                f"supports at most {MAX_CLAUSES} (Lucene's maxClauseCount "
                "rationale: split the query)"
            )
        # deterministic clause order (mirrors the exhaustive path's
        # row_number(occur, query) — only the COUNTS must agree, but a
        # stable order keeps runs reproducible)
        cls = sorted(cls, key=lambda c: (c[0], c[1] if c[1] is not None else ""))
        req_mask = not_mask = should_mask = 0
        n_should = 0
        term_acc: dict = {}  # term -> [weight_sum, bits]
        for ci, (occur, _text, counts) in enumerate(cls):
            bit = 1 << ci
            if occur in ("must", "filter"):
                req_mask |= bit
            elif occur == "must_not":
                not_mask |= bit
            else:
                should_mask |= bit
                n_should += 1
            for t, qtf in counts.items():
                if t not in idf:
                    continue  # corpus-absent: can never set its bit
                ent = term_acc.setdefault(t, [0.0, 0])
                if occur in _SCORING:
                    ent[0] += qtf * idf[t]
                ent[1] |= bit
        if req_mask == 0 and should_mask == 0:
            raise ValueError(
                f"bool query has only must_not clauses (qid {qid!r}): "
                "pure negation needs a positive clause"
            )
        if n_should == 0:
            req_should = 0
        elif msm is None:
            req_should = 0 if (req_mask != 0) else 1
        else:
            req_should = int(msm)
        qmeta[qid] = (req_mask, not_mask, should_mask, req_should)
        per_query_terms[qid] = term_acc

    qid_list = sorted(q for q, ta in per_query_terms.items() if ta)
    qrow = {q: i for i, q in enumerate(qid_list)}
    tmap_acc: dict = {}
    for qid in qid_list:
        for t, (w, bits) in per_query_terms[qid].items():
            ent = tmap_acc.setdefault(t, ([], [], []))
            ent[0].append(qrow[qid])
            ent[1].append(w)
            ent[2].append(bits)
    tmap = {
        t: (
            np.asarray(r, dtype=np.int64),
            np.asarray(w, dtype=np.float64),
            np.asarray(bb, dtype=np.uint64),
        )
        for t, (r, w, bb) in tmap_acc.items()
    }
    return qid_list, tmap, qmeta


def _bool_parts(
    decoded: dict,
    qid_list: list,
    tmap: dict,
    qmeta: dict,
    kk: int,
    query_chunk: int = QUERY_CHUNK,
) -> list:
    """Bitmap TAAT over ONE segment's decoded postings ->
    [(qid, doc_ids, scores)]. Dense accumulators (score float64 + clause
    bits uint64) per query chunk; per-query sparse fallback for
    pathologically sparse doc-id spaces, mirroring ``_taat_parts``."""
    if not decoded:
        return []
    req_arr = np.array(
        [qmeta[q][0] for q in qid_list], dtype=np.uint64
    )
    not_arr = np.array([qmeta[q][1] for q in qid_list], dtype=np.uint64)
    sh_arr = np.array([qmeta[q][2] for q in qid_list], dtype=np.uint64)
    rs_arr = np.array([qmeta[q][3] for q in qid_list], dtype=np.int64)
    lo_doc = min(int(d[0]) for d, _ in decoded.values())
    hi_doc = max(int(d[-1]) for d, _ in decoded.values())
    span = hi_doc - lo_doc + 1
    total_postings = sum(len(d) for d, _ in decoded.values())
    parts: list = []

    def _finish(qi: int, ids: np.ndarray, scores: np.ndarray, bits: np.ndarray):
        valid = (bits & req_arr[qi]) == req_arr[qi]
        valid &= (bits & not_arr[qi]) == np.uint64(0)
        if rs_arr[qi] > 0:
            valid &= _popcount_u64(bits & sh_arr[qi]) >= np.uint64(rs_arr[qi])
        if not valid.any():
            return
        ids, scores = ids[valid], np.round(scores[valid], SCORE_DECIMALS)
        order = deterministic_topk(ids, scores, kk)
        parts.append((qid_list[qi], ids[order], scores[order]))

    if span > max(5_000_000, 20 * total_postings):
        # sparse doc-id space: per-query concatenate + bincount/or.at
        per_q: dict = {}
        for t, (rows, ws, bb) in tmap.items():
            if t not in decoded:
                continue
            for r, w, bits in zip(rows, ws, bb):
                per_q.setdefault(int(r), []).append((t, float(w), np.uint64(bits)))
        for qi, tws in per_q.items():
            docs_cat = np.concatenate([decoded[t][0] for t, _, _ in tws])
            w_cat = np.concatenate([decoded[t][1] * w for t, w, _ in tws])
            bits_cat = np.concatenate(
                [np.full(len(decoded[t][0]), bits, dtype=np.uint64) for t, _, bits in tws]
            )
            uniq, inv = np.unique(docs_cat, return_inverse=True)
            scores = np.bincount(inv, weights=w_cat)
            bacc = np.zeros(len(uniq), dtype=np.uint64)
            np.bitwise_or.at(bacc, inv, bits_cat)
            _finish(qi, uniq, scores, bacc)
        return parts

    nq = len(qid_list)
    for clo in range(0, nq, query_chunk):
        chi = min(clo + query_chunk, nq)
        acc = np.zeros((chi - clo, span), dtype=np.float64)
        bits = np.zeros((chi - clo, span), dtype=np.uint64)
        touched = np.zeros(chi - clo, dtype=bool)
        for term, (docs, tfn) in decoded.items():
            ent = tmap.get(term)
            if ent is None:
                continue
            rows, ws, bb = ent
            sel = (rows >= clo) & (rows < chi)
            if not sel.any():
                continue
            r_local = rows[sel] - clo
            touched[r_local] = True
            pos = docs - lo_doc
            # pos is unique within one term's postings and r_local rows
            # are unique, so fancy-indexed += / |= are race-free
            acc[np.ix_(r_local, pos)] += np.outer(ws[sel], tfn)
            bits[np.ix_(r_local, pos)] |= bb[sel][:, None]
        for r in np.flatnonzero(touched):
            brow = bits[r]
            nz = np.flatnonzero(brow)
            if len(nz) == 0:
                continue
            _finish(
                clo + r, (nz + lo_doc).astype(np.int64), acc[r, nz], brow[nz]
            )
    return parts


def bool_search_index(
    spark: SparkSession,
    postings: DataFrame,
    meta: IndexMeta,
    clauses: DataFrame | Iterable[tuple],
    k: int = 10,
    term_stats: DataFrame | dict | None = None,
    tokenize=None,
    minimum_should_match: int | None = None,
) -> DataFrame:
    """Bool query through the compressed inverted index -> RESULTS
    (qid, doc_id, score, rank), value-identical to ``bool_search``.

    ONE pruned postings scan for all clause terms; per segment, one
    bitmap-TAAT pass (see module docstring) emits <= k candidates per
    query; a global window merge finishes. ``term_stats``: the build's
    (term, df) side table (DataFrame or pre-collected dict) — avoids an
    extra aggregation, same contract as ``search_index``.
    """
    cl, qid_type = normalize_clauses(clauses)
    if isinstance(cl, DataFrame):
        rows = [(r["qid"], r["occur"], r["query"]) for r in cl.collect()]
    else:
        rows = cl
    tok = tokenize or resolve_py_analyzer(meta.analyzer)

    seg_schema = f"qid {qid_type}, doc_id long, score double"
    empty = spark.createDataFrame([], seg_schema + ", rank int")
    if not rows:
        return empty

    all_terms = sorted(
        {t for _, _, text in rows if text is not None for t in tok(text)}
    )
    if not all_terms:
        return empty
    cand = postings.filter(F.col("term").isin(all_terms))

    if isinstance(term_stats, dict):
        global_df = {t: int(term_stats[t]) for t in all_terms if t in term_stats}
    elif term_stats is not None:
        global_df = {
            r["term"]: int(r["df"])
            for r in term_stats.filter(F.col("term").isin(all_terms)).collect()
        }
    else:
        global_df = {
            r["term"]: int(r["df"])
            for r in cand.groupBy("term").agg(F.sum("df").alias("df")).collect()
        }
    idf = {t: idf_py(d, meta.n_docs) for t, d in global_df.items()}

    qid_list, tmap, qmeta = _prepare_bool_queries(rows, tok, idf, minimum_should_match)
    if not qid_list:
        return empty
    b_state = spark.sparkContext.broadcast((qid_list, tmap, qmeta))
    k1, b, avgdl, codec, kk = meta.k1, meta.b, meta.avgdl, meta.codec, k

    def bool_wrapper(batches):
        chunks = list(batches)
        if not chunks:
            return
        pdf = pd.concat(chunks, ignore_index=True) if len(chunks) > 1 else chunks[0]
        qids_b, tmap_b, qmeta_b = b_state.value
        for seg in pdf["segment"].unique():
            sdf = pdf[pdf["segment"] == seg]
            decoded = _decode_terms(sdf["term"], sdf["blocks"], codec, k1, b, avgdl)
            if not decoded:
                continue
            yield _emit_topk_frame(
                _bool_parts(decoded, qids_b, tmap_b, qmeta_b, kk)
            )

    seg_topk = cand.repartition("segment").mapInPandas(bool_wrapper, schema=seg_schema)
    return topk_per_group(seg_topk, k=k).select("qid", "doc_id", "score", "rank")


def bool_search_index_cogroup(
    spark: SparkSession,
    postings: DataFrame,
    meta: IndexMeta,
    clauses: DataFrame | Iterable[tuple],
    k: int = 10,
    term_stats: DataFrame | dict | None = None,
    tokenizer=None,
    minimum_should_match: int | None = None,
) -> DataFrame:
    """In-plan bool query: value-identical to ``bool_search_index`` with
    the clause relation never touching the driver (the contract of
    ``search_index_cogroup``, which this mirrors clause-for-clause).

    Clause compilation happens IN the plan with JVM bit arithmetic:
    a per-qid ``row_number`` mints clause ids, ``shiftleft`` mints the
    clause bit, and the per-qid occur masks (req/not/should) are plain
    ``sum`` aggregates (each clause bit is distinct, so sum == bitwise
    or). Masks are computed BEFORE the (term, df) join so a must/filter
    clause whose terms are corpus-absent or empty still holds its bit in
    ``req_mask`` — unreachable, hence MatchNoDocsQuery semantics, same
    as the driver-side compiler. Per-(qid, term) weight rows fold
    duplicate clauses with ``sum(w)`` + ``bit_or(bit)``; the guards
    (unknown occur, > MAX_CLAUSES, pure negation) raise in-plan via
    ``raise_error``.

    Scale contract = ``search_index_cogroup``'s: per-task clause data is
    the query slice, replication is |terms| x candidate segments, and
    the candidate posting blocks shuffle once (compressed, term-pruned);
    query-set size is bounded by executor memory, not driver memory.
    """
    from sgpt_spark.functions.analyzer import resolve_jvm_analyzer
    from sgpt_spark.functions.bm25 import idf as idf_col

    cl, qid_type = normalize_clauses(clauses)
    if not isinstance(cl, DataFrame):
        cl = spark.createDataFrame(cl, f"qid {qid_type}, occur string, query string")
    cl = _validate_occurs_col(cl)
    cid_w = Window.partitionBy("qid").orderBy("occur", "query")
    cl = cl.withColumn("cid", F.row_number().over(cid_w))
    cl = cl.withColumn(
        "cid",
        F.when(F.col("cid") <= MAX_CLAUSES, F.col("cid")).otherwise(
            F.raise_error(
                F.concat(
                    F.lit("bool query has > "),
                    F.lit(str(MAX_CLAUSES)),
                    F.lit(" clauses (qid "),
                    F.col("qid").cast("string"),
                    F.lit("): the bitmap kernel caps at MAX_CLAUSES — split the query"),
                )
            )
        ),
    )
    # SQL-expr shiftleft: the python wrapper only takes a literal shift
    cl = cl.withColumn("bit", F.expr("shiftleft(CAST(1 AS BIGINT), cid - 1)"))

    msm_req = (
        F.when(F.col("req_mask") != 0, F.lit(0)).otherwise(F.lit(1))
        if minimum_should_match is None
        else F.lit(int(minimum_should_match))
    )
    qmeta = cl.groupBy("qid").agg(
        F.sum(
            F.when(F.col("occur").isin("must", "filter"), F.col("bit")).otherwise(F.lit(0))
        ).alias("req_mask"),
        F.sum(F.when(F.col("occur") == "must_not", F.col("bit")).otherwise(F.lit(0))).alias(
            "not_mask"
        ),
        F.sum(F.when(F.col("occur") == "should", F.col("bit")).otherwise(F.lit(0))).alias(
            "should_mask"
        ),
        F.sum(F.when(F.col("occur") == "should", 1).otherwise(0)).alias("n_should"),
    )
    qmeta = qmeta.withColumn(
        "req_mask",
        F.when(
            (F.col("req_mask") != 0) | (F.col("should_mask") != 0), F.col("req_mask")
        ).otherwise(
            F.raise_error(
                F.concat(
                    F.lit("bool query has only must_not clauses (qid "),
                    F.col("qid").cast("string"),
                    F.lit("): pure negation needs a positive clause"),
                )
            )
        ),
    ).withColumn(
        "req_should",
        F.when(F.col("n_should") == 0, F.lit(0)).otherwise(msm_req),
    ).select("qid", "req_mask", "not_mask", "should_mask", "req_should")

    tok = tokenizer or resolve_jvm_analyzer(meta.analyzer)
    qct = (
        cl.filter(F.col("query").isNotNull() & (F.length(F.trim(F.col("query"))) > 0))
        .select("qid", "occur", "bit", tok(F.col("query")).alias("qterms"))
        .select("qid", "occur", "bit", F.explode("qterms").alias("term"))
        .groupBy("qid", "occur", "bit", "term")
        .agg(F.count("*").alias("qtf"))
    )
    if isinstance(term_stats, dict):
        dfs = spark.createDataFrame(
            [(t, int(d)) for t, d in term_stats.items()], "term string, df long"
        )
    elif term_stats is not None:
        dfs = term_stats
    else:
        dfs = postings.groupBy("term").agg(F.sum("df").alias("df"))
    qtw = (
        qct.join(dfs, "term")
        .select(
            "qid",
            "term",
            "bit",
            F.when(
                F.col("occur").isin(*_SCORING),
                F.col("qtf") * idf_col(F.col("df"), meta.n_docs),
            )
            .otherwise(F.lit(0.0))
            .alias("w"),
        )
        .groupBy("qid", "term")
        .agg(F.sum("w").alias("w"), F.bit_or("bit").alias("bits"))
        .join(qmeta, "qid")
    )

    cand = postings.join(qtw.select("term").distinct(), "term", "left_semi").select(
        "segment", "term", "blocks"
    )
    # fresh attribute id for the replication crossJoin (segs shares
    # lineage with cand; see search_index_cogroup)
    segs = cand.select(F.col("segment").cast("int").alias("segment")).distinct()
    qseg = qtw.crossJoin(F.broadcast(segs))
    k1, b, avgdl, codec, kk = meta.k1, meta.b, meta.avgdl, meta.codec, k
    seg_schema = f"qid {qid_type}, doc_id long, score double"

    def score(pleft: pd.DataFrame, pright: pd.DataFrame) -> pd.DataFrame:
        if len(pleft) == 0 or len(pright) == 0:
            return _emit_topk_frame([])
        decoded = _decode_terms(pleft["term"], pleft["blocks"], codec, k1, b, avgdl)
        if not decoded:
            return _emit_topk_frame([])
        qvals = pright["qid"]
        qid_list = list(pd.unique(qvals))
        qrow = {q: i for i, q in enumerate(qid_list)}
        rows_idx = qvals.map(qrow).to_numpy(np.int64)
        w_arr = pright["w"].to_numpy(np.float64)
        bits_arr = pright["bits"].to_numpy(np.int64).astype(np.uint64)
        tmap_b = {
            t: (rows_idx[ix], w_arr[ix], bits_arr[ix])
            for t, ix in pright.groupby("term", sort=False).indices.items()
        }
        qmeta_b = {
            q: (int(rm), int(nm), int(sm), int(rs))
            for q, rm, nm, sm, rs in zip(
                qvals,
                pright["req_mask"],
                pright["not_mask"],
                pright["should_mask"],
                pright["req_should"],
            )
        }
        return _emit_topk_frame(_bool_parts(decoded, qid_list, tmap_b, qmeta_b, kk))

    seg_topk = (
        cand.groupBy("segment")
        .cogroup(qseg.groupBy("segment"))
        .applyInPandas(score, schema=seg_schema)
    )
    return topk_per_group(seg_topk, k=k).select("qid", "doc_id", "score", "rank")
