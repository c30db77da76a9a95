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

STRUCTURED filter-context clauses (``filters=``): ES ``term`` /
``range`` / ``exists`` queries over keyword/numeric doc values — the
other half of the real-world bool query ("match text AND lang = en AND
n_chars >= 100"). Lucene answers these from doc values; this engine's
equivalent is the doc-values sidecar
(``indexer.build_postings_with_docvalues``: one (segment, doc_id,
*fields) row per indexed doc, segment-aligned with the postings by a
checkpoint-staged build). A structured clause takes a bit in the SAME
per-query bitmap as the text clauses; ONE docvalues scan evaluates the
distinct predicates (whole-stage codegen, pushable to the parquet
reader), a broadcast (pid -> qid, bit) join + sum(bit) mints per-doc
clause bits, and the kernel ORs them in per segment. Structured-clause
docs are full candidates — a filter-only query returns its filter set
at score 0, and adding a filter flips a should-only query's default
minimum_should_match from 1 to 0, both exactly ES. Structured clauses
are filter-context only (occur in {filter, must_not}; ES's
constant-scoring term-in-must is a documented boundary) and never
score. The exhaustive twin evaluates the same predicates directly
against the corpus columns, no sidecar needed.

Scale notes (10^12 docs): the index path scans the postings relation
ONCE, pruned to the union of all clause terms at the parquet reader
(pushed In(term, ...)); <= k rows per (query, segment) reach the global
window merge. The non-scoring (filter/must_not) terms ride the same
decode with weight 0 — no second scan, no join against a doc relation.
Structured filters add one docvalues scan; the rows shuffled to the
kernel are bounded by the predicates' match counts (the Lucene
filter-bitset size), never |docs| x |clauses|.
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

# Structured (non-analyzed) clauses — the ES filter-context surface over
# keyword/numeric doc values. term = exact string-representation match
# (use range ops for floating-point fields: their string forms differ
# across engines); gte/gt/lte/lt = numeric range; exists = NOT NULL.
FILTER_OPS = ("term", "gte", "gt", "lte", "lt", "exists")
# ES allows term/range in must/should (constant-scoring); this engine
# keeps structured clauses in filter context only — they gate, never
# score — and refuses scoring occurs loudly (documented boundary).
FILTER_OCCURS = ("filter", "must_not")


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


def normalize_filters(
    filters: DataFrame | Iterable[tuple],
) -> tuple["DataFrame | list[tuple]", str]:
    """Structured-clause input contract: long-form relation
    (qid, occur, field, op, value) — occur in FILTER_OCCURS, op in
    FILTER_OPS, value a string (numeric ops cast it). Same dual
    DataFrame/iterable contract as ``normalize_clauses``."""
    if isinstance(filters, DataFrame):
        return filters, filters.schema["qid"].dataType.simpleString()
    rows = list(filters)
    if rows and isinstance(rows[0][0], (int, np.integer)):
        return rows, "bigint"
    return rows, "string"


def _pred_col(field: str, op: str, value) -> "F.Column":
    """Structured-clause predicate as a JVM column over a doc-values
    relation. NULL field values never match (ES: a missing field fails
    term/range and exists)."""
    c = F.col(field)
    if op == "term":
        return c.cast("string") == F.lit(value)
    if op == "exists":
        return c.isNotNull()
    num = c.try_cast("double")
    v = F.lit(value).try_cast("double")
    if op == "gte":
        return num >= v
    if op == "gt":
        return num > v
    if op == "lte":
        return num <= v
    if op == "lt":
        return num < v
    raise ValueError(f"unknown structured-filter op {op!r}: use {FILTER_OPS}")


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
    filters: DataFrame | None = None,
) -> DataFrame:
    """Exhaustive declarative bool query -> RESULTS (qid, doc_id, score,
    rank).

    ``clauses``: long-form (qid, occur, query) relation, occur in
    {must, should, must_not, filter}. ``minimum_should_match``: ES
    semantics — None picks the per-query default (1 when the query has
    no must/filter clause, else 0); an explicit value applies to every
    query that has >= 1 should clause (ES ignores the knob otherwise).

    ``filters``: structured filter-context clauses — a long-form
    (qid, occur, field, op, value) relation (occur in FILTER_OCCURS, op
    in FILTER_OPS) evaluated directly against the corpus's own columns
    (no sidecar needed on the exhaustive path). Structured matches gate
    candidates exactly like text clauses but never score; docs matching
    only structured clauses are candidates at score 0 (ES filter-only
    semantics). Unknown fields and ops raise in-plan.

    Plan shape: clause set is query-sized -> broadcast against the one
    big (term, doc_id, tf, doc_len) scan; matched-clause counting and
    constraint filtering are candidate-bounded groupBys; one narrow
    window shuffle for the final top-k. Structured clauses broadcast
    against one corpus projection (predicate evaluated in codegen).
    """
    from sgpt_spark.operators.corpus import non_empty_text

    cl = _validate_occurs_col(clauses)
    # stable per-query clause ids (count-distinct per occur below needs
    # clause identity, not clause text — duplicate clauses count twice,
    # exactly as Lucene keeps duplicate BooleanClauses)
    cid_w = Window.partitionBy("qid").orderBy("occur", "query")
    cl = cl.withColumn("cid", F.row_number().over(cid_w))

    kinds = cl.select("qid", "occur")
    if filters is not None:
        fcl = filters.withColumn(
            "occur",
            F.when(F.col("occur").isin(*FILTER_OCCURS), F.col("occur")).otherwise(
                F.raise_error(
                    F.concat(
                        F.lit("structured clause occur must be filter|must_not, got: "),
                        F.col("occur"),
                    )
                )
            ),
        )
        fcid_w = Window.partitionBy("qid").orderBy("occur", "field", "op", "value")
        fcl = fcl.withColumn("fcid", F.row_number().over(fcid_w))
        kinds = kinds.unionByName(fcl.select("qid", "occur"))

    totals = kinds.groupBy("qid").agg(
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

    # matched clauses: distinct (qid, cid, doc) -> per-occur counts.
    # Text and structured clause ids live in disjoint 't'/'f' namespaces
    # so the distinct can't conflate them.
    matched = hits.select(
        "qid",
        F.concat(F.lit("t"), F.col("cid").cast("string")).alias("cid"),
        "occur",
        "doc_id",
    )
    if filters is not None:
        atomic = [
            fld.name
            for fld in corpus.schema.fields
            if fld.name != text_col
            and (
                fld.dataType.simpleString()
                in (
                    "string", "int", "bigint", "smallint", "tinyint",
                    "double", "float", "boolean", "date", "timestamp",
                )
                or fld.dataType.simpleString().startswith("decimal")
            )
        ]
        smap = F.create_map(
            *[x for c in atomic for x in (F.lit(c), F.col(c).cast("string"))]
        )
        fval = F.when(
            F.col("field").isin(*atomic), F.element_at(F.col("_vals"), F.col("field"))
        ).otherwise(
            F.raise_error(
                F.concat(F.lit("unknown structured-filter field: "), F.col("field"))
            )
        )
        fnum = fval.try_cast("double")
        vnum = F.col("value").try_cast("double")
        pred = (
            F.when(F.col("op") == "term", fval == F.col("value"))
            .when(F.col("op") == "exists", fval.isNotNull())
            .when(F.col("op") == "gte", fnum >= vnum)
            .when(F.col("op") == "gt", fnum > vnum)
            .when(F.col("op") == "lte", fnum <= vnum)
            .when(F.col("op") == "lt", fnum < vnum)
            .otherwise(
                F.raise_error(
                    F.concat(F.lit("unknown structured-filter op: "), F.col("op"))
                )
            )
        )
        base = non_empty_text(corpus, text_col).select(
            F.col(id_col).alias("doc_id"), smap.alias("_vals")
        )
        fprobe = fcl.select("qid", "fcid", "occur", "field", "op", "value")
        if broadcast_queries:
            fprobe = F.broadcast(fprobe)
        fmatched = base.crossJoin(fprobe).filter(pred).select(
            "qid",
            F.concat(F.lit("f"), F.col("fcid").cast("string")).alias("cid"),
            "occur",
            "doc_id",
        )
        matched = matched.unionByName(fmatched)
    matched = matched.distinct()
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
    rows: list[tuple],
    tokenize,
    idf: dict,
    msm: int | None,
    struct_rows: list[tuple] | None = None,
) -> tuple[list, dict, dict, dict]:
    """Driver-side clause compilation -> (qid_list, tmap, qmeta, fmap).

    ``rows``: [(qid, occur, text)]. ``idf``: global idf per term (for
    the scoring weights; non-scoring terms get weight 0 but still carry
    their clause bit). ``struct_rows``: [(qid, occur, field, op, value)]
    structured filter-context clauses — each gets a clause bit AFTER the
    query's text clauses (shared MAX_CLAUSES budget). Returns
      qid_list  sorted qids with >= 1 corpus-present term or >= 1
                structured clause,
      tmap      term -> (row indices int64[], weights float64[],
                bits uint64[]) — the TAAT scatter map,
      qmeta     qid -> (req_mask, not_mask, should_mask, req_should)
                as Python ints,
      fmap      (field, op, value) -> [(qid, bit)] — the distinct
                structured predicates and the clause bits they set.
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

    struct_by_qid: dict = {}
    for qid, occur, field, op, value in struct_rows or []:
        if occur not in FILTER_OCCURS:
            raise ValueError(
                f"structured clause occur {occur!r} (qid {qid!r}): structured "
                f"clauses are filter-context only — use {FILTER_OCCURS}"
            )
        if op not in FILTER_OPS:
            raise ValueError(
                f"unknown structured-filter op {op!r} (qid {qid!r}): use {FILTER_OPS}"
            )
        struct_by_qid.setdefault(qid, []).append((occur, field, op, value))
        by_qid.setdefault(qid, [])  # filter-only queries are still queries

    qmeta: dict = {}
    per_query_terms: dict = {}
    per_query_struct: dict = {}
    for qid, cls in by_qid.items():
        scl = sorted(struct_by_qid.get(qid, ()))
        if len(cls) + len(scl) > MAX_CLAUSES:
            raise ValueError(
                f"query {qid!r} has {len(cls) + len(scl)} clauses; the bitmap "
                f"kernel supports at most {MAX_CLAUSES} (Lucene's "
                "maxClauseCount rationale: split the query)"
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
        struct_bits = []
        for si, (occur, field, op, value) in enumerate(scl):
            bit = 1 << (len(cls) + si)
            if occur == "filter":
                req_mask |= bit
            else:
                not_mask |= bit
            struct_bits.append(((field, op, value), bit))
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
        per_query_struct[qid] = struct_bits

    qid_list = sorted(
        q
        for q, ta in per_query_terms.items()
        if ta or per_query_struct.get(q)
    )
    qrow = {q: i for i, q in enumerate(qid_list)}
    tmap_acc: dict = {}
    fmap: dict = {}
    for qid in qid_list:
        for t, (w, bits) in per_query_terms[qid].items():
            ent = tmap_acc.setdefault(t, ([], [], []))
            ent[0].append(qrow[qid])
            ent[1].append(w)
            ent[2].append(bits)
        for key, bit in per_query_struct.get(qid, ()):
            fmap.setdefault(key, []).append((qid, bit))
    tmap = {
        t: (
            np.asarray(r, dtype=np.int64),
            np.asarray(w, dtype=np.float64),
            np.asarray(bb, dtype=np.uint64),
        )
        for t, (r, w, bb) in tmap_acc.items()
    }
    return qid_list, tmap, qmeta, fmap


def _bool_parts(
    decoded: dict,
    qid_list: list,
    tmap: dict,
    qmeta: dict,
    kk: int,
    query_chunk: int = QUERY_CHUNK,
    fb: dict | None = None,
) -> list:
    """Bitmap TAAT over ONE segment's decoded postings ->
    [(qid, doc_ids, scores)]. Dense accumulators (score float64 + clause
    bits uint64) per query chunk; per-query sparse fallback for
    pathologically sparse doc-id spaces, mirroring ``_taat_parts``.

    ``fb``: externally-evaluated clause rows for this segment — query
    row index -> (doc_ids int64[], clause-bit ORs uint64[], score
    contributions float64[]). Structured filter-context clauses enter
    with score 0 (a filter-only query matches its filter set at score
    0, like ES); externally-SCORED clauses (e.g. phrase clauses whose
    hits the positional kernel already scored) enter with their raw
    clause score. Docs are full candidates either way — they extend the
    doc-id span and ride the same constraint tests. Entries may repeat
    a doc (filter rows + scored rows arrive from separate relations),
    so accumulation uses ufunc.at, never fancy-indexed +=.
    """
    if not decoded and not fb:
        return []
    req_arr = np.array(
        [qmeta[q][0] for q in qid_list], dtype=np.uint64
    )
    not_arr = np.array([qmeta[q][1] for q in qid_list], dtype=np.uint64)
    sh_arr = np.array([qmeta[q][2] for q in qid_list], dtype=np.uint64)
    rs_arr = np.array([qmeta[q][3] for q in qid_list], dtype=np.int64)
    fb = fb or {}
    doc_los = [int(d[0]) for d, _ in decoded.values()] + [
        int(d.min()) for d, _, _ in fb.values() if len(d)
    ]
    doc_his = [int(d[-1]) for d, _ in decoded.values()] + [
        int(d.max()) for d, _, _ in fb.values() if len(d)
    ]
    if not doc_los:
        return []
    lo_doc = min(doc_los)
    hi_doc = max(doc_his)
    span = hi_doc - lo_doc + 1
    total_postings = sum(len(d) for d, _ in decoded.values()) + sum(
        len(d) for d, _, _ in fb.values()
    )
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
        for qi in fb:
            per_q.setdefault(int(qi), [])
        for qi, tws in per_q.items():
            d_parts = [decoded[t][0] for t, _, _ in tws]
            w_parts = [decoded[t][1] * w for t, w, _ in tws]
            b_parts = [
                np.full(len(decoded[t][0]), bits, dtype=np.uint64)
                for t, _, bits in tws
            ]
            fent = fb.get(qi)
            if fent is not None and len(fent[0]):
                d_parts.append(fent[0])
                w_parts.append(fent[2])
                b_parts.append(fent[1])
            if not d_parts:
                continue
            docs_cat = np.concatenate(d_parts)
            w_cat = np.concatenate(w_parts)
            bits_cat = np.concatenate(b_parts)
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
        for qi, (fdocs, fbits, fw) in fb.items():
            if clo <= qi < chi and len(fdocs):
                np.bitwise_or.at(bits[qi - clo], fdocs - lo_doc, fbits)
                np.add.at(acc[qi - clo], fdocs - lo_doc, fw)
                touched[qi - clo] = True
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
    filters: DataFrame | Iterable[tuple] | None = None,
    docvalues: DataFrame | None = None,
) -> DataFrame:
    """Bool query through the compressed inverted index -> RESULTS
    (qid, doc_id, score, rank), value-identical to ``bool_search``.

    ONE pruned postings scan for all clause terms; per segment, one
    bitmap-TAAT pass (see module docstring) emits <= k candidates per
    query; a global window merge finishes. ``term_stats``: the build's
    (term, df) side table (DataFrame or pre-collected dict) — avoids an
    extra aggregation, same contract as ``search_index``.

    ``filters``: structured filter-context clauses — long-form
    (qid, occur, field, op, value) rows, occur in FILTER_OCCURS, op in
    FILTER_OPS — evaluated against ``docvalues`` (the build's doc-values
    sidecar, ``build_postings_with_docvalues``). Each structured clause
    takes a bit in the SAME per-query bitmap as the text clauses: one
    doc-values scan evaluates the distinct predicates (pushed to the
    parquet reader), a small broadcast join mints (segment, doc_id, qid,
    bits) rows, and the kernel ORs them in per segment — structured-
    clause docs are full candidates, so a filter-only query returns its
    filter set at score 0 (ES semantics). Rows shuffled are bounded by
    the predicates' match counts (the Lucene filter-bitset size), never
    |docs| x |clauses|.
    """
    cl, qid_type = normalize_clauses(clauses)
    if isinstance(cl, DataFrame):
        rows = [(r["qid"], r["occur"], r["query"]) for r in cl.collect()]
    else:
        rows = cl
    frows: list[tuple] = []
    if filters is not None:
        if docvalues is None:
            raise ValueError(
                "bool_search_index: structured filters need the doc-values "
                "sidecar (docvalues=) — build_postings_with_docvalues"
            )
        fl, f_qid_type = normalize_filters(filters)
        if isinstance(fl, DataFrame):
            frows = [
                (r["qid"], r["occur"], r["field"], r["op"], r["value"])
                for r in fl.collect()
            ]
        else:
            frows = fl
        if frows and not rows:
            qid_type = f_qid_type
        bad = sorted(
            {f for _, _, f, _, _ in frows} - set(docvalues.columns)
        )
        if bad:
            raise ValueError(
                f"structured-filter fields {bad} not in docvalues columns "
                f"{docvalues.columns}"
            )
    tok = tokenize or resolve_py_analyzer(meta.analyzer)

    seg_schema = f"qid {qid_type}, doc_id long, score double"
    empty = spark.createDataFrame([], seg_schema + ", rank int")
    if not rows and not frows:
        return empty

    all_terms = sorted(
        {t for _, _, text in rows if text is not None for t in tok(text)}
    )
    if not all_terms and not frows:
        return empty
    cand = postings.filter(F.col("term").isin(all_terms))

    if isinstance(term_stats, dict):
        global_df = {t: int(term_stats[t]) for t in all_terms if t in term_stats}
    elif term_stats is not None:
        global_df = {
            r["term"]: int(r["df"])
            for r in term_stats.filter(F.col("term").isin(all_terms)).collect()
        }
    elif all_terms:
        global_df = {
            r["term"]: int(r["df"])
            for r in cand.groupBy("term").agg(F.sum("df").alias("df")).collect()
        }
    else:
        global_df = {}
    idf = {t: idf_py(d, meta.n_docs) for t, d in global_df.items()}

    qid_list, tmap, qmeta, fmap = _prepare_bool_queries(
        rows, tok, idf, minimum_should_match, struct_rows=frows
    )
    if not qid_list:
        return empty
    k1, b, avgdl, codec, kk = meta.k1, meta.b, meta.avgdl, meta.codec, k

    if not fmap:
        b_state = spark.sparkContext.broadcast((qid_list, tmap, qmeta))

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

        seg_topk = cand.repartition("segment").mapInPandas(
            bool_wrapper, schema=seg_schema
        )
        return topk_per_group(seg_topk, k=k).select("qid", "doc_id", "score", "rank")

    # structured clauses: ONE doc-values scan evaluates the distinct
    # predicates into (segment, doc_id, pid) rows — bounded by the
    # predicates' match counts x |predicates a doc satisfies|, never
    # fanned by |queries|. The pid -> (query row, clause bit) fan
    # happens INSIDE the kernel from a broadcast map (r6): the r5
    # spelling joined a (pid -> qid, bit) relation and ran a
    # groupBy(segment, doc_id, qid) in the JVM, shuffling ~|matched
    # docs| x |queries per predicate| rows (~48M on the bench shape)
    # before the cogroup. fb accumulation is bitwise_or.at, so the
    # kernel hands over per-query CONCATENATED (docs, bit) rows —
    # duplicates are fine, no unique needed.
    pred_keys = list(fmap.keys())
    match_arr = F.array(
        *[
            F.when(_pred_col(f, op, v), F.lit(pid))
            for pid, (f, op, v) in enumerate(pred_keys)
        ]
    )
    matched = docvalues.select(
        F.col("segment").cast("int").alias("segment"),
        "doc_id",
        F.explode(F.array_compact(match_arr)).alias("pid"),
    )

    qrow = {q: i for i, q in enumerate(qid_list)}
    pid_pairs = {
        pid: [(qrow[qid], int(bit)) for qid, bit in fmap[key]]
        for pid, key in enumerate(pred_keys)
    }
    b_state = spark.sparkContext.broadcast(
        (qid_list, tmap, qmeta, pid_pairs)
    )

    def bool_filtered(pleft: pd.DataFrame, pright: pd.DataFrame) -> pd.DataFrame:
        qids_b, tmap_b, qmeta_b, pp_b = b_state.value
        decoded = (
            _decode_terms(pleft["term"], pleft["blocks"], codec, k1, b, avgdl)
            if len(pleft)
            else {}
        )
        fb: dict = {}
        if len(pright):
            pids_a = pright["pid"].to_numpy(np.int64)
            docs_a = pright["doc_id"].to_numpy(np.int64)
            order = np.argsort(pids_a, kind="stable")
            pids_s, docs_s = pids_a[order], docs_a[order]
            bounds = np.flatnonzero(pids_s[1:] != pids_s[:-1]) + 1
            per_q: dict = {}
            for s, e in zip(
                np.concatenate(([0], bounds)),
                np.concatenate((bounds, [len(pids_s)])),
            ):
                docs_p = docs_s[s:e]
                for qr, bit in pp_b.get(int(pids_s[s]), ()):
                    d_list, b_list = per_q.setdefault(qr, ([], []))
                    d_list.append(docs_p)
                    b_list.append(np.uint64(bit))
            for qr, (d_list, b_list) in per_q.items():
                docs_cat = (
                    np.concatenate(d_list) if len(d_list) > 1 else d_list[0]
                )
                bits_cat = np.concatenate(
                    [
                        np.full(len(d), b_, dtype=np.uint64)
                        for d, b_ in zip(d_list, b_list)
                    ]
                )
                fb[int(qr)] = (
                    docs_cat,
                    bits_cat,
                    np.zeros(len(docs_cat), dtype=np.float64),
                )
        return _emit_topk_frame(
            _bool_parts(decoded, qids_b, tmap_b, qmeta_b, kk, fb=fb)
        )

    seg_topk = (
        cand.select("segment", "term", "blocks")
        .groupBy("segment")
        .cogroup(matched.groupBy("segment"))
        .applyInPandas(bool_filtered, schema=seg_schema)
    )
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
    filters: DataFrame | Iterable[tuple] | None = None,
    docvalues: DataFrame | None = None,
    scored: DataFrame | None = None,
    scored_hits: DataFrame | None = None,
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

    ``filters``/``docvalues``: the structured filter-context clauses of
    ``bool_search_index``, fully in-plan as well — structured clause
    ids continue the per-qid bit sequence after the text clauses
    (count join + shiftleft), the distinct predicates broadcast against
    ONE doc-values projection (string-map + codegen CASE dispatch, the
    exhaustive path's shape), and the matched (segment, doc_id, qid,
    bit-sum) rows union into the cogroup's query side (they are
    segment-keyed already — never replicated). Filter-only queries ride
    the doc-bit rows, which carry the per-qid masks.

    ``scored``/``scored_hits``: externally-SCORED clauses — the
    generalization of the filter doc-bit mechanism to clauses whose hit
    sets another kernel already scored (e.g. phrase clauses off the
    positional sidecar, the ``simple_query_string`` fast path).
    ``scored`` = (qid, occur, key) clause meta, occur in must / should /
    must_not, key unique per (qid, clause); ``scored_hits`` = (qid, key,
    segment, doc_id, score) — the clause's FULL hit relation with raw
    (unrounded) scores. Each scored clause takes the next bit after the
    text and structured clauses, its occur folds into the same per-qid
    masks (a must phrase constrains, a must_not demotes to exclusion, a
    should counts toward minimum_should_match), and its hits enter the
    kernel as (doc, bit, score) rows — scoring occurs add their score to
    the same accumulator BM25 uses, must_not scores are dropped. Hits
    are segment-keyed, never replicated; a query with ONLY scored
    clauses rides its hit rows exactly like a filter-only query.
    """
    from sgpt_spark.functions.analyzer import resolve_jvm_analyzer
    from sgpt_spark.functions.bm25 import idf as idf_col

    cl, qid_type = normalize_clauses(clauses)
    fl = f_qid_type = None
    if filters is not None:
        fl, f_qid_type = normalize_filters(filters)
        # an empty text-clause set takes its qid schema from the filters
        # (filter-only batches), mirroring bool_search_index
        if not isinstance(cl, DataFrame) and not cl:
            qid_type = f_qid_type
    elif scored is not None and not isinstance(cl, DataFrame) and not cl:
        # scored-clauses-only batches take their qid schema from scored
        qid_type = scored.schema["qid"].dataType.simpleString()
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

    flc = None
    if filters is not None:
        if docvalues is None:
            raise ValueError(
                "bool_search_index_cogroup: structured filters need the "
                "doc-values sidecar (docvalues=) — build_postings_with_docvalues"
            )
        if not isinstance(fl, DataFrame):
            fl = spark.createDataFrame(
                fl,
                f"qid {f_qid_type}, occur string, field string, op string, "
                "value string",
            )
        flc = fl.withColumn(
            "occur",
            F.when(F.col("occur").isin(*FILTER_OCCURS), F.col("occur")).otherwise(
                F.raise_error(
                    F.concat(
                        F.lit(
                            "structured clause occur must be filter|must_not, got: "
                        ),
                        F.col("occur"),
                    )
                )
            ),
        ).withColumn(
            "op",
            F.when(F.col("op").isin(*FILTER_OPS), F.col("op")).otherwise(
                F.raise_error(
                    F.concat(F.lit("unknown structured-filter op: "), F.col("op"))
                )
            ),
        )
        ntext = cl.groupBy("qid").agg(F.count("*").alias("n_text"))
        fw = Window.partitionBy("qid").orderBy("occur", "field", "op", "value")
        flc = (
            flc.withColumn("fcid", F.row_number().over(fw))
            .join(ntext, "qid", "left")
            .withColumn("n_text", F.coalesce(F.col("n_text"), F.lit(0)))
            .withColumn("cidx", F.col("n_text") + F.col("fcid"))
        )
        flc = flc.withColumn(
            "cidx",
            F.when(F.col("cidx") <= MAX_CLAUSES, F.col("cidx")).otherwise(
                F.raise_error(
                    F.concat(
                        F.lit("bool query has > "),
                        F.lit(str(MAX_CLAUSES)),
                        F.lit(" clauses incl. structured (qid "),
                        F.col("qid").cast("string"),
                        F.lit("): the bitmap kernel caps at MAX_CLAUSES"),
                    )
                )
            ),
        ).withColumn("bit", F.expr("shiftleft(CAST(1 AS BIGINT), cidx - 1)"))

    scc = None
    if scored is not None:
        if scored_hits is None:
            raise ValueError(
                "bool_search_index_cogroup: scored= clause meta needs its "
                "scored_hits= (qid, key, segment, doc_id, score) relation"
            )
        scc = scored.withColumn(
            "occur",
            F.when(
                F.col("occur").isin("must", "should", "must_not"), F.col("occur")
            ).otherwise(
                F.raise_error(
                    F.concat(
                        F.lit(
                            "scored clause occur must be must|should|must_not, got: "
                        ),
                        F.col("occur"),
                    )
                )
            ),
        )
        # scored clause bits continue the per-qid sequence after the
        # text and structured clauses (the flc idiom)
        sw = Window.partitionBy("qid").orderBy("occur", "key")
        scc = scc.withColumn("scid", F.row_number().over(sw))
        ntext_s = cl.groupBy("qid").agg(F.count("*").alias("_nt"))
        scc = scc.join(ntext_s, "qid", "left").withColumn(
            "_nt", F.coalesce(F.col("_nt"), F.lit(0))
        )
        if flc is not None:
            nflt_s = flc.groupBy("qid").agg(F.count("*").alias("_nf"))
            scc = scc.join(nflt_s, "qid", "left").withColumn(
                "_nf", F.coalesce(F.col("_nf"), F.lit(0))
            )
        else:
            scc = scc.withColumn("_nf", F.lit(0))
        scc = scc.withColumn(
            "cidx", F.col("_nt") + F.col("_nf") + F.col("scid")
        ).withColumn(
            "cidx",
            F.when(F.col("cidx") <= MAX_CLAUSES, F.col("cidx")).otherwise(
                F.raise_error(
                    F.concat(
                        F.lit("bool query has > "),
                        F.lit(str(MAX_CLAUSES)),
                        F.lit(" clauses incl. scored (qid "),
                        F.col("qid").cast("string"),
                        F.lit("): the bitmap kernel caps at MAX_CLAUSES"),
                    )
                )
            ),
        ).withColumn("bit", F.expr("shiftleft(CAST(1 AS BIGINT), cidx - 1)"))

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
    if flc is not None:
        fqmeta = flc.groupBy("qid").agg(
            F.sum(
                F.when(F.col("occur") == "filter", F.col("bit")).otherwise(F.lit(0))
            ).alias("f_req"),
            F.sum(
                F.when(F.col("occur") == "must_not", F.col("bit")).otherwise(F.lit(0))
            ).alias("f_not"),
        )
        qmeta = (
            qmeta.join(fqmeta, "qid", "full_outer")
            .withColumn(
                "req_mask",
                F.coalesce(F.col("req_mask"), F.lit(0))
                + F.coalesce(F.col("f_req"), F.lit(0)),
            )
            .withColumn(
                "not_mask",
                F.coalesce(F.col("not_mask"), F.lit(0))
                + F.coalesce(F.col("f_not"), F.lit(0)),
            )
            .withColumn("should_mask", F.coalesce(F.col("should_mask"), F.lit(0)))
            .withColumn("n_should", F.coalesce(F.col("n_should"), F.lit(0)))
            .drop("f_req", "f_not")
        )
    if scc is not None:
        sqmeta = scc.groupBy("qid").agg(
            F.sum(
                F.when(F.col("occur") == "must", F.col("bit")).otherwise(F.lit(0))
            ).alias("s_req"),
            F.sum(
                F.when(F.col("occur") == "must_not", F.col("bit")).otherwise(F.lit(0))
            ).alias("s_not"),
            F.sum(
                F.when(F.col("occur") == "should", F.col("bit")).otherwise(F.lit(0))
            ).alias("s_should"),
            F.sum(F.when(F.col("occur") == "should", 1).otherwise(0)).alias(
                "s_n_should"
            ),
        )
        qmeta = (
            qmeta.join(sqmeta, "qid", "full_outer")
            .withColumn(
                "req_mask",
                F.coalesce(F.col("req_mask"), F.lit(0))
                + F.coalesce(F.col("s_req"), F.lit(0)),
            )
            .withColumn(
                "not_mask",
                F.coalesce(F.col("not_mask"), F.lit(0))
                + F.coalesce(F.col("s_not"), F.lit(0)),
            )
            .withColumn(
                "should_mask",
                F.coalesce(F.col("should_mask"), F.lit(0))
                + F.coalesce(F.col("s_should"), F.lit(0)),
            )
            .withColumn(
                "n_should",
                F.coalesce(F.col("n_should"), F.lit(0))
                + F.coalesce(F.col("s_n_should"), F.lit(0)),
            )
            .drop("s_req", "s_not", "s_should", "s_n_should")
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
    _QCOLS = [
        "segment", "qid", "term", "w", "bits",
        "req_mask", "not_mask", "should_mask", "req_should", "doc_id",
    ]
    # doc_id = -1 keeps the unioned column non-nullable end to end:
    # a nullable bigint crosses into pandas as float64, which would
    # silently truncate doc ids past 2^53
    qside = qtw.crossJoin(F.broadcast(segs)).withColumn(
        "doc_id", F.lit(-1).cast("long")
    ).select(*_QCOLS)

    if flc is not None:
        # ONE doc-values projection: the distinct predicates broadcast
        # against a string-map of the sidecar's fields, op dispatch in
        # codegen (the exhaustive path's shape); matched rows take their
        # (qid, bit) via an equi-join on the predicate triple and OR per
        # (segment, doc, qid) — segment-keyed, never replicated
        atomic = [c for c in docvalues.columns if c not in ("segment", "doc_id")]
        smap = F.create_map(
            *[x for c in atomic for x in (F.lit(c), F.col(c).cast("string"))]
        )
        dvm = docvalues.select(
            F.col("segment").cast("int").alias("segment"), "doc_id",
            smap.alias("_vals"),
        )
        preds = flc.select("field", "op", "value").distinct()
        fval = F.when(
            F.col("field").isin(*atomic), F.element_at(F.col("_vals"), F.col("field"))
        ).otherwise(
            F.raise_error(
                F.concat(F.lit("unknown structured-filter field: "), F.col("field"))
            )
        )
        fnum = fval.try_cast("double")
        vnum = F.col("value").try_cast("double")
        pred = (
            F.when(F.col("op") == "term", fval == F.col("value"))
            .when(F.col("op") == "exists", fval.isNotNull())
            .when(F.col("op") == "gte", fnum >= vnum)
            .when(F.col("op") == "gt", fnum > vnum)
            .when(F.col("op") == "lte", fnum <= vnum)
            .when(F.col("op") == "lt", fnum < vnum)
        )
        ev = dvm.crossJoin(F.broadcast(preds)).filter(pred)
        docbits = (
            ev.select("segment", "doc_id", "field", "op", "value")
            .join(
                F.broadcast(flc.select("qid", "field", "op", "value", "bit")),
                ["field", "op", "value"],
            )
            .groupBy("segment", "doc_id", "qid")
            .agg(F.sum("bit").alias("bits"))
            .join(qmeta, "qid")
            .select(
                "segment", "qid",
                F.lit(None).cast("string").alias("term"),
                F.lit(0.0).alias("w"), "bits",
                "req_mask", "not_mask", "should_mask", "req_should", "doc_id",
            )
        )
        qside = qside.unionByName(docbits)

    if scc is not None:
        sdoc = (
            scored_hits.select(
                "qid",
                "key",
                F.col("segment").cast("int").alias("segment"),
                "doc_id",
                "score",
            )
            .join(scc.select("qid", "key", "bit", "occur"), ["qid", "key"])
            .groupBy("segment", "doc_id", "qid")
            .agg(
                F.sum("bit").alias("bits"),
                F.sum(
                    F.when(
                        F.col("occur") != "must_not", F.col("score")
                    ).otherwise(F.lit(0.0))
                ).alias("w"),
            )
            .join(qmeta, "qid")
            .select(
                "segment",
                "qid",
                F.lit(None).cast("string").alias("term"),
                "w",
                "bits",
                "req_mask",
                "not_mask",
                "should_mask",
                "req_should",
                "doc_id",
            )
        )
        qside = qside.unionByName(sdoc)

    k1, b, avgdl, codec, kk = meta.k1, meta.b, meta.avgdl, meta.codec, k
    seg_schema = f"qid {qid_type}, doc_id long, score double"

    def score(pleft: pd.DataFrame, pright: pd.DataFrame) -> pd.DataFrame:
        if len(pright) == 0:
            return _emit_topk_frame([])
        decoded = (
            _decode_terms(pleft["term"], pleft["blocks"], codec, k1, b, avgdl)
            if len(pleft)
            else {}
        )
        qvals = pright["qid"]
        qid_list = list(pd.unique(qvals))
        qrow = {q: i for i, q in enumerate(qid_list)}
        rows_idx = qvals.map(qrow).to_numpy(np.int64)
        w_arr = pright["w"].to_numpy(np.float64)
        bits_arr = pright["bits"].to_numpy(np.int64).astype(np.uint64)
        term_mask = pright["term"].notna().to_numpy()
        tm_rows = pright[term_mask]
        t_ridx, t_w, t_bits = (
            rows_idx[term_mask], w_arr[term_mask], bits_arr[term_mask]
        )
        tmap_b = {
            t: (t_ridx[ix], t_w[ix], t_bits[ix])
            for t, ix in tm_rows.groupby("term", sort=False).indices.items()
        }
        fb: dict = {}
        if not term_mask.all():
            fr = ~term_mask
            f_ridx = rows_idx[fr]
            f_docs = pright["doc_id"].to_numpy(np.int64)[fr]
            f_bits = bits_arr[fr]
            f_w = w_arr[fr]
            order = np.argsort(f_ridx, kind="stable")
            f_ridx, f_docs, f_bits, f_w = (
                f_ridx[order], f_docs[order], f_bits[order], f_w[order]
            )
            bounds = np.flatnonzero(f_ridx[1:] != f_ridx[:-1]) + 1
            for s, e in zip(
                np.concatenate(([0], bounds)),
                np.concatenate((bounds, [len(f_ridx)])),
            ):
                fb[int(f_ridx[s])] = (f_docs[s:e], f_bits[s:e], f_w[s:e])
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
        return _emit_topk_frame(
            _bool_parts(decoded, qid_list, tmap_b, qmeta_b, kk, fb=fb)
        )

    seg_topk = (
        cand.groupBy("segment")
        .cogroup(qside.groupBy("segment"))
        .applyInPandas(score, schema=seg_schema)
    )
    return topk_per_group(seg_topk, k=k).select("qid", "doc_id", "score", "rank")
