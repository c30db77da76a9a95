"""Top-k BM25 query execution over the compressed inverted index.

Physical plan (the reference's chunk->score->local-topk->merge scan,
exact_search.py:80-132, mapped onto Spark — SURVEY.md §4):

  postings parquet  ──filter term ∈ query-terms──   [parquet row-group
                                                     pruning: files are
                                                     term-sorted]
    ──groupBy(segment)──applyInPandas──>  per-segment top-k per query
                                          (numpy-vectorized decode+score)
    ──topk_per_group(qid)──>              global top-k merge
                                          [one narrow shuffle: <=k rows
                                           per (query, segment)]

Exactness: every doc lives in exactly one segment, so per-segment top-k
followed by a global merge loses nothing — identical results to the
exhaustive DataFrame path (tested against it and the brute-force
oracle). Block-max metadata is carried for the WAND pruning stage
(operators/wand.py).

Scale: query terms are collected to the driver (query sets are small by
contract — BEIR query sets are 10^2..10^4 strings) and shipped as a
broadcast; the only big data touched is the posting rows for those
terms, pruned at the parquet scan.
"""

from __future__ import annotations

from typing import Iterable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sgpt_spark.functions.analyzer import resolve_py_analyzer, tokenize_py_ws
from sgpt_spark.functions.bm25 import idf_py
from sgpt_spark.functions.compress import decode_many
from sgpt_spark.operators.indexer import IndexMeta
from sgpt_spark.operators.topk import SCORE_DECIMALS, topk_per_group


def flatten_postings(postings: DataFrame, codec: str = "varint") -> DataFrame:
    """Compressed postings -> flat (term, doc_id, tf, doc_len) relation,
    decoded per Arrow batch with the batched column pass (varint or
    pfor per the index's IndexMeta.codec). The bridge between the
    compressed index and fully-relational query plans."""
    import pandas as pd

    def unpack(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            offs, d_all, tf_all, dl_all = decode_many(list(pdf["blocks"]), codec)
            counts = np.diff(offs)
            yield pd.DataFrame(
                {
                    "term": np.repeat(pdf["term"].to_numpy(), counts),
                    "doc_id": d_all,
                    "tf": tf_all.astype(np.int64),
                    "doc_len": dl_all.astype(np.int64),
                }
            )

    return postings.select("term", "blocks").mapInPandas(
        unpack, schema="term string, doc_id long, tf long, doc_len long"
    )


def search_index_join(
    spark: SparkSession,
    postings: DataFrame,
    meta: IndexMeta,
    queries: DataFrame | Iterable[tuple],
    k: int = 10,
    term_stats: DataFrame | None = None,
    exclude_self: bool = False,
    tokenizer=None,
    minimum_should_match: int = 0,
    operator: str = "or",
) -> DataFrame:
    """Fully join-based query path over the compressed index — for query
    sets too large to collect/broadcast (the driver-side
    ``collect_query_terms`` contract caps at ~10^4 queries; this path
    has NO driver-side step and scales to millions of queries).

    ``minimum_should_match`` / ``operator='and'`` ride the plan as a
    (qid, req) relation gating ``score_candidates`` (clause units per
    ``search.required_df``); at this path's scale the gate joins on
    qid without broadcasting, like the query probe itself.

    Plan: queries tokenize inside the plan (analyzer resolved from
    IndexMeta; indexes built with a custom ``py_tokenizer`` must pass
    its JVM column twin via ``tokenizer=``, mirroring ``search_index``'s
    ``tokenize=`` escape hatch), postings decode to the flat relation
    per Arrow batch, and the probe is a shuffle join on term ->
    groupBy(qid, doc_id) partial-sum -> per-qid top-k. Same BM25 values
    and tie-break as every other path (rank-identical, gated).
    """
    from sgpt_spark.functions.analyzer import resolve_jvm_analyzer
    from sgpt_spark.operators.search import query_terms, required_df, score_candidates
    from sgpt_spark.operators.stats import CorpusStats

    queries, qid_type = normalize_queries(queries)
    if not isinstance(queries, DataFrame):
        queries = spark.createDataFrame(queries, f"qid {qid_type}, query string")
    tokenizer = tokenizer or resolve_jvm_analyzer(meta.analyzer)
    qt = query_terms(queries, tokenizer=tokenizer)
    required = required_df(qt, minimum_should_match, operator)
    # prune BEFORE decoding: a semi-join against the distinct query
    # vocabulary keeps only candidate posting rows (AQE broadcasts the
    # term set while it's small; at millions of queries it degrades
    # gracefully to a shuffle semi-join bounded by |vocabulary|)
    cand = postings.join(qt.select("term").distinct(), "term", "left_semi")
    flat = flatten_postings(cand, codec=meta.codec)
    if term_stats is not None:
        dfs = term_stats
    else:
        dfs = postings.groupBy("term").agg(F.sum("df").alias("df"))
    scored = score_candidates(
        flat,
        qt,
        dfs,
        CorpusStats(n_docs=meta.n_docs, avgdl=meta.avgdl),
        k1=meta.k1,
        b=meta.b,
        broadcast_queries=False,
        required=required,
    )
    if exclude_self:
        from sgpt_spark.operators.search import _check_self_comparable

        _check_self_comparable(scored.schema["doc_id"], queries.schema["qid"])
        scored = scored.filter(F.col("doc_id") != F.col("qid"))
    return topk_per_group(scored, k=k).select("qid", "doc_id", "score", "rank")


def search_index_cogroup(
    spark: SparkSession,
    postings: DataFrame,
    meta: IndexMeta,
    queries: DataFrame | Iterable[tuple],
    k: int = 10,
    term_stats: DataFrame | None = None,
    exclude_self: bool = False,
    tokenizer=None,
    minimum_should_match: int = 0,
    operator: str = "or",
) -> DataFrame:
    """In-plan query path with COLLECT-PATH scoring: queries never touch
    the driver (``search_index_join``'s contract), but each segment is
    scored by the same vectorized dense-accumulator TAAT kernel the
    broadcast path uses (``_taat_parts``) instead of the relational
    join -> groupBy pipeline, which pays JVM row materialization per
    (query, matching doc) — measured ~4x slower per query than the
    numpy kernel on the bench corpus.

    Plan: queries tokenize in-plan -> join the (term, df) side table ->
    per-term BM25 weights (idf in whole-stage codegen) -> REPLICATE
    across segment ids (one broadcast crossJoin; |qt| x n_segments tiny
    rows). Candidate postings term-prune via left-semi against the query
    vocabulary, then a COGROUP on segment hands each task (segment's
    compressed blocks, segment's query slice) — decode once, score all
    queries, emit top-k per (query, segment), global heap-merge.

    Scale contract: per-task query data is |qt| rows — the same data the
    broadcast path ships per executor, but WITHOUT a driver collect, so
    query-set size is bounded by executor memory, not driver memory.
    The replication row count is |qt| x n_segments: for query sets so
    large that this outgrows the cluster (millions of queries over tens
    of thousands of segments), fall back to ``search_index_join``, whose
    shuffle volume is independent of segment count. The candidate
    posting blocks DO shuffle here (compressed, term-pruned) — unlike
    the broadcast path's in-place scan — which is the price of keeping
    the query set in the plan.
    """
    from sgpt_spark.functions.analyzer import resolve_jvm_analyzer
    from sgpt_spark.functions.bm25 import idf as idf_col
    from sgpt_spark.operators.search import query_terms, required_df

    queries, qid_type = normalize_queries(queries)
    if not isinstance(queries, DataFrame):
        queries = spark.createDataFrame(queries, f"qid {qid_type}, query string")
    if exclude_self and qid_type not in ("bigint", "int", "long", "smallint", "tinyint"):
        raise ValueError(
            f"exclude_self needs integer qids matching index doc ids; got qid type {qid_type}"
        )
    tok = tokenizer or resolve_jvm_analyzer(meta.analyzer)
    qt = query_terms(queries, tokenizer=tok)
    if term_stats is not None:
        dfs = term_stats
    else:
        dfs = postings.groupBy("term").agg(F.sum("df").alias("df"))
    qtw = qt.join(dfs, "term").select(
        "qid",
        "term",
        "qtf",
        (F.col("qtf") * idf_col(F.col("df"), meta.n_docs)).alias("w"),
    )
    # minimum_should_match / operator='and' ride the weight rows as an
    # in-plan per-qid requirement column (clause units per required_df:
    # operator='and' sums qtf over the ANALYZED terms pre-df-join, so a
    # corpus-absent term makes the query unmatchable — ES semantics)
    qreq = required_df(qt, minimum_should_match, operator)
    if qreq is not None:
        qtw = qtw.join(qreq, "qid")
    cand = postings.join(qt.select("term").distinct(), "term", "left_semi").select(
        "segment", "term", "blocks"
    )
    # replicate query weights only across CANDIDATE segments (segments
    # holding at least one query term) — a segment with no candidates
    # would cogroup to an empty frame anyway, so pruning is free
    # identity; the aliased cast mints a fresh attribute id (segs shares
    # lineage with cand and cogroup's analyzer rejects the ambiguous
    # self-join). Same form as the multifield twin below.
    segs = cand.select(F.col("segment").cast("int").alias("segment")).distinct()
    qseg = qtw.crossJoin(F.broadcast(segs))
    kk = k + 1 if exclude_self else k
    k1, b, avgdl, codec = meta.k1, meta.b, meta.avgdl, meta.codec
    seg_schema = f"qid {qid_type}, doc_id long, score double"

    def score(pleft: pd.DataFrame, pright: pd.DataFrame) -> pd.DataFrame:
        if len(pleft) == 0 or len(pright) == 0:
            return _emit_topk_frame([])
        decoded = _decode_terms(pleft["term"], pleft["blocks"], codec, k1, b, avgdl)
        if not decoded:
            return _emit_topk_frame([])
        qid_list, tmap, per_query = _query_maps(
            pright["qid"], pright["term"], pright["w"], pright["qtf"]
        )
        msm_b = (
            {q: int(r) for q, r in zip(pright["qid"], pright["req"])}
            if "req" in pright.columns
            else None
        )
        return _emit_topk_frame(
            _taat_parts(decoded, qid_list, tmap, per_query, kk, msm=msm_b)
        )

    seg_topk = (
        cand.groupBy("segment")
        .cogroup(qseg.groupBy("segment"))
        .applyInPandas(score, schema=seg_schema)
    )
    if exclude_self:
        seg_topk = seg_topk.filter(F.col("doc_id") != F.col("qid"))
    return topk_per_group(seg_topk, k=k).select("qid", "doc_id", "score", "rank")


def normalize_queries(
    queries: DataFrame | Iterable[tuple],
) -> tuple["DataFrame | list[tuple]", str]:
    """Materialize the query input and derive the OUTPUT qid schema type
    — the single source of truth for the dual DataFrame/iterable query
    contract (three hand-rolled copies of this subtle derivation is how
    the round-3 iterable-qid schema bug happened).

    DataFrame: passed through, qid type read from the schema verbatim.
    Iterable of (qid, text) tuples: materialized to a list ONCE (the
    input may be a one-shot generator), and the qid type follows the
    FIRST tuple's qid — ``bigint`` for Python ints / numpy integers,
    else ``string``. Declaring ``string`` unconditionally made
    ``exclude_self=True`` with integer-qid iterables emit int values
    under a string schema and crash in the Arrow conversion. Mixed qid
    types within one iterable are a contract violation (the first tuple
    wins; later rows fail loudly in Arrow rather than corrupting).
    """
    if isinstance(queries, DataFrame):
        return queries, queries.schema["qid"].dataType.simpleString()
    pairs = list(queries)
    if pairs and isinstance(pairs[0][0], (int, np.integer)):
        return pairs, "bigint"
    return pairs, "string"


def collect_query_terms(
    queries: DataFrame | Iterable[tuple], tokenize=tokenize_py_ws
) -> list[tuple]:
    """-> [(qid, term, qtf)] on the driver (query sets are small)."""
    if isinstance(queries, DataFrame):
        pairs = [(r["qid"], r["query"]) for r in queries.collect()]
    else:
        pairs = list(queries)
    out = []
    for qid, qtext in pairs:
        counts: dict[str, int] = {}
        for t in tokenize(qtext):
            counts[t] = counts.get(t, 0) + 1
        out.extend((qid, t, c) for t, c in counts.items())
    return out


def deterministic_topk(
    doc_ids: np.ndarray, scores_rounded: np.ndarray, k: int
) -> np.ndarray:
    """Indices of the top-k by (score desc, doc_id asc), tie-exact.

    Avoids a full sort when the candidate set is large: partition to the
    k-th score, keep every candidate at or above that threshold (so ties
    at the boundary are all still in play), then lexsort the survivors.
    """
    n = len(doc_ids)
    if n > k:
        thresh = -np.partition(-scores_rounded, k - 1)[k - 1]
        cand = np.flatnonzero(scores_rounded >= thresh)
    else:
        cand = np.arange(n)
    order = cand[np.lexsort((doc_ids[cand], -scores_rounded[cand]))]
    return order[:k]


def _emit_topk_frame(parts: list) -> pd.DataFrame:
    """[(qid, doc_ids int64[], scores float64[])] -> one (qid, doc_id,
    score) frame assembled from numpy blocks. At k=1000 a segment emits
    ~|queries| x k rows; building them via list.extend + .tolist()
    boxes every cell into a Python object (measured ~half the deep-k
    segment wall) — np.repeat/np.concatenate keeps the columns as two
    primitive arrays plus one qid array."""
    if not parts:
        return pd.DataFrame(
            {
                "qid": pd.Series([], dtype=object),
                "doc_id": pd.Series([], dtype="int64"),
                "score": pd.Series([], dtype="float64"),
            }
        )
    counts = np.fromiter((len(p[1]) for p in parts), dtype=np.int64, count=len(parts))
    qvals = [p[0] for p in parts]
    qkeys = np.asarray(qvals)
    if qkeys.dtype.kind not in "iufUS":
        qkeys = np.asarray(qvals, dtype=object)
    return pd.DataFrame(
        {
            "qid": np.repeat(qkeys, counts),
            "doc_id": np.concatenate([p[1] for p in parts]),
            "score": np.concatenate([p[2] for p in parts]),
        }
    )


QUERY_CHUNK = 128  # bounds the dense TAAT accumulator at span x chunk


def _decode_terms(terms, blocks, codec: str, k1: float, b: float, avgdl: float) -> dict:
    """One batched decode of every candidate term's blocks (compress.
    decode_many — a single varint/pfor pass per column over all rows),
    tf-norm as one vector op -> {term: (docs int64[], tfn float64[])}."""
    offs, d_all, tf_all, dl_all = decode_many(list(blocks), codec)
    tfn_all = tf_all.astype(np.float64) / (
        tf_all + k1 * (1.0 - b + b * dl_all.astype(np.float64) / avgdl)
    )
    decoded: dict = {}
    for i, term in enumerate(terms):
        s, e = int(offs[i]), int(offs[i + 1])
        if e > s:
            decoded[term] = (d_all[s:e], tfn_all[s:e])
    return decoded


def _taat_parts(
    decoded: dict,
    qid_list: list,
    tmap: dict,
    per_query: dict,
    kk: int,
    query_chunk: int = QUERY_CHUNK,
    msm: dict | None = None,
    after: dict | None = None,
) -> list:
    """Dense-accumulator TAAT over ONE segment's decoded postings ->
    [(qid, doc_ids, scores)] per-query top-kk. Shared by the broadcast
    path (search_index strategy='taat') and the cogroup path
    (search_index_cogroup). ``tmap``: term -> (query row indices into
    qid_list, weights, qtfs); ``per_query``: qid -> [(term, w, qtf)] —
    used only by the sparse-span fallback.

    ``msm``: qid -> required matched-CLAUSE count (ES
    minimum_should_match / operator=and). Lucene builds one clause per
    query-token occurrence, so a matched term contributes its qtf
    toward the bar; req <= 1 is a no-op (every scored doc matched at
    least one clause). Per-segment counting is globally correct because
    every doc lives in exactly one doc-partitioned segment.

    ``after``: qid -> (score, doc_id) keyset-pagination cursor (ES
    search_after): only candidates STRICTLY after the cursor in the
    total (score desc, doc_id asc) order survive — applied per segment
    BEFORE the top-k cut, so a segment whose entire top-k sits on page 1
    still surfaces its page-2 rows. The cursor score is compared in the
    engine's rounded-score space (the cursor comes from a previous
    page's output, which is rounded)."""
    req_arr = None
    if msm is not None and any(int(msm.get(q, 0)) > 1 for q in qid_list):
        req_arr = np.array([int(msm.get(q, 0)) for q in qid_list], dtype=np.int32)
    aft_s = aft_d = None
    if after:
        aft_s = np.array(
            [after.get(q, (np.inf, 0))[0] for q in qid_list], dtype=np.float64
        )
        aft_d = np.array(
            [after.get(q, (0.0, -(1 << 62)))[1] for q in qid_list], dtype=np.int64
        )

    def _after_mask(qi: int, ids: np.ndarray, scores: np.ndarray):
        """True where (score, id) sorts strictly after query qi's cursor."""
        if aft_s is None or np.isinf(aft_s[qi]):
            return None
        return (scores < aft_s[qi]) | ((scores == aft_s[qi]) & (ids > aft_d[qi]))
    lo_doc = min(int(d[0]) for d, _ in decoded.values())
    hi_doc = max(int(d[-1]) for d, _ in decoded.values())
    span = hi_doc - lo_doc + 1
    total_postings = sum(len(d) for d, _ in decoded.values())
    parts: list = []
    if span > max(5_000_000, 20 * total_postings):
        # pathologically sparse doc-id space (not produced by our
        # builders, but possible with external ids): dense accumulators
        # would waste memory — per-query concatenate+bincount instead.
        qrow = (
            {q: i for i, q in enumerate(qid_list)}
            if (req_arr is not None or aft_s is not None)
            else None
        )
        for qid, tws in per_query.items():
            present = [(t, w, qtf) for t, w, qtf in tws if t in decoded]
            if not present:
                continue
            docs_cat = np.concatenate([decoded[t][0] for t, _, _ in present])
            w_cat = np.concatenate([decoded[t][1] * w for t, w, _ in present])
            uniq, inv = np.unique(docs_cat, return_inverse=True)
            scores = np.round(np.bincount(inv, weights=w_cat), SCORE_DECIMALS)
            if req_arr is not None and req_arr[qrow[qid]] > 1:
                # each matched term contributes its qtf clauses
                m_cat = np.concatenate(
                    [np.full(len(decoded[t][0]), q, dtype=np.float64)
                     for t, _, q in present]
                )
                keep = np.bincount(inv, weights=m_cat) >= req_arr[qrow[qid]]
                uniq, scores = uniq[keep], scores[keep]
                if len(uniq) == 0:
                    continue
            if aft_s is not None:
                am = _after_mask(qrow[qid], uniq, scores)
                if am is not None:
                    uniq, scores = uniq[am], scores[am]
                    if len(uniq) == 0:
                        continue
            order = deterministic_topk(uniq, scores, kk)
            parts.append((qid, uniq[order], scores[order]))
        return parts
    nq = len(qid_list)
    for clo in range(0, nq, query_chunk):
        chi = min(clo + query_chunk, nq)
        acc = np.zeros((chi - clo, span), dtype=np.float64)
        macc = (
            np.zeros((chi - clo, span), dtype=np.int16)
            if req_arr is not None and (req_arr[clo:chi] > 1).any()
            else None
        )
        touched = np.zeros(chi - clo, dtype=bool)
        for term, (docs, tfn) in decoded.items():
            rows_ws = tmap.get(term)
            if rows_ws is None:
                continue
            rows, ws, qtfs = rows_ws
            sel = (rows >= clo) & (rows < chi)
            if not sel.any():
                continue
            r_local = rows[sel] - clo
            touched[r_local] = True
            pos = docs - lo_doc
            acc[np.ix_(r_local, pos)] += np.outer(ws[sel], tfn)
            if macc is not None:
                # a matched term satisfies all qtf of its duplicate
                # clauses (Lucene one-clause-per-token-occurrence)
                macc[np.ix_(r_local, pos)] += qtfs[sel][:, None]
        for r in np.flatnonzero(touched):
            row = acc[r]
            nz = np.flatnonzero(row)
            if macc is not None and req_arr[clo + r] > 1:
                nz = nz[macc[r, nz] >= req_arr[clo + r]]
            if len(nz) == 0:
                continue
            scores = np.round(row[nz], SCORE_DECIMALS)
            ids = (nz + lo_doc).astype(np.int64)
            if aft_s is not None:
                am = _after_mask(clo + r, ids, scores)
                if am is not None:
                    ids, scores = ids[am], scores[am]
                    if len(ids) == 0:
                        continue
            order = deterministic_topk(ids, scores, kk)
            parts.append((qid_list[clo + r], ids[order], scores[order]))
    return parts


def _decode_terms_mf(
    fields_col, terms_col, blocks_col, codec: str, k1: float, b: float,
    avgdl_by_field: dict,
) -> dict:
    """Multifield twin of ``_decode_terms``: one batched decode, tf-norm
    with each row's FIELD avgdl -> {field: {term: (docs, tfn)}}."""
    offs, d_all, tf_all, dl_all = decode_many(list(blocks_col), codec)
    decoded: dict = {}
    for i, (fld, term) in enumerate(zip(fields_col, terms_col)):
        s, e = int(offs[i]), int(offs[i + 1])
        if e == s:
            continue
        tf = tf_all[s:e].astype(np.float64)
        dl = dl_all[s:e].astype(np.float64)
        tfn = tf / (tf + k1 * (1.0 - b + b * dl / avgdl_by_field[fld]))
        decoded.setdefault(fld, {})[term] = (d_all[s:e], tfn)
    return decoded


def _mf_parts(
    decoded: dict, per_query_mf: dict, tie: float, kk: int, msm: dict | None = None
) -> list:
    """ES best_fields dis-max over ONE co-segmented segment's decoded
    per-field postings -> [(qid, doc_ids, scores)]. ``per_query_mf``:
    qid -> {field: [(term, w, qtf)]}. Shared by the collect path
    (search_multifield_index) and the cogroup path.

    ``msm``: qid -> required matched-CLAUSE count, applied PER FIELD (ES
    multi_match builds one match clause per field, each carrying the
    operator/minimum_should_match — a doc whose matches are split across
    fields, all below the bar, matches nothing; a matched term counts
    qtf clauses, Lucene one-clause-per-token-occurrence)."""
    parts: list = []
    for qid, by_field in per_query_mf.items():
        req = int(msm.get(qid, 0)) if msm is not None else 0
        fscores = []  # [(ids, scores)] per field with any match
        for fld, tws in by_field.items():
            dec = decoded.get(fld)
            if not dec:
                continue
            present = [(t, w, qtf) for t, w, qtf in tws if t in dec]
            if not present:
                continue
            docs_cat = np.concatenate([dec[t][0] for t, _, _ in present])
            w_cat = np.concatenate([dec[t][1] * w for t, w, _ in present])
            ids_f, inv = np.unique(docs_cat, return_inverse=True)
            sc_f = np.bincount(inv, weights=w_cat)
            if req > 1:
                m_cat = np.concatenate(
                    [np.full(len(dec[t][0]), q, dtype=np.float64)
                     for t, _, q in present]
                )
                keep = np.bincount(inv, weights=m_cat) >= req
                ids_f, sc_f = ids_f[keep], sc_f[keep]
                if len(ids_f) == 0:
                    continue
            fscores.append((ids_f, sc_f))
        if not fscores:
            continue
        if len(fscores) == 1:
            all_ids, combined = fscores[0][0], fscores[0][1]
        else:
            all_ids = fscores[0][0]
            for ids_f, _ in fscores[1:]:
                all_ids = np.union1d(all_ids, ids_f)
            mat = np.zeros((len(fscores), len(all_ids)))
            for r, (ids_f, sc) in enumerate(fscores):
                mat[r, np.searchsorted(all_ids, ids_f)] = sc
            mx = mat.max(axis=0)
            combined = mx + tie * (mat.sum(axis=0) - mx)
        scores = np.round(combined, SCORE_DECIMALS)
        order = deterministic_topk(all_ids, scores, kk)
        parts.append((qid, all_ids[order].astype(np.int64), scores[order]))
    return parts


def _query_maps(qids, terms, ws, qtfs) -> tuple[list, dict, dict]:
    """Per-segment query structures from parallel columns (qid, term,
    weight, qtf) -> (qid_list, tmap, per_query) as ``_taat_parts``
    wants: tmap term -> (query rows, weights, qtfs); per_query qid ->
    [(term, w, qtf)]. qtf rides along so msm can count matched CLAUSES
    (a matched term satisfies qtf duplicate clauses)."""
    per_query: dict = {}
    for qid, t, w, qtf in zip(qids, terms, ws, qtfs):
        per_query.setdefault(qid, []).append((t, float(w), int(qtf)))
    qid_list = sorted(per_query)
    qrow = {q: i for i, q in enumerate(qid_list)}
    tmap: dict = {}
    for qid, t, w, qtf in zip(qids, terms, ws, qtfs):
        rows_ws = tmap.setdefault(t, ([], [], []))
        rows_ws[0].append(qrow[qid])
        rows_ws[1].append(float(w))
        rows_ws[2].append(int(qtf))
    tmap = {
        t: (np.asarray(r), np.asarray(w), np.asarray(q, dtype=np.int16))
        for t, (r, w, q) in tmap.items()
    }
    return qid_list, tmap, per_query


def _msm_map(
    qterms: list[tuple], minimum_should_match: int, operator: str
) -> dict | None:
    """-> qid -> required matched-CLAUSE count, or None when inactive —
    the collect-path twin of ``search.required_df`` (keep their clause
    units in agreement).

    ES semantics: Lucene's match query builds one clause per analyzed
    query-token OCCURRENCE, and a matched term satisfies all qtf of its
    duplicate clauses. ``operator='and'`` requires every clause —
    sum(qtf) over the ANALYZED terms, so a corpus-absent term makes the
    query unmatchable; ``minimum_should_match=N`` requires at least N
    clauses. The two are alternative spellings — combining is refused."""
    from sgpt_spark.operators.search import _validate_msm_args

    _validate_msm_args(minimum_should_match, operator)
    if operator == "and":
        counts: dict = {}
        for qid, _t, qtf in qterms:  # qterms is distinct per (qid, term)
            counts[qid] = counts.get(qid, 0) + int(qtf)
        return counts
    if minimum_should_match > 1:
        return {qid: int(minimum_should_match) for qid in {q for q, _, _ in qterms}}
    return None  # 0/1 never filters: every scored doc matched >= 1 clause


def search_index(
    spark: SparkSession,
    postings: DataFrame,
    meta: IndexMeta,
    queries: DataFrame,
    k: int = 10,
    strategy: str = "taat",
    use_wand: bool | None = None,
    exclude_self: bool = False,
    term_stats: DataFrame | None = None,
    tokenize=None,
    minimum_should_match: int = 0,
    operator: str = "or",
    after: dict | None = None,
) -> DataFrame:
    """-> RESULTS (qid, doc_id, score, rank), rank-identical to the
    exhaustive path and the brute-force oracle under every strategy.

    ``after``: ES ``search_after`` keyset pagination — {qid: (score,
    doc_id)} cursors, usually a previous page's rank-k rows. Only hits
    strictly after the cursor in the total (score desc, doc_id asc)
    order return, re-ranked 1..k, applied per segment BEFORE the top-k
    cut; because the sort is total, page N+1 equals global ranks
    N*k+1..(N+1)*k exactly (the oracle identity). A qid without a
    cursor gets page 1. Supported on strategy='taat' (the batch
    workhorse); WAND's pruning threshold assumes an empty heap at
    theta=0 and the exhaustive twin takes the declarative filter in
    ``search.bm25_search`` instead.

    ``minimum_should_match`` / ``operator='and'`` (ES match-query knobs):
    a doc enters the ranking only if it matches at least N / all of the
    query's match clauses (one clause per analyzed token occurrence —
    a matched term counts qtf clauses, see ``search.required_df``).
    Supported on the 'taat' and 'exhaustive' strategies ('wand'
    refuses: its block-max pruning bounds assume pure-OR scoring).

    ``exclude_self`` drops ``doc_id == qid`` hits (the reference's
    self-match filter, exact_search.py:117-119). Exactness is preserved
    the same way the reference does it: each segment returns k+1
    candidates (a segment contains at most one self-match, since a doc
    lives in exactly one segment), the self rows are filtered, and the
    global merge cuts back to k.

    strategy:
      'taat'       vectorized term-at-a-time with dense per-query-chunk
                   accumulators — decode each term ONCE per segment, one
                   numpy scatter-add per (term, query-chunk). The batch
                   workhorse (BEIR-style query sets).
      'wand'       block-max WAND/MaxScore — skips blocks; wins for few
                   queries / deep postings (interactive path).
      'exhaustive' per-query concatenate+bincount baseline (kept as the
                   differential-testing twin).
    """
    if use_wand is not None:  # back-compat shim
        strategy = "wand" if use_wand else "exhaustive"
    if strategy not in ("taat", "wand", "exhaustive"):
        raise ValueError(f"unknown strategy {strategy!r}: use taat|wand|exhaustive")
    queries, qid_type = normalize_queries(queries)
    if exclude_self and qid_type not in ("bigint", "int", "long", "smallint", "tinyint"):
        # comparing string qids against int64 index doc ids would null
        # out and silently drop every row — demand matching ids
        # (external-id query sets: filter after mapping ids back, see
        # plans/beir.run_beir_bm25)
        raise ValueError(
            f"exclude_self needs integer qids matching index doc ids; got qid type {qid_type}"
        )
    # analyze queries with the SAME analyzer the index was built with
    # (custom-analyzer indexes must pass tokenize= explicitly — the
    # resolver refuses to guess, see functions/analyzer.py)
    qterms = collect_query_terms(
        queries, tokenize=tokenize or resolve_py_analyzer(meta.analyzer)
    )
    msm = _msm_map(qterms, minimum_should_match, operator)
    if msm is not None and strategy == "wand":
        raise ValueError(
            "minimum_should_match/operator='and' need strategy 'taat' or "
            "'exhaustive' — WAND's block-max pruning bounds assume pure-OR scoring"
        )
    if after is not None and strategy != "taat":
        raise ValueError(
            "after= (search_after pagination) needs strategy 'taat' — WAND "
            "prunes against an empty-heap threshold and would skip page-2 "
            "blocks; the exhaustive twin is search.bm25_search(after=)"
        )
    seg_schema = f"qid {qid_type}, doc_id long, score double"
    empty = spark.createDataFrame([], seg_schema + ", rank int")
    if not qterms:
        return empty

    terms = sorted({t for _, t, _ in qterms})
    cand = postings.filter(F.col("term").isin(terms))

    # Global df per query term — from the build-time (term, df) side
    # table when available (one pruned scan of a tiny term-sorted
    # relation, the "global stats" ES precomputes), else a fallback agg
    # over the candidate postings.
    if isinstance(term_stats, dict):
        # pre-collected {term: global df} — the long-running-service
        # shape (ES keeps global term stats resident the same way):
        # skips one Spark job per query batch. Caller contract: the
        # dict is the FULL side table for this index (indexer.
        # read_term_stats_dict), refreshed after appends/compaction.
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

    # qid -> [(term, weight = qtf * idf, qtf)]
    per_query: dict = {}
    for qid, t, qtf in qterms:
        if t in idf:  # query terms absent from the corpus contribute 0
            per_query.setdefault(qid, []).append((t, qtf * idf[t], int(qtf)))
    if not per_query:
        return empty
    b_queries = spark.sparkContext.broadcast(per_query)
    # msm is query-sized like per_query — ship it once per executor,
    # not serialized into every task closure
    b_msm = spark.sparkContext.broadcast(msm)
    # with exclude_self each segment hands back one spare candidate so
    # dropping the (unique) self row cannot starve the global top-k
    k_eff = k + 1 if exclude_self else k
    k1, b, avgdl, kk = meta.k1, meta.b, meta.avgdl, k_eff
    codec = meta.codec

    # inverted query map for the TAAT scatter: term -> (query rows, weights)
    qid_list = sorted(per_query)
    qrow = {q: i for i, q in enumerate(qid_list)}
    term_to_q: dict = {}
    for qid, tws in per_query.items():
        for t, w, qtf in tws:
            term_to_q.setdefault(t, ([], [], []))
            term_to_q[t][0].append(qrow[qid])
            term_to_q[t][1].append(w)
            term_to_q[t][2].append(qtf)
    b_taat = spark.sparkContext.broadcast(
        (
            qid_list,
            {
                t: (np.asarray(r), np.asarray(w), np.asarray(q, dtype=np.int16))
                for t, (r, w, q) in term_to_q.items()
            },
            msm,
            after,
        )
    )
    def score_segment_taat(pdf: pd.DataFrame) -> pd.DataFrame:
        qids_b, tmap, msm_b, after_b = b_taat.value
        decoded = _decode_terms(pdf["term"], pdf["blocks"], codec, k1, b, avgdl)
        if not decoded:
            return
        yield _emit_topk_frame(
            _taat_parts(
                decoded, qids_b, tmap, b_queries.value, kk, msm=msm_b,
                after=after_b,
            )
        )

    def score_segment(pdf: pd.DataFrame) -> pd.DataFrame:
        parts = []
        if strategy == "wand":
            from sgpt_spark.operators.wand import TermPostings, maxscore_topk

            tps = {
                term: TermPostings(blocks, k1, b, avgdl, codec=codec)
                for term, blocks in zip(pdf["term"], pdf["blocks"])
            }
            for qid, tws in b_queries.value.items():
                wt = [(w, tps[t]) for t, w, _ in tws if t in tps]
                if not wt:
                    continue
                uniq, scores_raw = maxscore_topk(wt, kk)
                if len(uniq) == 0:
                    continue
                scores = np.round(scores_raw, SCORE_DECIMALS)
                order = deterministic_topk(uniq, scores, kk)
                parts.append((qid, uniq[order], scores[order]))
        else:
            offs, d_all, tf_all, dl_all = decode_many(list(pdf["blocks"]), codec)
            tfn_all = tf_all.astype(np.float64) / (
                tf_all + k1 * (1.0 - b + b * dl_all.astype(np.float64) / avgdl)
            )
            decoded: dict[str, tuple[np.ndarray, np.ndarray]] = {}
            for i, term in enumerate(pdf["term"]):
                s, e = int(offs[i]), int(offs[i + 1])
                if e > s:
                    decoded[term] = (d_all[s:e], tfn_all[s:e])
            msm_b = b_msm.value
            for qid, tws in b_queries.value.items():
                present = [(t, w, qtf) for t, w, qtf in tws if t in decoded]
                if not present:
                    continue
                docs_cat = np.concatenate([decoded[t][0] for t, _, _ in present])
                w_cat = np.concatenate([decoded[t][1] * w for t, w, _ in present])
                uniq, inv = np.unique(docs_cat, return_inverse=True)
                scores = np.round(np.bincount(inv, weights=w_cat), SCORE_DECIMALS)
                req = int(msm_b.get(qid, 0)) if msm_b is not None else 0
                if req > 1:
                    # each matched term contributes its qtf clauses
                    m_cat = np.concatenate(
                        [np.full(len(decoded[t][0]), q, dtype=np.float64)
                         for t, _, q in present]
                    )
                    keep = np.bincount(inv, weights=m_cat) >= req
                    uniq, scores = uniq[keep], scores[keep]
                    if len(uniq) == 0:
                        continue
                order = deterministic_topk(uniq, scores, kk)
                parts.append((qid, uniq[order], scores[order]))
        return _emit_topk_frame(parts)

    if strategy == "taat":
        # mapInPandas over segment-partitioned postings: build_postings
        # emits one segment per partition, and the parquet reader keeps
        # segment files whole at these sizes; applyInPandas(groupBy) is
        # the safe general path used for the other strategies.
        def taat_wrapper(batches):
            chunks = list(batches)
            if not chunks:
                return
            pdf = pd.concat(chunks, ignore_index=True) if len(chunks) > 1 else chunks[0]
            for seg in pdf["segment"].unique():
                yield from score_segment_taat(pdf[pdf["segment"] == seg])

        seg_topk = cand.repartition("segment").mapInPandas(taat_wrapper, schema=seg_schema)
    else:
        seg_topk = cand.groupBy("segment").applyInPandas(
            lambda _key, pdf: score_segment(pdf), schema=seg_schema
        )
    if exclude_self:
        seg_topk = seg_topk.filter(F.col("doc_id") != F.col("qid"))
    return topk_per_group(seg_topk, k=k).select("qid", "doc_id", "score", "rank")


def _load_multifield(
    spark: SparkSession, path: str, fields: tuple[str, ...] | None
) -> tuple[tuple[str, ...], dict, str]:
    """Load every field index of a ``build_multifield_index`` layout and
    validate the invariants both multifield query paths rely on: one
    shared analyzer AND shared scoring/layout params (k1, b,
    segment_size) — the combiner takes k1/b from the first field, so a
    silent disagreement would mis-score every other field (round-3
    ADVICE). -> (fields, {field: (postings, meta, term_stats)}, analyzer)."""
    import json as _json

    from sgpt_spark.operators.indexer import read_index, read_term_stats

    if fields is None:
        with open(f"{path}/fields.json") as fp:
            fields = tuple(_json.load(fp)["fields"])
    idx = {}
    first_meta = None
    for f in fields:
        postings_f, meta_f = read_index(spark, f"{path}/{f}_index")
        if first_meta is None:
            first_meta = meta_f
        else:
            for attr in ("analyzer", "k1", "b", "segment_size", "codec", "block_size"):
                if getattr(meta_f, attr) != getattr(first_meta, attr):
                    raise ValueError(
                        f"field indexes disagree on {attr}: "
                        f"{getattr(first_meta, attr)!r} ({fields[0]}) vs "
                        f"{getattr(meta_f, attr)!r} ({f})"
                    )
        idx[f] = (postings_f, meta_f, read_term_stats(spark, f"{path}/{f}_index"))
    return tuple(fields), idx, first_meta.analyzer


def search_multifield_index(
    spark: SparkSession,
    path: str,
    queries: DataFrame | Iterable[tuple],
    k: int = 10,
    tie_breaker: float = 0.5,
    fields: tuple[str, ...] | None = None,
    tokenize=None,
    exclude_self: bool = False,
    boosts: dict[str, float] | None = None,
    minimum_should_match: int = 0,
    operator: str = "or",
) -> DataFrame:
    """Multi-field BM25 top-k THROUGH the compressed per-field indexes
    built by ``indexer.build_multifield_index`` — the index-backed twin
    of ``search.bm25_multifield_search`` (ES ``multi_match``
    best_fields + tie_breaker; value-identical, tested + oracle-gated).
    Query sets are collected to the driver (the ``search_index``
    contract — query sets are small relative to the corpus); for query
    sets that must stay in the plan use
    ``search_multifield_index_cogroup`` (same kernel, no collect) or
    ``search_multifield_index_join`` (no per-segment query replication
    either — the extreme-scale fallback).

    Plan: each field's candidate postings (term-pruned parquet scan) are
    unioned with a field tag and grouped by segment — the builder's
    co-segmentation invariant means segment s holds the SAME doc range
    in every field index, so one task sees all of a doc's per-field
    postings. Inside the task: decode once, per-field exhaustive
    bincount scores with that field's avgdl/idf, dis-max combine
    (max + tie_breaker * (sum - max)), per-segment top-k. Then the
    usual global merge. Shuffle volume: <= k rows per (query, segment)
    — identical to the single-field index path; nothing ever shuffles
    postings.

    ``boosts``: optional per-field multipliers (ES ``"title^2"``), folded
    into the per-term weights w_{f,t} so the kernel is untouched.
    """
    from sgpt_spark.operators.search import normalize_boosts

    fields, idx, analyzer = _load_multifield(spark, path, fields)
    boost = normalize_boosts(fields, boosts)

    queries, qid_type = normalize_queries(queries)
    if exclude_self and qid_type not in ("bigint", "int", "long", "smallint", "tinyint"):
        raise ValueError(
            f"exclude_self needs integer qids matching index doc ids; got qid type {qid_type}"
        )
    qterms = collect_query_terms(
        queries, tokenize=tokenize or resolve_py_analyzer(analyzer)
    )
    # per-field match-clause bar (one shared analyzer -> one analyzed
    # term count per query serves every field; see _mf_parts)
    msm = _msm_map(qterms, minimum_should_match, operator)
    seg_schema = f"qid {qid_type}, doc_id long, score double"
    empty = spark.createDataFrame([], seg_schema + ", rank int")
    if not qterms:
        return empty
    terms = sorted({t for _, t, _ in qterms})

    # per-field query weights: w_{f,t} = qtf * idf_f(t) with the FIELD's
    # df and docCount (each field is an independent BM25 index)
    per_query: dict = {}  # qid -> {field: [(term, w)]}
    cand = None
    avgdls = {}
    for f in fields:
        postings_f, meta_f, tstats_f = idx[f]
        avgdls[f] = meta_f.avgdl
        if tstats_f is not None:
            gdf = {
                r["term"]: int(r["df"])
                for r in tstats_f.filter(F.col("term").isin(terms)).collect()
            }
        else:
            gdf = {
                r["term"]: int(r["df"])
                for r in postings_f.filter(F.col("term").isin(terms))
                .groupBy("term").agg(F.sum("df").alias("df")).collect()
            }
        idf_f = {t: idf_py(d, meta_f.n_docs) for t, d in gdf.items()}
        for qid, t, qtf in qterms:
            if t in idf_f:
                per_query.setdefault(qid, {}).setdefault(f, []).append(
                    (t, boost[f] * qtf * idf_f[t], int(qtf))
                )
        part = postings_f.filter(F.col("term").isin(terms)).withColumn(
            "field", F.lit(f)
        )
        cand = part if cand is None else cand.unionByName(part)
    if not per_query:
        return empty
    b_queries = spark.sparkContext.broadcast(per_query)
    # query-sized like per_query: broadcast, don't pickle per task
    b_msm = spark.sparkContext.broadcast(msm)
    k1, b = idx[fields[0]][1].k1, idx[fields[0]][1].b
    b_avgdl = spark.sparkContext.broadcast(avgdls)
    codec = idx[fields[0]][1].codec
    tie = float(tie_breaker)
    # same spare-candidate trick as search_index: a doc lives in exactly
    # one (co-segmented) segment, so one extra per-segment candidate
    # covers the dropped self row
    kk = k + 1 if exclude_self else k

    def score_segment_mf(pdf: pd.DataFrame) -> pd.DataFrame:
        decoded = _decode_terms_mf(
            pdf["field"], pdf["term"], pdf["blocks"], codec, k1, b, b_avgdl.value
        )
        return _emit_topk_frame(
            _mf_parts(decoded, b_queries.value, tie, kk, msm=b_msm.value)
        )

    seg_topk = cand.groupBy("segment").applyInPandas(
        lambda _key, pdf: score_segment_mf(pdf), schema=seg_schema
    )
    if exclude_self:
        seg_topk = seg_topk.filter(F.col("doc_id") != F.col("qid"))
    return topk_per_group(seg_topk, k=k).select("qid", "doc_id", "score", "rank")


def search_multifield_index_join(
    spark: SparkSession,
    path: str,
    queries: DataFrame | Iterable[tuple],
    k: int = 10,
    tie_breaker: float = 0.5,
    fields: tuple[str, ...] | None = None,
    tokenizer=None,
    exclude_self: bool = False,
    boosts: dict[str, float] | None = None,
    minimum_should_match: int = 0,
    operator: str = "or",
) -> DataFrame:
    """Fully join-based multifield BM25 top-k through the per-field
    compressed indexes — the scale-out twin of
    ``search_multifield_index``, with NO driver-side query collect
    (``search_index_join``'s contract: millions of queries stay in the
    plan; the round-3 verdict's last collect-only query path).

    Plan, per field f (ES ``multi_match`` best_fields semantics — each
    field an independent BM25 index):
      queries ──tokenize in-plan──> (qid, term, qtf)
      postings_f ──left-semi join on the distinct query vocabulary──>
        candidate rows only (parquet term pruning + AQE broadcast while
        the vocabulary is small) ──flatten (Arrow-batched decode)──>
      ──shuffle join on term x query terms──groupBy(qid, doc_id)──>
        per-field BM25 score with THAT field's N/avgdl/df
    then the per-field score relations union with a field tag and one
    groupBy(qid, doc_id) computes the dis-max combine
    max + tie_breaker x (sum - max) (tie_breaker=0 pure dis-max, 1 plain
    sum), followed by the usual global top-k. Value-identical to the
    collect path and the exhaustive operator (pytest equality on both
    analyzers + tie_breaker variants; oracle-gated as
    bm25_multifield_join_top10).

    ``tokenizer=`` is the custom-analyzer escape hatch (a JVM column
    tokenizer matching the build analyzer), mirroring
    ``search_index_join``.
    """
    from sgpt_spark.functions.analyzer import resolve_jvm_analyzer
    from sgpt_spark.operators.search import (
        normalize_boosts,
        query_terms,
        required_df,
        score_candidates,
    )
    from sgpt_spark.operators.stats import CorpusStats

    fields, idx, analyzer = _load_multifield(spark, path, fields)
    boost = normalize_boosts(fields, boosts)
    queries, qid_type = normalize_queries(queries)
    if not isinstance(queries, DataFrame):
        queries = spark.createDataFrame(queries, f"qid {qid_type}, query string")
    if exclude_self and qid_type not in ("bigint", "int", "long", "smallint", "tinyint"):
        # string qids vs int64 index doc ids null out and silently drop
        # every row — same contract as search_index
        raise ValueError(
            f"exclude_self needs integer qids matching index doc ids; got qid type {qid_type}"
        )
    tok = tokenizer or resolve_jvm_analyzer(analyzer)
    qt = query_terms(queries, tokenizer=tok)
    qvocab = qt.select("term").distinct()
    k1, b = idx[fields[0]][1].k1, idx[fields[0]][1].b
    # per-field match-clause bar (ES multi_match operator/msm semantics):
    # the same (qid, req) relation gates every field's score_candidates
    required = required_df(qt, minimum_should_match, operator)

    # Per-field aggregate FIRST, then combine the (much smaller)
    # doc-level relations. The one-groupBy conditional-sum variant
    # (dismax_combine) was tried in round 5 and measured ~20% SLOWER on
    # the 200-query bench shape (interleaved pinned A/B, tools/
    # ab_bench.py): the per-field aggregation collapses term-level rows
    # while still colocated with the probe join's output, so the final
    # combine shuffle carries only doc-level rows per field.
    per_field = None
    for f in fields:
        postings_f, meta_f, tstats_f = idx[f]
        cand = postings_f.join(qvocab, "term", "left_semi")
        flat = flatten_postings(cand, codec=meta_f.codec)
        if tstats_f is not None:
            dfs = tstats_f
        else:
            dfs = postings_f.groupBy("term").agg(F.sum("df").alias("df"))
        scored = score_candidates(
            flat,
            qt,
            dfs,
            CorpusStats(n_docs=meta_f.n_docs, avgdl=meta_f.avgdl),
            k1=k1,
            b=b,
            broadcast_queries=False,
            required=required,
        )
        if boost[f] != 1.0:
            # per-field score is a sum of per-term weights, so the boost
            # distributes over the aggregate — one scalar multiply here
            # equals multiplying every w_{f,t}
            scored = scored.withColumn("score", F.col("score") * F.lit(boost[f]))
        per_field = scored if per_field is None else per_field.unionByName(scored)

    combined = per_field.groupBy("qid", "doc_id").agg(
        (
            F.max("score")
            + F.lit(float(tie_breaker)) * (F.sum("score") - F.max("score"))
        ).alias("score")
    )
    if exclude_self:
        combined = combined.filter(F.col("doc_id") != F.col("qid"))
    return topk_per_group(combined, k=k).select("qid", "doc_id", "score", "rank")


def search_multifield_index_cogroup(
    spark: SparkSession,
    path: str,
    queries: DataFrame | Iterable[tuple],
    k: int = 10,
    tie_breaker: float = 0.5,
    fields: tuple[str, ...] | None = None,
    tokenizer=None,
    exclude_self: bool = False,
    boosts: dict[str, float] | None = None,
    minimum_should_match: int = 0,
    operator: str = "or",
) -> DataFrame:
    """Multifield twin of ``search_index_cogroup``: queries stay in the
    plan (no driver collect) but each co-segmented segment is scored by
    the same numpy dis-max kernel the collect path uses (``_mf_parts``)
    instead of the per-field relational join pipeline — measured ~6x
    faster than ``search_multifield_index_join`` on the bench shape,
    and at parity with the collect path.

    Plan: query terms join each field's (term, df) side table -> field-
    tagged per-term weights (idf_f in codegen) -> replicate across the
    candidate segment ids (broadcast crossJoin). Candidate postings of
    every field union with a field tag (term-pruned scans; the
    builder's co-segmentation invariant means segment s covers the same
    doc range in every field), cogroup on segment, decode once, dis-max
    per query, top-k per (query, segment), global merge. Same scale
    contract and fallback guidance as ``search_index_cogroup``.
    """
    from sgpt_spark.functions.analyzer import resolve_jvm_analyzer
    from sgpt_spark.functions.bm25 import idf as idf_col
    from sgpt_spark.operators.search import (
        normalize_boosts,
        query_terms,
        required_df,
    )

    fields, idx, analyzer = _load_multifield(spark, path, fields)
    boost = normalize_boosts(fields, boosts)
    queries, qid_type = normalize_queries(queries)
    if not isinstance(queries, DataFrame):
        queries = spark.createDataFrame(queries, f"qid {qid_type}, query string")
    if exclude_self and qid_type not in ("bigint", "int", "long", "smallint", "tinyint"):
        raise ValueError(
            f"exclude_self needs integer qids matching index doc ids; got qid type {qid_type}"
        )
    tok = tokenizer or resolve_jvm_analyzer(analyzer)
    qt = query_terms(queries, tokenizer=tok)
    qvocab = qt.select("term").distinct()
    k1, b = idx[fields[0]][1].k1, idx[fields[0]][1].b
    codec = idx[fields[0]][1].codec
    avgdls = {f: idx[f][1].avgdl for f in fields}

    qunion = None
    cand = None
    for f in fields:
        postings_f, meta_f, tstats_f = idx[f]
        if tstats_f is not None:
            dfs = tstats_f
        else:
            dfs = postings_f.groupBy("term").agg(F.sum("df").alias("df"))
        w_col = F.col("qtf") * idf_col(F.col("df"), meta_f.n_docs)
        if boost[f] != 1.0:
            # skip the no-op multiply so the default plan is unchanged
            # (same guard as the join path / exhaustive boost_col)
            w_col = F.lit(boost[f]) * w_col
        qtw_f = qt.join(dfs, "term").select(
            "qid",
            F.lit(f).alias("field"),
            "term",
            "qtf",
            w_col.alias("w"),
        )
        qunion = qtw_f if qunion is None else qunion.unionByName(qtw_f)
        part = postings_f.join(qvocab, "term", "left_semi").select(
            "segment", F.lit(f).alias("field"), "term", "blocks"
        )
        cand = part if cand is None else cand.unionByName(part)

    # per-field match-clause bar rides the weight rows in-plan (same
    # mechanism as search_index_cogroup; clause units per required_df,
    # counted over the analyzed terms pre-df-join)
    qreq = required_df(qt, minimum_should_match, operator)
    if qreq is not None:
        qunion = qunion.join(qreq, "qid")

    # candidate segments only (term-pruned), fresh attribute id for the
    # cogroup analyzer (see search_index_cogroup)
    segs = cand.select(F.col("segment").cast("int").alias("segment")).distinct()
    qseg = qunion.crossJoin(F.broadcast(segs))
    kk = k + 1 if exclude_self else k
    tie = float(tie_breaker)
    seg_schema = f"qid {qid_type}, doc_id long, score double"

    def score(pleft: pd.DataFrame, pright: pd.DataFrame) -> pd.DataFrame:
        if len(pleft) == 0 or len(pright) == 0:
            return _emit_topk_frame([])
        decoded = _decode_terms_mf(
            pleft["field"], pleft["term"], pleft["blocks"], codec, k1, b, avgdls
        )
        if not decoded:
            return _emit_topk_frame([])
        per_query: dict = {}
        for qid, fld, t, w, qtf in zip(
            pright["qid"], pright["field"], pright["term"], pright["w"],
            pright["qtf"],
        ):
            per_query.setdefault(qid, {}).setdefault(fld, []).append(
                (t, float(w), int(qtf))
            )
        msm_b = (
            {q: int(r) for q, r in zip(pright["qid"], pright["req"])}
            if "req" in pright.columns
            else None
        )
        return _emit_topk_frame(_mf_parts(decoded, per_query, tie, kk, msm=msm_b))

    seg_topk = (
        cand.groupBy("segment")
        .cogroup(qseg.groupBy("segment"))
        .applyInPandas(score, schema=seg_schema)
    )
    if exclude_self:
        seg_topk = seg_topk.filter(F.col("doc_id") != F.col("qid"))
    return topk_per_group(seg_topk, k=k).select("qid", "doc_id", "score", "rank")
