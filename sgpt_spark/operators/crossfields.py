"""ES ``multi_match type=cross_fields`` — term-centric multi-field BM25
(Lucene ``BlendedTermQuery``) — plus the ``multi_match`` TYPE dispatcher
that completes the family.

The reference's retrieval layer is ES ``multi_match`` over
``{"title", "txt"}`` (crossencoder/beir/crossencoder_beir_bm25.ipynb
cell 10, via BEIR 0.2.3's BM25Search body); it runs ``best_fields``,
but the SAME request shape accepts ``type=most_fields`` and
``type=cross_fields`` — the remaining two scoring types of the ES
multi_match DSL. This module supplies them Spark-first:

``best_fields`` / ``most_fields`` are FIELD-centric: each field is an
independent match clause scored over the whole query, combined
per doc with dis-max + tie_breaker. ES documents most_fields as the
bool-query SUM of the per-field clause scores — exactly the
best_fields combine at tie_breaker=1.0 (max + 1.0*(sum-max) == sum),
so ``multi_match(type="most_fields")`` delegates to the existing
best_fields machinery with tie_breaker pinned to 1.0.

``cross_fields`` is TERM-centric (the "first_name/last_name" problem):
each analyzed query TERM becomes one blended clause that may match in
any field, and the doc score SUMS the per-term clauses:

    score(q, d) = sum_t [ max_f s_{f,t}(d)
                          + tie_breaker * (sum_f s_{f,t}(d) - max_f) ]

with per-term STATISTICS BLENDING (Lucene BlendedTermQuery
``adjustFrequencies``): every field scores term t with the same
blended document frequency df_b(t) = max_f df_f(t), so a term rare in
one field but common in another is not artificially up-weighted in the
rare field. Norms stay per-field (each field keeps its own docCount
N_f, avgdl_f and doc lengths — only df is blended):

    s_{f,t}(d) = boost_f * qtf_t * idf_f(df_b(t)) * tf-norm_f(t, d)
    idf_f(df)  = log(1 + (N_f - min(df, N_f) + 0.5)/(min(df, N_f) + 0.5))

The ``min(df, N_f)`` cap is this engine's spelling of Lucene 8+'s
positive-scores invariant: a blended df can exceed a small field's
docCount (title df 1, text df 900, N_title 100), where the raw BM25 idf
would go negative; capping at N_f floors idf at its smallest positive
value, keeps every partial strictly positive (the engine-wide combine
contract), and leaves the common case (df_b <= N_f) untouched.

``operator='and'`` / ``minimum_should_match`` are where cross_fields
differs most usefully from best_fields (the ES docs' motivating
example): the clause units are analyzed query-token occurrences and a
term matched in ANY field satisfies its qtf clauses — so
operator='and' means "every term somewhere", not "every term in one
field" (best_fields' per-field bar).

Three paths, the house pattern:

``bm25_crossfields_search``  exhaustive declarative plan — ONE corpus
    scan unions per-field token projections, ONE groupBy(term, doc_id)
    pivots per-field tf/doc_len into columns (fields are enumerable),
    per-field dfs + the blended max fold out of that same relation, the
    per-TERM cross-field combine is ROW-wise (greatest/sum over the
    pivoted columns — no extra shuffle for the term-level dis-max), and
    ONE groupBy(qid, doc_id) sums term clauses. Shuffle count identical
    to best_fields (tf agg + final agg + top-k window).
``search_crossfields_index`` the compressed per-field indexes of
    ``indexer.build_multifield_index`` (co-segmented — one task sees
    all of a doc's per-field postings): blended weights from the
    build-time termstats, one batched decode per segment
    (``_decode_terms_mf``), a numpy per-term cross-field kernel, <= k
    rows per (query, segment) shuffled. Query sets collect to the
    driver (the ``search_index`` small-query-set contract).
``search_crossfields_index_cogroup``  the in-plan twin: blended dfs,
    capped idfs and per-field weights all compute in codegen (one row
    per (qid, term) left-joins every field's (term, df) side table;
    ``greatest`` folds the blend), weight rows replicate across
    candidate segments, and the same ``_cf_parts`` kernel scores each
    cogroup — no driver collect anywhere (the million-query contract
    every index family carries).
``search_crossfields_index_join``  the fully relational fallback (no
    collect AND no per-segment query replication): flatten the
    term-pruned per-field postings, pivot per (qid, doc, term) with
    conditional aggregates, row-local term combine, final fold — the
    strategy for query sets where |query terms| x n_segments outgrows
    the cluster, at the documented join-path premium.
``multi_match`` / ``multi_match_index``  the ES type dispatcher:
    best_fields -> the existing dis-max paths, most_fields ->
    tie_breaker=1.0, cross_fields -> this module. (type=phrase and
    type=bool_prefix live in phrase_multifield.py / boolprefix.py.)

Scale notes (10^12 docs): nothing here shuffles postings — the
exhaustive tf pivot is the same single shuffle best_fields pays, and
the index path's per-segment kernel emits only top-k rows. The blended
df side-table is |query vocabulary| rows.
"""

from __future__ import annotations

from typing import Iterable

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sgpt_spark.functions.analyzer import tokenize_ws
from sgpt_spark.functions.bm25 import B, K1, idf_py
from sgpt_spark.operators.search import (
    Tokenizer,
    _validate_msm_args,
    normalize_boosts,
    query_terms,
    required_df,
)
from sgpt_spark.operators.topk import SCORE_DECIMALS, topk_per_group

_TYPES = ("best_fields", "most_fields", "cross_fields")


def bm25_crossfields_search(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    fields: tuple[str, ...] = ("title", "text"),
    tie_breaker: float = 0.0,
    tokenizer: Tokenizer = tokenize_ws,
    id_col: str = "doc_id",
    k1: float = K1,
    b: float = B,
    boosts: dict[str, float] | None = None,
    minimum_should_match: int = 0,
    operator: str = "or",
) -> DataFrame:
    """ES ``multi_match type=cross_fields`` top-k -> (qid, doc_id,
    score, rank). Semantics and plan shape per the module docstring;
    ``tie_breaker`` defaults to 0.0 (the ES multi_match default — pure
    per-term dis-max across fields).

    Plan: the pivoted tf relation carries one row per (term, doc) with
    per-field tf/doc_len COLUMNS, so the per-term cross-field combine
    is a row-local greatest/sum — the term-centric scoring adds ZERO
    shuffles over the field-centric exhaustive path."""
    _validate_msm_args(minimum_should_match, operator)
    if not 0.0 <= float(tie_breaker) <= 1.0:
        raise ValueError(f"tie_breaker must be in [0, 1], got {tie_breaker}")
    boost = normalize_boosts(fields, boosts)

    fdocs = None
    for f in fields:
        part = corpus.select(
            F.col(id_col).alias("doc_id"),
            F.lit(f).alias("field"),
            tokenizer(F.col(f)).alias("terms"),
        ).filter(F.size("terms") > 0)
        fdocs = part if fdocs is None else fdocs.unionByName(part)

    # pivot: one row per (term, doc_id), per-field tf/doc_len columns
    # (NULL tf = "field does not contain the term"). One shuffle.
    flat = fdocs.select(
        "field",
        "doc_id",
        F.size("terms").alias("doc_len"),
        F.explode("terms").alias("term"),
    )
    piv_aggs = []
    for i, f in enumerate(fields):
        piv_aggs.append(
            F.sum(F.when(F.col("field") == f, F.lit(1))).alias(f"_tf{i}")
        )
        piv_aggs.append(
            F.first(F.when(F.col("field") == f, F.col("doc_len")), ignorenulls=True)
            .alias(f"_dl{i}")
        )
    tf_piv = flat.groupBy("term", "doc_id").agg(*piv_aggs)

    # per-field df + the blended max, from the SAME pivoted relation
    dfs = tf_piv.groupBy("term").agg(
        *[F.count(f"_tf{i}").alias(f"_df{i}") for i in range(len(fields))]
    )
    df_cols = [F.col(f"_df{i}") for i in range(len(fields))]
    dfb = F.greatest(*df_cols) if len(df_cols) > 1 else df_cols[0]
    dfs = dfs.select("term", dfb.alias("dfb"))

    # per-field docCount/avgdl: |fields| rows — literal-fold (the
    # corpus_stats contract, same as the best_fields exhaustive path)
    stats = {
        r["field"]: (int(r["n"]), float(r["avgdl"] or 0.0) or 1.0)
        for r in fdocs.groupBy("field")
        .agg(F.count("*").alias("n"), F.avg(F.size("terms")).alias("avgdl"))
        .collect()
    }

    qt = query_terms(queries, tokenizer=tokenizer)
    qterm_df = F.broadcast(qt.join(dfs, "term", "inner"))
    scored_terms = tf_piv.join(qterm_df, "term", "inner")

    partials = []
    for i, f in enumerate(fields):
        n_f, avgdl_f = stats.get(f, (0, 1.0))
        cap = F.least(F.col("dfb"), F.lit(int(n_f)))
        idf_f = F.log(
            1.0 + (F.lit(float(n_f)) - cap + 0.5) / (cap + 0.5)
        )
        tf_c = F.col(f"_tf{i}").cast("double")
        partials.append(
            F.lit(boost[f])
            * F.col("qtf")
            * idf_f
            * tf_c
            / (tf_c + k1 * (1.0 - b + b * F.col(f"_dl{i}") / F.lit(avgdl_f)))
        )
    # partials are strictly positive where matched (capped idf > 0), so
    # NULL->0 coalescing keeps greatest/sum exact over matched fields
    coalesced = [F.coalesce(p, F.lit(0.0)) for p in partials]
    mx = F.greatest(*coalesced) if len(coalesced) > 1 else coalesced[0]
    tot = coalesced[0]
    for c in coalesced[1:]:
        tot = tot + c
    term_score = mx + F.lit(float(tie_breaker)) * (tot - mx)

    clauses = scored_terms.select(
        "qid", "doc_id", "qtf", term_score.alias("term_score")
    )
    combined = clauses.groupBy("qid", "doc_id").agg(
        F.sum("term_score").alias("score"),
        F.sum("qtf").alias("_matched"),
    )
    required = required_df(qt, minimum_should_match, operator)
    if required is not None:
        combined = (
            combined.join(F.broadcast(required), "qid", "left")
            .filter(F.col("_matched") >= F.coalesce(F.col("req"), F.lit(0)))
        )
    return topk_per_group(combined.select("qid", "doc_id", "score"), k=k).select(
        "qid", "doc_id", "score", "rank"
    )


def combined_fields_search(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    fields: tuple[str, ...] = ("title", "text"),
    tokenizer: Tokenizer = tokenize_ws,
    id_col: str = "doc_id",
    k1: float = K1,
    b: float = B,
    boosts: dict[str, float] | None = None,
    minimum_should_match: int = 0,
    operator: str = "or",
) -> DataFrame:
    """ES ``combined_fields`` query (7.13+; Lucene CombinedFieldQuery)
    -> (qid, doc_id, score, rank): the fields score as ONE synthetic
    merged field — the principled term-centric alternative to
    cross_fields (no per-term dis-max; one BM25 over combined
    statistics, the BM25F simplification Lucene ships):

      tf_c(t, d)  = sum_f w_f * tf_f(t, d)        (weighted tf merge)
      dl_c(d)     = sum_f w_f * dl_f(d)           (weighted norm merge)
      N           = |docs with >= 1 token in ANY field|
      avgdl_c     = avg of dl_c over those docs
      df_c(t)     = max_f df_f(t) capped at N     (blended, positive idf)
      score(q, d) = sum_t qtf_t * idf(df_c) * tf_c/(tf_c + k1*(1-b+b*dl_c/avgdl_c))

    ES constrains ``boosts`` (the ``"title^2"`` field weights w_f) to
    >= 1.0 — enforced here (values below 1 break the merged-field
    interpretation; ES rejects them too). operator/minimum_should_match
    count clause units exactly as cross_fields: a term matched in ANY
    field satisfies its qtf clauses.

    Plan: the cross_fields pivot idiom — one groupBy(term, doc_id) with
    per-field conditional tf/doc_len columns makes tf_c and dl_c
    row-local; dfs + the blended max fold from the same relation; the
    per-doc combined length is exact because the pivot carries EVERY
    field's doc_len for the matched docs (doc_len rides each posting
    row). One corpus scan, the same three shuffles as best_fields, no
    Python anywhere. Index-backed serving needs the Lucene norms role
    (per-field doc lengths for docs that match in OTHER fields only) —
    a per-doc sidecar this engine carries as docvalues; the exhaustive
    operator is itself fully in-plan and corpus-scan bounded.

    Subtlety the pivot hides: a doc matching term t only in field A
    still needs field B's length inside dl_c. The tf relation carries
    (doc, field) rows only where the FIELD has the term — so dl_c is
    assembled from a separate per-doc length relation (one more
    conditional pivot over the same fdocs scan), not from the tf rows.
    """
    _validate_msm_args(minimum_should_match, operator)
    boost = normalize_boosts(fields, boosts)
    bad = {f: v for f, v in boost.items() if v < 1.0}
    if bad:
        raise ValueError(
            f"combined_fields field weights must be >= 1.0 (ES rule), got {bad}"
        )

    fdocs = None
    for f in fields:
        part = corpus.select(
            F.col(id_col).alias("doc_id"),
            F.lit(f).alias("field"),
            tokenizer(F.col(f)).alias("terms"),
        ).filter(F.size("terms") > 0)
        fdocs = part if fdocs is None else fdocs.unionByName(part)

    # per-doc combined length: one conditional pivot over field lengths
    # (weighted sum; a missing field contributes 0)
    dlens = fdocs.groupBy("doc_id").agg(
        *[
            F.coalesce(
                F.first(
                    F.when(F.col("field") == f, F.size("terms")),
                    ignorenulls=True,
                ),
                F.lit(0),
            ).alias(f"_l{i}")
            for i, f in enumerate(fields)
        ]
    )
    dl_c = None
    for i, f in enumerate(fields):
        t = F.lit(boost[f]) * F.col(f"_l{i}")
        dl_c = t if dl_c is None else dl_c + t
    # lazy localCheckpoint: the norms relation is (doc_id, _dlc) — two
    # narrow columns — and is consumed TWICE (the stats aggregate below
    # and the scored-terms join); without it the corpus tokenizes once
    # per consumer (guide §5 localCheckpoint)
    dlens = dlens.select("doc_id", dl_c.alias("_dlc")).localCheckpoint(
        eager=False
    )

    # combined-field stats: N = docs with any field, avgdl over dl_c
    n_docs, avgdl_c = dlens.agg(
        F.count("*"), F.avg("_dlc")
    ).collect()[0]
    n_docs = int(n_docs)
    avgdl_c = float(avgdl_c or 0.0) or 1.0

    # prune the term pivot to the QUERY vocabulary before the
    # (term, doc_id) groupBy: df_c / tf_c are only ever read for query
    # terms, and the per-term aggregates of the pruned relation equal
    # the full-vocabulary ones term for term — aggregate before you
    # shuffle, and only what you keep (guide §2.3)
    qt = query_terms(queries, tokenizer=tokenizer)
    flat = fdocs.select(
        "field", "doc_id", F.explode("terms").alias("term")
    ).join(F.broadcast(qt.select("term").distinct()), "term", "left_semi")
    from pyspark import StorageLevel

    tf_piv = flat.groupBy("term", "doc_id").agg(
        *[
            F.sum(F.when(F.col("field") == f, F.lit(1))).alias(f"_tf{i}")
            for i, f in enumerate(fields)
        ]
    # lazy SERIALIZED checkpoint (the hit-set storage rule): tf_piv is
    # bounded by the query vocabulary's postings (the TAAT candidate
    # bound, never |corpus tokens|) and is consumed TWICE — the blended
    # df aggregate and the scoring join; without it the corpus
    # re-tokenizes and the pivot groupBy re-runs per consumer
    ).localCheckpoint(eager=False, storageLevel=StorageLevel.MEMORY_AND_DISK)
    dfs = tf_piv.groupBy("term").agg(
        *[F.count(f"_tf{i}").alias(f"_df{i}") for i in range(len(fields))]
    )
    df_cols = [F.col(f"_df{i}") for i in range(len(fields))]
    dfb = F.greatest(*df_cols) if len(df_cols) > 1 else df_cols[0]
    dfs = dfs.select("term", dfb.alias("dfb"))
    qterm_df = F.broadcast(qt.join(dfs, "term", "inner"))
    # attach the per-doc norm BEFORE the query fan-out: the doc_id join
    # runs on the (term, doc_id) pivot (|query-vocab postings| rows),
    # not on the (qid, term, doc_id) clause relation it fans out to —
    # the r5 order shuffled the post-fan-out relation (~8x more rows on
    # the bench shape) through the dlens join (guide §2.3: shuffle
    # fewer bytes, attach small relations before the multiplier)
    scored_terms = tf_piv.join(dlens, "doc_id").join(qterm_df, "term", "inner")

    tf_c = None
    for i, f in enumerate(fields):
        t = F.lit(boost[f]) * F.coalesce(F.col(f"_tf{i}"), F.lit(0)).cast("double")
        tf_c = t if tf_c is None else tf_c + t
    cap = F.least(F.col("dfb"), F.lit(int(n_docs)))
    idf_c = F.log(1.0 + (F.lit(float(n_docs)) - cap + 0.5) / (cap + 0.5))
    term_score = (
        F.col("qtf") * idf_c * tf_c
        / (tf_c + k1 * (1.0 - b + b * F.col("_dlc") / F.lit(avgdl_c)))
    )
    clauses = scored_terms.select(
        "qid", "doc_id", "qtf", term_score.alias("term_score")
    )
    combined = clauses.groupBy("qid", "doc_id").agg(
        F.sum("term_score").alias("score"), F.sum("qtf").alias("_matched")
    )
    required = required_df(qt, minimum_should_match, operator)
    if required is not None:
        combined = combined.join(F.broadcast(required), "qid", "left").filter(
            F.col("_matched") >= F.coalesce(F.col("req"), F.lit(0))
        )
    return topk_per_group(combined.select("qid", "doc_id", "score"), k=k).select(
        "qid", "doc_id", "score", "rank"
    )


def _cf_parts(
    decoded: dict, per_query_cf: dict, tie: float, kk: int, msm: dict | None = None
) -> list:
    """Term-centric cross-field combine over ONE co-segmented segment's
    decoded per-field postings -> [(qid, doc_ids, scores)].
    ``per_query_cf``: qid -> [(term, qtf, {field: w})] with w the
    blended-df per-field weight. Per term: union the matching fields'
    doc sets, dis-max + tie across fields; per doc: sum the term
    clauses (one unique/bincount over the concatenated term arrays).
    ``msm``: qid -> required matched-clause count; a term matched in
    ANY field satisfies its qtf clauses (the cross_fields bar)."""
    from sgpt_spark.operators.index_search import deterministic_topk

    parts: list = []
    for qid, tws in per_query_cf.items():
        req = int(msm.get(qid, 0)) if msm is not None else 0
        doc_cat: list = []
        sc_cat: list = []
        m_cat: list = []
        for term, qtf, by_field in tws:
            fmatch = [
                (decoded[f][term][0], decoded[f][term][1] * w)
                for f, w in by_field.items()
                if f in decoded and term in decoded[f]
            ]
            if not fmatch:
                continue
            if len(fmatch) == 1:
                ids_t, sc_t = fmatch[0]
            else:
                ids_t = fmatch[0][0]
                for ids_f, _ in fmatch[1:]:
                    ids_t = np.union1d(ids_t, ids_f)
                mat = np.zeros((len(fmatch), len(ids_t)))
                for r, (ids_f, sc) in enumerate(fmatch):
                    mat[r, np.searchsorted(ids_t, ids_f)] = sc
                mx = mat.max(axis=0)
                sc_t = mx + tie * (mat.sum(axis=0) - mx)
            doc_cat.append(ids_t)
            sc_cat.append(sc_t)
            m_cat.append(np.full(len(ids_t), int(qtf), dtype=np.float64))
        if not doc_cat:
            continue
        ids, inv = np.unique(np.concatenate(doc_cat), return_inverse=True)
        scores = np.bincount(inv, weights=np.concatenate(sc_cat))
        if req > 1:
            keep = np.bincount(inv, weights=np.concatenate(m_cat)) >= req
            ids, scores = ids[keep], scores[keep]
            if len(ids) == 0:
                continue
        scores = np.round(scores, SCORE_DECIMALS)
        order = deterministic_topk(ids, scores, kk)
        parts.append((qid, ids[order].astype(np.int64), scores[order]))
    return parts


def search_crossfields_index(
    spark: SparkSession,
    path: str,
    queries: DataFrame | Iterable[tuple],
    k: int = 10,
    tie_breaker: float = 0.0,
    fields: tuple[str, ...] | None = None,
    tokenize=None,
    boosts: dict[str, float] | None = None,
    minimum_should_match: int = 0,
    operator: str = "or",
) -> DataFrame:
    """``multi_match type=cross_fields`` THROUGH the compressed
    per-field indexes of ``indexer.build_multifield_index`` — the
    index-backed twin of ``bm25_crossfields_search`` (value-identical,
    pytest-equated on both codecs).

    Plan: blended dfs come from the build-time termstats side tables
    (|query vocabulary| rows collected per field — the ``search_index``
    small-query-set contract), per-query per-field weights fold idf_f
    of the CAPPED blended df; then the best_fields index machinery is
    reused verbatim up to the kernel: term-pruned per-field postings
    scans union with a field tag, group by segment (co-segmentation:
    one task sees all of a doc's per-field postings), one batched
    decode, and the ``_cf_parts`` term-centric kernel emits <= k rows
    per (query, segment)."""
    import pandas as pd

    from sgpt_spark.functions.analyzer import resolve_py_analyzer
    from sgpt_spark.operators.index_search import (
        _decode_terms_mf,
        _emit_topk_frame,
        _load_multifield,
        _msm_map,
        collect_query_terms,
        normalize_queries,
    )

    if not 0.0 <= float(tie_breaker) <= 1.0:
        raise ValueError(f"tie_breaker must be in [0, 1], got {tie_breaker}")
    fields, idx, analyzer = _load_multifield(spark, path, fields)
    boost = normalize_boosts(fields, boosts)

    queries, qid_type = normalize_queries(queries)
    qterms = collect_query_terms(
        queries, tokenize=tokenize or resolve_py_analyzer(analyzer)
    )
    msm = _msm_map(qterms, minimum_should_match, operator)
    seg_schema = f"qid {qid_type}, doc_id long, score double"
    empty = spark.createDataFrame([], seg_schema + ", rank int")
    if not qterms:
        return empty
    terms = sorted({t for _, t, _ in qterms})

    # per-field dfs for the query vocabulary -> blended df = max_f df_f
    field_df: dict = {}
    avgdls = {}
    cand = None
    for f in fields:
        postings_f, meta_f, tstats_f = idx[f]
        avgdls[f] = meta_f.avgdl
        if tstats_f is not None:
            field_df[f] = {
                r["term"]: int(r["df"])
                for r in tstats_f.filter(F.col("term").isin(terms)).collect()
            }
        else:
            field_df[f] = {
                r["term"]: int(r["df"])
                for r in postings_f.filter(F.col("term").isin(terms))
                .groupBy("term").agg(F.sum("df").alias("df")).collect()
            }
        part = postings_f.filter(F.col("term").isin(terms)).withColumn(
            "field", F.lit(f)
        )
        cand = part if cand is None else cand.unionByName(part)
    blended = {
        t: max(field_df[f].get(t, 0) for f in fields) for t in terms
    }
    # per-query clause list with per-field blended weights; idf uses the
    # field's OWN docCount with df capped at it (module docstring)
    per_query: dict = {}  # qid -> [(term, qtf, {field: w})]
    for qid, t, qtf in qterms:
        dfb = blended.get(t, 0)
        if dfb <= 0:
            continue
        ws = {
            f: boost[f] * qtf * idf_py(min(dfb, idx[f][1].n_docs), idx[f][1].n_docs)
            for f in fields
        }
        per_query.setdefault(qid, []).append((t, int(qtf), ws))
    if not per_query:
        return empty
    b_queries = spark.sparkContext.broadcast(per_query)
    b_msm = spark.sparkContext.broadcast(msm)
    b_avgdl = spark.sparkContext.broadcast(avgdls)
    k1, b = idx[fields[0]][1].k1, idx[fields[0]][1].b
    codec = idx[fields[0]][1].codec
    tie = float(tie_breaker)

    def score_segment_cf(pdf: pd.DataFrame) -> pd.DataFrame:
        decoded = _decode_terms_mf(
            pdf["field"], pdf["term"], pdf["blocks"], codec, k1, b, b_avgdl.value
        )
        return _emit_topk_frame(
            _cf_parts(decoded, b_queries.value, tie, k, msm=b_msm.value)
        )

    seg_topk = cand.groupBy("segment").applyInPandas(
        lambda _key, pdf: score_segment_cf(pdf), schema=seg_schema
    )
    return topk_per_group(seg_topk, k=k).select("qid", "doc_id", "score", "rank")


def search_crossfields_index_cogroup(
    spark: SparkSession,
    path: str,
    queries: DataFrame | Iterable[tuple],
    k: int = 10,
    tie_breaker: float = 0.0,
    fields: tuple[str, ...] | None = None,
    tokenizer=None,
    boosts: dict[str, float] | None = None,
    minimum_should_match: int = 0,
    operator: str = "or",
) -> DataFrame:
    """cross_fields twin of ``search_multifield_index_cogroup``: the
    query set stays IN THE PLAN (no driver collect — the million-query
    contract) while each co-segmented segment runs the same numpy
    term-centric kernel as the collect path (``_cf_parts``).

    The blended df is computed in-plan: query terms left-join EVERY
    field's (term, df) side table in one row (fields are enumerable),
    ``greatest`` folds the blend, and each field's weight column applies
    the capped idf (module docstring) in whole-stage codegen. Weight
    rows replicate across candidate segment ids exactly as the
    best_fields cogroup does; same scale contract and fallback
    guidance."""
    import pandas as pd

    from sgpt_spark.functions.analyzer import resolve_jvm_analyzer
    from sgpt_spark.operators.index_search import (
        _decode_terms_mf,
        _emit_topk_frame,
        _load_multifield,
        normalize_queries,
    )

    if not 0.0 <= float(tie_breaker) <= 1.0:
        raise ValueError(f"tie_breaker must be in [0, 1], got {tie_breaker}")
    fields, idx, analyzer = _load_multifield(spark, path, fields)
    boost = normalize_boosts(fields, boosts)
    queries, qid_type = normalize_queries(queries)
    if not isinstance(queries, DataFrame):
        queries = spark.createDataFrame(queries, f"qid {qid_type}, query string")
    tok = tokenizer or resolve_jvm_analyzer(analyzer)
    qt = query_terms(queries, tokenizer=tok)
    qvocab = qt.select("term").distinct()
    k1, b = idx[fields[0]][1].k1, idx[fields[0]][1].b
    codec = idx[fields[0]][1].codec
    avgdls = {f: idx[f][1].avgdl for f in fields}

    # one row per (qid, term) carrying every field's df -> blended max
    qdf = qt
    cand = None
    for i, f in enumerate(fields):
        postings_f, meta_f, tstats_f = idx[f]
        if tstats_f is not None:
            dfs = tstats_f
        else:
            dfs = postings_f.groupBy("term").agg(F.sum("df").alias("df"))
        qdf = qdf.join(
            dfs.select("term", F.col("df").alias(f"_df{i}")), "term", "left"
        )
        part = postings_f.join(qvocab, "term", "left_semi").select(
            "segment", F.lit(f).alias("field"), "term", "blocks"
        )
        cand = part if cand is None else cand.unionByName(part)
    df_cols = [F.coalesce(F.col(f"_df{i}"), F.lit(0)) for i in range(len(fields))]
    dfb = F.greatest(*df_cols) if len(df_cols) > 1 else df_cols[0]
    qdf = qdf.withColumn("_dfb", dfb).filter(F.col("_dfb") > 0)

    # per-field weight rows: capped blended idf in codegen
    qunion = None
    for f in fields:
        n_f = idx[f][1].n_docs
        cap = F.least(F.col("_dfb"), F.lit(int(n_f)))
        w_col = (
            F.col("qtf")
            * F.log(1.0 + (F.lit(float(n_f)) - cap + 0.5) / (cap + 0.5))
        )
        if boost[f] != 1.0:
            w_col = F.lit(boost[f]) * w_col
        qtw_f = qdf.select(
            "qid", F.lit(f).alias("field"), "term", "qtf", w_col.alias("w")
        )
        qunion = qtw_f if qunion is None else qunion.unionByName(qtw_f)

    # the cross_fields clause bar (term matched in ANY field) rides the
    # weight rows; clause units per required_df over the ANALYZED terms
    qreq = required_df(qt, minimum_should_match, operator)
    if qreq is not None:
        qunion = qunion.join(qreq, "qid")

    segs = cand.select(F.col("segment").cast("int").alias("segment")).distinct()
    qseg = qunion.crossJoin(F.broadcast(segs))
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
        by_qt: dict = {}  # (qid, term) -> [qtf, {field: w}]
        for qid, fld, t, w, qtf in zip(
            pright["qid"], pright["field"], pright["term"], pright["w"],
            pright["qtf"],
        ):
            slot = by_qt.setdefault((qid, t), [int(qtf), {}])
            slot[1][fld] = float(w)
        per_query: dict = {}  # qid -> [(term, qtf, {field: w})]
        for (qid, t), (qtf, ws) in by_qt.items():
            per_query.setdefault(qid, []).append((t, qtf, ws))
        msm_b = (
            {q: int(r) for q, r in zip(pright["qid"], pright["req"])}
            if "req" in pright.columns
            else None
        )
        return _emit_topk_frame(_cf_parts(decoded, per_query, tie, k, msm=msm_b))

    seg_topk = (
        cand.groupBy("segment")
        .cogroup(qseg.groupBy("segment"))
        .applyInPandas(score, schema=seg_schema)
    )
    return topk_per_group(seg_topk, k=k).select("qid", "doc_id", "score", "rank")


def search_crossfields_index_join(
    spark: SparkSession,
    path: str,
    queries: DataFrame | Iterable[tuple],
    k: int = 10,
    tie_breaker: float = 0.0,
    fields: tuple[str, ...] | None = None,
    tokenizer=None,
    boosts: dict[str, float] | None = None,
    minimum_should_match: int = 0,
    operator: str = "or",
) -> DataFrame:
    """Fully relational cross_fields through the per-field compressed
    indexes — the extreme-scale fallback of the family (the
    ``search_index_join`` contract: no driver collect AND no per-segment
    query replication, for query sets so large that
    |query terms| x n_segments outgrows the cluster; for everything
    smaller prefer ``search_crossfields_index_cogroup``).

    Plan: per field, term-pruned postings scan -> Arrow-batched
    ``flatten_postings`` -> per-doc tf rows; union with a field tag;
    ONE groupBy(qid, doc_id, term) pivots the per-field partials into
    conditional-aggregate columns (fields are enumerable — the
    exhaustive operator's idiom on the flat relation), the per-term
    dis-max is then row-local, and one groupBy(qid, doc_id) sums the
    term clauses. Blended dfs and capped idfs compute in codegen from
    the per-field termstats exactly as the cogroup path. Two candidate
    shuffles (the documented join-path premium over the cogroup
    kernel), both keyed on high-cardinality composites."""
    from sgpt_spark.functions.analyzer import resolve_jvm_analyzer
    from sgpt_spark.operators.index_search import (
        _load_multifield,
        flatten_postings,
        normalize_queries,
    )

    if not 0.0 <= float(tie_breaker) <= 1.0:
        raise ValueError(f"tie_breaker must be in [0, 1], got {tie_breaker}")
    fields, idx, analyzer = _load_multifield(spark, path, fields)
    boost = normalize_boosts(fields, boosts)
    queries, qid_type = normalize_queries(queries)
    if not isinstance(queries, DataFrame):
        queries = spark.createDataFrame(queries, f"qid {qid_type}, query string")
    tok = tokenizer or resolve_jvm_analyzer(analyzer)
    qt = query_terms(queries, tokenizer=tok)
    qvocab = qt.select("term").distinct()
    k1, b = idx[fields[0]][1].k1, idx[fields[0]][1].b

    # per-(qid, term) blended df row (the cogroup path's join block)
    qdf = qt
    flat = None
    for i, f in enumerate(fields):
        postings_f, meta_f, tstats_f = idx[f]
        if tstats_f is not None:
            dfs = tstats_f
        else:
            dfs = postings_f.groupBy("term").agg(F.sum("df").alias("df"))
        qdf = qdf.join(
            dfs.select("term", F.col("df").alias(f"_df{i}")), "term", "left"
        )
        cand_f = postings_f.join(qvocab, "term", "left_semi")
        part = flatten_postings(cand_f, codec=meta_f.codec).select(
            F.lit(f).alias("field"), "term", "doc_id", "tf", "doc_len"
        )
        flat = part if flat is None else flat.unionByName(part)
    df_cols = [F.coalesce(F.col(f"_df{i}"), F.lit(0)) for i in range(len(fields))]
    dfb = F.greatest(*df_cols) if len(df_cols) > 1 else df_cols[0]
    qdf = qdf.withColumn("_dfb", dfb).filter(F.col("_dfb") > 0).select(
        "qid", "term", "qtf", "_dfb"
    )

    # pivot the flat per-field tf rows per (qid, doc, term) and fold the
    # per-field partial with the capped blended idf row-locally
    probe = flat.join(qdf, "term")
    piv = []
    for i, f in enumerate(fields):
        piv.append(
            F.first(F.when(F.col("field") == f, F.col("tf")), ignorenulls=True)
            .alias(f"_tf{i}")
        )
        piv.append(
            F.first(F.when(F.col("field") == f, F.col("doc_len")), ignorenulls=True)
            .alias(f"_dl{i}")
        )
    g = probe.groupBy("qid", "doc_id", "term").agg(
        F.first("qtf").alias("qtf"), F.first("_dfb").alias("_dfb"), *piv
    )
    partials = []
    for i, f in enumerate(fields):
        n_f = idx[f][1].n_docs
        avgdl_f = idx[f][1].avgdl or 1.0
        cap = F.least(F.col("_dfb"), F.lit(int(n_f)))
        idf_f = F.log(1.0 + (F.lit(float(n_f)) - cap + 0.5) / (cap + 0.5))
        tf_c = F.col(f"_tf{i}").cast("double")
        partials.append(
            F.lit(boost[f]) * F.col("qtf") * idf_f * tf_c
            / (tf_c + k1 * (1.0 - b + b * F.col(f"_dl{i}") / F.lit(avgdl_f)))
        )
    coalesced = [F.coalesce(p, F.lit(0.0)) for p in partials]
    mx = F.greatest(*coalesced) if len(coalesced) > 1 else coalesced[0]
    tot = coalesced[0]
    for c in coalesced[1:]:
        tot = tot + c
    clauses = g.select(
        "qid", "doc_id", "qtf",
        (mx + F.lit(float(tie_breaker)) * (tot - mx)).alias("term_score"),
    )
    combined = clauses.groupBy("qid", "doc_id").agg(
        F.sum("term_score").alias("score"), F.sum("qtf").alias("_matched")
    )
    required = required_df(qt, minimum_should_match, operator)
    if required is not None:
        combined = combined.join(F.broadcast(required), "qid", "left").filter(
            F.col("_matched") >= F.coalesce(F.col("req"), F.lit(0))
        )
    return topk_per_group(combined.select("qid", "doc_id", "score"), k=k).select(
        "qid", "doc_id", "score", "rank"
    )


def multi_match(
    corpus: DataFrame,
    queries: DataFrame,
    mm_type: str = "best_fields",
    k: int = 10,
    fields: tuple[str, ...] = ("title", "text"),
    tie_breaker: float | None = None,
    **kwargs,
) -> DataFrame:
    """The ES ``multi_match`` TYPE dispatcher over the exhaustive paths:
    best_fields -> ``search.bm25_multifield_search`` (tie_breaker
    default 0.5, the reference's BEIR body), most_fields -> the same
    with tie_breaker pinned 1.0 (the ES-documented bool-sum combine —
    passing tie_breaker with most_fields is refused, ES ignores it but
    silence here would mislead), cross_fields ->
    ``bm25_crossfields_search`` (tie_breaker default 0.0, the ES
    default). type=phrase lives in phrase_multifield.py, and
    type=bool_prefix in boolprefix.py (positional/prefix machinery)."""
    from sgpt_spark.operators.search import bm25_multifield_search

    if mm_type not in _TYPES:
        raise ValueError(f"unknown multi_match type {mm_type!r}: {_TYPES}")
    if mm_type == "best_fields":
        tb = 0.5 if tie_breaker is None else tie_breaker
        return bm25_multifield_search(
            corpus, queries, k=k, fields=fields, tie_breaker=tb, **kwargs
        )
    if mm_type == "most_fields":
        if tie_breaker is not None:
            raise ValueError("most_fields has no tie_breaker (the combine IS the sum)")
        return bm25_multifield_search(
            corpus, queries, k=k, fields=fields, tie_breaker=1.0, **kwargs
        )
    tb = 0.0 if tie_breaker is None else tie_breaker
    return bm25_crossfields_search(
        corpus, queries, k=k, fields=fields, tie_breaker=tb, **kwargs
    )


def multi_match_index(
    spark: SparkSession,
    path: str,
    queries: DataFrame | Iterable[tuple],
    mm_type: str = "best_fields",
    k: int = 10,
    tie_breaker: float | None = None,
    **kwargs,
) -> DataFrame:
    """Index-backed ``multi_match`` type dispatcher (twin of
    ``multi_match`` over ``build_multifield_index`` layouts):
    best_fields -> ``search_multifield_index``, most_fields -> the same
    at tie_breaker=1.0, cross_fields -> ``search_crossfields_index``."""
    from sgpt_spark.operators.index_search import search_multifield_index

    if mm_type not in _TYPES:
        raise ValueError(f"unknown multi_match type {mm_type!r}: {_TYPES}")
    if mm_type == "best_fields":
        tb = 0.5 if tie_breaker is None else tie_breaker
        return search_multifield_index(spark, path, queries, k=k, tie_breaker=tb, **kwargs)
    if mm_type == "most_fields":
        if tie_breaker is not None:
            raise ValueError("most_fields has no tie_breaker (the combine IS the sum)")
        return search_multifield_index(
            spark, path, queries, k=k, tie_breaker=1.0, **kwargs
        )
    tb = 0.0 if tie_breaker is None else tie_breaker
    return search_crossfields_index(spark, path, queries, k=k, tie_breaker=tb, **kwargs)
