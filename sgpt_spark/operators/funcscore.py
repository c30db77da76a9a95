"""ES ``function_score`` — rescoring a match query with doc-values
functions (the Lucene FunctionScoreQuery role). Two entry points:

* ``function_score_index`` — the single ``field_value_factor``
  shorthand: score' = boost_mode(BM25, modifier(factor * field_value)).
* ``function_score_multi`` — the FULL request: a LIST of functions
  (field_value_factor, gauss/exp/linear decay, random_score,
  script_score, bare weight), each filter-gated and weighted, combined
  under ``score_mode`` (multiply/sum/avg/first/max/min — avg is ES's
  WEIGHTED average), capped at ``max_boost``, met with the query score
  under the full six-mode ``boost_mode`` set, ``min_score``-filtered.

The critical semantic: the function applies to EVERY matching doc
BEFORE the top-k cut (ES runs FunctionScoreQuery as the scoring query
itself), so "take BM25 top-k then multiply" is WRONG — a doc at BM25
rank 50 with a large field value may belong on page 1. The engine
therefore needs the FULL scored match set, which the join query path
already produces declaratively: term-pruned postings decode ->
``search.score_candidates`` (the plan shared with
``index_search.search_index_join``), then one docvalues join + the
modifier expression + the usual rounded top-k window. Fully in-plan,
no UDF, no driver step.

ES ``field_value_factor`` semantics carried:

* ``modifier``: none | log1p | ln1p | sqrt | square | reciprocal —
  ES spellings, with ES's log* meaning log BASE 10 (Lucene
  Math.log10), ln* natural. ``missing`` (default 1.0) substitutes for
  docs whose field is NULL before factor/modifier apply, exactly ES.
* ``factor`` multiplies the field value before the modifier.
* ``boost_mode``: multiply (ES default) | sum — how the function value
  combines with the query score.
* negative modifier inputs raise at plan build when detectable and
  produce NaN -> loud failure otherwise; ES likewise errors on
  negative log inputs at runtime.

Scale notes (10^12 docs): identical shape to the join query path —
the postings scan prunes to the query vocabulary at the parquet
reader, score_candidates shuffles per-(query, matched doc) partial
rows once, the docvalues join shuffles on doc_id, and the final
window compiles to partial/final WindowGroupLimit. The function adds
ONE projection over the already-materialized match relation.
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from sgpt_spark.operators.indexer import IndexMeta
from sgpt_spark.operators.topk import topk_per_group

MODIFIERS = ("none", "log1p", "ln1p", "sqrt", "square", "reciprocal")
BOOST_MODES = ("multiply", "sum")


def _modifier_col(val: Column, modifier: str) -> Column:
    # ES log* modifiers are base-10 (Lucene Math.log10); ln* natural.
    if modifier == "none":
        return val
    if modifier == "log1p":
        return F.log10(val + F.lit(1.0))
    if modifier == "ln1p":
        return F.log(val + F.lit(1.0))
    if modifier == "sqrt":
        return F.sqrt(val)
    if modifier == "square":
        return val * val
    if modifier == "reciprocal":
        return F.lit(1.0) / val
    raise ValueError(f"unknown modifier {modifier!r}: {MODIFIERS}")


def match_scores(
    spark: SparkSession,
    postings: DataFrame,
    meta: IndexMeta,
    queries: DataFrame | Iterable[tuple],
    term_stats: DataFrame | None = None,
    tokenizer=None,
    strategy: str = "cogroup",
) -> DataFrame:
    """FULL scored match set -> (qid, doc_id, score): BM25 over every
    (query, matching doc) pair with NO top-k cut — the relation a
    rescoring query needs. Fully in-plan under both strategies.

    ``strategy='cogroup'`` (default, r6): the per-term weight relation
    (qid, term, qtf x idf — idf in whole-stage codegen) cogroups with
    the term-pruned posting blocks per segment and the kernel emits
    each query's summed per-doc scores from ONE numpy unique/bincount —
    the (qid, doc_id) partial rows never shuffle (segments partition
    docs, so per-segment sums ARE the global sums), only the compressed
    blocks and the Arrow result move. The r5 relational spelling
    (``search_index_join``'s plan up to the cut: flatten -> probe join
    -> groupBy partial-sum) shuffles the per-(query, matched-term, doc)
    partial relation; ``strategy='relational'`` pins it as the
    verification twin."""
    from sgpt_spark.functions.analyzer import resolve_jvm_analyzer
    from sgpt_spark.operators.index_search import flatten_postings, normalize_queries
    from sgpt_spark.operators.search import query_terms, score_candidates
    from sgpt_spark.operators.stats import CorpusStats

    if strategy not in ("cogroup", "relational"):
        raise ValueError(
            f"unknown strategy {strategy!r}: use cogroup|relational"
        )
    queries, qid_type = normalize_queries(queries)
    if not isinstance(queries, DataFrame):
        queries = spark.createDataFrame(queries, f"qid {qid_type}, query string")
    tok = tokenizer or resolve_jvm_analyzer(meta.analyzer)
    qt = query_terms(queries, tokenizer=tok)
    dfs = (
        term_stats
        if term_stats is not None
        else postings.groupBy("term").agg(F.sum("df").alias("df"))
    )
    if strategy == "cogroup":
        return _match_scores_cogroup(
            spark, postings, meta, qt, dfs,
            queries.schema["qid"].dataType.simpleString(),
        )
    cand = postings.join(qt.select("term").distinct(), "term", "left_semi")
    flat = flatten_postings(cand, codec=meta.codec)
    return score_candidates(
        flat,
        qt,
        dfs,
        CorpusStats(n_docs=meta.n_docs, avgdl=meta.avgdl),
        k1=meta.k1,
        b=meta.b,
        broadcast_queries=False,
    )


def _match_scores_cogroup(
    spark: SparkSession,
    postings: DataFrame,
    meta: IndexMeta,
    qt: DataFrame,
    dfs: DataFrame,
    qid_type: str,
) -> DataFrame:
    """The cogroup all-hits kernel behind ``match_scores``: weights
    stay in the plan (replicated only to segments HOLDING each term),
    each segment decodes its blocks once and bincounts every query's
    per-doc sum, ALL hit rows leave as Arrow batches — zero shuffles
    on the hit relation."""
    import numpy as np
    import pandas as pd

    from sgpt_spark.functions.bm25 import idf as idf_col
    from sgpt_spark.operators.index_search import _decode_terms

    qtw = qt.join(dfs, "term").select(
        "qid",
        "term",
        (F.col("qtf") * idf_col(F.col("df"), meta.n_docs)).alias("w"),
    )
    cand = postings.join(
        qtw.select("term").distinct(), "term", "left_semi"
    ).select("segment", "term", "blocks")
    presence = postings.select(
        F.col("segment").cast("int").alias("segment"),
        F.col("term").cast("string").alias("term"),
    ).alias("_ms_presence")
    qtw_a = qtw.alias("_ms_qtw")
    qseg = qtw_a.join(
        presence, F.col("_ms_qtw.term") == F.col("_ms_presence.term")
    ).select(
        F.col("_ms_presence.segment").alias("segment"),
        F.col("_ms_qtw.qid").alias("qid"),
        F.col("_ms_qtw.term").alias("term"),
        F.col("_ms_qtw.w").alias("w"),
    )
    codec, k1, b_, avgdl = meta.codec, meta.k1, meta.b, meta.avgdl
    # PACKED emission (one (qid, doc_ids, scores) row per (segment,
    # query), exploded in the JVM): the Python->JVM boundary carries
    # flat int64/float64 buffers instead of an object-typed qid per
    # (qid, doc) row — the same array-form win as the hit-set kernel
    out_schema = (
        f"qid {qid_type}, doc_ids array<long>, scores array<double>"
    )

    def hits(pleft: pd.DataFrame, pright: pd.DataFrame) -> pd.DataFrame:
        empty = {"qid": [], "doc_ids": [], "scores": []}
        if len(pleft) == 0 or len(pright) == 0:
            return pd.DataFrame(empty)
        decoded = _decode_terms(
            pleft["term"], pleft["blocks"], codec, k1, b_, avgdl
        )
        if not decoded:
            return pd.DataFrame(empty)
        per_q: dict = {}
        for qid, term, w in zip(pright["qid"], pright["term"], pright["w"]):
            ent = decoded.get(term)
            if ent is not None:
                per_q.setdefault(qid, []).append((ent[0], ent[1] * w))
        if not per_q:
            return pd.DataFrame(empty)
        qids_out, docs_out, sc_out = [], [], []
        for qid, pairs in per_q.items():
            if len(pairs) == 1:
                ids, sc = pairs[0]
            else:
                docs_cat = np.concatenate([p[0] for p in pairs])
                w_cat = np.concatenate([p[1] for p in pairs])
                ids, inv = np.unique(docs_cat, return_inverse=True)
                sc = np.bincount(inv, weights=w_cat)
            qids_out.append(qid)
            docs_out.append(ids.astype(np.int64))
            sc_out.append(sc.astype(np.float64))
        return pd.DataFrame(
            {"qid": qids_out, "doc_ids": docs_out, "scores": sc_out}
        )

    packed = (
        cand.groupBy("segment")
        .cogroup(qseg.groupBy("segment"))
        .applyInPandas(hits, schema=out_schema)
    )
    return packed.select(
        "qid",
        F.explode(F.arrays_zip("doc_ids", "scores")).alias("_ds"),
    ).select(
        "qid",
        F.col("_ds.doc_ids").alias("doc_id"),
        F.col("_ds.scores").alias("score"),
    )


def function_score_index(
    spark: SparkSession,
    postings: DataFrame,
    meta: IndexMeta,
    queries: DataFrame | Iterable[tuple],
    docvalues: DataFrame,
    field: str,
    factor: float = 1.0,
    modifier: str = "none",
    missing: float = 1.0,
    boost_mode: str = "multiply",
    k: int = 10,
    term_stats: DataFrame | None = None,
    tokenizer=None,
    strategy: str = "kernel",
) -> DataFrame:
    """ES ``function_score`` with ``field_value_factor`` over the
    compressed index -> (qid, doc_id, score, rank): the match query's
    FULL scored set rescored by boost_mode(BM25, modifier(factor *
    field)), then the engine's rounded deterministic top-k. See the
    module docstring for semantics and plan shape.

    ``strategy='kernel'`` (default, r6): the segment-aligned doc-values
    sidecar cogroups with the term-pruned postings; per segment the
    kernel bincounts each query's raw BM25 sum, gathers the function
    values via one searchsorted against the segment's doc-value arrays
    (NULL/absent -> ``missing``, the left-join semantics), combines,
    rounds, and ships <= k rows per (query, segment). The full scored
    match set never shuffles — the r5 spelling joined doc values onto
    all |hits| rows and windowed them globally. Valid per segment
    because segments partition docs. ``strategy='relational'`` pins
    that spelling (the verification twin; the shape for unbounded
    query relations)."""
    if modifier not in MODIFIERS:
        raise ValueError(f"unknown modifier {modifier!r}: {MODIFIERS}")
    if boost_mode not in BOOST_MODES:
        raise ValueError(f"unknown boost_mode {boost_mode!r}: {BOOST_MODES}")
    if field not in docvalues.columns:
        raise ValueError(
            f"function_score field {field!r} not in docvalues columns "
            f"{docvalues.columns}"
        )
    if strategy not in ("kernel", "relational"):
        raise ValueError(
            f"unknown strategy {strategy!r}: use kernel|relational"
        )
    if strategy == "kernel" and "segment" in docvalues.columns:
        return _function_score_kernel(
            spark, postings, meta, queries, docvalues, field,
            float(factor), modifier, float(missing), boost_mode, k,
            term_stats, tokenizer,
        )
    scored = match_scores(
        spark, postings, meta, queries, term_stats=term_stats, tokenizer=tokenizer
    )
    fv = F.coalesce(F.col(field).cast("double"), F.lit(float(missing)))
    fn = _modifier_col(fv * F.lit(float(factor)), modifier)
    combined = (
        (F.col("score") * fn) if boost_mode == "multiply" else (F.col("score") + fn)
    )
    rescored = (
        scored.join(docvalues.select("doc_id", field), "doc_id", "left")
        .select("qid", "doc_id", combined.alias("score"))
    )
    return topk_per_group(rescored, k=k).select("qid", "doc_id", "score", "rank")


def _modifier_np(fv, modifier: str):
    """numpy twin of ``_modifier_col`` (same op order, same base)."""
    import numpy as np

    if modifier == "none":
        return fv
    if modifier == "log1p":
        return np.log10(fv + 1.0)
    if modifier == "ln1p":
        # NOT np.log1p: mirror _modifier_col's F.log(val + 1.0) op order
        return np.log(fv + 1.0)
    if modifier == "sqrt":
        return np.sqrt(fv)
    if modifier == "square":
        return fv * fv
    if modifier == "reciprocal":
        with np.errstate(divide="ignore"):
            return 1.0 / fv
    raise ValueError(f"unknown modifier {modifier!r}: {MODIFIERS}")


def _function_score_kernel(
    spark: SparkSession,
    postings: DataFrame,
    meta: IndexMeta,
    queries,
    docvalues: DataFrame,
    field: str,
    factor: float,
    modifier: str,
    missing: float,
    boost_mode: str,
    k: int,
    term_stats,
    tokenizer,
) -> DataFrame:
    """The kernel strategy's body (see ``function_score_index``).
    Collect contract for the query batch; the doc-values side arrives
    cogrouped by the SAME segment ids the postings carry
    (build_postings_with_docvalues pins them together)."""
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
    from sgpt_spark.operators.topk import SCORE_DECIMALS

    q, qid_type = normalize_queries(queries)
    if not isinstance(q, DataFrame):
        q = spark.createDataFrame(q, f"qid {qid_type}, query string")
    tok = tokenizer or resolve_py_analyzer(meta.analyzer)
    qid_t = q.schema["qid"].dataType.simpleString()
    seg_schema = f"qid {qid_t}, doc_id long, score double"
    empty = spark.createDataFrame([], seg_schema + ", rank int")

    per_query: dict = {}
    all_terms: set = set()
    for qid, t, qtf in collect_query_terms(q, tokenize=tok):
        per_query.setdefault(qid, []).append((t, int(qtf)))
        all_terms.add(t)
    if not per_query:
        return empty
    terms = sorted(all_terms)
    pruned = postings.filter(F.col("term").isin(terms))
    cand = pruned.select("segment", "term", "blocks")
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
            for r in pruned.groupBy("term").agg(F.sum("df").alias("df")).collect()
        }
    idf = {t: idf_py(d, meta.n_docs) for t, d in global_df.items()}
    weighted = {}
    for qid, tws in per_query.items():
        tws = [(t, qtf * idf[t]) for t, qtf in tws if t in idf]
        if tws:
            weighted[qid] = tws
    if not weighted:
        return empty
    b_state = spark.sparkContext.broadcast(weighted)
    k1, b, avgdl, codec = meta.k1, meta.b, meta.avgdl, meta.codec
    kk = int(k)
    mult = boost_mode == "multiply"
    dvr = docvalues.select(
        F.col("segment").cast("int").alias("segment"),
        "doc_id",
        F.col(field).cast("double").alias("_fv"),
    )

    def fs_kernel(pleft: pd.DataFrame, pright: pd.DataFrame) -> pd.DataFrame:
        w_map = b_state.value
        decoded = (
            _decode_terms(pleft["term"], pleft["blocks"], codec, k1, b, avgdl)
            if len(pleft)
            else {}
        )
        if not decoded:
            return _emit_topk_frame([])
        dv_ids = pright["doc_id"].to_numpy(np.int64)
        dv_fv = pright["_fv"].to_numpy(np.float64)
        order = np.argsort(dv_ids, kind="stable")
        dv_ids, dv_fv = dv_ids[order], dv_fv[order]
        parts: list = []
        for qid, tws in w_map.items():
            present = [(t, w) for t, w in tws if t in decoded]
            if not present:
                continue
            docs_cat = np.concatenate([decoded[t][0] for t, _ in present])
            w_cat = np.concatenate([decoded[t][1] * w for t, w in present])
            ids, inv = np.unique(docs_cat, return_inverse=True)
            sc_raw = np.bincount(inv, weights=w_cat)
            fv = np.full(len(ids), missing, dtype=np.float64)
            if len(dv_ids):
                pos = np.searchsorted(dv_ids, ids)
                pos[pos == len(dv_ids)] = 0
                found = dv_ids[pos] == ids
                got = dv_fv[pos[found]]
                got = np.where(np.isnan(got), missing, got)
                fv[found] = got
            fn = _modifier_np(fv * factor, modifier)
            combined = sc_raw * fn if mult else sc_raw + fn
            sc = np.round(combined, SCORE_DECIMALS)
            order_q = deterministic_topk(ids, sc, kk)
            parts.append((qid, ids[order_q].astype(np.int64), sc[order_q]))
        return _emit_topk_frame(parts)

    seg_topk = (
        cand.groupBy("segment")
        .cogroup(dvr.groupBy("segment"))
        .applyInPandas(fs_kernel, schema=seg_schema)
    )
    return topk_per_group(seg_topk, k=k, round_scores=False).select(
        "qid", "doc_id", "score", "rank"
    )


# ---- the full ES function family ---------------------------------------------
#
# ES function_score requests carry a LIST of functions, each an object
# with at most one function type plus optional ``filter`` and
# ``weight``; the per-doc function values combine under ``score_mode``,
# cap at ``max_boost``, and meet the query score under ``boost_mode``
# (full six-mode set), with ``min_score`` excluding docs below the bar.
# The engine mirrors the request JSON as plain dicts (the span-family
# convention):
#
#     {"field_value_factor": {"field": "n_chars", "modifier": "log1p"},
#      "weight": 2.0, "filter": "lang = 'en'"}
#     {"gauss": {"field": "n_chars", "origin": 500, "scale": 200}}
#     {"random_score": {"seed": "42"}}
#     {"script_score": {"source": "sqrt(_score) + n_chars / 100"}}
#     {"weight": 3.0}
#
# Everything compiles to whole-stage-codegen columns over ONE docvalues
# left join on the full scored match set — no UDF, no second pass.

DECAY_KINDS = ("gauss", "exp", "linear")
SCORE_MODES = ("multiply", "sum", "avg", "first", "max", "min")
FULL_BOOST_MODES = ("multiply", "replace", "sum", "avg", "max", "min")
FUNCTION_KINDS = (
    "field_value_factor",
    "gauss",
    "exp",
    "linear",
    "random_score",
    "script_score",
)


def decay_col(
    kind: str,
    value: Column,
    origin: float,
    scale: float,
    offset: float = 0.0,
    decay: float = 0.5,
) -> Column:
    """ES numeric decay function as a pure codegen column — the Lucene
    DecayFunction math over ``dist = max(0, |value - origin| - offset)``:

    * gauss:  exp(-dist^2 / (2 sigma^2)),  sigma^2 = -scale^2 / (2 ln decay)
    * exp:    exp(lambda dist),            lambda  = ln(decay) / scale
    * linear: max(0, (s - dist) / s),      s       = scale / (1 - decay)

    so the function is exactly ``decay`` at distance ``scale`` past the
    offset, 1 inside the offset. Validates scale > 0 and 0 < decay < 1
    (the ES request rules). NULL handling is the caller's (ES returns 1
    for docs missing the field)."""
    import math as _m

    if kind not in DECAY_KINDS:
        raise ValueError(f"unknown decay kind {kind!r}: {DECAY_KINDS}")
    if not scale > 0:
        raise ValueError(f"decay scale must be > 0, got {scale}")
    if not (0.0 < decay < 1.0):
        raise ValueError(f"decay must be in (0, 1), got {decay}")
    dist = F.greatest(
        F.abs(value - F.lit(float(origin))) - F.lit(float(offset)), F.lit(0.0)
    )
    if kind == "gauss":
        sigma_sq = -(scale * scale) / (2.0 * _m.log(decay))
        return F.exp(-(dist * dist) / F.lit(2.0 * sigma_sq))
    if kind == "exp":
        lam = _m.log(decay) / scale
        return F.exp(dist * F.lit(lam))
    s = scale / (1.0 - decay)
    return F.greatest((F.lit(s) - dist) / F.lit(s), F.lit(0.0))


def random_score_col(id_col: Column, seed) -> Column:
    """ES ``random_score`` made deterministic AND cross-engine
    reproducible: uniform [0, 1) from the engine's md5-arithmetic idiom
    (``uint32(md5(id || ':rs:' || seed)) / 2^32`` — the
    derive_geo_docvalues / stub-encoder pattern, bit-identical in
    DuckDB), where ES hashes (seed, _seq_no) with a JVM-private hash.
    Same contract — per-doc uniform, stable under reshuffling — with a
    portable spelling."""
    h = F.md5(F.concat(id_col.cast("string"), F.lit(f":rs:{seed}")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("double") / F.lit(
        float(2**32)
    )


def _compile_function(fn: dict, docvalues_cols: list[str], idx: int) -> tuple[Column, Column, float]:
    """One request-shaped function dict -> (value column with weight
    applied, applicability column, weight). ``_score`` in script
    sources resolves to the query score column."""
    known = {"filter", "weight", *FUNCTION_KINDS}
    bad = set(fn) - known
    if bad:
        raise ValueError(f"function #{idx}: unknown keys {sorted(bad)}; expected one of {sorted(known)}")
    kinds = [k for k in FUNCTION_KINDS if k in fn]
    if len(kinds) > 1:
        raise ValueError(f"function #{idx}: at most one function type, got {kinds}")
    weight = float(fn.get("weight", 1.0))
    if not kinds:
        if "weight" not in fn:
            raise ValueError(f"function #{idx}: needs a function type or a weight")
        val = F.lit(1.0)
    else:
        kind, p = kinds[0], fn[kinds[0]]
        if kind == "field_value_factor":
            field = p["field"]
            if field not in docvalues_cols:
                raise ValueError(
                    f"function #{idx}: field {field!r} not in docvalues columns {docvalues_cols}"
                )
            modifier = p.get("modifier", "none")
            if modifier not in MODIFIERS:
                raise ValueError(f"function #{idx}: unknown modifier {modifier!r}: {MODIFIERS}")
            fv = F.coalesce(
                F.col(field).cast("double"), F.lit(float(p.get("missing", 1.0)))
            )
            val = _modifier_col(fv * F.lit(float(p.get("factor", 1.0))), modifier)
        elif kind in DECAY_KINDS:
            field = p["field"]
            if field not in docvalues_cols:
                raise ValueError(
                    f"function #{idx}: field {field!r} not in docvalues columns {docvalues_cols}"
                )
            dc = decay_col(
                kind,
                F.col(field).cast("double"),
                origin=float(p["origin"]),
                scale=float(p["scale"]),
                offset=float(p.get("offset", 0.0)),
                decay=float(p.get("decay", 0.5)),
            )
            # ES: a doc missing the decay field scores 1
            val = F.when(F.col(field).isNull(), F.lit(1.0)).otherwise(dc)
        elif kind == "random_score":
            val = random_score_col(F.col(p.get("field", "doc_id")), p.get("seed", 0))
        else:  # script_score
            val = F.expr(p["source"]).cast("double")
    return val * F.lit(weight), _applicable_col(fn.get("filter")), weight


def _applicable_col(filter_expr: str | None) -> Column:
    if filter_expr is None:
        return F.lit(True)
    # NULL docvalues (unmatched left-join rows included) never match —
    # the ES filter-context rule
    return F.coalesce(F.expr(filter_expr).cast("boolean"), F.lit(False))


def _combine_functions(parts, score_mode: str) -> Column:
    """(value, applicable, weight) triples -> the combined function
    score column. ES contract: functions whose filter does not match a
    doc contribute nothing; a doc matched by NO function scores 1.

    A function whose VALUE evaluates to NULL (a script_score over a
    NULL doc value, a field_value_factor column missing after the left
    join) is treated as NOT APPLICABLE for that doc — folded into the
    applicability condition below — so the combine stays deterministic
    instead of propagating NULL into the final score (whose top-k
    placement would be undefined). first/max/min already behaved this
    way (coalesce/greatest skip NULLs); this pins multiply/sum/avg to
    the same rule."""
    parts = [(v, a & v.isNotNull(), w) for v, a, w in parts]
    applied = [F.when(a, v) for v, a, _ in parts]  # NULL when not applicable
    if score_mode == "first":
        return F.coalesce(*applied, F.lit(1.0))
    if score_mode in ("max", "min"):
        agg = (F.greatest if score_mode == "max" else F.least)(*applied) if len(
            applied
        ) > 1 else applied[0]
        return F.coalesce(agg, F.lit(1.0))
    any_applies = None
    for _, a, _w in parts:
        any_applies = a if any_applies is None else (any_applies | a)
    if score_mode == "multiply":
        prod = F.lit(1.0)
        for v, a, _ in parts:
            prod = F.when(a, prod * v).otherwise(prod)
        return prod
    num = sum(
        (F.when(a, v).otherwise(F.lit(0.0)) for v, a, _ in parts), F.lit(0.0)
    )
    if score_mode == "sum":
        return F.when(any_applies, num).otherwise(F.lit(1.0))
    # avg — ES's WEIGHTED average: sum(w_i v_i) / sum(w_i) over matches
    den = sum(
        (F.when(a, F.lit(w)).otherwise(F.lit(0.0)) for _, a, w in parts),
        F.lit(0.0),
    )
    return F.when(any_applies, num / den).otherwise(F.lit(1.0))


def function_score_multi(
    spark: SparkSession,
    postings: DataFrame,
    meta: IndexMeta,
    queries: DataFrame | Iterable[tuple],
    docvalues: DataFrame,
    functions: list[dict],
    score_mode: str = "multiply",
    boost_mode: str = "multiply",
    max_boost: float | None = None,
    min_score: float | None = None,
    boost: float = 1.0,
    k: int = 10,
    term_stats: DataFrame | None = None,
    tokenizer=None,
    strategy: str = "kernel",
) -> DataFrame:
    """The FULL ES ``function_score`` request -> (qid, doc_id, score,
    rank): every function in the list evaluated per matching doc
    (filter-gated), combined under ``score_mode``, capped at
    ``max_boost``, met with the (``boost``-scaled) query score under
    ``boost_mode``, ``min_score``-filtered (kept iff final >= bar,
    applied to the raw double before the 6-dp ranking round), then the
    engine's deterministic top-k.

    ``strategy='kernel'`` (default, r6): when no function references
    ``_score`` (script_score with ``_score`` needs the query score per
    row) and the sidecar is segment-aligned, the ENTIRE function
    battery — filters, decay, fvf, random_score, score_mode combine,
    max_boost cap — compiles to ONE whole-stage-codegen column over
    the doc-values relation (bit-identical to the relational
    projection: same Column expressions), and only that per-doc value
    cogroups with the pruned postings; the kernel gathers it per hit
    doc and applies boost_mode/min_score per segment, <= k rows per
    (query, segment). The full scored match set never shuffles.
    Assumes the sidecar covers every indexed doc (the
    build_postings_with_docvalues invariant); pass
    ``strategy='relational'`` for partial external sidecars — that
    pinned spelling (the verification twin) is also the automatic
    fallback for ``_score`` scripts and segment-less sidecars.

    Relational plan shape: the gated match_scores relation (term-pruned
    scan, one shuffle) + ONE docvalues left join + pure codegen
    arithmetic — N functions add N projections, never N passes."""
    if score_mode not in SCORE_MODES:
        raise ValueError(f"unknown score_mode {score_mode!r}: {SCORE_MODES}")
    if boost_mode not in FULL_BOOST_MODES:
        raise ValueError(f"unknown boost_mode {boost_mode!r}: {FULL_BOOST_MODES}")
    if not functions:
        raise ValueError("function_score needs at least one function")
    if strategy not in ("kernel", "relational"):
        raise ValueError(
            f"unknown strategy {strategy!r}: use kernel|relational"
        )
    dv_cols = [c for c in docvalues.columns if c != "doc_id"]
    parts = [
        _compile_function(fn, dv_cols, i) for i, fn in enumerate(functions)
    ]
    fs = _combine_functions(parts, score_mode)
    if max_boost is not None:
        fs = F.least(fs, F.lit(float(max_boost)))
    uses_score = any(
        "_score" in fn.get("script_score", {}).get("source", "")
        for fn in functions
    )
    if (
        strategy == "kernel"
        and not uses_score
        and "segment" in docvalues.columns
    ):
        return _function_score_multi_kernel(
            spark, postings, meta, queries, docvalues, fs, boost_mode,
            float(boost), min_score, k, term_stats, tokenizer,
        )
    qs = F.col("_score") * F.lit(float(boost))
    combined = {
        "multiply": qs * fs,
        "replace": fs,
        "sum": qs + fs,
        "avg": (qs + fs) / F.lit(2.0),
        "max": F.greatest(qs, fs),
        "min": F.least(qs, fs),
    }[boost_mode]
    scored = match_scores(
        spark, postings, meta, queries, term_stats=term_stats, tokenizer=tokenizer
    ).withColumnRenamed("score", "_score")
    rescored = scored.join(docvalues, "doc_id", "left").select(
        "qid", "doc_id", combined.alias("score")
    )
    if min_score is not None:
        rescored = rescored.filter(F.col("score") >= F.lit(float(min_score)))
    return topk_per_group(rescored, k=k).select("qid", "doc_id", "score", "rank")


def _function_score_multi_kernel(
    spark: SparkSession,
    postings: DataFrame,
    meta: IndexMeta,
    queries,
    docvalues: DataFrame,
    fs,
    boost_mode: str,
    boost: float,
    min_score: float | None,
    k: int,
    term_stats,
    tokenizer,
) -> DataFrame:
    """The multi-function kernel body (see ``function_score_multi``):
    ``fs`` is the fully-combined per-doc function column, evaluated by
    the JVM over the doc-values relation; the kernel only gathers it
    and meets it with each query's raw BM25 sum under ``boost_mode``."""
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
    from sgpt_spark.operators.topk import SCORE_DECIMALS

    q, qid_type = normalize_queries(queries)
    if not isinstance(q, DataFrame):
        q = spark.createDataFrame(q, f"qid {qid_type}, query string")
    tok = tokenizer or resolve_py_analyzer(meta.analyzer)
    qid_t = q.schema["qid"].dataType.simpleString()
    seg_schema = f"qid {qid_t}, doc_id long, score double"
    empty = spark.createDataFrame([], seg_schema + ", rank int")

    per_query: dict = {}
    all_terms: set = set()
    for qid, t, qtf in collect_query_terms(q, tokenize=tok):
        per_query.setdefault(qid, []).append((t, int(qtf)))
        all_terms.add(t)
    if not per_query:
        return empty
    terms = sorted(all_terms)
    pruned = postings.filter(F.col("term").isin(terms))
    cand = pruned.select("segment", "term", "blocks")
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
            for r in pruned.groupBy("term").agg(F.sum("df").alias("df")).collect()
        }
    idf = {t: idf_py(d, meta.n_docs) for t, d in global_df.items()}
    weighted = {}
    for qid, tws in per_query.items():
        tws = [(t, qtf * idf[t]) for t, qtf in tws if t in idf]
        if tws:
            weighted[qid] = tws
    if not weighted:
        return empty
    b_state = spark.sparkContext.broadcast(weighted)
    k1, b, avgdl, codec = meta.k1, meta.b, meta.avgdl, meta.codec
    kk = int(k)
    ms = None if min_score is None else float(min_score)
    dvf = docvalues.select(
        F.col("segment").cast("int").alias("segment"),
        "doc_id",
        fs.cast("double").alias("_fn"),
    )

    def combine(qs: "np.ndarray", fn: "np.ndarray") -> "np.ndarray":
        if boost_mode == "multiply":
            return qs * fn
        if boost_mode == "replace":
            return fn
        if boost_mode == "sum":
            return qs + fn
        if boost_mode == "avg":
            return (qs + fn) / 2.0
        if boost_mode == "max":
            return np.maximum(qs, fn)
        return np.minimum(qs, fn)

    def fsm_kernel(pleft: pd.DataFrame, pright: pd.DataFrame) -> pd.DataFrame:
        w_map = b_state.value
        decoded = (
            _decode_terms(pleft["term"], pleft["blocks"], codec, k1, b, avgdl)
            if len(pleft)
            else {}
        )
        if not decoded:
            return _emit_topk_frame([])
        dv_ids = pright["doc_id"].to_numpy(np.int64)
        dv_fn = pright["_fn"].to_numpy(np.float64)
        order = np.argsort(dv_ids, kind="stable")
        dv_ids, dv_fn = dv_ids[order], dv_fn[order]
        parts: list = []
        for qid, tws in w_map.items():
            present = [(t, w) for t, w in tws if t in decoded]
            if not present:
                continue
            docs_cat = np.concatenate([decoded[t][0] for t, _ in present])
            w_cat = np.concatenate([decoded[t][1] * w for t, w in present])
            ids, inv = np.unique(docs_cat, return_inverse=True)
            qs = np.bincount(inv, weights=w_cat) * boost
            fn = np.full(len(ids), np.nan, dtype=np.float64)
            if len(dv_ids):
                pos = np.searchsorted(dv_ids, ids)
                pos[pos == len(dv_ids)] = 0
                found = dv_ids[pos] == ids
                fn[found] = dv_fn[pos[found]]
            combined = combine(qs, fn)
            if ms is not None:
                keep = combined >= ms
                ids, combined = ids[keep], combined[keep]
                if not len(ids):
                    continue
            sc = np.round(combined, SCORE_DECIMALS)
            order_q = deterministic_topk(ids, sc, kk)
            parts.append((qid, ids[order_q].astype(np.int64), sc[order_q]))
        return _emit_topk_frame(parts)

    seg_topk = (
        cand.groupBy("segment")
        .cogroup(dvf.groupBy("segment"))
        .applyInPandas(fsm_kernel, schema=seg_schema)
    )
    return topk_per_group(seg_topk, k=k, round_scores=False).select(
        "qid", "doc_id", "score", "rank"
    )
