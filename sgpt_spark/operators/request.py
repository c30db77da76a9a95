"""ES ``_search`` REQUEST executor — one search body dict in,
DataFrames out.

The reference never calls operators directly: it builds ES search
BODIES and POSTs them (BEIR 0.2.3's ``BM25Search`` assembles the
``multi_match`` body, crossencoder/beir/crossencoder_beir_bm25.ipynb
cell 10). This module is the engine's front door for that shape — a
user of the reference can hand over the same dict and get the same
semantics, dispatched to the operators that already carry the math,
the oracles, and the scale contracts. Nothing here computes; it
VALIDATES and ROUTES (every branch is a thin adapter onto a tested
operator, so the dispatcher adds no new semantics to verify beyond the
routing itself).

``search_request(spark, path, body, ...)`` executes ONE request body
(the ES unit of work) and returns the response as a dict:

    {"hits": DataFrame(qid, doc_id, score, rank[, ...]),
     "aggregations": {name: DataFrame},      # when body has "aggs"
     "highlight": DataFrame}                 # when body has "highlight"

Supported body surface (guarded loudly otherwise — the error names the
direct operator for everything not routed):

  query: match, match_phrase (slop), multi_match (best_fields /
         most_fields / cross_fields via the type dispatcher), bool
         (match clauses + term/range/exists structured filters,
         minimum_should_match), constant_score (match filter), ids,
         match_all, prefix, wildcard, regexp, fuzzy, terms_set,
         query_string, simple_query_string
  top level: size, from, min_score, search_after (+ the implicit
         (score desc, doc_id asc) sort), sort (doc-values fields, match
         queries), collapse, rescore (the ES phrase rescorer), aggs
         (terms [+ metric sub-aggs], histogram, date_histogram, range,
         date_range, stats, cardinality, value_count, missing),
         highlight

Index layouts resolve automatically from ``path``: a multifield layout
(``fields.json``) serves multi_match; a positional layout
(``positions/``) serves phrase / rescore / highlight / query_string /
simple_query_string and everything block-postings-backed (the derived
postings); a plain postings layout serves the rest. ``docvalues`` is
the build's sidecar relation — required by aggs / sort / collapse /
structured bool filters / ids / match_all (the doc-id universe), and
refused with a clear message when absent.

Scale notes: the dispatcher adds NO driver work beyond reading two
meta files; every routed plan keeps its operator's contract (term-
pruned scans, <= k rows per (query, segment), broadcast query sets at
the interactive sizes this entry point serves — the batch/cogroup/join
twins remain the direct-call surface for million-query offline runs).
"""

from __future__ import annotations

import os
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["search_request"]

_QUERY_KINDS = (
    "match", "match_phrase", "multi_match", "bool", "constant_score",
    "ids", "match_all", "prefix", "wildcard", "regexp", "fuzzy",
    "terms_set", "query_string", "simple_query_string",
)
# named but deliberately routed to their direct operators (each needs
# inputs a single body dict cannot carry faithfully, e.g. clause
# relations or feature sidecars)
_DIRECT_ONLY = {
    "dis_max": "operators.compound.dis_max_match_index",
    "boosting": "operators.boosting.boosting_search_index",
    "function_score": "operators.funcscore.function_score_multi",
    "rank_feature": "operators.distfeature.rank_feature_search",
    "distance_feature": "operators.distfeature.distance_feature_search",
    "more_like_this": "operators.mlt.more_like_this",
    "percolate": "operators.percolate.percolate",
    "intervals": "operators.intervals.intervals_search_index",
    "span_near": "operators.spans.span_search_index",
    "span_term": "operators.spans.span_search_index",
    "has_child": "operators.joinfield.has_child_search",
    "has_parent": "operators.joinfield.has_parent_search",
    "nested": "operators.joinfield.explode_nested + has_child_search",
    "match_bool_prefix": "operators.boolprefix.match_bool_prefix_index",
    "match_phrase_prefix": "operators.phrase_prefix.phrase_prefix_search_index",
    "combined_fields": "operators.crossfields.combined_fields_search (exhaustive; needs the corpus relation — see its norms note)",
    "pinned": "operators.pinned.pinned_search",
    "rank_feature_query": "operators.distfeature.rank_feature_search",
}

_AGG_KINDS = (
    "terms", "histogram", "date_histogram", "range", "date_range",
    "stats", "cardinality", "value_count", "missing",
)


def _layout(spark: SparkSession, path: str) -> dict:
    """Resolve the index layout under ``path`` -> {kind, ...handles}."""
    from sgpt_spark.operators.indexer import read_index, read_term_stats

    if os.path.exists(os.path.join(path, "fields.json")):
        return {"kind": "multifield", "path": path}
    postings, meta = read_index(spark, path)
    return {
        "kind": "positional" if os.path.exists(os.path.join(path, "positions"))
        else "plain",
        "path": path,
        "postings": postings,
        "meta": meta,
        "tstats": read_term_stats(spark, path),
    }


def _match_text(node: Any, what: str) -> tuple[str, str, dict]:
    """{field: text} or {field: {query, ...opts}} -> (field, text, opts)."""
    if not isinstance(node, dict) or len(node) != 1:
        raise ValueError(f"{what} needs exactly one field entry, got {node!r}")
    field, spec = next(iter(node.items()))
    if isinstance(spec, str):
        return field, spec, {}
    if isinstance(spec, dict) and "query" in spec:
        return field, spec["query"], {k: v for k, v in spec.items() if k != "query"}
    raise ValueError(f"{what}[{field}] needs a string or a dict with 'query'")


def _msm_args(opts: dict, what: str) -> dict:
    out = {}
    if "operator" in opts:
        out["operator"] = opts["operator"]
    if "minimum_should_match" in opts:
        out["minimum_should_match"] = int(opts["minimum_should_match"])
    extra = set(opts) - {"operator", "minimum_should_match"}
    if extra:
        raise ValueError(f"unsupported {what} options {sorted(extra)}")
    return out


def _require_dv(docvalues, feature: str) -> DataFrame:
    if docvalues is None:
        raise ValueError(
            f"{feature} needs the docvalues sidecar "
            "(build_postings_with_docvalues); pass docvalues="
        )
    return docvalues


def _hits(spark, lay, qnode, qid, k, docvalues, after):
    """Route body['query'] -> (hits DataFrame, match-query text or None)."""
    kind = next(iter(qnode))
    if len(qnode) != 1:
        raise ValueError(f"query must have exactly one clause, got {list(qnode)}")
    spec = qnode[kind]
    if kind in _DIRECT_ONLY:
        raise ValueError(
            f"query kind {kind!r} is served by {_DIRECT_ONLY[kind]} "
            "(its inputs don't fit a single body dict)"
        )
    if kind not in _QUERY_KINDS:
        raise ValueError(f"unknown query kind {kind!r}: {_QUERY_KINDS}")

    if kind == "multi_match":
        if lay["kind"] != "multifield":
            raise ValueError("multi_match needs a build_multifield_index layout")
        from sgpt_spark.operators.crossfields import multi_match_index
        from sgpt_spark.operators.search import parse_field_boosts

        spec = dict(spec)
        text = spec.pop("query")
        mm_type = spec.pop("type", "best_fields")
        tie = spec.pop("tie_breaker", None)
        fields_spec = spec.pop("fields", None)
        kw = _msm_args(spec, "multi_match")
        if fields_spec:
            fields, boosts = parse_field_boosts(fields_spec)
            kw["fields"] = fields
            if boosts:
                kw["boosts"] = boosts
        return multi_match_index(
            spark, lay["path"], [(qid, text)], mm_type=mm_type, k=k,
            tie_breaker=tie, **kw,
        ), text

    if lay["kind"] == "multifield":
        raise ValueError(
            f"query kind {kind!r} needs a single-field index layout "
            "(this path holds a multifield build)"
        )
    postings, meta, tstats = lay["postings"], lay["meta"], lay["tstats"]

    if kind == "match":
        from sgpt_spark.operators.index_search import search_index

        field, text, opts = _match_text(spec, "match")
        return search_index(
            spark, postings, meta, [(qid, text)], k=k, term_stats=tstats,
            after=after, **_msm_args(opts, "match"),
        ), text
    if kind == "match_phrase":
        from sgpt_spark.operators.positions import phrase_search_index

        field, text, opts = _match_text(spec, "match_phrase")
        slop = int(opts.pop("slop", 0))
        if opts:
            raise ValueError(f"unsupported match_phrase options {sorted(opts)}")
        if lay["kind"] != "positional":
            raise ValueError("match_phrase needs a positional index layout")
        return phrase_search_index(
            spark, lay["path"], [(qid, text)], k=k, term_stats=tstats, slop=slop
        ), text
    if kind == "bool":
        from sgpt_spark.operators.boolquery import bool_search_index

        clauses, filters = [], []
        msm = spec.get("minimum_should_match")
        for occur in ("must", "should", "must_not", "filter"):
            subs = spec.get(occur, [])
            subs = subs if isinstance(subs, list) else [subs]
            for sub in subs:
                skind = next(iter(sub))
                sval = sub[skind]
                if skind == "match":
                    _, text, opts = _match_text(sval, "bool match clause")
                    if opts:
                        raise ValueError(
                            "per-clause match options are not routed; use "
                            "bool_search_index directly"
                        )
                    clauses.append((qid, occur, text))
                elif skind == "term":
                    (fld, val), = sval.items()
                    filters.append((qid, occur, fld, "term", val))
                elif skind == "range":
                    (fld, bounds), = sval.items()
                    for op, val in bounds.items():
                        if op not in ("gte", "gt", "lte", "lt"):
                            raise ValueError(f"unknown range op {op!r}")
                        filters.append((qid, occur, fld, op, val))
                elif skind == "exists":
                    filters.append((qid, occur, sval["field"], "exists", None))
                else:
                    raise ValueError(
                        f"bool sub-query {skind!r} not routed (match/term/"
                        "range/exists are; compose others directly)"
                    )
        dv = _require_dv(docvalues, "structured bool filters") if filters else None
        return bool_search_index(
            spark, postings, meta, clauses, k=k, term_stats=tstats,
            minimum_should_match=msm, filters=filters or None, docvalues=dv,
        ), None
    if kind == "constant_score":
        from sgpt_spark.operators.compound import constant_score_index

        fnode = spec.get("filter")
        if not fnode or next(iter(fnode)) != "match":
            raise ValueError("constant_score routes a match filter; compose others directly")
        _, text, _ = _match_text(fnode["match"], "constant_score filter")
        return constant_score_index(
            spark, postings, meta, [(qid, text)],
            boost=float(spec.get("boost", 1.0)), k=k,
        ), text
    if kind == "ids":
        from sgpt_spark.operators.compound import ids_query

        dv = _require_dv(docvalues, "ids (the doc-id universe)")
        return ids_query(dv, [(qid, list(spec["values"]))], k=k), None
    if kind == "match_all":
        from sgpt_spark.operators.compound import match_all_query

        dv = _require_dv(docvalues, "match_all (the doc-id universe)")
        return match_all_query(
            dv, [qid], boost=float(spec.get("boost", 1.0)) if spec else 1.0, k=k
        ), None
    if kind in ("prefix", "wildcard", "regexp", "fuzzy"):
        from sgpt_spark.operators import multiterm

        (field, val), = spec.items()
        opts: dict = {}
        if isinstance(val, str):
            pat = val
        else:
            # reject unknown spec keys (the _msm_args rule) and map the
            # routed options through — an ignored "fuzziness" would
            # silently answer a DIFFERENT query at the operator default
            allowed = {
                "prefix": {"value"},
                "wildcard": {"value", "wildcard"},
                "regexp": {"value"},
                "fuzzy": {
                    "value", "fuzziness", "prefix_length", "max_expansions"
                },
            }[kind]
            unknown = sorted(set(val) - allowed)
            if unknown:
                raise ValueError(
                    f"{kind} spec keys {unknown} are not routed here; "
                    f"allowed: {sorted(allowed)} — call the multiterm "
                    "operator directly for anything else"
                )
            pat = val.get("value", val.get("wildcard"))
            if pat is None:
                raise ValueError(f"{kind} spec needs a 'value'")
            if kind == "fuzzy":
                if "fuzziness" in val:
                    opts["max_edits"] = int(val["fuzziness"])
                if "prefix_length" in val:
                    opts["prefix_length"] = int(val["prefix_length"])
                if "max_expansions" in val:
                    opts["max_expansions"] = int(val["max_expansions"])
        fn = {
            "prefix": multiterm.prefix_search_index,
            "wildcard": multiterm.wildcard_search_index,
            "regexp": multiterm.regexp_search_index,
            "fuzzy": multiterm.fuzzy_search_index,
        }[kind]
        return fn(spark, postings, meta, [(qid, pat)], k=k,
                  term_stats=tstats, **opts), None
    if kind == "terms_set":
        from sgpt_spark.operators.termset import terms_set_search_index

        (field, val), = spec.items()
        return terms_set_search_index(
            spark, postings, meta, [(qid, list(val["terms"]))], k=k,
            msm_min=val.get("minimum_should_match"),
            msm_field=val.get("minimum_should_match_field"),
            docvalues=docvalues, term_stats=tstats,
        ), None
    if kind == "query_string":
        from sgpt_spark.operators.luceneqs import query_string_search_index

        if lay["kind"] != "positional":
            raise ValueError("query_string needs a positional index layout")
        return query_string_search_index(
            spark, lay["path"], [(qid, spec["query"])],
            default_operator=spec.get("default_operator", "or"),
            docvalues=docvalues, k=k, term_stats=tstats,
        ), None
    # simple_query_string
    from sgpt_spark.operators.querystring import simple_query_string_index

    if lay["kind"] != "positional":
        raise ValueError("simple_query_string needs a positional index layout")
    return simple_query_string_index(
        spark, lay["path"], [(qid, spec["query"])], k=k,
        default_operator=spec.get("default_operator", "or"),
        minimum_should_match=spec.get("minimum_should_match"),
        term_stats=tstats,
    ), None


def _aggs(spark, lay, text, qid, aggs_body, docvalues):
    from sgpt_spark.operators import aggs as A
    from sgpt_spark.operators.aggs_misc import date_range_agg
    from sgpt_spark.operators.stat_aggs import missing_agg, value_count_agg

    dv = _require_dv(docvalues, "aggs")
    cand = A.match_candidates(
        spark, lay["postings"], lay["meta"], [(qid, text)]
    )
    out = {}
    for name, node in aggs_body.items():
        sub = node.get("aggs", {})
        kinds = [kk for kk in node if kk != "aggs"]
        if len(kinds) != 1:
            raise ValueError(f"agg {name!r} needs exactly one kind, got {kinds}")
        kind = kinds[0]
        spec = node[kind]
        if kind not in _AGG_KINDS:
            raise ValueError(
                f"agg kind {kind!r} not routed here ({_AGG_KINDS}); the "
                "extended families are direct calls (aggs_ext/stat_aggs/"
                "pipeline_aggs/aggs_misc/geo)"
            )
        metrics = []
        for mname, mnode in sub.items():
            (mkind, mspec), = mnode.items()
            metrics.append((mkind, mspec["field"]))
        if kind == "terms":
            out[name] = A.terms_agg(
                cand, dv, spec["field"], size=int(spec.get("size", 10)),
                metrics=metrics,
            )
            continue
        if metrics:
            raise ValueError(f"metric sub-aggs route inside terms only (agg {name!r})")
        if kind == "histogram":
            out[name] = A.histogram_agg(
                cand, dv, spec["field"], interval=int(spec["interval"]),
                min_doc_count=int(spec.get("min_doc_count", 0)),
            )
        elif kind == "date_histogram":
            out[name] = A.date_histogram_agg(
                cand, dv, spec["field"],
                calendar_interval=spec.get("calendar_interval", "month"),
                min_doc_count=int(spec.get("min_doc_count", 0)),
            )
        elif kind == "range":
            out[name] = A.range_agg(
                cand, dv, spec["field"],
                [(r.get("from"), r.get("to")) for r in spec["ranges"]],
            )
        elif kind == "date_range":
            out[name] = date_range_agg(
                cand, dv, spec["field"],
                [(r.get("from"), r.get("to")) for r in spec["ranges"]],
            )
        elif kind == "stats":
            out[name] = A.stats_agg(cand, dv, spec["field"])
        elif kind == "cardinality":
            out[name] = A.cardinality_agg(cand, dv, spec["field"])
        elif kind == "value_count":
            out[name] = value_count_agg(cand, dv, spec["field"])
        else:
            out[name] = missing_agg(cand, dv, spec["field"])
    return out


def search_request(
    spark: SparkSession,
    path: str,
    body: dict,
    qid=0,
    docvalues: DataFrame | None = None,
) -> dict:
    """Execute one ES ``_search`` body against the index at ``path`` ->
    {"hits": DataFrame, "aggregations": {...}, "highlight": DataFrame}
    (the last two only when requested). See the module docstring for
    the routed surface; everything else raises naming the direct
    operator."""
    known = {"query", "size", "from", "min_score", "sort", "aggs",
             "collapse", "rescore", "highlight", "search_after"}
    extra = set(body) - known
    if extra:
        raise ValueError(f"unsupported body keys {sorted(extra)}: routed keys are {sorted(known)}")
    qnode = body.get("query", {"match_all": {}})
    size = int(body.get("size", 10))
    frm = int(body.get("from", 0))
    if size < 0 or frm < 0:
        raise ValueError(f"size/from must be >= 0, got {size}/{frm}")
    lay = _layout(spark, path)

    after = None
    if "search_after" in body:
        sa = body["search_after"]
        if next(iter(qnode)) != "match":
            raise ValueError("search_after routes with a match query; use the operators' after= directly otherwise")
        clash = sorted({"sort", "rescore", "collapse"} & set(body))
        if clash:
            # guarded loudly: those branches return without threading
            # the cursor, which would silently re-serve page 1 (ES
            # pairs search_after WITH sort — page those operators
            # directly with their own after=/keyset arguments)
            raise ValueError(
                f"search_after combined with {clash} is not threaded in "
                "this entry point; use the operators' keyset arguments "
                "directly"
            )
        # the operator's keyset contract: {qid: (score, doc_id)} cursors
        after = {qid: (float(sa[0]), int(sa[1]))}

    # sort replaces relevance ranking (ES: presence of sort drops _score)
    if "sort" in body:
        from sgpt_spark.operators.fieldsort import sort_search_index

        if lay["kind"] == "multifield":
            raise ValueError(
                "sort needs a single-field index layout in this entry "
                "point (the aggs rule)"
            )
        if next(iter(qnode)) != "match":
            raise ValueError("sort routes with a match query; compose others directly")
        _, text, opts = _match_text(qnode["match"], "match")
        if opts:
            raise ValueError("sort + match options: call sort_search_index directly")
        by = []
        for s in body["sort"]:
            (fld, o), = s.items() if isinstance(s, dict) else [(s, "asc")]
            by.append((fld, o if isinstance(o, str) else o.get("order", "asc")))
        dv = _require_dv(docvalues, "sort")
        hits = sort_search_index(
            spark, lay["postings"], lay["meta"], [(qid, text)], dv, by,
            k=frm + size,
        )
        if frm:
            hits = hits.filter(F.col("rank") > frm)
        resp = {"hits": hits}
        if "aggs" in body:
            resp["aggregations"] = _aggs(spark, lay, text, qid, body["aggs"], docvalues)
        return resp

    if "rescore" in body:
        from sgpt_spark.operators.rescore import rescore_index

        if lay["kind"] != "positional":
            raise ValueError("rescore needs a positional index layout")
        if next(iter(qnode)) != "match":
            raise ValueError("rescore routes over a match query")
        _, text, _ = _match_text(qnode["match"], "match")
        r = body["rescore"]
        rq = r["query"]
        rtext = None
        if "rescore_query" in rq:
            rnode = rq["rescore_query"]
            if next(iter(rnode)) != "match_phrase":
                raise ValueError("rescore_query routes a match_phrase (the ES phrase rescorer)")
            _, rtext, _ = _match_text(rnode["match_phrase"], "rescore_query")
        hits = rescore_index(
            spark, path, [(qid, text)], k=frm + size,
            window_size=int(r.get("window_size", 50)),
            rescore_queries=None if rtext is None else [(qid, rtext)],
            query_weight=float(rq.get("query_weight", 1.0)),
            rescore_query_weight=float(rq.get("rescore_query_weight", 1.0)),
            score_mode=rq.get("score_mode", "total"),
        )
        if frm:
            hits = hits.filter(F.col("rank") > frm)
        return {"hits": hits}

    if "collapse" in body:
        from sgpt_spark.operators.collapse import collapse_search
        from sgpt_spark.operators.funcscore import match_scores

        if lay["kind"] == "multifield":
            raise ValueError(
                "collapse needs a single-field index layout in this "
                "entry point (the aggs rule)"
            )
        if next(iter(qnode)) != "match":
            raise ValueError("collapse routes over a match query")
        _, text, _ = _match_text(qnode["match"], "match")
        dv = _require_dv(docvalues, "collapse")
        scored = match_scores(
            spark, lay["postings"], lay["meta"], [(qid, text)],
            term_stats=lay["tstats"],
        )
        hits = collapse_search(scored, dv, body["collapse"]["field"], k=frm + size)
        if frm:
            hits = hits.filter(F.col("rank") > frm)
        resp = {"hits": hits}
        if "aggs" in body:
            resp["aggregations"] = _aggs(spark, lay, text, qid, body["aggs"], docvalues)
        return resp

    hits, text = _hits(spark, lay, qnode, qid, frm + size, docvalues, after)
    if "min_score" in body:
        ms = float(body["min_score"])
        from pyspark.sql import Window

        filtered = hits.filter(F.col("score") >= ms)
        w = Window.partitionBy("qid").orderBy(
            F.col("score").desc(), F.col("doc_id").asc()
        )
        hits = (
            filtered.drop("rank")
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= frm + size)
        )
    if frm:
        hits = hits.filter(F.col("rank") > frm)
    resp = {"hits": hits}
    if "aggs" in body:
        if text is None:
            raise ValueError(
                "aggs route over text-match queries here; compose "
                "match_candidates + the agg operators directly otherwise"
            )
        if lay["kind"] == "multifield":
            raise ValueError("aggs need a single-field index layout in this entry point")
        resp["aggregations"] = _aggs(spark, lay, text, qid, body["aggs"], docvalues)
    if "highlight" in body:
        from sgpt_spark.operators.highlight import highlight_positions

        if lay["kind"] != "positional":
            raise ValueError("highlight needs a positional index layout")
        if text is None:
            raise ValueError("highlight routes over text-match queries")
        resp["highlight"] = highlight_positions(
            spark, path, resp["hits"], [(qid, text)]
        )
    return resp
