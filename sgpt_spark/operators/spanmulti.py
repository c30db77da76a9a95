"""ES ``span_multi`` — Lucene's SpanMultiTermQueryWrapper: a span node
that wraps a MultiTermQuery (``prefix`` / ``wildcard`` / ``regexp`` /
``fuzzy``) so pattern matches can participate in positional span
algebra (``span_near`` of a prefix next to a term, etc.).

The reference's retrieval stack is Elasticsearch/Lucene
(crossencoder/beir/crossencoder_beir_bm25.ipynb cell 10); ``span_multi``
is the last member of the ES span family
(span_term/near/or/first/not/containing/within live in
``operators/spans.py``). Lucene rewrites the wrapper against the term
dictionary into a ``SpanOrQuery`` over the concrete matching terms
(SpanMultiTermQueryWrapper.SpanRewriteMethod; the top-terms variant
caps the expansion). This engine does exactly that, relationally:

  1. EXPANSION — every pattern in every query tree batches into ONE
     dictionary join per pattern kind (the ``operators/multiterm``
     expanders: prefix equi-join on substring length, wildcard literal
     prefix + LIKE, regexp literal run + RLIKE, fuzzy length-band +
     levenshtein), capped at ``max_expansions`` terms per pattern
     (term order for the constant-boost kinds, boost desc / term asc
     for fuzzy — Lucene's top-terms priority queue). Only the matched
     terms (<= patterns x max_expansions rows) are collected; the
     dictionary itself never leaves the cluster.
  2. REWRITE — each ``span_multi`` node becomes
     ``{"span_or": {"clauses": [matched terms...]}}``; the concrete
     tree then rides the ordinary ``span_search_index`` path
     unchanged (one term-pruned positional scan, segment-local span
     walk, global deterministic top-k).

An expansion can be EMPTY (no dictionary term matches). The rewrite
then simplifies the tree by the span algebra — an unmatchable node
poisons every conjunctive ancestor:

  - ``span_or``: drop the empty clause; all clauses empty -> node empty
  - ``span_near`` / ``span_containing`` / ``span_within`` /
    ``span_first``: any empty child -> node empty (it can never match)
  - ``span_not``: empty include -> empty; empty EXCLUDE -> the include
    subtree alone (nothing to exclude)
  - an empty root contributes no result rows for that query (the
    other queries in the batch still run)

Scoring follows the span family's pseudo-term contract (spans.py
module docstring): the rewritten tree's positive leaf terms — i.e. the
EXPANDED terms — sum their idfs into the query weight, which is
Lucene's own multi-term span scoring (SpanWeight builds its
similarity weight from ALL term statistics of the rewritten query).
Fuzzy boosts order the kept expansion set but do not scale clause
scores — SpanOr has no per-clause boost, in Lucene or here.

Node shape (patterns are EXACT index terms / dictionary patterns, not
analyzed — the span family contract)::

    {"span_multi": {"match": {"prefix":   "qui"}}}
    {"span_multi": {"match": {"wildcard": "qu?ck*"}}}
    {"span_multi": {"match": {"regexp":   "qu[io]ck"}}}
    {"span_multi": {"match": {"fuzzy": {"value": "quikc",
                                        "fuzziness": 2,
                                        "prefix_length": 0}}},
     "max_expansions": 20}        # optional per-node cap

Any node of the concrete span grammar may appear anywhere a
``span_multi`` may, and vice versa — trees mix freely.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sgpt_spark.operators.spans import (
    _NODE_KEYS,
    span_search_index,
    validate_span_tree,
)

__all__ = [
    "expand_span_multi",
    "span_multi_search_index",
    "validate_span_multi_tree",
]

_MT_KINDS = ("prefix", "wildcard", "regexp", "fuzzy")


def _is_multi(tree) -> bool:
    return isinstance(tree, dict) and len(tree) == 1 and "span_multi" in tree


def _multi_body(tree) -> tuple[str, object, int | None]:
    """span_multi node -> (kind, spec, per-node max_expansions or None
    for 'use the call default'); raises on malformed nodes."""
    body = tree["span_multi"]
    if not isinstance(body, dict) or "match" not in body:
        raise ValueError(f"span_multi needs a 'match' body, got {body!r}")
    match = body["match"]
    if not isinstance(match, dict) or len(match) != 1:
        raise ValueError(
            f"span_multi match must be a one-key dict among {_MT_KINDS}, "
            f"got {match!r}"
        )
    kind, spec = next(iter(match.items()))
    if kind not in _MT_KINDS:
        raise ValueError(f"span_multi wraps one of {_MT_KINDS}, got {kind!r}")
    if kind == "fuzzy":
        if isinstance(spec, str):
            spec = {"value": spec}
        if not isinstance(spec, dict) or not spec.get("value"):
            raise ValueError(f"fuzzy needs a non-empty 'value', got {spec!r}")
    elif not isinstance(spec, str) or not spec:
        raise ValueError(f"{kind} needs a non-empty pattern, got {spec!r}")
    cap = body.get("max_expansions")
    if cap is not None and (not isinstance(cap, int) or cap < 1):
        raise ValueError(f"max_expansions must be an int >= 1, got {cap!r}")
    return kind, spec, cap


def validate_span_multi_tree(tree) -> None:
    """Structural validation of the EXTENDED grammar (concrete span
    nodes + span_multi); raises ValueError on the first bad node."""
    if _is_multi(tree):
        _multi_body(tree)
        return
    if isinstance(tree, str):
        return validate_span_tree(tree)
    if not isinstance(tree, dict) or len(tree) != 1:
        raise ValueError(
            f"span tree node must be a term string or a one-key dict among "
            f"{_NODE_KEYS + ('span_multi',)}, got {tree!r}"
        )
    kind, body = next(iter(tree.items()))
    if kind == "span_term":
        return validate_span_tree(tree)
    if kind in ("span_near", "span_or"):
        clauses = body["clauses"] if isinstance(body, dict) else body
        if not isinstance(clauses, (list, tuple)) or not clauses:
            raise ValueError(f"{kind} needs a non-empty clauses list")
        if kind == "span_near":
            slop = body.get("slop", 0)
            if not isinstance(slop, int) or slop < 0:
                raise ValueError(
                    f"span_near slop must be an int >= 0, got {slop!r}"
                )
        for c in clauses:
            validate_span_multi_tree(c)
    elif kind == "span_first":
        end = body.get("end") if isinstance(body, dict) else None
        if not isinstance(end, int) or end < 1:
            raise ValueError(f"span_first needs end >= 1, got {end!r}")
        validate_span_multi_tree(body["match"])
    elif kind == "span_not":
        pre, post = body.get("pre", 0), body.get("post", 0)
        if min(pre, post) < 0:
            raise ValueError(
                f"span_not pre/post must be >= 0, got {pre}/{post}"
            )
        validate_span_multi_tree(body["include"])
        validate_span_multi_tree(body["exclude"])
    elif kind in ("span_containing", "span_within"):
        validate_span_multi_tree(body["big"])
        validate_span_multi_tree(body["little"])
    else:
        raise ValueError(
            f"unknown span node {kind!r}: one of "
            f"{_NODE_KEYS + ('span_multi',)}"
        )


def _collect_patterns(tree, out: list) -> None:
    """Append every span_multi (kind, spec, cap) in tree order; ids are
    the positions in ``out``."""
    if _is_multi(tree):
        out.append(_multi_body(tree))
        return
    if isinstance(tree, str):
        return
    kind, body = next(iter(tree.items()))
    if kind in ("span_near", "span_or"):
        clauses = body["clauses"] if isinstance(body, dict) else body
        for c in clauses:
            _collect_patterns(c, out)
    elif kind == "span_first":
        _collect_patterns(body["match"], out)
    elif kind == "span_not":
        _collect_patterns(body["include"], out)
        _collect_patterns(body["exclude"], out)
    elif kind in ("span_containing", "span_within"):
        _collect_patterns(body["big"], out)
        _collect_patterns(body["little"], out)


def _rewrite(tree, terms_of: dict, cursor: list):
    """Concrete tree with every span_multi replaced by the span_or of
    its expansion (``terms_of[pattern_index]``), simplified by the
    empty-expansion algebra; None = unmatchable subtree."""
    if _is_multi(tree):
        i = cursor[0]
        cursor[0] += 1
        terms = terms_of.get(i, ())
        if not terms:
            return None
        return {"span_or": {"clauses": [{"span_term": t} for t in terms]}}
    if isinstance(tree, str):
        return tree
    kind, body = next(iter(tree.items()))
    if kind == "span_term":
        return tree
    if kind in ("span_near", "span_or"):
        clauses = body["clauses"] if isinstance(body, dict) else body
        new = [_rewrite(c, terms_of, cursor) for c in clauses]
        if kind == "span_or":
            kept = [c for c in new if c is not None]
            if not kept:
                return None
            return {"span_or": {"clauses": kept}}
        if any(c is None for c in new):
            return None
        out = dict(body) if isinstance(body, dict) else {}
        out["clauses"] = new
        return {"span_near": out}
    if kind == "span_first":
        m = _rewrite(body["match"], terms_of, cursor)
        if m is None:
            return None
        return {"span_first": {**body, "match": m}}
    if kind == "span_not":
        inc = _rewrite(body["include"], terms_of, cursor)
        exc = _rewrite(body["exclude"], terms_of, cursor)
        if inc is None:
            return None
        if exc is None:
            return inc
        return {"span_not": {**body, "include": inc, "exclude": exc}}
    big = _rewrite(body["big"], terms_of, cursor)
    little = _rewrite(body["little"], terms_of, cursor)
    if big is None or little is None:
        return None
    return {kind: {"big": big, "little": little}}


def expand_span_multi(
    spark: SparkSession,
    term_stats: DataFrame,
    pairs: list,
    max_expansions: int = 50,
) -> list:
    """[(qid, extended tree)] -> [(qid, concrete tree)] with every
    ``span_multi`` expanded against the (term, df) dictionary and
    rewritten to ``span_or``; queries whose whole tree is unmatchable
    are dropped. All patterns across all queries batch into ONE
    expander join per pattern kind."""
    from sgpt_spark.operators.multiterm import (
        expand_fuzzy,
        expand_prefix,
        expand_regexp,
        expand_wildcard,
    )

    per_tree: list = []     # (qid, tree, first_pattern_index, n_patterns)
    pats: list = []         # (kind, spec, cap) in global order
    for qid, tree in pairs:
        validate_span_multi_tree(tree)
        start = len(pats)
        _collect_patterns(tree, pats)
        per_tree.append((qid, tree, start, len(pats) - start))

    terms_of: dict = {}
    if pats:
        by_kind: dict = {k: [] for k in _MT_KINDS}
        for i, (kind, spec, cap) in enumerate(pats):
            by_kind[kind].append((str(i), spec, cap))
        frames = []
        cap_of = {
            str(i): (cap if cap is not None else max_expansions)
            for i, (_, _, cap) in enumerate(pats)
        }
        global_cap = max(cap_of.values())
        if by_kind["prefix"]:
            frames.append(expand_prefix(
                term_stats,
                spark.createDataFrame(
                    [(u, s) for u, s, _ in by_kind["prefix"]],
                    "qid string, prefix string",
                ),
                max_expansions=global_cap,
            ).select("qid", "term"))
        if by_kind["wildcard"]:
            frames.append(expand_wildcard(
                term_stats,
                spark.createDataFrame(
                    [(u, s) for u, s, _ in by_kind["wildcard"]],
                    "qid string, pattern string",
                ),
                max_expansions=global_cap,
            ).select("qid", "term"))
        if by_kind["regexp"]:
            frames.append(expand_regexp(
                term_stats,
                spark.createDataFrame(
                    [(u, s) for u, s, _ in by_kind["regexp"]],
                    "qid string, pattern string",
                ),
                max_expansions=global_cap,
            ).select("qid", "term"))
        if by_kind["fuzzy"]:
            # one expander call per distinct (max_edits, prefix_length)
            by_knobs: dict = {}
            for u, spec, _ in by_kind["fuzzy"]:
                knobs = (
                    min(int(spec.get("fuzziness", 2)), 2),
                    int(spec.get("prefix_length", 0)),
                )
                by_knobs.setdefault(knobs, []).append((u, spec["value"]))
            for (me_, pl), rows in sorted(by_knobs.items()):
                frames.append(expand_fuzzy(
                    term_stats,
                    spark.createDataFrame(rows, "qid string, qterm string"),
                    max_edits=me_,
                    prefix_length=pl,
                    max_expansions=global_cap,
                ).select("qid", "term"))
        exps = frames[0]
        for f_ in frames[1:]:
            exps = exps.unionByName(f_)
        for r in exps.collect():
            terms_of.setdefault(int(r["qid"]), []).append(r["term"])
        # the expanders keep Lucene's per-kind order (term asc, or boost
        # desc / term asc for fuzzy) up to the LARGEST requested cap;
        # apply each pattern's own cap, then fix clause order
        for i, ts in terms_of.items():
            terms_of[i] = sorted(ts[: cap_of[str(i)]])

    out = []
    for qid, tree, start, n in per_tree:
        if n == 0:
            out.append((qid, tree))
            continue
        cursor = [0]
        sub = {j: terms_of.get(start + j, ()) for j in range(n)}
        concrete = _rewrite(tree, sub, cursor)
        if concrete is not None:
            out.append((qid, concrete))
    return out


def span_multi_search_index(
    spark: SparkSession,
    path: str,
    queries,
    k: int = 10,
    term_stats: DataFrame | None = None,
    max_expansions: int = 50,
) -> DataFrame:
    """ES span query with ``span_multi`` nodes over a persisted
    positional index -> (qid, doc_id, score, rank). ``queries``:
    (qid, tree) pairs in the extended grammar (module docstring);
    trees without span_multi nodes pass straight through, so this is a
    drop-in superset of ``span_search_index``."""
    from sgpt_spark.operators.indexer import read_term_stats

    pairs = (
        [(r["qid"], r["query"]) for r in queries.collect()]
        if isinstance(queries, DataFrame)
        else list(queries)
    )
    tstats = term_stats
    if tstats is None:
        try:
            tstats = read_term_stats(spark, path)
        except Exception:
            tstats = (
                spark.read.parquet(f"{path}/positions")
                .filter(F.col("term").isNotNull())
                .groupBy("term")
                .agg(F.sum("df").alias("df"))
            )
    concrete = expand_span_multi(
        spark, tstats, pairs, max_expansions=max_expansions
    )
    ts_for_scoring = term_stats if isinstance(term_stats, DataFrame) else None
    return span_search_index(
        spark, path, concrete, k=k, term_stats=ts_for_scoring
    )
