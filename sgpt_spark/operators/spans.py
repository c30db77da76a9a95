"""ES span queries — Lucene's SpanQuery family (``span_term``,
``span_near``, ``span_or``, ``span_first``, ``span_not``,
``span_containing``, ``span_within``) over the positional index.

The reference delegates this DSL to its ES indexes
(crossencoder/beir/crossencoder_beir_bm25.ipynb cell 10); this module
re-expresses the span algebra Spark-first on the same positional
sidecar the phrase/sloppy/intervals family uses. Spans are the
COMPOSABLE positional primitive: where ``intervals`` evaluates one
flat match rule, a span tree nests — ``span_near`` of a ``span_or``
of terms inside a ``span_first``, etc.

Span trees are plain dicts mirroring the ES request shape (leaf terms
are EXACT index terms, not analyzed — the ES span_term contract)::

    {"span_term": "quick"}                       # or just "quick"
    {"span_near": {"clauses": [...], "slop": 2, "in_order": True}}
    {"span_or": {"clauses": [...]}}
    {"span_first": {"match": <tree>, "end": 3}}
    {"span_not": {"include": <tree>, "exclude": <tree>,
                  "pre": 0, "post": 0}}
    {"span_containing": {"big": <tree>, "little": <tree>}}
    {"span_within": {"big": <tree>, "little": <tree>}}

Span semantics (engine contract, documented precisely so the
from-scratch brute force in tests/test_spans.py is the spec):

- positions are 1-based token indexes (the positional index
  convention); a span is an INCLUSIVE (start, end) window.
- every node emits the containment-minimal set of its matching spans
  (no reported span properly contains another reported span) — the
  minimal-interval stance of ``operators.intervals``, applied
  uniformly. This is the one documented divergence from Lucene's raw
  span enumeration (Lucene's SpanOr can emit nested spans; minimal
  sets make frequencies deterministic and composition associative).
- ``span_near``: a window (s, e) matches when one span per clause can
  be chosen, pairwise NON-OVERLAPPING, in clause order when
  ``in_order`` (each next span starts strictly after the previous
  ends), spanning exactly (s, e); windows with
  ``gaps = (e - s + 1) - min_width > slop`` are dropped, where
  ``min_width`` is the tree's minimal covered width (term = 1, or =
  min over clauses, near = sum over clauses) — selection-independent,
  so scoring is deterministic.
- ``span_first``: child spans with ``end <= n`` (the first n tokens).
- ``span_not``: include spans whose [s - pre, e + post] window
  overlaps no exclude span.
- ``span_containing`` / ``span_within``: big spans that contain some
  little span / little spans contained in some big span.

Scoring contract (the positional-family pseudo-term rule): each
top-level reported span contributes ``1 / (1 + gaps)`` with
``gaps = width - min_width(tree)`` to the document's span frequency;
the document scores BM25 as ONE pseudo-term with that fractional
frequency and the summed idf of the tree's DISTINCT leaf terms —
exactly the phrase/sloppy/intervals contract, so span scores are
comparable across the whole positional family. A bare
``{"span_term": t}`` tree therefore scores identically to the match
query's per-term BM25 for that term.

Plan shape (the intervals plumbing): ONE term-pruned scan of the
positions relation (all leaf terms, pushed In(term, ...) filter); per
segment, decode the Arrow batch once, intersect/union candidate docs
bottom-up from the tree (near intersects, or unions — the rarest
clause bounds everything), walk the span algebra per candidate doc,
and ship <= k rows per (query, segment) into the global deterministic
top-k. Queries follow the collect contract (interactive span trees;
the term set broadcasts). Per-candidate cost: ordered near is a
linear pointer walk over minimal child lists; unordered near
backtracks over clause selections with overlap pruning (bounded by
the product of per-DOC clause frequencies — tiny for real span
queries, which target selective terms; the same bound Lucene's
NearSpansUnordered queue pays per doc in its worst case).
"""

from __future__ import annotations

import bisect
from collections import ChainMap
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sgpt_spark.functions.bm25 import idf_py
from sgpt_spark.operators.topk import SCORE_DECIMALS, topk_per_group

__all__ = [
    "eval_spans",
    "span_freq",
    "span_leaf_terms",
    "span_min_width",
    "validate_span_tree",
    "span_search_index",
]

_NODE_KEYS = (
    "span_term",
    "span_near",
    "span_or",
    "span_first",
    "span_not",
    "span_containing",
    "span_within",
)


def _node(tree) -> tuple[str, object]:
    """-> (kind, body), normalizing the string shorthand and refusing
    malformed nodes loudly."""
    if isinstance(tree, str):
        return "span_term", tree
    if not isinstance(tree, dict) or len(tree) != 1:
        raise ValueError(
            f"span tree node must be a term string or a one-key dict "
            f"among {_NODE_KEYS}, got {tree!r}"
        )
    kind, body = next(iter(tree.items()))
    if kind not in _NODE_KEYS:
        raise ValueError(f"unknown span node {kind!r}: one of {_NODE_KEYS}")
    return kind, body


def validate_span_tree(tree) -> None:
    """Structural validation, recursive; raises ValueError on the first
    malformed node (empty clauses, missing keys, bad parameters)."""
    kind, body = _node(tree)
    if kind == "span_term":
        if not isinstance(body, str) or not body:
            raise ValueError(f"span_term needs a non-empty term, got {body!r}")
    elif kind in ("span_near", "span_or"):
        if not isinstance(body, dict) and kind == "span_near":
            raise ValueError("span_near body must be a dict with 'clauses'")
        clauses = body["clauses"] if isinstance(body, dict) else body
        if not isinstance(clauses, (list, tuple)) or not clauses:
            raise ValueError(f"{kind} needs a non-empty clauses list")
        if kind == "span_near":
            slop = body.get("slop", 0)
            if not isinstance(slop, int) or slop < 0:
                raise ValueError(f"span_near slop must be an int >= 0, got {slop!r}")
        for c in clauses:
            validate_span_tree(c)
    elif kind == "span_first":
        end = body.get("end") if isinstance(body, dict) else None
        if not isinstance(end, int) or end < 1:
            raise ValueError(f"span_first needs end >= 1, got {end!r}")
        validate_span_tree(body["match"])
    elif kind == "span_not":
        pre, post = body.get("pre", 0), body.get("post", 0)
        if min(pre, post) < 0:
            raise ValueError(f"span_not pre/post must be >= 0, got {pre}/{post}")
        validate_span_tree(body["include"])
        validate_span_tree(body["exclude"])
    else:  # span_containing / span_within
        validate_span_tree(body["big"])
        validate_span_tree(body["little"])


def span_leaf_terms(tree, positive_only: bool = False) -> set:
    """All leaf terms of the tree. ``positive_only`` skips the branches
    that never CONTRIBUTE matches (span_not excludes) — the set whose
    idfs sum into the pseudo-term weight."""
    kind, body = _node(tree)
    if kind == "span_term":
        return {body}
    if kind in ("span_near", "span_or"):
        clauses = body["clauses"] if isinstance(body, dict) else body
        out: set = set()
        for c in clauses:
            out |= span_leaf_terms(c, positive_only)
        return out
    if kind == "span_first":
        return span_leaf_terms(body["match"], positive_only)
    if kind == "span_not":
        out = span_leaf_terms(body["include"], positive_only)
        if not positive_only:
            out |= span_leaf_terms(body["exclude"], positive_only)
        return out
    return span_leaf_terms(body["big"], positive_only) | span_leaf_terms(
        body["little"], positive_only
    )


def span_min_width(tree) -> int:
    """The tree's minimal covered width — the yardstick the gaps rule
    measures reported windows against (module docstring)."""
    kind, body = _node(tree)
    if kind == "span_term":
        return 1
    if kind == "span_near":
        return sum(span_min_width(c) for c in body["clauses"])
    if kind == "span_or":
        clauses = body["clauses"] if isinstance(body, dict) else body
        return min(span_min_width(c) for c in clauses)
    if kind == "span_first":
        return span_min_width(body["match"])
    if kind == "span_not":
        return span_min_width(body["include"])
    if kind == "span_containing":
        return span_min_width(body["big"])
    return span_min_width(body["little"])


def _minimal(spans: list) -> list:
    """Sorted (s, e) list -> containment-minimal set (also dedupes).
    Input sorted by (s, e). An earlier span with the SAME start has a
    shorter-or-equal end, so the current one contains it — skip the
    current; an earlier span with a smaller start contains the current
    iff its end reaches past (or to) the current end — pop it."""
    out: list = []
    for s, e in spans:
        if out and out[-1][0] == s:
            continue
        while out and out[-1][1] >= e:
            out.pop()
        out.append((s, e))
    return out


def _near_ordered(lists: list) -> list:
    """Minimal windows of an in-order, non-overlapping selection (one
    span per clause list). Lists are containment-minimal and sorted, so
    start order == end order and the monotone pointer walk is complete
    (the intervals automaton generalized from points to extents)."""
    m = len(lists)
    idx = [0] * m
    out: list = []
    first = lists[0]
    while idx[0] < len(first):
        prev_end = first[idx[0]][1]
        ok = True
        for i in range(1, m):
            li = lists[i]
            while idx[i] < len(li) and li[idx[i]][0] <= prev_end:
                idx[i] += 1
            if idx[i] >= len(li):
                ok = False
                break
            prev_end = li[idx[i]][1]
        if not ok:
            break
        nxt_start = lists[1][idx[1]][0]
        while idx[0] + 1 < len(first) and first[idx[0] + 1][1] < nxt_start:
            idx[0] += 1
        out.append((first[idx[0]][0], prev_end))
        idx[0] += 1
    return _minimal(out)


def _near_unordered(lists: list, max_width: int | None = None) -> list:
    """All windows of an any-order, non-overlapping selection, by
    backtracking over clause selections (clauses visited smallest list
    first; spans overlapping the partial selection pruned), reduced to
    the minimal set.

    ``max_width`` (= the near node's min_width + slop) bounds the
    window DURING the walk: any selection already wider than it would
    be dropped by the caller's slop filter, so skipping it early is
    semantics-preserving — and it collapses the cost from the product
    of per-doc clause frequencies to (rarest clause tf) x
    (positions within a max_width band)^(clauses - 1). Each clause's
    candidate scan is bisect-limited to starts inside the band the
    current partial window still allows."""
    order = sorted(range(len(lists)), key=lambda j: len(lists[j]))
    starts = [[s for s, _ in lists[j]] for j in order]
    chosen: list = []
    wins: list = []
    n = len(order)

    def overlaps(s: int, e: int) -> bool:
        return any(not (e < cs or ce < s) for cs, ce in chosen)

    def walk(d: int, cmin: int, cmax: int) -> None:
        if d == n:
            wins.append((cmin, cmax))
            return
        li = lists[order[d]]
        if max_width is None or d == 0:
            lo, hi = 0, len(li)
        else:
            # a surviving window has width <= max_width, so this
            # clause's span must START within [cmax - max_width + 1,
            # cmin + max_width - 1]
            lo = bisect.bisect_left(starts[d], cmax - max_width + 1)
            hi = bisect.bisect_right(starts[d], cmin + max_width - 1)
        for i in range(lo, hi):
            s, e = li[i]
            nmin = s if s < cmin else cmin
            nmax = e if e > cmax else cmax
            if max_width is not None and nmax - nmin + 1 > max_width:
                continue
            if not overlaps(s, e):
                chosen.append((s, e))
                walk(d + 1, nmin, nmax)
                chosen.pop()

    first = lists[order[0]]
    for s, e in first:
        if max_width is not None and e - s + 1 > max_width:
            continue
        chosen.append((s, e))
        walk(1, s, e)
        chosen.pop()
    return _minimal(sorted(set(wins)))


def eval_spans(tree, posmap: dict) -> list:
    """Evaluate one span tree over one document -> the minimal sorted
    (start, end) span list. ``posmap``: term -> ascending 1-based
    position array (absent terms may be missing)."""
    kind, body = _node(tree)
    if kind == "span_term":
        return [(int(p), int(p)) for p in posmap.get(body, ())]
    if kind == "span_or":
        clauses = body["clauses"] if isinstance(body, dict) else body
        merged: list = []
        for c in clauses:
            merged.extend(eval_spans(c, posmap))
        return _minimal(sorted(merged))
    if kind == "span_near":
        lists = [eval_spans(c, posmap) for c in body["clauses"]]
        if any(not li for li in lists):
            return []
        slop = body.get("slop", 0)
        mw = span_min_width(tree)
        if len(lists) == 1:
            wins = lists[0]
        elif body.get("in_order", False):
            wins = _near_ordered(lists)
        else:
            wins = _near_unordered(lists, max_width=mw + slop)
        return [(s, e) for s, e in wins if (e - s + 1) - mw <= slop]
    if kind == "span_first":
        end = body["end"]
        return [(s, e) for s, e in eval_spans(body["match"], posmap) if e <= end]
    if kind == "span_not":
        inc = eval_spans(body["include"], posmap)
        exc = eval_spans(body["exclude"], posmap)
        if not exc:
            return inc
        pre, post = body.get("pre", 0), body.get("post", 0)
        return [
            (s, e)
            for s, e in inc
            if not any(xs <= e + post and xe >= s - pre for xs, xe in exc)
        ]
    big_body = body["big"]
    little = eval_spans(body["little"], posmap)
    big = eval_spans(big_body, posmap)
    if kind == "span_containing":
        return [
            (s, e)
            for s, e in big
            if any(s <= ls and le <= e for ls, le in little)
        ]
    return [
        (ls, le)
        for ls, le in little
        if any(s <= ls and le <= e for s, e in big)
    ]


def span_freq(tree, posmap: dict, min_width: int | None = None) -> float:
    """One document's span frequency: sum of ``1/(1+gaps)`` over the
    tree's reported spans, gaps measured against the tree's minimal
    covered width (module docstring)."""
    mw = span_min_width(tree) if min_width is None else min_width
    f = 0.0
    for s, e in eval_spans(tree, posmap):
        f += 1.0 / (1.0 + ((e - s + 1) - mw))
    return f


_SYNTH = "\x1d"  # synthetic-leaf marker: not producible by any analyzer


def _collapse_or_groups(tree):
    """Rewrite every ``span_or``-of-bare-terms node into ONE synthetic
    leaf term -> (new_tree, groups_map). ``groups_map`` maps each
    synthetic term to its sorted real-term tuple; the executor
    materializes the synthetic leaf's positions as the segment-level
    numpy union ONCE, instead of merging the member term lists per
    candidate document inside ``eval_spans``.

    Exact by construction: a span_or of width-1 terms evaluates to the
    minimal union of the member position sets — precisely the merged
    position list — and every ancestor node only ever sees that span
    list, so the rewritten tree walks identically (the 49-of-171
    span_multi bench trees whose expansion shares a term with another
    clause stay on the interpreter but drop from 53 leaves to 4)."""
    if isinstance(tree, str):
        return tree, {}
    kind, body = _node(tree)
    if kind == "span_term":
        return tree, {}
    if kind == "span_or":
        clauses = body["clauses"] if isinstance(body, dict) else body
        terms = []
        for c in clauses:
            ckind, cbody = _node(c)
            if ckind != "span_term":
                terms = None
                break
            terms.append(cbody)
        if terms is not None:
            group = tuple(sorted(set(terms)))
            if len(group) == 1:
                return {"span_term": group[0]}, {}
            synth = _SYNTH + "|".join(group)
            return {"span_term": synth}, {synth: group}
        new, gm = [], {}
        for c in clauses:
            nc, g = _collapse_or_groups(c)
            new.append(nc)
            gm.update(g)
        return {"span_or": {"clauses": new}}, gm
    if kind == "span_near":
        new, gm = [], {}
        for c in body["clauses"]:
            nc, g = _collapse_or_groups(c)
            new.append(nc)
            gm.update(g)
        out = dict(body)
        out["clauses"] = new
        return {"span_near": out}, gm
    if kind == "span_first":
        m, gm = _collapse_or_groups(body["match"])
        return {"span_first": {**body, "match": m}}, gm
    if kind == "span_not":
        inc, g1 = _collapse_or_groups(body["include"])
        exc, g2 = _collapse_or_groups(body["exclude"])
        return {"span_not": {**body, "include": inc, "exclude": exc}}, {
            **g1, **g2
        }
    big, g1 = _collapse_or_groups(body["big"])
    little, g2 = _collapse_or_groups(body["little"])
    return {kind: {"big": big, "little": little}}, {**g1, **g2}


def _gather_slices(lo: np.ndarray, hi: np.ndarray) -> np.ndarray:
    """Vectorized multi-slice gather: index array selecting, for every
    i, the elements [lo[i], hi[i]) — the numpy spelling of
    ``concatenate([arange(l, h) for l, h in zip(lo, hi)])``."""
    counts = hi - lo
    total = int(counts.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    shift = np.repeat(np.cumsum(counts) - counts, counts)
    return np.repeat(lo, counts) + (np.arange(total, dtype=np.int64) - shift)


def _member_mask(cand: np.ndarray, docs: np.ndarray) -> np.ndarray:
    """Boolean mask over ``cand`` (sorted) marking docs present in the
    sorted-unique ``docs`` array — searchsorted membership, no unions."""
    pos = np.searchsorted(docs, cand)
    ok = pos < len(docs)
    out = np.zeros(len(cand), dtype=bool)
    out[ok] = docs[pos[ok]] == cand[ok]
    return out


def _fill_dls(cand: np.ndarray, ent_lists) -> np.ndarray:
    """Per-candidate doc lengths gathered from whichever entry holds
    the doc (every cand doc matches every clause, so the first clause's
    entries fill everything on real inputs)."""
    dls = np.empty(len(cand), dtype=np.float64)
    filled = np.zeros(len(cand), dtype=bool)
    for ents in ent_lists:
        for e in ents:
            if filled.all():
                return dls
            m = _member_mask(cand, e[0]) & ~filled
            if m.any():
                pos = np.searchsorted(e[0], cand[m])
                dls[m] = e[1][pos]
                filled |= m
    return dls


def _synth_entry(decoded: dict, group: tuple, cache: dict, cand=None):
    """Materialize the merged positional entry for a synthetic or-group
    leaf: the union of the member terms' (docs, dls, occ_doc, occ_pos)
    arrays, occurrence-sorted by (doc, pos) — all numpy, no
    per-document Python.

    With ``cand`` (sorted candidate doc ids) the merge RESTRICTS to the
    candidates first (searchsorted + the multi-slice gather), so the
    lexsort runs over the candidate-local occurrences instead of the
    group's full posting mass — the difference between O(sum of member
    dfs) and O(candidate occurrences) per (rule, segment). Restricted
    entries are not cached (cand differs per rule); the unrestricted
    single-member short-circuit still is."""
    if cand is None:
        ent = cache.get(group)
        if ent is not None:
            return ent
    ents = [decoded[t] for t in group if t in decoded]
    if not ents:
        if cand is None:
            cache[group] = None
        return None
    if len(ents) == 1:
        if cand is None:
            cache[group] = ents[0]
        return ents[0]
    if cand is not None:
        od_parts, op_parts = [], []
        for e in ents:
            lo = np.searchsorted(e[2], cand, side="left")
            hi = np.searchsorted(e[2], cand, side="right")
            idx = _gather_slices(lo, hi)
            if len(idx):
                od_parts.append(e[2][idx])
                op_parts.append(e[3][idx])
        if not od_parts:
            return None
        od = np.concatenate(od_parts)
        op = np.concatenate(op_parts)
        srt = np.lexsort((op, od))
        od, op = od[srt], op[srt]
        uq = np.unique(od)
        dls = _fill_dls(uq, [ents])
        return (uq, dls, od, op)
    all_docs = np.concatenate([e[0] for e in ents])
    all_dls = np.concatenate([e[1] for e in ents])
    uq, first = np.unique(all_docs, return_index=True)
    od = np.concatenate([e[2] for e in ents])
    op = np.concatenate([e[3] for e in ents])
    srt = np.lexsort((op, od))
    ent = (uq, all_dls[first], od[srt], op[srt])
    cache[group] = ent
    return ent


def _group_docs(decoded: dict, group: tuple, cache: dict):
    """Sorted-unique doc ids holding ANY member term (memoized per
    segment) — the doc-set half of a synthetic leaf, enough for
    candidate intersection without touching positions."""
    key = (group, "docs")
    d = cache.get(key)
    if d is not None:
        return d
    arrs = [decoded[t][0] for t in group if t in decoded]
    if not arrs:
        cache[key] = np.empty(0, dtype=np.int64)
    elif len(arrs) == 1:
        cache[key] = arrs[0]
    else:
        cache[key] = np.unique(np.concatenate(arrs))
    return cache[key]


_MAX_VARIANTS = 8


def _flat_near_groups(tree):
    """Detect the FLAT span_near shape the vectorized kernel serves:
    root = span_near whose clauses are each a bare term (string /
    span_term) or a span_or of bare terms. -> (groups, in_order, slop)
    or None.

    Why this shape reduces to minimal intervals: every clause span has
    width 1, and positions of DISTINCT terms in one document are
    distinct by construction (one token per position), so the
    non-overlap selection constraint is automatic and the minimal
    spanned windows of "one position per clause" are exactly the
    Clarke/Cormack/Vigna minimal intervals ``operators.intervals``
    computes (ordered: the same chain walk as ``_near_ordered``).

    SHARED terms (a clause term appearing in another clause) make the
    overlap constraint bite; ``in_order=False`` trees still vectorize
    through the VARIANT decomposition (``_flat_variants``) as long as
    no term appears in two multi-term groups; ordered trees and
    group-group overlaps stay on the tree walk. The caller gates on
    ``_flat_variants``'s result.
    """
    kind, body = _node(tree)
    if kind != "span_near":
        return None
    groups: list = []
    for c in body["clauses"]:
        ckind, cbody = _node(c)
        if ckind == "span_term":
            groups.append((cbody,))
        elif ckind == "span_or":
            clauses = cbody["clauses"] if isinstance(cbody, dict) else cbody
            terms = []
            for cc in clauses:
                gkind, gbody = _node(cc)
                if gkind != "span_term":
                    return None
                terms.append(gbody)
            if not terms:
                return None
            groups.append(tuple(sorted(set(terms))))
        else:
            return None
    return groups, bool(body.get("in_order", False)), int(body.get("slop", 0))


def _flat_variants(groups: list, in_order: bool):
    """Clause groups -> the VARIANT list the vectorized kernel scores,
    or None when the shape needs the tree walk.

    Disjoint groups: one variant, every clause multiplicity 1. A term
    shared between a multi-term group and singleton clauses (or a
    singleton repeated) decomposes by WHICH source realizes the group:
    its private terms, or one of the shared terms with the singleton's
    requirement raised to "r DISTINCT occurrences" (the bipartite
    matching enumerated — sound because clause spans are width-1, so
    a window is realizable iff each merged clause finds its r distinct
    positions, Hall's condition for this star-shaped overlap). Ordered
    trees and terms shared between two multi-term groups return None.

    Each variant is a list of (termset, r) clauses with pairwise
    DISJOINT termsets; the union of the variants' minimal window sets,
    re-minimalized, is exactly the tree walk's span set (every valid
    selection belongs to some variant, every variant window is
    realizable, and a variant's windows are containment-minimal
    against its own set)."""
    from collections import Counter

    singles = Counter(g[0] for g in groups if len(g) == 1)
    multis = [g for g in groups if len(g) > 1]
    seen_multi: Counter = Counter()
    for g in multis:
        seen_multi.update(set(g))
    if any(v > 1 for v in seen_multi.values()):
        return None  # term in two multi groups: matching too entangled
    shared_any = any(t in singles for g in multis for t in g)
    if (sum(singles.values()) > len(singles) or shared_any) and in_order:
        return None  # ordered + overlap: clause order binds, tree walk
    options: list = []
    for g in multis:
        private = tuple(t for t in g if t not in singles)
        opts = []
        if private:
            opts.append(("p", private))
        opts.extend(("s", (t,)) for t in g if t in singles)
        if not opts:
            return None
        options.append(opts)
    n_var = 1
    for o in options:
        n_var *= len(o)
        if n_var > _MAX_VARIANTS:
            return None
    variants = []
    choices = [[]]
    for opts in options:
        choices = [c + [o] for c in choices for o in opts]
    for choice in choices:
        req: Counter = Counter()
        for t, r in singles.items():
            req[(t,)] = r
        clause_sets = []
        for kindc, ts in choice:
            if kindc == "p":
                clause_sets.append(ts)
            else:
                req[ts] += 1
        variant = [(ts, r) for ts, r in req.items()] + [
            (ts, 1) for ts in clause_sets
        ]
        variants.append(variant)
    return variants


def _variant_windows(clause_dps: list):
    """Fully vectorized unordered minimal windows for ONE variant
    across ALL candidate docs at once — no per-document Python.

    ``clause_dps``: per clause, (di, pos, r) with (di, pos) sorted by
    (di, pos), di the candidate-local doc index, r the clause's
    required count of DISTINCT occurrences. The Clarke/Cormack/Vigna
    minimal windows fall out of three observations: (1) every minimal
    window starts on some occurrence s and ends at
    e(s) = max_j next_j^(r_j)(s) — the r_j-th occurrence of clause j
    at-or-after s; (2) e(s) is non-decreasing in s within a doc (each
    next_j^(r) is); (3) the variant-minimal set is therefore "the LAST
    start per distinct (doc, e)". next^(r) computes for every start of
    every doc in one searchsorted over composite (doc, pos) keys.
    -> (d, s, e) arrays sorted by (d, s), or None."""
    tops = [int(pos.max()) if len(pos) else 0 for _, pos, _ in clause_dps]
    P = max(tops) + 2
    S_d = np.concatenate([di for di, _, _ in clause_dps])
    S_p = np.concatenate([pos.astype(np.int64) for _, pos, _ in clause_dps])
    order = np.lexsort((S_p, S_d))
    S_d, S_p = S_d[order], S_p[order]
    S_key = S_d.astype(np.int64) * P + S_p
    valid = np.ones(len(S_key), dtype=bool)
    emax = np.zeros(len(S_key), dtype=np.int64)
    for dj, pj, r in clause_dps:
        kj = dj.astype(np.int64) * P + pj.astype(np.int64)
        nxt = np.searchsorted(kj, S_key, side="left") + (int(r) - 1)
        ok = nxt < len(kj)
        same = np.zeros(len(S_key), dtype=bool)
        same[ok] = dj[nxt[ok]] == S_d[ok]
        valid &= same
        ej = np.zeros(len(S_key), dtype=np.int64)
        ej[same] = pj[nxt[same]]
        np.maximum(emax, ej, out=emax, where=same)
    S_d, S_p, emax = S_d[valid], S_p[valid], emax[valid]
    if len(S_d) == 0:
        return None
    keep = np.ones(len(S_d), dtype=bool)
    keep[:-1] = (S_d[:-1] != S_d[1:]) | (emax[1:] > emax[:-1])
    return S_d[keep], S_p[keep], emax[keep]


def _minimal_union_freqs(win_parts: list, m: int, slop: int):
    """Union the variants' window sets, re-minimalize per doc, apply
    the slop filter, and fold per-doc frequencies — all vectorized.

    Minimality over the union: windows sorted by (d, s asc, e asc); a
    window is contained in an earlier one exactly when a LATER row of
    the same doc has e <= its own e (starts ascend), so "keep iff
    e < suffix-min of e over later same-doc rows" — the suffix-min runs
    right-to-left with a reset at doc boundaries. Duplicate (s, e)
    windows keep the last copy. -> (doc_idx, freqs) or None."""
    if len(win_parts) == 1:
        d, s, e = win_parts[0]
    else:
        d = np.concatenate([w[0] for w in win_parts])
        s = np.concatenate([w[1] for w in win_parts])
        e = np.concatenate([w[2] for w in win_parts])
        order = np.lexsort((e, s, d))
        d, s, e = d[order], s[order], e[order]
        # keep iff e < suffix-min of e over LATER same-doc rows (starts
        # ascend, so only later rows can be contained); per-doc slices,
        # numpy accumulate inside each — the loop runs per doc, not per
        # window
        keep = np.ones(len(e), dtype=bool)
        bounds = np.flatnonzero(np.diff(d)) + 1
        for a, b in zip(
            np.concatenate(([0], bounds)), np.concatenate((bounds, [len(d)]))
        ):
            seg = e[a:b].astype(np.float64)
            sm = np.empty(b - a, dtype=np.float64)
            sm[-1] = np.inf
            if b - a > 1:
                sm[:-1] = np.minimum.accumulate(seg[::-1])[::-1][1:]
            keep[a:b] = seg < sm
        d, s, e = d[keep], s[keep], e[keep]
        if len(d) == 0:
            return None
    gaps = (e - s + 1) - m
    okg = gaps <= slop
    if not okg.any():
        return None
    d_sel = d[okg]
    w = 1.0 / (1.0 + gaps[okg].astype(np.float64))
    uq, start = np.unique(d_sel, return_index=True)
    return uq, np.add.reduceat(w, start)


def _flat_near_parts(decoded, groups, variants, in_order, slop):
    """The vectorized kernel for the flat span_near shape: candidate
    docs intersect singleton-clause doc arrays first (doc sets only —
    no or-group union is ever materialized; or-groups restrict via
    searchsorted membership masks), each termset's occurrence array is
    gathered RESTRICTED to the candidates (multi-slice gather,
    candidate-local lexsort), and windows compute across ALL docs at
    once per variant (``_variant_windows``), union-minimalized and
    folded by ``_minimal_union_freqs``. The ordered path keeps the
    per-candidate ``intervals.interval_freq`` chain walk (disjoint
    single variant only — ``_flat_variants`` gates).
    -> (docs_arr, freqs_arr, dls_arr) or None when the segment can't
    match."""
    from sgpt_spark.operators.intervals import interval_freq

    g_entries = []
    for g in groups:
        ents = [decoded[t] for t in g if t in decoded]
        if not ents:
            return None  # a near clause with no present term: no match
        g_entries.append(ents)
    sing = [j for j, e in enumerate(g_entries) if len(e) == 1]
    multi = [j for j in range(len(g_entries)) if len(g_entries[j]) > 1]
    cand = None
    for j in sorted(sing, key=lambda j: len(g_entries[j][0][0])):
        d = g_entries[j][0][0]
        cand = d if cand is None else np.intersect1d(cand, d, assume_unique=True)
        if len(cand) == 0:
            return None
    if cand is None:
        # no singleton clause: materialize ONE union (the smallest
        # or-group) to seed the candidate set
        j0 = min(multi, key=lambda j: sum(len(e[0]) for e in g_entries[j]))
        cand = np.unique(np.concatenate([e[0] for e in g_entries[j0]]))
        rest = [j for j in multi if j != j0]
    else:
        rest = multi
    for j in rest:
        mask = np.zeros(len(cand), dtype=bool)
        for e in g_entries[j]:
            mask |= _member_mask(cand, e[0])
        cand = cand[mask]
        if len(cand) == 0:
            return None

    def _restrict(terms: tuple):
        od_parts, op_parts = [], []
        for t in terms:
            e = decoded.get(t)
            if e is None:
                continue
            lo = np.searchsorted(e[2], cand, side="left")
            hi = np.searchsorted(e[2], cand, side="right")
            idx = _gather_slices(lo, hi)
            if len(idx):
                od_parts.append(e[2][idx])
                op_parts.append(e[3][idx])
        if not od_parts:
            return None
        if len(od_parts) == 1:
            return od_parts[0], op_parts[0]
        od = np.concatenate(od_parts)
        op = np.concatenate(op_parts)
        srt = np.lexsort((op, od))
        return od[srt], op[srt]

    dls_for = _fill_dls(cand, g_entries)
    if not in_order:
        ts_cache: dict = {}
        win_parts = []
        for variant in variants:
            dps = []
            for ts, r in variant:
                if ts not in ts_cache:
                    ro = _restrict(ts)
                    ts_cache[ts] = (
                        None
                        if ro is None
                        # candidate-local doc indexes keep keys small
                        else (np.searchsorted(cand, ro[0]), ro[1])
                    )
                ent = ts_cache[ts]
                if ent is None:
                    dps = None
                    break
                dps.append((ent[0], ent[1], r))
            if dps is None:
                continue
            win = _variant_windows(dps)
            if win is not None:
                win_parts.append(win)
        if not win_parts:
            return None
        hit = _minimal_union_freqs(win_parts, len(groups), slop)
        if hit is None:
            return None
        sel, fv = hit
        return (cand[sel].astype(np.int64), fv, dls_for[sel])
    slices = []
    for g in groups:
        ro = _restrict(g)
        if ro is None:
            return None
        od, op = ro
        lo = np.searchsorted(od, cand, side="left")
        hi = np.searchsorted(od, cand, side="right")
        slices.append((op, lo, hi))
    hit_idx, hit_freqs = [], []
    for i in range(len(cand)):
        arrs = [op[lo[i]:hi[i]].astype(np.int64) for op, lo, hi in slices]
        f = interval_freq(arrs, in_order, slop)
        if f > 0.0:
            hit_idx.append(i)
            hit_freqs.append(f)
    if not hit_idx:
        return None
    sel = np.asarray(hit_idx, dtype=np.int64)
    return (
        cand[sel].astype(np.int64),
        np.asarray(hit_freqs, dtype=np.float64),
        dls_for[sel],
    )


def _candidate_docs(tree, decoded: dict) -> np.ndarray:
    """Bottom-up candidate doc-id sets from the decoded segment: docs
    that can possibly match (near intersects, or unions, not keeps the
    include side). Sorted unique int64."""
    kind, body = _node(tree)
    if kind == "span_term":
        ent = decoded.get(body)
        return ent[0] if ent is not None else np.empty(0, dtype=np.int64)
    if kind == "span_or":
        clauses = body["clauses"] if isinstance(body, dict) else body
        sets = [_candidate_docs(c, decoded) for c in clauses]
        return np.unique(np.concatenate(sets)) if sets else np.empty(0, np.int64)
    if kind == "span_near":
        cand: np.ndarray | None = None
        for c in body["clauses"]:
            s = _candidate_docs(c, decoded)
            cand = s if cand is None else np.intersect1d(cand, s, assume_unique=True)
            if len(cand) == 0:
                break
        return cand if cand is not None else np.empty(0, np.int64)
    if kind == "span_first":
        return _candidate_docs(body["match"], decoded)
    if kind == "span_not":
        return _candidate_docs(body["include"], decoded)
    return np.intersect1d(
        _candidate_docs(body["big"], decoded),
        _candidate_docs(body["little"], decoded),
        assume_unique=True,
    )


def span_parts(
    decoded: dict, rules: list, kk, k1: float, b: float, avgdl: float
) -> list:
    """Score one segment's decoded positional postings against every
    span rule -> [(qid, doc_ids, scores)] — the spans twin of
    ``intervals.intervals_parts`` (same decoded contract)."""
    from sgpt_spark.operators.index_search import deterministic_topk

    if not decoded:
        return []
    parts = []
    synth_cache: dict = {}
    for qid, tree, terms, sum_idf, mw, fast, groups_map in rules:
        if fast is not None:
            hit = _flat_near_parts(decoded, *fast)
            if hit is None:
                continue
            docs_arr, fv, dl = hit
            raw = sum_idf * fv / (fv + k1 * (1.0 - b + b * dl / avgdl))
            if kk is None:
                parts.append((qid, docs_arr, raw))
            else:
                scores = np.round(raw, SCORE_DECIMALS)
                sel = deterministic_topk(docs_arr, scores, kk)
                parts.append((qid, docs_arr[sel], scores[sel]))
            continue
        lookup = decoded
        if groups_map:
            # two-phase: candidates from DOC SETS alone (no position
            # merge), then synthetic entries materialized restricted to
            # the candidates — the or-group lexsort runs candidate-local
            doc_overlay = {}
            for synth, group in groups_map.items():
                d = _group_docs(decoded, group, synth_cache)
                if len(d):
                    doc_overlay[synth] = (d,)
            cand = _candidate_docs(tree, ChainMap(doc_overlay, decoded))
            if len(cand) == 0:
                continue
            synths = {}
            for synth, group in groups_map.items():
                ent = _synth_entry(decoded, group, synth_cache, cand=cand)
                if ent is not None:
                    synths[synth] = ent
            lookup = ChainMap(synths, decoded)
        else:
            cand = _candidate_docs(tree, lookup)
            if len(cand) == 0:
                continue
        # per-candidate position slices for every tree term present
        slices = {}
        dl_map_docs: list = []
        dl_map_vals: list = []
        for t in terms:
            ent = lookup.get(t)
            if ent is None:
                continue
            d_i, dl_i, occ_doc, occ_pos = ent
            lo = np.searchsorted(occ_doc, cand, side="left")
            hi = np.searchsorted(occ_doc, cand, side="right")
            slices[t] = (occ_pos, lo, hi)
            dl_map_docs.append(d_i)
            dl_map_vals.append(dl_i)
        if not dl_map_docs:
            continue
        all_docs = np.concatenate(dl_map_docs)
        all_dls = np.concatenate(dl_map_vals)
        uq, first = np.unique(all_docs, return_index=True)
        dls_for = all_dls[first]
        hit_docs, hit_freqs = [], []
        for i, doc in enumerate(cand):
            posmap = {
                t: occ_pos[lo[i]:hi[i]].astype(np.int64)
                for t, (occ_pos, lo, hi) in slices.items()
                if hi[i] > lo[i]
            }
            f = span_freq(tree, posmap, min_width=mw)
            if f > 0.0:
                hit_docs.append(int(doc))
                hit_freqs.append(f)
        if not hit_docs:
            continue
        docs_arr = np.asarray(hit_docs, dtype=np.int64)
        fv = np.asarray(hit_freqs, dtype=np.float64)
        dl = dls_for[np.searchsorted(uq, docs_arr)].astype(np.float64)
        raw = sum_idf * fv / (fv + k1 * (1.0 - b + b * dl / avgdl))
        if kk is None:
            parts.append((qid, docs_arr, raw))
        else:
            scores = np.round(raw, SCORE_DECIMALS)
            sel = deterministic_topk(docs_arr, scores, kk)
            parts.append((qid, docs_arr[sel], scores[sel]))
    return parts


def span_search_index(
    spark: SparkSession,
    path: str,
    queries,
    k: int = 10,
    term_stats: DataFrame | dict | None = None,
) -> DataFrame:
    """ES span query over a persisted positional index ->
    (qid, doc_id, score, rank). ``queries``: (qid, span_tree) pairs —
    trees in the module-docstring dict shape, leaf terms exact index
    terms (the ES span_term contract: NOT analyzed).

    ``{"span_near": {"clauses": [t1 .. tn], "slop": 0, "in_order":
    True}}`` is the exact phrase — value-identical to
    ``phrase_search_index`` for repeat-free phrases (tested). See the
    module docstring for semantics, scoring, and the plan shape.
    """
    from sgpt_spark.operators.index_search import _emit_topk_frame
    from sgpt_spark.operators.positions import (
        _decode_rows,
        read_positional_index,
    )

    positions, meta = read_positional_index(spark, path)
    pairs = (
        [(r["qid"], r["query"]) for r in queries.collect()]
        if isinstance(queries, DataFrame)
        else list(queries)
    )
    qid_type = (
        "bigint"
        if pairs and isinstance(pairs[0][0], (int, np.integer))
        else "string"
    )
    seg_schema = f"qid {qid_type}, doc_id long, score double"
    qtrees: list = []
    for qid, tree in pairs:
        validate_span_tree(tree)
        qtrees.append((qid, tree))
    if not qtrees:
        return (
            spark.createDataFrame([], seg_schema)
            .withColumn("rank", F.lit(1).cast("int"))
        )

    all_terms = sorted({t for _, tr in qtrees for t in span_leaf_terms(tr)})
    cand = positions.filter(F.col("term").isin(all_terms))
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
    rules = []
    for qid, tree in qtrees:
        # absent positive terms contribute no idf and can never match —
        # the Lucene contract (empty TermStates): the query still runs
        # on its present branches (a span_or with one absent clause
        # matches the other)
        pos_terms = span_leaf_terms(tree, positive_only=True)
        mw = span_min_width(tree)
        fast = None
        det = _flat_near_groups(tree)
        if det is not None and mw == len(det[0]):
            variants = _flat_variants(det[0], det[1])
            if variants is not None:
                fast = (det[0], variants, det[1], det[2])
        groups_map: dict = {}
        walk_tree = tree
        walk_terms = tuple(sorted(span_leaf_terms(tree)))
        if fast is None:
            # interpreter trees still get the or-group collapse: every
            # or-of-terms becomes one synthetic leaf merged with numpy
            # at the segment level (exact — see _collapse_or_groups)
            walk_tree, groups_map = _collapse_or_groups(tree)
            walk_terms = tuple(sorted(span_leaf_terms(walk_tree)))
        rules.append(
            (
                qid,
                walk_tree,
                walk_terms,
                sum(idf[t] for t in sorted(pos_terms) if t in idf),
                mw,
                fast,
                groups_map,
            )
        )
    b_rules = spark.sparkContext.broadcast(rules)
    k1, b, avgdl, codec = meta.k1, meta.b, meta.avgdl, meta.codec
    kk = k

    def score_wrapper(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        chunks = list(batches)
        if not chunks:
            return
        pdf = pd.concat(chunks, ignore_index=True) if len(chunks) > 1 else chunks[0]
        for seg in pdf["segment"].unique():
            sdf = pdf[pdf["segment"] == seg]
            row_off, docs, tfs, dls, pos_off, pos = _decode_rows(sdf["runs"], codec)
            decoded = {}
            for i, term in enumerate(sdf["term"]):
                ps, pe = int(row_off[i]), int(row_off[i + 1])
                if pe == ps:
                    continue
                d_i, tf_i, dl_i = docs[ps:pe], tfs[ps:pe], dls[ps:pe]
                os_, oe = int(pos_off[i]), int(pos_off[i + 1])
                occ_doc = np.repeat(d_i, tf_i)
                decoded[term] = (d_i, dl_i, occ_doc, pos[os_:oe])
            parts = span_parts(decoded, b_rules.value, kk, k1, b, avgdl)
            if parts:
                yield _emit_topk_frame(parts)

    seg_hits = cand.repartition("segment").mapInPandas(
        score_wrapper, schema=seg_schema
    )
    return topk_per_group(seg_hits, k=k).select("qid", "doc_id", "score", "rank")
