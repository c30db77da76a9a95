"""span_multi (operators/spanmulti.py): the dictionary expansion is
recomputed in pure Python over the corpus vocabulary (prefix scan,
wildcard/regexp fullmatch, DP Levenshtein with Lucene's boost-ordered
cap) and the engine is held to EXACT row identity with
``span_search_index`` on the hand-expanded concrete tree — the span
path itself is brute-force-anchored in test_spans.py, so rewrite
identity transitively pins span_multi to the spec. Plus the
empty-expansion algebra, per-node caps, pass-through, both codecs, and
the guards."""

from __future__ import annotations

import itertools
import re
import tempfile

import pytest

from sgpt_spark.operators.positions import build_positional_index
from sgpt_spark.operators.spans import span_search_index
from sgpt_spark.operators.spanmulti import (
    expand_span_multi,
    span_multi_search_index,
    validate_span_multi_tree,
)

pytestmark = pytest.mark.usefixtures("spark")

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "quack quack went the duck near the quiet quay"),
    (3, "a quick quiz about quantum quarks and quality"),
    (4, "brown bears browse the brush beyond the brook"),
    (5, "the lazy dog dozed while the fox quickly left"),
    (6, "quince and quinoa are not quite the same quid"),
    (7, "jump jumped jumping jumper the brown fox fled"),
    (8, "dogs and ducks dash down the dusty dune daily"),
]

VOCAB = sorted({w for _, t in DOCS for w in t.split()})


# ---- the expansion spec, from scratch ----------------------------------------


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def brute_expand(kind, spec, cap):
    if kind == "prefix":
        hits = sorted(t for t in VOCAB if t.startswith(spec))
    elif kind == "wildcard":
        rx = re.compile(
            "".join(".*" if c == "*" else "." if c == "?" else re.escape(c)
                    for c in spec)
        )
        hits = sorted(t for t in VOCAB if rx.fullmatch(t))
    elif kind == "regexp":
        rx = re.compile(spec)
        hits = sorted(t for t in VOCAB if rx.fullmatch(t))
    else:  # fuzzy
        value = spec["value"] if isinstance(spec, dict) else spec
        me = min(int(spec.get("fuzziness", 2)), 2) if isinstance(spec, dict) else 2
        pl = int(spec.get("prefix_length", 0)) if isinstance(spec, dict) else 0
        scored = []
        for t in VOCAB:
            if pl and t[:pl] != value[:pl]:
                continue
            ed = _lev(value, t)
            if ed <= me:
                boost = 1.0 - ed / min(len(value), len(t))
                scored.append((-boost, t))
        scored.sort()
        return [t for _, t in scored[:cap]]
    return hits[:cap]


def hand_tree(tree, cap=50):
    """Expected concrete tree: the module's documented rewrite applied
    with brute_expand — an independent reimplementation."""
    if isinstance(tree, dict) and "span_multi" in tree:
        body = tree["span_multi"]
        kind, spec = next(iter(body["match"].items()))
        terms = sorted(brute_expand(kind, spec, body.get("max_expansions", cap)))
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
        new = [hand_tree(c, cap) for c in clauses]
        if kind == "span_or":
            kept = [c for c in new if c is not None]
            return {"span_or": {"clauses": kept}} if kept else None
        if any(c is None for c in new):
            return None
        out = dict(body) if isinstance(body, dict) else {}
        out["clauses"] = new
        return {"span_near": out}
    if kind == "span_first":
        m = hand_tree(body["match"], cap)
        return None if m is None else {"span_first": {**body, "match": m}}
    if kind == "span_not":
        inc, exc = hand_tree(body["include"], cap), hand_tree(body["exclude"], cap)
        if inc is None:
            return None
        return inc if exc is None else {
            "span_not": {**body, "include": inc, "exclude": exc}}
    big, little = hand_tree(body["big"], cap), hand_tree(body["little"], cap)
    if big is None or little is None:
        return None
    return {kind: {"big": big, "little": little}}


# ---- fixtures -----------------------------------------------------------------


def _build(spark, codec="varint"):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string").repartition(3)
    path = tempfile.mkdtemp(prefix="spmidx_")
    build_positional_index(docs, path, segment_size=3, codec=codec)
    return path


def _rows(df):
    return sorted(
        (r["qid"], r["doc_id"], round(r["score"], 6), r["rank"])
        for r in df.collect()
    )


def _pm(kind, spec, **kw):
    body = {"match": {kind: spec}}
    body.update(kw)
    return {"span_multi": body}


TREES = [
    (200, _pm("prefix", "qui")),
    (201, _pm("wildcard", "qu?ck*")),
    (202, _pm("regexp", "qu[ia]ck(ly)?")),
    (203, _pm("fuzzy", {"value": "quikc", "fuzziness": 2})),
    (204, {"span_near": {"clauses": [_pm("prefix", "qui"), "fox"],
                         "slop": 3, "in_order": False}}),
    (205, {"span_near": {"clauses": [_pm("prefix", "bro"),
                                     _pm("prefix", "fo")],
                         "slop": 0, "in_order": True}}),
    (206, {"span_or": {"clauses": [_pm("prefix", "laz"),
                                   _pm("wildcard", "d*g")]}}),
    (207, {"span_first": {"match": _pm("prefix", "qu"), "end": 2}}),
    (208, {"span_not": {"include": _pm("prefix", "qu"),
                        "exclude": {"span_term": "quick"}}}),
    (209, {"span_containing": {
        "big": {"span_near": {"clauses": ["the", _pm("prefix", "laz")],
                              "slop": 2, "in_order": True}},
        "little": _pm("prefix", "laz")}}),
    (210, _pm("fuzzy", {"value": "brown", "fuzziness": 1,
                        "prefix_length": 2})),
]


@pytest.mark.parametrize("codec", ["varint", "pfor"])
def test_matches_hand_expansion(spark, codec):
    path = _build(spark, codec=codec)
    got = _rows(span_multi_search_index(spark, path, TREES, k=10))
    hand = [(q, hand_tree(t)) for q, t in TREES]
    hand = [(q, t) for q, t in hand if t is not None]
    want = _rows(span_search_index(spark, path, hand, k=10))
    assert got == want and len({q for q, *_ in got}) >= 10


def test_rewrite_matches_spec(spark):
    """expand_span_multi's trees == the independent hand rewrite."""
    path = _build(spark)
    from sgpt_spark.operators.indexer import read_term_stats

    tstats = read_term_stats(spark, path)
    got = dict(expand_span_multi(spark, tstats, TREES))
    want = {q: hand_tree(t) for q, t in TREES}
    want = {q: t for q, t in want.items() if t is not None}
    assert got == want


def test_empty_expansion_algebra(spark):
    path = _build(spark)
    dead = _pm("prefix", "zzz")
    # dead root: no rows; dead near-child poisons; dead or-clause drops;
    # dead exclude: include alone
    trees = [
        (1, dead),
        (2, {"span_near": {"clauses": [dead, "fox"], "slop": 5,
                           "in_order": False}}),
        (3, {"span_or": {"clauses": [dead, "fox"]}}),
        (4, {"span_not": {"include": {"span_term": "fox"},
                          "exclude": dead}}),
    ]
    got = _rows(span_multi_search_index(spark, path, trees, k=10))
    qids = {q for q, *_ in got}
    assert 1 not in qids and 2 not in qids
    alone = _rows(span_search_index(spark, path, [(3, "fox"), (4, "fox")], k=10))
    assert got == alone


def test_per_node_cap_and_order(spark):
    path = _build(spark)
    from sgpt_spark.operators.indexer import read_term_stats

    tstats = read_term_stats(spark, path)
    # prefix cap keeps term order: qu* capped at 2 = first two qu-terms
    capped = dict(expand_span_multi(
        spark, tstats, [(1, _pm("prefix", "qu", max_expansions=2))]))
    want = sorted(t for t in VOCAB if t.startswith("qu"))[:2]
    assert capped[1] == {"span_or": {"clauses": [
        {"span_term": t} for t in sorted(want)]}}
    # fuzzy cap keeps BOOST order (exact match first), not term order
    fz = dict(expand_span_multi(
        spark, tstats,
        [(2, _pm("fuzzy", {"value": "quack", "fuzziness": 2},
                 max_expansions=1))]))
    assert fz[2] == {"span_or": {"clauses": [{"span_term": "quack"}]}}


def test_passthrough_and_mixed_batch(spark):
    path = _build(spark)
    plain = [(1, {"span_near": {"clauses": ["quick", "brown"], "slop": 0,
                                "in_order": True}})]
    a = _rows(span_multi_search_index(spark, path, plain, k=10))
    b = _rows(span_search_index(spark, path, plain, k=10))
    assert a == b and len(a) > 0


def test_guards():
    for bad in [
        {"span_multi": {}},                               # no match
        {"span_multi": {"match": {"prefix": ""}}},        # empty pattern
        {"span_multi": {"match": {"nope": "x"}}},         # unknown kind
        {"span_multi": {"match": {"fuzzy": {"value": ""}}}},
        {"span_multi": {"match": {"prefix": "a"},
                        "max_expansions": 0}},            # bad cap
        {"span_multi": {"match": {"prefix": "a", "fuzzy": "b"}}},
        {"span_weird": {"clauses": ["a"]}},
    ]:
        with pytest.raises(ValueError):
            validate_span_multi_tree(bad)
    # nested validation reaches span_multi under every node kind
    with pytest.raises(ValueError):
        validate_span_multi_tree(
            {"span_near": {"clauses": [
                {"span_multi": {"match": {"prefix": ""}}}], "slop": 0}}
        )
