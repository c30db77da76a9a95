"""ES intervals query (operators/intervals.py): the minimal-interval
SPEC as a from-scratch brute force (enumerate every candidate window,
keep the containment-minimal set) compared against the automaton on
hand fixtures and 200 seeded random position layouts; the
ordered+max_gaps=0 == exact-phrase identity that anchors the family to
the oracle-gated phrase path; an end-to-end index-vs-python-brute-force
corpus check across ordered/unordered and gap limits and both codecs;
and the guards."""

from __future__ import annotations

import random
import tempfile

import numpy as np
import pytest

from sgpt_spark.functions.bm25 import idf_py
from sgpt_spark.operators.intervals import (
    check_intervals_rule,
    interval_freq,
    intervals_search_index,
    minimal_intervals,
)
from sgpt_spark.operators.positions import (
    build_positional_index,
    phrase_search_index,
)

pytestmark = pytest.mark.usefixtures("spark")


# ---- the spec: brute-force minimal intervals --------------------------------


def brute_minimal(arrs, ordered):
    """Every window over term positions that contains a match, reduced
    to the containment-minimal set — the definition the automaton must
    reproduce."""
    pos = sorted({p for a in arrs for p in a})

    def matches(s, e):
        if ordered:
            prev = s - 1
            for a in arrs:
                nxt = [p for p in a if prev < p <= e]
                if not nxt:
                    return False
                prev = min(nxt)
            return True
        return all(any(s <= p <= e for p in a) for a in arrs)

    cands = [(s, e) for s in pos for e in pos if s <= e and matches(s, e)]
    return sorted(
        c
        for c in cands
        if not any(d != c and c[0] <= d[0] and d[1] <= c[1] for d in cands)
    )


def _arrs(*lists):
    return [np.asarray(a, dtype=np.int64) for a in lists]


@pytest.mark.parametrize(
    "arrs, ordered, want",
    [
        # a x b
        (([0], [2]), True, [(0, 2)]),
        (([0], [2]), False, [(0, 2)]),
        # b a (arrs are (a, b))
        (([1], [0]), True, []),
        (([1], [0]), False, [(0, 1)]),
        # a b a: ordered collapses to the tight (0,1); unordered also
        # reports the (1,2) window
        (([0, 2], [1]), True, [(0, 1)]),
        (([0, 2], [1]), False, [(0, 1), (1, 2)]),
        # shrink: latest start wins (a at 0 and 3, b at 4)
        (([0, 3], [4]), True, [(3, 4)]),
        # single term: every occurrence
        (([5, 9],), True, [(5, 5), (9, 9)]),
        (([5, 9],), False, [(5, 5), (9, 9)]),
        # three terms, interleaved
        (([0, 6], [2], [4]), True, [(0, 4)]),
        (([0, 6], [2], [4]), False, [(0, 4), (2, 6)]),
    ],
)
def test_minimal_intervals_hand(arrs, ordered, want):
    got = sorted(minimal_intervals(_arrs(*arrs), ordered))
    assert got == want == brute_minimal([list(a) for a in arrs], ordered)


def test_minimal_intervals_random_vs_spec():
    rng = random.Random(7)
    checked = 0
    for _ in range(200):
        m = rng.randint(2, 4)
        npos = rng.randint(m, 12)
        allpos = rng.sample(range(26), npos)
        arrs = [[] for _ in range(m)]
        for p in allpos:
            arrs[rng.randrange(m)].append(p)
        arrs = [sorted(a) for a in arrs]
        if any(not a for a in arrs):
            continue
        checked += 1
        for ordered in (False, True):
            got = sorted(minimal_intervals(_arrs(*arrs), ordered))
            assert got == brute_minimal(arrs, ordered), (arrs, ordered)
    assert checked > 100


@pytest.mark.parametrize(
    "arrs, ordered, max_gaps, want",
    [
        (([0], [3]), True, -1, 1 / 3),  # gaps 2
        (([0], [3]), True, 2, 1 / 3),
        (([0], [3]), True, 1, 0.0),
        (([0], [1]), True, 0, 1.0),  # exact adjacency
        (([0, 2], [1]), False, 0, 2.0),  # (0,1) and (1,2), both gaps 0
        (([5, 9],), True, 0, 2.0),  # single term, two occurrences
    ],
)
def test_interval_freq(arrs, ordered, max_gaps, want):
    assert interval_freq(_arrs(*arrs), ordered, max_gaps) == pytest.approx(want)


def test_guards():
    with pytest.raises(ValueError, match="repeated terms"):
        check_intervals_rule(("a", "b", "a"), 0)
    with pytest.raises(ValueError, match="max_gaps"):
        check_intervals_rule(("a", "b"), -2)


# ---- end-to-end over a corpus ------------------------------------------------

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "quick brown fox and then quick brown fox again"),
    (2, "fox brown quick"),              # reversed order
    (3, "quick x x brown y fox"),        # gapped, in order
    (4, "brown fox quick brown"),
    (5, "singleton"),
    (6, "quick dog"),
]

QUERIES = [
    (100, "quick brown fox"),
    (101, "quick fox"),
    (102, "lazy dog"),
    (103, "singleton"),
    (104, "quick unicorn"),  # absent term: no hits
]


def _brute_corpus(ordered, max_gaps, k=10, k1=1.2, b=0.75):
    toks = {d: t.split() for d, t in DOCS}
    n = len(toks)
    avgdl = sum(len(t) for t in toks.values()) / n
    df: dict = {}
    for t in toks.values():
        for w in set(t):
            df[w] = df.get(w, 0) + 1
    out = []
    for qid, q in QUERIES:
        terms = q.split()
        if any(t not in df for t in terms):
            continue
        sum_idf = sum(idf_py(df[t], n) for t in terms)
        hits = []
        for d, t in toks.items():
            arrs = [[p for p, w in enumerate(t) if w == term] for term in terms]
            if any(not a for a in arrs):
                continue
            f = 0.0
            for s, e in brute_minimal(arrs, ordered):
                gaps = (e - s + 1) - len(terms)
                if max_gaps < 0 or gaps <= max_gaps:
                    f += 1.0 / (1.0 + gaps)
            if f > 0.0:
                score = sum_idf * f / (f + k1 * (1 - b + b * len(t) / avgdl))
                hits.append((round(score, 6), d))
        hits.sort(key=lambda x: (-x[0], x[1]))
        for rk, (s, d) in enumerate(hits[:k], 1):
            out.append((qid, d, s, rk))
    return sorted(out)


def _rows(df):
    return sorted(
        (r["qid"], r["doc_id"], round(r["score"], 6), r["rank"])
        for r in df.collect()
    )


def _build(spark, codec="varint"):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string").repartition(3)
    path = tempfile.mkdtemp(prefix="ividx_")
    build_positional_index(docs, path, segment_size=3, codec=codec)
    return path


@pytest.mark.parametrize("codec", ["varint", "pfor"])
@pytest.mark.parametrize("ordered", [False, True])
@pytest.mark.parametrize("max_gaps", [-1, 0, 2])
def test_index_matches_corpus_brute_force(spark, codec, ordered, max_gaps):
    path = _build(spark, codec=codec)
    got = _rows(
        intervals_search_index(
            spark, path, QUERIES, ordered=ordered, max_gaps=max_gaps, k=10
        )
    )
    assert got == _brute_corpus(ordered, max_gaps)
    if max_gaps == -1:
        assert len(got) > 0
        # reversed doc 2 matches unordered but not ordered for q100
        has2 = [r for r in got if r[0] == 100 and r[1] == 2]
        assert bool(has2) == (not ordered)


def test_ordered_zero_gaps_is_exact_phrase(spark):
    """The anchor identity: ordered + max_gaps=0 == match_phrase slop=0
    (the oracle-gated path) for repeat-free phrases."""
    path = _build(spark)
    a = _rows(
        intervals_search_index(spark, path, QUERIES, ordered=True, max_gaps=0)
    )
    b = _rows(phrase_search_index(spark, path, QUERIES, k=10))
    assert a == b and len(a) > 0


def test_repeated_terms_refused_end_to_end(spark):
    path = _build(spark)
    with pytest.raises(ValueError, match="repeated terms"):
        intervals_search_index(spark, path, [(1, "quick quick fox")])
