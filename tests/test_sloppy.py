"""Sloppy phrase (ES ``match_phrase`` slop>0, operators/sloppy.py):
hand-traced Lucene SloppyPhraseMatcher fixtures, the slop=0 ==
exact-phrase-count identity (anchors the generalization to the
oracle-gated exact path), an independent from-scratch reimplementation
of the matcher spec compared across random inputs and slops, and the
index-backed integration: slop=0 value-identity with the existing
phrase path, slop>0 against a pure-Python corpus brute force, both
codecs, the cogroup twin, and the repeated-terms refusal."""

from __future__ import annotations

import math
import random
import tempfile

import numpy as np
import pytest

from sgpt_spark.functions.bm25 import idf_py
from sgpt_spark.operators.sloppy import check_sloppy_phrase, sloppy_freq
from tests.test_phrase import DOCS, QUERIES

pytestmark = pytest.mark.usefixtures("spark")


def _adj(tokens, phrase):
    return [
        np.array([p - j for p, t in enumerate(tokens) if t == term], dtype=np.int64)
        for j, term in enumerate(phrase)
    ]


def rows(df):
    return sorted(
        (r["qid"], r["doc_id"], round(r["score"], 6), r["rank"]) for r in df.collect()
    )


# ---- pure-python units ----------------------------------------------------


@pytest.mark.parametrize(
    "doc, phrase, slop, want",
    [
        ("a b", "a b", 0, 1.0),
        ("a b", "a b", 2, 1.0),  # exact match still weighs 1 at any slop
        ("a x b", "a b", 0, 0.0),
        ("a x b", "a b", 1, 0.5),  # matchLength 1 -> 1/(1+1)
        ("b a", "a b", 1, 0.0),  # transposition needs slop 2
        ("b a", "a b", 2, 1 / 3),
        ("a b a b", "a b", 0, 2.0),  # two exact matches
        ("a x x x b", "a b", 2, 0.0),
        ("a x x x b", "a b", 3, 0.25),
        ("a x b x c", "a b c", 2, 1 / 3),  # total displacement 2
        ("c b a", "a b c", 4, 0.2),  # full reversal: matchLength 4
        ("c b a", "a b c", 3, 0.0),
        ("a", "a", 0, 1.0),  # single-term phrase
        ("a x a", "a", 0, 2.0),
        ("a b", "a c", 1, 0.0),  # absent term
    ],
)
def test_sloppy_freq_fixtures(doc, phrase, slop, want):
    got = sloppy_freq(_adj(doc.split(), tuple(phrase.split())), slop)
    assert got == pytest.approx(want, abs=1e-12)


def _exact_count(tokens, phrase):
    m = len(phrase)
    return sum(
        1 for i in range(len(tokens) - m + 1) if tuple(tokens[i : i + m]) == phrase
    )


def test_slop0_is_the_exact_phrase_count():
    """At slop=0 a match needs matchLength==0 (a consecutive occurrence)
    at weight 1, so sloppy_freq must equal the exact-phrase count the
    oracle-gated slop=0 path computes."""
    rng = random.Random(42)
    vocab = list("abcde")
    for _ in range(5000):
        tokens = [rng.choice(vocab) for _ in range(rng.randint(1, 30))]
        phrase = tuple(rng.sample(vocab, rng.randint(2, 3)))  # distinct
        got = sloppy_freq(_adj(tokens, phrase), 0)
        assert got == pytest.approx(float(_exact_count(tokens, phrase)), abs=1e-12)


def _sloppy_freq_naive(adjusted, slop):
    """Independent reimplementation of the SloppyPhraseMatcher spec:
    explicit position/cursor lists and linear min-scans instead of the
    kernel's heap — re-derived from the published algorithm, shares no
    code with operators/sloppy.py."""
    m = len(adjusted)
    if m == 0 or any(len(a) == 0 for a in adjusted):
        return 0.0
    if m == 1:
        return float(len(adjusted[0]))
    pos = [int(a[0]) for a in adjusted]
    cur = [1] * m
    in_queue = [True] * m
    end = max(pos)
    freq = 0.0

    def qmin():
        best = None
        for j in range(m):
            if in_queue[j] and (best is None or (pos[j], j) < (pos[best], best)):
                best = j
        return best

    positioned = True
    while positioned:
        h = qmin()
        in_queue[h] = False
        ml = end - pos[h]
        nxt = pos[qmin()]
        while True:
            if cur[h] >= len(adjusted[h]):
                positioned = False
                if ml <= slop:
                    freq += 1.0 / (1.0 + ml)
                break
            pos[h] = int(adjusted[h][cur[h]])
            cur[h] += 1
            end = max(end, pos[h])
            if pos[h] > nxt:
                in_queue[h] = True
                if ml <= slop:
                    freq += 1.0 / (1.0 + ml)
                    break
                h = qmin()
                in_queue[h] = False
                nxt = pos[qmin()]
                ml = end - pos[h]
            else:
                ml = min(ml, end - pos[h])
    return freq


def test_kernel_matches_independent_reimplementation():
    rng = random.Random(7)
    vocab = list("abcdef")
    for _ in range(4000):
        tokens = [rng.choice(vocab) for _ in range(rng.randint(1, 40))]
        phrase = tuple(rng.sample(vocab, rng.randint(2, 4)))
        slop = rng.randint(0, 6)
        a = _adj(tokens, phrase)
        assert sloppy_freq(a, slop) == pytest.approx(
            _sloppy_freq_naive(a, slop), abs=1e-12
        )


def test_monotone_in_slop_seeded():
    rng = random.Random(11)
    vocab = list("abcde")
    for _ in range(2000):
        tokens = [rng.choice(vocab) for _ in range(rng.randint(1, 25))]
        phrase = tuple(rng.sample(vocab, rng.randint(2, 3)))
        a = _adj(tokens, phrase)
        freqs = [sloppy_freq(a, s) for s in range(0, 8)]
        assert all(f2 >= f1 - 1e-12 for f1, f2 in zip(freqs, freqs[1:]))


def test_guards():
    with pytest.raises(ValueError, match="repeated terms"):
        check_sloppy_phrase(("a", "b", "a"), 2)
    check_sloppy_phrase(("a", "b", "a"), 0)  # slop=0 repeats fine
    with pytest.raises(ValueError, match="slop must be"):
        check_sloppy_phrase(("a", "b"), -1)


# ---- index-backed integration ---------------------------------------------

SLOP_QUERIES = [
    (200, "quick brown fox"),  # exact in 0/1, scattered in 3/4
    (201, "lazy dog"),
    (202, "fox quick"),  # reversed order: needs slop
    (203, "quick fox"),  # gap: needs slop 1
    (204, "quick brown unicorn"),  # absent term
]


def _brute_force_sloppy(docs, queries, slop, k=10, k1=1.2, b=0.75):
    """Corpus-level brute force: tokenize in Python, score with the
    INDEPENDENT matcher + the BM25 phrase formula (summed idf over the
    phrase terms, sloppy freq as the pseudo-term tf)."""
    toks = {d: [x for x in t.split() if x] for d, t in docs}
    toks = {d: t for d, t in toks.items() if t}
    n = len(toks)
    avgdl = sum(len(t) for t in toks.values()) / n
    df: dict[str, int] = {}
    for t in toks.values():
        for term in set(t):
            df[term] = df.get(term, 0) + 1
    out = []
    for qid, q in queries:
        qt = tuple(x for x in q.split() if x)
        hits = []
        if qt and all(t in df for t in qt):
            sum_idf = sum(idf_py(df[t], n) for t in qt)
            for d, t in toks.items():
                f = _sloppy_freq_naive(_adj(t, qt), slop)
                if f > 0:
                    dl = len(t)
                    raw = sum_idf * f / (f + k1 * (1 - b + b * dl / avgdl))
                    hits.append((d, round(raw, 6)))
        hits.sort(key=lambda x: (-x[1], x[0]))
        for rank, (d, s) in enumerate(hits[:k], 1):
            out.append((qid, d, s, rank))
    return sorted(out)


def _build(spark, codec="varint"):
    from sgpt_spark.operators.positions import build_positional_index

    df = spark.createDataFrame(DOCS, "doc_id long, text string").repartition(
        3, "doc_id"
    )
    path = tempfile.mkdtemp(prefix="sloppyidx_")
    build_positional_index(df, path, segment_size=3, codec=codec)
    return path


@pytest.mark.parametrize("codec", ["varint", "pfor"])
@pytest.mark.parametrize("slop", [1, 2, 4])
def test_index_sloppy_matches_brute_force(spark, codec, slop):
    from sgpt_spark.operators.positions import phrase_search_index

    path = _build(spark, codec)
    got = rows(phrase_search_index(spark, path, SLOP_QUERIES, k=10, slop=slop))
    want = _brute_force_sloppy(DOCS, SLOP_QUERIES, slop)
    assert got == want


def test_index_slop0_is_the_existing_path(spark):
    from sgpt_spark.operators.positions import phrase_search_index

    path = _build(spark)
    # distinct-term queries only: slop>0 refuses repeats, slop=0 must not
    got = rows(phrase_search_index(spark, path, QUERIES, k=10, slop=0))
    base = rows(phrase_search_index(spark, path, QUERIES, k=10))
    assert got == base


def test_index_cogroup_sloppy_identity(spark):
    from sgpt_spark.operators.positions import (
        phrase_search_index,
        phrase_search_index_cogroup,
    )

    path = _build(spark)
    q = spark.createDataFrame(SLOP_QUERIES, "qid long, query string")
    got = rows(phrase_search_index_cogroup(spark, path, q, k=10, slop=2))
    want = rows(phrase_search_index(spark, path, SLOP_QUERIES, k=10, slop=2))
    assert got == want


def test_index_sloppy_repeats_refused(spark):
    from sgpt_spark.operators.positions import phrase_search_index

    path = _build(spark)
    with pytest.raises(Exception, match="repeated terms"):
        phrase_search_index(spark, path, [(1, "a a")], k=5, slop=1).collect()
