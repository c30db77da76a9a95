"""Block-max WAND/MaxScore must be EXACT — identical output to the
exhaustive scorer, only faster (SURVEY.md §7.2 step 5)."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from sgpt_spark.functions.bm25 import idf_py
from sgpt_spark.functions.compress import encode_blocks
from sgpt_spark.operators.wand import TermPostings, maxscore_topk

K1, B, AVGDL = 1.2, 0.75, 50.0


def make_tp(postings: list[tuple[int, int, int]]) -> TermPostings:
    """[(doc_id, tf, dl)] -> TermPostings (block_size 4 to force many blocks)."""
    docs = np.array([p[0] for p in postings], dtype=np.int64)
    tfs = np.array([p[1] for p in postings], dtype=np.uint64)
    dls = np.array([p[2] for p in postings], dtype=np.uint64)
    return TermPostings(encode_blocks(docs, tfs, dls, block_size=4), K1, B, AVGDL)


def exhaustive(weighted):
    acc: dict[int, float] = {}
    for w, tp in weighted:
        for i in range(len(tp.blocks)):
            docs, tfn = tp.decode_block(i)
            for d, v in zip(docs, tfn):
                acc[int(d)] = acc.get(int(d), 0.0) + w * v
    return acc


def check_topk_equal(weighted, k):
    docs, scores = maxscore_topk(weighted, k)
    got = sorted(
        zip(np.round(scores, 6), docs), key=lambda t: (-t[0], t[1])
    )[:k]
    truth = exhaustive(weighted)
    want = sorted(
        ((round(s, 6), d) for d, s in truth.items()), key=lambda t: (-t[0], t[1])
    )[:k]
    assert [(d, s) for s, d in got] == [(d, s) for s, d in want]


def test_single_term():
    tp = make_tp([(1, 2, 30), (5, 1, 60), (9, 4, 20), (12, 1, 100), (20, 2, 10)])
    check_topk_equal([(1.5, tp)], 3)


def test_two_terms_pruning_path():
    # common term (low idf weight) + rare term (high weight): MaxScore
    # should stop generating candidates from the common one.
    common = make_tp([(d, 1, 50) for d in range(0, 100, 2)])
    rare = make_tp([(10, 3, 40), (55, 2, 60)])
    w_common = 0.05
    w_rare = 3.0
    check_topk_equal([(w_common, common), (w_rare, rare)], 5)


def test_lookup_absent_docs():
    tp = make_tp([(5, 1, 50), (10, 2, 50), (100, 3, 50)])
    vals = tp.lookup(np.array([1, 5, 50, 100, 200], dtype=np.int64))
    assert vals[0] == 0.0 and vals[2] == 0.0 and vals[4] == 0.0
    assert vals[1] > 0 and vals[3] > 0


@given(
    st.lists(  # 1-4 terms, each with up to 60 postings
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=500),
                st.integers(min_value=1, max_value=8),
                st.integers(min_value=5, max_value=200),
            ),
            min_size=1,
            max_size=60,
            unique_by=lambda t: t[0],
        ),
        min_size=1,
        max_size=4,
    ),
    st.integers(min_value=1, max_value=15),
)
@settings(max_examples=150, deadline=None)
def test_maxscore_equals_exhaustive_property(term_postings, k):
    weighted = []
    for i, plist in enumerate(term_postings):
        df = len(plist)
        w = (i % 3 + 1) * idf_py(df, 1000)
        weighted.append((w, make_tp(plist)))
    check_topk_equal(weighted, k)
