"""ES join-field queries (operators/joinfield.py): has_child score
modes vs a from-scratch brute force (reusing oracle/bm25_oracle for the
child BM25), min/max children bounds, has_parent score propagation,
the nested == explode+has_child block-join derivation, deterministic
child ids, and guards."""

from __future__ import annotations

import pytest

from oracle.bm25_oracle import bm25_index, bm25_score, tokenize_ws
from sgpt_spark.operators.indexer import build_postings
from sgpt_spark.operators.joinfield import (
    explode_nested,
    has_child_search,
    has_parent_search,
)

pytestmark = pytest.mark.usefixtures("spark")

# children (doc_id, text); parents: 100 <- {0,1,2}, 101 <- {3,4}, 102 <- {5}
CHILDREN = [
    (0, "quick brown fox"),
    (1, "quick dog"),
    (2, "lazy dog sleeps"),
    (3, "quick quick quick"),
    (4, "a cat"),
    (5, "brown bear quick"),
    (6, "orphan quick doc"),  # no parent row — must never surface
]
PARENT_OF = [(0, 100), (1, 100), (2, 100), (3, 101), (4, 101), (5, 102)]
PARENTS = [
    (100, "family of mixed pets"),
    (101, "quick family two"),
    (102, "bears only quick"),
]
QUERIES = [(7, "quick"), (8, "brown dog"), (9, "absentterm")]


def _build(spark):
    ch = spark.createDataFrame(CHILDREN, "doc_id long, text string")
    postings, meta = build_postings(ch.repartition(2), segment_size=3)
    po = spark.createDataFrame(PARENT_OF, "doc_id long, parent_id long")
    qs = spark.createDataFrame(QUERIES, "qid long, query string")
    return postings, meta, po, qs


def _child_scores():
    idx = bm25_index({str(d): t for d, t in CHILDREN}, tokenize_ws)
    out = {}
    for qid, q in QUERIES:
        for d in idx["tfs"]:
            s = bm25_score(idx, tokenize_ws(q), d)
            if s > 0:
                out[(qid, int(d))] = s
    return out


def _brute_has_child(score_mode, min_c=1, max_c=None, k=10):
    cs = _child_scores()
    pmap = dict(PARENT_OF)
    agg = {}
    for (qid, d), s in cs.items():
        if d not in pmap:
            continue
        agg.setdefault((qid, pmap[d]), []).append(s)
    out = []
    for (qid, p), ss in agg.items():
        n = len(ss)
        if n < min_c or (max_c is not None and n > max_c):
            continue
        score = {
            "none": 0.0,
            "max": max(ss),
            "sum": sum(ss),
            "avg": sum(ss) / n,
            "min": min(ss),
        }[score_mode]
        out.append((qid, p, round(score, 6), n))
    ranked = []
    for qid in {r[0] for r in out}:
        rows = sorted(
            ((s, -p, p, n) for q2, p, s, n in out if q2 == qid), reverse=True
        )
        for rk, (s, _, p, n) in enumerate(rows[:k], 1):
            ranked.append((qid, p, s, n, rk))
    return sorted(ranked)


@pytest.mark.parametrize("score_mode", ["none", "max", "sum", "avg", "min"])
def test_has_child_vs_brute(spark, score_mode):
    postings, meta, po, qs = _build(spark)
    got = sorted(
        (r["qid"], r["parent_id"], r["score"], r["n_children"], r["rank"])
        for r in has_child_search(
            spark, postings, meta, qs, po, score_mode=score_mode
        ).collect()
    )
    assert got == _brute_has_child(score_mode) and got


def test_has_child_children_bounds(spark):
    postings, meta, po, qs = _build(spark)
    got = sorted(
        (r["qid"], r["parent_id"], r["score"], r["n_children"], r["rank"])
        for r in has_child_search(
            spark, postings, meta, qs, po,
            score_mode="sum", min_children=2, max_children=2,
        ).collect()
    )
    assert got == _brute_has_child("sum", min_c=2, max_c=2) and got
    # the orphan child (doc 6) never surfaces anywhere
    all_parents = {
        r["parent_id"]
        for r in has_child_search(
            spark, postings, meta, qs, po, score_mode="max"
        ).collect()
    }
    assert all_parents <= {100, 101, 102}


def test_has_parent_score_propagation(spark):
    par_docs = spark.createDataFrame(PARENTS, "doc_id long, text string")
    postings, meta = build_postings(par_docs, segment_size=2)
    po = spark.createDataFrame(PARENT_OF, "doc_id long, parent_id long")
    qs = spark.createDataFrame(QUERIES, "qid long, query string")
    got = {
        (r["qid"], r["doc_id"]): (r["parent_id"], r["score"])
        for r in has_parent_search(
            spark, postings, meta, qs, po, score=True, k=10
        ).collect()
    }
    # brute: parent scores fan out to children
    idx = bm25_index({str(d): t for d, t in PARENTS}, tokenize_ws)
    want = {}
    for qid, q in QUERIES:
        for p in idx["tfs"]:
            s = bm25_score(idx, tokenize_ws(q), p)
            if s > 0:
                for c, pp in PARENT_OF:
                    if pp == int(p):
                        want[(qid, c)] = (int(p), round(s, 6))
    assert got == want and got
    # score=False: constant 0
    flat = has_parent_search(spark, postings, meta, qs, po, score=False).collect()
    assert {r["score"] for r in flat} == {0.0}
    assert {(r["qid"], r["doc_id"]) for r in flat} == set(want)


def test_nested_is_has_child_over_exploded(spark):
    docs = spark.createDataFrame(
        [
            (0, ["quick brown", "lazy dog"]),
            (1, ["quick quick", "unrelated words"]),
            (2, []),
            (3, None),
        ],
        "doc_id long, objs array<string>",
    )
    children, po = explode_nested(docs, "objs")
    rows = sorted(map(tuple, children.collect()))
    assert rows == [
        (0, "quick brown"), (1, "lazy dog"),
        (1024, "quick quick"), (1025, "unrelated words"),
    ]
    assert sorted(map(tuple, po.collect())) == [
        (0, 0), (1, 0), (1024, 1), (1025, 1),
    ]
    postings, meta = build_postings(children, segment_size=2)
    got = {
        (r["qid"], r["parent_id"]): r["n_children"]
        for r in has_child_search(
            spark, postings, meta, [(5, "quick")], po, score_mode="max"
        ).collect()
    }
    # parents 0 and 1 each have exactly one matching nested object...
    assert got == {(5, 0): 1, (5, 1): 1}
    # ...and empty/NULL arrays never match (docs 2, 3 absent)


def test_guards(spark):
    postings, meta, po, qs = _build(spark)
    with pytest.raises(ValueError, match="score_mode"):
        has_child_search(spark, postings, meta, qs, po, score_mode="first")
    with pytest.raises(ValueError, match="min_children"):
        has_child_search(spark, postings, meta, qs, po, min_children=0)
    with pytest.raises(ValueError, match="max_children"):
        has_child_search(spark, postings, meta, qs, po,
                         min_children=3, max_children=2)
    docs = spark.createDataFrame([(0, ["a"])], "doc_id long, objs array<string>")
    with pytest.raises(ValueError, match="nested column"):
        explode_nested(docs, "nope")


# ---- inner_hits ---------------------------------------------------------


def test_inner_hits_brute_force(spark):
    from sgpt_spark.operators.funcscore import match_scores
    from sgpt_spark.operators.joinfield import inner_hits

    postings, meta, po, qs = _build(spark)
    page = has_child_search(
        spark, postings, meta, qs, po, score_mode="max", k=10
    ).select("qid", "parent_id")
    scored = match_scores(spark, postings, meta, qs)
    got = sorted(
        (r["qid"], r["parent_id"], r["doc_id"], round(r["score"], 6),
         r["child_rank"])
        for r in inner_hits(scored, po, page, size=2).collect()
    )
    # brute: per (qid, parent) on the page, top-2 children by
    # (score desc, doc_id asc)
    cs = _child_scores()
    pmap = dict(PARENT_OF)
    per_parent: dict = {}
    for (qid, d), s in cs.items():
        if d in pmap:
            per_parent.setdefault((qid, pmap[d]), []).append(
                (round(-s, 6), d)
            )
    want = []
    for (qid, p), lst in per_parent.items():
        lst.sort()
        for rk, (negs, d) in enumerate(lst[:2], 1):
            want.append((qid, p, d, round(-negs, 6), rk))
    assert got == sorted(want)
    # orphan child 6 never surfaces; page restriction honored
    assert all(d != 6 for _, _, d, _, _ in got)
    # no-broadcast identity
    got2 = sorted(
        (r["qid"], r["parent_id"], r["doc_id"], round(r["score"], 6),
         r["child_rank"])
        for r in inner_hits(
            scored, po, page, size=2, broadcast_page=False
        ).collect()
    )
    assert got2 == got
    with pytest.raises(ValueError, match="size"):
        inner_hits(scored, po, page, size=0)


def test_inner_hits_nested_derivation(spark):
    """inner_hits over explode_nested children == the matched nested
    objects of a nested query (the ES nested inner_hits shape)."""
    from sgpt_spark.operators.funcscore import match_scores
    from sgpt_spark.operators.joinfield import inner_hits

    docs = spark.createDataFrame(
        [(1, ["quick fox", "slow snail"]), (2, ["quick dog", "quick cat"]),
         (3, ["nothing here"])],
        "doc_id long, comments array<string>",
    )
    children, po = explode_nested(docs, "comments")
    postings, meta = build_postings(children, segment_size=4)
    qs = spark.createDataFrame([(9, "quick")], "qid long, query string")
    page = has_child_search(
        spark, postings, meta, qs, po, score_mode="max", k=10
    ).select("qid", "parent_id")
    hits = inner_hits(match_scores(spark, postings, meta, qs), po, page, size=5)
    rows = sorted(
        (r["parent_id"], r["doc_id"] % 1024) for r in hits.collect()
    )
    # parent 1: comment offset 0 matches; parent 2: offsets 0 and 1
    assert rows == [(1, 0), (2, 0), (2, 1)]
