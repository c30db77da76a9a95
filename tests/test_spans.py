"""ES span queries (operators/spans.py): the span-algebra SPEC as a
from-scratch brute force (near = enumerate EVERY one-span-per-clause
selection, keep valid windows, reduce to the containment-minimal set)
compared against the engine evaluator on hand fixtures and seeded
random trees x position layouts; the span_near(slop=0, in_order) ==
exact-phrase identity anchoring the family to the oracle-gated phrase
path; an end-to-end index-vs-python-brute-force corpus check across
nested tree shapes and both codecs; and the guards."""

from __future__ import annotations

import itertools
import random
import tempfile

import numpy as np
import pytest

from sgpt_spark.functions.bm25 import idf_py
from sgpt_spark.operators.positions import (
    build_positional_index,
    phrase_search_index,
)
from sgpt_spark.operators.spans import (
    eval_spans,
    span_freq,
    span_leaf_terms,
    span_min_width,
    span_search_index,
    validate_span_tree,
)

pytestmark = pytest.mark.usefixtures("spark")


# ---- the spec: brute-force span evaluation -----------------------------------


def brute_spans(tree, posmap):
    """Independent recursive reference implementation of the documented
    span semantics. near enumerates ALL selections (itertools.product),
    keeps windows with a valid non-overlapping (ordered) selection, and
    reduces to the containment-minimal set."""
    if isinstance(tree, str):
        tree = {"span_term": tree}
    kind, body = next(iter(tree.items()))
    if kind == "span_term":
        return [(int(p), int(p)) for p in posmap.get(body, ())]
    if kind == "span_or":
        clauses = body["clauses"] if isinstance(body, dict) else body
        spans = sorted({s for c in clauses for s in brute_spans(c, posmap)})
        return _brute_minimal(spans)
    if kind == "span_near":
        lists = [brute_spans(c, posmap) for c in body["clauses"]]
        if any(not li for li in lists):
            return []
        in_order = body.get("in_order", False)
        slop = body.get("slop", 0)
        mw = span_min_width(tree)
        wins = set()
        for sel in itertools.product(*lists):
            if in_order:
                ok = all(
                    sel[i][0] > sel[i - 1][1] for i in range(1, len(sel))
                )
            else:
                ok = all(
                    a[1] < b[0] or b[1] < a[0]
                    for a, b in itertools.combinations(sel, 2)
                )
            if ok:
                wins.add((min(s for s, _ in sel), max(e for _, e in sel)))
        wins = _brute_minimal(sorted(wins))
        return [(s, e) for s, e in wins if (e - s + 1) - mw <= slop]
    if kind == "span_first":
        return [
            (s, e)
            for s, e in brute_spans(body["match"], posmap)
            if e <= body["end"]
        ]
    if kind == "span_not":
        inc = brute_spans(body["include"], posmap)
        exc = brute_spans(body["exclude"], posmap)
        pre, post = body.get("pre", 0), body.get("post", 0)
        return [
            (s, e)
            for s, e in inc
            if not any(xs <= e + post and xe >= s - pre for xs, xe in exc)
        ]
    big = brute_spans(body["big"], posmap)
    little = brute_spans(body["little"], posmap)
    if kind == "span_containing":
        return [
            (s, e) for s, e in big if any(s <= ls and le <= e for ls, le in little)
        ]
    return [
        (ls, le) for ls, le in little if any(s <= ls and le <= e for s, e in big)
    ]


def _brute_minimal(spans):
    return sorted(
        c
        for c in spans
        if not any(d != c and c[0] <= d[0] and d[1] <= c[1] for d in spans)
    )


def _pm(**kw):
    return {t: np.asarray(v, dtype=np.int64) for t, v in kw.items()}


# ---- hand fixtures ------------------------------------------------------------


@pytest.mark.parametrize(
    "tree, posmap, want",
    [
        # bare term: every occurrence
        ({"span_term": "a"}, dict(a=[2, 5]), [(2, 2), (5, 5)]),
        # or merges + minimal-dedupes
        (
            {"span_or": {"clauses": ["a", "b"]}},
            dict(a=[1, 4], b=[2]),
            [(1, 1), (2, 2), (4, 4)],
        ),
        # ordered near, adjacent
        (
            {"span_near": {"clauses": ["a", "b"], "slop": 0, "in_order": True}},
            dict(a=[1], b=[2]),
            [(1, 2)],
        ),
        # ordered near rejects reversed order
        (
            {"span_near": {"clauses": ["a", "b"], "slop": 5, "in_order": True}},
            dict(a=[3], b=[1]),
            [],
        ),
        # unordered accepts either order
        (
            {"span_near": {"clauses": ["a", "b"], "slop": 5, "in_order": False}},
            dict(a=[3], b=[1]),
            [(1, 3)],
        ),
        # slop filter: gap of 2 needs slop >= 2
        (
            {"span_near": {"clauses": ["a", "b"], "slop": 1, "in_order": True}},
            dict(a=[1], b=[4]),
            [],
        ),
        (
            {"span_near": {"clauses": ["a", "b"], "slop": 2, "in_order": True}},
            dict(a=[1], b=[4]),
            [(1, 4)],
        ),
        # non-overlap: same position cannot serve both clauses
        (
            {"span_near": {"clauses": ["a", "a"], "slop": 0, "in_order": True}},
            dict(a=[1]),
            [],
        ),
        (
            {"span_near": {"clauses": ["a", "a"], "slop": 0, "in_order": True}},
            dict(a=[1, 2]),
            [(1, 2)],
        ),
        # span_first: 1-based inclusive end bound
        ({"span_first": {"match": "a", "end": 2}}, dict(a=[2, 3]), [(2, 2)]),
        # span_not with pre/post windows
        (
            {"span_not": {"include": "a", "exclude": "x", "pre": 1, "post": 1}},
            dict(a=[3, 8], x=[4]),
            [(8, 8)],
        ),
        # containing / within
        (
            {
                "span_containing": {
                    "big": {
                        "span_near": {
                            "clauses": ["a", "b"], "slop": 3, "in_order": True
                        }
                    },
                    "little": "c",
                }
            },
            dict(a=[1], b=[4], c=[2]),
            [(1, 4)],
        ),
        (
            {
                "span_within": {
                    "big": {
                        "span_near": {
                            "clauses": ["a", "b"], "slop": 3, "in_order": True
                        }
                    },
                    "little": "c",
                }
            },
            dict(a=[1], b=[4], c=[2, 9]),
            [(2, 2)],
        ),
        # nested or inside near (min_width via the or's minimum)
        (
            {
                "span_near": {
                    "clauses": [{"span_or": {"clauses": ["a", "b"]}}, "c"],
                    "slop": 0,
                    "in_order": True,
                }
            },
            dict(a=[1], b=[5], c=[2, 6]),
            [(1, 2), (5, 6)],
        ),
    ],
)
def test_eval_spans_hand(tree, posmap, want):
    pm = _pm(**posmap)
    assert eval_spans(tree, pm) == want == brute_spans(tree, pm)


def _random_tree(rng, vocab, depth=0):
    kinds = ["span_term", "span_term", "span_or", "span_near"]
    if depth >= 2:
        kinds = ["span_term"]
    elif depth >= 1:
        kinds = ["span_term", "span_term", "span_or", "span_near"]
    else:
        kinds += ["span_first", "span_not", "span_containing", "span_within"]
    kind = rng.choice(kinds)
    if kind == "span_term":
        return {"span_term": rng.choice(vocab)}
    if kind == "span_or":
        n = rng.randint(2, 3)
        return {
            "span_or": {
                "clauses": [_random_tree(rng, vocab, depth + 1) for _ in range(n)]
            }
        }
    if kind == "span_near":
        n = rng.randint(2, 3)
        return {
            "span_near": {
                "clauses": [_random_tree(rng, vocab, depth + 1) for _ in range(n)],
                "slop": rng.choice([0, 1, 3, 10]),
                "in_order": rng.random() < 0.5,
            }
        }
    if kind == "span_first":
        return {
            "span_first": {
                "match": _random_tree(rng, vocab, depth + 1),
                "end": rng.randint(1, 12),
            }
        }
    if kind == "span_not":
        return {
            "span_not": {
                "include": _random_tree(rng, vocab, depth + 1),
                "exclude": {"span_term": rng.choice(vocab)},
                "pre": rng.randint(0, 2),
                "post": rng.randint(0, 2),
            }
        }
    key = "span_containing" if kind == "span_containing" else "span_within"
    return {
        key: {
            "big": {
                "span_near": {
                    "clauses": [
                        _random_tree(rng, vocab, depth + 2),
                        _random_tree(rng, vocab, depth + 2),
                    ],
                    "slop": rng.choice([1, 3, 10]),
                    "in_order": rng.random() < 0.5,
                }
            },
            "little": _random_tree(rng, vocab, depth + 1),
        }
    }


def test_eval_spans_random_vs_spec():
    rng = random.Random(11)
    vocab = ["a", "b", "c", "d"]
    checked = 0
    for _ in range(400):
        tree = _random_tree(rng, vocab)
        npos = rng.randint(2, 14)
        allpos = rng.sample(range(1, 25), npos)
        posmap: dict = {}
        for p in allpos:
            posmap.setdefault(rng.choice(vocab), []).append(p)
        pm = _pm(**{t: sorted(v) for t, v in posmap.items()})
        got = eval_spans(tree, pm)
        want = brute_spans(tree, pm)
        assert got == want, (tree, {t: list(v) for t, v in pm.items()})
        checked += 1
    assert checked == 400


def test_span_freq_contract():
    # term: freq == tf (each occurrence weight 1)
    assert span_freq({"span_term": "a"}, _pm(a=[1, 5, 9])) == 3.0
    # near: each window weighted 1/(1+gaps) against the tree min_width
    tree = {"span_near": {"clauses": ["a", "b"], "slop": 4, "in_order": True}}
    assert span_freq(tree, _pm(a=[1], b=[4])) == pytest.approx(1 / 3)


def test_tree_helpers_and_guards():
    tree = {
        "span_not": {
            "include": {"span_or": {"clauses": ["a", "b"]}},
            "exclude": "x",
        }
    }
    assert span_leaf_terms(tree) == {"a", "b", "x"}
    assert span_leaf_terms(tree, positive_only=True) == {"a", "b"}
    assert span_min_width(tree) == 1
    assert (
        span_min_width(
            {"span_near": {"clauses": ["a", {"span_or": {"clauses": ["b", "c"]}}]}}
        )
        == 2
    )
    for bad in (
        {"span_term": ""},
        {"span_near": {"clauses": []}},
        {"span_near": {"clauses": ["a"], "slop": -1}},
        {"span_first": {"match": "a", "end": 0}},
        {"span_not": {"include": "a", "exclude": "b", "pre": -1}},
        {"bogus": "a"},
        {"span_term": "a", "span_or": []},
    ):
        with pytest.raises((ValueError, KeyError)):
            validate_span_tree(bad)


# ---- end-to-end over a corpus ------------------------------------------------

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "quick brown fox and then quick brown fox again"),
    (2, "fox brown quick"),
    (3, "quick x x brown y fox"),
    (4, "brown fox quick brown"),
    (5, "singleton"),
    (6, "quick dog"),
    (7, "lazy brown things sleep"),
]

TREES = [
    (100, {"span_near": {"clauses": ["quick", "brown", "fox"],
                         "slop": 0, "in_order": True}}),
    (101, {"span_near": {"clauses": ["quick", "fox"],
                         "slop": 3, "in_order": False}}),
    (102, {"span_or": {"clauses": ["fox", "dog"]}}),
    (103, {"span_first": {"match": "quick", "end": 2}}),
    (104, {"span_not": {"include": "brown", "exclude": "lazy",
                        "pre": 2, "post": 2}}),
    (105, {"span_containing": {
        "big": {"span_near": {"clauses": ["quick", "fox"],
                              "slop": 5, "in_order": True}},
        "little": "brown"}}),
    (106, {"span_within": {
        "big": {"span_near": {"clauses": ["quick", "fox"],
                              "slop": 5, "in_order": True}},
        "little": "brown"}}),
    (107, {"span_near": {
        "clauses": [{"span_or": {"clauses": ["quick", "lazy"]}}, "dog"],
        "slop": 1, "in_order": True}}),
    (108, {"span_term": "unicorn"}),            # absent term: no hits
    (109, {"span_or": {"clauses": ["fox", "unicorn"]}}),  # absent branch ok
]


def _brute_corpus(k=10, k1=1.2, b=0.75):
    toks = {d: t.split() for d, t in DOCS}
    n = len(toks)
    avgdl = sum(len(t) for t in toks.values()) / n
    df: dict = {}
    for t in toks.values():
        for w in set(t):
            df[w] = df.get(w, 0) + 1
    out = []
    for qid, tree in TREES:
        pos_terms = span_leaf_terms(tree, positive_only=True)
        sum_idf = sum(idf_py(df[t], n) for t in sorted(pos_terms) if t in df)
        mw = span_min_width(tree)
        hits = []
        for d, t in toks.items():
            posmap = {}
            for p, w in enumerate(t, start=1):
                posmap.setdefault(w, []).append(p)
            f = 0.0
            for s, e in brute_spans(tree, posmap):
                f += 1.0 / (1.0 + ((e - s + 1) - mw))
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
    path = tempfile.mkdtemp(prefix="spidx_")
    build_positional_index(docs, path, segment_size=3, codec=codec)
    return path


@pytest.mark.parametrize("codec", ["varint", "pfor"])
def test_index_matches_corpus_brute_force(spark, codec):
    path = _build(spark, codec=codec)
    got = _rows(span_search_index(spark, path, TREES, k=10))
    want = _brute_corpus()
    assert got == want
    qids_with_hits = {r[0] for r in got}
    assert 108 not in qids_with_hits          # absent term
    assert 109 in qids_with_hits              # absent or-branch still fires
    assert {100, 101, 102, 103, 104} <= qids_with_hits


def test_span_near_is_exact_phrase(spark):
    """The anchor identity: span_near(term clauses, slop=0, in_order)
    == match_phrase slop=0 (the oracle-gated path)."""
    path = _build(spark)
    phrases = [(1, "quick brown fox"), (2, "lazy dog"), (3, "brown fox")]
    trees = [
        (qid, {"span_near": {"clauses": p.split(), "slop": 0, "in_order": True}})
        for qid, p in phrases
    ]
    a = _rows(span_search_index(spark, path, trees, k=10))
    b = _rows(phrase_search_index(spark, path, phrases, k=10))
    assert a == b and len(a) > 0


def test_bare_span_term_scores_like_match(spark):
    """A bare span_term scores the term's own BM25 (freq == tf, idf of
    the one term) — comparable across the positional family."""
    from sgpt_spark.operators.index_search import search_index
    from sgpt_spark.operators.indexer import read_index

    path = _build(spark)
    postings, meta = read_index(spark, path)
    a = _rows(span_search_index(spark, path, [(1, {"span_term": "fox"})], k=10))
    b = _rows(
        search_index(spark, postings, meta, [(1, "fox")], k=10)
    )
    assert a == b and len(a) > 0


def test_term_stats_paths_agree(spark):
    path = _build(spark)
    base = _rows(span_search_index(spark, path, TREES, k=10))
    stats = {
        r["term"]: int(r["df"])
        for r in spark.read.parquet(f"{path}/positions")
        .filter("term is not null")
        .groupBy("term")
        .agg({"df": "sum"})
        .withColumnRenamed("sum(df)", "df")
        .collect()
    }
    with_stats = _rows(span_search_index(spark, path, TREES, k=10, term_stats=stats))
    assert base == with_stats


# --- r6: flat-near vectorized kernel vs the tree-walk spec ------------------


def test_flat_near_groups_detection():
    from sgpt_spark.operators.spans import _flat_near_groups, _flat_variants

    # bare terms + or-groups, disjoint -> fast shape, one variant
    t = {"span_near": {"clauses": [
        {"span_or": {"clauses": ["a", "b"]}}, "c", {"span_term": "d"},
    ], "slop": 3, "in_order": False}}
    assert _flat_near_groups(t) == ([("a", "b"), ("c",), ("d",)], False, 3)
    v = _flat_variants([("a", "b"), ("c",), ("d",)], False)
    assert v is not None and len(v) == 1
    assert sorted(v[0]) == [(("a", "b"), 1), (("c",), 1), (("d",), 1)]
    # a term shared between an or-group and a singleton -> TWO variants
    # (group realized privately, or by the shared term at r=2)
    v2 = _flat_variants([("a", "b"), ("a",)], False)
    assert v2 is not None and len(v2) == 2
    assert sorted(sorted(var) for var in v2) == [
        [(("a",), 1), (("b",), 1)],
        [(("a",), 2)],
    ]
    # ordered + overlap: clause order binds -> tree walk
    assert _flat_variants([("a", "b"), ("a",)], True) is None
    # a term in TWO multi groups -> tree walk
    assert _flat_variants([("a", "b"), ("a", "c")], False) is None
    # repeated singleton -> multiplicity 2, single variant
    v3 = _flat_variants([("a",), ("a",)], False)
    assert v3 == [[(("a",), 2)]]
    # nested near stays on the interpreter
    t3 = {"span_near": {"clauses": [
        {"span_near": {"clauses": ["a", "b"], "slop": 0}}, "c",
    ], "slop": 1}}
    assert _flat_near_groups(t3) is None
    # non-near root -> None
    assert _flat_near_groups({"span_or": {"clauses": ["a", "b"]}}) is None


def test_flat_near_interval_reduction_matches_span_freq():
    """The r6 fast path scores a flat span_near as interval_freq over
    per-clause position unions. Property-check the reduction against
    span_freq (the brute-force-anchored spec) on randomized flat trees:
    disjoint width-1 clauses make the non-overlap constraint automatic,
    so minimal spanned windows == minimal intervals."""
    import random

    from sgpt_spark.operators.intervals import interval_freq
    from sgpt_spark.operators.spans import _flat_near_groups, span_freq

    rng = random.Random(2026)
    vocab = list("abcdefgh")
    for trial in range(400):
        n_clauses = rng.randint(1, 4)
        pool = vocab[:]
        rng.shuffle(pool)
        groups, cursor = [], 0
        for _ in range(n_clauses):
            size = rng.randint(1, 2)
            groups.append(tuple(sorted(pool[cursor:cursor + size])))
            cursor += size
        slop = rng.randint(0, 5)
        in_order = rng.random() < 0.5
        clauses = [
            g[0] if len(g) == 1 else {"span_or": {"clauses": list(g)}}
            for g in groups
        ]
        tree = {"span_near": {"clauses": clauses, "slop": slop,
                              "in_order": in_order}}
        detected = _flat_near_groups(tree)
        assert detected == (groups, in_order, slop)
        # random document: distinct positions, each assigned one term
        n_pos = rng.randint(0, 14)
        positions = rng.sample(range(1, 40), n_pos)
        posmap = {}
        for p in positions:
            t = rng.choice(vocab)
            posmap.setdefault(t, []).append(p)
        posmap = {t: sorted(ps) for t, ps in posmap.items()}
        want = span_freq(tree, posmap)
        arrs = [
            sorted(p for t in g for p in posmap.get(t, ()))
            for g in groups
        ]
        if any(not a for a in arrs):
            got = 0.0
        else:
            import numpy as np

            got = interval_freq(
                [np.asarray(a, dtype=np.int64) for a in arrs],
                in_order, slop,
            )
        assert got == pytest.approx(want), (tree, posmap)


def test_flat_near_parts_vectorized_matches_span_freq():
    """r6: _flat_near_parts (the across-docs vectorized kernel,
    unordered and ordered) matches per-doc span_freq on randomized
    multi-doc segments — the decoded-entry contract exercised directly."""
    import random

    import numpy as np

    from sgpt_spark.operators.spans import (
        _flat_near_parts,
        _flat_variants,
        span_freq,
    )

    rng = random.Random(77)
    vocab = list("abcdefgh")
    n_checked = 0
    for trial in range(400):
        n_clauses = rng.randint(1, 4)
        overlap = rng.random() < 0.5  # half the trials share terms
        if overlap:
            groups = []
            for _ in range(n_clauses):
                size = rng.randint(1, 2)
                groups.append(tuple(sorted(rng.sample(vocab[:5], size))))
        else:
            pool = vocab[:]
            rng.shuffle(pool)
            groups, cursor = [], 0
            for _ in range(n_clauses):
                size = rng.randint(1, 2)
                groups.append(tuple(sorted(pool[cursor:cursor + size])))
                cursor += size
        slop = rng.randint(0, 5)
        in_order = rng.random() < 0.5
        variants = _flat_variants(groups, in_order)
        if variants is None:
            continue  # tree-walk shapes (ordered overlap, group-group)
        n_checked += 1
        clauses = [
            g[0] if len(g) == 1 else {"span_or": {"clauses": list(g)}}
            for g in groups
        ]
        tree = {"span_near": {"clauses": clauses, "slop": slop,
                              "in_order": in_order}}
        # random multi-doc segment: per doc distinct positions, one term
        # per position; build decoded {(term): (docs, dls, occ_doc, occ_pos)}
        n_docs = rng.randint(1, 6)
        posmaps, by_term = {}, {}
        for d in range(n_docs):
            n_pos = rng.randint(0, 12)
            positions = sorted(rng.sample(range(1, 30), n_pos))
            pm = {}
            for p in positions:
                t = rng.choice(vocab)
                pm.setdefault(t, []).append(p)
            posmaps[d] = pm
            for t, ps in pm.items():
                by_term.setdefault(t, []).append((d, ps))
        decoded = {}
        for t, rows in by_term.items():
            docs = np.array([d for d, _ in rows], dtype=np.int64)
            tfs = np.array([len(ps) for _, ps in rows])
            dls = np.array(
                [sum(len(v) for v in posmaps[d].values()) for d, _ in rows],
                dtype=np.int64,
            )
            occ_doc = np.repeat(docs, tfs)
            occ_pos = np.concatenate(
                [np.array(ps, dtype=np.int64) for _, ps in rows]
            )
            decoded[t] = (docs, dls, occ_doc, occ_pos)
        want = {
            d: span_freq(tree, posmaps[d])
            for d in range(n_docs)
            if span_freq(tree, posmaps[d]) > 0.0
        }
        got_raw = _flat_near_parts(decoded, groups, variants, in_order, slop)
        got = (
            {}
            if got_raw is None
            else dict(zip(got_raw[0].tolist(),
                          [round(v, 9) for v in got_raw[1].tolist()]))
        )
        want = {d: round(v, 9) for d, v in want.items()}
        assert got == want, (trial, tree, posmaps)
        # dls must align per emitted doc
        if got_raw is not None:
            for d, dl in zip(got_raw[0].tolist(), got_raw[2].tolist()):
                assert dl == sum(len(v) for v in posmaps[d].values())
    assert n_checked > 150  # the generator must exercise the kernel
