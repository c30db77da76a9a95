"""Round-6 optimization identity tests: the agg-family rewrites must be
value-identical to the spelling they replaced (the reroute rule — every
changed default keeps a pinned/brute-force twin check).

Covers:
  * percentiles_agg exact=False: now the distributed histogram+window
    type-7 percentile — must equal the exact path EVERYWHERE (not just
    on element-aligned sets, which test_aggs already pins).
  * adjacency_matrix_agg: the bitmask single-pass path vs the pinned
    pairwise self-join (strategy='selfjoin') on randomized data.
  * range_agg: the one-pass conditional-sum spelling vs a brute-force
    python recomputation on randomized data (test_aggs pins the
    empty-bucket contract; this pins the counting on a bigger shape).
"""

from __future__ import annotations

import random

import pytest


def _mini_match(spark, rows, dv_rows, dv_schema="doc_id long, lang string, v long"):
    cand = spark.createDataFrame(rows, "qid string, doc_id long")
    dv = spark.createDataFrame(dv_rows, dv_schema)
    return cand, dv


def test_percentiles_approx_equals_exact_everywhere(spark):
    """The scale path (exact=False) computes the SAME type-7 linear
    interpolation as the exact path at any percentile position — the
    old QuantileSummaries sketch only agreed on element-aligned sets."""
    from sgpt_spark.operators.aggs import percentiles_agg

    rnd = random.Random(60)
    rows = []
    dv_rows = []
    for d in range(97):  # deliberately not percentile-aligned
        dv_rows.append((d, "en", rnd.randrange(0, 500)))
    for q in range(5):
        for d in range(97):
            if rnd.random() < 0.6:
                rows.append((f"q{q}", d))
    cand, dv = _mini_match(spark, rows, dv_rows)
    ps = (1, 5, 25, 37.5, 50, 75, 95, 99)
    exact = {
        (r["qid"], r["percent"]): r["value"]
        for r in percentiles_agg(cand, dv, "v", percents=ps).collect()
    }
    approx = {
        (r["qid"], r["percent"]): r["value"]
        for r in percentiles_agg(cand, dv, "v", percents=ps,
                                 exact=False).collect()
    }
    assert set(exact) == set(approx)
    for k, v in exact.items():
        assert approx[k] == pytest.approx(v, abs=1e-9), k


def test_adjacency_matrix_mask_vs_selfjoin(spark):
    """The bitmask one-pass path == the pinned self-join spelling on a
    randomized filter battery (names, overlaps, all-false docs)."""
    from sgpt_spark.operators.aggs_ext import adjacency_matrix_agg

    rnd = random.Random(61)
    dv_rows = [
        (d, rnd.choice(["en", "es", "de"]), rnd.randrange(0, 400))
        for d in range(200)
    ]
    rows = [
        (f"q{q}", d) for q in range(6) for d in range(200)
        if rnd.random() < 0.5
    ]
    cand, dv = _mini_match(spark, rows, dv_rows)
    filters = {
        "en": "lang = 'en'",
        "es": "lang = 'es'",
        "big": "v >= 200",
        "tiny": "v < 20",
        "never": "v < 0",
    }
    got = {
        (r["qid"], r["key"]): r["doc_count"]
        for r in adjacency_matrix_agg(cand, dv, filters).collect()
    }
    ref = {
        (r["qid"], r["key"]): r["doc_count"]
        for r in adjacency_matrix_agg(
            cand, dv, filters, strategy="selfjoin"
        ).collect()
    }
    assert got == ref
    assert all(v > 0 for v in got.values())  # empty buckets omitted


def test_adjacency_matrix_mask_schema_and_guard(spark):
    from sgpt_spark.operators.aggs_ext import adjacency_matrix_agg

    cand, dv = _mini_match(spark, [("q0", 0)], [(0, "en", 1)])
    out = adjacency_matrix_agg(cand, dv, {"en": "lang = 'en'"})
    assert [f.name for f in out.schema.fields] == ["qid", "key", "doc_count"]
    assert out.schema["doc_count"].dataType.simpleString() == "bigint"
    with pytest.raises(ValueError):
        adjacency_matrix_agg(cand, dv, {"en": "lang = 'en'"},
                             strategy="nope")


def test_range_agg_one_pass_brute_force(spark):
    """The one-pass conditional-sum spelling reproduces per-bucket
    counts, overlapping ranges, and the all-NULL-qid zero rows."""
    from sgpt_spark.operators.aggs import range_agg, range_key

    rnd = random.Random(62)
    dv_rows = [
        (d, "en", rnd.randrange(0, 400) if d % 7 else None)
        for d in range(150)
    ]
    rows = [
        (f"q{q}", d) for q in range(5) for d in range(150)
        if rnd.random() < 0.5
    ]
    # one query matching ONLY docs whose value is NULL: its buckets all 0
    null_docs = [d for d in range(0, 150, 7)]
    rows += [("qnull", d) for d in null_docs]
    cand, dv = _mini_match(spark, rows, dv_rows)
    ranges = [(None, 100), (50, 300), (300, None)]
    got = {
        (r["qid"], r["range_key"]): r["doc_count"]
        for r in range_agg(cand, dv, "v", ranges).collect()
    }
    vals = {d: v for d, _, v in dv_rows}
    by_q: dict = {}
    for q, d in rows:
        by_q.setdefault(q, []).append(vals[d])
    ref = {}
    for q, vs in by_q.items():
        for lo, hi in ranges:
            c = sum(
                1 for v in vs
                if v is not None
                and (lo is None or v >= lo)
                and (hi is None or v < hi)
            )
            ref[(q, range_key(lo, hi))] = c
    assert got == ref
    assert got[("qnull", range_key(None, 100))] == 0
