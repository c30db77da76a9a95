"""ES search aggregations (terms / histogram over the match set):
from-scratch Python brute force, the ES bucket-order and empty-bucket
(min_doc_count=0) semantics, guards, gate equality vs DuckDB, and the
two displaced-row registry twins."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sgpt_spark.operators.aggs import histogram_agg, match_candidates, terms_agg
from sgpt_spark.operators.indexer import build_postings_with_docvalues

pytestmark = pytest.mark.usefixtures("spark")

DOCS = [
    (0, "quick brown fox", "en", 150),
    (1, "quick dog", "en", 40),
    (2, "lazy dog sleeps", "es", 260),
    (3, "quick quick brown", "es", 155),
    (4, "a cat", "fr", 30),
    (5, "brown bear quick", None, 520),  # null lang: excluded from terms
    (6, "unrelated words only", "de", 99),
    (7, "quick brown dance", "en", 41),
]
SCHEMA = "doc_id long, text string, lang string, n_chars long"
QUERIES = [(100, "quick"), (101, "brown dog"), (102, "absentterm")]


def _brute_match(queries=QUERIES):
    toks = {d: t.split() for d, t, *_ in DOCS}
    out = set()
    for qid, q in queries:
        for d, ts in toks.items():
            if any(t in ts for t in q.split()):
                out.add((qid, d))
    return out


def _brute_terms(field_idx, size):
    rows = {d[0]: d for d in DOCS}
    counts: dict = {}
    for qid, d in _brute_match():
        v = rows[d][field_idx]
        if v is None:
            continue
        counts[(qid, str(v))] = counts.get((qid, str(v)), 0) + 1
    out = []
    by_qid: dict = {}
    for (qid, v), c in counts.items():
        by_qid.setdefault(qid, []).append((v, c))
    for qid, vs in by_qid.items():
        vs.sort(key=lambda x: (-x[1], x[0]))
        for rk, (v, c) in enumerate(vs[:size], 1):
            out.append((qid, v, c, rk))
    return sorted(out)


def _brute_histogram(interval):
    rows = {d[0]: d for d in DOCS}
    counts: dict = {}
    for qid, d in _brute_match():
        v = rows[d][3]
        b = (v // interval) * interval
        counts[(qid, b)] = counts.get((qid, b), 0) + 1
    out = []
    by_qid: dict = {}
    for (qid, b), c in counts.items():
        by_qid.setdefault(qid, {})[b] = c
    for qid, bs in by_qid.items():
        lo, hi = min(bs), max(bs)
        for b in range(lo, hi + 1, interval):
            out.append((qid, b, bs.get(b, 0)))
    return sorted(out)


def _build(spark):
    docs = spark.createDataFrame(DOCS, SCHEMA)
    postings, dv, meta = build_postings_with_docvalues(
        docs.repartition(3), ["lang", "n_chars"], segment_size=3
    )
    cand = match_candidates(
        spark, postings, meta,
        spark.createDataFrame(QUERIES, "qid long, query string"),
    )
    return cand, dv


def test_match_candidates_brute_force(spark):
    cand, _ = _build(spark)
    got = {(r["qid"], r["doc_id"]) for r in cand.collect()}
    assert got == _brute_match() and got


def test_terms_agg_brute_force(spark):
    cand, dv = _build(spark)
    got = sorted(
        (r["qid"], r["value"], r["doc_count"], r["bucket_rank"])
        for r in terms_agg(cand, dv, "lang", size=2).collect()
    )
    assert got == _brute_terms(2, 2) and got
    # null-lang doc 5 matched queries but is bucketless
    assert not any(v is None for _, v, _, _ in got)


def test_histogram_agg_brute_force_with_empty_buckets(spark):
    cand, dv = _build(spark)
    got = sorted(
        (r["qid"], r["bucket"], r["doc_count"])
        for r in histogram_agg(cand, dv, "n_chars", interval=100).collect()
    )
    want = _brute_histogram(100)
    assert got == want and got
    # the fixture forces a gap: doc 5 (n_chars 520) vs the 0-200 cluster
    # -> zero-count buckets must appear (min_doc_count=0, ES default)
    assert any(c == 0 for _, _, c in got)
    # min_doc_count=1 drops exactly the zero buckets
    got1 = sorted(
        (r["qid"], r["bucket"], r["doc_count"])
        for r in histogram_agg(
            cand, dv, "n_chars", interval=100, min_doc_count=1
        ).collect()
    )
    assert got1 == [x for x in want if x[2] > 0]


def test_guards(spark):
    cand, dv = _build(spark)
    with pytest.raises(ValueError, match="not in docvalues columns"):
        terms_agg(cand, dv, "nope")
    with pytest.raises(ValueError, match="not in docvalues columns"):
        histogram_agg(cand, dv, "nope", 10)
    with pytest.raises(ValueError, match="interval must be positive"):
        histogram_agg(cand, dv, "n_chars", 0)


def _duck(sf):
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    return con


def test_terms_agg_gate_duckdb_equality(spark):
    """Gate row match_terms_agg_lang: exact registry query vs exact
    registry SQL at sf0.001 (the driver repeats this at sf0.01)."""
    import __spark_entry__ as entry

    sf = "/root/testdata/sf0.001"
    got = sorted(
        (r["qid"], r["value"], r["doc_count"], r["bucket_rank"])
        for r in entry._q_match_terms_agg(spark, sf).collect()
    )
    want = sorted(
        (q, v, int(c), int(rk))
        for q, v, c, rk in _duck(sf).execute(entry._TERMS_AGG_SQL).fetchall()
    )
    assert got == want and len(got) > 0


def test_histogram_agg_gate_duckdb_equality(spark):
    import __spark_entry__ as entry

    sf = "/root/testdata/sf0.001"
    got = sorted(
        (r["qid"], r["bucket"], r["doc_count"])
        for r in entry._q_match_histogram_agg(spark, sf).collect()
    )
    want = sorted(
        (q, int(b), int(c))
        for q, b, c in _duck(sf).execute(entry._HISTOGRAM_AGG_SQL).fetchall()
    )
    assert got == want and len(got) > 0


def test_truncation_stats_duckdb_equality(spark):
    """truncation_stats left the driver window for match_terms_agg_lang
    (round 5); exact registry query vs exact registry SQL at sf0.001."""
    import __spark_entry__ as entry

    sf = "/root/testdata/sf0.001"
    got = [
        tuple(
            round(x, 6) if isinstance(x, float) else x
            for x in (r["n_docs"], r["n_truncated"], r["tokens_before"],
                      r["tokens_after"], r["truncated_frac"])
        )
        for r in entry._q_truncation_stats(spark, sf).collect()
    ]
    want = [
        tuple(round(x, 6) if isinstance(x, float) else int(x) for x in row)
        for row in _duck(sf).execute(entry._TRUNCATION_STATS_SQL).fetchall()
    ]
    assert got == want and len(got) == 1


def test_corr_stats_duckdb_equality(spark):
    """corr_stats left the driver window for match_histogram_agg
    (round 5); exact registry query vs exact registry SQL at sf0.001."""
    import __spark_entry__ as entry

    sf = "/root/testdata/sf0.001"
    got = [
        (round(r["pearson"], 6), round(r["spearman"], 6))
        for r in entry._q_corr_stats(spark, sf).collect()
    ]
    want = [
        (round(p, 6), round(s, 6))
        for p, s in _duck(sf).execute(entry._CORR_STATS_SQL).fetchall()
    ]
    assert got == want and len(got) == 1
