"""ES search aggregations (terms / histogram / metric sub-aggs / stats
/ range / cardinality over the match set): from-scratch Python brute
force, the ES bucket-order and empty-bucket (min_doc_count=0)
semantics, guards, gate equality vs DuckDB, and the displaced-row
registry twins."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sgpt_spark.operators.aggs import (
    cardinality_agg,
    histogram_agg,
    match_candidates,
    range_agg,
    stats_agg,
    terms_agg,
)
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
    with pytest.raises(ValueError, match="unknown metric"):
        terms_agg(cand, dv, "lang", metrics=[("median", "n_chars")])
    with pytest.raises(ValueError, match="metric field"):
        terms_agg(cand, dv, "lang", metrics=[("avg", "nope")])
    with pytest.raises(ValueError, match="not in docvalues columns"):
        stats_agg(cand, dv, "nope")
    with pytest.raises(ValueError, match="at least one range"):
        range_agg(cand, dv, "n_chars", [])
    with pytest.raises(ValueError, match="duplicate range buckets"):
        range_agg(cand, dv, "n_chars", [(0, 10), (0, 10)])
    with pytest.raises(ValueError, match="not in docvalues columns"):
        cardinality_agg(cand, dv, "nope")


def test_terms_metric_subagg_brute_force(spark):
    """ES metric sub-aggs inside terms buckets: doc_count counts all
    bucket docs; avg/max compute over non-null metric values only;
    bucket order unchanged."""
    cand, dv = _build(spark)
    rows = {d[0]: d for d in DOCS}
    per_bucket: dict = {}
    for qid, d in _brute_match():
        lang, nc = rows[d][2], rows[d][3]
        if lang is None:
            continue
        per_bucket.setdefault((qid, lang), []).append(nc)
    want = []
    by_qid: dict = {}
    for (qid, v), ncs in per_bucket.items():
        by_qid.setdefault(qid, []).append((v, ncs))
    for qid, vs in by_qid.items():
        vs.sort(key=lambda x: (-len(x[1]), x[0]))
        for rk, (v, ncs) in enumerate(vs[:2], 1):
            want.append((qid, v, len(ncs), sum(ncs) / len(ncs), max(ncs), rk))
    got = sorted(
        (r["qid"], r["value"], r["doc_count"], r["avg_n_chars"],
         r["max_n_chars"], r["bucket_rank"])
        for r in terms_agg(
            cand, dv, "lang", size=2,
            metrics=[("avg", "n_chars"), ("max", "n_chars")],
        ).collect()
    )
    assert got == sorted(want) and got


def test_stats_agg_brute_force(spark):
    cand, dv = _build(spark)
    rows = {d[0]: d for d in DOCS}
    per_qid: dict = {}
    for qid, d in _brute_match():
        per_qid.setdefault(qid, []).append(rows[d][3])
    want = sorted(
        (qid, len(ncs), min(ncs), max(ncs), sum(ncs) / len(ncs), sum(ncs))
        for qid, ncs in per_qid.items()
    )
    got = sorted(
        (r["qid"], r["value_count"], r["min_value"], r["max_value"],
         r["avg_value"], r["sum_value"])
        for r in stats_agg(cand, dv, "n_chars").collect()
    )
    assert got == want and got


def test_range_agg_brute_force_emits_empty_buckets(spark):
    cand, dv = _build(spark)
    ranges = [(None, 100), (100, 300), (300, None), (1000, None)]
    keys = ["*-100", "100-300", "300-*", "1000-*"]
    rows = {d[0]: d for d in DOCS}
    per_qid: dict = {}
    for qid, d in _brute_match():
        per_qid.setdefault(qid, []).append(rows[d][3])
    want = []
    for qid, ncs in per_qid.items():
        for key, (lo, hi) in zip(keys, ranges):
            c = sum(
                1 for v in ncs
                if (lo is None or v >= lo) and (hi is None or v < hi)
            )
            want.append((qid, key, c))
    got = sorted(
        (r["qid"], r["range_key"], r["doc_count"])
        for r in range_agg(cand, dv, "n_chars", ranges).collect()
    )
    assert got == sorted(want) and got
    # the 1000-* bucket is empty for every query yet always emitted
    assert all(c == 0 for q, k, c in got if k == "1000-*")
    assert any(k == "1000-*" for _, k, _ in got)


def test_cardinality_agg_exact_and_hll_agree(spark):
    """Exact count_distinct vs the HyperLogLog++ scale path (the sketch
    ES's cardinality agg itself runs): identical at small cardinality
    (HLL++ sparse-register regime is exact), and NULL lang never
    counts."""
    cand, dv = _build(spark)
    rows = {d[0]: d for d in DOCS}
    per_qid: dict = {}
    for qid, d in _brute_match():
        if rows[d][2] is not None:
            per_qid.setdefault(qid, set()).add(rows[d][2])
    want = sorted((qid, len(s)) for qid, s in per_qid.items())
    got_exact = sorted(
        (r["qid"], r["value_count"])
        for r in cardinality_agg(cand, dv, "lang").collect()
    )
    got_hll = sorted(
        (r["qid"], r["value_count"])
        for r in cardinality_agg(cand, dv, "lang", exact=False).collect()
    )
    assert got_exact == want and got_exact
    assert got_hll == want


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


def test_terms_metric_agg_gate_duckdb_equality(spark):
    """Gate row match_terms_metric_agg: exact registry query vs exact
    registry SQL at sf0.001 (the driver repeats this at sf0.01). The
    avg sub-metric compares EXACTLY — both engines compute integer
    sum/count and one IEEE division."""
    import __spark_entry__ as entry

    sf = "/root/testdata/sf0.001"
    got = sorted(
        (r["qid"], r["value"], r["doc_count"], r["avg_n_chars"],
         r["max_n_chars"], r["bucket_rank"])
        for r in entry._q_match_terms_metric_agg(spark, sf).collect()
    )
    want = sorted(
        (q, v, int(c), a, int(mx), int(rk))
        for q, v, c, a, mx, rk in _duck(sf)
        .execute(entry._TERMS_METRIC_AGG_SQL)
        .fetchall()
    )
    assert got == want and len(got) > 0


def test_stats_agg_gate_duckdb_equality(spark):
    import __spark_entry__ as entry

    sf = "/root/testdata/sf0.001"
    got = sorted(
        (r["qid"], r["value_count"], r["min_value"], r["max_value"],
         r["avg_value"], r["sum_value"])
        for r in entry._q_match_stats_agg(spark, sf).collect()
    )
    want = sorted(
        (q, int(c), int(lo), int(hi), a, int(s))
        for q, c, lo, hi, a, s in _duck(sf)
        .execute(entry._STATS_AGG_SQL)
        .fetchall()
    )
    assert got == want and len(got) > 0


def test_histogram_agg_gate_duckdb_equality(spark):
    """match_histogram_agg left the driver window for geo_distance_top10
    (round 5; its interval bucketing + empty-bucket fill stay gated via
    histogram_pipeline_agg's filled parent); exact registry query vs
    exact registry SQL at sf0.001."""
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


def test_range_agg_gate_duckdb_equality(spark):
    import __spark_entry__ as entry

    sf = "/root/testdata/sf0.001"
    got = sorted(
        (r["qid"], r["range_key"], r["doc_count"])
        for r in entry._q_match_range_agg(spark, sf).collect()
    )
    want = sorted(
        (q, k, int(c))
        for q, k, c in _duck(sf).execute(entry._RANGE_AGG_SQL).fetchall()
    )
    assert got == want and len(got) > 0


def test_cardinality_agg_gate_duckdb_equality(spark):
    import __spark_entry__ as entry

    sf = "/root/testdata/sf0.001"
    got = sorted(
        (r["qid"], r["value_count"])
        for r in entry._q_match_cardinality_agg(spark, sf).collect()
    )
    want = sorted(
        (q, int(c))
        for q, c in _duck(sf).execute(entry._CARDINALITY_AGG_SQL).fetchall()
    )
    assert got == want and len(got) > 0


def test_doc_stats_duckdb_equality(spark):
    """doc_stats left the driver window for match_cardinality_agg
    (round 5); exact registry query vs exact registry SQL at sf0.001."""
    import __spark_entry__ as entry

    sf = "/root/testdata/sf0.001"
    got = sorted(
        (r["doc_id"], r["doc_len"])
        for r in entry._q_doc_stats(spark, sf).collect()
    )
    want = sorted(
        (int(d), int(l))
        for d, l in _duck(sf).execute(entry._DOC_STATS_SQL).fetchall()
    )
    assert got == want and len(got) > 0


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


def _brute_significant(size, min_doc_count):
    toks = {d: t.split() for d, t, *_ in DOCS}
    bg_n = len([d for d, ts in toks.items() if ts])
    bg = {}
    for ts in toks.values():
        for t in set(ts):
            bg[t] = bg.get(t, 0) + 1
    out = []
    for qid in {q for q, _ in _brute_match()}:
        docs_q = [d for q, d in _brute_match() if q == qid]
        fg_n = len(docs_q)
        counts = {}
        for d in docs_q:
            for t in set(toks[d]):
                counts[t] = counts.get(t, 0) + 1
        rows = []
        for t, fg in counts.items():
            if fg < min_doc_count:
                continue
            fgp, bgp = fg / fg_n, bg[t] / bg_n
            if fgp > bgp:
                rows.append((round((fgp - bgp) * fgp / bgp, 6), t, fg, bg[t]))
        rows.sort(key=lambda r: (-r[0], r[1]))
        for rk, (s, t, fg, bgc) in enumerate(rows[:size], 1):
            out.append((qid, t, fg, bgc, s, rk))
    return sorted(out)


@pytest.mark.parametrize("size,min_dc", [(3, 1), (10, 2)])
def test_significant_terms_brute_force(spark, size, min_dc):
    from sgpt_spark.operators.aggs import significant_terms_agg
    from sgpt_spark.operators.indexer import build_postings

    docs = spark.createDataFrame(DOCS, SCHEMA)
    postings, meta = build_postings(docs.repartition(3), segment_size=3)
    tstats = postings.groupBy("term").agg(F.sum("df").alias("df"))
    cand = match_candidates(
        spark, postings, meta,
        spark.createDataFrame(QUERIES, "qid long, query string"),
    )
    res = significant_terms_agg(cand, docs, meta, tstats, size=size,
                                min_doc_count=min_dc)
    got = sorted(
        (r["qid"], r["term"], r["fg_count"], r["bg_count"],
         round(r["score"], 6), r["bucket_rank"])
        for r in res.collect()
    )
    assert got == _brute_significant(size, min_dc) and got


def test_significant_terms_excludes_background_share(spark):
    """A term as frequent in the background as in the foreground (fgp
    <= bgp) is never significant — the JLH exclusion, not just a low
    score."""
    from sgpt_spark.operators.aggs import significant_terms_agg
    from sgpt_spark.operators.indexer import build_postings

    # 'everywhere' is in every doc: fgp == bgp == 1.0 for any match set
    docs = spark.createDataFrame(
        [(i, f"everywhere t{i % 2}") for i in range(6)],
        "doc_id long, text string",
    )
    postings, meta = build_postings(docs, segment_size=3)
    tstats = postings.groupBy("term").agg(F.sum("df").alias("df"))
    cand = match_candidates(
        spark, postings, meta, [(0, "t0")],
    )
    res = significant_terms_agg(cand, docs, meta, tstats, size=10,
                                min_doc_count=1).collect()
    terms = {r["term"] for r in res}
    assert "everywhere" not in terms and "t0" in terms


def test_significant_text_filter_duplicate_text(spark):
    """ES significant_text's copied-boilerplate guard: 4 exact copies
    of a doc containing 'virus' collapse to ONE before counting, so the
    term's fg evidence (and fg_size) reflect distinct text — vs the
    unfiltered run where the copies dominate the buckets."""
    from sgpt_spark.operators.aggs import significant_terms_agg
    from sgpt_spark.operators.indexer import build_postings

    boiler = "breaking virus alert copy"
    docs = spark.createDataFrame(
        [(i, boiler) for i in range(4)]
        + [(4, "virus research paper"), (5, "unrelated filler text"),
           (6, "more filler words here"), (7, "filler again entirely")],
        "doc_id long, text string",
    )
    postings, meta = build_postings(docs, segment_size=3)
    tstats = postings.groupBy("term").agg(F.sum("df").alias("df"))
    cand = match_candidates(spark, postings, meta, [(0, "virus")])

    raw = {
        r["term"]: (r["fg_count"], r["score"])
        for r in significant_terms_agg(
            cand, docs, meta, tstats, size=10, min_doc_count=1
        ).collect()
    }
    dedup = {
        r["term"]: (r["fg_count"], r["score"])
        for r in significant_terms_agg(
            cand, docs, meta, tstats, size=10, min_doc_count=1,
            filter_duplicate_text=True,
        ).collect()
    }
    # unfiltered: 5 hits, boilerplate terms carry fg 4
    assert raw["breaking"][0] == 4 and raw["virus"][0] == 5
    # deduped: the 4 copies collapse to one -> fg_size 2, boiler fg 1,
    # so 'breaking' (fgp 0.5 == bgp 4/8) stops being significant at all
    assert "breaking" not in dedup and dedup["virus"][0] == 2
    # python recount of the deduped JLH for 'virus': fgp=1, bgp=5/8
    fgp, bgp = 1.0, 5 / 8
    assert dedup["virus"][1] == pytest.approx(
        round((fgp - bgp) * fgp / bgp, 6)
    )
    # no duplicates -> flag is a no-op
    docs2 = spark.createDataFrame(DOCS, SCHEMA)
    postings2, meta2 = build_postings(docs2.repartition(3), segment_size=3)
    t2 = postings2.groupBy("term").agg(F.sum("df").alias("df"))
    cand2 = match_candidates(
        spark, postings2, meta2,
        spark.createDataFrame(QUERIES, "qid long, query string"),
    )
    a = sorted(map(tuple, significant_terms_agg(
        cand2, docs2, meta2, t2, size=10, min_doc_count=1).collect()))
    b = sorted(map(tuple, significant_terms_agg(
        cand2, docs2, meta2, t2, size=10, min_doc_count=1,
        filter_duplicate_text=True).collect()))
    assert a == b and a


def test_significant_terms_guards(spark):
    from sgpt_spark.operators.aggs import significant_terms_agg
    from sgpt_spark.operators.indexer import build_postings

    docs = spark.createDataFrame(DOCS, SCHEMA)
    postings, meta = build_postings(docs, segment_size=3)
    tstats = postings.groupBy("term").agg(F.sum("df").alias("df"))
    cand = match_candidates(spark, postings, meta, QUERIES)
    with pytest.raises(ValueError, match="size"):
        significant_terms_agg(cand, docs, meta, tstats, size=0)
    with pytest.raises(ValueError, match="min_doc_count"):
        significant_terms_agg(cand, docs, meta, tstats, min_doc_count=0)


def test_significant_terms_gate_duckdb_equality(spark):
    """Gate row match_significant_terms: exact registry query vs exact
    registry SQL at sf0.001 (the driver repeats this at sf0.01)."""
    import __spark_entry__ as entry

    sf = "/root/testdata/sf0.001"
    got = sorted(
        (r["qid"], r["term"], r["fg_count"], r["bg_count"],
         round(r["score"], 6), r["bucket_rank"])
        for r in entry._q_match_significant_terms(spark, sf).collect()
    )
    want = sorted(
        (q, t, int(fg), int(bg), round(s, 6), int(rk))
        for q, t, fg, bg, s, rk in _duck(sf)
        .execute(entry._SIGNIFICANT_TERMS_SQL)
        .fetchall()
    )
    assert got == want and len(got) > 0


def test_term_df_top100_duckdb_equality(spark):
    """term_df_top100 left the driver window for match_significant_terms
    (round 5 — the termstats values stay gated through its bg_count
    column); exact registry query vs exact registry SQL at sf0.001."""
    import __spark_entry__ as entry

    sf = "/root/testdata/sf0.001"
    got = sorted(
        (r["term"], r["df"])
        for r in entry._q_term_df_top100(spark, sf).collect()
    )
    want = sorted(
        (t, int(d))
        for t, d in _duck(sf)
        .execute(
            f"WITH {entry._TOKENS_CTE} SELECT term, df FROM tdf "
            "ORDER BY df DESC, term ASC LIMIT 100"
        )
        .fetchall()
    )
    assert got == want and len(got) > 0


def _brute_date_histogram(interval_months, min_dc):
    import datetime

    base = datetime.date(2024, 1, 1)
    dates = {
        d: (base + datetime.timedelta(days=n)).replace(day=1)
        for d, _, _, n in ((x[0], x[1], x[2], x[3]) for x in DOCS)
    }

    def trunc(dt):
        m = (dt.month - 1) // interval_months * interval_months + 1
        return dt.replace(month=m, day=1)

    out = []
    for qid in {q for q, _ in _brute_match()}:
        docs_q = [d for q, d in _brute_match() if q == qid]
        counts = {}
        for d in docs_q:
            b = trunc(dates[d])
            counts[b] = counts.get(b, 0) + 1
        if min_dc == 1:
            for b, c in counts.items():
                out.append((qid, b, c))
            continue
        lo, hi = min(counts), max(counts)
        b = lo
        while b <= hi:
            out.append((qid, b, counts.get(b, 0)))
            mm = b.month - 1 + interval_months
            b = b.replace(year=b.year + mm // 12, month=mm % 12 + 1)
    return sorted(out)


@pytest.mark.parametrize("interval,months,min_dc",
                         [("month", 1, 0), ("quarter", 3, 0), ("month", 1, 1)])
def test_date_histogram_brute_force(spark, interval, months, min_dc):
    from sgpt_spark.operators.aggs import date_histogram_agg

    docs = spark.createDataFrame(DOCS, SCHEMA).withColumn(
        "pub_date",
        F.date_add(F.to_date(F.lit("2024-01-01")), F.col("n_chars").cast("int")),
    )
    postings, dv, meta = build_postings_with_docvalues(
        docs.repartition(3), ["pub_date"], segment_size=3
    )
    cand = match_candidates(
        spark, postings, meta,
        spark.createDataFrame(QUERIES, "qid long, query string"),
    )
    res = date_histogram_agg(cand, dv, "pub_date", interval,
                             min_doc_count=min_dc)
    got = sorted((r["qid"], r["bucket"], r["doc_count"]) for r in res.collect())
    assert got == _brute_date_histogram(months, min_dc) and got


def test_date_histogram_guards(spark):
    from sgpt_spark.operators.aggs import date_histogram_agg

    docs = spark.createDataFrame(DOCS, SCHEMA).withColumn(
        "pub_date", F.to_date(F.lit("2024-01-01"))
    )
    postings, dv, meta = build_postings_with_docvalues(
        docs, ["pub_date"], segment_size=3
    )
    cand = match_candidates(spark, postings, meta, QUERIES)
    with pytest.raises(ValueError, match="calendar_interval"):
        date_histogram_agg(cand, dv, "pub_date", "fortnight")
    with pytest.raises(ValueError, match="not in docvalues"):
        date_histogram_agg(cand, dv, "nope", "month")
    with pytest.raises(ValueError, match="min_doc_count"):
        date_histogram_agg(cand, dv, "pub_date", "month", min_doc_count=5)


def test_top_hits_brute_force(spark):
    from sgpt_spark.operators.aggs import top_hits_agg
    from sgpt_spark.operators.funcscore import match_scores

    docs = spark.createDataFrame(DOCS, SCHEMA)
    postings, dv, meta = build_postings_with_docvalues(
        docs.repartition(3), ["lang", "n_chars"], segment_size=3
    )
    qdf = spark.createDataFrame(QUERIES, "qid long, query string")
    scored = match_scores(spark, postings, meta, qdf)
    res = top_hits_agg(scored, dv, "lang", size=2, hits=2).collect()
    # brute force off the already-verified scored relation
    sc = {(r["qid"], r["doc_id"]): round(r["score"], 6)
          for r in scored.collect()}
    lang = {d: l for d, _, l, _ in DOCS}
    by_q = {}
    for (qid, doc), s in sc.items():
        if lang[doc] is None:
            continue
        by_q.setdefault(qid, {}).setdefault(lang[doc], []).append((s, doc))
    want = []
    for qid, bks in by_q.items():
        ranked = sorted(bks.items(), key=lambda kv: (-len(kv[1]), kv[0]))[:2]
        for brk, (val, docs_b) in enumerate(ranked, 1):
            docs_b.sort(key=lambda t: (-t[0], t[1]))
            for hrk, (s, doc) in enumerate(docs_b[:2], 1):
                want.append((qid, val, len(docs_b), doc, s, brk, hrk))
    got = sorted(
        (r["qid"], r["value"], r["doc_count"], r["doc_id"],
         round(r["score"], 6), r["bucket_rank"], r["hit_rank"])
        for r in res
    )
    assert got == sorted(want) and got


def test_top_hits_guards(spark):
    from sgpt_spark.operators.aggs import top_hits_agg

    docs = spark.createDataFrame(DOCS, SCHEMA)
    _, dv, _ = build_postings_with_docvalues(docs, ["lang"], segment_size=3)
    scored = spark.createDataFrame(
        [(0, 1, 1.0)], "qid long, doc_id long, score double"
    )
    with pytest.raises(ValueError, match="not in docvalues"):
        top_hits_agg(scored, dv, "nope")
    with pytest.raises(ValueError, match=">= 1"):
        top_hits_agg(scored, dv, "lang", size=0)


def test_date_histogram_gate_duckdb_equality(spark):
    """Gate row match_date_histogram: exact registry query vs exact
    registry SQL at sf0.001 (the driver repeats this at sf0.01)."""
    import __spark_entry__ as entry

    sf = "/root/testdata/sf0.001"
    got = sorted(
        (r["qid"], r["bucket"], r["doc_count"])
        for r in entry._q_match_date_histogram(spark, sf).collect()
    )
    want = sorted(
        (q, b, int(c))
        for q, b, c in _duck(sf).execute(entry._DATE_HISTOGRAM_SQL).fetchall()
    )
    assert got == want and len(got) > 0


def test_top_hits_gate_duckdb_equality(spark):
    """Gate row match_top_hits: exact registry query vs exact registry
    SQL at sf0.001 (the driver repeats this at sf0.01)."""
    import __spark_entry__ as entry

    sf = "/root/testdata/sf0.001"
    got = sorted(
        (r["qid"], r["value"], r["doc_count"], r["doc_id"],
         round(r["score"], 6), r["bucket_rank"], r["hit_rank"])
        for r in entry._q_match_top_hits(spark, sf).collect()
    )
    want = sorted(
        (q, v, int(dc), int(d), round(s, 6), int(brk), int(hrk))
        for q, v, dc, d, s, brk, hrk in _duck(sf)
        .execute(entry._TOP_HITS_SQL)
        .fetchall()
    )
    assert got == want and len(got) > 0


def test_queryset_derive_duckdb_equality(spark):
    """queryset_derive left the driver window for match_date_histogram
    (round 5 — the identical derivation is the queryset CTE inside every
    gated BM25 oracle); exact registry query vs exact registry SQL."""
    import __spark_entry__ as entry

    sf = "/root/testdata/sf0.001"
    got = sorted(
        (r["qid"], r["query"])
        for r in entry._q_queryset(spark, sf).collect()
    )
    want = sorted(
        (int(q), s) for q, s in _duck(sf).execute(entry.QUERIES_SQL).fetchall()
    )
    assert got == want and len(got) > 0


def test_corpus_stats_duckdb_equality(spark):
    """corpus_stats left the driver window for match_top_hits (round 5 —
    N/avgdl are the stats CTE inside every gated BM25 oracle); exact
    registry query vs exact registry SQL."""
    import __spark_entry__ as entry

    sf = "/root/testdata/sf0.001"
    got = [
        (r["n_docs"], round(r["avgdl"], 6))
        for r in entry._q_corpus_stats(spark, sf).collect()
    ]
    want = [
        (int(n), round(a, 6))
        for n, a in _duck(sf)
        .execute(
            f"WITH {entry._TOKENS_CTE} SELECT count(*) AS n_docs, "
            f"round(avg(doc_len), 6) AS avgdl FROM doclen"
        )
        .fetchall()
    ]
    assert got == want and len(got) == 1


def test_sampler_candidates_brute_force(spark):
    from sgpt_spark.operators.aggs import sampler_candidates

    scored = spark.createDataFrame(
        [(0, 1, 5.0), (0, 2, 4.0), (0, 3, 4.0), (0, 4, 1.0),
         (1, 9, 2.0), (1, 8, 2.0)],
        "qid long, doc_id long, score double",
    )
    got = {(r["qid"], r["doc_id"])
           for r in sampler_candidates(scored, shard_size=2).collect()}
    # q0: 5.0 then the 4.0 tie broken by doc_id asc -> doc 2
    assert got == {(0, 1), (0, 2), (1, 8), (1, 9)}
    with pytest.raises(ValueError, match="shard_size"):
        sampler_candidates(scored, shard_size=0)


def test_sampler_composition_bounds_foreground(spark):
    """sampler -> significant_terms: the fg size per query is exactly
    min(shard_size, |match set|), and the composition equals running
    significant_terms on the brute-force top-shard_size doc set."""
    from sgpt_spark.operators.aggs import (
        sampler_candidates,
        significant_terms_agg,
    )
    from sgpt_spark.operators.funcscore import match_scores
    from sgpt_spark.operators.indexer import build_postings

    docs = spark.createDataFrame(DOCS, SCHEMA)
    postings, meta = build_postings(docs.repartition(3), segment_size=3)
    tstats = postings.groupBy("term").agg(F.sum("df").alias("df"))
    qdf = spark.createDataFrame(QUERIES, "qid long, query string")
    scored = match_scores(spark, postings, meta, qdf, term_stats=tstats)
    samp = sampler_candidates(scored, shard_size=2)
    sizes = {r["qid"]: r["n"] for r in
             samp.groupBy("qid").agg(F.count("*").alias("n")).collect()}
    assert all(n <= 2 for n in sizes.values()) and sizes
    # composition runs end to end and only reports sampled-set terms
    res = significant_terms_agg(samp, docs, meta, tstats, size=10,
                                min_doc_count=1).collect()
    top = {(r["qid"], r["doc_id"]) for r in samp.collect()}
    fg_docs = {d for _, d in top}
    all_toks = {t for d, txt, *_ in DOCS if d in fg_docs for t in txt.split()}
    assert all(r["term"] in all_toks for r in res)


def test_sampled_sig_terms_gate_duckdb_equality(spark):
    """Gate row sampled_significant_terms: exact registry query vs exact
    registry SQL at sf0.001 (the driver repeats this at sf0.01)."""
    import __spark_entry__ as entry

    sf = "/root/testdata/sf0.001"
    got = sorted(
        (r["qid"], r["term"], r["fg_count"], r["bg_count"],
         round(r["score"], 6), r["bucket_rank"])
        for r in entry._q_sampled_significant_terms(spark, sf).collect()
    )
    want = sorted(
        (q, t, int(fg), int(bg), round(s, 6), int(rk))
        for q, t, fg, bg, s, rk in _duck(sf)
        .execute(entry._SAMPLED_SIG_TERMS_SQL)
        .fetchall()
    )
    assert got == want and len(got) > 0


_DOC_TRUNCATION_SQL = """
    SELECT doc_id,
           CASE WHEN length(coalesce(text, '')) > 80
                THEN substring(coalesce(text, ''), 1, 80) || '...'
                ELSE coalesce(text, '') END AS text_trunc,
           len(list_filter(string_split(coalesce(text, ''), ' '),
                           x -> x <> '')) AS n_tokens,
           least(len(list_filter(string_split(coalesce(text, ''), ' '),
                                 x -> x <> '')), 30) AS n_tokens_trunc,
           length(coalesce(text, '')) > 80 AS was_truncated
    FROM documents
"""


def test_doc_truncation_duckdb_equality(spark):
    """doc_truncation left the driver window for sampled_significant_
    terms (round 5 — the telemetry twin truncation_stats is already
    pytest-twinned); exact registry query vs the exact SQL it carried."""
    import __spark_entry__ as entry

    sf = "/root/testdata/sf0.001"
    df = entry._q_doc_truncation(spark, sf)
    cols = sorted(df.columns)
    got = sorted(
        tuple(r[c] for c in cols) for r in df.collect()
    )
    ores = _duck(sf).execute(_DOC_TRUNCATION_SQL).fetchdf()
    assert sorted(ores.columns.tolist()) == cols
    want = sorted(
        tuple(
            bool(row[c]) if c == "was_truncated" else
            (int(row[c]) if not isinstance(row[c], str) else row[c])
            for c in cols
        )
        for _, row in ores.iterrows()
    )
    assert got == want and len(got) > 0


def test_percentiles_brute_force(spark):
    """Exact path == numpy's linear-interpolated quantile (type 7 — the
    same definition Spark percentile and DuckDB quantile_cont share)."""
    import numpy as np
    from sgpt_spark.operators.aggs import percentiles_agg

    docs = spark.createDataFrame(DOCS, SCHEMA)
    postings, dv, meta = build_postings_with_docvalues(
        docs.repartition(3), ["lang", "n_chars"], segment_size=3
    )
    cand = match_candidates(
        spark, postings, meta,
        spark.createDataFrame(QUERIES, "qid long, query string"),
    )
    ps = [1, 50, 99]
    got = sorted(
        (r["qid"], r["percent"], round(r["value"], 9))
        for r in percentiles_agg(cand, dv, "n_chars", percents=ps).collect()
    )
    vals_by_q = {}
    nch = {d: n for d, _, _, n in DOCS}
    for qid, doc in _brute_match():
        vals_by_q.setdefault(qid, []).append(nch[doc])
    want = sorted(
        (qid, float(p), round(float(np.quantile(sorted(vs), p / 100.0)), 9))
        for qid, vs in vals_by_q.items()
        for p in ps
    )
    assert got == want and got


def test_percentiles_approx_equates_on_element_aligned_sets(spark):
    """On a set whose percentile positions land exactly on elements,
    interpolation and the sketch's element selection coincide — the
    pytest equivalence for the percentile_approx scale path."""
    from sgpt_spark.operators.aggs import percentiles_agg

    # 101 docs valued 0..100: position k*(n-1)/100 is integral for all
    # integer percents
    cand = spark.createDataFrame(
        [(0, i) for i in range(101)], "qid long, doc_id long"
    )
    dv = spark.createDataFrame(
        [(i, i) for i in range(101)], "doc_id long, v long"
    )
    ps = [1, 5, 25, 50, 75, 95, 99]
    ex = sorted(
        (r["percent"], r["value"])
        for r in percentiles_agg(cand, dv, "v", percents=ps).collect()
    )
    ap = sorted(
        (r["percent"], r["value"])
        for r in percentiles_agg(cand, dv, "v", percents=ps,
                                 exact=False).collect()
    )
    assert ex == ap == [(float(p), float(p)) for p in ps]


def test_percentiles_guards(spark):
    from sgpt_spark.operators.aggs import percentiles_agg

    cand = spark.createDataFrame([(0, 1)], "qid long, doc_id long")
    dv = spark.createDataFrame([(1, 5)], "doc_id long, v long")
    with pytest.raises(ValueError, match="not in docvalues"):
        percentiles_agg(cand, dv, "nope")
    with pytest.raises(ValueError, match="at least one"):
        percentiles_agg(cand, dv, "v", percents=[])
    with pytest.raises(ValueError, match="\\[0, 100\\]"):
        percentiles_agg(cand, dv, "v", percents=[101])
    with pytest.raises(ValueError, match="duplicate"):
        percentiles_agg(cand, dv, "v", percents=[50, 50])


def test_percentiles_gate_duckdb_equality(spark):
    """Gate row match_percentiles_agg: exact registry query vs exact
    registry SQL at sf0.001 (the driver repeats this at sf0.01)."""
    import __spark_entry__ as entry

    sf = "/root/testdata/sf0.001"
    got = sorted(
        (r["qid"], r["percent"], round(r["value"], 6))
        for r in entry._q_match_percentiles(spark, sf).collect()
    )
    want = sorted(
        (q, float(p), round(v, 6))
        for q, p, v in _duck(sf).execute(entry._PERCENTILES_SQL).fetchall()
    )
    assert got == want and len(got) > 0


def test_embedding_communities_duckdb_equality(spark):
    """embedding_communities left the driver window for
    match_percentiles_agg (round 5 — connected-components evidence stays
    gated via dedup_clusters); exact registry query vs exact registry
    SQL at sf0.001."""
    import __spark_entry__ as entry
    import duckdb

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    df = entry._q_embedding_communities(spark, sf)
    cols = sorted(df.columns)
    got = sorted(
        tuple(round(r[c], 6) if isinstance(r[c], float) else r[c] for c in cols)
        for r in df.collect()
    )
    ores = con.execute(entry._COMMUNITIES_SQL).fetchdf()
    assert sorted(ores.columns.tolist()) == cols
    want = sorted(
        tuple(
            round(row[c], 6) if isinstance(row[c], float) else int(row[c])
            for c in cols
        )
        for _, row in ores.iterrows()
    )
    assert got == want and len(got) > 0


# --- filters agg (named predicate buckets; round-5 late addition) ----------


def test_filters_agg_brute_force(spark):
    from sgpt_spark.operators.aggs import filters_agg

    cand, dv = _build(spark)
    got = sorted(
        (r["qid"], r["key"], r["doc_count"])
        for r in filters_agg(
            cand, dv,
            {"english": "lang = 'en'", "long_doc": "n_chars >= 100"},
            other_bucket_key="other",
        ).collect()
    )
    rows = {d[0]: d for d in DOCS}
    want: dict = {}
    for qid, d in _brute_match():
        lang, n = rows[d][2], rows[d][3]
        en = lang == "en"          # NULL lang -> False (ES missing-field)
        lg = n >= 100
        for key, hit in (("english", en), ("long_doc", lg), ("other", not (en or lg))):
            want.setdefault((qid, key), 0)
            want[(qid, key)] += int(hit)
    assert got == sorted((q, k, c) for (q, k), c in want.items()) and got
    # every named bucket present for every matching query, even at 0
    qids = {q for q, _ in _brute_match()}
    assert {(q, k) for q, k, _ in got} == {
        (q, k) for q in qids for k in ("english", "long_doc", "other")
    }


def test_filters_agg_single_filter_and_guards(spark):
    from sgpt_spark.operators.aggs import filters_agg

    cand, dv = _build(spark)
    got = sorted(
        (r["qid"], r["key"], r["doc_count"])
        for r in filters_agg(
            cand, dv, {"es_only": "lang = 'es'"}, other_bucket_key="rest"
        ).collect()
    )
    per_qid: dict = {}
    rows = {d[0]: d for d in DOCS}
    for qid, d in _brute_match():
        es = rows[d][2] == "es"
        per_qid.setdefault(qid, [0, 0])
        per_qid[qid][0] += int(es)
        per_qid[qid][1] += int(not es)
    want = sorted(
        [(q, "es_only", a) for q, (a, _) in per_qid.items()]
        + [(q, "rest", b) for q, (_, b) in per_qid.items()]
    )
    assert got == want
    with pytest.raises(ValueError, match="at least one"):
        filters_agg(cand, dv, {})
    with pytest.raises(ValueError, match="collide"):
        filters_agg(cand, dv, {"qid": "lang = 'en'"})
    with pytest.raises(ValueError, match="collides"):
        filters_agg(cand, dv, {"a": "lang = 'en'"}, other_bucket_key="a")
