"""ES composite aggregation (full-bucket keyset pagination): from-
scratch brute force, page-concatenation == unpaged enumeration, dict
vs in-plan DataFrame cursor identity, NULL-source exclusion, guards,
and the gate rows' DuckDB equality (composite page 2 + the
bucket_script/bucket_sort terms gate that shares this file's driver
twins)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sgpt_spark.operators.aggs import composite_agg, match_candidates
from sgpt_spark.operators.indexer import build_postings_with_docvalues

pytestmark = pytest.mark.usefixtures("spark")

DOCS = [
    (0, "quick brown fox", "en", "web"),
    (1, "quick dog", "en", "news"),
    (2, "lazy dog sleeps", "es", "web"),
    (3, "quick quick brown", "es", "web"),
    (4, "quick cat", "fr", "wiki"),
    (5, "brown bear quick", None, "web"),    # NULL lang -> excluded
    (6, "quick words only", "de", None),     # NULL source -> excluded
    (7, "quick brown dance", "en", "web"),
    (8, "quick slide", "en", "wiki"),
]
SCHEMA = "doc_id long, text string, lang string, source string"
QUERIES = [(100, "quick"), (101, "brown dog"), (102, "absentterm")]


def _build(spark):
    docs = spark.createDataFrame(DOCS, SCHEMA)
    postings, dv, meta = build_postings_with_docvalues(
        docs.repartition(3), ["lang", "source"], segment_size=3
    )
    cand = match_candidates(
        spark, postings, meta,
        spark.createDataFrame(QUERIES, "qid long, query string"),
    )
    return cand, dv


def _brute_buckets():
    """All (qid, lang, source, doc_count) buckets in composite order."""
    toks = {d[0]: d[1].split() for d in DOCS}
    rows = {d[0]: d for d in DOCS}
    counts: dict = {}
    for qid, q in QUERIES:
        for d, ts in toks.items():
            if any(t in ts for t in q.split()):
                lang, src = rows[d][2], rows[d][3]
                if lang is None or src is None:
                    continue
                counts[(qid, lang, src)] = counts.get((qid, lang, src), 0) + 1
    by_qid: dict = {}
    for (qid, lang, src), c in counts.items():
        by_qid.setdefault(qid, []).append((lang, src, c))
    for v in by_qid.values():
        v.sort()
    return by_qid


def test_composite_page1_brute_force(spark):
    cand, dv = _build(spark)
    got = sorted(
        (r["qid"], r["lang"], r["source"], r["doc_count"], r["bucket_rank"])
        for r in composite_agg(cand, dv, ["lang", "source"], size=3).collect()
    )
    want = sorted(
        (qid, lang, src, c, i)
        for qid, bs in _brute_buckets().items()
        for i, (lang, src, c) in enumerate(bs[:3], 1)
    )
    assert got == want and len(got) > 3


def test_composite_pages_concat_equals_full(spark):
    """Walking every page via after-cursors enumerates EVERY bucket
    exactly once, in composite-key order — the composite contract."""
    cand, dv = _build(spark)
    full = composite_agg(cand, dv, ["lang", "source"], size=1000)
    want = sorted(
        (r["qid"], r["lang"], r["source"], r["doc_count"])
        for r in full.collect()
    )
    got = []
    after: dict = {}
    qids = {q for q, _ in QUERIES}
    while qids:
        page_cand = cand.filter(F.col("qid").isin(list(qids)))
        page = composite_agg(
            page_cand, dv, ["lang", "source"], size=2,
            after={k: v for k, v in after.items() if k in qids} or None,
            spark=spark,
        ).collect()
        got += [(r["qid"], r["lang"], r["source"], r["doc_count"]) for r in page]
        last = {}
        for r in page:
            last[r["qid"]] = ((r["lang"], r["source"]), r["bucket_rank"])
        # a qid continues only if its page was FULL (ES: fewer than
        # size buckets means enumeration is done)
        qids = {q for q, (_, rk) in last.items() if rk == 2}
        after = {q: key for q, (key, _) in last.items()}
    assert sorted(got) == want and len(got) == len(set(got))


def test_composite_cursor_dataframe_form(spark):
    """The in-plan DataFrame cursor (unbounded query sets) == dict."""
    cand, dv = _build(spark)
    after = {100: ("en", "web")}
    got_dict = composite_agg(
        cand.filter("qid = 100"), dv, ["lang", "source"], size=10,
        after=after, spark=spark,
    )
    cur = spark.createDataFrame(
        [(100, "en", "web")], "qid long, a1 string, a2 string"
    )
    got_df = composite_agg(
        cand.filter("qid = 100"), dv, ["lang", "source"], size=10, after=cur
    )
    rows = lambda df: sorted(  # noqa: E731
        (r["qid"], r["lang"], r["source"], r["doc_count"], r["bucket_rank"])
        for r in df.collect()
    )
    assert rows(got_dict) == rows(got_df) and rows(got_dict)
    # cursor is EXCLUSIVE: the ("en","web") bucket itself is gone
    assert all(not (l == "en" and s == "web") for _, l, s, _, _ in rows(got_dict))


def test_composite_guards(spark):
    cand, dv = _build(spark)
    with pytest.raises(ValueError, match="at least one source"):
        composite_agg(cand, dv, [], size=3)
    with pytest.raises(ValueError, match="not in docvalues"):
        composite_agg(cand, dv, ["absent"], size=3)
    with pytest.raises(ValueError, match="size must be"):
        composite_agg(cand, dv, ["lang"], size=0)
    with pytest.raises(ValueError, match="needs spark="):
        composite_agg(cand, dv, ["lang"], size=3, after={100: ("en",)})
    # empty dict cursor == page 1
    a = composite_agg(cand, dv, ["lang"], size=3)
    b = composite_agg(cand, dv, ["lang"], size=3, after={}, spark=spark)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def _duck(sf):
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    return con


def test_composite_gate_duckdb_equality(spark):
    """Gate row composite_agg_page2: exact registry query vs exact
    registry SQL at sf0.001 (the driver repeats this at sf0.01)."""
    import __spark_entry__ as entry

    sf = "/root/testdata/sf0.001"
    got = sorted(
        (r["qid"], r["lang"], r["source"], r["doc_count"], r["bucket_rank"])
        for r in entry._q_composite_page2(spark, sf).collect()
    )
    want = sorted(
        (q, l, s, int(c), int(rk))
        for q, l, s, c, rk in _duck(sf)
        .execute(entry._COMPOSITE_PAGE2_SQL)
        .fetchall()
    )
    assert got == want and len(got) > 0


def test_terms_bucket_sort_gate_duckdb_equality(spark):
    """Gate row terms_bucket_sort_agg: exact registry query vs SQL."""
    import __spark_entry__ as entry

    sf = "/root/testdata/sf0.001"
    got = sorted(
        (r["qid"], r["value"], r["doc_count"], r["sum_n_chars"],
         round(r["chars_per_doc"], 9), r["bucket_rank"], r["sort_rank"])
        for r in entry._q_terms_bucket_sort(spark, sf).collect()
    )
    want = sorted(
        (q, v, int(c), int(sc), round(float(cpd), 9), int(br), int(sr))
        for q, v, c, sc, cpd, br, sr in _duck(sf)
        .execute(entry._TERMS_BUCKET_SORT_SQL)
        .fetchall()
    )
    assert got == want and len(got) > 0


def test_ceded_rows_still_registered(spark):
    """match_cardinality_agg + sampled_significant_terms left the
    window for the two new gates; their exact-registry DuckDB equality
    lives on in test_aggs.py. Assert registry placement."""
    import __spark_entry__ as entry

    names = list(entry.queries())
    for ceded in ("match_cardinality_agg", "sampled_significant_terms"):
        assert ceded in names and names.index(ceded) >= 50
    for gated in ("terms_bucket_sort_agg", "composite_agg_page2"):
        assert names.index(gated) < 50 and gated in entry.oracle_sql()
