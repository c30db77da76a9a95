"""Multi-term query family (operators/multiterm.py): prefix / wildcard /
fuzzy — expansion correctness, index==exhaustive identity across codecs
and rewrites, Lucene-formula brute-force checks, and the DuckDB-equality
twins for the two registry entries the round-5 multiterm gates displaced
(ir_metrics_mean, pricing_summary)."""

from __future__ import annotations

import math
import tempfile

import pytest
from pyspark.sql import functions as F

from sgpt_spark.functions.bm25 import idf_py
from sgpt_spark.operators.indexer import build_postings
from sgpt_spark.operators.multiterm import (
    expand_prefix,
    expand_wildcard,
    fuzzy_search,
    fuzzy_search_index,
    prefix_search,
    prefix_search_index,
    wildcard_literal_prefix,
    wildcard_search,
    wildcard_search_index,
)

DOCS = [
    (0, "spark part sort part"),
    (1, "fast hash part"),
    (2, "agg big a agg"),
    (3, "table tab tape"),
    (4, "100% a_b spark"),
    (5, "part sort sorted sorting"),
]


def _docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def _rows(df):
    return sorted((r["qid"], r["doc_id"], r["score"], r["rank"]) for r in df.collect())


# --- index == exhaustive identity -----------------------------------------


@pytest.mark.parametrize("rewrite", ["constant_score", "scoring_boolean"])
@pytest.mark.parametrize("codec", ["varint", "pfor"])
def test_prefix_index_matches_exhaustive(spark, rewrite, codec):
    docs = _docs(spark)
    postings, meta = build_postings(docs, segment_size=2, codec=codec)
    prefixes = [(1, "s"), (2, "ta"), (3, "zzz")]
    a = _rows(prefix_search(docs, prefixes, k=5, rewrite=rewrite))
    b = _rows(
        prefix_search_index(spark, postings, meta, prefixes, k=5, rewrite=rewrite)
    )
    assert a == b and len(a) > 0
    # qid 3 ("zzz") matches nothing
    assert not [r for r in a if r[0] == 3]


def test_wildcard_index_matches_exhaustive(spark):
    docs = _docs(spark)
    postings, meta = build_postings(docs, segment_size=2)
    pats = [(1, "s*t"), (2, "*le"), (3, "t?b"), (4, "part")]
    a = _rows(wildcard_search(docs, pats, k=5, rewrite="scoring_boolean"))
    b = _rows(
        wildcard_search_index(spark, postings, meta, pats, k=5, rewrite="scoring_boolean")
    )
    assert a == b and len(a) > 0
    # leading-wildcard "*le" found "table"; "t?b" found "tab"; bare
    # literal "part" behaves as a TermQuery
    assert {r[0] for r in a} == {1, 2, 3, 4}


@pytest.mark.parametrize("max_edits,prefix_length", [(1, 0), (2, 0), (2, 1)])
def test_fuzzy_index_matches_exhaustive(spark, max_edits, prefix_length):
    docs = _docs(spark)
    postings, meta = build_postings(docs, segment_size=2)
    qts = [(1, "part"), (2, "agg"), (3, "zzzzzzz")]
    a = _rows(
        fuzzy_search(docs, qts, k=5, max_edits=max_edits, prefix_length=prefix_length)
    )
    b = _rows(
        fuzzy_search_index(
            spark, postings, meta, qts, k=5,
            max_edits=max_edits, prefix_length=prefix_length,
        )
    )
    assert a == b and len(a) > 0
    assert not [r for r in a if r[0] == 3]


# --- collect-path TAAT strategy == relational join strategy ----------------


def test_taat_strategy_matches_join(spark):
    docs = _docs(spark)
    postings, meta = build_postings(docs, segment_size=2)
    prefixes = [(1, "s"), (2, "ta"), (3, "zz")]
    a = _rows(prefix_search_index(spark, postings, meta, prefixes, k=5,
                                  rewrite="scoring_boolean", max_expansions=1024))
    b = _rows(prefix_search_index(spark, postings, meta, prefixes, k=5,
                                  rewrite="scoring_boolean", max_expansions=1024,
                                  strategy="taat"))
    assert a == b and len(a) > 0
    qts = [(1, "part"), (2, "agg")]
    a = _rows(fuzzy_search_index(spark, postings, meta, qts, k=5, max_edits=2))
    b = _rows(fuzzy_search_index(spark, postings, meta, qts, k=5, max_edits=2,
                                 strategy="taat"))
    assert a == b and len(a) > 0
    pats = [(1, "s*t"), (2, "*le")]
    a = _rows(wildcard_search_index(spark, postings, meta, pats, k=5,
                                    rewrite="scoring_boolean", max_expansions=1024))
    b = _rows(wildcard_search_index(spark, postings, meta, pats, k=5,
                                    rewrite="scoring_boolean", max_expansions=1024,
                                    strategy="taat"))
    assert a == b and len(a) > 0


def test_taat_strategy_guards(spark):
    """taat refuses constant_score (a set op, not a weighted sum) and an
    unbounded expansion (the collect must be max_expansions-capped)."""
    docs = _docs(spark)
    postings, meta = build_postings(docs, segment_size=2)
    with pytest.raises(ValueError, match="scoring_boolean"):
        prefix_search_index(spark, postings, meta, [(1, "s")], k=5,
                            max_expansions=10, strategy="taat")
    with pytest.raises(ValueError, match="max_expansions"):
        prefix_search_index(spark, postings, meta, [(1, "s")], k=5,
                            rewrite="scoring_boolean", strategy="taat")
    with pytest.raises(ValueError, match="unknown strategy"):
        prefix_search_index(spark, postings, meta, [(1, "s")], k=5,
                            strategy="wand")


# --- Lucene-formula brute force --------------------------------------------


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_fuzzy_matches_brute_force(spark):
    """The whole fuzzy pipeline (length-band expansion, boost, blended
    df, summed BM25, top-k tie-break) against a from-scratch Python
    reimplementation of the documented Lucene semantics."""
    docs = _docs(spark)
    qterm, e, k = "part", 2, 10
    got = _rows(fuzzy_search(docs, [(7, qterm)], k=k, max_edits=e))

    toks = {d: t.split(" ") for d, t in DOCS}
    df: dict[str, int] = {}
    for ts in toks.values():
        for t in set(ts):
            df[t] = df.get(t, 0) + 1
    n = len(DOCS)
    avgdl = sum(len(t) for t in toks.values()) / n
    exp = [
        (t, 1.0 - _lev(t, qterm) / min(len(qterm), len(t)))
        for t in df
        if _lev(t, qterm) <= e
    ]
    exp.sort(key=lambda x: (-x[1], x[0]))
    exp = exp[:50]
    df_blend = max(df[t] for t, _ in exp)
    want = []
    for d, ts in toks.items():
        s = 0.0
        for t, boost in exp:
            tf = ts.count(t)
            if tf:
                dl = len(ts)
                s += boost * idf_py(df_blend, n) * tf / (
                    tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl)
                )
        if s > 0:
            want.append((d, round(s, 6)))
    want.sort(key=lambda x: (-x[1], x[0]))
    want = [(7, d, s, i + 1) for i, (d, s) in enumerate(want[:k])]
    assert len(got) == len(want)
    for g, w in zip(got, sorted(want)):
        assert g[0] == w[0] and g[1] == w[1] and g[3] == w[3]
        assert math.isclose(g[2], w[2], abs_tol=1e-6)


def test_wildcard_literal_prefix():
    assert wildcard_literal_prefix("spa*") == "spa"
    assert wildcard_literal_prefix("s?ark") == "s"
    assert wildcard_literal_prefix("*ark") == ""
    assert wildcard_literal_prefix("plain") == "plain"


def test_wildcard_escapes_like_metachars(spark):
    """Corpus terms containing literal LIKE metacharacters (%, _) must
    match only literally — '100%' the pattern has no */? so it is a
    plain term lookup and must NOT match '100x'-style terms."""
    docs = spark.createDataFrame(
        [(0, "100% done"), (1, "100x done"), (2, "a_b mark"), (3, "axb mark")],
        "doc_id long, text string",
    )
    r = wildcard_search(docs, [(1, "100%"), (2, "a_b")], k=5)
    hits = {(row["qid"], row["doc_id"]) for row in r.collect()}
    assert hits == {(1, 0), (2, 2)}


def test_prefix_max_expansions_term_order(spark):
    """max_expansions keeps the FIRST N terms in term order (Lucene's
    boost-tie rewrite order for prefix, where all boosts are 1)."""
    docs = _docs(spark)
    from sgpt_spark.operators.stats import doc_terms, term_df, term_freqs

    dfs = term_df(term_freqs(doc_terms(docs)))
    prefixes = spark.createDataFrame([(1, "s")], "qid long, prefix string")
    got = sorted(
        r["term"] for r in expand_prefix(dfs, prefixes, max_expansions=2).collect()
    )
    all_s = sorted(r["term"] for r in dfs.filter(F.col("term").startswith("s")).collect())
    assert got == all_s[:2]


def test_empty_prefix_raises(spark):
    docs = _docs(spark)
    with pytest.raises(ValueError, match="empty prefix"):
        prefix_search(docs, [(1, "")], k=5).collect()


def test_unknown_rewrite_raises(spark):
    docs = _docs(spark)
    with pytest.raises(ValueError, match="unknown rewrite"):
        prefix_search(docs, [(1, "s")], k=5, rewrite="bitset").collect()


def test_constant_score_ranks_by_doc_id(spark):
    docs = _docs(spark)
    r = _rows(prefix_search(docs, [(1, "s")], k=3, rewrite="constant_score"))
    # every score 1.0, ranked by ascending doc_id (the bitset rewrite's
    # deterministic tie-break)
    assert len(r) == 3 and all(x[2] == 1.0 for x in r)
    assert [x[1] for x in r] == sorted(x[1] for x in r)
    assert [x[3] for x in r] == [1, 2, 3]


# --- registry gate twins (exact registry query vs exact registry SQL) -----


def _duck(sf):
    import duckdb

    from sgpt_spark.sources.tables import TABLES

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    return con


def _cmp(sdf, sql, con):
    def norm(v):
        return round(v, 6) if isinstance(v, float) else v

    cols = sorted(sdf.columns)
    got = sorted(tuple(norm(r[c]) for c in cols) for r in sdf.collect())
    duck = con.sql(sql)
    idx = [list(duck.columns).index(c) for c in cols]
    want = sorted(tuple(norm(row[i]) for i in idx) for row in duck.fetchall())
    assert sorted(duck.columns) == cols
    assert got == want and len(got) > 0


@pytest.mark.parametrize("key", ["bm25_prefix_index_top10", "bm25_fuzzy_index_top10"])
def test_multiterm_gate_oracle_equality(spark, key):
    import __spark_entry__ as em

    sf = "/root/testdata/sf0.001"
    _cmp(em.queries()[key](spark, sf), em.oracle_sql()[key], _duck(sf))


def test_ir_metrics_mean_duckdb_equality(spark):
    """ir_metrics_mean ceded its driver-window slot to
    bm25_prefix_index_top10 (round 5); its DuckDB value equality lives
    here, running the exact registry query against the exact SQL."""
    import __spark_entry__ as em

    sf = "/root/testdata/sf0.001"
    _cmp(em.queries()["ir_metrics_mean"](spark, sf), em._METRICS_SQL, _duck(sf))


def test_pricing_summary_duckdb_equality(spark):
    """pricing_summary ceded its driver-window slot to
    bm25_fuzzy_index_top10 (round 5); DuckDB value equality lives here."""
    import __spark_entry__ as em

    sf = "/root/testdata/sf0.001"
    _cmp(em.queries()["pricing_summary"](spark, sf), em._PRICING_SQL, _duck(sf))


# --- regexp (the last MultiTermQuery member) -------------------------------


def _dict_terms():
    return sorted({t for _, text in DOCS for t in text.split()})


@pytest.mark.parametrize("rewrite", ["constant_score", "scoring_boolean"])
@pytest.mark.parametrize("codec", ["varint", "pfor"])
def test_regexp_index_matches_exhaustive(spark, rewrite, codec):
    from sgpt_spark.operators.multiterm import regexp_search, regexp_search_index

    docs = _docs(spark)
    postings, meta = build_postings(docs, segment_size=2, codec=codec)
    pats = [(1, "s.*t"), (2, ".*le"), (3, "t.b"), (4, "part(s|ed)?"),
            (5, "ag+"), (6, "zzz.*")]
    a = _rows(regexp_search(docs, pats, k=5, rewrite=rewrite))
    b = _rows(
        regexp_search_index(spark, postings, meta, pats, k=5, rewrite=rewrite)
    )
    assert a == b and len(a) > 0
    assert not [r for r in a if r[0] == 6]


def test_regexp_expansion_brute_force(spark):
    """expand_regexp == Python re.fullmatch over the dictionary —
    including the quantified-prefix trap: 'ag*' must match term 'a'
    (the 'g' is quantified, so only 'a' is a safe literal prefix)."""
    import re

    from sgpt_spark.operators.multiterm import expand_regexp

    docs = _docs(spark)
    postings, _ = build_postings(docs, segment_size=2)
    ts = postings.filter(F.col("term").isNotNull()).groupBy("term").agg(
        F.sum("df").alias("df")
    )
    pats = [(1, "ag*"), (2, "sort(ing|ed)?"), (3, "[st]a.*"), (4, "a_b"),
            (5, "100%"), (6, "t{2}")]
    got = sorted(
        (r["qid"], r["term"])
        for r in expand_regexp(
            ts, spark.createDataFrame(pats, "qid long, pattern string")
        ).collect()
    )
    want = sorted(
        (qid, t)
        for qid, p in pats
        for t in _dict_terms()
        if re.fullmatch(p, t)
    )
    assert got == want and (1, "a") in got and (1, "agg") in got


def test_regexp_taat_matches_join(spark):
    from sgpt_spark.operators.multiterm import regexp_search_index

    docs = _docs(spark)
    postings, meta = build_postings(docs, segment_size=2)
    pats = [(1, "s.*"), (2, "tab.?e?"), (3, "zz.*")]
    a = _rows(regexp_search_index(spark, postings, meta, pats, k=5,
                                  rewrite="scoring_boolean", max_expansions=1024))
    b = _rows(regexp_search_index(spark, postings, meta, pats, k=5,
                                  rewrite="scoring_boolean", max_expansions=1024,
                                  strategy="taat"))
    assert a == b and len(a) > 0


def test_regexp_max_expansions_term_order(spark):
    from sgpt_spark.operators.multiterm import expand_regexp

    docs = _docs(spark)
    postings, _ = build_postings(docs, segment_size=2)
    ts = postings.filter(F.col("term").isNotNull()).groupBy("term").agg(
        F.sum("df").alias("df")
    )
    pats = spark.createDataFrame([(1, "s.*")], "qid long, pattern string")
    all_terms = sorted(
        r["term"] for r in expand_regexp(ts, pats).collect()
    )
    capped = sorted(
        r["term"] for r in expand_regexp(ts, pats, max_expansions=2).collect()
    )
    assert len(all_terms) > 2 and capped == all_terms[:2]


# --- r6: the cogroup kernel under strategy='join' vs the relational twin ----


def test_join_strategy_cogroup_matches_relational(spark):
    """r6: scoring_boolean strategy='join' executes on the cogroup TAAT
    kernel; it must be value-identical to the pinned relational probe
    (strategy='relational') for every family, including fuzzy's blended
    weights."""
    from sgpt_spark.operators.multiterm import (
        fuzzy_search_index,
        prefix_search_index,
        regexp_search_index,
        wildcard_search_index,
    )

    docs = _docs(spark)
    postings, meta = build_postings(docs, segment_size=2)
    pfx = [(1, "s"), (2, "ta"), (3, "pa")]
    a = _rows(prefix_search_index(spark, postings, meta, pfx, k=10,
                                  rewrite="scoring_boolean"))
    b = _rows(prefix_search_index(spark, postings, meta, pfx, k=10,
                                  rewrite="scoring_boolean",
                                  strategy="relational"))
    assert a == b and len(a) > 0
    pats = [(1, "s*"), (2, "t?b")]
    a = _rows(wildcard_search_index(spark, postings, meta, pats, k=10,
                                    rewrite="scoring_boolean"))
    b = _rows(wildcard_search_index(spark, postings, meta, pats, k=10,
                                    rewrite="scoring_boolean",
                                    strategy="relational"))
    assert a == b and len(a) > 0
    res = [(1, "so.*"), (2, "t.b")]
    a = _rows(regexp_search_index(spark, postings, meta, res, k=10,
                                  rewrite="scoring_boolean"))
    b = _rows(regexp_search_index(spark, postings, meta, res, k=10,
                                  rewrite="scoring_boolean",
                                  strategy="relational"))
    assert a == b and len(a) > 0
    fz = [(1, "sparc"), (2, "tap"), (3, "sorte")]
    a = _rows(fuzzy_search_index(spark, postings, meta, fz, k=10,
                                 max_edits=2, prefix_length=0))
    b = _rows(fuzzy_search_index(spark, postings, meta, fz, k=10,
                                 max_edits=2, prefix_length=0,
                                 strategy="relational"))
    assert a == b and len(a) > 0
