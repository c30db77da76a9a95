"""ES ``bool`` compound query (must / should / must_not / filter):
from-scratch Python brute force over an adversarial fixture, exhaustive
== index-path identity (both codecs, multi-segment), ES
minimum_should_match defaulting, the clause-bitmap guards, and the
degenerate clause shapes (empty text, corpus-absent terms, duplicate
clauses, pure negation refused)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from sgpt_spark.operators.boolquery import (
    MAX_CLAUSES,
    bool_search,
    bool_search_index,
    bool_search_index_cogroup,
)
from sgpt_spark.operators.indexer import build_postings

pytestmark = pytest.mark.usefixtures("spark")

K1, B = 1.2, 0.75

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "quick brown fox and quick brown foxtrot again"),
    (2, "a a a ab"),
    (3, "brown quick fox"),
    (4, "the fox is quick and brown"),
    (5, "quick brown wolf"),
    (6, "foam fog foil fond font"),
    (7, "singleton"),
    (8, "lazy dog lazy dog lazy"),
    (9, "quick dog"),
]

# long-form clause rows: (qid, occur, query)
CLAUSES = [
    # plain must + should
    (100, "must", "quick brown"),
    (100, "should", "fox"),
    # must_not knocks out the top fox hits
    (101, "must", "quick"),
    (101, "must_not", "fox foxtrot"),
    # filter-only: non-scoring, score 0.0, doc_id tie-break
    (102, "filter", "lazy"),
    # should-only (default minimum_should_match = 1)
    (103, "should", "wolf"),
    (103, "should", "singleton"),
    # filter + should: should is optional (default msm = 0) but scores
    (104, "filter", "dog"),
    (104, "should", "lazy"),
    # must with a corpus-absent term still matches via the present one
    (105, "must", "quick unicorn"),
    # must clause entirely corpus-absent -> matches nothing
    (106, "must", "unicorn"),
    (106, "should", "quick"),
    # duplicate should clauses count twice (Lucene duplicate BooleanClauses)
    (107, "should", "fox"),
    (107, "should", "fox"),
    (107, "should", "dog"),
    # empty-text must clause -> MatchNoDocs -> whole bool matches nothing
    (108, "must", "   "),
    (108, "should", "quick"),
    # duplicated token inside one clause (qtf = 2 in the score)
    (109, "must", "lazy lazy dog"),
]


def brute_force(docs, clauses, k=10, msm=None):
    """Independent reimplementation: per-doc clause matching + BM25 sum."""
    toks = {d: [x for x in t.split() if x] for d, t in docs}
    toks = {d: t for d, t in toks.items() if t}
    n = len(toks)
    avgdl = sum(len(t) for t in toks.values()) / n
    df: dict[str, int] = {}
    for t in toks.values():
        for term in set(t):
            df[term] = df.get(term, 0) + 1

    def idf(term):
        return math.log(1 + (n - df[term] + 0.5) / (df[term] + 0.5))

    by_qid: dict = {}
    for qid, occur, text in clauses:
        terms = [x for x in (text or "").split() if x]
        by_qid.setdefault(qid, []).append((occur, terms))

    out = []
    for qid, cls in by_qid.items():
        n_should = sum(1 for o, _ in cls if o == "should")
        has_req = any(o in ("must", "filter") for o, _ in cls)
        if n_should == 0:
            req = 0
        elif msm is None:
            req = 0 if has_req else 1
        else:
            req = msm
        hits = []
        for d, dt in toks.items():
            dset = set(dt)
            matched_any = False
            m_should = 0
            ok = True
            score = 0.0
            for occur, terms in cls:
                m = any(t in dset for t in terms)
                if m:
                    matched_any = True
                if occur in ("must", "filter") and not m:
                    ok = False
                if occur == "must_not" and m:
                    ok = False
                if occur == "should" and m:
                    m_should += 1
                if occur in ("must", "should"):
                    for t in terms:
                        tf = dt.count(t)
                        if tf:
                            score += idf(t) * tf / (
                                tf + K1 * (1 - B + B * len(dt) / avgdl)
                            )
            if ok and matched_any and (n_should == 0 or m_should >= req):
                hits.append((d, round(score, 6)))
        hits.sort(key=lambda x: (-x[1], x[0]))
        for rank, (d, s) in enumerate(hits[:k], 1):
            out.append((qid, d, s, rank))
    return sorted(out)


def _rows(df):
    return sorted((r["qid"], r["doc_id"], r["score"], r["rank"]) for r in df.collect())


def _cl_df(spark, rows):
    return spark.createDataFrame(rows, "qid long, occur string, query string")


def test_exhaustive_matches_brute_force(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = _rows(bool_search(docs, _cl_df(spark, CLAUSES), k=10))
    assert got == brute_force(DOCS, CLAUSES, k=10)
    # sanity on the interesting shapes
    qids = {q for q, *_ in got}
    assert 100 in qids and 102 in qids and 104 in qids and 105 in qids
    assert 106 not in qids and 108 not in qids  # MatchNoDocs musts
    # must_not really removed the fox docs from 101
    docs_101 = {d for q, d, _, _ in got if q == 101}
    assert docs_101 and not ({0, 1, 3, 4} & docs_101)
    # filter-only query scores 0.0 with doc_id-asc order
    f_rows = sorted((d, s, r) for q, d, s, r in got if q == 102)
    assert [s for _, s, _ in f_rows] == [0.0] * len(f_rows)
    assert [d for d, _, _ in f_rows] == sorted(d for d, _, _ in f_rows)


@pytest.mark.parametrize("codec", ["varint", "pfor"])
def test_index_matches_exhaustive(spark, codec):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    postings, meta = build_postings(docs, segment_size=3, codec=codec)
    cl = _cl_df(spark, CLAUSES)
    assert _rows(bool_search_index(spark, postings, meta, cl, k=10)) == _rows(
        bool_search(docs, cl, k=10)
    )


@pytest.mark.parametrize("codec", ["varint", "pfor"])
def test_cogroup_matches_exhaustive(spark, codec):
    """The in-plan twin (no driver collect) over the full adversarial
    clause fixture — MatchNoDocs musts, corpus-absent terms, duplicate
    clauses, filter-only scoring all included — both codecs,
    multi-segment."""
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    postings, meta = build_postings(docs, segment_size=3, codec=codec)
    cl = _cl_df(spark, CLAUSES)
    assert _rows(bool_search_index_cogroup(spark, postings, meta, cl, k=10)) == _rows(
        bool_search(docs, cl, k=10)
    )


def test_cogroup_iterable_and_term_stats_contracts(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    postings, meta = build_postings(docs, segment_size=4)
    cl_rows = [(100, "must", "quick brown"), (100, "should", "fox")]
    exp = _rows(bool_search(docs, _cl_df(spark, cl_rows), k=10))
    # iterable clause input
    got = _rows(bool_search_index_cogroup(spark, postings, meta, iter(cl_rows), k=10))
    assert got == exp and got
    # pre-collected dict term stats (the collect path's contract)
    tstats = {
        r["term"]: int(r["df"])
        for r in postings.groupBy("term").agg(F.sum("df").alias("df")).collect()
    }
    assert (
        _rows(
            bool_search_index_cogroup(
                spark, postings, meta, cl_rows, k=10, term_stats=tstats
            )
        )
        == exp
    )


def test_cogroup_guards_raise_in_plan(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    postings, meta = build_postings(docs, segment_size=4)
    with pytest.raises(Exception, match="pure negation"):
        bool_search_index_cogroup(
            spark, postings, meta, [(1, "must_not", "quick")], k=10
        ).collect()
    with pytest.raises(Exception, match="unknown bool occur"):
        bool_search_index_cogroup(
            spark, postings, meta, [(1, "mustnot", "quick")], k=10
        ).collect()
    many = [(1, "should", "quick")] * (MAX_CLAUSES + 1)
    with pytest.raises(Exception, match="MAX_CLAUSES"):
        bool_search_index_cogroup(spark, postings, meta, many, k=10).collect()


def test_explicit_minimum_should_match(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    cls = [
        (1, "should", "quick"),
        (1, "should", "fox"),
        (1, "should", "dog"),
    ]
    postings, meta = build_postings(docs, segment_size=4)
    for msm in (1, 2, 3, 4):
        exp = brute_force(DOCS, cls, k=10, msm=msm)
        cl = _cl_df(spark, cls)
        assert _rows(bool_search(docs, cl, k=10, minimum_should_match=msm)) == exp
        assert (
            _rows(
                bool_search_index(
                    spark, postings, meta, cl, k=10, minimum_should_match=msm
                )
            )
            == exp
        )
    # msm=4 > clause count matches nothing
    assert brute_force(DOCS, cls, k=10, msm=4) == []


def test_msm_defaults_differ_with_and_without_required_clauses(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    # should-only: default msm=1 -> only wolf/singleton docs
    only_should = [(1, "should", "wolf"), (1, "should", "singleton")]
    got = _rows(bool_search(docs, _cl_df(spark, only_should), k=10))
    assert {d for _, d, _, _ in got} == {5, 7}
    # + filter: default msm=0 -> every doc passing the filter qualifies
    with_filter = only_should + [(1, "filter", "quick")]
    got2 = _rows(bool_search(docs, _cl_df(spark, with_filter), k=10))
    docs_2 = {d for _, d, _, _ in got2}
    assert 9 in docs_2  # 'quick dog' matches no should clause but passes
    assert 5 in docs_2 and 7 not in docs_2  # singleton fails the filter


def test_iterable_clause_input_index_path(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    postings, meta = build_postings(docs, segment_size=4)
    cl_rows = [(100, "must", "quick brown"), (100, "should", "fox")]
    got = _rows(bool_search_index(spark, postings, meta, iter(cl_rows), k=10))
    assert got == _rows(bool_search(docs, _cl_df(spark, cl_rows), k=10))
    assert got  # non-empty


def test_pure_negation_refused(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    postings, meta = build_postings(docs, segment_size=4)
    neg = [(1, "must_not", "quick")]
    with pytest.raises(ValueError, match="pure negation"):
        bool_search_index(spark, postings, meta, neg, k=10)
    with pytest.raises(Exception, match="pure negation"):
        bool_search(docs, _cl_df(spark, neg), k=10).collect()


def test_unknown_occur_refused(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    postings, meta = build_postings(docs, segment_size=4)
    bad = [(1, "mustnot", "quick")]
    with pytest.raises(ValueError, match="unknown bool occur"):
        bool_search_index(spark, postings, meta, bad, k=10)
    with pytest.raises(Exception, match="unknown bool occur"):
        bool_search(docs, _cl_df(spark, bad), k=10).collect()


def test_clause_count_guard(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    postings, meta = build_postings(docs, segment_size=4)
    many = [(1, "should", "quick")] * (MAX_CLAUSES + 1)
    with pytest.raises(ValueError, match="at most"):
        bool_search_index(spark, postings, meta, many, k=10)


def test_duplicate_should_clauses_count_twice(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    # msm=2 satisfied by ONE term matching two duplicate clauses
    cls = [(1, "should", "fox"), (1, "should", "fox"), (1, "should", "wolf")]
    got = _rows(bool_search(docs, _cl_df(spark, cls), k=10, minimum_should_match=2))
    assert {d for _, d, _, _ in got} == {0, 1, 3, 4}  # fox docs, not wolf-only
    postings, meta = build_postings(docs, segment_size=4)
    assert (
        _rows(
            bool_search_index(
                spark, postings, meta, _cl_df(spark, cls), k=10,
                minimum_should_match=2,
            )
        )
        == got
    )


# ---- registry gate twins --------------------------------------------------


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


def test_bool_gate_oracle_equality(spark):
    import __spark_entry__ as em

    sf = "/root/testdata/sf0.001"
    key = "bm25_bool_index_top10"
    _cmp(em.queries()[key](spark, sf), em.oracle_sql()[key], _duck(sf))


def test_bm25_phrase_duckdb_equality(spark):
    """bm25_phrase_top10 ceded its driver-window slot to
    bm25_bool_index_top10 (round 5); the exact registry query vs the
    exact registry SQL equality lives here (its index sibling
    bm25_phrase_index_top10 keeps the phrase evidence gated)."""
    import __spark_entry__ as em

    sf = "/root/testdata/sf0.001"
    _cmp(em.queries()["bm25_phrase_top10"](spark, sf), em._PHRASE_SQL, _duck(sf))
