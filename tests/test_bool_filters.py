"""Structured filter-context clauses on the ES ``bool`` query
(term / range / exists over doc values — the Lucene doc-values role):
from-scratch Python brute force, exhaustive == index-path identity
(both codecs, shuffled multi-partition corpus so the doc-values
segment alignment is stressed), filter-only queries, the op/occur
guards, and the docvalues/postings segment-agreement proof."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from sgpt_spark.operators.boolquery import (
    bool_search,
    bool_search_index,
)
from sgpt_spark.operators.indexer import (
    build_postings,
    build_postings_with_docvalues,
    read_docvalues,
    write_docvalues,
)

pytestmark = pytest.mark.usefixtures("spark")

K1, B = 1.2, 0.75

# (doc_id, text, lang, source, n_chars) — n_chars deliberately NOT
# len(text) for a few rows (doc values are independent columns), one
# NULL lang (exists / term never match), one NULL text (not indexed).
DOCS = [
    (0, "the quick brown fox jumps over the lazy dog", "en", "src0", 44),
    (1, "quick brown fox and quick brown foxtrot again", "en", "src1", 46),
    (2, "a a a ab", "es", "src0", 8),
    (3, "brown quick fox", "es", "src2", 15),
    (4, "the fox is quick and brown", None, "src1", 26),
    (5, "quick brown wolf", "fr", "src0", 16),
    (6, "foam fog foil fond font", "en", "src2", 23),
    (7, "singleton", "es", "src1", 9),
    (8, "lazy dog lazy dog lazy", "en", "src0", 99),
    (9, "quick dog", "fr", "src2", 9),
    (10, None, "en", "src0", 0),
]
SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"

CLAUSES = [
    (200, "must", "quick"),
    (201, "should", "brown"),
    (201, "should", "dog"),
    (202, "must", "quick brown"),
    (203, "should", "lazy"),
    # 204/205 are filter-only (no text clause)
    (206, "must", "unicorn"),  # corpus-absent must + structured filter
]
FILTERS = [
    (200, "filter", "lang", "term", "en"),
    (201, "filter", "n_chars", "gte", "15"),
    (201, "must_not", "source", "term", "src2"),
    (202, "filter", "lang", "exists", ""),
    (203, "filter", "n_chars", "lt", "50"),
    (203, "filter", "n_chars", "gt", "8"),
    (204, "filter", "lang", "term", "es"),
    (205, "filter", "n_chars", "lte", "16"),
    (205, "must_not", "lang", "term", "fr"),
    (206, "filter", "lang", "term", "en"),
]


def brute_force(docs, clauses, filters, k=10):
    """Independent reimplementation over raw rows: text-clause BM25 sum
    + structured predicate gating (structured clauses never score, docs
    matching only structured positives are candidates at score 0)."""
    fields = {"lang": 2, "source": 3, "n_chars": 4}
    rows = {d[0]: d for d in docs if d[1] is not None and d[1].strip()}
    toks = {i: r[1].split() for i, r in rows.items()}
    n = len(toks)
    avgdl = sum(len(t) for t in toks.values()) / n
    df: dict[str, int] = {}
    for t in toks.values():
        for term in set(t):
            df[term] = df.get(term, 0) + 1

    def idf(term):
        return math.log(1 + (n - df[term] + 0.5) / (df[term] + 0.5))

    def pred(doc, field, op, value):
        v = rows[doc][fields[field]]
        if v is None:
            return False
        if op == "term":
            return str(v) == value
        if op == "exists":
            return True
        x, y = float(v), float(value)
        return {"gte": x >= y, "gt": x > y, "lte": x <= y, "lt": x < y}[op]

    by_qid: dict = {}
    for qid, occur, text in clauses:
        by_qid.setdefault(qid, ([], []))[0].append((occur, text.split()))
    for qid, occur, field, op, value in filters:
        by_qid.setdefault(qid, ([], []))[1].append((occur, field, op, value))

    out = []
    for qid, (cls, fcls) in by_qid.items():
        n_should = sum(1 for o, _ in cls if o == "should")
        has_req = any(o in ("must", "filter") for o, _ in cls) or any(
            o == "filter" for o, *_ in fcls
        )
        req = 0 if (n_should == 0 or has_req) else 1
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
            for occur, field, op, value in fcls:
                m = pred(d, field, op, value)
                if m:
                    matched_any = True
                if occur == "filter" and not m:
                    ok = False
                if occur == "must_not" and m:
                    ok = False
            if ok and matched_any and (n_should == 0 or m_should >= req):
                hits.append((d, round(score, 6)))
        hits.sort(key=lambda x: (-x[1], x[0]))
        for rank, (d, s) in enumerate(hits[:k], 1):
            out.append((qid, d, s, rank))
    return sorted(out)


def _rows(df):
    return sorted(
        (r["qid"], r["doc_id"], round(r["score"], 6), r["rank"]) for r in df.collect()
    )


def _dfs(spark):
    docs = spark.createDataFrame(DOCS, SCHEMA)
    cl = spark.createDataFrame(CLAUSES, "qid long, occur string, query string")
    fl = spark.createDataFrame(
        FILTERS, "qid long, occur string, field string, op string, value string"
    )
    return docs, cl, fl


def test_exhaustive_matches_brute_force(spark):
    docs, cl, fl = _dfs(spark)
    got = _rows(bool_search(docs, cl, k=10, filters=fl))
    want = brute_force(DOCS, CLAUSES, FILTERS, k=10)
    assert got == want and got
    # filter-only qids actually returned rows
    assert any(q == 204 for q, *_ in got)
    assert any(q == 205 for q, *_ in got)
    # corpus-absent must (206) matches nothing despite its filter
    assert not any(q == 206 for q, *_ in got)


@pytest.mark.parametrize("codec", ["varint", "pfor"])
def test_index_matches_exhaustive(spark, codec):
    """Index path over a SHUFFLED corpus (repartition(5) stresses the
    docvalues/postings segment alignment) == the exhaustive path, on the
    full adversarial fixture, both codecs."""
    docs, cl, fl = _dfs(spark)
    shuffled = docs.repartition(5)
    postings, dv, meta = build_postings_with_docvalues(
        shuffled, ["lang", "source", "n_chars"], segment_size=3, codec=codec
    )
    want = _rows(bool_search(docs, cl, k=10, filters=fl))
    got = _rows(
        bool_search_index(
            spark, postings, meta, CLAUSES, k=10, filters=FILTERS, docvalues=dv
        )
    )
    assert got == want and got


def test_docvalues_segments_agree_with_postings(spark):
    """The proof behind the staging contract: every doc's docvalues
    segment equals the segment its postings landed in."""
    from sgpt_spark.operators.index_search import _decode_terms

    docs, _, _ = _dfs(spark)
    postings, dv, meta = build_postings_with_docvalues(
        docs.repartition(4), ["lang"], segment_size=3
    )
    post_seg: dict[int, int] = {}
    pdf = postings.filter(F.col("term").isNotNull()).toPandas()
    for seg in pdf["segment"].unique():
        sdf = pdf[pdf["segment"] == seg]
        decoded = _decode_terms(
            sdf["term"], sdf["blocks"], meta.codec, meta.k1, meta.b, meta.avgdl
        )
        for d_arr, _ in decoded.values():
            for d in d_arr:
                prev = post_seg.setdefault(int(d), int(seg))
                assert prev == int(seg), "doc in two segments?!"
    dv_seg = {int(r["doc_id"]): int(r["segment"]) for r in dv.collect()}
    assert post_seg  # sanity: decoded something
    for d, seg in post_seg.items():
        assert dv_seg[d] == seg
    # docvalues cover exactly the indexed (non-empty-text) docs
    assert set(dv_seg) == {d for d, t, *_ in DOCS if t is not None and t.strip()}


def test_docvalues_roundtrip_and_iterable_filters(spark, tmp_path):
    docs, cl, fl = _dfs(spark)
    postings, dv, meta = build_postings_with_docvalues(
        docs, ["lang", "source", "n_chars"], segment_size=4
    )
    write_docvalues(dv, str(tmp_path / "ix"))
    dv2 = read_docvalues(spark, str(tmp_path / "ix"))
    want = _rows(bool_search(docs, cl, k=10, filters=fl))
    # DataFrame clause + filter inputs, re-read docvalues
    got = _rows(
        bool_search_index(spark, postings, meta, cl, k=10, filters=fl, docvalues=dv2)
    )
    assert got == want and got


def test_term_stats_dict_contract(spark):
    docs, cl, fl = _dfs(spark)
    postings, dv, meta = build_postings_with_docvalues(
        docs, ["lang", "source", "n_chars"], segment_size=4
    )
    tstats = {
        r["term"]: int(r["df"])
        for r in postings.groupBy("term").agg(F.sum("df").alias("df")).collect()
    }
    want = _rows(
        bool_search_index(
            spark, postings, meta, CLAUSES, k=10, filters=FILTERS, docvalues=dv
        )
    )
    got = _rows(
        bool_search_index(
            spark,
            postings,
            meta,
            CLAUSES,
            k=10,
            filters=FILTERS,
            docvalues=dv,
            term_stats=tstats,
        )
    )
    assert got == want and got


def test_guards(spark):
    docs, cl, fl = _dfs(spark)
    postings, dv, meta = build_postings_with_docvalues(
        docs, ["lang", "source", "n_chars"], segment_size=4
    )
    # filters without docvalues
    with pytest.raises(ValueError, match="docvalues"):
        bool_search_index(spark, postings, meta, CLAUSES, filters=FILTERS)
    # scoring occur on a structured clause is refused
    with pytest.raises(ValueError, match="filter-context only"):
        bool_search_index(
            spark,
            postings,
            meta,
            CLAUSES,
            filters=[(200, "must", "lang", "term", "en")],
            docvalues=dv,
        )
    # unknown op
    with pytest.raises(ValueError, match="unknown structured-filter op"):
        bool_search_index(
            spark,
            postings,
            meta,
            CLAUSES,
            filters=[(200, "filter", "lang", "eq", "en")],
            docvalues=dv,
        )
    # unknown field (driver-side, against the docvalues schema)
    with pytest.raises(ValueError, match="not in docvalues columns"):
        bool_search_index(
            spark,
            postings,
            meta,
            CLAUSES,
            filters=[(200, "filter", "nope", "term", "x")],
            docvalues=dv,
        )
    # exhaustive path raises in-plan on scoring occur / unknown op / field
    with pytest.raises(Exception, match="filter|must_not"):
        bool_search(
            docs,
            cl,
            filters=spark.createDataFrame(
                [(200, "should", "lang", "term", "en")],
                "qid long, occur string, field string, op string, value string",
            ),
        ).collect()
    with pytest.raises(Exception, match="unknown structured-filter op"):
        bool_search(
            docs,
            cl,
            filters=spark.createDataFrame(
                [(200, "filter", "lang", "eq", "en")],
                "qid long, occur string, field string, op string, value string",
            ),
        ).collect()
    with pytest.raises(Exception, match="unknown structured-filter field"):
        bool_search(
            docs,
            cl,
            filters=spark.createDataFrame(
                [(200, "filter", "nope", "term", "x")],
                "qid long, occur string, field string, op string, value string",
            ),
        ).collect()
    # pure negation: structured must_not only
    with pytest.raises(ValueError, match="pure negation"):
        bool_search_index(
            spark,
            postings,
            meta,
            [],
            filters=[(1, "must_not", "lang", "term", "en")],
            docvalues=dv,
        )
    # docvalue builder guards
    with pytest.raises(ValueError, match="not in corpus columns"):
        build_postings_with_docvalues(docs, ["nope"])
    with pytest.raises(ValueError, match="pass >= 1 field"):
        build_postings_with_docvalues(docs, [])


def test_filters_do_not_change_unfiltered_results(spark):
    """A structured filter matching every indexed doc (n_chars gte 0) is
    a no-op UNDER AN EXPLICIT minimum_should_match (regression net for
    the candidate-union change). Note the msm pin is load-bearing: with
    the ES default, adding ANY filter clause flips a should-only query's
    msm from 1 to 0 — the match-all filter then admits every doc at
    score 0, which is correct ES semantics, not a no-op."""
    docs, cl, _ = _dfs(spark)
    postings, dv, meta = build_postings_with_docvalues(
        docs, ["n_chars"], segment_size=3
    )
    plain_cl = [(q, o, t) for q, o, t in CLAUSES if q in (200, 201, 202)]
    want = _rows(
        bool_search_index(
            spark, postings, meta, plain_cl, k=10, minimum_should_match=1
        )
    )
    noop = [(q, "filter", "n_chars", "gte", "0") for q in (200, 201, 202)]
    got = _rows(
        bool_search_index(
            spark,
            postings,
            meta,
            plain_cl,
            k=10,
            filters=noop,
            docvalues=dv,
            minimum_should_match=1,
        )
    )
    assert got == want and got


def test_sparse_docid_space_with_filters(spark):
    """Far-apart doc ids force the kernel's sparse fallback; structured
    bits must ride it identically (exhaustive == index)."""
    wide = [(d * 10_000_000_000 + 7, t, la, s, nc) for d, t, la, s, nc in DOCS]
    docs = spark.createDataFrame(wide, SCHEMA)
    clauses = [(int(q), o, t) for q, o, t in CLAUSES]
    filters = [(int(q), o, f, op, v) for q, o, f, op, v in FILTERS]
    cl = spark.createDataFrame(clauses, "qid long, occur string, query string")
    fl = spark.createDataFrame(
        filters, "qid long, occur string, field string, op string, value string"
    )
    postings, dv, meta = build_postings_with_docvalues(
        docs, ["lang", "source", "n_chars"], segment_size=100
    )
    want = _rows(bool_search(docs, cl, k=10, filters=fl))
    got = _rows(
        bool_search_index(
            spark, postings, meta, clauses, k=10, filters=filters, docvalues=dv
        )
    )
    assert got == want and got


@pytest.mark.parametrize("codec", ["varint", "pfor"])
def test_cogroup_matches_exhaustive_with_filters(spark, codec):
    """The in-plan twin with structured filters (clauses AND filters
    never touch the driver) over the full adversarial fixture — both
    codecs, repartitioned corpus."""
    from sgpt_spark.operators.boolquery import bool_search_index_cogroup

    docs, cl, fl = _dfs(spark)
    postings, dv, meta = build_postings_with_docvalues(
        docs.repartition(5), ["lang", "source", "n_chars"], segment_size=3,
        codec=codec,
    )
    want = _rows(bool_search(docs, cl, k=10, filters=fl))
    got = _rows(
        bool_search_index_cogroup(
            spark, postings, meta, cl, k=10, filters=fl, docvalues=dv
        )
    )
    assert got == want and got


def test_cogroup_filter_only_and_guards(spark):
    from sgpt_spark.operators.boolquery import bool_search_index_cogroup

    docs, _, _ = _dfs(spark)
    postings, dv, meta = build_postings_with_docvalues(
        docs, ["lang"], segment_size=4
    )
    # filter-only batch (iterable input, qid schema follows the filters)
    want = _rows(
        bool_search_index(
            spark, postings, meta, [], k=10,
            filters=[(9, "filter", "lang", "term", "es")], docvalues=dv,
        )
    )
    got = _rows(
        bool_search_index_cogroup(
            spark, postings, meta, [], k=10,
            filters=[(9, "filter", "lang", "term", "es")], docvalues=dv,
        )
    )
    assert got == want and got
    with pytest.raises(ValueError, match="docvalues"):
        bool_search_index_cogroup(
            spark, postings, meta, [], filters=[(1, "filter", "lang", "term", "x")]
        )
    # in-plan guards: scoring occur / unknown op raise at evaluation
    with pytest.raises(Exception, match="filter|must_not"):
        bool_search_index_cogroup(
            spark, postings, meta, [], k=10,
            filters=[(1, "should", "lang", "term", "x")], docvalues=dv,
        ).collect()
    with pytest.raises(Exception, match="unknown structured-filter op"):
        bool_search_index_cogroup(
            spark, postings, meta, [], k=10,
            filters=[(1, "filter", "lang", "eq", "x")], docvalues=dv,
        ).collect()
    with pytest.raises(Exception, match="unknown structured-filter field"):
        bool_search_index_cogroup(
            spark, postings, meta, [], k=10,
            filters=[(1, "filter", "nope", "term", "x")], docvalues=dv,
        ).collect()


def _duck(sf):
    import duckdb

    con = duckdb.connect()
    for t in ("documents", "customer", "orders"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    return con


def test_bool_filtered_gate_duckdb_equality(spark):
    """The gate row bm25_bool_filtered_top10: exact registry query vs
    exact registry SQL at sf0.001 (the driver repeats this at sf0.01)."""
    import __spark_entry__ as entry

    sf = "/root/testdata/sf0.001"
    got = sorted(
        (r["qid"], r["doc_id"], round(r["score"], 6), r["rank"])
        for r in entry._q_bm25_bool_filtered(spark, sf).collect()
    )
    want = sorted(
        (q, d, round(s, 6), int(r))
        for q, d, s, r in _duck(sf).execute(entry._BOOL_FILTERED_SQL).fetchall()
    )
    assert got == want and len(got) > 0


def test_customers_without_orders_duckdb_equality(spark):
    """customers_without_orders left the driver window for
    bm25_bool_filtered_top10 (round 5); its DuckDB value equality lives
    here, exact registry query vs exact registry SQL — at sf0.01, the
    scale the driver used to gate it (sf0.001 has zero order-less
    customers, which would vacuously pass)."""
    import __spark_entry__ as entry

    sf = "/root/testdata/sf0.01"
    got = sorted(
        (r["c_custkey"], r["c_name"])
        for r in entry._q_cust_no_orders(spark, sf).collect()
    )
    want = sorted(
        (ck, cn) for ck, cn in _duck(sf).execute(entry._CUST_NO_ORDERS_SQL).fetchall()
    )
    assert got == want and len(got) > 0


def test_plain_bool_unchanged_by_refactor(spark):
    """The no-filters path still equals the exhaustive twin after the
    signature/kernel changes (belt over test_boolquery's braces)."""
    docs, cl, _ = _dfs(spark)
    postings, meta = build_postings(docs, segment_size=3)
    plain_cl = [(q, o, t) for q, o, t in CLAUSES if q != 206]
    assert _rows(bool_search_index(spark, postings, meta, plain_cl, k=10)) == _rows(
        bool_search(docs, spark.createDataFrame(
            plain_cl, "qid long, occur string, query string"), k=10)
    )
