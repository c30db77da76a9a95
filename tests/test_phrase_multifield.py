"""Multifield phrase search (ES multi_match type=phrase, best_fields):
brute-force Python oracle over an adversarial title/text fixture,
per-field stats isolation, tie_breaker and caret-boost semantics, the
index-backed twin's value identity (per-field positional sidecars,
co-segmented), and the match-query compatibility of the positional
multifield layout. Also carries the DuckDB equality evidence for
bm25_top100 and user_running_value, whose driver-window slots the two
multifield phrase gates took (registry round-5 swap)."""

from __future__ import annotations

import tempfile

import pytest

from sgpt_spark.operators.phrase import phrase_freq_py, phrase_score_py
from sgpt_spark.operators.phrase_multifield import (
    build_multifield_positional_index,
    multifield_phrase_search,
    phrase_search_multifield_index,
)

# title/text fixture: phrase in title only (0), text only (1), both (2),
# wrong order in title (3), overlapping repeats in the short field (4),
# doc with empty title (5)
MF_DOCS = [
    (0, "quick brown fox", "the dog sleeps by the river all day"),
    (1, "unrelated headline", "a quick brown fox jumps the fence"),
    (2, "quick brown fox news", "the quick brown fox returns again"),
    (3, "fox brown quick", "nothing to see here"),
    (4, "a a a", "b b b b"),
    (5, "", "quick brown fox quick brown fox"),
]

MF_QUERIES = [
    (100, "quick brown fox"),
    (101, "a a"),
    (102, "b b"),
    (103, "absent phrase"),
]


def brute_force_mf(docs, queries, fields=(1, 2), k=10, tie_breaker=0.0,
                   boosts=(1.0, 1.0), k1=1.2, b=0.75):
    """fields: tuple of column indexes into the docs tuples."""
    per_field = []
    for col in fields:
        toks = {d[0]: [x for x in d[col].split(" ") if x] for d in docs}
        toks = {i: t for i, t in toks.items() if t}
        n = len(toks)
        avgdl = sum(len(t) for t in toks.values()) / n
        df: dict[str, int] = {}
        for t in toks.values():
            for term in set(t):
                df[term] = df.get(term, 0) + 1
        per_field.append((toks, n, avgdl, df))
    out = []
    for qid, q in queries:
        qt = [x for x in q.split(" ") if x]
        scores: dict[int, list[float]] = {}
        for fi, (toks, n, avgdl, df) in enumerate(per_field):
            if not qt or any(t not in df for t in qt):
                continue
            for d, dt in toks.items():
                pf = phrase_freq_py(dt, qt)
                if pf:
                    sc = boosts[fi] * phrase_score_py(
                        pf, len(dt), qt, df, n, avgdl, k1, b
                    )
                    scores.setdefault(d, [0.0] * len(per_field))[fi] = sc
        hits = []
        for d, ss in scores.items():
            mx = max(ss)
            hits.append((d, round(mx + tie_breaker * (sum(ss) - mx), 6)))
        hits.sort(key=lambda x: (-x[1], x[0]))
        for r, (d, sc) in enumerate(hits[:k], start=1):
            out.append((qid, d, sc, r))
    return sorted(out)


def rows(df):
    return sorted(
        (r["qid"], r["doc_id"], round(r["score"], 6), r["rank"]) for r in df.collect()
    )


def _mf_docs(spark):
    return spark.createDataFrame(
        MF_DOCS, "doc_id long, title string, text string"
    )


def _mf_queries(spark):
    return spark.createDataFrame(MF_QUERIES, "qid long, query string")


@pytest.mark.parametrize("tie_breaker", [0.0, 0.5, 1.0])
def test_multifield_phrase_matches_brute_force(spark, tie_breaker):
    got = rows(multifield_phrase_search(
        _mf_docs(spark), _mf_queries(spark), fields=("title", "text"),
        k=10, tie_breaker=tie_breaker,
    ))
    want = brute_force_mf(MF_DOCS, MF_QUERIES, tie_breaker=tie_breaker)
    assert got == want and len(got) > 0
    by_q = {}
    for qid, d, sc, r in got:
        by_q.setdefault(qid, set()).add(d)
    # semantic corners: both-fields doc present; wrong-order title absent
    assert {0, 1, 2, 5} == by_q[100]
    assert 3 not in by_q[100]
    assert by_q[101] == {4} and by_q[102] == {4}
    assert 103 not in by_q


def test_multifield_phrase_boosts(spark):
    """title^5 must be able to flip the ranking toward title-only hits;
    identity with the brute-force twin pins the exact values."""
    got = rows(multifield_phrase_search(
        _mf_docs(spark), _mf_queries(spark), fields=("title^5", "text"),
        k=10, tie_breaker=0.3,
    ))
    want = brute_force_mf(
        MF_DOCS, MF_QUERIES, tie_breaker=0.3, boosts=(5.0, 1.0)
    )
    assert got == want and len(got) > 0


def test_tie_breaker_orders_both_field_hits_higher(spark):
    """With tie_breaker > 0 a doc matching the phrase in BOTH fields
    must outrank an equal-best single-field hit if the second field adds
    anything."""
    res = {r["doc_id"]: r["score"] for r in multifield_phrase_search(
        _mf_docs(spark),
        _mf_queries(spark).filter("qid = 100"),
        k=10, tie_breaker=0.5,
    ).collect()}
    zero = {r["doc_id"]: r["score"] for r in multifield_phrase_search(
        _mf_docs(spark),
        _mf_queries(spark).filter("qid = 100"),
        k=10, tie_breaker=0.0,
    ).collect()}
    assert res[2] > zero[2]  # both-field doc gains from the tie_breaker
    assert res[0] == zero[0]  # title-only doc does not


# ---- index-backed twin --------------------------------------------------------


@pytest.mark.parametrize("codec", ["varint", "pfor"])
def test_multifield_phrase_index_matches_exhaustive(spark, codec):
    docs = _mf_docs(spark).repartition(3, "doc_id")
    path = tempfile.mkdtemp(prefix="mfpos_")
    metas = build_multifield_positional_index(
        docs, path, fields=("title", "text"), segment_size=2, codec=codec
    )
    assert all(m.positions for m in metas.values())
    for tb, fields in [(0.0, None), (0.5, None), (0.3, ("title^5", "text"))]:
        got = rows(phrase_search_multifield_index(
            spark, path, _mf_queries(spark), k=10, tie_breaker=tb, fields=fields,
        ))
        want = rows(multifield_phrase_search(
            _mf_docs(spark), _mf_queries(spark),
            fields=fields or ("title", "text"), k=10, tie_breaker=tb,
        ))
        assert got == want and len(got) > 0


def test_positional_multifield_layout_serves_match_queries(spark):
    """The positional multifield layout's DERIVED postings must serve
    the ordinary multi_match paths unchanged: search_multifield_index
    over it equals the same search over a plain build_multifield_index
    layout (co-segmentation + derivation consistency)."""
    from sgpt_spark.operators.index_search import search_multifield_index
    from sgpt_spark.operators.indexer import build_multifield_index

    docs = _mf_docs(spark)
    pos_path = tempfile.mkdtemp(prefix="mfpos_")
    plain_path = tempfile.mkdtemp(prefix="mfplain_")
    build_multifield_positional_index(docs, pos_path, segment_size=2)
    build_multifield_index(docs, plain_path, segment_size=2)
    qs = _mf_queries(spark)
    got = rows(search_multifield_index(spark, pos_path, qs, k=10, tie_breaker=0.5))
    want = rows(search_multifield_index(spark, plain_path, qs, k=10, tie_breaker=0.5))
    assert got == want and len(got) > 0


def test_unknown_field_refused(spark):
    path = tempfile.mkdtemp(prefix="mfpos_")
    build_multifield_positional_index(_mf_docs(spark), path, segment_size=2)
    with pytest.raises(ValueError, match="not in this index layout"):
        phrase_search_multifield_index(
            spark, path, _mf_queries(spark), fields=("body", "text")
        )


# ---- migrated gate evidence ---------------------------------------------------


def _duck(sf):
    import duckdb

    con = duckdb.connect()
    for t in ("documents", "events"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    return con


def test_bm25_top100_duckdb_equality(spark):
    """bm25_top100 left the driver window for bm25_multifield_phrase_top10
    (round 5); its DuckDB value equality lives here, exact registry query
    vs exact registry SQL at sf0.001."""
    import __spark_entry__ as entry

    sf = "/root/testdata/sf0.001"
    got = sorted(
        (r["qid"], r["doc_id"], round(r["score"], 6), r["rank"])
        for r in entry._q_bm25_top100(spark, sf).collect()
    )
    want = sorted(
        (q, d, round(s, 6), int(r))
        for q, d, s, r in _duck(sf).execute(entry._BM25_TOP100_SQL).fetchall()
    )
    assert got == want and len(got) > 0


def test_user_running_value_duckdb_equality(spark):
    """user_running_value left the driver window for
    bm25_multifield_phrase_index_top10 (round 5); DuckDB equality here."""
    import __spark_entry__ as entry

    sf = "/root/testdata/sf0.001"
    got = sorted(
        (r["user_id"], r["event_id"], r["event_rank"], round(r["running_value"], 6))
        for r in entry._q_running_value(spark, sf).collect()
    )
    want = sorted(
        (u, e, int(rk), round(rv, 6))
        for u, e, rk, rv in _duck(sf).execute(entry._RUNNING_VALUE_SQL).fetchall()
    )
    assert got == want and len(got) > 0


def test_multifield_phrase_exhaustive_duckdb_equality(spark):
    """bm25_multifield_phrase_top10 (exhaustive) left the driver window
    for bm25_bool_cogroup_top10 (round 5); its index-backed sibling
    bm25_multifield_phrase_index_top10 keeps the evidence gated, and the
    exact registry query vs exact registry SQL equality lives here."""
    import __spark_entry__ as entry

    sf = "/root/testdata/sf0.001"
    got = sorted(
        (r["qid"], r["doc_id"], round(r["score"], 6), r["rank"])
        for r in entry._q_bm25_multifield_phrase(spark, sf).collect()
    )
    want = sorted(
        (q, d, round(s, 6), int(r))
        for q, d, s, r in _duck(sf).execute(entry._MF_PHRASE_SQL).fetchall()
    )
    assert got == want and len(got) > 0


def test_multifield_phrase_cogroup_strategy_identity(spark):
    """strategy='cogroup' (queries never touch the driver, per-field
    in-plan phrase hits) must equal strategy='collect' and therefore the
    exhaustive path — incl. boosts and tie_breaker."""
    docs = _mf_docs(spark).repartition(3, "doc_id")
    path = tempfile.mkdtemp(prefix="mfposcg_")
    build_multifield_positional_index(docs, path, segment_size=2)
    for tb, fields in [(0.5, None), (0.3, ("title^5", "text"))]:
        got = rows(phrase_search_multifield_index(
            spark, path, _mf_queries(spark), k=10, tie_breaker=tb,
            fields=fields, strategy="cogroup",
        ))
        want = rows(phrase_search_multifield_index(
            spark, path, _mf_queries(spark), k=10, tie_breaker=tb, fields=fields,
        ))
        assert got == want and len(got) > 0
    with pytest.raises(ValueError, match="unknown strategy"):
        phrase_search_multifield_index(
            spark, path, _mf_queries(spark), strategy="taat"
        )
