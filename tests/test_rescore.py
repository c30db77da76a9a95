"""ES ``rescore`` (the query rescorer, operators/rescore.py): combine
math brute-forced across all five score_modes, the unmatched-doc
passthrough contract, guards, index == exhaustive identity over the
adversarial phrase fixture, gate equality vs DuckDB, and the
bm25_index_join_top10 displaced-row twin."""

from __future__ import annotations

import tempfile

import pytest

from sgpt_spark.operators.rescore import (
    SCORE_MODES,
    combine_rescore,
    rescore_index,
    rescore_search,
)
from tests.test_phrase import DOCS, QUERIES

pytestmark = pytest.mark.usefixtures("spark")

# (qid, doc_id, score) — first-pass windows with ties and a shared doc
WINDOW = [
    (0, 1, 5.0), (0, 2, 4.0), (0, 3, 4.0), (0, 4, 0.5),
    (1, 1, 2.0), (1, 5, 1.5),
]
# rescore hits: doc 3 outscores doc 2 in pass 2; doc 4 unmatched;
# doc 9 is NOT in any window (the rescorer must never ADD hits);
# qid 1's hits flip its order under 'total'
HITS = [
    (0, 2, 1.0), (0, 3, 3.0), (0, 1, 0.25),
    (0, 9, 99.0),
    (1, 5, 4.0),
]


def _brute(k, qw, rw, mode):
    hits = {(q, d): round(s, 6) for q, d, s in HITS}
    by_q = {}
    for q, d, s in WINDOW:
        prim = qw * round(s, 6)
        r = hits.get((q, d))
        if r is None:
            comb = prim
        else:
            sec = rw * r
            comb = {
                "total": prim + sec,
                "multiply": prim * sec,
                "avg": (prim + sec) / 2.0,
                "max": max(prim, sec),
                "min": min(prim, sec),
            }[mode]
        by_q.setdefault(q, []).append((round(comb, 6), d))
    out = []
    for q, rows in by_q.items():
        rows.sort(key=lambda r: (-r[0], r[1]))
        for rk, (s, d) in enumerate(rows[:k], 1):
            out.append((q, d, s, rk))
    return sorted(out)


@pytest.mark.parametrize("mode", SCORE_MODES)
@pytest.mark.parametrize("qw,rw", [(1.0, 1.0), (0.7, 2.5)])
def test_combine_brute_force(spark, mode, qw, rw):
    w = spark.createDataFrame(WINDOW, "qid long, doc_id long, score double")
    h = spark.createDataFrame(HITS, "qid long, doc_id long, score double")
    got = sorted(
        (r["qid"], r["doc_id"], round(r["score"], 6), r["rank"])
        for r in combine_rescore(
            w, h, k=3, window_size=4, query_weight=qw,
            rescore_query_weight=rw, score_mode=mode,
        ).collect()
    )
    assert got == _brute(3, qw, rw, mode) and got


def test_unmatched_keeps_first_pass(spark):
    """A window doc the rescore query misses keeps query_weight * first
    untouched under EVERY mode — multiply must not zero it out (the ES
    contract), and a rescore hit outside the window must never appear."""
    w = spark.createDataFrame([(0, 4, 0.5)], "qid long, doc_id long, score double")
    h = spark.createDataFrame([(0, 9, 99.0)], "qid long, doc_id long, score double")
    for mode in SCORE_MODES:
        rows = combine_rescore(w, h, k=1, score_mode=mode).collect()
        assert [(r["qid"], r["doc_id"], r["score"]) for r in rows] == [(0, 4, 0.5)]


def test_guards(spark):
    w = spark.createDataFrame(WINDOW, "qid long, doc_id long, score double")
    h = spark.createDataFrame(HITS, "qid long, doc_id long, score double")
    with pytest.raises(ValueError, match="score_mode"):
        combine_rescore(w, h, score_mode="sum")
    with pytest.raises(ValueError, match="window_size"):
        combine_rescore(w, h, k=20, window_size=10)


def _rows(df):
    return sorted(
        (r["qid"], r["doc_id"], round(r["score"], 6), r["rank"]) for r in df.collect()
    )


@pytest.mark.parametrize("mode", SCORE_MODES)
def test_index_equals_exhaustive(spark, mode):
    """rescore_index (block postings pass 1 + positional-sidecar phrase
    pass 2) == rescore_search (exhaustive twin) for every score_mode
    over the adversarial phrase fixture (overlaps, duplicate phrase
    terms, absent terms, wrong-order docs)."""
    from sgpt_spark.operators.positions import build_positional_index

    docs = spark.createDataFrame(DOCS, "doc_id long, text string").repartition(
        3, "doc_id"
    )
    queries = spark.createDataFrame(QUERIES, "qid long, query string")
    path = tempfile.mkdtemp(prefix="rescore_idx_")
    build_positional_index(docs, path, segment_size=3)
    got = _rows(
        rescore_index(
            spark, path, queries, k=3, window_size=5, score_mode=mode,
            rescore_query_weight=1.5,
        )
    )
    want = _rows(
        rescore_search(
            docs, queries, k=3, window_size=5, score_mode=mode,
            rescore_query_weight=1.5,
        )
    )
    assert got == want and got


def _duck(sf):
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    return con


def test_rescore_gate_duckdb_equality(spark):
    """Gate row bm25_rescore_top10: exact registry query vs exact
    registry SQL at sf0.001 (the driver repeats this at sf0.01)."""
    import __spark_entry__ as entry

    sf = "/root/testdata/sf0.001"
    got = _rows(entry._q_bm25_rescore(spark, sf))
    want = sorted(
        (q, int(d), round(s, 6), int(rk))
        for q, d, s, rk in _duck(sf).execute(entry._RESCORE_SQL).fetchall()
    )
    assert got == want and len(got) > 0
    # the rescore genuinely re-orders: the combined page differs from
    # the plain match page (the derived queries are phrase-shaped)
    plain = sorted(
        (q, int(d)) for q, d, s, rk in _duck(sf).execute(entry._BM25_SQL).fetchall()
    )
    assert sorted((q, d) for q, d, s, rk in want) != plain


def test_index_join_displaced_duckdb_equality(spark):
    """bm25_index_join_top10 left the driver window for
    bm25_rescore_top10 (round 5 — the in-plan single-field evidence
    stays gated via bm25_index_cogroup_top10, the join strategy via
    bm25_multifield_join_top10); exact registry query vs exact registry
    SQL at sf0.001."""
    import __spark_entry__ as entry

    sf = "/root/testdata/sf0.001"
    got = _rows(entry._q_bm25_index_join_top10(spark, sf))
    want = sorted(
        (q, int(d), round(s, 6), int(rk))
        for q, d, s, rk in _duck(sf).execute(entry._BM25_SQL).fetchall()
    )
    assert got == want and len(got) > 0
