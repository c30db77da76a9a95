"""ES sort-by-field (doc-values sort): brute force vs the operator,
missing-value placement, multi-level ordering, guards, gate equality
vs DuckDB, and the window_fingerprints displaced-row twin."""

from __future__ import annotations

import pytest

from sgpt_spark.operators.fieldsort import sort_search_index
from sgpt_spark.operators.indexer import build_postings_with_docvalues

pytestmark = pytest.mark.usefixtures("spark")

DOCS = [
    (0, "quick brown fox", "en", 150),
    (1, "quick dog", "en", 40),
    (2, "lazy dog sleeps", "es", 260),
    (3, "quick quick brown", "es", 155),
    (4, "a cat", "fr", 30),
    (5, "brown bear quick", None, 520),  # null lang exercises missing
    (6, "unrelated words only", "de", 99),
    (7, "quick brown dance", "en", 41),
]
SCHEMA = "doc_id long, text string, lang string, n_chars long"
QUERIES = [(100, "quick"), (101, "brown dog"), (102, "absentterm")]


def _brute_match():
    toks = {d[0]: d[1].split() for d in DOCS}
    out = set()
    for qid, q in QUERIES:
        for d, ts in toks.items():
            if any(t in ts for t in q.split()):
                out.add((qid, d))
    return out


def _brute_sort(by, k, missing="_last"):
    rows = {d[0]: d for d in DOCS}
    fld = {"lang": 2, "n_chars": 3}
    per_qid: dict = {}
    for qid, d in _brute_match():
        per_qid.setdefault(qid, []).append(d)
    out = []
    for qid, ds in per_qid.items():
        def key(d):
            ks = []
            for f, order in by:
                v = rows[d][fld[f]]
                null_rank = 1 if missing == "_last" else -1
                if v is None:
                    ks.append((null_rank, 0))
                else:
                    ks.append((0, v if order == "asc" else _neg(v)))
            ks.append(d)
            return tuple(ks)
        ds.sort(key=key)
        for rk, d in enumerate(ds[:k], 1):
            out.append((qid, d, rk))
    return sorted(out)


def _neg(v):
    if isinstance(v, str):
        # descending strings: invert char ordinals (ASCII fixture)
        return tuple(-ord(c) for c in v)
    return -v


def _build(spark):
    docs = spark.createDataFrame(DOCS, SCHEMA)
    postings, dv, meta = build_postings_with_docvalues(
        docs.repartition(3), ["lang", "n_chars"], segment_size=3
    )
    qs = spark.createDataFrame(QUERIES, "qid long, query string")
    return postings, dv, meta, qs


def test_single_field_desc_brute_force(spark):
    postings, dv, meta, qs = _build(spark)
    got = sorted(
        (r["qid"], r["doc_id"], r["rank"])
        for r in sort_search_index(
            spark, postings, meta, qs, dv, [("n_chars", "desc")], k=3
        ).collect()
    )
    assert got == _brute_sort([("n_chars", "desc")], 3) and got


def test_multi_level_sort_with_missing_last(spark):
    postings, dv, meta, qs = _build(spark)
    res = sort_search_index(
        spark, postings, meta, qs, dv,
        [("lang", "asc"), ("n_chars", "desc")], k=8,
    )
    got = sorted((r["qid"], r["doc_id"], r["rank"]) for r in res.collect())
    assert got == _brute_sort([("lang", "asc"), ("n_chars", "desc")], 8)
    # doc 5 (null lang) matched 'quick' and 'brown' queries -> ranked LAST
    by_qid: dict = {}
    for q, d, rk in got:
        by_qid.setdefault(q, []).append((rk, d))
    for q, pairs in by_qid.items():
        if any(d == 5 for _, d in pairs):
            assert max(pairs)[1] == 5, f"null-lang doc not last for {q}"


def test_missing_first(spark):
    postings, dv, meta, qs = _build(spark)
    res = sort_search_index(
        spark, postings, meta, qs, dv, [("lang", "asc")], k=8,
        missing="_first",
    ).collect()
    firsts = {r["qid"]: r["doc_id"] for r in res if r["rank"] == 1}
    # doc 5 (null lang) matches both real queries -> rank 1 under _first
    assert firsts[100] == 5 and firsts[101] == 5


def test_sort_value_columns_carried(spark):
    postings, dv, meta, qs = _build(spark)
    res = sort_search_index(
        spark, postings, meta, qs, dv, [("n_chars", "asc")], k=2
    )
    assert res.columns == ["qid", "doc_id", "n_chars", "rank"]
    rows = {d[0]: d for d in DOCS}
    for r in res.collect():
        assert r["n_chars"] == rows[r["doc_id"]][3]


def test_guards(spark):
    postings, dv, meta, qs = _build(spark)
    with pytest.raises(ValueError, match="at least one sort field"):
        sort_search_index(spark, postings, meta, qs, dv, [])
    with pytest.raises(ValueError, match="asc|desc"):
        sort_search_index(spark, postings, meta, qs, dv, [("lang", "up")])
    with pytest.raises(ValueError, match="not in docvalues columns"):
        sort_search_index(spark, postings, meta, qs, dv, [("nope", "asc")])
    with pytest.raises(ValueError, match="duplicate sort fields"):
        sort_search_index(
            spark, postings, meta, qs, dv,
            [("lang", "asc"), ("lang", "desc")],
        )
    with pytest.raises(ValueError, match="_last.*_first|missing"):
        sort_search_index(
            spark, postings, meta, qs, dv, [("lang", "asc")],
            missing="nope",
        )


def _duck(sf):
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    return con


def test_sort_gate_duckdb_equality(spark):
    """Gate row sort_by_field_top10: exact registry query vs exact
    registry SQL at sf0.001 (the driver repeats this at sf0.01)."""
    import __spark_entry__ as entry

    sf = "/root/testdata/sf0.001"
    got = sorted(
        (r["qid"], r["doc_id"], r["lang"], r["n_chars"], r["rank"])
        for r in entry._q_sort_by_field(spark, sf).collect()
    )
    want = sorted(
        (q, int(d), lg, int(nc), int(rk))
        for q, d, lg, nc, rk in _duck(sf)
        .execute(entry._SORT_BY_FIELD_SQL)
        .fetchall()
    )
    assert got == want and len(got) > 0


def test_window_fingerprints_duckdb_equality(spark):
    """window_fingerprints left the driver window for sort_by_field_top10
    (round 5); exact registry query vs exact registry SQL at sf0.001."""
    import __spark_entry__ as entry

    sf = "/root/testdata/sf0.001"
    got = sorted(
        (r["doc_id"], r["pos"], r["fp"])
        for r in entry._q_window_fps(spark, sf).collect()
    )
    want = sorted(
        (int(d), int(p), f)
        for d, p, f in _duck(sf).execute(entry._WINDOW_FPS_SQL).fetchall()
    )
    assert got == want and len(got) > 0
