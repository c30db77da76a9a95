"""ES match-query knobs ``minimum_should_match`` / ``operator='and'``
on the single-field BM25 paths: a doc enters the ranking only if it
matches >= N / all of the query's distinct analyzed terms. Verified as
(a) unit math, (b) a DuckDB HAVING-count oracle on the exhaustive path,
(c) value identity across exhaustive / broadcast-TAAT / exhaustive-
strategy / cogroup paths, (d) ES edge semantics (corpus-absent term
under operator='and' matches nothing), (e) loud refusal on WAND."""

from __future__ import annotations

import tempfile

import duckdb
import pytest

from sgpt_spark.operators.index_search import (
    _msm_map,
    search_index,
    search_index_cogroup,
    search_index_join,
)
from sgpt_spark.operators.indexer import build_index, read_index
from sgpt_spark.operators.search import _validate_msm_args, bm25_search

K1, B = 1.2, 0.75


def runs(rows):
    return sorted((r["qid"], r["rank"], r["doc_id"], r["score"]) for r in rows)


# ---- pure-math units ----------------------------------------------------


def test_validate_msm_args():
    _validate_msm_args(0, "or")
    _validate_msm_args(3, "or")
    with pytest.raises(ValueError, match="unknown operator"):
        _validate_msm_args(0, "AND")
    with pytest.raises(ValueError, match=">= 0"):
        _validate_msm_args(-1, "or")
    with pytest.raises(ValueError, match="not both"):
        _validate_msm_args(2, "and")


def test_msm_map():
    qterms = [(1, "a", 1), (1, "b", 2), (2, "c", 1)]
    assert _msm_map(qterms, 0, "or") is None
    assert _msm_map(qterms, 1, "or") is None  # 0/1 never filters
    assert _msm_map(qterms, 2, "or") == {1: 2, 2: 2}
    # operator='and' requires every CLAUSE — qid 1's 'b b' is two
    # clauses (Lucene one-clause-per-token-occurrence)
    assert _msm_map(qterms, 0, "and") == {1: 3, 2: 1}


# ---- fixture -------------------------------------------------------------


def _docs(spark):
    # term coverage ladder for query "alpha beta gamma":
    #   docs 0-9  contain alpha only
    #   docs 10-14 contain alpha+beta
    #   docs 15-17 contain alpha+beta+gamma
    # plus filler so idf/avgdl are stable
    rows = []
    for i in range(10):
        rows.append((i, f"alpha filler{i} pad pad"))
    for i in range(10, 15):
        rows.append((i, f"alpha beta filler{i} pad"))
    for i in range(15, 18):
        rows.append((i, f"alpha beta gamma filler{i}"))
    for i in range(18, 40):
        rows.append((i, f"noise{i} pad pad pad"))
    return spark.createDataFrame(rows, "doc_id long, text string")


# qid 4 duplicates a token: its clauses are (alpha, alpha, beta), so an
# alpha-only doc matches 2 of 3 clauses — ES keeps it under msm=2
# (counting DISTINCT matched terms instead would wrongly drop it)
QUERIES = [
    (1, "alpha beta gamma"),
    (2, "alpha beta"),
    (3, "alpha zzz_absent"),
    (4, "alpha alpha beta"),
]


def _queries(spark):
    return spark.createDataFrame(QUERIES, "qid long, query string")


# ---- DuckDB oracle for the exhaustive path -------------------------------

_MSM_SQL = f"""
WITH toks AS (
  SELECT doc_id, u.term AS term
  FROM docs, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS u(term)
),
dlen AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
dfs AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dlen),
qt AS (
  SELECT qid, u.term AS term, count(*) AS qtf
  FROM queries, unnest(string_split(query, ' ')) AS u(term)
  WHERE u.term <> '' GROUP BY qid, u.term
),
req AS (SELECT qid, sum(qtf) AS req FROM qt GROUP BY qid),
scored AS (
  SELECT q.qid, tf.doc_id,
         sum(q.qtf * ln(1 + (s.n - dfs.df + 0.5) / (dfs.df + 0.5))
             * tf.tf / (tf.tf + {K1} * (1 - {B} + {B} * dl.dl / s.avgdl))) AS raw,
         sum(q.qtf) AS nm
  FROM qt q
  JOIN tf ON q.term = tf.term
  JOIN dfs ON tf.term = dfs.term
  JOIN dlen dl ON tf.doc_id = dl.doc_id
  CROSS JOIN stats s
  GROUP BY q.qid, tf.doc_id
),
filtered AS (
  SELECT scored.* FROM scored
  JOIN req ON scored.qid = req.qid
  WHERE nm >= {{REQ}}
),
ranked AS (
  SELECT qid, doc_id, round(raw, 6) AS score,
         row_number() OVER (
           PARTITION BY qid ORDER BY round(raw, 6) DESC, doc_id ASC
         ) AS rnk
  FROM filtered
)
SELECT qid, doc_id, score, CAST(rnk AS INTEGER) AS rank
FROM ranked WHERE rnk <= 10
"""


def _duck_oracle(docs_pdf, req_expr: str):
    con = duckdb.connect()
    con.register("docs", docs_pdf)
    import pandas as pd

    con.register("queries", pd.DataFrame(QUERIES, columns=["qid", "query"]))
    rows = con.execute(_MSM_SQL.replace("{REQ}", req_expr)).fetchall()
    return sorted((q, rk, d, s) for q, d, s, rk in rows)


def test_msm_matches_duckdb_oracle(spark):
    docs = _docs(spark)
    docs_pdf = docs.toPandas()
    got = runs(bm25_search(docs, _queries(spark), k=10, minimum_should_match=2).collect())
    assert got == _duck_oracle(docs_pdf, "2") and got
    # only alpha+beta(+gamma) docs survive for qids 1/2; qid 3 needs 2
    # matched clauses but zzz_absent matches nothing -> qid 3 empty;
    # qid 4's duplicated alpha means an alpha-only doc matches 2 clauses
    assert {q for q, _, _, _ in got} == {1, 2, 4}
    q4_docs = {d for q, _, d, _ in got if q == 4}
    assert q4_docs & set(range(10))  # alpha-only docs kept for qid 4


def test_operator_and_matches_duckdb_oracle(spark):
    docs = _docs(spark)
    got = runs(bm25_search(docs, _queries(spark), k=10, operator="and").collect())
    # req = the query's FULL analyzed clause count (req table in the SQL)
    assert got == _duck_oracle(docs.toPandas(), "req.req") and got
    # qid 1 needs all three -> docs 15-17 only; qid 3 has an absent term
    # -> matches nothing (ES operator=and semantics); qid 4 needs its 3
    # clauses (alpha x2 + beta) -> exactly the alpha+beta docs
    assert {d for q, _, d, _ in got if q == 1} == {15, 16, 17}
    assert all(q != 3 for q, _, _, _ in got)
    assert {d for q, _, d, _ in got if q == 4} == set(range(10, 18))


# ---- identity across index paths -----------------------------------------


def test_msm_identical_across_paths(spark, tmp_path):
    docs = _docs(spark)
    queries = _queries(spark)
    idx = str(tmp_path / "msm_idx")
    build_index(docs.repartition(3), idx, segment_size=16)
    postings, meta = read_index(spark, idx)
    for kwargs in (
        {"minimum_should_match": 2},
        {"operator": "and"},
    ):
        want = runs(bm25_search(docs, queries, k=10, **kwargs).collect())
        assert want, kwargs
        got_taat = runs(
            search_index(spark, postings, meta, queries, k=10, **kwargs).collect()
        )
        got_exh = runs(
            search_index(
                spark, postings, meta, queries, k=10, strategy="exhaustive", **kwargs
            ).collect()
        )
        got_cg = runs(
            search_index_cogroup(spark, postings, meta, queries, k=10, **kwargs).collect()
        )
        got_join = runs(
            search_index_join(spark, postings, meta, queries, k=10, **kwargs).collect()
        )
        assert got_taat == want, kwargs
        assert got_exh == want, kwargs
        assert got_cg == want, kwargs
        assert got_join == want, kwargs


def test_msm_zero_and_one_are_noops(spark, tmp_path):
    docs = _docs(spark)
    queries = _queries(spark)
    base = runs(bm25_search(docs, queries, k=10).collect())
    assert runs(bm25_search(docs, queries, k=10, minimum_should_match=1).collect()) == base
    idx = str(tmp_path / "msm_noop")
    build_index(docs.repartition(2), idx, segment_size=25)
    postings, meta = read_index(spark, idx)
    assert (
        runs(
            search_index(
                spark, postings, meta, queries, k=10, minimum_should_match=1
            ).collect()
        )
        == base
    )


def test_msm_with_exclude_self(spark, tmp_path):
    """Self-match filtering composes with msm: doc 15 queries its own
    terms, must match >= 2 terms AND not return itself."""
    docs = _docs(spark)
    queries = spark.createDataFrame(
        [(15, "alpha beta gamma")], "qid long, query string"
    )
    idx = str(tmp_path / "msm_self")
    build_index(docs.repartition(2), idx, segment_size=25)
    postings, meta = read_index(spark, idx)
    got = runs(
        search_index(
            spark, postings, meta, queries, k=10,
            minimum_should_match=2, exclude_self=True,
        ).collect()
    )
    ids = {d for _, _, d, _ in got}
    assert 15 not in ids
    assert ids == {10, 11, 12, 13, 14, 16, 17}  # the other >=2-term docs


def test_msm_sparse_span_fallback(spark, tmp_path):
    """_taat_parts' sparse-span fallback (external doc ids so far apart
    that dense accumulators would waste memory) must apply the same
    clause-counting msm gate as the dense path — previously untested
    because every fixture used contiguous ids."""
    rows = [
        (0, "alpha filler0 pad pad"),
        (1, "alpha beta filler1 pad"),
        (2, "noise2 pad pad pad"),
        # far end of the id space: span >> 20 * total_postings
        (10_000_000_000, "alpha beta gamma filler2"),
        (10_000_000_001, "alpha filler3 pad pad"),
        (10_000_000_002, "beta filler4 pad pad"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    queries = spark.createDataFrame(
        [(1, "alpha beta"), (4, "alpha alpha beta")], "qid long, query string"
    )
    idx = str(tmp_path / "msm_sparse")
    build_index(docs.coalesce(1), idx, segment_size=10)
    postings, meta = read_index(spark, idx)
    for kwargs in ({"minimum_should_match": 2}, {"operator": "and"}):
        want = runs(bm25_search(docs, queries, k=10, **kwargs).collect())
        got = runs(
            search_index(spark, postings, meta, queries, k=10, **kwargs).collect()
        )
        assert got == want and got, kwargs
    # the duplicated-alpha query keeps alpha-only docs under msm=2
    got2 = {
        (r["qid"], r["doc_id"])
        for r in search_index(
            spark, postings, meta, queries, k=10, minimum_should_match=2
        ).collect()
    }
    assert (4, 0) in got2 and (4, 10_000_000_001) in got2
    assert (1, 0) not in got2  # distinct-term query still needs both


def test_wand_refuses_msm(spark, tmp_path):
    docs = _docs(spark)
    idx = str(tmp_path / "msm_wand")
    build_index(docs, idx, segment_size=40)
    postings, meta = read_index(spark, idx)
    with pytest.raises(ValueError, match="WAND"):
        search_index(
            spark, postings, meta, _queries(spark), k=10,
            strategy="wand", minimum_should_match=2,
        )


# ---- multifield: per-field match clauses (ES multi_match semantics) ------

from sgpt_spark.operators.index_search import (
    search_multifield_index,
    search_multifield_index_cogroup,
    search_multifield_index_join,
)
from sgpt_spark.operators.indexer import build_multifield_index
from sgpt_spark.operators.search import bm25_multifield_search


def _mf_docs(spark):
    # query "alpha beta" under operator='and':
    #   doc 0: title matches BOTH           -> matches (via title)
    #   doc 1: alpha in title, beta in text -> NO match (the ES trap:
    #          each per-field clause must clear the bar by itself)
    #   doc 2: text matches both            -> matches (via text)
    rows = [
        (0, "alpha beta topic", "noise filler pad pad"),
        (1, "alpha topic", "beta filler pad pad"),
        (2, "alpha topic", "alpha beta filler pad"),
    ] + [(i, f"t{i} topic", f"noise{i} filler pad pad") for i in range(3, 30)]
    return spark.createDataFrame(rows, "doc_id long, title string, text string")


def test_mf_operator_and_split_across_fields_is_no_match(spark):
    docs = _mf_docs(spark)
    queries = spark.createDataFrame([(1, "alpha beta")], "qid long, query string")
    plain = bm25_multifield_search(docs, queries, k=10).collect()
    anded = bm25_multifield_search(docs, queries, k=10, operator="and").collect()
    assert {r["doc_id"] for r in plain} >= {0, 1, 2}
    assert {r["doc_id"] for r in anded} == {0, 2}  # doc 1 excluded


_MF_MSM_SQL = """
WITH fraw AS (
  SELECT doc_id, 'title' AS field,
         list_filter(string_split(title, ' '), x -> x <> '') AS toks FROM docs
  UNION ALL
  SELECT doc_id, 'text' AS field,
         list_filter(string_split(text, ' '), x -> x <> '') AS toks FROM docs
),
fdocs AS (SELECT * FROM fraw WHERE len(toks) > 0),
fterms AS (SELECT doc_id, field, u.term AS term FROM fdocs, unnest(toks) AS u(term)),
fdoclen AS (SELECT field, doc_id, len(toks) AS doc_len FROM fdocs),
ftf AS (SELECT field, term, doc_id, count(*) AS tf FROM fterms GROUP BY field, term, doc_id),
fdf AS (SELECT field, term, count(*) AS df FROM ftf GROUP BY field, term),
fstats AS (SELECT field, count(*) AS n, avg(len(toks)) AS avgdl FROM fdocs GROUP BY field),
qt AS (
  SELECT qid, u.term AS term, count(*) AS qtf
  FROM queries, unnest(string_split(query, ' ')) AS u(term)
  WHERE u.term <> '' GROUP BY qid, u.term
),
req AS (SELECT qid, sum(qtf) AS req FROM qt GROUP BY qid),
fscored AS (
  SELECT q.qid, ftf.doc_id, ftf.field,
         sum(q.qtf * ln(1 + (s.n - fdf.df + 0.5) / (fdf.df + 0.5))
             * ftf.tf / (ftf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.doc_len / s.avgdl))
         ) AS fscore,
         sum(q.qtf) AS nm
  FROM qt q
  JOIN ftf ON q.term = ftf.term
  JOIN fdf ON ftf.field = fdf.field AND ftf.term = fdf.term
  JOIN fdoclen dl ON ftf.field = dl.field AND ftf.doc_id = dl.doc_id
  JOIN fstats s ON ftf.field = s.field
  GROUP BY q.qid, ftf.doc_id, ftf.field
),
fkept AS (
  SELECT f.* FROM fscored f JOIN req r ON f.qid = r.qid WHERE f.nm >= {REQ}
),
combined AS (
  SELECT qid, doc_id,
         max(fscore) + 0.5 * (sum(fscore) - max(fscore)) AS raw
  FROM fkept GROUP BY qid, doc_id
),
ranked AS (
  SELECT qid, doc_id, round(raw, 6) AS score,
         row_number() OVER (
           PARTITION BY qid ORDER BY round(raw, 6) DESC, doc_id ASC
         ) AS rnk
  FROM combined
)
SELECT qid, doc_id, score, CAST(rnk AS INTEGER) AS rank
FROM ranked WHERE rnk <= 10
"""

# qid 4 duplicates alpha: under msm=2 a field matching alpha alone
# clears the bar (2 of 3 clauses) — the per-occurrence clause semantics
MF_QUERIES = [
    (1, "alpha beta"),
    (2, "alpha"),
    (3, "beta zzz_absent"),
    (4, "alpha alpha beta"),
]


def _mf_duck(docs_pdf, req_expr: str):
    import pandas as pd

    con = duckdb.connect()
    con.register("docs", docs_pdf)
    con.register("queries", pd.DataFrame(MF_QUERIES, columns=["qid", "query"]))
    rows = con.execute(_MF_MSM_SQL.replace("{REQ}", req_expr)).fetchall()
    return sorted((q, rk, d, s) for q, d, s, rk in rows)


def test_mf_msm_matches_duckdb_and_identical_across_paths(spark, tmp_path):
    docs = _mf_docs(spark)
    queries = spark.createDataFrame(MF_QUERIES, "qid long, query string")
    idx = str(tmp_path / "mf_msm")
    build_multifield_index(docs, idx, fields=("title", "text"), segment_size=10)
    for kwargs, req_expr in (
        ({"operator": "and"}, "r.req"),
        ({"minimum_should_match": 2}, "2"),
    ):
        want = runs(bm25_multifield_search(docs, queries, k=10, **kwargs).collect())
        assert want == _mf_duck(docs.toPandas(), req_expr), kwargs
        assert want, kwargs
        # qid 3 carries a corpus-absent term: under operator='and' it
        # must match nothing; under msm=2 no single field has 2 matches
        assert all(q != 3 for q, _, _, _ in want)
        for fn in (
            search_multifield_index,
            search_multifield_index_join,
            search_multifield_index_cogroup,
        ):
            got = runs(fn(spark, idx, queries, k=10, **kwargs).collect())
            assert got == want, (fn.__name__, kwargs)


def test_mf_msm_composes_with_boosts(spark, tmp_path):
    """Boost scales a field's score; msm gates its match clause —
    independent knobs, exercised together across all four paths."""
    docs = _mf_docs(spark)
    queries = spark.createDataFrame([(1, "alpha beta")], "qid long, query string")
    idx = str(tmp_path / "mf_msm_boost")
    build_multifield_index(docs, idx, fields=("title", "text"), segment_size=10)
    kwargs = {"operator": "and", "boosts": {"title": 3.0}}
    want = runs(bm25_multifield_search(docs, queries, k=10, **kwargs).collect())
    assert {d for _, _, d, _ in want} == {0, 2}
    for fn in (
        search_multifield_index,
        search_multifield_index_join,
        search_multifield_index_cogroup,
    ):
        got = runs(fn(spark, idx, queries, k=10, **kwargs).collect())
        assert got == want, fn.__name__
