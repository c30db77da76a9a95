"""ES ``multi_match type=cross_fields`` (operators/crossfields.py):
from-scratch brute force of the term-centric blended-df scoring,
the field-centric/term-centric operator='and' difference, the
identical-fields and single-field degenerations, the blended-df
positivity cap, index == exhaustive on both codecs, the type
dispatcher, and a DuckDB twin at gate rigor over the real sf0.001
corpus + flagship derived queryset."""

from __future__ import annotations

import math
from collections import Counter

import pytest

from sgpt_spark.operators.crossfields import (
    bm25_crossfields_search,
    multi_match,
    multi_match_index,
    search_crossfields_index,
)
from sgpt_spark.operators.indexer import build_multifield_index
from sgpt_spark.operators.search import bm25_multifield_search, bm25_search

K1, B = 1.2, 0.75

DOCS = [
    (0, "smith john", "the quick brown fox jumps over the lazy dog"),
    (1, "john report", "smith wrote the quarterly report for john"),
    (2, "lazy dog", "a very lazy dog sleeps all day long here"),
    (3, "brown fox notes", "notes about foxes and other quick animals"),
    (4, "quarterly", "john john smith quarterly numbers look good"),
    (5, "", "title is empty but smith appears in the body text"),
    (6, "smith smith smith", "short body"),
    (7, "unrelated words", "completely different content entirely"),
]
SCHEMA = "doc_id long, title string, text string"
FIELDS = ("title", "text")


def _toks(s):
    return [t for t in s.split(" ") if t]


def _brute_cross(queries, tie=0.0, k=10, boosts=None, msm=0, op="or"):
    """From-scratch cross_fields: blended df = max_f df_f capped at each
    field's docCount; per-term dis-max across fields; doc score = sum of
    term clauses; operator='and' bar counts a term matched in ANY field."""
    boosts = boosts or {}
    toks = {
        f: {d[0]: _toks(d[1 if f == "title" else 2]) for d in DOCS
            if _toks(d[1 if f == "title" else 2])}
        for f in FIELDS
    }
    n = {f: len(toks[f]) for f in FIELDS}
    avgdl = {f: sum(len(v) for v in toks[f].values()) / max(n[f], 1) for f in FIELDS}
    df = {
        f: Counter(t for ts in toks[f].values() for t in set(ts)) for f in FIELDS
    }
    out = []
    for qid, q in queries:
        qterms = Counter(_toks(q))
        req = sum(qterms.values()) if op == "and" else msm
        scored = []
        for doc_id in {d[0] for d in DOCS}:
            score, matched = 0.0, 0
            for t, qtf in qterms.items():
                dfb = max(df[f].get(t, 0) for f in FIELDS)
                if dfb == 0:
                    continue
                ps = []
                for f in FIELDS:
                    ts = toks[f].get(doc_id, [])
                    tf = ts.count(t)
                    if tf == 0:
                        continue
                    cap = min(dfb, n[f])
                    idf = math.log(1.0 + (n[f] - cap + 0.5) / (cap + 0.5))
                    p = (
                        boosts.get(f, 1.0) * qtf * idf * tf
                        / (tf + K1 * (1 - B + B * len(ts) / avgdl[f]))
                    )
                    ps.append(p)
                if not ps:
                    continue
                mx = max(ps)
                score += mx + tie * (sum(ps) - mx)
                matched += qtf
            if score > 0.0 and matched >= req:
                scored.append((round(score, 6), doc_id))
        scored.sort(key=lambda x: (-x[0], x[1]))
        for rank, (s, d) in enumerate(scored[:k], 1):
            out.append((qid, d, s, rank))
    return sorted(out)


def _rows(df):
    return sorted(
        (r["qid"], r["doc_id"], round(r["score"], 6), r["rank"]) for r in df.collect()
    )


QUERIES = [
    (100, "john smith"),
    (101, "quick lazy dog"),
    (102, "smith quarterly report"),
    (103, "absentterm"),
    (104, "smith absentterm"),
]


@pytest.mark.parametrize("tie", [0.0, 0.3, 1.0])
def test_exhaustive_matches_brute_force(spark, tie):
    docs = spark.createDataFrame(DOCS, SCHEMA)
    q = spark.createDataFrame(QUERIES, "qid long, query string")
    got = _rows(bm25_crossfields_search(docs, q, k=10, tie_breaker=tie))
    assert got == _brute_cross(QUERIES, tie=tie)


def test_boosts_and_msm_match_brute_force(spark):
    docs = spark.createDataFrame(DOCS, SCHEMA)
    q = spark.createDataFrame(QUERIES, "qid long, query string")
    got = _rows(
        bm25_crossfields_search(
            docs, q, k=10, tie_breaker=0.3, boosts={"title": 2.0},
            minimum_should_match=2,
        )
    )
    assert got == _brute_cross(QUERIES, tie=0.3, boosts={"title": 2.0}, msm=2)


def test_operator_and_matches_across_fields(spark):
    """The cross_fields motivation: operator='and' requires every term
    SOMEWHERE, not every term in one field. 'smith report': doc 1 has
    smith in text + report in title AND text; doc 0 has smith in title
    only (no report) -> excluded; best_fields operator='and' keeps only
    docs where ONE field holds both terms."""
    docs = spark.createDataFrame(DOCS, SCHEMA)
    q = spark.createDataFrame([(1, "fox jumps")], "qid long, query string")
    # doc 0: fox in title AND text? title='smith john' no; text has fox+jumps.
    # doc 3: fox in title, jumps nowhere -> cross_fields excludes it too.
    cross = _rows(bm25_crossfields_search(docs, q, k=10, operator="and"))
    assert [r[1] for r in cross] == [0]
    assert cross == _brute_cross([(1, "fox jumps")], op="and")
    # split-across-fields case: 'notes animals' — doc 3 has notes in
    # BOTH title and text, animals only in text: cross_fields matches
    q2 = spark.createDataFrame([(2, "notes animals")], "qid long, query string")
    cross2 = _rows(bm25_crossfields_search(docs, q2, k=10, operator="and"))
    assert [r[1] for r in cross2] == [3]
    best2 = bm25_multifield_search(docs, q2, k=10, operator="and").collect()
    assert [r["doc_id"] for r in best2] == [3]  # text holds both here too


def test_split_terms_only_cross_fields_matches(spark):
    """A doc whose query terms live in DIFFERENT fields (no single field
    holds both) matches under cross_fields operator='and' but NOT under
    best_fields operator='and'."""
    rows = [
        (0, "alpha", "beta gamma"),
        (1, "alpha beta", "other words"),
        (2, "unrelated", "nothing here"),
    ]
    docs = spark.createDataFrame(rows, SCHEMA)
    q = spark.createDataFrame([(1, "alpha gamma")], "qid long, query string")
    cross = bm25_crossfields_search(docs, q, k=10, operator="and").collect()
    assert [r["doc_id"] for r in cross] == [0]  # alpha@title, gamma@text
    best = bm25_multifield_search(docs, q, k=10, operator="and").collect()
    assert best == []  # no single field holds both


def test_identical_fields_degeneration(spark):
    """With title == text the per-field stats coincide, so term-centric
    and field-centric combines agree for EVERY tie_breaker:
    sum_t [s(1+tie)] == S(1+tie) with S = sum_t s."""
    rows = [(i, t, t) for i, (_, _, t) in enumerate(DOCS)]
    docs = spark.createDataFrame(rows, SCHEMA)
    q = spark.createDataFrame(QUERIES, "qid long, query string")
    for tie in (0.0, 0.4):
        cross = _rows(bm25_crossfields_search(docs, q, k=10, tie_breaker=tie))
        best = _rows(bm25_multifield_search(docs, q, k=10, tie_breaker=tie))
        assert cross == best


def test_single_field_equals_plain_bm25(spark):
    docs = spark.createDataFrame(DOCS, SCHEMA)
    q = spark.createDataFrame(QUERIES, "qid long, query string")
    cross = _rows(
        bm25_crossfields_search(docs, q, k=10, fields=("text",), tie_breaker=0.0)
    )
    plain = _rows(bm25_search(docs.select("doc_id", "text"), q, k=10))
    assert cross == plain


def test_blended_df_cap_keeps_scores_positive(spark):
    """df blended above a small field's docCount: 'common' df=6 in text
    but the title index holds only 3 docs — uncapped idf would go
    negative; the cap floors it and every score stays > 0."""
    rows = [
        (0, "common topic", "common words here"),
        (1, "common", "common again common"),
        (2, "topic", "common common appears"),
        (3, "", "common in body only"),
        (4, "", "common too"),
        (5, "", "also common text"),
    ]
    docs = spark.createDataFrame(rows, SCHEMA)
    q = spark.createDataFrame([(1, "common")], "qid long, query string")
    got = bm25_crossfields_search(docs, q, k=10).collect()
    assert len(got) == 6 and all(r["score"] > 0.0 for r in got)


@pytest.mark.parametrize("codec", ["varint", "pfor"])
def test_index_equals_exhaustive(spark, tmp_path, codec):
    docs = spark.createDataFrame(DOCS, SCHEMA)
    out = str(tmp_path / f"cfidx_{codec}")
    build_multifield_index(docs, out, fields=FIELDS, segment_size=3, codec=codec)
    q = spark.createDataFrame(QUERIES, "qid long, query string")
    for tie, boosts, msm in [(0.0, None, 0), (0.3, {"title": 2.0}, 2)]:
        exh = _rows(
            bm25_crossfields_search(
                docs, q, k=10, tie_breaker=tie, boosts=boosts,
                minimum_should_match=msm,
            )
        )
        idx = _rows(
            search_crossfields_index(
                spark, out, q, k=10, tie_breaker=tie, boosts=boosts,
                minimum_should_match=msm,
            )
        )
        assert idx == exh


def test_index_operator_and_iterable_queries(spark, tmp_path):
    docs = spark.createDataFrame(DOCS, SCHEMA)
    out = str(tmp_path / "cfidx_and")
    build_multifield_index(docs, out, fields=FIELDS, segment_size=3)
    got = _rows(
        search_crossfields_index(
            spark, out, [(1, "alpha gamma"), (2, "fox jumps")], k=10, operator="and"
        )
    )
    exh = _rows(
        bm25_crossfields_search(
            docs,
            spark.createDataFrame(
                [(1, "alpha gamma"), (2, "fox jumps")], "qid long, query string"
            ),
            k=10,
            operator="and",
        )
    )
    assert got == exh


def test_dispatcher(spark, tmp_path):
    docs = spark.createDataFrame(DOCS, SCHEMA)
    q = spark.createDataFrame(QUERIES, "qid long, query string")
    # most_fields == best_fields at tie_breaker 1.0 (the ES bool-sum)
    most = _rows(multi_match(docs, q, mm_type="most_fields"))
    assert most == _rows(bm25_multifield_search(docs, q, tie_breaker=1.0))
    # cross_fields routes here with the ES default tie 0.0
    assert _rows(multi_match(docs, q, mm_type="cross_fields")) == _brute_cross(
        QUERIES, tie=0.0
    )
    with pytest.raises(ValueError, match="unknown multi_match type"):
        multi_match(docs, q, mm_type="phrase")
    with pytest.raises(ValueError, match="no tie_breaker"):
        multi_match(docs, q, mm_type="most_fields", tie_breaker=0.5)
    out = str(tmp_path / "mm_idx")
    build_multifield_index(docs, out, fields=FIELDS, segment_size=3)
    assert _rows(multi_match_index(spark, out, q, mm_type="most_fields")) == most
    with pytest.raises(ValueError, match="no tie_breaker"):
        multi_match_index(spark, out, q, mm_type="most_fields", tie_breaker=0.5)


def test_guards(spark):
    docs = spark.createDataFrame(DOCS, SCHEMA)
    q = spark.createDataFrame(QUERIES, "qid long, query string")
    with pytest.raises(ValueError, match="tie_breaker"):
        bm25_crossfields_search(docs, q, tie_breaker=1.5)
    with pytest.raises(ValueError, match="positive finite"):
        bm25_crossfields_search(docs, q, boosts={"title": -1.0})


def test_gate_shape_duckdb_equality(spark):
    """DuckDB twin at gate rigor over the real sf0.001 corpus + the
    flagship derived queryset: title = first 3 tokens of text (the
    multifield gate's derivation), cross_fields tie_breaker 0.0."""
    import duckdb

    from pyspark.sql import functions as F

    from sgpt_spark.sources.queryset import QUERIES_SQL, derived_queries
    from sgpt_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    docs = load_table(spark, sf, "documents").withColumn(
        "title", F.array_join(F.slice(F.split(F.col("text"), " ", -1), 1, 3), " ")
    )
    got = _rows(
        bm25_crossfields_search(docs, derived_queries(docs), k=10, tie_breaker=0.0)
    )

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    sql = f"""
WITH base AS (
    SELECT doc_id,
           array_to_string(list_slice(string_split(text, ' '), 1, 3), ' ') AS title,
           text
    FROM documents
  ),
  fraw AS (
    SELECT doc_id, 'title' AS field,
           list_filter(string_split(title, ' '), x -> x <> '') AS toks FROM base
    UNION ALL
    SELECT doc_id, 'text' AS field,
           list_filter(string_split(text, ' '), x -> x <> '') AS toks FROM base
  ),
  fdocs AS (SELECT * FROM fraw WHERE len(toks) > 0),
  fterms AS (
    SELECT doc_id, field, u.term AS term FROM fdocs, unnest(toks) AS u(term)
  ),
  fdoclen AS (SELECT field, doc_id, len(toks) AS doc_len FROM fdocs),
  ftf AS (
    SELECT field, term, doc_id, count(*) AS tf
    FROM fterms GROUP BY field, term, doc_id
  ),
  fdf AS (SELECT field, term, count(*) AS df FROM ftf GROUP BY field, term),
  fdfb AS (SELECT term, max(df) AS dfb FROM fdf GROUP BY term),
  fstats AS (
    SELECT field, count(*) AS n, avg(len(toks)) AS avgdl FROM fdocs GROUP BY field
  ),
  queryset AS ({QUERIES_SQL}),
  mqterms AS (
    SELECT qid, u.term AS term, count(*) AS qtf
    FROM queryset, unnest(string_split(query, ' ')) AS u(term)
    WHERE u.term <> ''
    GROUP BY qid, u.term
  ),
  tscored AS (
    SELECT q.qid, ftf.doc_id, q.term, ftf.field,
           any_value(q.qtf) AS qtf,
           any_value(
             q.qtf
             * ln(1 + (s.n - least(b.dfb, s.n) + 0.5)
                    / (least(b.dfb, s.n) + 0.5))
             * ftf.tf / (ftf.tf + {K1} * (1 - {B} + {B} * dl.doc_len / s.avgdl))
           ) AS p
    FROM mqterms q
    JOIN ftf ON q.term = ftf.term
    JOIN fdfb b ON q.term = b.term
    JOIN fdoclen dl ON ftf.field = dl.field AND ftf.doc_id = dl.doc_id
    JOIN fstats s ON ftf.field = s.field
    GROUP BY q.qid, ftf.doc_id, q.term, ftf.field
  ),
  tcomb AS (
    SELECT qid, doc_id, term,
           max(p) + 0.0 * (sum(p) - max(p)) AS term_score
    FROM tscored GROUP BY qid, doc_id, term
  ),
  ccombined AS (
    SELECT qid, doc_id, sum(term_score) AS raw_score
    FROM tcomb GROUP BY qid, doc_id
  ),
  ranked AS (
    SELECT qid, doc_id, round(raw_score, 6) AS score,
           row_number() OVER (
             PARTITION BY qid
             ORDER BY round(raw_score, 6) DESC, doc_id ASC
           ) AS rnk
    FROM ccombined
  )
SELECT qid, doc_id, score, CAST(rnk AS INTEGER) AS rank
FROM ranked WHERE rnk <= 10
"""
    want = sorted(
        (int(r[0]), int(r[1]), round(float(r[2]), 6), int(r[3]))
        for r in con.execute(sql).fetchall()
    )
    assert got == want


@pytest.mark.parametrize("codec", ["varint", "pfor"])
def test_cogroup_equals_collect_path(spark, tmp_path, codec):
    """In-plan cogroup twin == collect index path == exhaustive, both
    codecs, with boosts + msm and an iterable query set — the
    no-collect-contract parity the other index families carry."""
    from sgpt_spark.operators.crossfields import search_crossfields_index_cogroup

    docs = spark.createDataFrame(DOCS, SCHEMA)
    out = str(tmp_path / f"cfcg_{codec}")
    build_multifield_index(docs, out, fields=FIELDS, segment_size=3, codec=codec)
    q = spark.createDataFrame(QUERIES, "qid long, query string")
    for tie, boosts, msm in [(0.0, None, 0), (0.3, {"title": 2.0}, 2)]:
        exh = _rows(
            bm25_crossfields_search(
                docs, q, k=10, tie_breaker=tie, boosts=boosts,
                minimum_should_match=msm,
            )
        )
        cg = _rows(
            search_crossfields_index_cogroup(
                spark, out, q, k=10, tie_breaker=tie, boosts=boosts,
                minimum_should_match=msm,
            )
        )
        assert cg == exh
    # iterable queries + operator=and through the cogroup path
    cg_and = _rows(
        search_crossfields_index_cogroup(
            spark, out, [(1, "alpha gamma"), (2, "fox jumps")], k=10,
            operator="and",
        )
    )
    idx_and = _rows(
        search_crossfields_index(
            spark, out, [(1, "alpha gamma"), (2, "fox jumps")], k=10,
            operator="and",
        )
    )
    assert cg_and == idx_and


def test_join_path_equals_exhaustive(spark, tmp_path):
    """Relational join strategy == exhaustive == cogroup (the
    extreme-scale fallback parity), with boosts/msm and operator=and."""
    from sgpt_spark.operators.crossfields import (
        search_crossfields_index_cogroup,
        search_crossfields_index_join,
    )

    docs = spark.createDataFrame(DOCS, SCHEMA)
    out = str(tmp_path / "cfjoin")
    build_multifield_index(docs, out, fields=FIELDS, segment_size=3)
    q = spark.createDataFrame(QUERIES, "qid long, query string")
    for tie, boosts, msm in [(0.0, None, 0), (0.3, {"title": 2.0}, 2)]:
        exh = _rows(
            bm25_crossfields_search(
                docs, q, k=10, tie_breaker=tie, boosts=boosts,
                minimum_should_match=msm,
            )
        )
        jn = _rows(
            search_crossfields_index_join(
                spark, out, q, k=10, tie_breaker=tie, boosts=boosts,
                minimum_should_match=msm,
            )
        )
        assert jn == exh
    jn_and = _rows(
        search_crossfields_index_join(
            spark, out, [(1, "alpha gamma"), (2, "fox jumps")], k=10,
            operator="and",
        )
    )
    cg_and = _rows(
        search_crossfields_index_cogroup(
            spark, out, [(1, "alpha gamma"), (2, "fox jumps")], k=10,
            operator="and",
        )
    )
    assert jn_and == cg_and


# ---- combined_fields (ES 7.13+ merged-field BM25) ------------------------


def _brute_combined(queries, k=10, boosts=None, msm=0, op="or"):
    boosts = boosts or {}
    w = {f: boosts.get(f, 1.0) for f in FIELDS}
    toks = {
        f: {d[0]: _toks(d[1 if f == "title" else 2]) for d in DOCS
            if _toks(d[1 if f == "title" else 2])}
        for f in FIELDS
    }
    all_docs = sorted({d for f in FIELDS for d in toks[f]})
    dlc = {
        d: sum(w[f] * len(toks[f].get(d, [])) for f in FIELDS) for d in all_docs
    }
    n = len(all_docs)
    avgdl = sum(dlc.values()) / n
    df = {f: Counter(t for ts in toks[f].values() for t in set(ts)) for f in FIELDS}
    out = []
    for qid, q in queries:
        qterms = Counter(_toks(q))
        req = sum(qterms.values()) if op == "and" else msm
        scored = []
        for d in all_docs:
            score, matched = 0.0, 0
            for t, qtf in qterms.items():
                dfb = min(max(df[f].get(t, 0) for f in FIELDS), n)
                tfc = sum(w[f] * toks[f].get(d, []).count(t) for f in FIELDS)
                if dfb == 0 or tfc == 0:
                    continue
                idf = math.log(1.0 + (n - dfb + 0.5) / (dfb + 0.5))
                score += qtf * idf * tfc / (
                    tfc + K1 * (1 - B + B * dlc[d] / avgdl)
                )
                matched += qtf
            if score > 0.0 and matched >= req:
                scored.append((round(score, 6), d))
        scored.sort(key=lambda x: (-x[0], x[1]))
        for rank, (s, d) in enumerate(scored[:k], 1):
            out.append((qid, d, s, rank))
    return sorted(out)


def test_combined_fields_brute_force(spark):
    from sgpt_spark.operators.crossfields import combined_fields_search

    docs = spark.createDataFrame(DOCS, SCHEMA)
    q = spark.createDataFrame(QUERIES, "qid long, query string")
    got = _rows(combined_fields_search(docs, q, k=10))
    assert got == _brute_combined(QUERIES)
    # ES field weights (>= 1) fold into tf and the norm
    got_b = _rows(
        combined_fields_search(
            docs, q, k=10, boosts={"title": 3.0}, minimum_should_match=2
        )
    )
    assert got_b == _brute_combined(QUERIES, boosts={"title": 3.0}, msm=2)
    # operator=and: every term somewhere (the term-centric bar)
    got_and = _rows(
        combined_fields_search(
            docs,
            spark.createDataFrame([(1, "fox jumps")], "qid long, query string"),
            k=10, operator="and",
        )
    )
    assert got_and == _brute_combined([(1, "fox jumps")], op="and")
    with pytest.raises(ValueError, match=">= 1.0"):
        combined_fields_search(docs, q, boosts={"title": 0.5})


def test_combined_fields_single_field_degeneration(spark):
    """One field at weight 1 == plain BM25 over that field (tf_c = tf,
    dl_c = dl, merged stats = field stats)."""
    from sgpt_spark.operators.crossfields import combined_fields_search

    docs = spark.createDataFrame(DOCS, SCHEMA)
    q = spark.createDataFrame(QUERIES, "qid long, query string")
    got = _rows(combined_fields_search(docs, q, k=10, fields=("text",)))
    want = _rows(bm25_search(docs.select("doc_id", "text"), q, k=10))
    assert got == want


def test_combined_fields_duckdb_gate_rigor(spark):
    """DuckDB twin over the real sf0.001 corpus + flagship queryset
    (title = first 3 tokens, title weight 2)."""
    import duckdb

    from pyspark.sql import functions as F

    from sgpt_spark.operators.crossfields import combined_fields_search
    from sgpt_spark.sources.queryset import QUERIES_SQL, derived_queries
    from sgpt_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    docs = load_table(spark, sf, "documents").withColumn(
        "title", F.array_join(F.slice(F.split(F.col("text"), " ", -1), 1, 3), " ")
    )
    got = _rows(
        combined_fields_search(
            docs, derived_queries(docs), k=10, boosts={"title": 2.0}
        )
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    sql = f"""
WITH base AS (
    SELECT doc_id,
           array_to_string(list_slice(string_split(text, ' '), 1, 3), ' ') AS title,
           text
    FROM documents
  ),
  fraw AS (
    SELECT doc_id, 'title' AS field,
           list_filter(string_split(title, ' '), x -> x <> '') AS toks FROM base
    UNION ALL
    SELECT doc_id, 'text' AS field,
           list_filter(string_split(text, ' '), x -> x <> '') AS toks FROM base
  ),
  fdocs AS (SELECT * FROM fraw WHERE len(toks) > 0),
  dlens AS (
    SELECT doc_id,
           2.0 * coalesce(max(CASE WHEN field = 'title' THEN len(toks) END), 0)
           + 1.0 * coalesce(max(CASE WHEN field = 'text' THEN len(toks) END), 0)
             AS dlc
    FROM fdocs GROUP BY doc_id
  ),
  cstats AS (SELECT count(*) AS n, avg(dlc) AS avgdl FROM dlens),
  fterms AS (
    SELECT doc_id, field, u.term AS term FROM fdocs, unnest(toks) AS u(term)
  ),
  ftf AS (
    SELECT term, doc_id,
           2.0 * sum(CASE WHEN field = 'title' THEN 1 ELSE 0 END)
           + 1.0 * sum(CASE WHEN field = 'text' THEN 1 ELSE 0 END) AS tfc,
           count(DISTINCT CASE WHEN field = 'title' THEN 1 END) AS _ht,
           count(DISTINCT CASE WHEN field = 'text' THEN 1 END) AS _hx
    FROM fterms GROUP BY term, doc_id
  ),
  fdfb AS (
    SELECT term, greatest(sum(_ht), sum(_hx)) AS dfb FROM ftf GROUP BY term
  ),
  queryset AS ({QUERIES_SQL}),
  mqterms AS (
    SELECT qid, u.term AS term, count(*) AS qtf
    FROM queryset, unnest(string_split(query, ' ')) AS u(term)
    WHERE u.term <> ''
    GROUP BY qid, u.term
  ),
  tscored AS (
    SELECT q.qid, ftf.doc_id,
           q.qtf * ln(1 + (s.n - least(b.dfb, s.n) + 0.5)
                        / (least(b.dfb, s.n) + 0.5))
           * ftf.tfc / (ftf.tfc + {K1} * (1 - {B} + {B} * dl.dlc / s.avgdl))
             AS p
    FROM mqterms q
    JOIN ftf ON q.term = ftf.term
    JOIN fdfb b ON q.term = b.term
    JOIN dlens dl ON ftf.doc_id = dl.doc_id
    CROSS JOIN cstats s
  ),
  ccombined AS (
    SELECT qid, doc_id, sum(p) AS raw_score FROM tscored GROUP BY qid, doc_id
  ),
  ranked AS (
    SELECT qid, doc_id, round(raw_score, 6) AS score,
           row_number() OVER (
             PARTITION BY qid
             ORDER BY round(raw_score, 6) DESC, doc_id ASC
           ) AS rnk
    FROM ccombined
  )
SELECT qid, doc_id, score, CAST(rnk AS INTEGER) AS rank
FROM ranked WHERE rnk <= 10
"""
    want = sorted(
        (int(r[0]), int(r[1]), round(float(r[2]), 6), int(r[3]))
        for r in con.execute(sql).fetchall()
    )
    assert got == want
