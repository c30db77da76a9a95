"""ES terms_set query (operators/termset.py): index == exhaustive
identity across codecs, a from-scratch brute force over both minimum
spellings (per-query min-script idiom and per-doc field), dedup /
guard coverage, and a DuckDB twin at gate rigor over the real sf0.001
documents corpus."""

from __future__ import annotations

import pytest

from sgpt_spark.functions.bm25 import score_py
from sgpt_spark.operators.indexer import build_postings
from sgpt_spark.operators.termset import terms_set_search, terms_set_search_index

pytestmark = pytest.mark.usefixtures("spark")

DOCS = [
    # (doc_id, text, required_matches)
    (0, "alpha beta gamma delta", 2),
    (1, "alpha beta", 1),
    (2, "alpha", 3),
    (3, "beta gamma", 2),
    (4, "delta epsilon zeta", 1),
    (5, "alpha beta gamma", 9),  # per-doc minimum nothing can reach
]

SETS = [
    (1, ["alpha", "beta", "gamma"]),
    (2, ["delta", "epsilon"]),
    (3, ["zzz"]),
]


def _docs(spark):
    return spark.createDataFrame(
        DOCS, "doc_id long, text string, required_matches long"
    )


def _rows(df):
    return sorted(
        (r["qid"], r["doc_id"], r["score"], r["rank"]) for r in df.collect()
    )


def _brute(sets, msm_min=None, msm_field=False, k=10):
    """Pure-python terms_set: distinct matched terms vs the resolved
    minimum, BM25 sum over matched terms, (score desc, doc_id asc)."""
    toks = {d: t.split(" ") for d, t, _ in DOCS}
    req_by_doc = {d: r for d, _, r in DOCS}
    n = len(DOCS)
    avgdl = sum(len(t) for t in toks.values()) / n
    df = {}
    for t in toks.values():
        for term in set(t):
            df[term] = df.get(term, 0) + 1
    out = []
    for qid, terms in sets:
        terms = sorted(set(terms))
        hits = []
        for d, t in toks.items():
            matched = [w for w in terms if w in t]
            if not matched:
                continue
            need = req_by_doc[d] if msm_field else min(msm_min, len(terms))
            if len(matched) < max(need, 1):
                continue
            s = sum(
                score_py(t.count(w), df[w], len(t), n, avgdl) for w in matched
            )
            hits.append((round(s, 6), d))
        hits.sort(key=lambda x: (-x[0], x[1]))
        for rk, (s, d) in enumerate(hits[:k], 1):
            out.append((qid, d, s, rk))
    return sorted(out)


@pytest.mark.parametrize("codec", ["varint", "pfor"])
def test_index_matches_exhaustive(spark, codec):
    docs = _docs(spark)
    postings, meta = build_postings(docs, segment_size=2, codec=codec)
    a = _rows(terms_set_search(docs, SETS, k=5, msm_min=2))
    b = _rows(terms_set_search_index(spark, postings, meta, SETS, k=5, msm_min=2))
    assert a == b and len(a) > 0


@pytest.mark.parametrize("msm", [1, 2, 3])
def test_min_script_matches_brute_force(spark, msm):
    got = _rows(terms_set_search(_docs(spark), SETS, k=10, msm_min=msm))
    assert got == _brute(SETS, msm_min=msm)
    if msm == 2:
        # doc 2 has only 'alpha' (1 < 2); doc 0 only 'delta' for q2
        assert not [r for r in got if r[1] == 2]
        assert not [r for r in got if r[0] == 2 and r[1] == 0]
        assert [r for r in got if r[0] == 2 and r[1] == 4]  # delta+epsilon
    if msm == 1:
        assert [r for r in got if r[1] == 2]  # now admitted


def test_field_minimum_matches_brute_force(spark):
    docs = _docs(spark)
    got = _rows(
        terms_set_search(docs, SETS, k=10, msm_field="required_matches")
    )
    assert got == _brute(SETS, msm_field=True) and len(got) > 0
    # doc 5 (required 9) never matches; doc 1 (required 1) does
    assert not [r for r in got if r[1] == 5]
    assert [r for r in got if r[1] == 1]


def test_index_field_minimum_via_docvalues(spark):
    docs = _docs(spark)
    postings, meta = build_postings(docs, segment_size=2)
    dv = docs.select("doc_id", "required_matches")
    a = _rows(terms_set_search(docs, SETS, k=10, msm_field="required_matches"))
    b = _rows(
        terms_set_search_index(
            spark, postings, meta, SETS, k=10,
            msm_field="required_matches", docvalues=dv,
        )
    )
    assert a == b and len(a) > 0


def test_duplicate_terms_dedup_and_no_broadcast(spark):
    docs = _docs(spark)
    dup = [(1, ["alpha", "alpha", "beta"])]
    ded = [(1, ["alpha", "beta"])]
    a = _rows(terms_set_search(docs, dup, msm_min=2))
    b = _rows(terms_set_search(docs, ded, msm_min=2))
    assert a == b and len(a) > 0
    c = _rows(terms_set_search(docs, dup, msm_min=2, broadcast_queries=False))
    assert a == c


def test_guards(spark):
    docs = _docs(spark)
    with pytest.raises(ValueError, match="exactly one"):
        terms_set_search(docs, SETS)
    with pytest.raises(ValueError, match="exactly one"):
        terms_set_search(docs, SETS, msm_min=1, msm_field="required_matches")
    with pytest.raises(ValueError, match="msm_min"):
        terms_set_search(docs, SETS, msm_min=0)
    with pytest.raises(ValueError, match="not in docvalues"):
        terms_set_search(docs, SETS, msm_field="nope")
    postings, meta = build_postings(docs, segment_size=2)
    with pytest.raises(ValueError, match="doc-values sidecar"):
        terms_set_search_index(
            spark, postings, meta, SETS, msm_field="required_matches"
        )
    with pytest.raises(ValueError, match="empty query set"):
        terms_set_search(docs, [], msm_min=1)


# ---- DuckDB twin at gate rigor ---------------------------------------------


def test_duckdb_equality_real_corpus(spark):
    """terms_set over the real sf0.001 documents table (min-script
    spelling, minimum 2), index path vs a full DuckDB reimplementation
    — the gate-rigor evidence for the match-count + BM25-sum fold."""
    import duckdb

    import __spark_entry__ as entry
    from sgpt_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    docs = load_table(spark, sf, "documents")
    postings, meta = build_postings(docs, segment_size=200)
    sets = [
        (1, ["stream", "filter", "window"]),
        (2, ["hash", "merge", "zzz_absent"]),
        (3, ["agg"]),
    ]
    got = _rows(terms_set_search_index(spark, postings, meta, sets, k=10, msm_min=2))

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    sql = f"""
WITH {entry._TOKENS_CTE},
  stats AS (SELECT count(*) AS n, avg(doc_len) AS avgdl FROM doclen),
  qt(qid, term) AS (VALUES
    (1, 'stream'), (1, 'filter'), (1, 'window'),
    (2, 'hash'), (2, 'merge'), (2, 'zzz_absent'),
    (3, 'agg')),
  qmeta AS (SELECT qid, count(DISTINCT term) AS n_terms FROM qt GROUP BY qid),
  cand AS (
    SELECT q.qid, tf.doc_id, count(*) AS matched,
           round(sum(
             ln(1 + (s.n - tdf.df + 0.5) / (tdf.df + 0.5))
             * tf.tf / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.doc_len / s.avgdl))
           ), 6) AS score
    FROM (SELECT DISTINCT qid, term FROM qt) q
    JOIN tf ON q.term = tf.term
    JOIN tdf ON tf.term = tdf.term
    JOIN doclen dl ON tf.doc_id = dl.doc_id
    CROSS JOIN stats s
    GROUP BY q.qid, tf.doc_id
  )
SELECT qid, doc_id, score,
       CAST(row_number() OVER (PARTITION BY qid ORDER BY score DESC, doc_id ASC)
            AS INTEGER) AS rank
FROM cand JOIN qmeta USING (qid)
WHERE matched >= greatest(least(2, n_terms), 1)
QUALIFY rank <= 10
"""
    want = sorted(
        (int(q), d, float(s), int(rk))
        for q, d, s, rk in con.execute(sql).fetchall()
    )
    assert got == want and len(got) > 0
    # the msm=2 gate really bit: with minimum 1 the result is a superset
    got1 = _rows(terms_set_search_index(spark, postings, meta, sets, k=10, msm_min=1))
    assert {(q, d) for q, d, _, _ in got} <= {(q, d) for q, d, _, _ in got1}
    assert len(got1) > len(got) or got1 == got
