"""ES percolate (operators/percolate.py): from-scratch brute force over
stored match queries x incoming docs, the operator/msm bars, the
and-with-duplicate-clause semantics, broadcast/no-broadcast identity,
and a DuckDB twin at gate rigor over the real sf0.001 documents
corpus."""

from __future__ import annotations

import pytest

from sgpt_spark.operators.percolate import percolate

pytestmark = pytest.mark.usefixtures("spark")

DOCS = [
    (0, "error disk full on node seven"),
    (1, "login failed for admin"),
    (2, "disk almost full warning"),
    (3, "all systems nominal"),
    (4, "error error timeout"),  # repeated doc token (distinct once)
]

RULES = [
    (10, "error"),
    (11, "disk full"),
    (12, "login failed admin"),
    (13, "error timeout error"),  # duplicate clause: qtf(error)=2
    (14, "absentword"),
]


def _docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def _rows(df):
    return sorted(
        (r["doc_id"], r["qid"], r["matched"]) for r in df.collect()
    )


def _brute(msm=0, operator="or"):
    toks = {d: set(t.split()) for d, t in DOCS}
    out = []
    for qid, q in RULES:
        clauses: dict = {}
        for w in q.split():
            clauses[w] = clauses.get(w, 0) + 1
        total = sum(clauses.values())
        for d, ts in toks.items():
            matched = sum(qtf for w, qtf in clauses.items() if w in ts)
            if matched == 0:
                continue
            need = total if operator == "and" else msm
            if matched >= need:
                out.append((d, qid, matched))
    return sorted(out)


def test_or_matches_brute_force(spark):
    got = _rows(percolate(RULES, _docs(spark)))
    assert got == _brute() and len(got) > 0
    # rule 14 never fires; doc 3 fires nothing
    assert not [r for r in got if r[1] == 14]
    assert not [r for r in got if r[0] == 3]
    # duplicate clause: doc 4 matches rule 13 with qtf(error)=2 + timeout
    assert (4, 13, 3) in got


@pytest.mark.parametrize("msm", [2, 3])
def test_minimum_should_match(spark, msm):
    got = _rows(percolate(RULES, _docs(spark), minimum_should_match=msm))
    assert got == _brute(msm=msm)
    if msm == 2:
        # doc 0 matches rule 11 on both terms; doc 2 too
        assert (0, 11, 2) in got and (2, 11, 2) in got
        # doc 0 matches rule 13 only via 'error' (1 clause) -> dropped
        assert not [r for r in got if r == (0, 13, 1)]


def test_operator_and(spark):
    got = _rows(percolate(RULES, _docs(spark), operator="and"))
    assert got == _brute(operator="and") and len(got) > 0
    # rule 12 needs all three terms: only doc 1
    assert [r for r in got if r[1] == 12] == [(1, 12, 3)]
    # rule 13 needs error x2 + timeout: doc 4's single distinct 'error'
    # still satisfies both duplicate clauses (the ES clause convention)
    assert (4, 13, 3) in got
    assert not [r for r in got if r[0] == 0 and r[1] == 13]


def test_broadcast_identity(spark):
    a = _rows(percolate(RULES, _docs(spark), minimum_should_match=2))
    b = _rows(
        percolate(RULES, _docs(spark), minimum_should_match=2,
                  broadcast_queries=True)
    )
    assert a == b


# ---- DuckDB twin at gate rigor ---------------------------------------------


def test_duckdb_equality_real_corpus(spark):
    """Percolate the real sf0.001 documents against derived stored
    queries (each doc's own flagship query text — the queryset CTE),
    msm=2, checked row-for-row against a DuckDB reimplementation."""
    import duckdb

    import __spark_entry__ as entry
    from sgpt_spark.sources.queryset import QUERIES_SQL, derived_queries
    from sgpt_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    docs = load_table(spark, sf, "documents")
    # deterministic 50-rule subset (qid = doc_id, every 10th doc)
    rules = derived_queries(docs).filter("qid < 500")
    got = _rows(percolate(rules, docs, minimum_should_match=2))

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    sql = f"""
WITH {entry._TOKENS_CTE},
  queryset AS (SELECT * FROM ({QUERIES_SQL}) WHERE qid < 500),
  qterms AS (
    SELECT qid, u.term AS term, count(*) AS qtf
    FROM queryset, unnest(string_split(query, ' ')) AS u(term)
    WHERE u.term <> '' GROUP BY qid, u.term
  ),
  dterms AS (SELECT DISTINCT doc_id, term FROM terms)
SELECT doc_id, qid, matched FROM (
  SELECT d.doc_id, q.qid, sum(q.qtf) AS matched
  FROM dterms d JOIN qterms q ON d.term = q.term
  GROUP BY d.doc_id, q.qid
) WHERE matched >= 2
"""
    want = sorted(
        (d, int(q), int(m)) for d, q, m in con.execute(sql).fetchall()
    )
    assert got == want and len(got) > 0
