"""ES function_score (field_value_factor): brute force vs the operator
(reusing oracle/bm25_oracle for the BM25 half), the applies-before-
top-k semantic (a low-BM25/high-field doc must enter page 1), modifier
family, boost modes, missing handling, guards, gate equality vs
DuckDB, and the bm25_rerank_top10 displaced-row twin."""

from __future__ import annotations

import math

import pytest

from oracle.bm25_oracle import bm25_index, bm25_score, tokenize_ws
from sgpt_spark.operators.funcscore import function_score_index, match_scores
from sgpt_spark.operators.indexer import build_postings_with_docvalues

pytestmark = pytest.mark.usefixtures("spark")

# doc 2 repeats 'quick' (high tf -> top BM25) but has a tiny n_chars;
# doc 5 mentions it once with a huge n_chars — function_score must
# promote doc 5 over doc 2, which top-k-then-multiply would NOT do
# at k=1.
DOCS = [
    (0, "quick brown fox", "en", 150),
    (1, "quick dog", "en", 40),
    (2, "quick quick quick quick", "es", 2),
    (3, "lazy dog sleeps", "es", 155),
    (4, "a cat", "fr", 30),
    (5, "brown bear quick", None, 50000),
    (6, "unrelated words only", "de", 99),
    (7, "quick brown dance", "en", 41),
]
SCHEMA = "doc_id long, text string, lang string, n_chars long"
QUERIES = [(100, "quick"), (101, "brown dog"), (102, "absentterm")]

_MODS = {
    "none": lambda x: x,
    "log1p": lambda x: math.log10(1.0 + x),
    "ln1p": lambda x: math.log1p(x),
    "sqrt": math.sqrt,
    "square": lambda x: x * x,
    "reciprocal": lambda x: 1.0 / x,
}


def _brute(modifier, factor, boost_mode, k, missing=1.0):
    idx = bm25_index({str(d): t for d, t, *_ in DOCS}, tokenize_ws)
    ncs = {str(d[0]): d[3] for d in DOCS}
    out = []
    for qid, q in QUERIES:
        qts = tokenize_ws(q)
        scored = []
        for d in idx["tfs"]:
            s = bm25_score(idx, qts, d)
            if s <= 0:
                continue
            fv = ncs[d] if ncs[d] is not None else missing
            fn = _MODS[modifier](fv * factor)
            s2 = s * fn if boost_mode == "multiply" else s + fn
            scored.append((round(s2, 6), -int(d)))
        scored.sort(reverse=True)
        for rk, (s2, nd) in enumerate(scored[:k], 1):
            out.append((qid, -nd, s2, rk))
    return sorted(out)


def _build(spark):
    docs = spark.createDataFrame(DOCS, SCHEMA)
    postings, dv, meta = build_postings_with_docvalues(
        docs.repartition(3), ["lang", "n_chars"], segment_size=3
    )
    qs = spark.createDataFrame(QUERIES, "qid long, query string")
    return postings, dv, meta, qs


@pytest.mark.parametrize("modifier", list(_MODS))
@pytest.mark.parametrize("boost_mode", ["multiply", "sum"])
def test_brute_force_all_modifiers(spark, modifier, boost_mode):
    postings, dv, meta, qs = _build(spark)
    got = sorted(
        (r["qid"], r["doc_id"], r["score"], r["rank"])
        for r in function_score_index(
            spark, postings, meta, qs, dv, "n_chars",
            factor=0.5, modifier=modifier, boost_mode=boost_mode, k=4,
        ).collect()
    )
    assert got == _brute(modifier, 0.5, boost_mode, 4) and got


def test_function_applies_before_topk(spark):
    """The semantic that makes function_score a QUERY, not a reranker:
    doc 5 (BM25 rank >1 for 'quick', n_chars 50000) must take rank 1
    under multiply/log1p — top-k-then-multiply at k=1 would keep the
    high-tf doc 2."""
    postings, dv, meta, qs = _build(spark)
    res = {
        (r["qid"], r["rank"]): r["doc_id"]
        for r in function_score_index(
            spark, postings, meta, qs, dv, "n_chars",
            modifier="log1p", k=1,
        ).collect()
    }
    assert res[(100, 1)] == 5
    # sanity: plain BM25 ranks doc 2 first for 'quick'
    plain = sorted(
        (r["score"], r["doc_id"])
        for r in match_scores(
            spark, postings, meta,
            qs.filter("qid = 100"),
        ).collect()
    )
    assert plain[-1][1] == 2


def test_match_scores_is_full_set(spark):
    """match_scores carries EVERY matching (query, doc) pair — the
    no-cut relation a rescoring query needs."""
    postings, dv, meta, qs = _build(spark)
    got = {(r["qid"], r["doc_id"]) for r in match_scores(spark, postings, meta, qs).collect()}
    idx = bm25_index({str(d): t for d, t, *_ in DOCS}, tokenize_ws)
    want = set()
    for qid, q in QUERIES:
        for d in idx["tfs"]:
            if bm25_score(idx, tokenize_ws(q), d) > 0:
                want.add((qid, int(d)))
    assert got == want and got


def test_guards(spark):
    postings, dv, meta, qs = _build(spark)
    with pytest.raises(ValueError, match="unknown modifier"):
        function_score_index(spark, postings, meta, qs, dv, "n_chars", modifier="exp")
    with pytest.raises(ValueError, match="unknown boost_mode"):
        function_score_index(spark, postings, meta, qs, dv, "n_chars", boost_mode="max")
    with pytest.raises(ValueError, match="not in docvalues columns"):
        function_score_index(spark, postings, meta, qs, dv, "nope")


def _duck(sf):
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    return con


def test_function_score_gate_duckdb_equality(spark):
    """Gate row function_score_top10: exact registry query vs exact
    registry SQL at sf0.001 (the driver repeats this at sf0.01)."""
    import __spark_entry__ as entry

    sf = "/root/testdata/sf0.001"
    got = sorted(
        (r["qid"], r["doc_id"], r["score"], r["rank"])
        for r in entry._q_function_score(spark, sf).collect()
    )
    want = sorted(
        (q, int(d), s, int(rk))
        for q, d, s, rk in _duck(sf)
        .execute(entry._FUNCTION_SCORE_SQL)
        .fetchall()
    )
    assert got == want and len(got) > 0


def test_rerank_top10_duckdb_equality(spark):
    """bm25_rerank_top10 left the driver window for function_score_top10
    (round 5); exact registry query vs exact registry SQL at sf0.001."""
    import __spark_entry__ as entry

    sf = "/root/testdata/sf0.001"
    df = entry._q_rerank(spark, sf)
    cols = sorted(df.columns)
    got = sorted(
        tuple(round(r[c], 6) if isinstance(r[c], float) else r[c] for c in cols)
        for r in df.collect()
    )
    ores = _duck(sf).execute(entry._RERANK_SQL).fetchdf()
    assert sorted(ores.columns.tolist()) == cols
    want = sorted(
        tuple(
            round(row[c], 6) if isinstance(row[c], float) else int(row[c])
            for c in cols
        )
        for _, row in ores.iterrows()
    )
    assert got == want and len(got) > 0
