"""ES more_like_this: from-scratch Python brute force (term selection
tf*idf + rounded tie-break, percentage minimum_should_match, seed
exclusion), ES-default knobs, guards, gate equality vs DuckDB, and the
ngram_jaccard_pairs displaced-row twin."""

from __future__ import annotations

import math

import pytest

from oracle.bm25_oracle import bm25_index, bm25_score, tokenize_ws
from sgpt_spark.operators.indexer import build_postings
from sgpt_spark.operators.mlt import interesting_terms, more_like_this_index

pytestmark = pytest.mark.usefixtures("spark")

# corpus with shared vocabulary clusters so MLT has real neighbors:
# docs 0-2 are the 'quick brown' cluster, 3-5 the 'lazy dog' cluster,
# 6-7 noise. seeds = docs 0 and 3.
DOCS = [
    (0, "quick brown fox quick brown jumps high quick"),
    (1, "quick brown dance quick steps brown"),
    (2, "brown fox quick runs brown paths"),
    (3, "lazy dog sleeps lazy days dog naps lazy"),
    (4, "dog lazy dreams dog bones lazy"),
    (5, "lazy dog walks lazy parks"),
    (6, "unrelated words only here"),
    (7, "more filler text entirely different"),
]
SCHEMA = "doc_id long, text string"
SEEDS = [(0, 0), (3, 3)]


def _brute_mlt(k, max_query_terms, min_tf, min_df, pct):
    idx = bm25_index({str(d): t for d, t in DOCS}, tokenize_ws)
    out = []
    for qid, seed in SEEDS:
        tf = idx["tfs"][str(seed)]
        cands = []
        for term, f in tf.items():
            d = idx["df"][term]
            if f < min_tf or d < min_df:
                continue
            idf = math.log(1.0 + (idx["n"] - d + 0.5) / (d + 0.5))
            cands.append((round(f * idf, 6), term))
        cands.sort(key=lambda x: (-x[0], x[1]))
        sel = [t for _, t in cands[:max_query_terms]]
        if not sel:
            continue
        req = max(1, math.floor(len(sel) * pct / 100.0))
        scored = []
        for d in idx["tfs"]:
            if int(d) == seed:
                continue
            nm = sum(1 for t in sel if idx["tfs"][d].get(t, 0) > 0)
            if nm < req:
                continue
            s = bm25_score(idx, sel, d)
            if s <= 0:
                continue
            scored.append((round(s, 6), -int(d)))
        scored.sort(reverse=True)
        for rk, (s, nd) in enumerate(scored[:k], 1):
            out.append((qid, -nd, s, rk))
    return sorted(out)


def _build(spark):
    docs = spark.createDataFrame(DOCS, SCHEMA)
    postings, meta = build_postings(docs.repartition(3), segment_size=3)
    seeds = spark.createDataFrame(SEEDS, "qid long, doc_id long")
    return docs, postings, meta, seeds


@pytest.mark.parametrize(
    "kw",
    [
        dict(max_query_terms=25, min_term_freq=2, min_doc_freq=2, min_should_pct=30),
        dict(max_query_terms=2, min_term_freq=1, min_doc_freq=1, min_should_pct=100),
        dict(max_query_terms=25, min_term_freq=1, min_doc_freq=1, min_should_pct=0),
    ],
)
def test_brute_force(spark, kw):
    docs, postings, meta, seeds = _build(spark)
    got = sorted(
        (r["qid"], r["doc_id"], r["score"], r["rank"])
        for r in more_like_this_index(
            spark, postings, meta, docs, seeds, k=5, **kw
        ).collect()
    )
    want = _brute_mlt(
        5, kw["max_query_terms"], kw["min_term_freq"], kw["min_doc_freq"],
        kw["min_should_pct"],
    )
    assert got == want and got


def test_seed_never_in_results(spark):
    docs, postings, meta, seeds = _build(spark)
    res = more_like_this_index(
        spark, postings, meta, docs, seeds, k=8,
        min_term_freq=1, min_doc_freq=1,
    ).collect()
    assert all(r["doc_id"] != r["qid"] for r in res) and res


def test_interesting_terms_selection(spark):
    """Term selection: tf*idf rounded then (desc, term asc); min_tf and
    min_df prune; max_query_terms caps."""
    from pyspark.sql import functions as F

    docs, postings, meta, seeds = _build(spark)
    dfs = postings.groupBy("term").agg(F.sum("df").alias("df"))
    sel = interesting_terms(
        docs, seeds, meta, dfs, max_query_terms=2,
        min_term_freq=2, min_doc_freq=1,
    ).collect()
    by_qid = {}
    for r in sel:
        by_qid.setdefault(r["qid"], []).append((r["term_rank"], r["term"]))
    # seed 0: tf>=2 terms are quick(tf 3) and brown(tf 2), both df=3 ->
    # quick's higher tf wins rank 1
    assert sorted(by_qid[0]) == [(1, "quick"), (2, "brown")]
    # seed 3: lazy(tf 3), dog(tf 2); lazy higher tf -> rank 1
    assert sorted(by_qid[3]) == [(1, "lazy"), (2, "dog")]


def test_cluster_recovery(spark):
    """MLT's headline behavior: each seed's nearest docs are its own
    vocabulary cluster."""
    docs, postings, meta, seeds = _build(spark)
    res = more_like_this_index(
        spark, postings, meta, docs, seeds, k=2,
        min_term_freq=2, min_doc_freq=2,
    ).collect()
    got = {(r["qid"], r["rank"]): r["doc_id"] for r in res}
    assert {got[(0, 1)], got[(0, 2)]} == {1, 2}
    assert {got[(3, 1)], got[(3, 2)]} == {4, 5}


def test_guards(spark):
    docs, postings, meta, seeds = _build(spark)
    with pytest.raises(ValueError, match="min_should_pct"):
        more_like_this_index(
            spark, postings, meta, docs, seeds, min_should_pct=101
        )
    with pytest.raises(ValueError, match="max_query_terms"):
        more_like_this_index(
            spark, postings, meta, docs, seeds, max_query_terms=0
        )


def _duck(sf):
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    return con


def test_mlt_gate_duckdb_equality(spark):
    """Gate row more_like_this_top10: exact registry query vs exact
    registry SQL at sf0.001 (the driver repeats this at sf0.01)."""
    import __spark_entry__ as entry

    sf = "/root/testdata/sf0.001"
    got = sorted(
        (r["qid"], r["doc_id"], r["score"], r["rank"])
        for r in entry._q_more_like_this(spark, sf).collect()
    )
    want = sorted(
        (q, int(d), s, int(rk))
        for q, d, s, rk in _duck(sf).execute(entry._MLT_SQL).fetchall()
    )
    assert got == want and len(got) > 0


def test_ngram_jaccard_duckdb_equality(spark):
    """ngram_jaccard_pairs left the driver window for more_like_this_top10
    (round 5); exact registry query vs exact registry SQL at sf0.001."""
    import __spark_entry__ as entry

    sf = "/root/testdata/sf0.001"
    df = entry._q_ngram_jaccard(spark, sf)
    cols = sorted(df.columns)
    got = sorted(
        tuple(round(r[c], 6) if isinstance(r[c], float) else r[c] for c in cols)
        for r in df.collect()
    )
    ores = _duck(sf).execute(entry._NGRAM_SQL).fetchdf()
    assert sorted(ores.columns.tolist()) == cols
    want = sorted(
        tuple(
            round(row[c], 6) if isinstance(row[c], float) else int(row[c])
            for c in cols
        )
        for _, row in ores.iterrows()
    )
    assert got == want and len(got) > 0


def test_mlt_cogroup_matches_relational(spark):
    """r6: the default cogroup-kernel strategy is value-identical to
    the pinned relational spelling (the r5 path) on the gate shape."""
    from sgpt_spark.operators.indexer import build_postings
    from sgpt_spark.operators.mlt import more_like_this_index
    from sgpt_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.001"
    docs = load_table(spark, sf, "documents")
    postings, meta = build_postings(docs, segment_size=200)
    seeds = docs.select(F.col("doc_id").alias("qid"), "doc_id").limit(20)
    a = sorted(map(tuple, more_like_this_index(
        spark, postings, meta, docs, seeds, k=10).collect()))
    b = sorted(map(tuple, more_like_this_index(
        spark, postings, meta, docs, seeds, k=10,
        strategy="relational").collect()))
    assert a == b and len(a) > 0
