"""ES field collapsing: brute force over a scored relation (group
representative + collapsed page ranking, NULL-key self-collapse),
guards, gate equality vs DuckDB, and the near_dup_pairs_md5
displaced-row twin."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sgpt_spark.operators.collapse import collapse_search

pytestmark = pytest.mark.usefixtures("spark")

# (qid, doc_id, score); two queries; doc 5's key is NULL
SCORED = [
    (0, 1, 5.0), (0, 2, 4.0), (0, 3, 3.5), (0, 4, 3.0), (0, 5, 2.5),
    (0, 6, 2.0),
    (1, 2, 9.0), (1, 1, 9.0), (1, 6, 1.0),
]
KEYS = [(1, "a"), (2, "a"), (3, "b"), (4, "b"), (5, None), (6, "c")]


def _brute(k):
    key = dict(KEYS)
    by_q = {}
    for qid, doc, s in SCORED:
        by_q.setdefault(qid, []).append((round(s, 6), doc))
    out = []
    for qid, rows in by_q.items():
        rows.sort(key=lambda r: (-r[0], r[1]))
        seen, reps = set(), []
        for s, doc in rows:
            g = key[doc] if key[doc] is not None else f"\x00doc:{doc}"
            if g in seen:
                continue
            seen.add(g)
            reps.append((s, doc, key[doc]))
        for rk, (s, doc, kv) in enumerate(reps[:k], 1):
            out.append((qid, doc, kv, s, rk))
    return sorted(out, key=lambda r: (r[0], r[4]))


@pytest.mark.parametrize("k", [2, 10])
def test_brute_force(spark, k):
    scored = spark.createDataFrame(SCORED, "qid long, doc_id long, score double")
    dv = spark.createDataFrame(KEYS, "doc_id long, site string")
    got = sorted(
        (r["qid"], r["doc_id"], r["site"], round(r["score"], 6), r["rank"])
        for r in collapse_search(scored, dv, "site", k=k).collect()
    )
    assert got == sorted(_brute(k)) and got


def test_null_keys_self_collapse(spark):
    """Docs with a NULL collapse key are their own group (ES keeps them
    all), never merged with each other."""
    scored = spark.createDataFrame(
        [(0, 1, 3.0), (0, 2, 2.0), (0, 3, 1.0)],
        "qid long, doc_id long, score double",
    )
    dv = spark.createDataFrame(
        [(1, None), (2, None), (3, "x")], "doc_id long, site string"
    )
    res = collapse_search(scored, dv, "site", k=10).collect()
    assert len(res) == 3  # both NULL-key docs survive


def test_equal_scores_break_on_doc_id(spark):
    scored = spark.createDataFrame(SCORED, "qid long, doc_id long, score double")
    dv = spark.createDataFrame(KEYS, "doc_id long, site string")
    res = {
        r["rank"]: r["doc_id"]
        for r in collapse_search(scored, dv, "site", k=10)
        .filter(F.col("qid") == 1)
        .collect()
    }
    assert res[1] == 1  # 9.0 tie -> lower doc_id is the 'a' representative


def test_guards(spark):
    scored = spark.createDataFrame(SCORED, "qid long, doc_id long, score double")
    dv = spark.createDataFrame(KEYS, "doc_id long, site string")
    with pytest.raises(ValueError, match="collapse field"):
        collapse_search(scored, dv, "nope")
    with pytest.raises(ValueError, match="k must be"):
        collapse_search(scored, dv, "site", k=0)


def _duck(sf):
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    return con


def test_collapse_gate_duckdb_equality(spark):
    """Gate row bm25_collapse_top10: exact registry query vs exact
    registry SQL at sf0.001 (the driver repeats this at sf0.01)."""
    import __spark_entry__ as entry

    sf = "/root/testdata/sf0.001"
    got = sorted(
        (r["qid"], r["doc_id"], r["source"], round(r["score"], 6), r["rank"])
        for r in entry._q_bm25_collapse(spark, sf).collect()
    )
    want = sorted(
        (q, int(d), src, round(s, 6), int(rk))
        for q, d, src, s, rk in _duck(sf).execute(entry._COLLAPSE_SQL).fetchall()
    )
    assert got == want and len(got) > 0


def test_near_dup_md5_duckdb_equality(spark):
    """near_dup_pairs_md5 left the driver window for bm25_collapse_top10
    (round 5 — minhash_lsh_pairs_md5 keeps the near-dup evidence gated);
    exact registry query vs exact registry SQL at sf0.001."""
    import __spark_entry__ as entry

    sf = "/root/testdata/sf0.001"
    df = entry._q_near_dup_md5(spark, sf)
    cols = sorted(df.columns)
    got = sorted(
        tuple(round(r[c], 6) if isinstance(r[c], float) else r[c] for c in cols)
        for r in df.collect()
    )
    ores = _duck(sf).execute(entry._NEAR_DUP_MD5_SQL).fetchdf()
    assert sorted(ores.columns.tolist()) == cols
    want = sorted(
        tuple(
            round(row[c], 6) if isinstance(row[c], float) else int(row[c])
            for c in cols
        )
        for _, row in ores.iterrows()
    )
    assert got == want and len(got) > 0
