"""The FULL ES function_score request (operators/funcscore.py
function_score_multi): decay functions (gauss/exp/linear) pinned to
the Lucene DecayFunction math, random_score's md5-arithmetic spelling
pinned to DuckDB, script_score anchored to the plain match page,
multi-function score_mode x boost_mode combination vs an independent
python brute force (reusing oracle/bm25_oracle for the BM25 half),
max_boost / min_score / weighted-avg / filter-gating semantics, and
the request-shape guards."""

from __future__ import annotations

import hashlib
import math

import pytest

from oracle.bm25_oracle import bm25_index, bm25_score, tokenize_ws
from sgpt_spark.operators.funcscore import (
    DECAY_KINDS,
    FULL_BOOST_MODES,
    SCORE_MODES,
    decay_col,
    function_score_multi,
    random_score_col,
)
from sgpt_spark.operators.indexer import build_postings_with_docvalues

pytestmark = pytest.mark.usefixtures("spark")

# doc 8 has a NULL n_chars (the decay missing-field rule); doc 5 a NULL
# lang (filters never match NULL).
DOCS = [
    (0, "quick brown fox", "en", 150),
    (1, "quick dog", "en", 40),
    (2, "quick quick quick quick", "es", 2),
    (3, "lazy dog sleeps", "es", 155),
    (4, "a cat", "fr", 30),
    (5, "brown bear quick", None, 50000),
    (6, "unrelated words only", "de", 99),
    (7, "quick brown dance", "en", 41),
    (8, "quick brown sparrow", "en", None),
]
SCHEMA = "doc_id long, text string, lang string, n_chars long"
QUERIES = [(100, "quick"), (101, "brown dog"), (102, "absentterm")]

# the request under test: one of each function kind, two filtered
FUNCTIONS = [
    {
        "field_value_factor": {"field": "n_chars", "modifier": "log1p", "missing": 7.0},
        "weight": 2.0,
        "filter": "lang = 'en'",
    },
    {"gauss": {"field": "n_chars", "origin": 100.0, "scale": 500.0, "decay": 0.4}},
    {"random_score": {"seed": "7"}, "weight": 3.0},
    {"weight": 0.5, "filter": "lang = 'es'"},
]


def _build(spark):
    docs = spark.createDataFrame(DOCS, SCHEMA)
    postings, dv, meta = build_postings_with_docvalues(
        docs.repartition(3), ["lang", "n_chars"], segment_size=3
    )
    qs = spark.createDataFrame(QUERIES, "qid long, query string")
    return postings, dv, meta, qs


# ---- independent python mirrors ---------------------------------------------


def _rand01(doc_id, seed) -> float:
    h = hashlib.md5(f"{doc_id}:rs:{seed}".encode()).hexdigest()
    return int(h[:8], 16) / 2**32


def _decay_py(kind, x, origin, scale, offset=0.0, decay=0.5) -> float:
    dist = max(abs(x - origin) - offset, 0.0)
    if kind == "gauss":
        sigma_sq = -(scale * scale) / (2.0 * math.log(decay))
        return math.exp(-(dist * dist) / (2.0 * sigma_sq))
    if kind == "exp":
        return math.exp(dist * (math.log(decay) / scale))
    s = scale / (1.0 - decay)
    return max((s - dist) / s, 0.0)


def _fn_values(doc):
    """(value*weight, applicable, weight) per FUNCTIONS entry, python."""
    doc_id, _, lang, n_chars = doc
    fvf_in = (n_chars if n_chars is not None else 7.0) * 1.0
    return [
        (math.log10(1.0 + fvf_in) * 2.0, lang == "en", 2.0),
        (
            (1.0 if n_chars is None else _decay_py("gauss", n_chars, 100.0, 500.0, decay=0.4)),
            True,
            1.0,
        ),
        (_rand01(doc_id, "7") * 3.0, True, 3.0),
        (0.5, lang == "es", 0.5),
    ]


def _combine_py(parts, score_mode):
    hits = [(v, w) for v, a, w in parts if a]
    if not hits:
        return 1.0
    if score_mode == "multiply":
        out = 1.0
        for v, _ in hits:
            out *= v
        return out
    if score_mode == "sum":
        return sum(v for v, _ in hits)
    if score_mode == "avg":
        return sum(v for v, _ in hits) / sum(w for _, w in hits)
    if score_mode == "first":
        return hits[0][0]
    return (max if score_mode == "max" else min)(v for v, _ in hits)


def _brute(score_mode, boost_mode, k, max_boost=None, min_score=None, boost=1.0):
    idx = bm25_index({str(d[0]): d[1] for d in DOCS}, tokenize_ws)
    by_id = {d[0]: d for d in DOCS}
    out = []
    for qid, q in QUERIES:
        qts = tokenize_ws(q)
        scored = []
        for d in idx["tfs"]:
            s = bm25_score(idx, qts, d)
            if s <= 0:
                continue
            fs = _combine_py(_fn_values(by_id[int(d)]), score_mode)
            if max_boost is not None:
                fs = min(fs, max_boost)
            qs2 = s * boost
            final = {
                "multiply": qs2 * fs,
                "replace": fs,
                "sum": qs2 + fs,
                "avg": (qs2 + fs) / 2.0,
                "max": max(qs2, fs),
                "min": min(qs2, fs),
            }[boost_mode]
            if min_score is not None and final < min_score:
                continue
            scored.append((round(final, 6), -int(d)))
        scored.sort(reverse=True)
        for rk, (s2, nd) in enumerate(scored[:k], 1):
            out.append((qid, -nd, s2, rk))
    return sorted(out)


def _run(spark, **kw):
    postings, dv, meta, qs = _build(spark)
    return sorted(
        (r["qid"], r["doc_id"], r["score"], r["rank"])
        for r in function_score_multi(
            spark, postings, meta, qs, dv, FUNCTIONS, k=kw.pop("k", 5), **kw
        ).collect()
    )


# ---- decay math, pinned ------------------------------------------------------


@pytest.mark.parametrize("kind", DECAY_KINDS)
def test_decay_math_pinned(spark, kind):
    import pyspark.sql.functions as F

    xs = [0.0, 40.0, 90.0, 100.0, 110.0, 160.0, 400.0, 1000.0]
    df = spark.createDataFrame([(x,) for x in xs], "x double").select(
        "x",
        decay_col(kind, F.col("x"), origin=100.0, scale=50.0, offset=10.0, decay=0.3).alias("d"),
    )
    got = {r["x"]: r["d"] for r in df.collect()}
    for x in xs:
        assert got[x] == pytest.approx(
            _decay_py(kind, x, 100.0, 50.0, offset=10.0, decay=0.3), rel=1e-12
        )
    # inside the offset the function is exactly 1; at offset+scale exactly decay
    assert got[100.0] == 1.0 and got[110.0] == 1.0
    assert got[160.0] == pytest.approx(0.3, rel=1e-9)
    # monotone non-increasing with distance
    assert got[400.0] >= got[1000.0]


def test_decay_guards(spark):
    import pyspark.sql.functions as F

    with pytest.raises(ValueError, match="decay kind"):
        decay_col("sigmoid", F.col("x"), 0, 1)
    with pytest.raises(ValueError, match="scale"):
        decay_col("gauss", F.col("x"), 0, 0.0)
    with pytest.raises(ValueError, match="decay must be"):
        decay_col("gauss", F.col("x"), 0, 1.0, decay=1.0)


# ---- combination matrix vs brute force --------------------------------------


@pytest.mark.parametrize("score_mode", SCORE_MODES)
def test_score_modes_vs_brute(spark, score_mode):
    got = _run(spark, score_mode=score_mode, boost_mode="sum")
    assert got == _brute(score_mode, "sum", 5) and got


@pytest.mark.parametrize("boost_mode", FULL_BOOST_MODES)
def test_boost_modes_vs_brute(spark, boost_mode):
    got = _run(spark, score_mode="multiply", boost_mode=boost_mode)
    assert got == _brute("multiply", boost_mode, 5) and got


def test_max_boost_min_score_boost(spark):
    got = _run(
        spark, score_mode="sum", boost_mode="multiply",
        max_boost=2.5, min_score=0.8, boost=1.5,
    )
    want = _brute("sum", "multiply", 5, max_boost=2.5, min_score=0.8, boost=1.5)
    assert got == want and got
    # the bar really excluded something
    assert len(got) < len(
        _brute("sum", "multiply", 5, max_boost=2.5, boost=1.5)
    )


def test_decay_missing_field_scores_one(spark):
    """Doc 8 (NULL n_chars) under a lone gauss function: fs == 1, so
    replace-mode score is exactly 1 for it."""
    postings, dv, meta, qs = _build(spark)
    rows = {
        r["doc_id"]: r["score"]
        for r in function_score_multi(
            spark, postings, meta, qs, dv,
            [{"gauss": {"field": "n_chars", "origin": 100.0, "scale": 500.0}}],
            boost_mode="replace", k=9,
        ).filter("qid = 100").collect()
    }
    assert rows[8] == 1.0 and 8 in rows


def test_script_score_replace_is_plain_page(spark):
    """script_score '_score' + boost_mode=replace must reproduce the
    plain BM25 page exactly — the script sees the query score."""
    from sgpt_spark.operators.index_search import search_index

    postings, dv, meta, qs = _build(spark)
    got = sorted(
        (r["qid"], r["doc_id"], r["score"], r["rank"])
        for r in function_score_multi(
            spark, postings, meta, qs, dv,
            [{"script_score": {"source": "_score"}}],
            boost_mode="replace", k=4,
        ).collect()
    )
    want = sorted(
        (r["qid"], r["doc_id"], r["score"], r["rank"])
        for r in search_index(
            spark, postings, meta, QUERIES, k=4
        ).select("qid", "doc_id", "score", "rank").collect()
    )
    assert got == want and got


def test_random_score_duckdb_identity(spark):
    """The md5-arithmetic random column is bit-identical in DuckDB."""
    import duckdb
    import pyspark.sql.functions as F

    ids = [(i,) for i in range(50)]
    got = {
        r["doc_id"]: r["rs"]
        for r in spark.createDataFrame(ids, "doc_id long")
        .select("doc_id", random_score_col(F.col("doc_id"), "42").alias("rs"))
        .collect()
    }
    con = duckdb.connect()
    want = dict(
        con.execute(
            "SELECT i, CAST(('0x' || substring(md5(i || ':rs:42'), 1, 8)) AS UBIGINT)"
            " / 4294967296.0 FROM range(50) t(i)"
        ).fetchall()
    )
    assert got == {k: want[k] for k in got} and len(got) == 50
    assert all(0.0 <= v < 1.0 for v in got.values())
    # python mirror agrees too
    assert got[7] == _rand01(7, "42")


def test_function_score_multi_duckdb_equality(spark):
    """Registered row function_score_multi_topk at gate rigor: exact
    registry query vs exact registry SQL at sf0.001 — the whole
    three-function chain (gauss + filtered fvf + random) is one IEEE
    arithmetic chain DuckDB reproduces bit-for-bit before the 6-dp
    ranking round."""
    import duckdb

    import __spark_entry__ as entry

    sf = "/root/testdata/sf0.001"
    got = sorted(
        (r["qid"], r["doc_id"], r["score"], r["rank"])
        for r in entry._q_function_score_multi(spark, sf).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    want = sorted(
        (q, int(d), s, int(rk))
        for q, d, s, rk in con.execute(entry._FUNCTION_SCORE_MULTI_SQL).fetchall()
    )
    assert got == want and len(got) > 0


def test_request_guards(spark):
    postings, dv, meta, qs = _build(spark)

    def run(fns, **kw):
        function_score_multi(spark, postings, meta, qs, dv, fns, **kw)

    with pytest.raises(ValueError, match="score_mode"):
        run(FUNCTIONS, score_mode="prod")
    with pytest.raises(ValueError, match="boost_mode"):
        run(FUNCTIONS, boost_mode="mean")
    with pytest.raises(ValueError, match="at least one"):
        run([])
    with pytest.raises(ValueError, match="at most one function type"):
        run([{"gauss": {"field": "n_chars", "origin": 0, "scale": 1},
              "random_score": {"seed": 1}}])
    with pytest.raises(ValueError, match="unknown keys"):
        run([{"gaussian": {"field": "n_chars"}}])
    with pytest.raises(ValueError, match="needs a function type"):
        run([{"filter": "lang = 'en'"}])
    with pytest.raises(ValueError, match="not in docvalues columns"):
        run([{"gauss": {"field": "nope", "origin": 0, "scale": 1}}])
