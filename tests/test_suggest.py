"""ES term suggester: from-scratch Python brute force (classical
Levenshtein, similarity/df/term ordering, all three suggest_modes),
guards, gate equality vs DuckDB, and the cosine_topk displaced-row
twin."""

from __future__ import annotations

import pytest

from sgpt_spark.operators.suggest import term_suggest

pytestmark = pytest.mark.usefixtures("spark")

# dictionary with clusters at edit distance 1-2 of the probe tokens,
# plus decoys differing in the first char (pruned by prefix_length=1)
# and far-away terms (pruned by max_edits).
DICT = [
    ("search", 40),
    ("seared", 25),
    ("soared", 10),
    ("sparse", 5),
    ("spark", 30),
    ("sharks", 30),  # same df as spark: term-asc tie-break via score
    ("march", 50),   # first char differs from 'search' probes
    ("parch", 50),
    ("retrieval", 8),
    ("retrieve", 12),
    ("quality", 9),
]
DICT_SCHEMA = "term string, df long"


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _brute(tokens, size, max_edits, prefix_length, min_word_length, mode):
    by_df = dict(DICT)
    out = []
    for tok in set(tokens):
        if len(tok) < min_word_length:
            continue
        tok_df = by_df.get(tok)
        if mode == "missing" and tok_df is not None:
            continue
        cands = []
        for term, df in DICT:
            if term == tok or term[:prefix_length] != tok[:prefix_length]:
                continue
            if abs(len(term) - len(tok)) > max_edits:
                continue
            ed = _lev(term, tok)
            if ed > max_edits:
                continue
            if mode == "popular" and df <= (tok_df or 0):
                continue
            score = 1.0 - ed / min(len(tok), len(term))
            cands.append((-score, -df, term, score, df))
        cands.sort()
        for rk, (_, _, term, score, df) in enumerate(cands[:size], 1):
            out.append((tok, term, round(score, 6), df, rk))
    return sorted(out)


def _run(spark, tokens, **kw):
    ts = spark.createDataFrame(DICT, DICT_SCHEMA)
    td = spark.createDataFrame([(t,) for t in tokens], "token string")
    res = term_suggest(ts, td, **kw).collect()
    return sorted(
        (r["token"], r["suggestion"], round(r["score"], 6), r["doc_freq"],
         r["suggest_rank"])
        for r in res
    )


@pytest.mark.parametrize("mode", ["missing", "popular", "always"])
@pytest.mark.parametrize("max_edits,prefix_length", [(2, 1), (1, 1), (2, 0)])
def test_brute_force(spark, mode, max_edits, prefix_length):
    # 'searc' (missing, 1-edit of search/seared...), 'spark' (IN dict:
    # dropped by missing, kept by popular/always), 'sparc' (missing),
    # 'retrieva' (missing), 'xyz' (below min_word_length)
    tokens = ["searc", "spark", "sparc", "retrieva", "xyz"]
    kw = dict(size=3, max_edits=max_edits, prefix_length=prefix_length,
              min_word_length=4, suggest_mode=mode)
    got = _run(spark, tokens, **kw)
    want = _brute(tokens, 3, max_edits, prefix_length, 4, mode)
    assert got == want and got


def test_ordering_similarity_then_df_then_term(spark):
    """'sparc': spark (ed1) outranks sparse (ed2) despite df; equal
    score+df falls to term asc."""
    got = _run(spark, ["sparc"], size=5, suggest_mode="missing")
    ranked = [(r[1], r[4]) for r in sorted(got, key=lambda r: r[4])]
    assert ranked[0] == ("spark", 1)
    # sharks/spark have df 30 but different ed -> spark first already;
    # verify scores are non-increasing and ties break on suggestion asc
    rows = sorted(got, key=lambda r: r[4])
    for a, b in zip(rows, rows[1:]):
        assert (a[2], a[3], [b[1]]) >= (b[2], b[3], [a[1]]) or a[2] > b[2] or (
            a[2] == b[2] and (a[3] > b[3] or (a[3] == b[3] and a[1] < b[1]))
        )


def test_popular_requires_higher_df(spark):
    # 'spark' df=30: 'sharks' (ed 2, df 30) is NOT more popular, so in
    # popular mode it must not appear; 'search' (df 40) qualifies if
    # within 2 edits (lev(spark, search)=3 -> no). sparse df=5 no.
    got = _run(spark, ["spark"], size=5, suggest_mode="popular")
    assert all(r[3] > 30 for r in got)


def test_guards(spark):
    ts = spark.createDataFrame(DICT, DICT_SCHEMA)
    td = spark.createDataFrame([("searc",)], "token string")
    with pytest.raises(ValueError, match="suggest_mode"):
        term_suggest(ts, td, suggest_mode="bogus")
    with pytest.raises(ValueError, match="max_edits"):
        term_suggest(ts, td, max_edits=3)
    with pytest.raises(ValueError, match="size"):
        term_suggest(ts, td, size=0)


def _duck(sf, tables=("documents",)):
    import duckdb

    con = duckdb.connect()
    for t in tables:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    return con


def test_suggest_gate_duckdb_equality(spark):
    """Gate row term_suggest_top3: exact registry query vs exact
    registry SQL at sf0.001 (the driver repeats this at sf0.01)."""
    import __spark_entry__ as entry

    sf = "/root/testdata/sf0.001"
    got = sorted(
        (r["token"], r["suggestion"], round(r["score"], 6), r["doc_freq"],
         r["suggest_rank"])
        for r in entry._q_term_suggest(spark, sf).collect()
    )
    want = sorted(
        (tok, sug, round(sc, 6), int(df), int(rk))
        for tok, sug, sc, df, rk in _duck(sf)
        .execute(entry._TERM_SUGGEST_SQL)
        .fetchall()
    )
    assert got == want and len(got) > 0


def test_cosine_topk_duckdb_equality(spark):
    """cosine_topk left the driver window for term_suggest_top3 (round
    5); exact registry query vs exact registry SQL at sf0.001."""
    import __spark_entry__ as entry

    sf = "/root/testdata/sf0.001"
    df = entry._q_cosine_topk(spark, sf)
    cols = sorted(df.columns)
    got = sorted(
        tuple(round(r[c], 6) if isinstance(r[c], float) else r[c] for c in cols)
        for r in df.collect()
    )
    ores = (
        _duck(sf, tables=("documents", "embeddings"))
        .execute(entry._COSINE_SQL)
        .fetchdf()
    )
    assert sorted(ores.columns.tolist()) == cols
    want = sorted(
        tuple(
            round(row[c], 6) if isinstance(row[c], float) else int(row[c])
            for c in cols
        )
        for _, row in ores.iterrows()
    )
    assert got == want and len(got) > 0


# ---- phrase suggester ---------------------------------------------------

LM_DOCS = [
    (0, "the quick brown fox jumps"),
    (1, "the quick brown dog runs"),
    (2, "quick brown fox again today"),
    (3, "lazy dog sleeps all day"),
    (4, "the brown fox quick quick"),
    (5, "brown dog naps today"),
]


def _brute_phrase(phrases, size=3, cand_per_tok=5, discount=0.4,
                  confidence=1.0):
    import math

    toks_by_doc = [t.split() for _, t in LM_DOCS]
    uni, big, df = {}, {}, {}
    for ts in toks_by_doc:
        for w in ts:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(ts, ts[1:]):
            big[(a, b)] = big.get((a, b), 0) + 1
        for w in set(ts):
            df[w] = df.get(w, 0) + 1
    total, v = sum(uni.values()), len(uni)

    def lp_uni(w):
        return math.log10((uni.get(w, 0) + 1) / float(total + v))

    def lp_big(w1, w2):
        if (w1, w2) in big:
            return math.log10(big[(w1, w2)] / float(uni[w1]))
        return math.log10(discount) + lp_uni(w2)

    def score(ts):
        return lp_uni(ts[0]) + sum(lp_big(a, b) for a, b in zip(ts, ts[1:]))

    def _lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    def gen(tok):
        if len(tok) < 4 or tok in df:
            return []
        cands = []
        for term, d in df.items():
            if term[:1] != tok[:1] or abs(len(term) - len(tok)) > 2:
                continue
            ed = _lev(term, tok)
            if 0 < ed <= 2:
                s = 1.0 - ed / min(len(tok), len(term))
                cands.append((-s, -d, term))
        cands.sort()
        return [t for _, _, t in cands[:cand_per_tok]]

    out = []
    for qid, phrase in phrases:
        ts = phrase.split()
        osc = score(ts)
        rows = []
        for j, t in enumerate(ts):
            for cand in gen(t):
                ts2 = ts[:j] + [cand] + ts[j + 1:]
                sc = round(score(ts2), 6)
                if sc > round(osc + math.log10(confidence), 12) and sc > osc:
                    rows.append((-sc, " ".join(ts2), sc))
        rows.sort(key=lambda r: (r[0], r[1]))
        seen = set()
        rk = 0
        for _, sug, sc in rows:
            rk += 1
            if rk > size:
                break
            out.append((qid, sug, sc, rk))
    return sorted(out)


def _lm_build(spark):
    from sgpt_spark.operators.indexer import build_postings
    from sgpt_spark.operators.suggest import lm_counts

    from pyspark.sql import functions as F

    docs = spark.createDataFrame(LM_DOCS, "doc_id long, text string")
    postings, meta = build_postings(docs.repartition(2), segment_size=2)
    tstats = postings.groupBy("term").agg(F.sum("df").alias("df"))
    uni, big, tot, v = lm_counts(docs)
    return tstats, uni, big, tot, v


def test_phrase_suggest_brute_force(spark):
    from sgpt_spark.operators.suggest import phrase_suggest

    tstats, uni, big, tot, v = _lm_build(spark)
    phrases = [(100, "quick browns fox"), (101, "lazi dog sleeps"),
               (102, "the quick brown")]  # no misspelling -> no rows
    pdf = spark.createDataFrame(phrases, "qid long, query string")
    got = sorted(
        (r["qid"], r["suggestion"], round(r["score"], 6), r["suggest_rank"])
        for r in phrase_suggest(tstats, uni, big, tot, v, pdf,
                                size=3).collect()
    )
    want = _brute_phrase(phrases)
    assert got == want and got
    qids = {r[0] for r in got}
    assert 100 in qids and 101 in qids and 102 not in qids


def test_phrase_suggest_corrections_beat_original(spark):
    """Every returned variant outscores the original under the same LM
    (the confidence=1.0 contract), and the original never returns."""
    from sgpt_spark.operators.suggest import phrase_suggest

    tstats, uni, big, tot, v = _lm_build(spark)
    pdf = spark.createDataFrame(
        [(1, "quick browns fox")], "qid long, query string"
    )
    res = phrase_suggest(tstats, uni, big, tot, v, pdf, size=10).collect()
    assert res and all(r["suggestion"] != "quick browns fox" for r in res)
    assert res[0]["suggestion"] if False else True
    top = {r["suggest_rank"]: r["suggestion"] for r in res}
    assert top[1] == "quick brown fox"


def test_phrase_suggest_guards(spark):
    from sgpt_spark.operators.suggest import phrase_suggest

    tstats, uni, big, tot, v = _lm_build(spark)
    pdf = spark.createDataFrame([(1, "x y")], "qid long, query string")
    with pytest.raises(ValueError, match="size"):
        phrase_suggest(tstats, uni, big, tot, v, pdf, size=0)
    with pytest.raises(ValueError, match="discount"):
        phrase_suggest(tstats, uni, big, tot, v, pdf, discount=0.0)
    with pytest.raises(ValueError, match="confidence"):
        phrase_suggest(tstats, uni, big, tot, v, pdf, confidence=-1.0)


def test_phrase_suggest_gate_duckdb_equality(spark):
    """Gate row phrase_suggest_top3: exact registry query vs exact
    registry SQL at sf0.001 (the driver repeats this at sf0.01)."""
    import __spark_entry__ as entry

    sf = "/root/testdata/sf0.001"
    got = sorted(
        (r["qid"], r["suggestion"], round(r["score"], 6), r["suggest_rank"])
        for r in entry._q_phrase_suggest(spark, sf).collect()
    )
    want = sorted(
        (q, s, round(sc, 6), int(rk))
        for q, s, sc, rk in _duck(sf)
        .execute(entry._PHRASE_SUGGEST_SQL)
        .fetchall()
    )
    assert got == want and len(got) > 0


def test_ivf_full_probe_duckdb_equality(spark):
    """ivf_full_probe_topk left the driver window for phrase_suggest_top3
    (round 5 — the cosine evidence stays gated via hybrid_rrf_top10 and
    dense_cosine_topk); exact registry query vs exact registry SQL."""
    import __spark_entry__ as entry

    sf = "/root/testdata/sf0.001"
    df = entry._q_ivf_full_probe(spark, sf)
    cols = sorted(df.columns)
    got = sorted(
        tuple(round(r[c], 6) if isinstance(r[c], float) else r[c] for c in cols)
        for r in df.collect()
    )
    ores = (
        _duck(sf, tables=("documents", "embeddings"))
        .execute(entry._COSINE_SQL)
        .fetchdf()
    )
    assert sorted(ores.columns.tolist()) == cols
    want = sorted(
        tuple(
            round(row[c], 6) if isinstance(row[c], float) else int(row[c])
            for c in cols
        )
        for _, row in ores.iterrows()
    )
    assert got == want and len(got) > 0
