"""ES completion suggester (operators/complete.py): hand expectations,
a DuckDB window-equality twin at gate rigor (including over the real
sf0.001 documents table through completion_inputs), a from-scratch
fuzzy brute force (pure-python DP levenshtein + the same candidate
rule), knob coverage (size, skip_duplicates, min_length, prefix_length,
no-broadcast identity), and the guards."""

from __future__ import annotations

import pytest

from sgpt_spark.operators.complete import complete, completion_inputs

pytestmark = pytest.mark.usefixtures("spark")

SUGG = [
    # (text, weight)
    ("spark streaming", 10),
    ("spark sql", 25),
    ("spark shell", 25),  # weight tie with spark sql -> text asc
    ("sparse matrix", 7),
    ("spork handle", 9),
    ("stark reality", 12),
    ("spark sql", 3),  # duplicate text, lower weight
    ("postgres", 50),
]


def _sugg(spark):
    return spark.createDataFrame(SUGG, "text string, weight long")


def _rows(df):
    return sorted(
        (r["qid"], r["text"], r["weight"], r["rank"]) for r in df.collect()
    )


def test_exact_prefix_ranking(spark):
    got = _rows(complete(_sugg(spark), [(1, "spark")], size=3))
    # weight desc, text asc; duplicate 'spark sql' (3) misses the cut
    assert got == [
        (1, "spark shell", 25, 1),
        (1, "spark sql", 25, 2),
        (1, "spark streaming", 10, 3),
    ]


def test_size_and_duplicates(spark):
    got = _rows(complete(_sugg(spark), [(1, "spark")], size=10))
    assert (1, "spark sql", 3, 4) in got  # duplicate text kept by default
    got2 = _rows(
        complete(_sugg(spark), [(1, "spark")], size=10, skip_duplicates=True)
    )
    texts = [t for _, t, _, _ in got2]
    assert texts == sorted(set(texts), key=lambda t: t)  # sorted set check
    assert (1, "spark sql", 25, 2) in got2
    assert not [r for r in got2 if r[1] == "spark sql" and r[2] == 3]


def test_multiple_prefix_lengths_and_no_broadcast(spark):
    qs = [(1, "spark"), (2, "sp"), (3, "post"), (4, "zzz")]
    a = _rows(complete(_sugg(spark), qs, size=5))
    b = _rows(complete(_sugg(spark), qs, size=5, broadcast_queries=False))
    assert a == b
    assert {r[0] for r in a} == {1, 2, 3}  # zzz matches nothing
    assert [r[1] for r in a if r[0] == 3] == ["postgres"]


# ---- fuzzy ------------------------------------------------------------------


def _lev(a: str, b: str) -> int:
    """From-scratch DP levenshtein (no transpositions — the classic
    metric Spark's levenshtein implements)."""
    m, n = len(a), len(b)
    prev = list(range(n + 1))
    for i in range(1, m + 1):
        cur = [i] + [0] * n
        for j in range(1, n + 1):
            cur[j] = min(
                prev[j] + 1,
                cur[j - 1] + 1,
                prev[j - 1] + (a[i - 1] != b[j - 1]),
            )
        prev = cur
    return prev[n]


def _brute_fuzzy(prefixes, size=5, fuzziness=1, min_length=3, prefix_length=1):
    out = []
    for qid, p in prefixes:
        L = len(p)
        cands = []
        for text, w in SUGG:
            if fuzziness > 0 and L >= min_length:
                if prefix_length > 0 and text[:prefix_length] != p[:prefix_length]:
                    continue
                ok = any(
                    _lev(text[:L2], p) <= fuzziness
                    for L2 in range(max(1, L - fuzziness), L + fuzziness + 1)
                )
            else:
                ok = text[:L] == p
            if ok:
                cands.append((text, w))
        cands.sort(key=lambda x: (-x[1], x[0]))
        for rk, (t, w) in enumerate(cands[:size], 1):
            out.append((qid, t, w, rk))
    return sorted(out)


@pytest.mark.parametrize("fuzz", [1, 2])
def test_fuzzy_matches_brute_force(spark, fuzz):
    qs = [(1, "spark"), (2, "spask"), (3, "sprk"), (4, "sparkk"), (5, "spo")]
    got = _rows(complete(_sugg(spark), qs, size=10, fuzziness=fuzz))
    want = _brute_fuzzy(qs, size=10, fuzziness=fuzz)
    assert got == want and len(got) > 0
    # 'spask' (one substitution) must reach the spark completions
    assert [r for r in got if r[0] == 2]


def test_fuzzy_min_length_gates_to_exact(spark):
    # 'sp' is shorter than min_length 3: stays exact even with fuzz
    got = _rows(complete(_sugg(spark), [(1, "sp")], size=10, fuzziness=2))
    want = _brute_fuzzy([(1, "sp")], size=10, fuzziness=2)
    assert got == want
    assert not [r for r in got if r[1] == "stark reality"]


def test_fuzzy_prefix_length_head_constraint(spark):
    # 'ptark' vs 'stark reality': edit distance 1 but heads differ ->
    # excluded at prefix_length=1, admitted at prefix_length=0
    got1 = _rows(
        complete(_sugg(spark), [(1, "ptark")], fuzziness=1, fuzzy_prefix_length=1)
    )
    assert got1 == []
    got0 = _rows(
        complete(_sugg(spark), [(1, "ptark")], fuzziness=1, fuzzy_prefix_length=0)
    )
    assert [r[1] for r in got0] == ["stark reality"]


def test_guards(spark):
    with pytest.raises(ValueError, match="empty prefix"):
        complete(_sugg(spark), [(1, "")]).collect()
    with pytest.raises(ValueError, match="fuzziness"):
        complete(_sugg(spark), [(1, "sp")], fuzziness=3)
    with pytest.raises(ValueError, match="fuzzy_prefix_length"):
        complete(_sugg(spark), [(1, "sp")], fuzziness=1, fuzzy_prefix_length=-1)


# ---- DuckDB twin at gate rigor ---------------------------------------------


def test_duckdb_equality_real_corpus(spark):
    """Exact completion over the real sf0.001 documents table (inputs
    derived by completion_inputs), window-for-window against DuckDB —
    the gate-rigor evidence for the weight-ordered prefix lookup."""
    import duckdb

    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    sugg = completion_inputs(docs)
    qs = [(1, "the"), (2, "a"), (3, "of th"), (4, "zzzzz")]
    got = _rows(complete(sugg.select("text", "weight"), qs, size=5))

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * "
        f"FROM read_parquet('{sf}/documents.parquet')"
    )
    con.execute(
        "CREATE VIEW sugg AS "
        "SELECT lower(array_to_string(list_slice("
        "  regexp_split_to_array(trim(split_part(text, chr(10), 1)), '\\s+'),"
        "  1, 4), ' ')) AS text, "
        "  len(regexp_split_to_array(text, '\\s+'))::BIGINT AS weight "
        "FROM documents "
        "WHERE length(trim(lower(array_to_string(list_slice("
        "  regexp_split_to_array(trim(split_part(text, chr(10), 1)), '\\s+'),"
        "  1, 4), ' ')))) > 0"
    )
    con.execute(
        "CREATE VIEW q AS SELECT * FROM (VALUES "
        "(1, 'the'), (2, 'a'), (3, 'of th'), (4, 'zzzzz')) t(qid, prefix)"
    )
    want = sorted(
        (int(q), t, int(w), int(rk))
        for q, t, w, rk in con.execute(
            "SELECT qid, text, weight, rank FROM ("
            "  SELECT q.qid, s.text, s.weight,"
            "    row_number() OVER (PARTITION BY q.qid"
            "      ORDER BY s.weight DESC, s.text ASC) AS rank"
            "  FROM sugg s JOIN q ON substr(s.text, 1, length(q.prefix)) = q.prefix"
            ") WHERE rank <= 5"
        ).fetchall()
    )
    assert got == want and len(got) > 0


# ---- category contexts ---------------------------------------------------


CTX_SUGG = [
    # (text, weight, tags array)
    ("spark streaming", 10, ["compute", "stream"]),
    ("spark sql", 25, ["compute"]),
    ("spark shell", 25, ["tooling"]),
    ("sparse matrix", 7, ["math"]),
    ("spark sql", 3, ["stream"]),  # duplicate text, other context
]


def _ctx_sugg(spark):
    return spark.createDataFrame(
        CTX_SUGG, "text string, weight long, tags array<string>"
    )


def test_contexts_filter_and_boost(spark):
    # qid 1 wants 'stream' boosted 3x OR 'math' at 1x: spark streaming
    # scores 30, sparse matrix 7, spark sql matches only via its
    # low-weight duplicate (3*3=9); 'spark shell' (tooling) is filtered.
    got = sorted(
        (r["qid"], r["text"], r["weight"], r["score"], r["rank"])
        for r in complete(
            _ctx_sugg(spark), [(1, "sp")], size=10,
            context_col="tags",
            contexts=[(1, "stream", 3.0), (1, "math")],
        ).collect()
    )
    assert got == sorted([
        (1, "spark streaming", 10, 30.0, 1),
        (1, "spark sql", 3, 9.0, 2),
        (1, "sparse matrix", 7, 7.0, 3),
    ])


def test_contexts_or_rule_takes_best_boost(spark):
    # a suggestion carrying BOTH requested contexts scores by the best
    # matching boost (ES picks the highest-scored option)
    got = sorted(
        (r["text"], r["score"])
        for r in complete(
            _ctx_sugg(spark), [(1, "spark")], size=10,
            context_col="tags",
            contexts=[(1, "compute", 2.0), (1, "stream", 5.0)],
        ).collect()
    )
    assert ("spark streaming", 50.0) in got  # 5x beats 2x
    assert ("spark sql", 50.0) in got  # compute 25*2 beats stream-dup 3*5


def test_contexts_plain_string_column_and_per_qid(spark):
    sugg = spark.createDataFrame(
        [("spark sql", 25, "compute"), ("spark shell", 25, "tooling")],
        "text string, weight long, tag string",
    )
    got = sorted(
        (r["qid"], r["text"])
        for r in complete(
            sugg, [(1, "spark"), (2, "spark")], size=10,
            context_col="tag",
            contexts=[(1, "compute"), (2, "tooling")],
        ).collect()
    )
    assert got == [(1, "spark sql"), (2, "spark shell")]


def test_contexts_guards(spark):
    with pytest.raises(ValueError, match="given together"):
        complete(_ctx_sugg(spark), [(1, "sp")], contexts=[(1, "x")])
    with pytest.raises(ValueError, match="not in suggestion columns"):
        complete(
            _ctx_sugg(spark), [(1, "sp")], context_col="nope",
            contexts=[(1, "x")],
        )
