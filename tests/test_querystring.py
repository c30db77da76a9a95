"""ES simple_query_string (operators/querystring.py): in-plan parser
units (occurs, phrases, lenient malformed input, default_operator),
from-scratch Python brute force of the combine semantics, index ==
exhaustive identity, guards, and the gate's DuckDB equality."""

from __future__ import annotations

import math
import tempfile

import pytest
from pyspark.sql import functions as F

from sgpt_spark.functions.bm25 import idf_py
from sgpt_spark.operators.querystring import (
    parse_simple_query_string,
    simple_query_string_cogroup,
    simple_query_string_index,
    simple_query_string_search,
)

pytestmark = pytest.mark.usefixtures("spark")

DOCS = [
    (0, "quick brown fox jumps high"),
    (1, "quick dog runs"),
    (2, "lazy brown dog sleeps"),
    (3, "quick brown dance brown fox"),
    (4, "a cat naps"),
    (5, "brown fox quick quick"),
]
K1, B = 1.2, 0.75


def _docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def _qdf(spark, rows):
    return spark.createDataFrame(rows, "qid long, query string")


# --- parser -----------------------------------------------------------------


def _parsed(spark, qs, **kw):
    return sorted(
        (r["qid"], r["cid"], r["occur"], r["kind"], r["clause"])
        for r in parse_simple_query_string(_qdf(spark, qs), **kw).collect()
    )


def test_parse_occurs_and_phrases(spark):
    got = _parsed(spark, [(1, 'quick +brown -lazy "brown fox" +"quick dog"')])
    assert got == [
        (1, 0, "should", "term", "quick"),
        (1, 1, "must", "term", "brown"),
        (1, 2, "must_not", "term", "lazy"),
        (1, 3, "should", "phrase", "brown fox"),
        (1, 4, "must", "phrase", "quick dog"),
    ]


def test_parse_default_operator_and(spark):
    got = _parsed(spark, [(1, "quick brown -lazy")], default_operator="and")
    assert [(o, c) for _, _, o, _, c in got] == [
        ("must", "quick"), ("must", "brown"), ("must_not", "lazy")
    ]
    with pytest.raises(ValueError, match="default_operator"):
        parse_simple_query_string(_qdf(spark, [(1, "x")]), default_operator="xor")


def test_parse_lenient_malformed(spark):
    """A quote pairs with the NEXT quote; a quote with no partner
    degrades its tail to bare terms; lone +/- and empty phrases are
    dropped (the ES lenient contract)."""
    got = _parsed(spark, [(1, 'quick "unclosed brown')])
    assert [(o, k, c) for _, _, o, k, c in got] == [
        ("should", "term", "quick"),
        ("should", "term", "unclosed"),
        ("should", "term", "brown"),
    ]
    got2 = _parsed(spark, [(1, 'quick + - "" brown')])
    assert [(o, k, c) for _, _, o, k, c in got2] == [
        ("should", "term", "quick"),
        ("should", "term", "brown"),
    ]


# --- brute force ------------------------------------------------------------


def _brute(queries, default_operator="or"):
    """From-scratch Python reimplementation over DOCS."""
    toks = {d: t.split() for d, t in DOCS}
    n = len(toks)
    avgdl = sum(len(v) for v in toks.values()) / n
    df: dict = {}
    for ts in toks.values():
        for t in set(ts):
            df[t] = df.get(t, 0) + 1

    def term_score(t, d):
        tf = toks[d].count(t)
        if tf == 0 or t not in df:
            return None
        dl = len(toks[d])
        return idf_py(df[t], n) * tf / (tf + K1 * (1 - B + B * dl / avgdl))

    def phrase_score(ts, d, slop=0):
        seq = toks[d]
        if slop > 0:
            from tests.test_sloppy import _adj, _sloppy_freq_naive

            pf = _sloppy_freq_naive(_adj(seq, ts), slop)
        else:
            pf = sum(
                1 for i in range(len(seq) - len(ts) + 1)
                if seq[i:i + len(ts)] == list(ts)
            )
        if pf == 0 or any(t not in df for t in ts):
            return None
        dl = len(seq)
        sidf = sum(idf_py(df[t], n) for t in ts)
        return sidf * pf / (pf + K1 * (1 - B + B * dl / avgdl))

    bare = "must" if default_operator == "and" else "should"
    out = []
    for qid, qs in queries:
        clauses = []
        for tok in _tokenize_qs(qs):
            occ = ("must" if tok[0] == "+" else
                   "must_not" if tok[0] == "-" else bare)
            body = tok[1:] if tok[0] in "+-" else tok
            import re as _re

            m = _re.fullmatch(r'"([^"]*)"(?:~([0-9]+))?', body)
            if m:
                text = m.group(1).strip()
                if text:
                    clauses.append(
                        (occ, "phrase", (tuple(text.split()),
                                         int(m.group(2) or 0)))
                    )
            elif body:
                clauses.append((occ, "term", body))
        n_must = sum(1 for o, _, _ in clauses if o == "must")
        msm = 1 if n_must == 0 else 0
        for d in toks:
            total, must_hit, neg, should_hit = 0.0, 0, False, 0
            for occ, kind, payload in clauses:
                s = (term_score(payload, d) if kind == "term"
                     else phrase_score(payload[0], d, payload[1]))
                if s is None:
                    continue
                if occ == "must_not":
                    neg = True
                else:
                    total += s
                    if occ == "must":
                        must_hit += 1
                    else:
                        should_hit += 1
            if neg or must_hit < n_must or should_hit < msm:
                continue
            if must_hit == 0 and should_hit == 0:
                continue  # no clause matched at all
            out.append((qid, d, round(total, 6)))
    ranked = []
    by_qid: dict = {}
    for qid, d, s in out:
        by_qid.setdefault(qid, []).append((d, s))
    for qid, rows in by_qid.items():
        rows.sort(key=lambda x: (-x[1], x[0]))
        for rk, (d, s) in enumerate(rows[:10], 1):
            ranked.append((qid, d, s, rk))
    return sorted(ranked)


def _tokenize_qs(qs):
    import re

    return re.findall(r'[+\-]?"[^"]*"(?:~[0-9]+)?|[+\-]?[^\s"]+', qs)


QS = [
    (1, 'quick +brown -lazy "brown fox"'),
    (2, '+quick dog'),
    (3, '-quick brown'),
    (4, '+"quick brown" fox'),
    (5, '+absentterm quick'),
    (6, 'cat "lazy brown dog"'),
]


def _rows(df):
    return sorted(
        (r["qid"], r["doc_id"], r["score"], r["rank"]) for r in df.collect()
    )


def test_exhaustive_brute_force(spark):
    got = _rows(simple_query_string_search(_docs(spark), QS, k=10))
    want = _brute(QS)
    assert got == want and len(got) > 5
    # absent must term (qid 5) -> MatchNoDocs
    assert not [r for r in got if r[0] == 5]
    # must_not demotes to exclusion, never filters the rest (qid 3
    # keeps brown-only docs)
    assert {r[1] for r in got if r[0] == 3} == {2}


def test_index_matches_exhaustive(spark):
    from sgpt_spark.operators.indexer import read_term_stats
    from sgpt_spark.operators.positions import build_positional_index

    docs = _docs(spark)
    path = tempfile.mkdtemp(prefix="sgpt_qs_test_")
    build_positional_index(docs.repartition(3, "doc_id"), path, segment_size=2)
    a = _rows(simple_query_string_search(docs, QS, k=10))
    b = _rows(simple_query_string_index(
        spark, path, QS, k=10,
        term_stats=read_term_stats(spark, path), strategy="clauses",
    ))
    assert a == b and len(a) > 0


def test_default_operator_and_execution(spark):
    qs = [(1, "quick brown")]
    got = _rows(simple_query_string_search(_docs(spark), qs,
                                           default_operator="and"))
    want = _brute(qs, default_operator="and")
    assert got == want
    # AND: only docs with both terms
    assert {r[1] for r in got} == {0, 3, 5}


def test_explicit_msm(spark):
    qs = [(1, "quick brown fox")]
    got = _rows(simple_query_string_search(_docs(spark), qs,
                                           minimum_should_match=3))
    assert {r[1] for r in got} == {0, 3, 5}  # all three terms required


def test_pure_negation_guard(spark):
    with pytest.raises(ValueError, match="pure-negation"):
        simple_query_string_search(_docs(spark), [(1, "-quick -brown")]).collect()
    # validate=False: candidate-driven empty instead
    got = _rows(simple_query_string_search(_docs(spark), [(1, "-quick")],
                                           validate=False))
    assert got == []


# --- "..."~N phrase slop -----------------------------------------------------


def test_parse_phrase_slop(spark):
    got = sorted(
        (r["cid"], r["occur"], r["kind"], r["clause"], r["slop"])
        for r in parse_simple_query_string(
            _qdf(spark, [(1, '+"a b"~2 c "d e" -"f g"~1')])
        ).collect()
    )
    assert got == [
        (0, "must", "phrase", "a b", 2),
        (1, "should", "term", "c", 0),
        (2, "should", "phrase", "d e", 0),
        (3, "must_not", "phrase", "f g", 1),
    ]
    # a dangling ~ (no digits) is not part of the phrase token: the
    # phrase parses at slop 0 and the ~ degrades to a bare term
    got2 = sorted(
        (r["kind"], r["clause"], r["slop"])
        for r in parse_simple_query_string(
            _qdf(spark, [(1, '"a b"~')])
        ).collect()
    )
    assert got2 == [("phrase", "a b", 0), ("term", "~", 0)]


QS_SLOP = [
    (1, '"quick fox"~1 dog'),  # gap-1 sloppy should phrase
    (2, '+"fox quick"~2'),  # transposed must phrase, phrase-only query
    (3, '"brown fox"~0 quick'),  # explicit ~0 == exact phrase
    (4, '-"quick brown"~3 fox'),  # sloppy must_not excludes its matches
]


def test_sqs_slop_matches_brute_force(spark):
    from sgpt_spark.operators.indexer import read_term_stats
    from sgpt_spark.operators.positions import build_positional_index

    docs = _docs(spark)
    path = tempfile.mkdtemp(prefix="sgpt_qs_slop_")
    build_positional_index(docs.repartition(3, "doc_id"), path, segment_size=2)
    ts = read_term_stats(spark, path)
    a = _rows(simple_query_string_index(spark, path, QS_SLOP, k=10,
                                        term_stats=ts, strategy="clauses"))
    b = _rows(simple_query_string_cogroup(spark, path, QS_SLOP, k=10, term_stats=ts))
    want = _brute(QS_SLOP)
    assert a == want and b == want and len(want) > 0
    # transposition needs slop 2: the must phrase "fox quick"~2 matches
    # only doc 5 (fox@1 quick@2 is an exact adjacency after adjustment)
    assert {r[1] for r in want if r[0] == 2} == {5}
    # sloppy must_not: every fox doc has quick..brown within 3 moves
    assert not [r for r in want if r[0] == 4]


def test_sqs_exhaustive_refuses_slop(spark):
    with pytest.raises(ValueError, match="phrase slop"):
        simple_query_string_search(_docs(spark), QS_SLOP, k=10).collect()


# --- bitmap-kernel fast path (simple_query_string_cogroup) ------------------


@pytest.mark.parametrize("codec", ["varint", "pfor"])
def test_cogroup_matches_index(spark, codec):
    """The fast path (term clauses through the bool bitmap kernel,
    phrase clauses as scored doc-bit rows) is value-identical to the
    clause-relation path on the brute-force-anchored fixture."""
    from sgpt_spark.operators.positions import build_positional_index

    docs = _docs(spark)
    path = tempfile.mkdtemp(prefix="sgpt_qs_cg_")
    build_positional_index(
        docs.repartition(3, "doc_id"), path, segment_size=2, codec=codec
    )
    a = _rows(simple_query_string_index(spark, path, QS, k=10,
                                        strategy="clauses"))
    b = _rows(simple_query_string_cogroup(spark, path, QS, k=10))
    assert a == b and len(a) > 5


def test_cogroup_operator_and_and_msm(spark):
    from sgpt_spark.operators.positions import build_positional_index

    docs = _docs(spark)
    path = tempfile.mkdtemp(prefix="sgpt_qs_cg2_")
    build_positional_index(docs.repartition(3, "doc_id"), path, segment_size=2)
    a = _rows(
        simple_query_string_index(
            spark, path, [(1, "quick brown")], k=10, default_operator="and",
            strategy="clauses",
        )
    )
    b = _rows(
        simple_query_string_cogroup(
            spark, path, [(1, "quick brown")], k=10, default_operator="and"
        )
    )
    assert a == b and {r[1] for r in a} == {0, 3, 5}
    # explicit msm over queries WITH should clauses (the shape both
    # twins agree on; should-less queries under explicit msm are the
    # documented kernel-convention divergence)
    qs = [(1, "quick brown fox")]
    a = _rows(simple_query_string_index(spark, path, qs, minimum_should_match=3))
    b = _rows(simple_query_string_cogroup(spark, path, qs, minimum_should_match=3))
    assert a == b and {r[1] for r in a} == {0, 3, 5}


def test_cogroup_phrase_occurs(spark):
    """must/must_not PHRASE clauses constrain through the scored-clause
    masks: +"quick brown" requires the phrase, -"lazy brown dog"
    excludes its one match, a phrase-only query rides its hit rows."""
    from sgpt_spark.operators.positions import build_positional_index

    docs = _docs(spark)
    path = tempfile.mkdtemp(prefix="sgpt_qs_cg3_")
    build_positional_index(docs.repartition(3, "doc_id"), path, segment_size=2)
    qs = [
        (1, '+"quick brown" fox'),
        (2, 'cat -"lazy brown dog"'),
        (3, '"quick brown"'),  # phrase-only: no term clause at all
    ]
    a = _rows(simple_query_string_index(spark, path, qs, k=10,
                                        strategy="clauses"))
    b = _rows(simple_query_string_cogroup(spark, path, qs, k=10))
    assert a == b and len([r for r in a if r[0] == 3]) > 0


def test_cogroup_pure_negation_raises_in_plan(spark):
    from sgpt_spark.operators.positions import build_positional_index

    docs = _docs(spark)
    path = tempfile.mkdtemp(prefix="sgpt_qs_cg4_")
    build_positional_index(docs.repartition(3, "doc_id"), path, segment_size=2)
    with pytest.raises(Exception, match="pure negation|positive clause"):
        simple_query_string_cogroup(spark, path, [(1, "-quick -brown")]).collect()


def test_cogroup_gate_shape_identity(spark):
    """Fast path == clause-relation path on the REAL gate shape: the
    sf0.001 documents corpus with the registry's derived query strings
    (the oracle-gated workload, so this transitively carries the DuckDB
    equality to the cogroup path)."""
    import __spark_entry__ as entry
    from sgpt_spark.operators.indexer import read_term_stats
    from sgpt_spark.operators.positions import build_positional_index
    from sgpt_spark.sources.queryset import derived_query_strings

    sf = "/root/testdata/sf0.001"
    docs = entry.load_table(spark, sf, "documents")
    path = tempfile.mkdtemp(prefix="sgpt_qs_cg5_")
    build_positional_index(docs.repartition(8, "doc_id"), path, segment_size=200)
    ts = read_term_stats(spark, path)
    qs = derived_query_strings(docs)
    a = _rows(simple_query_string_index(spark, path, qs, k=10, term_stats=ts,
                                        strategy="clauses"))
    b = _rows(simple_query_string_cogroup(spark, path, qs, k=10, term_stats=ts))
    assert a == b and len(a) > 0
    # the DEFAULT route (msm=None, validate=True) must equal the pinned
    # clause path — the r6 routing is what the gate actually runs
    c = _rows(simple_query_string_index(spark, path, qs, k=10, term_stats=ts))
    assert c == a


# --- gate equality ----------------------------------------------------------


def _duck(sf):
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    return con


def test_gate_duckdb_equality(spark):
    """Gate row simple_query_string_top10: exact registry query vs
    exact registry SQL at sf0.001 (the driver repeats at sf0.01)."""
    import __spark_entry__ as entry

    sf = "/root/testdata/sf0.001"
    got = sorted(
        (r["qid"], r["doc_id"], round(r["score"], 6), r["rank"])
        for r in entry._q_simple_query_string(spark, sf).collect()
    )
    want = sorted(
        (q, d, round(float(s), 6), int(rk))
        for q, d, s, rk in _duck(sf).execute(entry._SIMPLE_QS_SQL).fetchall()
    )
    assert got == want and len(got) > 0


def test_stats_agg_registry_twin_still_registered(spark):
    import __spark_entry__ as entry

    names = list(entry.queries())
    assert "match_stats_agg" in names and names.index("match_stats_agg") >= 50
    assert names.index("simple_query_string_top10") < 50
    assert "simple_query_string_top10" in entry.oracle_sql()
    assert math.isfinite(1.0)
