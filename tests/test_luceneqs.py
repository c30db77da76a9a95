"""ES query_string (operators/luceneqs.py): the classic-parser grammar
as AST unit tests (Lucene's documented AND/OR/NOT promote/demote
behavior included); an end-to-end corpus check against an independent
python evaluator implementing the same documented semantics (BM25 term
clauses, exact-phrase pseudo-term, constant-score expansions,
doc-values equality/ranges, bool occur algebra); and the family
anchors — a plain string == the match query, a quoted string == the
phrase path, a slop phrase == the sloppy path, a bare prefix == the
constant-score prefix operator."""

from __future__ import annotations

import re

import pytest

from sgpt_spark.functions.bm25 import idf_py, score_py
from sgpt_spark.operators.luceneqs import (
    parse_query_string,
    query_string_search_index,
)
from sgpt_spark.operators.positions import (
    build_positional_index,
    phrase_search_index,
)

pytestmark = pytest.mark.usefixtures("spark")


# ---- parser -------------------------------------------------------------


def _clauses(node):
    return [(occ, c.kind, c.text) for occ, c in node.clauses]


def test_parse_default_or():
    n = parse_query_string("quick brown")
    assert n.kind == "bool"
    assert _clauses(n) == [("should", "term", "quick"), ("should", "term", "brown")]


def test_parse_default_and():
    n = parse_query_string("quick brown", default_operator="and")
    assert _clauses(n) == [("must", "term", "quick"), ("must", "term", "brown")]


def test_parse_and_promotes_previous():
    # Lucene classic: "a AND b OR c" -> +a +b c
    n = parse_query_string("a AND b OR c")
    assert _clauses(n) == [
        ("must", "term", "a"), ("must", "term", "b"), ("should", "term", "c"),
    ]


def test_parse_signs_and_not():
    n = parse_query_string("+a -b c NOT d")
    assert _clauses(n) == [
        ("must", "term", "a"), ("must_not", "term", "b"),
        ("should", "term", "c"), ("must_not", "term", "d"),
    ]
    # an explicit sign survives a following AND (Lucene: no promote)
    n = parse_query_string("-a AND b")
    assert _clauses(n) == [("must_not", "term", "a"), ("must", "term", "b")]


def test_parse_phrase_slop_boost():
    n = parse_query_string('"x y"~2^1.5')
    assert (n.kind, n.text, n.slop, n.boost) == ("phrase", "x y", 2, 1.5)
    n = parse_query_string('"x y"')
    assert (n.kind, n.slop) == ("phrase", 0)


def test_parse_multiterm_kinds():
    assert parse_query_string("bro*").kind == "prefix"
    assert parse_query_string("bro*").text == "bro"
    assert parse_query_string("qu?ck").kind == "wildcard"
    assert parse_query_string("b*o*").kind == "wildcard"
    f = parse_query_string("fox~1")
    assert (f.kind, f.max_edits) == ("fuzzy", 1)
    assert parse_query_string("fox~").max_edits == 2
    r = parse_query_string("/f[ox]+/")
    assert (r.kind, r.text) == ("regexp", "f[ox]+")


def test_parse_fields_groups_ranges():
    n = parse_query_string("lang:en")
    assert (n.kind, n.field, n.text) == ("term", "lang", "en")
    n = parse_query_string("text:(a OR b)")
    assert n.kind == "bool" and all(c.field == "text" for _, c in n.clauses)
    n = parse_query_string("n:[1 TO 5}")
    assert (n.kind, n.field, n.lo, n.hi, n.lo_incl, n.hi_incl) == (
        "range", "n", "1", "5", True, False,
    )
    n = parse_query_string("n:[* TO 5]")
    assert (n.lo, n.hi) == (None, "5")


def test_parse_groups_and_boost():
    n = parse_query_string("(a b)^2 AND c")
    assert n.kind == "bool"
    (o1, g), (o2, c) = n.clauses
    assert g.kind == "bool" and g.boost == 2.0
    # AND promotes the group too (it carries no explicit sign)
    assert o1 == "must" and o2 == "must"


def test_parse_midterm_hyphen_and_escapes():
    n = parse_query_string("foo-bar")
    assert (n.kind, n.text) == ("term", "foo-bar")
    n = parse_query_string(r"a\:b")
    assert (n.kind, n.text) == ("term", "a:b")


def test_parse_errors():
    for bad in ("", "(", "(a", "a)", "n:[1 TO", "+", '"unterminated'):
        with pytest.raises(ValueError):
            parse_query_string(bad)
    with pytest.raises(ValueError, match="default_operator"):
        parse_query_string("a", default_operator="xor")


# ---- end-to-end vs an independent evaluator ------------------------------

DOCS = [
    # (doc_id, text, n_chars, lang)
    (0, "the quick brown fox jumps over the lazy dog", 44, "en"),
    (1, "quick brown fox and then quick brown fox again", 47, "en"),
    (2, "fox brown quick", 15, "de"),
    (3, "quick x x brown y fox", 21, "en"),
    (4, "brown fox quick brown", 21, "de"),
    (5, "a quick dog barks", 17, "en"),
    (6, "lazy dogs sleep all day", 23, "en"),
    (7, "foxtrot dance quick step", 24, "fr"),
]

QS = [
    (1, "quick brown"),
    (2, "quick AND brown"),
    (3, "quick AND brown OR dog"),
    (4, "+quick -lazy"),
    (5, '"quick brown fox"'),
    (6, "qui* AND dog"),
    (7, "qu?ck"),
    (8, "fox~1"),
    (9, "/f[o]x(trot)?/"),
    (10, "(quick OR dog) AND brown"),
    (11, "quick^2 brown"),
    (12, "brown AND n_chars:[16 TO 44}"),
    (13, "lang:de AND quick"),
    (14, "-quick"),          # pure negative: no hits
    (15, "quick AND missingterm"),  # analyzed-away? no: absent term -> no hits
]


def _toks():
    return {d: t.split() for d, t, _, _ in DOCS}


def _stats():
    toks = _toks()
    n = len(toks)
    avgdl = sum(len(t) for t in toks.values()) / n
    df: dict = {}
    for t in toks.values():
        for w in set(t):
            df[w] = df.get(w, 0) + 1
    return toks, n, avgdl, df


def _vocab():
    return sorted({w for t in _toks().values() for w in t})


def _lev(a, b):
    m, n = len(a), len(b)
    prev = list(range(n + 1))
    for i in range(1, m + 1):
        cur = [i] + [0] * n
        for j in range(1, n + 1):
            cur[j] = min(
                prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (a[i - 1] != b[j - 1])
            )
        prev = cur
    return prev[n]


def _brute_eval(node, d, toks, n, avgdl, df, dv):
    """-> (matched, score) under the documented semantics."""
    t = toks[d]
    if node.kind == "bool":
        score = 0.0
        musts = shoulds = 0
        n_must = sum(1 for o, _ in node.clauses if o == "must")
        n_should = sum(1 for o, _ in node.clauses if o == "should")
        for occ, c in node.clauses:
            m, s = _brute_eval(c, d, toks, n, avgdl, df, dv)
            if occ == "must_not":
                if m:
                    return False, 0.0
            elif m:
                score += s
                musts += occ == "must"
                shoulds += occ == "should"
        ok = musts == n_must and (n_must > 0 or shoulds >= 1)
        return ok, score * node.boost if ok else 0.0
    if node.kind == "term":
        if node.field in (None, "text"):
            tf = t.count(node.text)
            if tf == 0 or node.text not in df:
                return False, 0.0
            return True, score_py(tf, df[node.text], len(t), n, avgdl) * node.boost
        ok = str(dv[d][node.field]) == node.text
        return ok, 1.0 * node.boost if ok else 0.0
    if node.kind == "phrase":
        q = node.text.split()
        pf = sum(
            1
            for i in range(len(t) - len(q) + 1)
            if t[i:i + len(q)] == q
        )
        if pf == 0 or any(w not in df for w in q):
            return False, 0.0
        sum_idf = sum(idf_py(df[w], n) for w in q)
        s = sum_idf * pf / (pf + 1.2 * (1 - 0.75 + 0.75 * len(t) / avgdl))
        return True, s * node.boost
    if node.kind in ("prefix", "wildcard", "regexp", "fuzzy"):
        if node.kind == "prefix":
            terms = [w for w in _vocab() if w.startswith(node.text)]
        elif node.kind == "wildcard":
            pat = re.escape(node.text).replace(r"\*", ".*").replace(r"\?", ".")
            terms = [w for w in _vocab() if re.fullmatch(pat, w)]
        elif node.kind == "regexp":
            terms = [w for w in _vocab() if re.fullmatch(node.text, w)]
        else:
            terms = [w for w in _vocab() if _lev(node.text, w) <= node.max_edits]
        ok = any(w in t for w in terms)
        return ok, 1.0 * node.boost if ok else 0.0
    if node.kind == "range":
        v = dv[d][node.field]
        lo = float(node.lo) if node.lo is not None else None
        hi = float(node.hi) if node.hi is not None else None
        ok = (lo is None or (v >= lo if node.lo_incl else v > lo)) and (
            hi is None or (v <= hi if node.hi_incl else v < hi)
        )
        return ok, 1.0 * node.boost if ok else 0.0
    raise AssertionError(node.kind)


def _brute_corpus(k=10):
    toks, n, avgdl, df = _stats()
    dv = {d: {"n_chars": nc, "lang": lg} for d, _, nc, lg in DOCS}
    out = []
    for qid, s in QS:
        ast = parse_query_string(s)
        hits = []
        for d in toks:
            m, sc = _brute_eval(ast, d, toks, n, avgdl, df, dv)
            if m and sc > 0.0:
                hits.append((round(sc, 6), d))
        hits.sort(key=lambda x: (-x[0], x[1]))
        for rk, (sc, d) in enumerate(hits[:k], 1):
            out.append((qid, d, sc, rk))
    return sorted(out)


def _rows(df):
    return sorted(
        (r["qid"], r["doc_id"], round(r["score"], 6), r["rank"])
        for r in df.collect()
    )


def _build(spark, codec="varint"):
    import tempfile

    docs = spark.createDataFrame(
        DOCS, "doc_id long, text string, n_chars long, lang string"
    ).repartition(3)
    path = tempfile.mkdtemp(prefix="qsidx_")
    build_positional_index(
        docs.select("doc_id", "text"), path, segment_size=3, codec=codec
    )
    return path, docs.select("doc_id", "n_chars", "lang")


@pytest.mark.parametrize("codec", ["varint", "pfor"])
def test_index_matches_brute_force(spark, codec):
    path, dv = _build(spark, codec=codec)
    got = _rows(
        query_string_search_index(spark, path, QS, docvalues=dv, k=10)
    )
    want = _brute_corpus()
    assert got == want
    qids = {r[0] for r in got}
    assert 14 not in qids          # pure negative: no hits
    assert 15 not in qids          # absent must term: no hits
    assert {1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13} <= qids


def test_default_and_end_to_end(spark):
    path, dv = _build(spark)
    got = _rows(
        query_string_search_index(
            spark, path, [(1, "quick brown")], default_operator="and"
        )
    )
    want = _rows(
        query_string_search_index(spark, path, [(1, "quick AND brown")])
    )
    assert got == want and len(got) > 0


def test_plain_string_is_match_query(spark):
    """The anchor: a bare term string scores the match query's BM25."""
    from sgpt_spark.operators.index_search import search_index
    from sgpt_spark.operators.indexer import read_index

    path, _ = _build(spark)
    postings, meta = read_index(spark, path)
    qs = [(1, "quick brown fox"), (2, "lazy dog"), (3, "quick quick dog")]
    a = _rows(query_string_search_index(spark, path, qs, k=10))
    b = _rows(search_index(spark, postings, meta, qs, k=10))
    assert a == b and len(a) > 0


def test_quoted_string_is_phrase_query(spark):
    path, _ = _build(spark)
    phrases = [(1, "quick brown fox"), (2, "lazy dog")]
    a = _rows(
        query_string_search_index(
            spark, path, [(q, f'"{p}"') for q, p in phrases], k=10
        )
    )
    b = _rows(phrase_search_index(spark, path, phrases, k=10))
    assert a == b and len(a) > 0


def test_slop_phrase_is_sloppy_path(spark):
    path, _ = _build(spark)
    a = _rows(
        query_string_search_index(spark, path, [(1, '"quick fox"~2')], k=10)
    )
    b = _rows(phrase_search_index(spark, path, [(1, "quick fox")], k=10, slop=2))
    assert a == b and len(a) > 0


def test_bare_prefix_is_constant_score_prefix(spark):
    from sgpt_spark.operators.multiterm import prefix_search_index
    from sgpt_spark.operators.indexer import read_index

    path, _ = _build(spark)
    postings, meta = read_index(spark, path)
    a = _rows(query_string_search_index(spark, path, [(1, "qui*")], k=10))
    b = _rows(
        prefix_search_index(
            spark, postings, meta, [(1, "qui")], rewrite="constant_score", k=10
        )
    )
    assert a == b and len(a) > 0


def test_field_clause_requires_docvalues(spark):
    path, _ = _build(spark)
    with pytest.raises(ValueError, match="doc-values"):
        query_string_search_index(spark, path, [(1, "lang:de")])
    _, dv = _build(spark)
    with pytest.raises(ValueError, match="not in"):
        query_string_search_index(spark, path, [(1, "bogusfield:x")], docvalues=dv)


def test_classic_equals_simple_query_string_real_corpus(spark):
    """`+t2 t1 -t5 "t3 t4"` is valid in BOTH grammars with identical
    documented semantics (must / should / must_not / phrase-should);
    simple_query_string's gate row is DuckDB-oracle-gated, so equality
    on the real sf0.001 corpus carries that evidence to the classic
    parser transitively."""
    import tempfile

    from pyspark.sql import functions as F

    from sgpt_spark.operators.querystring import simple_query_string_index
    from sgpt_spark.sources.queryset import derived_query_strings
    from sgpt_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    docs = load_table(spark, sf, "documents")
    path = tempfile.mkdtemp(prefix="qs_real_")
    build_positional_index(docs, path, segment_size=500)
    qs = (
        derived_query_strings(docs)
        .filter(F.col("query").rlike('^[A-Za-z0-9+\\- "]+$'))
        .filter("qid < 500")
    )
    a = _rows(query_string_search_index(spark, path, qs, k=10))
    b = _rows(simple_query_string_index(spark, path, qs, k=10))
    assert a == b and len(a) > 0


def test_flat_route_matches_general(spark):
    """r6: the flat bool-kernel route is value-identical to the pinned
    by-depth executor on the bench shape (must/should/must_not terms +
    quoted phrase, incl. slop), and a MIXED batch (flat + grouped)
    unions correctly."""
    import tempfile

    from sgpt_spark.operators.indexer import read_term_stats
    from sgpt_spark.operators.luceneqs import query_string_search_index
    from sgpt_spark.operators.positions import build_positional_index

    docs = spark.createDataFrame(
        DOCS, "doc_id long, text string, n_chars long, lang string"
    ).repartition(3)
    path = tempfile.mkdtemp(prefix="sgpt_lqs_flat_")
    build_positional_index(docs.repartition(3, "doc_id"), path, segment_size=2)
    ts = read_term_stats(spark, path)
    qs = [
        (1, '+quick brown -dog "lazy brown"'),
        (2, 'quick AND fox'),
        (3, '"quick brown"~2 cat'),
        (4, 'brown'),
    ]
    a = _rows(query_string_search_index(spark, path, qs, k=10, term_stats=ts))
    b = _rows(query_string_search_index(spark, path, qs, k=10, term_stats=ts,
                                        strategy="general"))
    assert a == b and len(a) > 0
    # mixed batch: qid 5 has a parenthesized group -> general executor
    mixed = qs + [(5, '(quick OR cat) AND brown')]
    a = _rows(query_string_search_index(spark, path, mixed, k=10, term_stats=ts))
    b = _rows(query_string_search_index(spark, path, mixed, k=10, term_stats=ts,
                                        strategy="general"))
    assert a == b and len([r for r in a if r[0] == 5]) > 0
