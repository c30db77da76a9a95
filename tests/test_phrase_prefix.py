"""match_phrase_prefix (ES search-as-you-type, Lucene MultiPhraseQuery):
brute-force Python oracle over an adversarial fixture, exhaustive ==
index-path identity (both codecs), the max_expansions dictionary-order
cap, degenerate shapes (m=1 pure prefix phrase, empty expansion,
corpus-absent fixed term), and the no-broadcast scale contract. Also
carries the DuckDB equality evidence for bm25_standard_top10, whose
driver-window slot the phrase-prefix gate took (registry round-5
swap; its index sibling bm25_standard_index_top10 stays gated)."""

from __future__ import annotations

import tempfile

import pytest

from sgpt_spark.operators.phrase_prefix import (
    phrase_prefix_score_py,
    phrase_prefix_search,
    phrase_prefix_search_index,
)
from sgpt_spark.operators.positions import build_positional_index

pytestmark = pytest.mark.usefixtures("spark")

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "quick brown fox and quick brown foxtrot again"),  # two expansions hit
    (2, "a a a ab"),  # self-overlap + prefix-of-itself
    (3, "brown quick fox"),  # wrong order
    (4, "the fox is quick and brown"),  # never adjacent
    (5, "quick brown wolf"),  # prefix 'fo' misses here
    (6, "foam fog foil fond font"),  # dense shared-prefix vocabulary
    (7, "singleton"),
]

# last token of every query is the PREFIX
QUERIES = [
    (100, "quick brown fo"),  # expands {fox, foxtrot} on the phrase tail
    (101, "a a"),  # duplicate fixed/prefix stem, overlapping starts
    (102, "fo"),  # m=1: pure prefix phrase
    (103, "lazy d"),
    (104, "quick brown unicorn"),  # empty expansion -> no hits
    (105, "nonexistent fo"),  # corpus-absent fixed term -> no hits
    (106, "the quick brown fox jumps over the lazy dog"),  # full known item
]


def brute_force(docs, queries, k=10, max_expansions=50):
    toks = {d: [x for x in t.split() if x] for d, t in docs}
    toks = {d: t for d, t in toks.items() if t}
    out = []
    for qid, q in queries:
        qt = [x for x in q.split() if x]
        if not qt:
            continue
        scores = phrase_prefix_score_py(
            toks, qt[:-1], qt[-1], max_expansions=max_expansions
        )
        hits = sorted(((d, round(s, 6)) for d, s in scores.items()),
                      key=lambda x: (-x[1], x[0]))
        for r, (d, sc) in enumerate(hits[:k], start=1):
            out.append((qid, d, sc, r))
    return sorted(out)


def rows(df):
    return sorted(
        (r["qid"], r["doc_id"], round(r["score"], 6), r["rank"]) for r in df.collect()
    )


def _docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def _queries(spark):
    return spark.createDataFrame(QUERIES, "qid long, query string")


def test_exhaustive_matches_brute_force(spark):
    got = rows(phrase_prefix_search(_docs(spark), _queries(spark), k=10))
    want = brute_force(DOCS, QUERIES, k=10)
    assert got == want and len(got) > 0
    by_qid = {q: [x for x in got if x[0] == q] for q, _ in QUERIES}
    # 100: doc 1 matched twice ('fox' AND 'foxtrot' tails) -> pf=2 beats
    # doc 0's single 'quick brown fox' (rows are doc-sorted; pick rank 1)
    top100 = next(x for x in by_qid[100] if x[3] == 1)
    assert top100[1] == 1 and len(by_qid[100]) >= 2
    # m=1 pure prefix phrase hits the dense shared-prefix doc
    assert any(x[1] == 6 for x in by_qid[102])
    # empty expansion and absent fixed term produce NO hits
    assert by_qid[104] == [] and by_qid[105] == []


def test_max_expansions_cap_is_term_order(spark):
    # prefix 'fo' over doc 6's vocabulary {foam, fog, foil, fond, font}
    # plus {fox, foxtrot}: cap=2 keeps {foam, fog} (term asc), so doc 1
    # (fox/foxtrot tails only) drops out of qid 102's hits
    got = rows(phrase_prefix_search(_docs(spark), _queries(spark), k=10,
                                    max_expansions=2))
    want = brute_force(DOCS, QUERIES, k=10, max_expansions=2)
    assert got == want
    q102 = [x for x in got if x[0] == 102]
    assert q102 and all(x[1] == 6 for x in q102)


@pytest.mark.parametrize("codec", ["varint", "pfor"])
def test_index_matches_exhaustive(spark, codec):
    path = tempfile.mkdtemp(prefix="ppidx_")
    build_positional_index(
        _docs(spark).repartition(3, "doc_id"), path, segment_size=3, codec=codec
    )
    got = rows(phrase_prefix_search_index(spark, path, _queries(spark), k=10))
    want = rows(phrase_prefix_search(_docs(spark), _queries(spark), k=10))
    assert got == want and len(got) > 0


def test_index_iterable_queries_and_cap(spark):
    path = tempfile.mkdtemp(prefix="ppidx_")
    build_positional_index(_docs(spark).repartition(2, "doc_id"), path,
                           segment_size=4)
    got = rows(phrase_prefix_search_index(
        spark, path, [(102, "fo"), (100, "quick brown fo")], k=10,
        max_expansions=2,
    ))
    want = brute_force(DOCS, [(102, "fo"), (100, "quick brown fo")], k=10,
                       max_expansions=2)
    assert got == want and len(got) > 0


def test_index_empty_queries(spark):
    path = tempfile.mkdtemp(prefix="ppidx_")
    build_positional_index(_docs(spark), path)
    assert phrase_prefix_search_index(spark, path, [], k=10).count() == 0
    assert phrase_prefix_search_index(spark, path, [(1, "  ")], k=10).count() == 0


def test_no_broadcast_identity(spark):
    got = rows(phrase_prefix_search(_docs(spark), _queries(spark), k=10,
                                    broadcast_queries=False))
    want = rows(phrase_prefix_search(_docs(spark), _queries(spark), k=10))
    assert got == want and len(got) > 0


# ---- registry gate twins --------------------------------------------------


def _duck(sf):
    import duckdb

    from sgpt_spark.sources.tables import TABLES

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    return con


def _cmp(sdf, sql, con):
    def norm(v):
        return round(v, 6) if isinstance(v, float) else v

    cols = sorted(sdf.columns)
    got = sorted(tuple(norm(r[c]) for c in cols) for r in sdf.collect())
    duck = con.sql(sql)
    idx = [list(duck.columns).index(c) for c in cols]
    want = sorted(tuple(norm(row[i]) for i in idx) for row in duck.fetchall())
    assert sorted(duck.columns) == cols
    assert got == want and len(got) > 0


def test_phrase_prefix_gate_oracle_equality(spark):
    import __spark_entry__ as em

    sf = "/root/testdata/sf0.001"
    key = "bm25_phrase_prefix_index_top10"
    _cmp(em.queries()[key](spark, sf), em.oracle_sql()[key], _duck(sf))


def test_bm25_standard_duckdb_equality(spark):
    """bm25_standard_top10 ceded its driver-window slot to
    bm25_phrase_prefix_index_top10 (round 5); the exact registry query
    vs the exact registry SQL equality lives here (its index sibling
    bm25_standard_index_top10 keeps the analyzer evidence gated)."""
    import __spark_entry__ as em

    sf = "/root/testdata/sf0.001"
    _cmp(em.queries()["bm25_standard_top10"](spark, sf), em._BM25_STANDARD_SQL,
         _duck(sf))
