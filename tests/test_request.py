"""ES _search body executor (operators/request.py): every routed
branch compared row-for-row against its direct operator call over the
shared toy corpus (the dispatcher must add no semantics), layout
resolution (plain / positional / multifield), paging (size/from/
min_score/search_after), the response-shaping features (sort, aggs,
collapse, rescore, highlight), and the loud-guard surface."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sgpt_spark.operators.indexer import (
    build_multifield_index,
    build_postings_with_docvalues,
    read_docvalues,
    write_docvalues,
    write_index,
)
from sgpt_spark.operators.positions import build_positional_index
from sgpt_spark.operators.request import search_request

pytestmark = pytest.mark.usefixtures("spark")

DOCS = [
    (0, "quick brown fox jumps high", "en", 150),
    (1, "quick dog runs", "en", 40),
    (2, "lazy dog sleeps all day", "es", 260),
    (3, "quick quick brown bear", "es", 155),
    (4, "a cat naps", "fr", 30),
    (5, "brown bear quick paws", None, 520),
    (6, "unrelated words only here", "de", 99),
    (7, "quick brown dance party", "en", 41),
]
SCHEMA = "doc_id long, text string, lang string, n_chars long"


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("req")
    docs = spark.createDataFrame(DOCS, SCHEMA)
    plain = str(tmp / "plain")
    postings, dv, meta = build_postings_with_docvalues(
        docs, ["lang", "n_chars"], segment_size=3
    )
    write_index(postings, meta, plain)
    write_docvalues(dv, plain)
    pos = str(tmp / "pos")
    build_positional_index(docs.select("doc_id", "text"), pos, segment_size=3)
    mf = str(tmp / "mf")
    mf_docs = docs.withColumn(
        "title",
        F.array_join(F.slice(F.split("text", " ", -1), 1, 2), " "),
    ).select("doc_id", "title", "text")
    build_multifield_index(mf_docs, mf, segment_size=3)
    return {
        "docs": docs, "plain": plain, "pos": pos, "mf": mf,
        "dv": read_docvalues(spark, plain),
        "postings": postings, "meta": meta, "mf_docs": mf_docs,
    }


def _rows(df):
    return sorted(
        (r["qid"], r["doc_id"], round(r["score"], 6), r["rank"])
        for r in df.collect()
    )


def test_match_routes_to_search_index(spark, idx):
    from sgpt_spark.operators.index_search import search_index
    from sgpt_spark.operators.indexer import read_index, read_term_stats

    postings, meta = read_index(spark, idx["plain"])
    ts = read_term_stats(spark, idx["plain"])
    got = search_request(
        spark, idx["plain"],
        {"query": {"match": {"text": {"query": "quick brown",
                                      "operator": "and"}}}, "size": 5},
    )["hits"]
    want = search_index(
        spark, postings, meta, [(0, "quick brown")], k=5, term_stats=ts,
        operator="and",
    )
    assert _rows(got) == _rows(want)


def test_paging_from_min_score_search_after(spark, idx):
    from sgpt_spark.operators.index_search import search_index
    from sgpt_spark.operators.indexer import read_index, read_term_stats

    postings, meta = read_index(spark, idx["plain"])
    ts = read_term_stats(spark, idx["plain"])
    full = _rows(search_index(spark, postings, meta, [(0, "quick brown")],
                              k=8, term_stats=ts))
    # from=2 size=3 -> absolute ranks 3..5
    page = _rows(search_request(
        spark, idx["plain"],
        {"query": {"match": {"text": "quick brown"}}, "from": 2, "size": 3},
    )["hits"])
    assert page == [r for r in full if 3 <= r[3] <= 5]
    # min_score drops low hits and re-ranks 1..n
    ms = full[2][2]  # third-best score
    msr = _rows(search_request(
        spark, idx["plain"],
        {"query": {"match": {"text": "quick brown"}}, "min_score": ms,
         "size": 10},
    )["hits"])
    kept = [r for r in full if r[2] >= ms]
    assert [(q, d, s) for q, d, s, _ in msr] == [(q, d, s) for q, d, s, _ in kept]
    assert [rk for _, _, _, rk in msr] == list(range(1, len(kept) + 1))
    # search_after cursor at rank 2 -> page equals ranks 3.. re-ranked
    by_rank = sorted(full, key=lambda r: r[3])
    cur = by_rank[1]
    sa = _rows(search_request(
        spark, idx["plain"],
        {"query": {"match": {"text": "quick brown"}},
         "search_after": [cur[2], cur[1]], "size": 3},
    )["hits"])
    assert [(d, s) for _, d, s, _ in sorted(sa, key=lambda r: r[3])] == [
        (d, s) for _, d, s, _ in by_rank[2:5]
    ]


def test_match_phrase_and_rescore_and_highlight(spark, idx):
    from sgpt_spark.operators.positions import phrase_search_index
    from sgpt_spark.operators.rescore import rescore_index

    got = search_request(
        spark, idx["pos"],
        {"query": {"match_phrase": {"text": "quick brown"}}, "size": 5},
    )["hits"]
    want = phrase_search_index(spark, idx["pos"], [(0, "quick brown")], k=5)
    assert _rows(got) == _rows(want)
    # rescore: match window re-scored by the phrase
    resp = search_request(
        spark, idx["pos"],
        {"query": {"match": {"text": "quick brown"}},
         "rescore": {"window_size": 10,
                     "query": {"rescore_query":
                               {"match_phrase": {"text": "quick brown"}},
                               "rescore_query_weight": 2.0}},
         "size": 5},
    )
    want_r = rescore_index(
        spark, idx["pos"], [(0, "quick brown")], k=5, window_size=10,
        rescore_queries=[(0, "quick brown")], rescore_query_weight=2.0,
    )
    assert _rows(resp["hits"]) == _rows(want_r)
    # highlight rides the positional layout
    resp_h = search_request(
        spark, idx["pos"],
        {"query": {"match": {"text": "quick brown"}}, "size": 3,
         "highlight": {"fields": {"text": {}}}},
    )
    hl = resp_h["highlight"].collect()
    assert len(hl) > 0 and {r["term"] for r in hl} <= {"quick", "brown"}


def test_multi_match_types(spark, idx):
    from sgpt_spark.operators.crossfields import multi_match_index

    for mm_type in ("best_fields", "most_fields", "cross_fields"):
        got = search_request(
            spark, idx["mf"],
            {"query": {"multi_match": {"query": "quick brown",
                                       "fields": ["title^2", "text"],
                                       "type": mm_type}}, "size": 5},
        )["hits"]
        want = multi_match_index(
            spark, idx["mf"], [(0, "quick brown")], mm_type=mm_type, k=5,
            fields=("title", "text"), boosts={"title": 2.0},
        )
        assert _rows(got) == _rows(want)


def test_bool_with_structured_filters(spark, idx):
    from sgpt_spark.operators.boolquery import bool_search_index
    from sgpt_spark.operators.indexer import read_index, read_term_stats

    postings, meta = read_index(spark, idx["plain"])
    ts = read_term_stats(spark, idx["plain"])
    body = {"query": {"bool": {
        "must": [{"match": {"text": "quick"}}],
        "should": [{"match": {"text": "brown"}}],
        "must_not": [{"match": {"text": "dance"}}],
        "filter": [{"range": {"n_chars": {"gte": 40, "lt": 600}}},
                   {"exists": {"field": "lang"}}],
    }}, "size": 10}
    got = search_request(
        spark, idx["plain"], body, docvalues=idx["dv"]
    )["hits"]
    want = bool_search_index(
        spark, postings, meta,
        [(0, "must", "quick"), (0, "should", "brown"), (0, "must_not", "dance")],
        k=10, term_stats=ts,
        filters=[(0, "filter", "n_chars", "gte", 40),
                 (0, "filter", "n_chars", "lt", 600),
                 (0, "filter", "lang", "exists", None)],
        docvalues=idx["dv"],
    )
    assert _rows(got) == _rows(want)


def test_constant_score_ids_match_all(spark, idx):
    got = _rows(search_request(
        spark, idx["plain"],
        {"query": {"constant_score": {"filter": {"match": {"text": "quick"}},
                                      "boost": 2.5}}, "size": 10},
    )["hits"])
    assert got and all(s == 2.5 for _, _, s, _ in got)
    got_ids = _rows(search_request(
        spark, idx["plain"], {"query": {"ids": {"values": [2, 5, 99]}}},
        docvalues=idx["dv"],
    )["hits"])
    assert [d for _, d, _, _ in got_ids] == [2, 5]
    got_all = _rows(search_request(
        spark, idx["plain"], {"query": {"match_all": {}}, "size": 3},
        docvalues=idx["dv"],
    )["hits"])
    assert [d for _, d, _, _ in got_all] == [0, 1, 2]


def test_multiterm_and_terms_set(spark, idx):
    from sgpt_spark.operators.indexer import read_index, read_term_stats
    from sgpt_spark.operators.multiterm import fuzzy_search_index, prefix_search_index
    from sgpt_spark.operators.termset import terms_set_search_index

    postings, meta = read_index(spark, idx["plain"])
    ts = read_term_stats(spark, idx["plain"])
    got = search_request(
        spark, idx["plain"], {"query": {"prefix": {"text": "qui"}}, "size": 10}
    )["hits"]
    want = prefix_search_index(spark, postings, meta, [(0, "qui")], k=10,
                               term_stats=ts)
    assert _rows(got) == _rows(want)
    got_f = search_request(
        spark, idx["plain"],
        {"query": {"fuzzy": {"text": {"value": "quik"}}}, "size": 10},
    )["hits"]
    want_f = fuzzy_search_index(spark, postings, meta, [(0, "quik")], k=10,
                                term_stats=ts)
    assert _rows(got_f) == _rows(want_f)
    got_t = search_request(
        spark, idx["plain"],
        {"query": {"terms_set": {"text": {"terms": ["quick", "brown", "dog"],
                                          "minimum_should_match": 2}}},
         "size": 10},
    )["hits"]
    want_t = terms_set_search_index(
        spark, postings, meta, [(0, ["quick", "brown", "dog"])], k=10,
        msm_min=2, term_stats=ts,
    )
    assert _rows(got_t) == _rows(want_t)


def test_query_string_family(spark, idx):
    from sgpt_spark.operators.luceneqs import query_string_search_index
    from sgpt_spark.operators.querystring import simple_query_string_index

    got = search_request(
        spark, idx["pos"],
        {"query": {"query_string": {"query": 'quick AND (brown OR dog)'}},
         "size": 10},
    )["hits"]
    want = query_string_search_index(
        spark, idx["pos"], [(0, 'quick AND (brown OR dog)')], k=10
    )
    assert _rows(got) == _rows(want)
    got_s = search_request(
        spark, idx["pos"],
        {"query": {"simple_query_string": {"query": 'quick +brown -dance'}},
         "size": 10},
    )["hits"]
    want_s = simple_query_string_index(
        spark, idx["pos"], [(0, 'quick +brown -dance')], k=10
    )
    assert _rows(got_s) == _rows(want_s)


def test_sort_aggs_collapse(spark, idx):
    from sgpt_spark.operators.aggs import match_candidates, stats_agg, terms_agg
    from sgpt_spark.operators.collapse import collapse_search
    from sgpt_spark.operators.fieldsort import sort_search_index
    from sgpt_spark.operators.funcscore import match_scores
    from sgpt_spark.operators.indexer import read_index, read_term_stats

    postings, meta = read_index(spark, idx["plain"])
    ts = read_term_stats(spark, idx["plain"])
    resp = search_request(
        spark, idx["plain"],
        {"query": {"match": {"text": "quick brown"}},
         "sort": [{"lang": "asc"}, {"n_chars": {"order": "desc"}}],
         "size": 5,
         "aggs": {"langs": {"terms": {"field": "lang"},
                            "aggs": {"avg_chars": {"avg": {"field": "n_chars"}}}},
                  "chars": {"stats": {"field": "n_chars"}}}},
        docvalues=idx["dv"],
    )
    want_sorted = sort_search_index(
        spark, postings, meta, [(0, "quick brown")], idx["dv"],
        [("lang", "asc"), ("n_chars", "desc")], k=5,
    )
    assert sorted(map(tuple, resp["hits"].collect())) == sorted(
        map(tuple, want_sorted.collect())
    )
    cand = match_candidates(spark, postings, meta, [(0, "quick brown")])
    want_terms = terms_agg(cand, idx["dv"], "lang", size=10,
                           metrics=[("avg", "n_chars")])
    assert sorted(map(tuple, resp["aggregations"]["langs"].collect())) == sorted(
        map(tuple, want_terms.collect())
    )
    want_stats = stats_agg(cand, idx["dv"], "n_chars")
    assert sorted(map(tuple, resp["aggregations"]["chars"].collect())) == sorted(
        map(tuple, want_stats.collect())
    )
    # collapse
    resp_c = search_request(
        spark, idx["plain"],
        {"query": {"match": {"text": "quick brown"}},
         "collapse": {"field": "lang"}, "size": 5},
        docvalues=idx["dv"],
    )
    scored = match_scores(spark, postings, meta, [(0, "quick brown")],
                          term_stats=ts)
    want_c = collapse_search(scored, idx["dv"], "lang", k=5)
    assert sorted(map(tuple, resp_c["hits"].collect())) == sorted(
        map(tuple, want_c.collect())
    )


def test_guards(spark, idx):
    with pytest.raises(ValueError, match="unsupported body keys"):
        search_request(spark, idx["plain"], {"query": {}, "explain": True})
    with pytest.raises(ValueError, match="unknown query kind"):
        search_request(spark, idx["plain"], {"query": {"geo_shape": {}}})
    with pytest.raises(ValueError, match="dis_max_match_index"):
        search_request(spark, idx["plain"], {"query": {"dis_max": {}}})
    with pytest.raises(ValueError, match="multifield"):
        search_request(
            spark, idx["plain"],
            {"query": {"multi_match": {"query": "x", "fields": ["a", "b"]}}},
        )
    with pytest.raises(ValueError, match="single-field index layout"):
        search_request(spark, idx["mf"], {"query": {"match": {"text": "x"}}})
    with pytest.raises(ValueError, match="docvalues sidecar"):
        search_request(spark, idx["plain"], {"query": {"ids": {"values": [1]}}})
    with pytest.raises(ValueError, match="positional index layout"):
        search_request(
            spark, idx["plain"],
            {"query": {"match_phrase": {"text": "quick brown"}}},
        )
    with pytest.raises(ValueError, match="exactly one clause"):
        search_request(
            spark, idx["plain"],
            {"query": {"match": {"text": "x"}, "ids": {"values": [1]}}},
        )
