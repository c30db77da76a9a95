"""Round-6 ADVICE closures (the r5 advisor's brief): loud guards where
the request router used to silently drop or die, string qids for
ids_query, and NULL-valued functions folding to not-applicable in
function_score combines."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

pytestmark = pytest.mark.usefixtures("spark")

DOCS = [
    (0, "quick brown fox jumps"),
    (1, "quick dog barks"),
    (2, "lazy dog sleeps"),
    (3, "quick quick brown"),
]


def _layout(spark, tmp_path):
    from sgpt_spark.operators.positions import build_positional_index

    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    path = str(tmp_path / "idx")
    build_positional_index(docs, path, segment_size=2)
    return docs, path


def test_search_after_with_sort_rescore_collapse_raises(spark, tmp_path):
    from sgpt_spark.operators.request import search_request

    docs, path = _layout(spark, tmp_path)
    for clash in (
        {"sort": [{"n_chars": "asc"}]},
        {"rescore": {"query": {}}},
        {"collapse": {"field": "lang"}},
    ):
        body = {
            "query": {"match": {"text": "quick"}},
            "search_after": [1.5, 2],
            **clash,
        }
        with pytest.raises(ValueError, match="search_after"):
            search_request(spark, path, body, qid=1)


def test_multiterm_spec_unknown_keys_raise(spark, tmp_path):
    from sgpt_spark.operators.request import search_request

    docs, path = _layout(spark, tmp_path)
    body = {"query": {"fuzzy": {"text": {"value": "quik", "boost": 2.0}}}}
    with pytest.raises(ValueError, match="fuzzy spec keys"):
        search_request(spark, path, body, qid=1)


def test_multiterm_fuzziness_maps_through(spark, tmp_path):
    """{"fuzzy": {..., "fuzziness": 1}} must answer the max_edits=1
    query, not the operator default (2)."""
    from sgpt_spark.operators.indexer import read_index
    from sgpt_spark.operators.multiterm import fuzzy_search_index
    from sgpt_spark.operators.request import search_request

    docs, path = _layout(spark, tmp_path)
    postings, meta = read_index(spark, path)
    got = search_request(
        spark, path,
        {"query": {"fuzzy": {"text": {"value": "quicc", "fuzziness": 1}}}},
        qid=1,
    )["hits"].collect()
    want = fuzzy_search_index(
        spark, postings, meta, [(1, "quicc")], k=10, max_edits=1
    ).collect()
    assert sorted((r["doc_id"], r["rank"]) for r in got) == sorted(
        (r["doc_id"], r["rank"]) for r in want
    )


def test_ids_query_string_qids(spark):
    from sgpt_spark.operators.compound import ids_query

    corpus = spark.createDataFrame(DOCS, "doc_id long, text string")
    out = ids_query(corpus, [("qA", [0, 2, 99]), ("qB", [1])], k=10)
    rows = sorted((r["qid"], r["doc_id"]) for r in out.collect())
    assert rows == [("qA", 0), ("qA", 2), ("qB", 1)]
    assert out.schema["qid"].dataType.simpleString() == "string"


@pytest.mark.parametrize("score_mode", ["multiply", "sum", "avg"])
def test_null_function_value_is_not_applicable(spark, score_mode):
    """A NULL-valued function must contribute nothing (not poison the
    combine): doc 2 has a NULL fv field; its final score must equal the
    no-function identity, not NULL."""
    from sgpt_spark.operators.funcscore import (
        _combine_functions,
        _compile_function,
    )

    df = spark.createDataFrame(
        [(0, 10.0), (1, 20.0), (2, None)], "doc_id long, fv double"
    )
    parts = [
        _compile_function(
            {"field_value_factor": {"field": "fv", "modifier": "none"}},
            ["fv"], 0,
        )
    ]
    out = {
        r["doc_id"]: r["c"]
        for r in df.select(
            "doc_id",
            _combine_functions(parts, score_mode).alias("c"),
        ).collect()
    }
    assert out[0] == pytest.approx(10.0)
    assert out[1] == pytest.approx(20.0)
    assert out[2] is not None  # used to be NULL
    assert out[2] == pytest.approx(1.0)  # the matched-by-no-function identity
