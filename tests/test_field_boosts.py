"""Per-field boosts on the multi-field BM25 paths (the ES
``multi_match`` ``"title^2"`` spelling: Lucene's per-clause query boost
multiplies that field's score BEFORE the best_fields combine). The
reference's BEIR BM25Search uses default boosts (1.0), so parity needs
only the mechanism — verified here as (a) unit math on the parser /
normalizer, (b) a hand-built ranking flip, (c) value identity across
all four engine paths, (d) the homogeneity property (a uniform boost
scales scores, never reorders)."""

from __future__ import annotations

import math
import tempfile

import pytest

from sgpt_spark.operators.index_search import (
    search_multifield_index,
    search_multifield_index_cogroup,
    search_multifield_index_join,
)
from sgpt_spark.operators.indexer import build_multifield_index
from sgpt_spark.operators.search import (
    bm25_multifield_search,
    normalize_boosts,
    parse_field_boosts,
)


def runs(rows):
    return sorted((r["qid"], r["rank"], r["doc_id"], r["score"]) for r in rows)


# ---- pure-math units ---------------------------------------------------


def test_parse_field_boosts():
    assert parse_field_boosts(["title^2", "text"]) == (
        ("title", "text"),
        {"title": 2.0},
    )
    assert parse_field_boosts(["title", "text"]) == (("title", "text"), None)
    assert parse_field_boosts(["a^0.5", "b^3"]) == (
        ("a", "b"),
        {"a": 0.5, "b": 3.0},
    )
    with pytest.raises(ValueError):
        parse_field_boosts(["^2"])
    with pytest.raises(ValueError):
        parse_field_boosts(["title^two"])
    with pytest.raises(ValueError, match="duplicate field"):
        parse_field_boosts(["title^2", "title"])


def test_normalize_boosts():
    assert normalize_boosts(("a", "b"), None) == {"a": 1.0, "b": 1.0}
    assert normalize_boosts(("a", "b"), {"b": 2.5}) == {"a": 1.0, "b": 2.5}
    with pytest.raises(ValueError, match="unknown fields"):
        normalize_boosts(("a",), {"zz": 2.0})
    for bad in (0.0, -1.0, math.inf, math.nan):
        with pytest.raises(ValueError, match="positive finite"):
            normalize_boosts(("a",), {"a": bad})


# ---- semantics: a title boost flips the winner -------------------------


def _fixture(spark):
    # doc 0 matches "needle" in TITLE only; doc 1 matches in BODY only
    # (longer field, higher tf). Unboosted, the body match outscores the
    # title match; title^4 flips it. Filler docs stabilize df/avgdl.
    rows = [
        (0, "needle topic", "alpha beta gamma delta epsilon zeta"),
        (1, "plain topic", "needle needle alpha beta gamma delta"),
    ] + [(i, f"filler{i} topic", f"alpha beta word{i} filler") for i in range(2, 30)]
    return spark.createDataFrame(rows, "doc_id long, title string, text string")


def test_boost_flips_ranking(spark):
    docs = _fixture(spark)
    queries = spark.createDataFrame([(1, "needle")], "qid long, query string")
    plain = bm25_multifield_search(docs, queries, k=2, tie_breaker=0.0).collect()
    boosted = bm25_multifield_search(
        docs, queries, k=2, tie_breaker=0.0, boosts={"title": 4.0}
    ).collect()
    top_plain = [r["doc_id"] for r in sorted(plain, key=lambda r: r["rank"])]
    top_boost = [r["doc_id"] for r in sorted(boosted, key=lambda r: r["rank"])]
    assert top_plain[0] == 1  # body tf wins unboosted
    assert top_boost[0] == 0  # title^4 wins boosted
    # and the boosted title score is 4x its unboosted self to within the
    # engine's 6-dp rounding (tie_breaker=0 keeps the winner's score =
    # its best field's score; round6(4x) vs 4*round6(x) can differ by up
    # to 2.5e-6)
    s_plain = {r["doc_id"]: r["score"] for r in plain}
    s_boost = {r["doc_id"]: r["score"] for r in boosted}
    assert s_boost[0] == pytest.approx(4.0 * s_plain[0], abs=3e-6)


def test_uniform_boost_is_a_pure_scale(spark):
    """best_fields is homogeneous: boosting EVERY field by c scales all
    scores by c and never reorders."""
    docs = _fixture(spark)
    queries = spark.createDataFrame(
        [(1, "needle topic"), (2, "alpha filler")], "qid long, query string"
    )
    plain = runs(bm25_multifield_search(docs, queries, k=5, tie_breaker=0.5).collect())
    scaled = runs(
        bm25_multifield_search(
            docs, queries, k=5, tie_breaker=0.5, boosts={"title": 3.0, "text": 3.0}
        ).collect()
    )
    assert [(q, rk, d) for q, rk, d, _ in plain] == [
        (q, rk, d) for q, rk, d, _ in scaled
    ]
    for (_, _, _, sp), (_, _, _, sc) in zip(plain, scaled):
        # engine scores are rounded to 6 dp (operators/topk.py), so the
        # scale relation holds to one rounding ulp
        assert sc == pytest.approx(3.0 * sp, abs=2e-6)


# ---- identity across all four engine paths ------------------------------


def test_boosts_identical_across_paths(spark):
    """Exhaustive, collect-index, join-index, and cogroup-index paths
    must produce the same boosted ranking (mixed boosts, both
    tie_breakers)."""
    docs = _fixture(spark)
    queries = spark.createDataFrame(
        [(1, "needle"), (2, "alpha topic"), (3, "word5 filler")],
        "qid long, query string",
    )
    out = tempfile.mkdtemp(prefix="sgpt_boost_")
    build_multifield_index(docs, out, fields=("title", "text"), segment_size=10)
    boosts = {"title": 2.0, "text": 0.5}
    for tb in (0.0, 0.5):
        want = runs(
            bm25_multifield_search(
                docs, queries, k=5, tie_breaker=tb, boosts=boosts
            ).collect()
        )
        assert want
        for search_fn in (
            search_multifield_index,
            search_multifield_index_join,
            search_multifield_index_cogroup,
        ):
            got = runs(
                search_fn(
                    spark, out, queries, k=5, tie_breaker=tb, boosts=boosts
                ).collect()
            )
            assert got == want, (search_fn.__name__, tb)


def test_unknown_boost_field_refused_on_index_paths(spark):
    docs = _fixture(spark)
    queries = spark.createDataFrame([(1, "needle")], "qid long, query string")
    out = tempfile.mkdtemp(prefix="sgpt_boost_bad_")
    build_multifield_index(docs, out, fields=("title", "text"), segment_size=10)
    for search_fn in (
        search_multifield_index,
        search_multifield_index_join,
        search_multifield_index_cogroup,
    ):
        with pytest.raises(ValueError, match="unknown fields"):
            search_fn(spark, out, queries, k=5, boosts={"body": 2.0})
