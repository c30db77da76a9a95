"""Positional index + index-backed phrase search (operators/positions):
value identity against the exhaustive phrase path and the plain index
build, both codecs, both compaction regimes (verbatim doc-disjoint and
decode-merge overlapping), incremental append delegation, and the loud
guards. Also a corpus-scale identity over the sf0.001 documents table
(the shape the driver gate runs at sf0.01)."""

from __future__ import annotations

import tempfile

import numpy as np
import pytest
from pyspark.sql import functions as F

from sgpt_spark.functions.analyzer import analyze_py, tokenize_standard
from sgpt_spark.operators.indexer import (
    build_index,
    compact_index,
    read_index,
    read_term_stats,
)
from sgpt_spark.operators.index_search import search_index
from sgpt_spark.operators.phrase import phrase_search
from sgpt_spark.operators.positions import (
    POSITIONS,
    _decode_rows,
    _encode_ranges_packed,
    append_to_positional_index,
    build_positional_index,
    phrase_search_index,
    read_positional_index,
    spark_read_positions,
)
from tests.test_phrase import DOCS, QUERIES

pytestmark = pytest.mark.usefixtures("spark")


def rows(df):
    return sorted(
        (r["qid"], r["doc_id"], round(r["score"], 6), r["rank"]) for r in df.collect()
    )


def _docs(spark, n_parts=3, by="hash"):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    if by == "range":
        return df.repartitionByRange(n_parts, "doc_id")
    return df.repartition(n_parts, "doc_id")


def _queries(spark):
    return spark.createDataFrame(QUERIES, "qid long, query string")


def _build(spark, tmpdir_prefix="posidx_", codec="varint", n_parts=3, by="hash",
           py_tokenizer=None):
    path = tempfile.mkdtemp(prefix=tmpdir_prefix)
    build_positional_index(
        _docs(spark, n_parts, by), path, segment_size=3, codec=codec,
        py_tokenizer=py_tokenizer,
    )
    return path


# ---- encode/decode units ---------------------------------------------------


@pytest.mark.parametrize("codec", ["varint", "pfor"])
def test_encode_ranges_roundtrip(codec):
    from sgpt_spark.functions.compress import decode_columns_many

    rng = np.random.RandomState(7)
    vals = rng.randint(0, 1 << 40, size=999).astype(np.uint64)
    starts = np.array([0, 10, 10, 500], dtype=np.int64)  # incl. empty range
    ends = np.array([10, 10, 500, 999], dtype=np.int64)
    data, off = _encode_ranges_packed(vals, starts, ends, codec)
    bufs = [data.tobytes()[off[i]: off[i + 1]] for i in range(len(starts))]
    got = decode_columns_many(bufs, ends - starts, codec)
    assert np.array_equal(got, vals)


# ---- identity vs the exhaustive phrase path --------------------------------


@pytest.mark.parametrize("codec", ["varint", "pfor"])
def test_phrase_index_matches_exhaustive(spark, codec):
    path = _build(spark, codec=codec)
    got = rows(phrase_search_index(spark, path, _queries(spark), k=10,
                                   term_stats=read_term_stats(spark, path)))
    want = rows(phrase_search(
        spark.createDataFrame(DOCS, "doc_id long, text string"), _queries(spark), k=10
    ))
    assert got == want and len(got) > 0


def test_phrase_index_standard_analyzer(spark):
    path = _build(spark, py_tokenizer=analyze_py)
    qs = spark.createDataFrame([(1, "Quick, Brown FOX!")], "qid long, query string")
    got = rows(phrase_search_index(spark, path, qs, k=10))
    want = rows(phrase_search(
        spark.createDataFrame(DOCS, "doc_id long, text string"), qs, k=10,
        tokenizer=tokenize_standard,
    ))
    assert got == want and len(got) > 0


def test_phrase_index_iterable_queries_and_empty(spark):
    path = _build(spark)
    got = rows(phrase_search_index(spark, path, [(100, "quick brown fox")], k=10))
    assert {d for _, d, _, _ in got} == {0, 1}
    assert phrase_search_index(spark, path, [(1, "   "), (2, None)]).count() == 0
    assert phrase_search_index(
        spark, path, [(1, "absentterm quick")]
    ).count() == 0  # corpus-absent term -> no phrase can match


# ---- derived postings == plain build ----------------------------------------


@pytest.mark.parametrize("codec", ["varint", "pfor"])
def test_match_query_identity_and_meta(spark, codec):
    path = _build(spark, codec=codec)
    plain = tempfile.mkdtemp(prefix="plainidx_")
    build_index(_docs(spark), plain, segment_size=3, codec=codec)
    p1, m1 = read_index(spark, path)
    p2, m2 = read_index(spark, plain)
    qs = _queries(spark)
    assert rows(search_index(spark, p1, m1, qs, k=10)) == rows(
        search_index(spark, p2, m2, qs, k=10)
    )
    assert (m1.n_docs, m1.total_len, m1.next_doc_id, m1.avgdl) == (
        m2.n_docs, m2.total_len, m2.next_doc_id, m2.avgdl
    )
    assert m1.positions and not m2.positions
    ts1 = sorted((r["term"], r["df"]) for r in read_term_stats(spark, path).collect())
    ts2 = sorted((r["term"], r["df"]) for r in read_term_stats(spark, plain).collect())
    assert ts1 == ts2


# ---- compaction: both regimes ----------------------------------------------


@pytest.mark.parametrize("codec", ["varint", "pfor"])
@pytest.mark.parametrize("by", ["range", "hash"])
def test_compact_preserves_phrase_and_match(spark, codec, by):
    """range -> doc-disjoint segments (verbatim SQL concat); hash ->
    overlapping doc ranges (decode-merge regime). Both must preserve
    phrase AND match results exactly, through the shared seg map."""
    path = _build(spark, codec=codec, n_parts=4, by=by)
    qs = _queries(spark)
    before_p = rows(phrase_search_index(spark, path, qs, k=10))
    _, meta = read_index(spark, path)
    before_m = rows(search_index(spark, *read_index(spark, path), qs, k=10))
    n_new = compact_index(spark, path, 2)
    assert n_new == 2
    segs = {
        r["segment"]
        for r in spark_read_positions(spark, path).select("segment").distinct().collect()
    }
    assert segs == {0, 1}
    assert rows(phrase_search_index(spark, path, qs, k=10)) == before_p
    assert rows(search_index(spark, *read_index(spark, path), qs, k=10)) == before_m
    # sentinel stats must survive for future appends/meta rebuilds
    sent = (
        spark_read_positions(spark, path)
        .filter(F.col("term").isNull())
        .agg(F.sum("df").alias("n"), F.sum("n_pos").alias("t"))
        .collect()[0]
    )
    assert (int(sent["n"]), int(sent["t"])) == (meta.n_docs, meta.total_len)


def test_compact_to_one_segment(spark):
    path = _build(spark, n_parts=4, by="hash")
    qs = _queries(spark)
    before = rows(phrase_search_index(spark, path, qs, k=10))
    compact_index(spark, path, 1)
    assert rows(phrase_search_index(spark, path, qs, k=10)) == before


# ---- incremental append ------------------------------------------------------


@pytest.mark.parametrize("codec", ["varint", "pfor"])
def test_append_equals_rebuild(spark, codec):
    """append_to_index DELEGATES to the positional append; the appended
    index must equal a full positional rebuild over the union corpus on
    both the phrase and the match paths, and its meta must match."""
    from sgpt_spark.streaming.incremental import append_to_index

    half1 = [(f"u{d:03d}", t) for d, t in DOCS[:4]]
    half2 = [(f"u{d:03d}", t) for d, t in DOCS[4:]]
    path = tempfile.mkdtemp(prefix="posappend_")
    # deterministic ids 0..3 on one partition
    docs1 = spark.createDataFrame(
        [(i, t) for i, (_, t) in enumerate(sorted(half1))], "doc_id long, text string"
    ).coalesce(1)
    build_positional_index(docs1, path, segment_size=2, codec=codec)
    meta = append_to_index(
        spark, spark.createDataFrame(half2, "url string, text string"), path
    )
    assert meta.positions and meta.n_docs == len(DOCS)

    full = tempfile.mkdtemp(prefix="posfull_")
    union = sorted(half1) + sorted(half2)
    docs_all = spark.createDataFrame(
        [(i, t) for i, (_, t) in enumerate(union)], "doc_id long, text string"
    ).coalesce(1)
    build_positional_index(docs_all, full, segment_size=2, codec=codec)

    qs = _queries(spark)
    assert rows(phrase_search_index(spark, path, qs, k=10)) == rows(
        phrase_search_index(spark, full, qs, k=10)
    )
    assert rows(search_index(spark, *read_index(spark, path), qs, k=10)) == rows(
        search_index(spark, *read_index(spark, full), qs, k=10)
    )
    m_full = read_index(spark, full)[1]
    assert (meta.n_docs, meta.total_len, meta.avgdl) == (
        m_full.n_docs, m_full.total_len, m_full.avgdl
    )

    # append -> compact -> still identical
    before = rows(phrase_search_index(spark, path, qs, k=10))
    compact_index(spark, path, 1)
    assert rows(phrase_search_index(spark, path, qs, k=10)) == before


# ---- guards -----------------------------------------------------------------


def test_plain_index_refuses_phrase(spark):
    plain = tempfile.mkdtemp(prefix="plainidx_")
    build_index(_docs(spark), plain, segment_size=3)
    with pytest.raises(ValueError, match="no positional sidecar"):
        read_positional_index(spark, plain)
    with pytest.raises(ValueError, match="no positional sidecar"):
        phrase_search_index(spark, plain, _queries(spark))


def test_positional_append_refuses_plain(spark):
    plain = tempfile.mkdtemp(prefix="plainidx_")
    build_index(_docs(spark), plain, segment_size=3)
    with pytest.raises(ValueError, match="not positional"):
        append_to_positional_index(
            spark,
            spark.createDataFrame([("u", "x")], "url string, text string"),
            plain,
        )


def test_bad_codec_refused(spark):
    with pytest.raises(ValueError, match="unknown codec"):
        build_positional_index(_docs(spark), tempfile.mkdtemp(), codec="zstd")


# ---- corpus-scale identity (the gate's shape) --------------------------------


def test_sf0001_documents_identity(spark):
    """Exhaustive vs index-backed phrase top-10 over the sf0.001
    documents table with derived 5-token phrase queries — the exact
    shape the driver gate runs at sf0.01, including multi-batch Arrow
    decode and segment-pruned scans."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        F.col("doc_id").cast("long").alias("doc_id"), "text"
    )
    queries = (
        docs.orderBy("doc_id")
        .limit(30)
        .select(
            F.col("doc_id").alias("qid"),
            F.array_join(F.slice(F.split(F.trim(F.col("text")), " +"), 1, 5), " ").alias("query"),
        )
    )
    path = tempfile.mkdtemp(prefix="possf_")
    build_positional_index(docs.repartition(4, "doc_id"), path, segment_size=200)
    got = rows(phrase_search_index(spark, path, queries, k=10,
                                   term_stats=read_term_stats(spark, path)))
    want = rows(phrase_search(docs, queries, k=10))
    assert got == want and len(got) > 0


# ---- in-plan cogroup phrase path ---------------------------------------------


@pytest.mark.parametrize("codec", ["varint", "pfor"])
def test_phrase_cogroup_matches_collect_path(spark, codec):
    """phrase_search_index_cogroup (queries never touch the driver) must
    be value-identical to the collect path — and therefore to the
    exhaustive path — incl. absent-term queries (dropped in-plan by the
    joined-row-count == m gate) and duplicate phrase terms."""
    from sgpt_spark.operators.positions import phrase_search_index_cogroup

    path = _build(spark, codec=codec, n_parts=4, by="hash")
    qs = _queries(spark)
    got = rows(phrase_search_index_cogroup(spark, path, qs, k=10))
    want = rows(phrase_search_index(spark, path, qs, k=10))
    assert got == want and len(got) > 0


def test_phrase_cogroup_iterables_and_term_stats(spark):
    from sgpt_spark.operators.positions import phrase_search_index_cogroup

    path = _build(spark)
    ts = read_term_stats(spark, path)
    got = rows(
        phrase_search_index_cogroup(
            spark, path, [(100, "quick brown fox"), (101, "a a")], k=10,
            term_stats=ts,
        )
    )
    want = rows(
        phrase_search_index(spark, path, [(100, "quick brown fox"), (101, "a a")], k=10)
    )
    assert got == want and len(got) > 0


def test_phrase_cogroup_after_compaction(spark):
    from sgpt_spark.operators.positions import phrase_search_index_cogroup

    path = _build(spark, n_parts=4, by="hash")
    qs = _queries(spark)
    before = rows(phrase_search_index_cogroup(spark, path, qs, k=10))
    compact_index(spark, path, 2)
    assert rows(phrase_search_index_cogroup(spark, path, qs, k=10)) == before
