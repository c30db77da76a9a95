"""PForDelta bit-packed block codec (north_star: "varint/PForDelta"):
encode/decode round-trips, batch-decode equivalence, and full search
identity between varint- and pfor-coded indexes under every strategy."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from sgpt_spark.functions.compress import (
    pfor_decode,
    pfor_decode_many,
    pfor_encode,
    varint_encode,
)


@given(
    st.lists(
        st.integers(min_value=0, max_value=2**64 - 1), min_size=0, max_size=300
    )
)
@settings(max_examples=200, deadline=None)
def test_pfor_roundtrip(vals):
    v = np.array(vals, dtype=np.uint64)
    enc = pfor_encode(v)
    out = pfor_decode(enc, len(v))
    assert out.dtype == np.uint64
    assert np.array_equal(out, v)


@given(
    st.lists(
        st.lists(st.integers(min_value=0, max_value=2**64 - 1), min_size=0, max_size=40),
        min_size=0,
        max_size=20,
    )
)
@settings(max_examples=100, deadline=None)
def test_pfor_decode_many_equals_per_buffer(groups):
    bufs = [pfor_encode(np.array(g, dtype=np.uint64)) for g in groups]
    counts = np.array([len(g) for g in groups], dtype=np.int64)
    got = pfor_decode_many(bufs, counts)
    want = (
        np.concatenate([np.array(g, dtype=np.uint64) for g in groups])
        if groups and any(groups)
        else np.empty(0, dtype=np.uint64)
    )
    assert np.array_equal(got, want if len(want) else got[:0])


def test_pfor_skewed_values_beat_varint_when_mostly_small():
    """The codec's reason to exist: a block of small deltas with a few
    huge outliers packs tighter than varint (outliers become patched
    exceptions instead of widening every value)."""
    rng = np.random.default_rng(7)
    v = rng.integers(1, 2**7, size=128).astype(np.uint64)
    v[[5, 77]] = np.uint64(2**40)  # two outliers
    pf = pfor_encode(v)
    vi = varint_encode(v)
    assert np.array_equal(pfor_decode(pf, len(v)), v)
    assert len(pf) < len(vi)


def test_batch_block_encode_matches_single_buffer_encode():
    """encode_blocks_batch(codec=pfor) must emit byte-identical buffers
    to independent pfor_encode calls on the same value slices — the
    batched width choice may not drift from the single-buffer one."""
    from sgpt_spark.functions.compress import decode_blocks, encode_blocks_batch

    rng = np.random.default_rng(21)
    n = 5000
    ids = np.sort(rng.choice(200_000, n, replace=False)).astype(np.int64)
    tfs = rng.integers(1, 30, n).astype(np.uint64)
    dls = rng.integers(20, 400, n).astype(np.uint64)
    tfs[rng.integers(0, n, 5)] = np.uint64(2**40)  # exception-forcing outliers
    starts = np.arange(0, n, 997)
    ends = np.minimum(starts + 997, n)
    groups = encode_blocks_batch(ids, tfs, dls, starts, ends, codec="pfor")
    for gi in (0, len(groups) - 1):
        for blk in groups[gi]:
            # re-derive the block's source slice from decode, then re-encode
            d, t, l = decode_blocks([blk], "pfor")
            assert blk["tfs"] == pfor_encode(t)
            assert blk["dls"] == pfor_encode(l)
            assert blk["doc_deltas"] == pfor_encode(np.diff(d).astype(np.uint64))


def test_pfor_buffers_beyond_u16_positions():
    """Buffers longer than 65536 values must still round-trip: u16
    exception positions would wrap, so such buffers are forced onto
    exception-free widths (round-4 review regression)."""
    v = np.ones(70_001, dtype=np.uint64)
    v[70_000] = np.uint64(2**50)  # outlier whose position exceeds 0xFFFF
    assert np.array_equal(pfor_decode(pfor_encode(v), len(v)), v)
    v2 = np.ones(65_536, dtype=np.uint64)
    v2[65_535] = np.uint64(2**50)  # boundary: position 0xFFFF still fits
    assert np.array_equal(pfor_decode(pfor_encode(v2), len(v2)), v2)


def test_pfor_all_zero_and_all_huge():
    z = np.zeros(100, dtype=np.uint64)
    assert np.array_equal(pfor_decode(pfor_encode(z), 100), z)
    h = np.full(50, 2**63, dtype=np.uint64)
    assert np.array_equal(pfor_decode(pfor_encode(h), 50), h)


def _mini_corpus(spark, n=80):
    from sgpt_spark.sources.pages import _VOCAB, _doc_terms

    rows = [(i, " ".join(_VOCAB[_doc_terms(i)][:60])) for i in range(n)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_index_search_identity_across_codecs(spark, tmp_path):
    """Build the same corpus under codec=varint and codec=pfor: every
    query strategy must return identical rows, and meta must record the
    codec for the query side to pick up."""
    from sgpt_spark.operators.index_search import search_index, search_index_join
    from sgpt_spark.operators.indexer import build_index, read_index, read_term_stats

    docs = _mini_corpus(spark)
    queries = spark.createDataFrame(
        [(i, " ".join(r["text"].split(" ")[:5]))
         for i, r in enumerate(docs.collect()) if i % 9 == 0],
        "qid long, query string",
    )
    results = {}
    for codec in ("varint", "pfor"):
        path = str(tmp_path / f"idx_{codec}")
        meta = build_index(docs.repartition(4), path, codec=codec)
        assert meta.codec == codec
        postings, meta_r = read_index(spark, path)
        assert meta_r.codec == codec
        ts = read_term_stats(spark, path)
        for strat in ("taat", "wand", "exhaustive"):
            rows = sorted(
                tuple(r)
                for r in search_index(
                    spark, postings, meta_r, queries, k=10,
                    strategy=strat, term_stats=ts,
                ).collect()
            )
            results[(codec, strat)] = rows
        results[(codec, "join")] = sorted(
            tuple(r)
            for r in search_index_join(
                spark, postings, meta_r, queries, k=10
            ).collect()
        )
    base = results[("varint", "taat")]
    assert base, "non-empty results"
    for key, rows in results.items():
        assert rows == base, key


def test_compaction_preserves_pfor_results(spark, tmp_path):
    from sgpt_spark.operators.index_search import search_index
    from sgpt_spark.operators.indexer import build_index, compact_index, read_index

    docs = _mini_corpus(spark, n=90)
    path = str(tmp_path / "idx_pfor_compact")
    build_index(docs.repartition(6), path, codec="pfor")
    postings, meta = read_index(spark, path)
    queries = spark.createDataFrame(
        [(i, " ".join(r["text"].split(" ")[:4]))
         for i, r in enumerate(docs.collect()) if i % 30 == 0],
        "qid long, query string",
    )
    before = sorted(
        tuple(r) for r in search_index(spark, postings, meta, queries, k=10).collect()
    )
    n = compact_index(spark, path, 2)
    assert n == 2
    postings2, meta2 = read_index(spark, path)
    after = sorted(
        tuple(r) for r in search_index(spark, postings2, meta2, queries, k=10).collect()
    )
    assert after == before and before


def test_multifield_rejects_codec_mismatch(spark, tmp_path):
    import json
    import os

    from pyspark.sql import functions as F

    from sgpt_spark.operators.index_search import search_multifield_index
    from sgpt_spark.operators.indexer import build_multifield_index

    rows = [(i, f"t{i % 3} shared", f"b{i % 4} shared x{i}") for i in range(20)]
    docs = spark.createDataFrame(rows, "doc_id long, title string, text string")
    out = str(tmp_path / "mf_codec")
    build_multifield_index(docs, out, segment_size=7)
    mp = os.path.join(out, "title_index", "meta.json")
    meta = json.load(open(mp))
    meta["codec"] = "pfor"
    json.dump(meta, open(mp, "w"))
    queries = spark.createDataFrame([(1, "shared")], "qid long, query string")
    with pytest.raises(ValueError, match="disagree on codec"):
        search_multifield_index(spark, out, queries, k=5)
