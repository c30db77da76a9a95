"""Codec round-trips: encode∘decode = id (SURVEY.md §7.2 step 3),
property-based via hypothesis."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from sgpt_spark.functions.compress import (
    decode_blocks,
    delta_decode,
    delta_encode,
    encode_blocks,
    varint_decode,
    varint_encode,
)


@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=500))
@settings(max_examples=200, deadline=None)
def test_varint_roundtrip(vals):
    arr = np.array(vals, dtype=np.uint64)
    assert np.array_equal(varint_decode(varint_encode(arr)), arr)


@given(
    st.lists(st.integers(min_value=0, max_value=2**40), min_size=1, max_size=400, unique=True)
)
@settings(max_examples=200, deadline=None)
def test_delta_roundtrip(ids):
    arr = np.sort(np.array(ids, dtype=np.int64))
    first, data = delta_encode(arr)
    assert np.array_equal(delta_decode(first, data, len(arr)), arr)


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10**9),  # doc_id
            st.integers(min_value=1, max_value=1000),  # tf
            st.integers(min_value=1, max_value=5000),  # dl
        ),
        min_size=1,
        max_size=600,
        unique_by=lambda t: t[0],
    )
)
@settings(max_examples=100, deadline=None)
def test_blocks_roundtrip(postings):
    docs = np.array([p[0] for p in postings], dtype=np.int64)
    tfs = np.array([p[1] for p in postings], dtype=np.uint64)
    dls = np.array([p[2] for p in postings], dtype=np.uint64)
    blocks = encode_blocks(docs, tfs, dls, block_size=128)
    d2, t2, l2 = decode_blocks(blocks)
    order = np.argsort(docs, kind="stable")
    assert np.array_equal(d2, docs[order])
    assert np.array_equal(t2, tfs[order])
    assert np.array_equal(l2, dls[order])
    # block invariants: sorted, block_max is a true upper bound
    for blk in blocks:
        assert blk["first_doc"] <= blk["last_doc"]
        assert blk["count"] <= 128
    assert max(b["max_tf"] for b in blocks) == int(tfs.max())
    assert min(b["min_dl"] for b in blocks) == int(dls.min())


@given(
    st.lists(  # several groups of postings
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=10**8),
                st.integers(min_value=1, max_value=100),
                st.integers(min_value=1, max_value=500),
            ),
            min_size=1,
            max_size=300,
            unique_by=lambda t: t[0],
        ),
        min_size=1,
        max_size=8,
    )
)
@settings(max_examples=60, deadline=None)
def test_batch_encode_equals_per_group(groups):
    docs_l, tfs_l, dls_l, starts, ends = [], [], [], [], []
    pos = 0
    for g in groups:
        g = sorted(g)
        starts.append(pos)
        docs_l += [x[0] for x in g]
        tfs_l += [x[1] for x in g]
        dls_l += [x[2] for x in g]
        pos += len(g)
        ends.append(pos)
    docs = np.array(docs_l, dtype=np.int64)
    tfs = np.array(tfs_l, dtype=np.uint64)
    dls = np.array(dls_l, dtype=np.uint64)
    from sgpt_spark.functions.compress import encode_blocks_batch

    got = encode_blocks_batch(
        docs, tfs, dls, np.array(starts), np.array(ends), block_size=128
    )
    for gi, (s, e) in enumerate(zip(starts, ends)):
        want = encode_blocks(docs[s:e], tfs[s:e], dls[s:e], presorted=True)
        assert got[gi] == want, gi


def test_varint_empty():
    assert varint_encode(np.empty(0, dtype=np.uint64)) == b""
    assert varint_decode(b"").size == 0


def test_varint_known_values():
    # LEB128 spot checks
    assert varint_encode(np.array([0], dtype=np.uint64)) == b"\x00"
    assert varint_encode(np.array([127], dtype=np.uint64)) == b"\x7f"
    assert varint_encode(np.array([128], dtype=np.uint64)) == b"\x80\x01"
    assert varint_encode(np.array([300], dtype=np.uint64)) == b"\xac\x02"


def test_decode_many_matches_per_row():
    import numpy as np

    from sgpt_spark.functions.compress import (
        decode_blocks,
        decode_many,
        encode_blocks_batch,
    )

    rng = np.random.default_rng(5)
    sizes = rng.integers(1, 500, 200)
    starts = np.concatenate(([0], np.cumsum(sizes)[:-1]))
    ends = np.cumsum(sizes)
    n = int(ends[-1])
    doc_ids = np.concatenate(
        [np.sort(rng.choice(10**7, s, replace=False)) for s in sizes]
    ).astype(np.int64)
    tfs = rng.integers(1, 1000, n).astype(np.uint64)
    dls = rng.integers(1, 100000, n).astype(np.uint64)
    rows = encode_blocks_batch(doc_ids, tfs, dls, starts, ends)
    offs, d, t, l = decode_many(rows)
    assert offs[-1] == n
    for i, blocks in enumerate(rows):
        dd, tt, ll = decode_blocks(blocks)
        s, e = offs[i], offs[i + 1]
        assert np.array_equal(dd, d[s:e])
        assert np.array_equal(tt, t[s:e])
        assert np.array_equal(ll, l[s:e])
    # empty rows interleaved
    offs2, d2, t2, l2 = decode_many([[], rows[0], [], rows[1]])
    assert offs2[1] == 0 and np.array_equal(d2[: offs2[2]], d[: offs[1]])


def test_encode_blocks_arrow_matches_batch():
    import numpy as np

    from sgpt_spark.functions.compress import encode_blocks_arrow, encode_blocks_batch

    rng = np.random.default_rng(9)
    sizes = rng.integers(1, 300, 64)
    starts = np.concatenate(([0], np.cumsum(sizes)[:-1]))
    ends = np.cumsum(sizes)
    n = int(ends[-1])
    doc_ids = np.concatenate(
        [np.sort(rng.choice(10**6, s, replace=False)) for s in sizes]
    ).astype(np.int64)
    tfs = rng.integers(1, 300, n).astype(np.uint64)
    dls = rng.integers(1, 5000, n).astype(np.uint64)
    want = encode_blocks_batch(doc_ids, tfs, dls, starts, ends)
    got = encode_blocks_arrow(doc_ids, tfs, dls, starts, ends).to_pylist()
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert len(g) == len(w)
        for bg, bw in zip(g, w):
            for k in ("first_doc", "last_doc", "count", "max_tf", "min_dl"):
                assert bg[k] == bw[k], k
            for k in ("doc_deltas", "tfs", "dls"):
                assert bytes(bg[k]) == bytes(bw[k]), k


@given(
    st.lists(  # candidate runs; ids are made globally unique below
        st.lists(st.integers(min_value=0, max_value=100_000), min_size=0, max_size=300),
        min_size=0,
        max_size=6,
    ),
    st.integers(min_value=8, max_value=64),   # block size
    st.integers(min_value=16, max_value=512),  # flush threshold
)
@settings(max_examples=60, deadline=None)
def test_merge_runs_streaming_property(run_ids, block_size, flush):
    """Property: for ANY doc-sorted disjoint runs and any block/flush
    sizing, the streaming k-way merge equals the sorted concatenation,
    emits full blocks except possibly the last, and never holds more
    than runs x block + flush decoded postings."""
    from sgpt_spark.functions.compress import merge_runs_streaming

    # make ids globally unique then split back into sorted runs
    seen: set = set()
    runs, all_rows = [], []
    for li in run_ids:
        ids = sorted({i for i in li if i not in seen})
        seen.update(ids)
        if not ids:
            continue
        ids = np.array(ids, dtype=np.int64)
        tfs = (ids % 13 + 1).astype(np.uint64)
        dls = (ids % 31 + 2).astype(np.uint64)
        runs.append(encode_blocks(ids, tfs, dls, block_size, presorted=True))
        all_rows.extend(ids.tolist())
    peak: list = []
    merged = merge_runs_streaming(
        runs, block_size=block_size, flush_postings=flush, _peak_out=peak
    )
    d, tf, dl = decode_blocks(merged)
    want = np.array(sorted(all_rows), dtype=np.int64)
    assert np.array_equal(d, want)
    assert np.array_equal(tf, (d % 13 + 1).astype(np.uint64))
    assert np.array_equal(dl, (d % 31 + 2).astype(np.uint64))
    # Block-fill invariant depends on the path taken: the k-way merge
    # re-encodes everything, so every block but the last is full. The
    # doc-disjoint fast path copies full blocks VERBATIM and only
    # re-blocks short tails, so a misaligned remainder at a run
    # boundary legitimately stays short MID-stream (re-cutting it would
    # force re-encoding every later block — the fragment is the price
    # of the zero-decode append, same as Lucene segment tails). Bound:
    # at most one short block per run plus the final one.
    order = sorted(range(len(runs)), key=lambda i: runs[i][0]["first_doc"])
    disjoint = len(runs) > 1 and all(
        runs[order[j]][-1]["last_doc"] < runs[order[j + 1]][0]["first_doc"]
        for j in range(len(runs) - 1)
    )
    n_short = sum(1 for b in merged if b["count"] < block_size)
    if disjoint:
        assert n_short <= len(runs) + 1
    else:
        assert all(b["count"] == block_size for b in merged[:-1])
    if peak and len(runs) > 1:
        assert peak[0] <= len(runs) * block_size + flush + block_size
