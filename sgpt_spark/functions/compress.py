"""Vectorized posting-list block codecs: delta + LEB128 varint, and a
patched-frame-of-reference bit-packed codec (PForDelta).

The compressed representation Elasticsearch/Lucene keeps hidden from the
reference (SURVEY.md §1.1 "Derived index structure"). Everything here is
numpy array code — no per-element Python loops over postings (the loops
below are over *byte positions* (<=10) and *blocks*, not elements), so
encode/decode run at memory bandwidth inside Arrow-batched UDFs
(input_hint: no per-row Python).

Block layout (see sgpt_spark.schema.POSTINGS):
  per (term, segment): blocks of <=BLOCK_SIZE postings, each with
    first_doc, last_doc, count        — for skipping without decode
    block_max                         — max BM25 tf-norm in block (WAND bound;
                                        idf is applied at query time so the
                                        bound is df-independent)
    doc_deltas                        — varint(diff(doc_ids)), docs sorted asc
    tfs, dls                          — varint term freqs / doc lengths
"""

from __future__ import annotations

import numpy as np

BLOCK_SIZE = 128
_MAX_VARINT_BYTES = 10


def varint_encode_with_offsets(values: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """LEB128-encode a uint64 array, fully vectorized.

    -> (byte_array uint8, value_byte_offsets int64 of len n+1): value i
    occupies bytes [offsets[i], offsets[i+1]) — callers can slice
    contiguous value ranges without re-encoding.
    """
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if v.size == 0:
        return np.empty(0, dtype=np.uint8), np.zeros(1, dtype=np.int64)
    vmax = int(v.max())
    if vmax < 128:
        # all single-byte (the common case for tf/dl/position deltas):
        # LEB128 of a value < 128 IS the value with a clear cont bit
        return v.astype(np.uint8), np.arange(v.size + 1, dtype=np.int64)
    # number of 7-bit groups per value; stop probing widths past vmax
    # (values are overwhelmingly 1-2 bytes — probing all 9 widths costs
    # more than the packing itself)
    nb = np.ones(v.shape, dtype=np.int64)
    for k in range(1, _MAX_VARINT_BYTES):
        t = np.uint64(1) << np.uint64(7 * k)
        if vmax < t:
            break
        nb += (v >= t).astype(np.int64)
    ends = np.cumsum(nb)
    offsets = np.concatenate(([0], ends))
    out = np.zeros(int(ends[-1]), dtype=np.uint8)
    for j in range(int(nb.max())):
        mask = nb > j
        byte = (v[mask] >> np.uint64(7 * j)) & np.uint64(0x7F)
        cont = (nb[mask] - 1 > j).astype(np.uint8) << 7
        out[offsets[:-1][mask] + j] = byte.astype(np.uint8) | cont
    return out, offsets


def varint_encode(values: np.ndarray) -> bytes:
    """LEB128-encode a uint64 array, fully vectorized."""
    out, _ = varint_encode_with_offsets(values)
    return out.tobytes()


def varint_decode(data: bytes) -> np.ndarray:
    """Inverse of varint_encode -> uint64 array, vectorized."""
    b = np.frombuffer(data, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.uint64)
    term_flags = (b & 0x80) == 0  # last byte of each value
    starts = np.concatenate(([0], np.flatnonzero(term_flags)[:-1] + 1))
    pos = np.arange(b.size) - np.repeat(starts, np.diff(np.concatenate((starts, [b.size]))))
    contrib = (b & np.uint8(0x7F)).astype(np.uint64) << (np.uint64(7) * pos.astype(np.uint64))
    return np.add.reduceat(contrib, starts)


# ---- PForDelta: patched frame-of-reference bit packing ---------------------
#
# The bit-packed codec option north_star names alongside varint. Lucene
# packs each 128-posting block at the block's max bit width (FOR);
# classic PForDelta keeps the width at the "common case" and patches the
# outliers ("exceptions") separately, so one huge delta doesn't widen
# the whole block. This implementation picks, per buffer, the width b
# that MINIMIZES total encoded bytes (NewPFD-style exception patching):
#
#   [b:u8][n_exc:u8][packed low b bits, ceil(n*b/8) bytes, LSB-first]
#   [exception positions u16le x n_exc][exception high parts, varint]
#
# n_exc is a single byte: widths whose exception count would exceed 255
# are excluded from the width search (the max-bit-length width always
# has zero exceptions, so a valid width exists for every buffer);
# positions stay u16 so custom block sizes above 256 still encode.
#
# Exceptions contribute their low b bits to the packed payload like
# every other value; decode ORs the varint-coded high part back in at
# the stored position. All encode/decode math is whole-array numpy; the
# width search is over the (<=65) distinct bit lengths in the buffer.

PFOR_HEADER = 2
CODECS = ("varint", "pfor")


def _bit_lengths(v: np.ndarray) -> np.ndarray:
    """Exact bit length per uint64 value (0 -> 0), vectorized."""
    out = np.zeros(v.shape, dtype=np.int64)
    for k in range(64):
        out += (v >= (np.uint64(1) << np.uint64(k))).astype(np.int64)
    return out


def _varint_sizes(v: np.ndarray) -> np.ndarray:
    nb = np.ones(v.shape, dtype=np.int64)
    for k in range(1, _MAX_VARINT_BYTES):
        nb += (v >= (np.uint64(1) << np.uint64(7 * k))).astype(np.int64)
    return nb


def pfor_encode(values: np.ndarray) -> bytes:
    """PForDelta-encode one uint64 array (format above). Delegates to
    the batch encoder so single-buffer and batched encodes are
    byte-identical. The empty array still carries the 2-byte header so
    every buffer is self-describing."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    return pfor_encode_many(
        v, np.array([0], dtype=np.int64), np.array([len(v)], dtype=np.int64)
    )[0]


# cost matrix for the width choice: _PFOR_EXC_COST[h, b] = bytes one
# exception with bit length h costs under width b (2 position bytes +
# varint high part of exactly h-b bits), 0 when h <= b (not an
# exception). varint bytes of (v >> b) == ceil((bitlen(v) - b) / 7)
# exactly, so the optimum is computable from bit-length HISTOGRAMS
# without touching the values.
_H = np.arange(65)[:, None]
_B = np.arange(65)[None, :]
_PFOR_EXC_COST = np.where(_H > _B, 2 + np.maximum(1, -(-(_H - _B) // 7)), 0).astype(
    np.int64
)
_PFOR_EXC_COUNT = (_H > _B).astype(np.int64)
del _H, _B


def pfor_encode_many(
    values: np.ndarray, starts: np.ndarray, ends: np.ndarray
) -> list[bytes]:
    """Encode MANY contiguous value ranges of one flat uint64 array ->
    list of pfor buffers, in whole-array passes (the encode mirror of
    ``pfor_decode_many``): one bit-length pass over all values, the
    per-buffer optimal width via a (buffers x 65) histogram x cost
    matrix product, and one scatter+packbits per distinct width. ~6x
    faster than per-buffer encodes at posting-block sizes (per-block
    numpy dispatch dominates there).
    """
    v = np.ascontiguousarray(values, dtype=np.uint64)
    starts = np.asarray(starts, dtype=np.int64)
    ends = np.asarray(ends, dtype=np.int64)
    n_buf = len(starts)
    counts = ends - starts
    out: list = [None] * n_buf
    if n_buf == 0:
        return out
    bl = _bit_lengths(v)
    buf_idx = np.repeat(np.arange(n_buf, dtype=np.int64), counts)
    flat_sel = np.concatenate(
        [np.arange(s, e, dtype=np.int64) for s, e in zip(starts, ends)]
    ) if not (len(v) == int(counts.sum()) and np.all(starts == np.concatenate(([0], np.cumsum(counts)[:-1])))) else None
    # fast case: ranges tile the array exactly in order -> no gather
    bl_sel = bl if flat_sel is None else bl[flat_sel]
    v_sel = v if flat_sel is None else v[flat_sel]

    hist = np.zeros((n_buf, 65), dtype=np.int64)
    np.add.at(hist, (buf_idx, bl_sel), 1)
    exc_bytes = hist @ _PFOR_EXC_COST   # (n_buf, 65)
    n_exc = hist @ _PFOR_EXC_COUNT
    payload = (counts[:, None] * np.arange(65)[None, :] + 7) // 8
    cost = PFOR_HEADER + payload + exc_bytes
    cost[n_exc > 0xFF] = np.iinfo(np.int64).max  # u8 exception count
    # u16 exception POSITIONS: buffers longer than 65536 values may only
    # use exception-free widths (positions past 0xFFFF would wrap and
    # silently corrupt — round-4 review find); the max-bit-length width
    # always has zero exceptions, so a valid width always exists
    big = counts > 0x10000
    if big.any():
        cost[big[:, None] & (n_exc > 0)] = np.iinfo(np.int64).max
    widths = np.argmin(cost, axis=1).astype(np.int64)

    sel_off = np.concatenate(([0], np.cumsum(counts)))
    within = np.arange(len(v_sel), dtype=np.int64) - np.repeat(sel_off[:-1], counts)
    w_per_val = widths[buf_idx]
    headers = [
        bytes([int(widths[i]), int(n_exc[i, widths[i]])]) for i in range(n_buf)
    ]
    payloads: list = [b""] * n_buf
    for b in np.unique(widths):
        b = int(b)
        if b == 0:
            continue
        sel = np.flatnonzero(widths == b)
        c = counts[sel]
        pay_bytes = (c * b + 7) // 8
        pad_off = np.concatenate(([0], np.cumsum(pay_bytes)))
        vmask = w_per_val == b
        vals = v_sel[vmask] & np.uint64((1 << b) - 1)
        # bit position of value j of group-buffer i in the padded stream
        base = np.repeat(pad_off[:-1] * 8, c) + within[vmask] * b
        bits_flat = np.zeros(int(pad_off[-1]) * 8, dtype=np.uint8)
        bits_flat[base[:, None] + np.arange(b)] = (
            (vals[:, None] >> np.arange(b, dtype=np.uint64)) & np.uint64(1)
        ).astype(np.uint8)
        packed = np.packbits(bits_flat, bitorder="little").tobytes()
        for j, i in enumerate(sel):
            payloads[int(i)] = packed[int(pad_off[j]) : int(pad_off[j + 1])]

    # exceptions: values whose bit length exceeds their buffer's width
    exc_mask = bl_sel > w_per_val
    tails: list = [b""] * n_buf
    if exc_mask.any():
        e_idx = np.flatnonzero(exc_mask)
        e_buf = buf_idx[e_idx]
        e_pos = within[e_idx]
        highs = v_sel[e_idx] >> w_per_val[e_idx].astype(np.uint64)
        h_bytes, h_off = varint_encode_with_offsets(highs)
        h_mv = h_bytes.tobytes()
        e_counts = np.bincount(e_buf, minlength=n_buf)
        e_off = np.concatenate(([0], np.cumsum(e_counts)))
        for i in np.flatnonzero(e_counts):
            s, e = int(e_off[i]), int(e_off[i + 1])
            tails[int(i)] = (
                e_pos[s:e].astype("<u2").tobytes()
                + h_mv[int(h_off[s]) : int(h_off[e])]
            )
    for i in range(n_buf):
        out[i] = headers[i] + payloads[i] + tails[i]
    return out


def pfor_decode(data: bytes, count: int) -> np.ndarray:
    """Inverse of ``pfor_encode``; ``count`` is externally known (the
    block's ``count`` field — deltas carry count-1)."""
    if count == 0:
        return np.empty(0, dtype=np.uint64)
    buf = np.frombuffer(data, dtype=np.uint8)
    b = int(buf[0])
    n_exc = int(buf[1])
    payload = (count * b + 7) // 8
    if b:
        bits = np.unpackbits(buf[PFOR_HEADER : PFOR_HEADER + payload], bitorder="little")
        weights = np.uint64(1) << np.arange(b, dtype=np.uint64)
        out = (bits[: count * b].reshape(count, b).astype(np.uint64) * weights).sum(
            axis=1, dtype=np.uint64
        )
    else:
        out = np.zeros(count, dtype=np.uint64)
    if n_exc:
        p = PFOR_HEADER + payload
        pos = np.frombuffer(data, dtype="<u2", count=n_exc, offset=p).astype(np.int64)
        high = varint_decode(bytes(data[p + 2 * n_exc :]))
        out[pos] |= high << np.uint64(b)
    return out


def pfor_decode_many(buffers: list, counts: np.ndarray) -> np.ndarray:
    """Decode MANY pfor buffers -> one concatenated uint64 array, in
    width-GROUPED whole-array passes (one unpackbits + one gather per
    distinct width) instead of per-buffer dispatch — the pfor twin of
    the varint batch decode; exceptions (rare by construction) are
    patched in a short per-buffer loop."""
    counts = np.asarray(counts, dtype=np.int64)
    total = int(counts.sum())
    out = np.zeros(total, dtype=np.uint64)
    if total == 0:
        return out
    offs = np.concatenate(([0], np.cumsum(counts)))
    nb = len(buffers)
    widths = np.full(nb, -1, dtype=np.int64)
    nexcs = np.zeros(nb, dtype=np.int64)
    for i, d in enumerate(buffers):
        if counts[i] == 0:
            continue
        widths[i] = d[0]
        nexcs[i] = d[1]
    for b in np.unique(widths):
        b = int(b)
        if b <= 0:  # -1: empty buffer; 0: zeros (exceptions patch below)
            continue
        sel = np.flatnonzero(widths == b)
        c = counts[sel]
        payloads = [
            memoryview(buffers[i])[PFOR_HEADER : PFOR_HEADER + ((int(counts[i]) * b + 7) // 8)]
            for i in sel
        ]
        byte_off = np.concatenate(
            ([0], np.cumsum([len(p) for p in payloads]))
        ).astype(np.int64)
        bits = np.unpackbits(
            np.frombuffer(b"".join(payloads), dtype=np.uint8), bitorder="little"
        )
        grp_total = int(c.sum())
        # bit index of value j of buffer i = payload_byte_offset(i)*8 + j*b
        within = np.arange(grp_total, dtype=np.int64) - np.repeat(
            np.concatenate(([0], np.cumsum(c)[:-1])), c
        )
        base = np.repeat(byte_off[:-1] * 8, c) + within * b
        weights = np.uint64(1) << np.arange(b, dtype=np.uint64)
        vals = (
            bits[base[:, None] + np.arange(b)].astype(np.uint64) * weights
        ).sum(axis=1, dtype=np.uint64)
        out[np.repeat(offs[sel], c) + within] = vals
    for i in np.flatnonzero(nexcs > 0):
        b = int(widths[i])
        d = buffers[i]
        p = PFOR_HEADER + (int(counts[i]) * b + 7) // 8
        n_exc = int(nexcs[i])
        pos = np.frombuffer(d, dtype="<u2", count=n_exc, offset=p).astype(np.int64)
        high = varint_decode(bytes(d[p + 2 * n_exc :]))
        out[offs[i] + pos] |= high << np.uint64(b)
    return out


def encode_column(values: np.ndarray, codec: str) -> bytes:
    """One posting-column buffer under the named codec."""
    if codec == "pfor":
        return pfor_encode(np.asarray(values, dtype=np.uint64))
    return varint_encode(values)


def decode_column(data: bytes, count: int, codec: str) -> np.ndarray:
    if codec == "pfor":
        return pfor_decode(data, count)
    return varint_decode(bytes(data))


def decode_columns_many(buffers: list, counts: np.ndarray, codec: str) -> np.ndarray:
    """Batch decode of many per-block buffers of one column."""
    if codec == "pfor":
        return pfor_decode_many(buffers, counts)
    return varint_decode(b"".join(bytes(d) for d in buffers))


def delta_encode(sorted_ids: np.ndarray) -> tuple[int, bytes]:
    """Strictly-ascending int64 ids -> (first_id, varint(diffs))."""
    ids = np.ascontiguousarray(sorted_ids, dtype=np.int64)
    if ids.size == 0:
        return 0, b""
    return int(ids[0]), varint_encode(np.diff(ids).astype(np.uint64))


def delta_decode(
    first_id: int, data: bytes, count: int, codec: str = "varint"
) -> np.ndarray:
    out = np.empty(count, dtype=np.int64)
    out[0] = first_id
    if count > 1:
        out[1:] = decode_column(data, count - 1, codec).astype(np.int64)
    return np.cumsum(out)


def encode_blocks(
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    dls: np.ndarray,
    block_size: int = BLOCK_SIZE,
    presorted: bool = False,
    codec: str = "varint",
) -> list[dict]:
    """Sorted postings arrays -> list of block dicts (POSTINGS.blocks rows).

    Block-max metadata is (max_tf, min_dl) — avgdl-independent, see
    schema.POSTINGS. Pass ``presorted=True`` when doc_ids are already
    ascending (the indexer sorts within partitions) to skip the argsort.
    ``codec`` selects the per-column byte coding (varint | pfor); the
    block struct is codec-agnostic, IndexMeta records the choice.
    """
    if not presorted:
        order = np.argsort(doc_ids, kind="stable")
        doc_ids, tfs, dls = doc_ids[order], tfs[order], dls[order]
    blocks = []
    for s in range(0, len(doc_ids), block_size):
        d = doc_ids[s : s + block_size]
        deltas = encode_column(np.diff(d).astype(np.uint64), codec)
        blocks.append(
            {
                "first_doc": int(d[0]),
                "last_doc": int(d[-1]),
                "count": int(len(d)),
                "max_tf": int(tfs[s : s + block_size].max()),
                "min_dl": int(dls[s : s + block_size].min()),
                "doc_deltas": deltas,
                "tfs": encode_column(tfs[s : s + block_size].astype(np.uint64), codec),
                "dls": encode_column(dls[s : s + block_size].astype(np.uint64), codec),
            }
        )
    return blocks


def encode_blocks_batch(
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    dls: np.ndarray,
    group_starts: np.ndarray,
    group_ends: np.ndarray,
    block_size: int = BLOCK_SIZE,
    codec: str = "varint",
) -> list[list[dict]]:
    """Encode MANY posting groups at once -> list of block-lists, one per
    group (same block format as ``encode_blocks``).

    All varint work happens in three whole-array passes (doc deltas, tfs,
    dls) instead of per-group calls — at Zipf vocabulary sizes this is
    ~20x faster than looping ``encode_blocks`` because small-array numpy
    dispatch overhead dominates there. Requires doc_ids ascending within
    each group (the indexer sorts).

    ``codec="pfor"`` runs the same block-boundary machinery with the
    batched bit-packing encoder (``pfor_encode_many``: histogram-based
    width choice + one scatter/packbits per distinct width).
    """
    if codec == "pfor":
        return _encode_blocks_batch_pfor(
            doc_ids, tfs, dls, group_starts, group_ends, block_size
        )
    n = len(doc_ids)
    if n == 0:
        return [[] for _ in range(len(group_starts))]
    # block starts: every group start plus every block_size-th posting
    blk_starts_list = [
        np.arange(s, e, block_size, dtype=np.int64)
        for s, e in zip(group_starts, group_ends)
    ]
    nblocks_per_group = np.fromiter(
        (len(x) for x in blk_starts_list), dtype=np.int64, count=len(blk_starts_list)
    )
    blk_starts = (
        np.concatenate(blk_starts_list) if blk_starts_list else np.empty(0, np.int64)
    )
    blk_ends = np.minimum(
        blk_starts + block_size,
        np.repeat(np.asarray(group_ends, dtype=np.int64), nblocks_per_group),
    )
    is_start = np.zeros(n, dtype=bool)
    is_start[blk_starts] = True
    # doc deltas: diff vs previous posting, undefined at block starts
    deltas = np.empty(n, dtype=np.uint64)
    deltas[0] = 0
    deltas[1:] = (doc_ids[1:] - doc_ids[:-1]).astype(np.uint64)
    keep = ~is_start
    d_bytes, d_off = varint_encode_with_offsets(deltas[keep])
    # map posting index -> position in the kept-delta array
    kept_pos = np.cumsum(keep) - 1  # position of posting i's delta (if kept)
    t_bytes, t_off = varint_encode_with_offsets(tfs.astype(np.uint64))
    l_bytes, l_off = varint_encode_with_offsets(dls.astype(np.uint64))
    if len(blk_starts):
        blk_max_tf = np.maximum.reduceat(tfs.astype(np.int64), blk_starts)
        blk_min_dl = np.minimum.reduceat(dls.astype(np.int64), blk_starts)
    else:
        blk_max_tf = blk_min_dl = np.empty(0, dtype=np.int64)
    d_mv, t_mv, l_mv = d_bytes.tobytes(), t_bytes.tobytes(), l_bytes.tobytes()

    out: list[list[dict]] = []
    bi = 0
    for g, (gs, ge) in enumerate(zip(group_starts, group_ends)):
        blocks = []
        for _ in range(nblocks_per_group[g]):
            s, e = int(blk_starts[bi]), int(blk_ends[bi])
            # deltas for postings (s, e) exclusive of the block start
            if e - s > 1:
                d0 = int(d_off[kept_pos[s + 1]])
                d1 = int(d_off[kept_pos[e - 1] + 1])
                dd = d_mv[d0:d1]
            else:
                dd = b""
            blocks.append(
                {
                    "first_doc": int(doc_ids[s]),
                    "last_doc": int(doc_ids[e - 1]),
                    "count": int(e - s),
                    "max_tf": int(blk_max_tf[bi]),
                    "min_dl": int(blk_min_dl[bi]),
                    "doc_deltas": dd,
                    "tfs": t_mv[int(t_off[s]) : int(t_off[e])],
                    "dls": l_mv[int(l_off[s]) : int(l_off[e])],
                }
            )
            bi += 1
        out.append(blocks)
    return out


def _encode_blocks_batch_pfor(
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    dls: np.ndarray,
    group_starts: np.ndarray,
    group_ends: np.ndarray,
    block_size: int = BLOCK_SIZE,
) -> list[list[dict]]:
    """pfor twin of the varint whole-array path in ``encode_blocks_batch``:
    identical block boundaries and stats, byte coding via ONE
    ``pfor_encode_many`` call per column."""
    n = len(doc_ids)
    if n == 0:
        return [[] for _ in range(len(group_starts))]
    blk_starts_list = [
        np.arange(s, e, block_size, dtype=np.int64)
        for s, e in zip(group_starts, group_ends)
    ]
    nblocks_per_group = np.fromiter(
        (len(x) for x in blk_starts_list), dtype=np.int64, count=len(blk_starts_list)
    )
    blk_starts = (
        np.concatenate(blk_starts_list) if blk_starts_list else np.empty(0, np.int64)
    )
    blk_ends = np.minimum(
        blk_starts + block_size,
        np.repeat(np.asarray(group_ends, dtype=np.int64), nblocks_per_group),
    )
    is_start = np.zeros(n, dtype=bool)
    is_start[blk_starts] = True
    deltas = np.empty(n, dtype=np.uint64)
    deltas[0] = 0
    deltas[1:] = (doc_ids[1:] - doc_ids[:-1]).astype(np.uint64)
    kept = deltas[~is_start]  # block-start deltas dropped; contiguous per block
    d_counts = blk_ends - blk_starts - 1
    d_ends = np.cumsum(d_counts)
    d_starts = np.concatenate(([0], d_ends[:-1]))
    d_bufs = pfor_encode_many(kept, d_starts, d_ends)
    t_bufs = pfor_encode_many(np.asarray(tfs, dtype=np.uint64), blk_starts, blk_ends)
    l_bufs = pfor_encode_many(np.asarray(dls, dtype=np.uint64), blk_starts, blk_ends)
    blk_max_tf = np.maximum.reduceat(np.asarray(tfs, dtype=np.int64), blk_starts)
    blk_min_dl = np.minimum.reduceat(np.asarray(dls, dtype=np.int64), blk_starts)

    out: list[list[dict]] = []
    bi = 0
    for g in range(len(group_starts)):
        blocks = []
        for _ in range(int(nblocks_per_group[g])):
            s, e = int(blk_starts[bi]), int(blk_ends[bi])
            blocks.append(
                {
                    "first_doc": int(doc_ids[s]),
                    "last_doc": int(doc_ids[e - 1]),
                    "count": int(e - s),
                    "max_tf": int(blk_max_tf[bi]),
                    "min_dl": int(blk_min_dl[bi]),
                    "doc_deltas": d_bufs[bi],
                    "tfs": t_bufs[bi],
                    "dls": l_bufs[bi],
                }
            )
            bi += 1
        out.append(blocks)
    return out


def encode_blocks_arrow(
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    dls: np.ndarray,
    group_starts: np.ndarray,
    group_ends: np.ndarray,
    block_size: int = BLOCK_SIZE,
    codec: str = "varint",
):
    """Arrow-native twin of ``encode_blocks_batch``: the per-group block
    lists come back as ONE ``pa.ListArray`` of block structs built from
    whole-array numpy offsets and three shared byte buffers — zero
    per-block Python objects; for varint, zero byte copies too (the
    binary children reference the varint buffers directly via offset
    arrays), while pfor buffers come from ``pfor_encode_many`` and are
    joined into one backing buffer per column.

    Requires the groups to be CONTIGUOUS ranges covering [0, n) with
    doc_ids ascending within each group (the fused segment builder's
    layout). Returns the ListArray; group-level stats are the caller's
    (reduceat over group_starts, same arrays).
    """
    import pyarrow as pa

    group_starts = np.asarray(group_starts, dtype=np.int64)
    group_ends = np.asarray(group_ends, dtype=np.int64)
    n = len(doc_ids)
    struct_type = pa.struct(
        [
            pa.field("first_doc", pa.int64(), False),
            pa.field("last_doc", pa.int64(), False),
            pa.field("count", pa.int32(), False),
            pa.field("max_tf", pa.int64(), False),
            pa.field("min_dl", pa.int64(), False),
            pa.field("doc_deltas", pa.binary(), False),
            pa.field("tfs", pa.binary(), False),
            pa.field("dls", pa.binary(), False),
        ]
    )
    if n == 0:
        empty_struct = pa.array([], type=struct_type)
        offs = pa.array(np.zeros(len(group_starts) + 1, dtype=np.int32))
        return pa.ListArray.from_arrays(offs, empty_struct)

    sizes = group_ends - group_starts
    nblocks = -(-sizes // block_size)
    total_blocks = int(nblocks.sum())
    grp_idx = np.repeat(np.arange(len(group_starts), dtype=np.int64), nblocks)
    block_cum = np.concatenate(([0], np.cumsum(nblocks)))
    within = np.arange(total_blocks, dtype=np.int64) - block_cum[grp_idx]
    blk_starts = group_starts[grp_idx] + within * block_size
    blk_ends = np.minimum(blk_starts + block_size, group_ends[grp_idx])

    is_start = np.zeros(n, dtype=bool)
    is_start[blk_starts] = True
    deltas = np.empty(n, dtype=np.uint64)
    deltas[0] = 0
    deltas[1:] = (doc_ids[1:] - doc_ids[:-1]).astype(np.uint64)
    keep = ~is_start
    if codec == "pfor":
        d_counts = blk_ends - blk_starts - 1
        d_ends_k = np.cumsum(d_counts)
        d_starts_k = np.concatenate(([0], d_ends_k[:-1]))

        def pfor_column(vals, starts_c, ends_c):
            bufs = pfor_encode_many(vals, starts_c, ends_c)
            lens = np.fromiter((len(b) for b in bufs), dtype=np.int64, count=len(bufs))
            return np.frombuffer(b"".join(bufs), dtype=np.uint8), np.concatenate(
                ([0], np.cumsum(lens))
            )

        d_bytes, deltas_offsets = pfor_column(deltas[keep], d_starts_k, d_ends_k)
        t_bytes, tfs_offsets = pfor_column(
            np.asarray(tfs, dtype=np.uint64), blk_starts, blk_ends
        )
        l_bytes, dls_offsets = pfor_column(
            np.asarray(dls, dtype=np.uint64), blk_starts, blk_ends
        )
    else:
        d_bytes, d_off = varint_encode_with_offsets(deltas[keep])
        kept_pos = np.cumsum(keep) - 1
        t_bytes, t_off = varint_encode_with_offsets(np.asarray(tfs, dtype=np.uint64))
        l_bytes, l_off = varint_encode_with_offsets(np.asarray(dls, dtype=np.uint64))

    def bin_array(data: np.ndarray, offsets64: np.ndarray) -> "pa.Array":
        if offsets64[-1] > np.iinfo(np.int32).max:
            # pa.binary() carries 32-bit offsets; wrapping would write a
            # silently-corrupt index. >2GB per-column segments must be
            # split upstream (smaller input partitions).
            raise ValueError(
                "segment varint buffer exceeds 2GB (int32 binary offsets) — "
                "repartition the corpus into smaller segments"
            )
        offs32 = offsets64.astype(np.int32)
        return pa.Array.from_buffers(
            pa.binary(),
            len(offsets64) - 1,
            [None, pa.py_buffer(offs32.tobytes()), pa.py_buffer(data.tobytes())],
        )

    if codec != "pfor":
        # blocks are contiguous over [0, n), so each byte column's offsets
        # are just the per-value offset table sampled at block boundaries
        tfs_offsets = t_off[np.append(blk_starts, n)]
        dls_offsets = l_off[np.append(blk_starts, n)]
        # block i's deltas = kept deltas of postings (start, end) — kept
        # positions are contiguous across blocks (block-start deltas dropped)
        deltas_offsets = np.append(d_off[kept_pos[blk_starts] + 1], d_off[-1])

    children = [
        pa.array(doc_ids[blk_starts], type=pa.int64()),
        pa.array(doc_ids[blk_ends - 1], type=pa.int64()),
        pa.array((blk_ends - blk_starts).astype(np.int32), type=pa.int32()),
        pa.array(np.maximum.reduceat(np.asarray(tfs, dtype=np.int64), blk_starts), type=pa.int64()),
        pa.array(np.minimum.reduceat(np.asarray(dls, dtype=np.int64), blk_starts), type=pa.int64()),
        bin_array(d_bytes, deltas_offsets),
        bin_array(t_bytes, tfs_offsets),
        bin_array(l_bytes, dls_offsets),
    ]
    struct_arr = pa.StructArray.from_arrays(children, fields=list(struct_type))
    list_offsets = pa.array(block_cum.astype(np.int32))
    return pa.ListArray.from_arrays(list_offsets, struct_arr)


def decode_many(
    block_lists,
    codec: str = "varint",
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Decode MANY posting rows at once -> (row_offsets int64 len r+1,
    doc_ids, tfs, dls) flat arrays; row i's postings live at
    [row_offsets[i], row_offsets[i+1]).

    One varint pass per column over the CONCATENATED byte buffers
    instead of three tiny passes per block — per-block numpy dispatch
    (~70us/block) dominates ``decode_blocks`` at query time, so the
    batch decode is ~10x faster over thousands of candidate rows.
    Doc ids come back via a segmented cumsum (reset at block starts).
    """
    firsts, counts, dbytes, tbytes, lbytes = [], [], [], [], []
    row_counts = np.zeros(len(block_lists), dtype=np.int64)
    for ri, blocks in enumerate(block_lists):
        tot = 0
        for blk in blocks:
            firsts.append(blk["first_doc"])
            c = blk["count"]
            counts.append(c)
            tot += c
            dbytes.append(blk["doc_deltas"])
            tbytes.append(blk["tfs"])
            lbytes.append(blk["dls"])
        row_counts[ri] = tot
    row_offsets = np.concatenate(([0], np.cumsum(row_counts)))
    doc_ids, tfs, dls = decode_posting_columns(
        firsts, counts, dbytes, tbytes, lbytes, codec
    )
    return row_offsets, doc_ids, tfs, dls


def decode_posting_columns(
    firsts, counts, dbufs, tbufs, lbufs, codec: str = "varint"
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Column-oriented batch decode: per-block (first_doc, count) arrays
    plus the three per-block byte buffers -> flat (doc_ids, tfs, dls).
    The decode core shared by ``decode_many`` (dict-shaped blocks) and
    the Arrow-native compaction (struct-column blocks, no Python dicts).
    """
    counts_a = np.asarray(counts, dtype=np.int64)
    firsts_a = np.asarray(firsts, dtype=np.int64)
    n = int(counts_a.sum()) if len(counts_a) else 0
    if n == 0:
        z = np.empty(0, dtype=np.int64)
        return z, z.astype(np.uint64), z.astype(np.uint64)
    tfs = decode_columns_many(tbufs, counts_a, codec)
    dls = decode_columns_many(lbufs, counts_a, codec)
    deltas_all = decode_columns_many(dbufs, np.maximum(counts_a - 1, 0), codec)
    blk_starts = np.concatenate(([0], np.cumsum(counts_a)[:-1]))
    v = np.zeros(n, dtype=np.int64)
    mask = np.ones(n, dtype=bool)
    mask[blk_starts] = False
    v[mask] = deltas_all.astype(np.int64)
    c = np.cumsum(v)
    doc_ids = np.repeat(firsts_a, counts_a) + c - np.repeat(c[blk_starts], counts_a)
    return doc_ids, tfs, dls


def decode_blocks(
    blocks: list, codec: str = "varint"
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """blocks -> (doc_ids, tfs, dls) concatenated across blocks."""
    ids, tfs, dls = [], [], []
    for blk in blocks:
        ids.append(
            delta_decode(blk["first_doc"], bytes(blk["doc_deltas"]), blk["count"], codec)
        )
        tfs.append(decode_column(blk["tfs"], blk["count"], codec))
        dls.append(decode_column(blk["dls"], blk["count"], codec))
    if not ids:
        z = np.empty(0, dtype=np.int64)
        return z, z.astype(np.uint64), z.astype(np.uint64)
    return np.concatenate(ids), np.concatenate(tfs), np.concatenate(dls)


def merge_runs_streaming(
    runs: list[list],
    block_size: int = BLOCK_SIZE,
    flush_postings: int = 8192,
    _peak_out: list | None = None,
    codec: str = "varint",
) -> list[dict]:
    """K-way merge of doc-sorted encoded runs -> fresh encoded blocks,
    decoding AT MOST ONE block per run at a time.

    The compaction working-set fix (round-2 verdict): a head term's
    merged posting list can be ~corpus-sized, so decoding it whole
    (decode_many + argsort) is O(df) peak memory in one task. Runs are
    already doc-sorted, so this merges like external merge sort: keep
    one decoded block per run, repeatedly emit every buffered posting
    below the smallest first_doc among UNDECODED next blocks (anything
    below that bound can never be preceded by an unseen doc), and
    re-encode in block_size multiples as the buffer fills. Peak decoded
    rows = O(n_runs x block_size + flush_postings), independent of df.

    All inner steps are numpy (searchsorted / concatenate / argsort over
    <=flush-sized arrays) — no per-posting Python.
    """
    # len(), not truthiness: under applyInPandas each run arrives as a
    # numpy object array of block dicts, and `if r` on a multi-block
    # array raises the ambiguous-truth ValueError (latent until a
    # compacted row exceeded one block = 128 postings)
    runs = [r for r in runs if len(r)]
    k = len(runs)
    if k == 0:
        return []
    if k == 1:
        # single run: already sorted and encoded; reuse as-is
        return list(runs[0])
    # FAST PATH — doc-disjoint runs (THE case for this engine: segments
    # partition the doc-id space, so runs never interleave): merging is
    # an append, not a k-way merge (Lucene's append-merge). Full blocks
    # are copied VERBATIM (zero decode/re-encode — measured 15x faster
    # compaction on the bench corpus); only short tail blocks
    # (< block_size, one per run boundary at most) are decoded and
    # re-blocked so the merged list doesn't accumulate fragment blocks.
    order = sorted(range(k), key=lambda i: runs[i][0]["first_doc"])
    if all(
        runs[order[j]][-1]["last_doc"] < runs[order[j + 1]][0]["first_doc"]
        for j in range(k - 1)
    ):
        out: list = []
        pend_d: list = []
        pend_t: list = []
        pend_l: list = []
        pend_n = 0
        peak_fast = 0

        def flush_short() -> None:
            nonlocal pend_d, pend_t, pend_l, pend_n
            if not pend_n:
                return
            out.extend(
                encode_blocks(
                    np.concatenate(pend_d), np.concatenate(pend_t),
                    np.concatenate(pend_l), block_size, presorted=True, codec=codec,
                )
            )
            pend_d, pend_t, pend_l, pend_n = [], [], [], 0

        for i in order:
            for blk in runs[i]:
                if blk["count"] >= block_size and pend_n == 0:
                    out.append(blk)
                else:
                    pend_d.append(
                        delta_decode(
                            blk["first_doc"], bytes(blk["doc_deltas"]),
                            blk["count"], codec,
                        )
                    )
                    pend_t.append(decode_column(blk["tfs"], blk["count"], codec))
                    pend_l.append(decode_column(blk["dls"], blk["count"], codec))
                    pend_n += blk["count"]
                    peak_fast = max(peak_fast, pend_n)
                    if pend_n >= block_size:
                        flush_short()
        flush_short()
        if _peak_out is not None:
            # measured, not asserted: for uniformly-encoded runs this is
            # <= 2*block_size, but an input run encoded with a LARGER
            # block size decodes whole oversized blocks into pend
            _peak_out.append(max(peak_fast, 1))
        return out
    bi = [0] * k          # next block index to decode, per run
    pos = [0] * k         # consumed offset into the decoded buffer
    buf_d = [None] * k    # decoded (doc, tf, dl) buffers, one block each
    buf_tf = [None] * k
    buf_dl = [None] * k
    pend: list[tuple[np.ndarray, np.ndarray, np.ndarray]] = []
    pend_n = 0
    carry = None  # remainder postings below one block_size
    out: list[dict] = []
    peak = 0

    def flush(final: bool) -> None:
        nonlocal pend, pend_n, carry
        parts = ([carry] if carry is not None else []) + pend
        if not parts:
            return
        d = np.concatenate([p[0] for p in parts])
        tf = np.concatenate([p[1] for p in parts])
        dl = np.concatenate([p[2] for p in parts])
        cut = len(d) if final else (len(d) // block_size) * block_size
        if cut:
            out.extend(
                encode_blocks(
                    d[:cut], tf[:cut], dl[:cut], block_size,
                    presorted=True, codec=codec,
                )
            )
        carry = (d[cut:], tf[cut:], dl[cut:]) if cut < len(d) else None
        pend, pend_n = [], 0

    while True:
        live = 0
        for i in range(k):
            if buf_d[i] is not None and pos[i] < len(buf_d[i]):
                live += len(buf_d[i]) - pos[i]
                continue
            if bi[i] < len(runs[i]):
                blk = runs[i][bi[i]]
                bi[i] += 1
                buf_d[i] = delta_decode(
                    blk["first_doc"], bytes(blk["doc_deltas"]), blk["count"], codec
                )
                buf_tf[i] = decode_column(blk["tfs"], blk["count"], codec)
                buf_dl[i] = decode_column(blk["dls"], blk["count"], codec)
                pos[i] = 0
                live += len(buf_d[i])
            else:
                buf_d[i] = None
        peak = max(peak, live)
        active = [i for i in range(k) if buf_d[i] is not None]
        if not active:
            break
        bounds = [runs[i][bi[i]]["first_doc"] for i in active if bi[i] < len(runs[i])]
        safe = min(bounds) if bounds else None
        take = []
        for i in active:
            d = buf_d[i][pos[i]:]
            cut = len(d) if safe is None else int(np.searchsorted(d, safe, side="left"))
            if cut:
                s, e = pos[i], pos[i] + cut
                take.append((buf_d[i][s:e], buf_tf[i][s:e], buf_dl[i][s:e]))
                pos[i] = e
        if take:
            d = np.concatenate([t[0] for t in take])
            order = np.argsort(d, kind="stable")
            tf = np.concatenate([t[1] for t in take])[order]
            dl = np.concatenate([t[2] for t in take])[order]
            pend.append((d[order], tf, dl))
            pend_n += len(d)
            if pend_n >= flush_postings:
                flush(final=False)
    flush(final=True)
    if _peak_out is not None:
        _peak_out.append(peak)
    return out
