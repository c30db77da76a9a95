"""Positional inverted index + index-backed phrase search.

Lucene keeps term positions in a dedicated postings file (.pos/.prx)
next to the doc/freq file, written from the same token stream; that is
what lets Elasticsearch answer ``match_phrase`` without re-analyzing
the corpus (the reference's retrieval stack delegates all of this to
ES — crossencoder/beir/crossencoder_beir_bm25.ipynb cell 10). This
module materializes the same structure Spark-first:

  {path}/positions   one parquet row per (term, segment): the term's
                     doc ids, per-doc tf/doc-len, and every occurrence
                     position — each column block-coded with the
                     index's codec (varint | pfor). The row's payload
                     is a LIST of self-contained "runs" so compaction
                     can merge doc-disjoint segments by CONCATENATING
                     run lists verbatim — zero posting decode, any
                     codec (the positional twin of the block-struct
                     verbatim gather in ``indexer._merge_rows_arrow``).
  {path}/postings    the standard block-coded relation, DERIVED from
                     the written positions relation — one corpus scan
                     total: text is tokenized ONCE (pass 1 writes
                     positions); pass 2 re-reads only the compressed
                     positional relation (a few % of the text bytes at
                     100 TB), never the corpus. Derivation also makes
                     postings/positions disagreement impossible by
                     construction.

Scale notes (100 TB):
  - build is segment-local (segment == input partition, exactly like
    ``build_index``): no shuffle anywhere in either pass.
  - phrase queries scan ONLY the positions relation, term-pruned by a
    pushed ``In(term, ...)`` filter over term-sorted row groups (same
    pruning contract as the match-query paths, asserted in PLANS.md).
  - per segment the scored candidate set is bounded by the RAREST
    phrase term's postings, and the shuffle after per-segment top-k
    carries <= k rows per (query, segment).
  - all decode/alignment math is whole-array numpy inside one
    Arrow-batched pass per segment — no per-row Python.

Semantics are Lucene PhraseQuery slop=0, identical to the exhaustive
``operators.phrase`` path (value-identity tested): pf = overlapping
consecutive-occurrence count, idf summed over the phrase's term array
(duplicates per occurrence), BM25 with pf as the pseudo-term freq.
``slop > 0`` dispatches the same decoded positional batch to the
SloppyPhraseMatcher port in ``operators.sloppy`` (fractional sloppy
frequency through the identical BM25 formula; slop=0 stays on the
exact vectorized intersection).
"""

from __future__ import annotations

import json
import os
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sgpt_spark.functions.bm25 import B, K1, idf_py
from sgpt_spark.functions.compress import (
    CODECS,
    decode_columns_many,
    encode_blocks_arrow,
    pfor_encode_many,
    varint_encode_with_offsets,
)
from sgpt_spark.operators.index_search import (
    _emit_topk_frame,
    deterministic_topk,
    normalize_queries,
)
from sgpt_spark.operators.topk import SCORE_DECIMALS, topk_per_group

# one row per (term, segment); term NULL = per-segment sentinel stats
# row (same convention as POSTINGS: df = trim-nonempty doc count,
# n_pos = total token count, last_doc = max assigned doc id)
POSITIONS = T.StructType(
    [
        T.StructField("term", T.StringType(), True),
        T.StructField("segment", T.IntegerType(), False),
        T.StructField("df", T.LongType(), False),
        T.StructField("n_pos", T.LongType(), False),
        T.StructField("first_doc", T.LongType(), False),
        T.StructField("last_doc", T.LongType(), False),
        T.StructField(
            "runs",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("count", T.IntegerType(), False),
                        T.StructField("n_pos", T.LongType(), False),
                        T.StructField("first_doc", T.LongType(), False),
                        T.StructField("last_doc", T.LongType(), False),
                        # docs: count values, value 0 ABSOLUTE then deltas
                        # (self-anchored so runs concatenate verbatim)
                        T.StructField("docs", T.BinaryType(), False),
                        # tfs/dls: count raw values
                        T.StructField("tfs", T.BinaryType(), False),
                        T.StructField("dls", T.BinaryType(), False),
                        # pos: n_pos values, doc-major; within each doc the
                        # first value is the ABSOLUTE 1-based position, the
                        # rest are deltas — per-doc independence is what
                        # makes runs (and docs) mergeable without decode
                        T.StructField("pos", T.BinaryType(), False),
                    ]
                )
            ),
            False,
        ),
    ]
)


def _arrow_run_type():
    import pyarrow as pa

    return pa.struct(
        [
            pa.field("count", pa.int32(), False),
            pa.field("n_pos", pa.int64(), False),
            pa.field("first_doc", pa.int64(), False),
            pa.field("last_doc", pa.int64(), False),
            pa.field("docs", pa.binary(), False),
            pa.field("tfs", pa.binary(), False),
            pa.field("dls", pa.binary(), False),
            pa.field("pos", pa.binary(), False),
        ]
    )


def _encode_ranges_packed(
    values: np.ndarray, starts: np.ndarray, ends: np.ndarray, codec: str
) -> tuple[np.ndarray, np.ndarray]:
    """Encode contiguous ranges of one flat uint64 array under ``codec``
    -> (one backing uint8 buffer, int64 offsets of len n_ranges+1) for
    zero-object Arrow binary assembly. Ranges must tile [0, n) in order
    (the emitters' layout)."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    starts = np.asarray(starts, dtype=np.int64)
    ends = np.asarray(ends, dtype=np.int64)
    if codec == "pfor":
        bufs = pfor_encode_many(v, starts, ends)
        lens = np.fromiter((len(b) for b in bufs), dtype=np.int64, count=len(bufs))
        data = np.frombuffer(b"".join(bufs), dtype=np.uint8)
        return data, np.concatenate(([0], np.cumsum(lens)))
    data, off = varint_encode_with_offsets(v)
    return data, np.concatenate((off[starts], [off[-1] if len(off) else 0]))


def _bin_array(data: np.ndarray, offsets64: np.ndarray):
    """One pa.binary() array over a shared backing buffer (same 2 GB
    int32-offset guard and remedy as ``compress.encode_blocks_arrow``)."""
    import pyarrow as pa

    if offsets64[-1] > np.iinfo(np.int32).max:
        raise ValueError(
            "segment position buffer exceeds 2GB (int32 binary offsets) — "
            "repartition the corpus into smaller segments"
        )
    offs32 = offsets64.astype(np.int32)
    return pa.Array.from_buffers(
        pa.binary(),
        len(offsets64) - 1,
        [None, pa.py_buffer(offs32.tobytes()), pa.py_buffer(data.tobytes())],
    )


def _encode_positions_arrow(batches, py_tokenizer, text_col: str, codec: str):
    """One input partition = one positional segment: tokenize once,
    group (term, doc) pairs, emit one POSITIONS row per term (single
    run) plus the sentinel stats row — all whole-array numpy, mirroring
    ``indexer._encode_segment_arrow`` (rows come out term-sorted, so
    parquet row groups prune on the query side's In(term,...) filter).
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    from sgpt_spark.functions.analyzer import analyze_py as _std
    from sgpt_spark.functions.analyzer import tokenize_py_ws as _ws
    from sgpt_spark.operators.indexer import (
        _tokenize_codes_py,
        _tokenize_codes_standard,
        _tokenize_codes_ws,
    )

    chunks = [b for b in batches if b.num_rows]
    if not chunks:
        return
    seg = int(chunks[0].column("_seg")[0].as_py())
    ids = (
        pa.chunked_array([b.column("doc_id") for b in chunks])
        .combine_chunks()
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    texts = pa.chunked_array([b.column(text_col) for b in chunks]).combine_chunks()
    order = np.argsort(ids, kind="stable")
    ids = ids[order]
    texts = texts.take(pa.array(order))
    if py_tokenizer is _ws:
        codes, doc_idx, lens, terms_arr = _tokenize_codes_ws(texts)
    elif py_tokenizer is _std:
        codes, doc_idx, lens, terms_arr = _tokenize_codes_standard(texts)
    else:
        codes, doc_idx, lens, terms_arr = _tokenize_codes_py(
            texts.to_pandas(), py_tokenizer
        )

    run_type = _arrow_run_type()
    names = ["term", "segment", "df", "n_pos", "first_doc", "last_doc", "runs"]

    def sentinel_batch() -> pa.RecordBatch:
        trimmed = pc.utf8_trim(
            pc.coalesce(texts.cast(pa.large_string()), pa.scalar("", pa.large_string())),
            characters=" ",
        )
        nonempty = int(pc.sum(pc.not_equal(trimmed, "").cast(pa.int64())).as_py() or 0)
        empty_runs = pa.ListArray.from_arrays(
            pa.array([0, 0], pa.int32()), pa.array([], type=run_type)
        )
        return pa.RecordBatch.from_arrays(
            [
                pa.array([None], pa.string()),
                pa.array([seg], pa.int32()),
                pa.array([nonempty], pa.int64()),
                pa.array([int(lens.sum())], pa.int64()),
                pa.array([int(ids[0]) if len(ids) else 0], pa.int64()),
                pa.array([int(ids[-1]) if len(ids) else 0], pa.int64()),
                empty_runs,
            ],
            names=names,
        )

    if len(codes) == 0:
        if len(ids):
            yield sentinel_batch()
        return

    # 1-based position of each token within its doc (token arrays are
    # doc-major in doc order)
    doc_starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
    pos = np.arange(len(codes), dtype=np.int64) - doc_starts[doc_idx] + 1
    # stable sort by (term code, doc) keeps positions ascending per pair
    order = np.lexsort((doc_idx, codes))
    c_s, d_s, p_s = codes[order], doc_idx[order], pos[order]

    pair_change = (c_s[1:] != c_s[:-1]) | (d_s[1:] != d_s[:-1])
    pair_tok_starts = np.concatenate(([0], np.flatnonzero(pair_change) + 1))
    pair_tok_ends = np.concatenate((pair_tok_starts[1:], [len(c_s)]))
    tf = pair_tok_ends - pair_tok_starts
    pair_code = c_s[pair_tok_starts]
    pair_doc = ids[d_s[pair_tok_starts]]
    pair_dl = lens[d_s[pair_tok_starts]]

    term_change = pair_code[1:] != pair_code[:-1]
    t_starts = np.concatenate(([0], np.flatnonzero(term_change) + 1))  # pair idx
    t_ends = np.concatenate((t_starts[1:], [len(pair_code)]))
    df = (t_ends - t_starts).astype(np.int64)
    tok_t_starts = pair_tok_starts[t_starts]
    tok_t_ends = np.concatenate((tok_t_starts[1:], [len(c_s)]))
    n_pos = (tok_t_ends - tok_t_starts).astype(np.int64)

    # docs: deltas with the first value per term-run ABSOLUTE
    docs_delta = pair_doc.astype(np.int64).copy()
    docs_delta[1:] -= pair_doc[:-1]
    docs_delta[t_starts] = pair_doc[t_starts]
    # positions: deltas with the first value per (term, doc) ABSOLUTE
    pos_delta = p_s.copy()
    pos_delta[1:] -= p_s[:-1]
    pos_delta[pair_tok_starts] = p_s[pair_tok_starts]

    d_bytes, d_off = _encode_ranges_packed(docs_delta, t_starts, t_ends, codec)
    t_bytes, tf_off = _encode_ranges_packed(tf, t_starts, t_ends, codec)
    l_bytes, dl_off = _encode_ranges_packed(pair_dl, t_starts, t_ends, codec)
    p_bytes, p_off = _encode_ranges_packed(pos_delta, tok_t_starts, tok_t_ends, codec)

    first_doc = pair_doc[t_starts].astype(np.int64)
    last_doc = pair_doc[t_ends - 1].astype(np.int64)
    run_children = [
        pa.array(df.astype(np.int32), type=pa.int32()),
        pa.array(n_pos, type=pa.int64()),
        pa.array(first_doc, type=pa.int64()),
        pa.array(last_doc, type=pa.int64()),
        _bin_array(d_bytes, d_off),
        _bin_array(t_bytes, tf_off),
        _bin_array(l_bytes, dl_off),
        _bin_array(p_bytes, p_off),
    ]
    runs_struct = pa.StructArray.from_arrays(run_children, fields=list(run_type))
    runs = pa.ListArray.from_arrays(
        pa.array(np.arange(len(df) + 1, dtype=np.int32)), runs_struct
    )
    yield pa.RecordBatch.from_arrays(
        [
            pa.array(terms_arr[pair_code[t_starts]], type=pa.string()),
            pa.array(np.full(len(df), seg, dtype=np.int32)),
            pa.array(df),
            pa.array(n_pos),
            pa.array(first_doc),
            pa.array(last_doc),
            runs,
        ],
        names=names,
    )
    yield sentinel_batch()


def _decode_rows(runs_lists, codec: str):
    """Decode MANY rows' run lists in whole-array batch passes ->
    (row_offsets int64 over pairs, docs int64[], tfs int64[], dls
    int64[], pos_offsets int64 over occurrences, pos int64[]).

    ``runs_lists``: iterable of per-row run-struct lists (pandas) — each
    run dict carries (count, n_pos, docs, tfs, dls, pos). Positions come
    back ABSOLUTE (per-doc delta resets applied vectorized)."""
    run_counts, run_npos, dbufs, tbufs, lbufs, pbufs, row_nruns = [], [], [], [], [], [], []
    for runs in runs_lists:
        row_nruns.append(len(runs))
        for r in runs:
            run_counts.append(int(r["count"]))
            run_npos.append(int(r["n_pos"]))
            dbufs.append(r["docs"])
            tbufs.append(r["tfs"])
            lbufs.append(r["dls"])
            pbufs.append(r["pos"])
    run_counts = np.asarray(run_counts, dtype=np.int64)
    run_npos = np.asarray(run_npos, dtype=np.int64)
    row_nruns = np.asarray(row_nruns, dtype=np.int64)

    docs_delta = decode_columns_many(dbufs, run_counts, codec).astype(np.int64)
    tfs = decode_columns_many(tbufs, run_counts, codec).astype(np.int64)
    dls = decode_columns_many(lbufs, run_counts, codec).astype(np.int64)
    pos_delta = decode_columns_many(pbufs, run_npos, codec).astype(np.int64)

    # docs: cumsum with a reset at every run start (run-local absolute anchor)
    run_starts = np.concatenate(([0], np.cumsum(run_counts)[:-1]))
    docs = np.cumsum(docs_delta)
    base = np.zeros(len(run_counts), dtype=np.int64)
    nz = run_starts > 0
    base[nz] = docs[run_starts[nz] - 1]
    docs = docs - np.repeat(base, run_counts)

    # positions: cumsum with a reset at every (run, doc) boundary
    pair_pos_starts = np.concatenate(([0], np.cumsum(tfs)[:-1]))
    pcs = np.cumsum(pos_delta)
    pbase = np.zeros(len(tfs), dtype=np.int64)
    pnz = pair_pos_starts > 0
    pbase[pnz] = pcs[pair_pos_starts[pnz] - 1]
    pos = pcs - np.repeat(pbase, tfs)

    # per-row boundaries (pairs and occurrences)
    row_pair_counts = np.zeros(len(row_nruns), dtype=np.int64)
    row_pos_counts = np.zeros(len(row_nruns), dtype=np.int64)
    if len(run_counts):
        row_idx = np.repeat(np.arange(len(row_nruns), dtype=np.int64), row_nruns)
        np.add.at(row_pair_counts, row_idx, run_counts)
        np.add.at(row_pos_counts, row_idx, run_npos)
    row_offsets = np.concatenate(([0], np.cumsum(row_pair_counts)))
    pos_offsets = np.concatenate(([0], np.cumsum(row_pos_counts)))
    return row_offsets, docs, tfs, dls, pos_offsets, pos


def _derive_postings(positions_df: DataFrame, codec: str) -> DataFrame:
    """positions relation -> standard POSTINGS relation (block-coded),
    row for row: decode each term's runs (batched), re-block via
    ``encode_blocks_arrow``; sentinel rows map to postings sentinels
    (df -> df, n_pos -> max_tf, last_doc -> min_dl). Input order is
    preserved, so the derived postings inherit the positions relation's
    term-sorted row groups (query-side row-group pruning)."""
    from sgpt_spark.schema import POSTINGS

    schema = T.StructType(
        [
            T.StructField(f.name, f.dataType, True if f.name == "term" else f.nullable)
            for f in POSTINGS.fields
        ]
    )

    def derive(batches, codec_: str):
        import pyarrow as pa

        from sgpt_spark.functions.compress import BLOCK_SIZE

        blocks_type = pa.list_(
            pa.struct(
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
        )
        names = ["term", "segment", "df", "max_tf", "min_dl", "blocks"]
        for batch in batches:
            if batch.num_rows == 0:
                continue
            terms = batch.column("term")
            is_sent = terms.is_null().to_numpy(zero_copy_only=False)
            segs = batch.column("segment").to_numpy(zero_copy_only=False)
            dfs = batch.column("df").to_numpy(zero_copy_only=False)
            nposs = batch.column("n_pos").to_numpy(zero_copy_only=False)
            lasts = batch.column("last_doc").to_numpy(zero_copy_only=False)
            runs_col = batch.column("runs").to_pylist()

            # sentinel rows -> postings sentinels
            sent_idx = np.flatnonzero(is_sent)
            if len(sent_idx):
                empty_blocks = pa.ListArray.from_arrays(
                    pa.array(np.zeros(len(sent_idx) + 1, dtype=np.int32)),
                    pa.array([], type=blocks_type.value_type),
                )
                yield pa.RecordBatch.from_arrays(
                    [
                        pa.array([None] * len(sent_idx), pa.string()),
                        pa.array(segs[sent_idx].astype(np.int32)),
                        pa.array(dfs[sent_idx].astype(np.int64)),
                        pa.array(nposs[sent_idx].astype(np.int64)),
                        pa.array(lasts[sent_idx].astype(np.int64)),
                        empty_blocks,
                    ],
                    names=names,
                )
            term_idx = np.flatnonzero(~is_sent)
            if not len(term_idx):
                continue
            row_off, docs, tfs, dls, _, _ = _decode_rows(
                (runs_col[i] for i in term_idx), codec_
            )
            starts, ends = row_off[:-1], row_off[1:]
            blocks = encode_blocks_arrow(
                docs, tfs.astype(np.uint64), dls.astype(np.uint64),
                starts, ends, block_size=BLOCK_SIZE, codec=codec_,
            )
            yield pa.RecordBatch.from_arrays(
                [
                    terms.take(pa.array(term_idx)),
                    pa.array(segs[term_idx].astype(np.int32)),
                    pa.array((ends - starts).astype(np.int64)),
                    pa.array(np.maximum.reduceat(tfs, starts)),
                    pa.array(np.minimum.reduceat(dls, starts)),
                    blocks,
                ],
                names=names,
            )

    return positions_df.mapInArrow(lambda b: derive(b, codec), schema=schema)


def build_positional_index(
    docs: DataFrame,
    path: str,
    segment_size: "int | None" = None,
    py_tokenizer=None,
    k1: float = K1,
    b: float = B,
    codec: str = "varint",
):
    """Single-tokenize positional build: pass 1 scans the corpus ONCE
    and writes ``{path}/positions``; pass 2 derives ``{path}/postings``
    from the written (compressed, far smaller) positional relation plus
    the same termstats/meta finalization as ``build_index``. The result
    serves every match-query path unchanged AND ``phrase_search_index``.

    Segment model matches ``build_index``: segment == input partition
    (control size upstream via repartition); ``segment_size`` is
    advisory metadata. Returns IndexMeta with ``positions=True``.
    """
    from sgpt_spark.functions.analyzer import tokenize_py_ws
    from sgpt_spark.operators.indexer import (
        DEFAULT_SEGMENT_SIZE,
        IndexMeta,
        BLOCK_SIZE,
    )

    if codec not in CODECS:
        raise ValueError(f"unknown codec {codec!r}: {'|'.join(CODECS)}")
    if py_tokenizer is None:
        py_tokenizer = tokenize_py_ws
    if segment_size is None:
        segment_size = DEFAULT_SEGMENT_SIZE
    text_col = "text"
    src = docs.select("doc_id", text_col).withColumn("_seg", F.spark_partition_id())

    def emit(batches):
        yield from _encode_positions_arrow(batches, py_tokenizer, text_col, codec)

    src.mapInArrow(emit, schema=POSITIONS).write.mode("overwrite").parquet(
        f"{path}/positions"
    )

    positions = spark_read_positions(docs.sparkSession, path)
    _derive_postings(positions, codec).write.mode("overwrite").parquet(
        f"{path}/postings"
    )

    spark = docs.sparkSession
    row = (
        spark.read.parquet(f"{path}/postings")
        .filter(F.col("term").isNull())
        .agg(
            F.sum("df").alias("n"),
            F.sum("max_tf").alias("total"),
            F.max("min_dl").alias("max_id"),
        )
        .collect()[0]
    )
    n_docs = int(row["n"] or 0)
    total_len = int(row["total"] or 0)
    meta = IndexMeta(
        n_docs=n_docs,
        avgdl=(total_len / n_docs) if n_docs else 0.0,
        segment_size=segment_size,
        k1=k1,
        b=b,
        block_size=BLOCK_SIZE,
        analyzer=getattr(py_tokenizer, "__name__", "custom"),
        total_len=total_len,
        next_doc_id=(int(row["max_id"]) + 1) if row["max_id"] is not None else 0,
        codec=codec,
        positions=True,
    )
    (
        spark.read.parquet(f"{path}/postings")
        .filter(F.col("term").isNotNull())
        .groupBy("term")
        .agg(F.sum("df").alias("df"))
        .sortWithinPartitions("term")
        .write.mode("overwrite")
        .parquet(f"{path}/termstats")
    )
    os.makedirs(path, exist_ok=True)
    with open(f"{path}/meta.json", "w") as fp:
        json.dump(meta.__dict__, fp)
    return meta


def spark_read_positions(spark: SparkSession, path: str) -> DataFrame:
    """RAW positions relation (sentinels included)."""
    return spark.read.parquet(f"{path}/positions")


def read_positional_index(spark: SparkSession, path: str):
    """-> (positions sans sentinels, IndexMeta). Loud if the index was
    not built positional (match-only indexes cannot answer phrases)."""
    from sgpt_spark.operators.indexer import IndexMeta

    with open(f"{path}/meta.json") as fp:
        meta = IndexMeta(**json.load(fp))
    if not getattr(meta, "positions", False):
        raise ValueError(
            f"{path!r} has no positional sidecar (built with build_index, "
            "positions=False) — phrase search needs build_positional_index"
        )
    return (
        spark_read_positions(spark, path).filter(F.col("term").isNotNull()),
        meta,
    )


# --- index-backed phrase search ------------------------------------------

_LOCAL_DOC_BITS = 32  # per-segment doc span and positions must fit 31 bits


def _phrase_parts(
    decoded: dict, phrases: list, kk, k1: float, b: float, avgdl: float
):
    """Score one segment's decoded positional postings against every
    phrase -> [(qid, doc_ids, scores)].

    ``decoded``: term -> (docs, dls, occ_doc, occ_pos) — occurrence
    arrays doc-major, positions ascending per doc. ``phrases``:
    [(qid, terms tuple, sum_idf)]. Alignment is the exhaustive path's
    relational math vectorized: occurrence (doc, pos) of the term at
    phrase offset j votes for start pos - j; a start present in EVERY
    offset's key array is one phrase hit (per (doc, start, j) at most
    one vote exists, so set-intersection == full coverage)."""
    if not decoded:
        return []
    base = min(int(v[0][0]) for v in decoded.values())
    hi = max(int(v[0][-1]) for v in decoded.values())
    if hi - base >= (1 << (_LOCAL_DOC_BITS - 1)):
        raise ValueError(
            "segment doc-id span exceeds 2^31 — rebuild with denser ids "
            "or smaller segments (phrase alignment packs (doc, start) "
            "into one int64 key)"
        )
    parts = []
    for qid, terms, sum_idf in phrases:
        if any(t not in decoded for t in terms):
            continue
        m = len(terms)
        # rarest term first: every intersection is bounded by it
        order = sorted(range(m), key=lambda j: len(decoded[terms[j]][2]))
        keys = None
        for j in order:
            docs_j, pos_j = decoded[terms[j]][2], decoded[terms[j]][3]
            kj = ((docs_j - base) << _LOCAL_DOC_BITS) + (pos_j - (j + 1) + m)
            keys = kj if keys is None else np.intersect1d(keys, kj, assume_unique=True)
            if len(keys) == 0:
                break
        if keys is None or len(keys) == 0:
            continue
        local = keys >> _LOCAL_DOC_BITS
        uniq_local, pf = np.unique(local, return_counts=True)
        doc_ids = uniq_local + base
        t0 = terms[order[0]]
        tdocs, tdls = decoded[t0][0], decoded[t0][1]
        dl = tdls[np.searchsorted(tdocs, doc_ids)].astype(np.float64)
        raw = sum_idf * pf / (pf + k1 * (1.0 - b + b * dl / avgdl))
        if kk is None:
            # ALL hits, UNROUNDED: the multifield dis-max combines raw
            # per-field scores and rounds only the combined value (the
            # exhaustive path's order — rounding partials first could
            # flip the 6-dp final at .0000005 boundaries)
            parts.append((qid, doc_ids, raw))
        else:
            scores = np.round(raw, SCORE_DECIMALS)
            sel = deterministic_topk(doc_ids, scores, kk)
            parts.append((qid, doc_ids[sel], scores[sel]))
    return parts


def phrase_search_index(
    spark: SparkSession,
    path: str,
    queries,
    k: int = 10,
    tokenize=None,
    term_stats: DataFrame | dict | None = None,
    slop: int = 0,
) -> DataFrame:
    """ES ``match_phrase`` over a persisted positional index ->
    (qid, doc_id, score, rank); at the default slop=0 value-identical
    to the exhaustive ``phrase.phrase_search`` over the same corpus
    (tested).

    ``slop``: Lucene SloppyPhraseQuery semantics (``operators.sloppy``)
    — matches within ``slop`` position moves score a fractional
    "sloppy frequency" (sum of 1/(1+matchLength)) through the same BM25
    phrase formula; slop=0 keeps the exact consecutive-occurrence path.
    Repeated phrase terms under slop>0 are refused loudly (documented
    divergence — Lucene's repeating-terms machinery is out of scope).

    Plan: the positions relation is scanned ONCE, term-pruned by a
    pushed In(term, ...) filter; each segment aligns and scores locally
    (whole-array numpy) and ships <= k rows per (query, segment) into
    the global deterministic top-k. Queries follow ``search_index``'s
    collect contract (query sets are contractually small; the phrase
    term lists broadcast)."""
    seg_topk, qid_type = _phrase_seg_hits(
        spark, path, queries, kk=k, tokenize=tokenize, term_stats=term_stats,
        slop=slop,
    )
    return topk_per_group(seg_topk, k=k).select("qid", "doc_id", "score", "rank")


def phrase_hits_index(
    spark: SparkSession,
    path: str,
    queries,
    tokenize=None,
    term_stats: DataFrame | dict | None = None,
    slop: int = 0,
):
    """ALL phrase hits (qid, doc_id, score) off the positional index —
    no per-segment or global top-k cut. Consumed by the multifield
    dis-max (``phrase_multifield.phrase_search_multifield_index``),
    which needs every candidate's per-field score; phrase hits are
    naturally bounded by the rarest phrase term's df. Returns
    (hits DataFrame, qid schema type)."""
    return _phrase_seg_hits(
        spark, path, queries, kk=None, tokenize=tokenize, term_stats=term_stats,
        slop=slop,
    )


def _phrase_seg_hits(
    spark: SparkSession,
    path: str,
    queries,
    kk,
    tokenize=None,
    term_stats: DataFrame | dict | None = None,
    slop: int = 0,
):
    """Shared body of the collect-contract phrase paths: -> (per-segment
    hit rows (qid, doc_id, score) — top-kk per (query, segment), or ALL
    hits when kk is None — and the qid schema type)."""
    from sgpt_spark.functions.analyzer import resolve_py_analyzer

    positions, meta = read_positional_index(spark, path)
    queries, qid_type = normalize_queries(queries)
    tok = tokenize or resolve_py_analyzer(meta.analyzer)
    if isinstance(queries, DataFrame):
        pairs = [(r["qid"], r["query"]) for r in queries.collect()]
    else:
        pairs = list(queries)
    if slop:
        from sgpt_spark.operators.sloppy import check_sloppy_phrase

    qphrases: list = []
    for qid, qtext in pairs:
        terms = tuple(tok(qtext or ""))
        if terms:
            if slop:
                check_sloppy_phrase(terms, slop)  # loud, driver-side
            qphrases.append((qid, terms))
    seg_schema = f"qid {qid_type}, doc_id long, score double"
    empty = spark.createDataFrame([], seg_schema)
    if not qphrases:
        return empty, qid_type

    terms = sorted({t for _, ts in qphrases for t in ts})
    cand = positions.filter(F.col("term").isin(terms))

    # summed idf over the phrase's term ARRAY from the global (term, df)
    # side table — same stats the match query uses (Lucene sums
    # termStats over PhraseQuery's terms; corpus-absent terms can match
    # nothing, so their dropped idf never meets a result row)
    if isinstance(term_stats, dict):
        global_df = {t: int(term_stats[t]) for t in terms if t in term_stats}
    elif term_stats is not None:
        global_df = {
            r["term"]: int(r["df"])
            for r in term_stats.filter(F.col("term").isin(terms)).collect()
        }
    else:
        global_df = {
            r["term"]: int(r["df"])
            for r in cand.groupBy("term").agg(F.sum("df").alias("df")).collect()
        }
    idf = {t: idf_py(d, meta.n_docs) for t, d in global_df.items()}
    phrases = [
        (qid, ts, sum(idf[t] for t in ts))
        for qid, ts in qphrases
        if all(t in idf for t in ts)
    ]
    if not phrases:
        return empty, qid_type
    b_phrases = spark.sparkContext.broadcast(phrases)
    k1, b, avgdl, codec, slop_ = meta.k1, meta.b, meta.avgdl, meta.codec, slop

    def score_wrapper(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        chunks = list(batches)
        if not chunks:
            return
        pdf = pd.concat(chunks, ignore_index=True) if len(chunks) > 1 else chunks[0]
        for seg in pdf["segment"].unique():
            sdf = pdf[pdf["segment"] == seg]
            row_off, docs, tfs, dls, pos_off, pos = _decode_rows(sdf["runs"], codec)
            decoded = {}
            for i, term in enumerate(sdf["term"]):
                ps, pe = int(row_off[i]), int(row_off[i + 1])
                if pe == ps:
                    continue
                d_i, tf_i, dl_i = docs[ps:pe], tfs[ps:pe], dls[ps:pe]
                os_, oe = int(pos_off[i]), int(pos_off[i + 1])
                occ_doc = np.repeat(d_i, tf_i)
                decoded[term] = (d_i, dl_i, occ_doc, pos[os_:oe])
            if slop_:
                from sgpt_spark.operators.sloppy import sloppy_parts

                parts = sloppy_parts(
                    decoded, b_phrases.value, slop_, kk, k1, b, avgdl
                )
            else:
                parts = _phrase_parts(decoded, b_phrases.value, kk, k1, b, avgdl)
            if parts:
                yield _emit_topk_frame(parts)

    seg_hits = cand.repartition("segment").mapInPandas(score_wrapper, schema=seg_schema)
    return seg_hits, qid_type


def phrase_search_index_cogroup(
    spark: SparkSession,
    path: str,
    queries,
    k: int = 10,
    tokenizer=None,
    term_stats: DataFrame | None = None,
    slop: int = 0,
) -> DataFrame:
    """In-plan phrase query path (no driver collect — the
    millions-of-phrases scale contract, mirroring
    ``search_index_cogroup``): queries tokenize INSIDE the plan into
    ordered (qid, offset, m, term) rows, per-query summed idf comes from
    an in-plan join against the (term, df) side table (a query whose
    joined row count < m contains a corpus-absent term and is dropped —
    it could match nothing), the rows replicate across CANDIDATE
    segments via one broadcast crossJoin, and a segment COGROUP hands
    each task (segment's positional runs, segment's phrase slice) —
    decoded and aligned by the same ``_phrase_parts`` numpy kernel the
    collect path uses. Value-identical to ``phrase_search_index``
    (tested). Shuffled volume: term-pruned positional runs + |phrase
    rows| x candidate segments; <= k result rows per (query, segment)."""
    seg_topk, _ = _phrase_cogroup_hits(
        spark, path, queries, kk=k, tokenizer=tokenizer, term_stats=term_stats,
        slop=slop,
    )
    return topk_per_group(seg_topk, k=k).select("qid", "doc_id", "score", "rank")


def phrase_hits_index_cogroup(
    spark: SparkSession,
    path: str,
    queries,
    tokenizer=None,
    term_stats: DataFrame | None = None,
    slop: int = 0,
    with_segment: bool = False,
):
    """In-plan twin of ``phrase_hits_index``: ALL phrase hits with
    UNROUNDED scores, queries never touching the driver — the per-field
    building block for the multifield dis-max at huge phrase-batch
    scale. Returns (hits DataFrame, qid schema type).

    ``with_segment=True`` appends the emitting segment id to each hit
    row — the shape a downstream segment-cogrouped combiner needs (the
    ``simple_query_string`` fast path feeds these rows to the bool
    bitmap kernel as scored doc-bit rows without a doc->segment join;
    each doc lives in exactly one segment, so the column is free)."""
    return _phrase_cogroup_hits(
        spark, path, queries, kk=None, tokenizer=tokenizer, term_stats=term_stats,
        slop=slop, with_segment=with_segment,
    )


def _phrase_cogroup_hits(
    spark: SparkSession,
    path: str,
    queries,
    kk,
    tokenizer=None,
    term_stats: DataFrame | None = None,
    slop: int = 0,
    with_segment: bool = False,
):
    """Shared body of the in-plan phrase paths -> (per-segment hit rows
    (qid, doc_id, score) — top-kk per (query, segment), or ALL hits
    unrounded when kk is None — and the qid schema type)."""
    from sgpt_spark.functions.analyzer import resolve_jvm_analyzer
    from sgpt_spark.functions.bm25 import idf as idf_col
    from sgpt_spark.operators.corpus import non_empty_text

    positions, meta = read_positional_index(spark, path)
    queries, qid_type = normalize_queries(queries)
    if not isinstance(queries, DataFrame):
        queries = spark.createDataFrame(queries, f"qid {qid_type}, query string")
    tok = tokenizer or resolve_jvm_analyzer(meta.analyzer)
    qp = (
        non_empty_text(queries, "query")
        .select(F.col("qid"), tok(F.col("query")).alias("qarr"))
        .filter(F.size("qarr") > 0)
        .select(
            "qid",
            F.size("qarr").alias("m"),
            F.posexplode("qarr").alias("j0", "term"),
        )
        .select("qid", (F.col("j0") + 1).alias("j"), "m", "term")
    )
    dfs = term_stats if term_stats is not None else positions.groupBy("term").agg(
        F.sum("df").alias("df")
    )
    # inner join: joined row count == m iff every phrase offset found its
    # term in the corpus (duplicate terms join once per OFFSET row)
    qidf = (
        qp.join(dfs, "term")
        .groupBy("qid")
        .agg(
            F.sum(idf_col(F.col("df"), meta.n_docs)).alias("sum_idf"),
            F.count("*").alias("_nm"),
            F.first("m").alias("_m"),
        )
        .filter(F.col("_nm") == F.col("_m"))
        .select("qid", "sum_idf")
    )
    qrows = qp.join(qidf, "qid")
    cand = positions.join(qp.select("term").distinct(), "term", "left_semi").select(
        "segment", "term", "runs"
    )
    segs = cand.select(F.col("segment").cast("int").alias("segment")).distinct()
    qseg = qrows.crossJoin(F.broadcast(segs))
    k1, b, avgdl, codec, slop_ = meta.k1, meta.b, meta.avgdl, meta.codec, slop
    seg_schema = f"qid {qid_type}, doc_id long, score double"
    if with_segment:
        seg_schema += ", segment int"

    def score(pleft: pd.DataFrame, pright: pd.DataFrame) -> pd.DataFrame:
        if len(pleft) == 0 or len(pright) == 0:
            frame = _emit_topk_frame([])
            if with_segment:
                frame = frame.assign(segment=pd.Series([], dtype="int32"))
            return frame
        row_off, docs, tfs, dls, pos_off, pos = _decode_rows(pleft["runs"], codec)
        decoded = {}
        for i, term in enumerate(pleft["term"]):
            ps, pe = int(row_off[i]), int(row_off[i + 1])
            if pe == ps:
                continue
            d_i, tf_i, dl_i = docs[ps:pe], tfs[ps:pe], dls[ps:pe]
            decoded[term] = (
                d_i, dl_i, np.repeat(d_i, tf_i),
                pos[int(pos_off[i]): int(pos_off[i + 1])],
            )
        if not decoded:
            frame = _emit_topk_frame([])
            if with_segment:
                frame = frame.assign(segment=pd.Series([], dtype="int32"))
            return frame
        phrases = []
        for qid, grp in pright.groupby("qid", sort=False):
            g = grp.sort_values("j")
            phrases.append((qid, tuple(g["term"]), float(g["sum_idf"].iloc[0])))
        if slop_:
            from sgpt_spark.operators.sloppy import sloppy_parts

            frame = _emit_topk_frame(
                sloppy_parts(decoded, phrases, slop_, kk, k1, b, avgdl)
            )
        else:
            frame = _emit_topk_frame(
                _phrase_parts(decoded, phrases, kk, k1, b, avgdl)
            )
        if with_segment:
            frame = frame.assign(
                segment=np.int32(pleft["segment"].iloc[0])
            )
        return frame

    seg_hits = (
        cand.groupBy("segment")
        .cogroup(qseg.groupBy("segment"))
        .applyInPandas(score, schema=seg_schema)
    )
    return seg_hits, qid_type


# --- compaction (verbatim run-list concatenation, pure JVM) ----------------


_POS_MERGE_MAX = 8_000_000  # decoded pairs per overlapping merge group


def _merge_overlapping_rows(batches: Iterator[pd.DataFrame], codec: str):
    """Decode-merge fallback for groups whose source segments have
    OVERLAPPING doc-id ranges (hash-partitioned builds): decode every
    run, interleave (term, doc) pairs by doc order, re-encode as ONE
    fresh run. Positions never decode to absolute — per-doc delta blocks
    are order-independent, so they GATHER at the pair level. Peak is one
    group's decoded pairs (capped loudly)."""
    for pdf in batches:
        if len(pdf) == 0:
            continue
        out_rows = []
        for _, row in pdf.iterrows():
            row_off, docs, tfs, dls, _, _ = _decode_rows([row["runs"]], codec)
            n = int(row_off[-1])
            if n > _POS_MERGE_MAX:
                raise ValueError(
                    f"compact_positions: overlapping-range merge group for "
                    f"term {row['term']!r} has {n} postings (> {_POS_MERGE_MAX}) "
                    "— rebuild with range-partitioned input (doc-disjoint "
                    "segments merge verbatim at any size)"
                )
            # per-pair delta blocks of pos, gathered (no decode-to-absolute)
            pos_delta = decode_columns_many(
                [r["pos"] for r in row["runs"]],
                np.asarray([int(r["n_pos"]) for r in row["runs"]], dtype=np.int64),
                codec,
            ).astype(np.int64)
            perm = np.argsort(docs, kind="stable")
            pair_starts = np.concatenate(([0], np.cumsum(tfs)[:-1]))
            lens_p = tfs[perm]
            within = np.arange(int(lens_p.sum()), dtype=np.int64) - np.repeat(
                np.concatenate(([0], np.cumsum(lens_p)[:-1])), lens_p
            )
            gather = np.repeat(pair_starts[perm], lens_p) + within
            pos_new = pos_delta[gather]
            docs_new = docs[perm]
            docs_delta = docs_new.copy()
            if len(docs_delta) > 1:
                docs_delta[1:] -= docs_new[:-1]
            one = np.array([0], dtype=np.int64)
            d_b, _ = _encode_ranges_packed(docs_delta, one, [len(docs_delta)], codec)
            t_b, _ = _encode_ranges_packed(tfs[perm], one, [n], codec)
            l_b, _ = _encode_ranges_packed(dls[perm], one, [n], codec)
            p_b, _ = _encode_ranges_packed(pos_new, one, [len(pos_new)], codec)
            out_rows.append(
                {
                    "term": row["term"],
                    "segment": int(row["segment"]),
                    "df": n,
                    "n_pos": int(len(pos_new)),
                    "first_doc": int(docs_new[0]),
                    "last_doc": int(docs_new[-1]),
                    "runs": [
                        {
                            "count": n,
                            "n_pos": int(len(pos_new)),
                            "first_doc": int(docs_new[0]),
                            "last_doc": int(docs_new[-1]),
                            "docs": d_b.tobytes(),
                            "tfs": t_b.tobytes(),
                            "dls": l_b.tobytes(),
                            "pos": p_b.tobytes(),
                        }
                    ],
                }
            )
        if out_rows:
            yield pd.DataFrame(out_rows)


def compact_positions(spark: SparkSession, path: str, bucket: dict) -> None:
    """Re-segment ``{path}/positions`` under the SAME old->new segment
    mapping the postings compaction used — positional and match
    relations must never disagree on segmentation.

    Two regimes, routed per group in-plan (the positional twin of
    ``indexer._merge_partition_arrow``'s regimes):

    verbatim  doc-DISJOINT source segments (range-partitioned builds,
              appends): runs are self-contained (docs and positions
              re-anchor absolutely per run/doc), so the merge is pure
              declarative SQL — ``flatten(collect_list(runs) sorted by
              first_doc)``, zero decode under either codec, no Python.
    decode    OVERLAPPING doc ranges (hash-partitioned builds): pairs
              interleave by doc order in numpy; positions gather as
              intact per-doc delta blocks (never decoded to absolute).

    Sentinels merge additively like postings sentinels."""
    import shutil

    codec = "varint"
    if os.path.exists(f"{path}/meta.json"):
        with open(f"{path}/meta.json") as fp:
            codec = json.load(fp).get("codec", "varint")
    raw = spark_read_positions(spark, path)
    present = {r["segment"] for r in raw.select("segment").distinct().collect()}
    missing = sorted(present - bucket.keys())
    if missing:
        raise ValueError(
            f"seg map omits segments {missing} present in {path}/positions"
        )
    mapping_df = spark.createDataFrame(
        [(s, b) for s, b in bucket.items()], "segment int, _new_seg int"
    )
    g = (
        raw.join(F.broadcast(mapping_df), "segment")
        .groupBy("term", "_new_seg")
        .agg(
            F.sum("df").alias("df"),
            F.sum("n_pos").alias("n_pos"),
            F.min("first_doc").alias("first_doc"),
            F.max("last_doc").alias("last_doc"),
            F.array_sort(
                F.collect_list(F.struct("first_doc", "last_doc", "runs"))
            ).alias("_rs"),
        )
    )
    disjoint = F.col("term").isNull() | (F.size("_rs") <= 1) | F.expr(
        "aggregate(zip_with(slice(_rs, 1, size(_rs) - 1), slice(_rs, 2, size(_rs) - 1),"
        " (a, b) -> a.last_doc < b.first_doc), true, (acc, x) -> acc and x)"
    )
    g = g.withColumn("_disjoint", disjoint)
    cols = [
        "term",
        F.col("_new_seg").alias("segment"),
        "df",
        "n_pos",
        "first_doc",
        "last_doc",
        F.flatten(F.expr("transform(_rs, x -> x.runs)")).alias("runs"),
    ]
    verbatim = g.filter(F.col("_disjoint")).select(*cols)
    overlap = (
        g.filter(~F.col("_disjoint"))
        .select(*cols)
        .mapInPandas(
            lambda batches: _merge_overlapping_rows(batches, codec),
            schema=POSITIONS,
        )
    )
    merged = verbatim.unionByName(overlap)
    tmp = f"{path}/positions_compact"
    merged.write.mode("overwrite").parquet(tmp)
    shutil.rmtree(f"{path}/positions")
    os.rename(tmp, f"{path}/positions")


# --- incremental append -----------------------------------------------------


def append_to_positional_index(
    spark: SparkSession,
    new_pages: DataFrame,
    index_path: str,
    py_tokenizer=None,
):
    """Append a batch of pages to a positional index as new segments:
    positions are written first (tokenize ONCE, same pass-1 emitter),
    the new segments' postings derive from the freshly written rows,
    and ``_commit_append`` publishes postings + termstats + meta with
    its usual crash-safety. Returns the merged IndexMeta.

    A crash between the positions write and the postings commit leaves
    trailing positional segments with no postings twin: match queries
    are unaffected (they never see the new docs), and the re-run
    appends under FRESH segment ids past the orphans, whose doc ids
    were never committed to meta — phrase results may transiently
    include the orphaned batch until the re-run's compaction; documented
    over a two-phase manifest for the same reason the termstats cache
    is: positions re-derive from a rebuild, they are never silently
    wrong."""
    from sgpt_spark.functions.analyzer import resolve_py_analyzer
    from sgpt_spark.operators.indexer import (
        assign_doc_ids,
        read_index,
        release_doc_ids,
    )
    from sgpt_spark.streaming.incremental import (
        _commit_append,
        _max_doc_id,
        _next_segment_id,
    )

    postings_old, meta_old = read_index(spark, index_path)
    if not getattr(meta_old, "positions", False):
        raise ValueError(
            f"{index_path!r} is not positional — use append_to_index"
        )
    id_offset = meta_old.next_doc_id or (_max_doc_id(postings_old) + 1)
    seg_offset = _next_segment_id(spark, index_path)
    py_tok = py_tokenizer or resolve_py_analyzer(meta_old.analyzer)

    assigned = assign_doc_ids(new_pages.select("url", "text"))
    docs = assigned.withColumn("doc_id", F.col("doc_id") + id_offset)
    n_batch = docs.count()
    if n_batch == 0:
        release_doc_ids(assigned)
        return meta_old
    seg_size = meta_old.segment_size or 1
    n_seg = max(1, -(-n_batch // seg_size))
    src = (
        docs.repartitionByRange(n_seg, "doc_id")
        .select("doc_id", "text")
        .withColumn("_seg", F.spark_partition_id() + seg_offset)
    )
    codec = meta_old.codec

    def emit(batches):
        yield from _encode_positions_arrow(batches, py_tok, "text", codec)

    src.mapInArrow(emit, schema=POSITIONS).write.mode("append").parquet(
        f"{index_path}/positions"
    )
    new_positions = spark_read_positions(spark, index_path).filter(
        F.col("segment") >= seg_offset
    )
    # _commit_append re-applies seg_offset, so hand it 0-based segments
    derived = _derive_postings(new_positions, codec).withColumn(
        "segment", F.col("segment") - seg_offset
    )
    sent = (
        new_positions.filter(F.col("term").isNull())
        .agg(
            F.sum("df").alias("n"),
            F.sum("n_pos").alias("total"),
            F.max("last_doc").alias("max_id"),
        )
        .collect()[0]
    )
    from dataclasses import replace

    n_docs_new = int(sent["n"] or 0)
    if n_docs_new == 0:
        release_doc_ids(assigned)
        return meta_old
    new_meta = replace(
        meta_old,
        n_docs=n_docs_new,
        total_len=int(sent["total"] or 0),
        next_doc_id=(int(sent["max_id"]) + 1) if sent["max_id"] is not None else id_offset,
    )
    merged = _commit_append(
        spark, index_path, derived, new_meta, meta_old, seg_offset,
        fallback_next_id=id_offset,
    )
    release_doc_ids(assigned)
    return merged
