"""Inverted-index construction — the pipeline Elasticsearch hides from
the reference (BM25Search(initialize=True) bulk-index,
crossencoder/beir/crossencoder_beir_bm25.ipynb cell 10; SURVEY.md §7.2
step 3-4).

Plan shape (all shuffles explicit and bounded):

  pages ──repartitionByRange(url)──> sorted ranges ──> dense doc_id
        (two-pass zipWithIndex-equivalent, Arrow-vectorized, deterministic)
  docs ──explode(terms)──groupBy(term, doc_id)──> tf   [high-cardinality
        key: NOT skewed even for stopwords — map-side combine applies]
  tf ──groupBy(term, segment)──applyInPandas──> compressed posting blocks

**Skew handling (SURVEY.md §7.4(3))**: grouping by term alone would give
the Zipf head terms groups of size O(N). The segment id (doc_id range
bucket) acts as a deterministic salt: group sizes are bounded by
segment_size regardless of term frequency, and the per-term merge across
segments happens at query time on pre-aggregated data (the same
partial/final split as the reference's chunked top-k + heap merge,
exact_search.py:121-132). Document-partitioned segments are also what
make the index embarrassingly mergeable and resumable.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sgpt_spark.functions.analyzer import tokenize_py_ws, tokenize_ws
from sgpt_spark.functions.bm25 import B, K1
from sgpt_spark.functions.compress import BLOCK_SIZE, encode_blocks_batch
from sgpt_spark.operators.stats import CorpusStats, doc_terms, term_freqs
from sgpt_spark.schema import POSTINGS

Tokenizer = Callable[[Column], Column]

DEFAULT_SEGMENT_SIZE = 100_000

_ARROW_POOL_CAPPED = False


def _tokenize_codes_ws(texts) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Arrow-native twin of ``[tokenize_py_ws(t) for t in texts]`` +
    ``pd.factorize(flat, sort=True)`` — one C++ pass, no Python string
    objects until the (small) vocabulary materializes.

    texts: pd.Series/ndarray of str -> (codes int64 per token in doc
    order, doc_idx int64 per token, lens int64 per doc, vocab object
    array sorted ascending). Empty tokens (from repeated/leading/
    trailing spaces) are dropped, exactly like tokenize_py_ws.
    ~3x faster than the Python loop and allocation-light: tokens stay
    Arrow dictionary codes end-to-end (measured in /tmp lineage,
    EXACT-match verified against the Python path).
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    global _ARROW_POOL_CAPPED
    if not _ARROW_POOL_CAPPED:
        # One executor slot = one python worker: Arrow's default compute
        # pool (one thread per host core, PER worker process) oversubscribes
        # the machine cores^2-fold under Spark's process-per-slot model —
        # measured 1.6x slower at 8 concurrent workers. Task-level
        # parallelism comes from Spark, so each worker computes single-
        # threaded. (IO pool left alone — Spark's Arrow IPC uses it.)
        # NOTE: set_cpu_count is PROCESS-GLOBAL and never restored — this
        # is intentional for Spark python workers (the whole process exists
        # to run single-slot tasks), but don't call this module driver-side
        # expecting Arrow parallelism afterwards.
        pa.set_cpu_count(1)
        _ARROW_POOL_CAPPED = True

    # large_string: 64-bit offsets, so a segment whose concatenated text
    # exceeds 2 GB still yields a single (non-chunked) Array — plain
    # string would raise/chunk right at the 100 TB-regime partition sizes.
    if isinstance(texts, pa.Array):
        arr = texts.cast(pa.large_string())
    else:
        arr = pa.array(texts, type=pa.large_string())
    split = pc.split_pattern(pc.coalesce(arr, pa.scalar("", type=pa.large_string())), " ")
    raw_lens = pc.list_value_length(split).to_numpy(zero_copy_only=False).astype(np.int64)
    flat = pc.list_flatten(split)
    if isinstance(flat, pa.ChunkedArray):  # defensive: unify before encode
        flat = flat.combine_chunks()
    denc = flat.dictionary_encode()
    codes = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    vocab = np.asarray(denc.dictionary.to_pandas(), dtype=object)
    doc_idx = np.repeat(np.arange(len(raw_lens), dtype=np.int64), raw_lens)
    empty_code = pc.index(denc.dictionary, pa.scalar("", type=denc.dictionary.type)).as_py()
    if empty_code is not None and empty_code >= 0:
        keep = codes != empty_code
        codes, doc_idx = codes[keep], doc_idx[keep]
    lens = np.bincount(doc_idx, minlength=len(raw_lens)).astype(np.int64)
    order = np.argsort(vocab)  # same str< order as factorize(sort=True)
    rank = np.empty(len(order), dtype=np.int64)
    rank[order] = np.arange(len(order), dtype=np.int64)
    codes = rank[codes]
    vocab = vocab[order]
    if empty_code is not None and empty_code >= 0:
        # "" sorts first; its code was filtered out above — drop the dead
        # vocab slot so codes stay dense from 0
        codes -= 1
        vocab = vocab[1:]
    return codes, doc_idx, lens, vocab


def _tokenize_codes_standard(texts) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Arrow-native twin of ``[analyze_py(t) for t in texts]`` — the
    Lucene-standard analyzer as four C++ kernel passes, no Python string
    objects. Same contract as ``_tokenize_codes_ws``.

    Decomposition of the word regex [\\p{L}\\p{N}]+(?:'[\\p{L}\\p{N}]+)*
    into Arrow ops (equality with analyze_py is property-tested):
      1. utf8_lower
      2. collapse runs of 2+ apostrophes to space (the regex never
         crosses a double apostrophe)
      3. replace every char outside [\\p{L}\\p{N}'] with space
      4. split on whitespace, trim leading/trailing apostrophes per
         token, drop empties
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    global _ARROW_POOL_CAPPED
    if not _ARROW_POOL_CAPPED:
        pa.set_cpu_count(1)  # see _tokenize_codes_ws (process-global)
        _ARROW_POOL_CAPPED = True

    if isinstance(texts, pa.Array):
        arr = texts.cast(pa.large_string())
    else:
        arr = pa.array(texts, type=pa.large_string())
    lowered = pc.utf8_lower(pc.coalesce(arr, pa.scalar("", type=pa.large_string())))
    # canonicalize Greek final sigma (see functions/analyzer.py header):
    # covers both Σ->σ (utf8_lower already non-contextual) and inputs
    # that ALREADY contain lowercase 'ς'
    lowered = pc.replace_substring(lowered, pattern="ς", replacement="σ")
    # one RE2 pass: junk runs OR double-apostrophe runs -> space
    cleaned = pc.replace_substring_regex(
        lowered, pattern=r"(?:[^\p{L}\p{N}']+|'')+", replacement=" "
    )
    split = pc.utf8_split_whitespace(cleaned)
    raw_lens = pc.list_value_length(split).to_numpy(zero_copy_only=False).astype(np.int64)
    flat = pc.list_flatten(split)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    flat = pc.utf8_trim(flat, characters="'")
    denc = flat.dictionary_encode()
    codes = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    vocab = np.asarray(denc.dictionary.to_pandas(), dtype=object)
    doc_idx = np.repeat(np.arange(len(raw_lens), dtype=np.int64), raw_lens)
    empty_code = pc.index(denc.dictionary, pa.scalar("", type=denc.dictionary.type)).as_py()
    if empty_code is not None and empty_code >= 0:
        keep = codes != empty_code
        codes, doc_idx = codes[keep], doc_idx[keep]
    lens = np.bincount(doc_idx, minlength=len(raw_lens)).astype(np.int64)
    order = np.argsort(vocab)
    rank = np.empty(len(order), dtype=np.int64)
    rank[order] = np.arange(len(order), dtype=np.int64)
    codes = rank[codes]
    vocab = vocab[order]
    if empty_code is not None and empty_code >= 0:
        codes -= 1
        vocab = vocab[1:]
    return codes, doc_idx, lens, vocab


def _tokenize_codes_py(texts, py_tokenizer) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Generic-tokenizer fallback with the same contract as
    ``_tokenize_codes_ws`` (used for custom analyzers, e.g. standard)."""
    from itertools import chain

    toks_per_doc = [py_tokenizer(t) for t in texts]
    n = len(toks_per_doc)
    lens = np.fromiter((len(t) for t in toks_per_doc), dtype=np.int64, count=n)
    total = int(lens.sum())
    flat = np.empty(total, dtype=object)
    if total:
        flat[:] = list(chain.from_iterable(toks_per_doc))
    codes, uniques = pd.factorize(flat, sort=True)
    doc_idx = np.repeat(np.arange(n, dtype=np.int64), lens)
    return codes.astype(np.int64), doc_idx, lens, np.asarray(uniques, dtype=object)


def _offset_ids_with_guard(df: DataFrame, sizes: dict[int, int]) -> DataFrame:
    """Shared tail of both doc-id assigners: decompose
    ``monotonically_increasing_id()`` == (partition << 33) | local_row
    into (pid, local), broadcast-join the (pid, offset, n) table computed
    in the count pass, and emit ``doc_id = offset + local``.

    RUNTIME GUARD (contract-violation detector): the count pass and the
    consuming pass must plan identical partitions. If they don't — e.g. a
    derived/non-file input got rescheduled differently, or a conf change
    re-split the files between jobs — ids would silently collide or rows
    would silently drop under an inner join. Instead: a LEFT join plus
    ``assert_true`` on (a) offset present (unknown partition id appeared)
    and (b) local row number < expected partition count (partition grew),
    so a violated contract fails the job loudly with a clear message.
    """
    offsets, acc = [], 0
    for pid in sorted(sizes):
        offsets.append((pid, acc, sizes[pid]))
        acc += sizes[pid]
    offsets_df = df.sparkSession.createDataFrame(offsets, "_pid int, _offset long, _n long")
    mono = F.monotonically_increasing_id()
    guard_msg = (
        "assign_doc_ids: partition layout changed between the count pass and "
        "the id pass (non-deterministic input?) — ids would be corrupt"
    )
    return (
        df.withColumn("_pid", F.shiftright(mono, 33).cast("int"))
        .withColumn("_local", mono.bitwiseAND(F.lit((1 << 33) - 1)))
        .join(F.broadcast(offsets_df), "_pid", "left")
        .withColumn(
            "_guard",
            F.assert_true(
                F.col("_offset").isNotNull() & (F.col("_local") < F.col("_n")),
                F.lit(guard_msg),
            ),
        )
        .withColumn("doc_id", (F.col("_offset") + F.col("_local")).cast("long"))
        .filter(F.col("_guard").isNull())  # assert_true returns NULL; keeps the guard in the plan
        .drop("_pid", "_local", "_offset", "_n", "_guard")
    )


def assign_doc_ids(
    pages: DataFrame, id_source: str = "url", num_partitions: int | None = None
) -> DataFrame:
    """Dense, deterministic int64 doc_ids by global ``id_source`` order.

    Scalable zipWithIndex-equivalent, fully JVM-side (no Arrow round-trip
    of the corpus through Python): range-partition + sort by url, count
    rows per partition (pass 1), then
    ``doc_id = partition_offset + (row_number within partition - 1)``
    via the decomposed monotonic id plus a broadcast join against the
    tiny (pid, offset) table (pass 2).

    The ranged frame is persisted because ``repartitionByRange`` samples
    its bounds with a seed derived from the compiled plan — re-executing
    the lineage in a second job could draw different bounds, and the two
    passes MUST see identical partitions. The persisted handle is
    attached to the result as ``df._sgpt_persisted`` so consumers can
    ``release_doc_ids(df)`` after their terminal action (at 100 TB a
    leaked persist pins executor storage); the runtime guard still fails
    loudly if a violated layout ever slips through.

    Determinism: urls are unique, global url order is total, so doc_id
    is a pure function of the input regardless of scheduling
    (SURVEY.md §7.4(4)).
    """
    if num_partitions is None:
        num_partitions = max(pages.rdd.getNumPartitions(), 1)
    ranged = (
        pages.repartitionByRange(num_partitions, id_source)
        .sortWithinPartitions(id_source)
        .persist()
    )
    sizes = {
        r["_pid"]: r["n"]
        for r in ranged.groupBy(F.spark_partition_id().alias("_pid"))
        .agg(F.count("*").alias("n"))
        .collect()
    }
    out = _offset_ids_with_guard(ranged, sizes)
    out._sgpt_persisted = ranged  # release with release_doc_ids(out)
    return out


def release_doc_ids(df: DataFrame) -> None:
    """Unpersist the cached frame behind an ``assign_doc_ids`` result.

    Call after the terminal action that consumed the ids (index write,
    count, ...) — not before, or the guarded two-pass contract breaks.
    """
    cached = getattr(df, "_sgpt_persisted", None)
    if cached is not None:
        cached.unpersist()


def assign_doc_ids_fast(pages: DataFrame) -> DataFrame:
    """Dense int64 doc_ids in source order — NO shuffle of the corpus.

    ``assign_doc_ids`` buys input-permutation invariance with a full
    range-shuffle + sort of the corpus by url; at 100 TB that shuffle
    costs more than the index build itself and exists only to pick a
    canonical id order. This variant instead takes the order the source
    already has: ids = scan-partition offset + local row number, i.e.
    the Lucene convention of ids-in-segment-order.

    Determinism contract: the input must be a re-readable file-based
    source (parquet / an Iceberg snapshot) under a fixed session conf —
    the file manifest and split planning are then deterministic, so two
    scans (the per-partition count pass and the consuming pass) see
    identical partitions and the ids are a pure function of the snapshot
    (north_rule resumability: a checkpointed build re-derives the same
    ids). For shuffled/derived inputs use ``assign_doc_ids``. Contract
    violations fail loudly via the runtime guard in
    ``_offset_ids_with_guard`` instead of corrupting ids.
    """
    sizes = {
        r["_pid"]: r["n"]
        for r in pages.groupBy(F.spark_partition_id().alias("_pid"))
        .agg(F.count("*").alias("n"))
        .collect()
    }
    return _offset_ids_with_guard(pages, sizes)


@dataclass(frozen=True)
class IndexMeta:
    n_docs: int
    avgdl: float
    segment_size: int
    k1: float
    b: float
    block_size: int
    analyzer: str
    # exact token total — lets incremental appends recompute avgdl
    # exactly instead of approximating (streaming/incremental.py)
    total_len: int = 0
    # first unassigned doc id (covers empty-text docs that never reach
    # the postings) — the append offset for incremental builds
    next_doc_id: int = 0
    # per-column block byte coding: "varint" (default) | "pfor"
    # (patched frame-of-reference bit packing, compress.pfor_encode) —
    # recorded here so the query/merge sides decode with the right codec
    codec: str = "varint"
    # True when the index carries the positional sidecar
    # ({path}/positions, operators/positions.py) — the postings were
    # DERIVED from it and phrase_search_index can run; compaction and
    # appends must keep both relations in step (compact_index /
    # append_to_positional_index do)
    positions: bool = False


def _fused_term_freqs(docs: DataFrame, py_tokenizer, text_col: str) -> DataFrame:
    """docs -> (term, doc_id, tf, doc_len) in one Arrow-batched pass.

    Tokenize and count per document inside the batch (np.unique per doc,
    vectorized counting) — term frequencies are doc-local, so this needs
    no shuffle.
    """
    from sgpt_spark.functions.analyzer import analyze_py as _std
    from sgpt_spark.functions.analyzer import tokenize_py_ws as _ws
    from sgpt_spark.operators.corpus import non_empty_text

    def tok_count(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            ids = pdf["doc_id"].to_numpy(dtype=np.int64)
            # One flat tokenize+code pass over the whole batch: tokens
            # become int codes, then (doc, term) pair counting is pure
            # int math. Both built-in analyzers get Arrow-native paths.
            if py_tokenizer is _ws:
                codes, doc_idx, lens, uniques = _tokenize_codes_ws(pdf[text_col])
            elif py_tokenizer is _std:
                codes, doc_idx, lens, uniques = _tokenize_codes_standard(pdf[text_col])
            else:
                codes, doc_idx, lens, uniques = _tokenize_codes_py(
                    pdf[text_col], py_tokenizer
                )
            if len(codes) == 0:
                continue
            n_uniq = len(uniques)
            key = doc_idx * n_uniq + codes
            uk, counts = np.unique(key, return_counts=True)
            pair_doc_idx = uk // n_uniq
            yield pd.DataFrame(
                {
                    "term": uniques[uk % n_uniq],
                    "doc_id": ids[pair_doc_idx],
                    "tf": counts.astype(np.int64),
                    "doc_len": lens[pair_doc_idx],
                }
            )

    return non_empty_text(docs, text_col).select("doc_id", text_col).mapInPandas(
        tok_count, schema="term string, doc_id long, tf long, doc_len long"
    )


def _encode_segment(
    batches: Iterator[pd.DataFrame],
    py_tokenizer,
    text_col: str,
    emit_stats: bool,
    codec: str = "varint",
) -> Iterator[pd.DataFrame]:
    """One partition = one index segment: tokenize, (term, doc) pair
    count, delta+varint block encode — entirely inside this Arrow pass,
    no shuffle. With ``emit_stats`` a sentinel row (term NULL) carries
    the segment's exact corpus stats: df = doc count (trim-space
    non-empty text, matching operators.corpus.non_empty_text), max_tf =
    total token count, min_dl = max doc_id — so the caller can derive
    IndexMeta from the written index without re-scanning the corpus.
    """
    from sgpt_spark.functions.analyzer import analyze_py as _std
    from sgpt_spark.functions.analyzer import tokenize_py_ws as _ws

    chunks = list(batches)
    if not chunks:
        return
    pdf = pd.concat(chunks, ignore_index=True) if len(chunks) > 1 else chunks[0]
    if len(pdf) == 0:
        return
    seg = int(pdf["_seg"].iloc[0])
    ids = pdf["doc_id"].to_numpy(dtype=np.int64)
    order = np.argsort(ids, kind="stable")  # doc order within segment
    ids = ids[order]
    texts = pdf[text_col].iloc[order]
    if py_tokenizer is _ws:
        codes, doc_idx, lens, terms_arr = _tokenize_codes_ws(texts)
    elif py_tokenizer is _std:
        codes, doc_idx, lens, terms_arr = _tokenize_codes_standard(texts)
    else:
        codes, doc_idx, lens, terms_arr = _tokenize_codes_py(texts, py_tokenizer)

    def stats_row() -> pd.DataFrame:
        nonempty = int(
            texts.fillna("").str.strip(" ").ne("").sum()
        )  # == Spark length(trim(text)) > 0
        return pd.DataFrame(
            {
                "term": [None],
                "segment": [seg],
                "df": [nonempty],
                "max_tf": [int(lens.sum())],
                "min_dl": [int(ids[-1])],
                "blocks": [[]],
            }
        )

    if len(codes) == 0:
        if emit_stats:
            yield stats_row()
        return
    # (term_code, doc) pair counts; key sorted by (code, doc)
    key = codes * len(ids) + doc_idx
    uk, counts = np.unique(key, return_counts=True)
    p_code = uk // len(ids)
    p_docidx = uk % len(ids)
    p_doc = ids[p_docidx]
    p_tf = counts.astype(np.uint64)
    p_dl = lens[p_docidx].astype(np.uint64)
    bounds = np.flatnonzero(p_code[1:] != p_code[:-1]) + 1
    starts = np.concatenate(([0], bounds))
    ends = np.concatenate((bounds, [len(uk)]))
    blocks = encode_blocks_batch(p_doc, p_tf, p_dl, starts, ends, codec=codec)
    out = pd.DataFrame(
        {
            "term": terms_arr[p_code[starts]],
            "segment": seg,
            "df": (ends - starts).astype(np.int64),
            "max_tf": np.maximum.reduceat(p_tf.astype(np.int64), starts),
            "min_dl": np.minimum.reduceat(p_dl.astype(np.int64), starts),
            "blocks": blocks,
        }
    )
    yield pd.concat([out, stats_row()], ignore_index=True) if emit_stats else out


def _encode_segment_arrow(
    batches,
    py_tokenizer,
    text_col: str,
    emit_stats: bool,
    codec: str = "varint",
):
    """Arrow-native twin of ``_encode_segment`` for ``mapInArrow``: text
    never round-trips through pandas, the posting relation is emitted as
    Arrow arrays built from whole-array numpy offsets (zero per-block
    Python objects — see compress.encode_blocks_arrow). Used for the
    built-in analyzers; custom tokenizers take the pandas path.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    from sgpt_spark.functions.analyzer import analyze_py as _std
    from sgpt_spark.functions.analyzer import tokenize_py_ws as _ws
    from sgpt_spark.functions.compress import encode_blocks_arrow

    chunks = [b for b in batches if b.num_rows]
    if not chunks:
        return
    ids_chunks = [b.column("doc_id") for b in chunks]
    txt_chunks = [b.column(text_col) for b in chunks]
    seg = int(chunks[0].column("_seg")[0].as_py())
    ids = pa.chunked_array(ids_chunks).combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
    texts = pa.chunked_array(txt_chunks).combine_chunks()
    order = np.argsort(ids, kind="stable")
    ids = ids[order]
    texts = texts.take(pa.array(order))
    if py_tokenizer is _ws:
        codes, doc_idx, lens, terms_arr = _tokenize_codes_ws(texts)
    elif py_tokenizer is _std:
        codes, doc_idx, lens, terms_arr = _tokenize_codes_standard(texts)
    else:  # pragma: no cover — callers route custom tokenizers to pandas
        codes, doc_idx, lens, terms_arr = _tokenize_codes_py(
            texts.to_pandas(), py_tokenizer
        )

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

    def stats_batch() -> pa.RecordBatch:
        trimmed = pc.utf8_trim(
            pc.coalesce(texts.cast(pa.large_string()), pa.scalar("", pa.large_string())),
            characters=" ",
        )
        nonempty = int(pc.sum(pc.not_equal(trimmed, "").cast(pa.int64())).as_py() or 0)
        return pa.RecordBatch.from_arrays(
            [
                pa.array([None], pa.string()),
                pa.array([seg], pa.int32()),
                pa.array([nonempty], pa.int64()),
                pa.array([int(lens.sum())], pa.int64()),
                pa.array([int(ids[-1]) if len(ids) else 0], pa.int64()),
                pa.array([[]], blocks_type),
            ],
            names=names,
        )

    if len(codes) == 0:
        if emit_stats and len(ids):
            yield stats_batch()
        return
    key = codes * len(ids) + doc_idx
    uk, counts = np.unique(key, return_counts=True)
    p_code = uk // len(ids)
    p_docidx = uk % len(ids)
    p_doc = ids[p_docidx]
    p_tf = counts.astype(np.uint64)
    p_dl = lens[p_docidx].astype(np.uint64)
    bounds = np.flatnonzero(p_code[1:] != p_code[:-1]) + 1
    starts = np.concatenate(([0], bounds))
    ends = np.concatenate((bounds, [len(uk)]))
    blocks = encode_blocks_arrow(p_doc, p_tf, p_dl, starts, ends, codec=codec)
    batch = pa.RecordBatch.from_arrays(
        [
            pa.array(terms_arr[p_code[starts]], type=pa.string()),
            pa.array(np.full(len(starts), seg, dtype=np.int32)),
            pa.array((ends - starts).astype(np.int64)),
            pa.array(np.maximum.reduceat(p_tf.astype(np.int64), starts)),
            pa.array(np.minimum.reduceat(p_dl.astype(np.int64), starts)),
            blocks,
        ],
        names=names,
    )
    yield batch
    if emit_stats:
        yield stats_batch()


def build_index(
    docs: DataFrame,
    path: str,
    segment_size: int = DEFAULT_SEGMENT_SIZE,
    py_tokenizer=None,
    k1: float = K1,
    b: float = B,
    codec: str = "varint",
) -> IndexMeta:
    """Single-pass build-and-write: the whole corpus is read ONCE.

    ``build_postings`` + ``write_index`` scan the corpus three times
    (stats agg, max-id agg, posting build); here each segment emits its
    exact stats as a sentinel row (term NULL) alongside its postings, so
    IndexMeta is a tiny column-pruned agg over the *written* parquet —
    at 100 TB that's the difference between one pass over the text and
    three. Sentinel rows are part of the on-disk format; ``read_index``
    filters them out and query-side term filters never match NULL.

    NOTE on ``segment_size``: in this single-pass builder the segment IS
    the input partition — ``segment_size`` is advisory metadata (recorded
    in meta.json for appends/compat), it does not re-split the input.
    Control segment size upstream via ``docs.repartition(n)`` /
    ``spark.sql.files.maxPartitionBytes``.
    """
    import json
    import os

    from pyspark.sql import types as T

    if py_tokenizer is None:
        py_tokenizer = tokenize_py_ws
    text_col = "text"
    src = docs.select("doc_id", text_col).withColumn("_seg", F.spark_partition_id())

    # POSTINGS with term nullable: sentinel stats rows carry term NULL
    schema = T.StructType(
        [
            T.StructField(f.name, f.dataType, True if f.name == "term" else f.nullable)
            for f in POSTINGS.fields
        ]
    )
    from sgpt_spark.functions.analyzer import analyze_py as _std_tok

    from sgpt_spark.functions.compress import CODECS

    if codec not in CODECS:
        raise ValueError(f"unknown codec {codec!r}: {'|'.join(CODECS)}")
    if py_tokenizer in (tokenize_py_ws, _std_tok):
        # Arrow-native end to end: text stays Arrow, the posting relation
        # is emitted as RecordBatches with zero per-block Python objects
        # (both codecs: varint slices shared buffers zero-copy, pfor
        # buffers come from the batched bit-packing encoder)
        def build_segment_arrow(batches):
            yield from _encode_segment_arrow(
                batches, py_tokenizer, text_col, emit_stats=True, codec=codec
            )

        encoded = src.mapInArrow(build_segment_arrow, schema=schema)
    else:

        def build_segment(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            yield from _encode_segment(
                batches, py_tokenizer, text_col, emit_stats=True, codec=codec
            )

        encoded = src.mapInPandas(build_segment, schema=schema)
    encoded.write.mode("overwrite").parquet(f"{path}/postings")
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
    )
    # global term stats (what ES keeps as index-level stats): one
    # column-pruned agg over the WRITTEN postings, term-sorted so query
    # scans row-group-prune — query time then never re-aggregates df
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


def build_postings(
    docs: DataFrame,
    segment_size: int = DEFAULT_SEGMENT_SIZE,
    tokenizer: Tokenizer = tokenize_ws,
    py_tokenizer=None,
    text_col: str = "text",
    k1: float = K1,
    b: float = B,
    codec: str = "varint",
) -> tuple[DataFrame, IndexMeta]:
    """docs(doc_id long, text) -> (POSTINGS DataFrame, IndexMeta).

    Per (term, segment) group: sort by doc_id, delta+varint encode in
    blocks, record segment df and block-max tf-norm (df-independent WAND
    bound; idf is applied at query time from the global df).

    ``py_tokenizer`` (a plain str -> list[str] function) selects the
    fused single-pass build; it defaults to the Python twin of the
    default JVM tokenizer. Passing a custom JVM ``tokenizer`` without a
    Python twin falls back to the explode + groupBy plan.
    """
    if py_tokenizer is None and tokenizer is tokenize_ws:
        py_tokenizer = tokenize_py_ws
    # keep the JVM stats tokenizer consistent with the Python build
    # tokenizer: stats counted with a DIFFERENT analyzer than the
    # postings would corrupt total_len/avgdl (and therefore every BM25
    # score) for standard-analyzer builds/appends
    if py_tokenizer is not None and tokenizer is tokenize_ws:
        from sgpt_spark.functions.analyzer import analyze_py as _std
        from sgpt_spark.functions.analyzer import tokenize_standard

        if py_tokenizer is _std:
            tokenizer = tokenize_standard
        elif py_tokenizer is not tokenize_py_ws:
            raise ValueError(
                "build_postings: custom py_tokenizer requires passing the "
                "matching JVM `tokenizer` for the corpus-stats scan"
            )

    from sgpt_spark.operators.corpus import non_empty_text

    # Corpus stats from a cheap JVM-only scan (count + sum of token
    # counts stays inside whole-stage codegen) — both paths, so the
    # fallback no longer persists the exploded doc_terms relation
    # (a leaked persist would pin executor storage at 100 TB).
    row = (
        non_empty_text(docs, text_col)
        .select(F.size(tokenizer(F.col(text_col))).alias("dl"))
        .agg(F.count("*").alias("n"), F.sum("dl").alias("total"))
        .collect()[0]
    )
    n_docs = int(row["n"])
    total_len = int(row["total"] or 0)
    stats = CorpusStats(n_docs=n_docs, avgdl=(total_len / n_docs) if n_docs else 0.0)
    analyzer_name = getattr(
        py_tokenizer if py_tokenizer is not None else tokenizer, "__name__", "custom"
    )
    if py_tokenizer is None:
        dt = doc_terms(docs, id_col="doc_id", text_col=text_col, tokenizer=tokenizer)

    from sgpt_spark.functions.compress import CODECS

    if codec not in CODECS:
        raise ValueError(f"unknown codec {codec!r}: {'|'.join(CODECS)}")
    max_id = docs.agg(F.max("doc_id")).collect()[0][0]
    meta = IndexMeta(
        n_docs=stats.n_docs,
        avgdl=stats.avgdl,
        segment_size=segment_size,
        k1=k1,
        b=b,
        block_size=BLOCK_SIZE,
        analyzer=analyzer_name,
        total_len=total_len,
        next_doc_id=(int(max_id) + 1) if max_id is not None else 0,
        codec=codec,
    )
    avgdl = stats.avgdl

    if py_tokenizer is not None:
        # PARTITION-LOCAL SEGMENTS (the Lucene-shard pattern): each input
        # partition becomes one index segment, built entirely inside a
        # single Arrow-batched Python pass — tokenize, count, group by
        # term, delta+varint encode — with NO shuffle of the posting
        # relation at all. Every doc lives in exactly one partition, so
        # the query-side per-segment top-k + global merge stays exact.
        # Skew: the Zipf head term contributes one posting row per
        # segment, never a giant group; segment size is bounded by the
        # input partition size (maxPartitionBytes / repartition upstream).
        src = (
            non_empty_text(docs, text_col)
            .select("doc_id", text_col)
            .withColumn("_seg", F.spark_partition_id())
        )
        from sgpt_spark.functions.analyzer import analyze_py as _std_tok

        if py_tokenizer in (tokenize_py_ws, _std_tok):

            def build_segment_arrow(batches):
                yield from _encode_segment_arrow(
                    batches, py_tokenizer, text_col, emit_stats=False, codec=codec
                )

            postings = src.mapInArrow(build_segment_arrow, schema=POSTINGS)
        else:

            def build_segment(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
                yield from _encode_segment(
                    batches, py_tokenizer, text_col, emit_stats=False, codec=codec
                )

            postings = src.mapInPandas(build_segment, schema=POSTINGS)
        return postings, meta

    # Fallback (custom JVM tokenizer without a Python twin): explode +
    # groupBy plan with doc_id-range segments and partition-wise encode.
    tf = term_freqs(dt).withColumn("segment", (F.col("doc_id") / segment_size).cast("int"))
    spark = docs.sparkSession
    n_part = max(int(spark.conf.get("spark.sql.shuffle.partitions", "32")), 1)

    def encode_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        chunks = list(batches)
        if not chunks:
            return
        pdf = pd.concat(chunks, ignore_index=True) if len(chunks) > 1 else chunks[0]
        if len(pdf) == 0:
            return
        terms = pdf["term"].to_numpy()
        segs = pdf["segment"].to_numpy()
        docs_a = pdf["doc_id"].to_numpy(dtype=np.int64)
        tfs_a = pdf["tf"].to_numpy(dtype=np.uint64)
        dls_a = pdf["doc_len"].to_numpy(dtype=np.uint64)
        bounds = np.flatnonzero((terms[1:] != terms[:-1]) | (segs[1:] != segs[:-1])) + 1
        starts = np.concatenate(([0], bounds))
        ends = np.concatenate((bounds, [len(pdf)]))
        blocks = encode_blocks_batch(docs_a, tfs_a, dls_a, starts, ends, codec=codec)
        yield pd.DataFrame(
            {
                "term": terms[starts],
                "segment": segs[starts].astype(np.int32),
                "df": (ends - starts).astype(np.int64),
                "max_tf": np.maximum.reduceat(tfs_a.astype(np.int64), starts),
                "min_dl": np.minimum.reduceat(dls_a.astype(np.int64), starts),
                "blocks": blocks,
            }
        )

    postings = (
        tf.repartition(n_part, "term", "segment")
        .sortWithinPartitions("term", "segment", "doc_id")
        .mapInPandas(encode_partition, schema=POSTINGS)
    )
    return postings, meta


def build_postings_with_docvalues(
    docs: DataFrame,
    fields: list[str],
    segment_size: int = DEFAULT_SEGMENT_SIZE,
    tokenizer: Tokenizer = tokenize_ws,
    py_tokenizer=None,
    text_col: str = "text",
    k1: float = K1,
    b: float = B,
    codec: str = "varint",
) -> tuple[DataFrame, DataFrame, IndexMeta]:
    """``build_postings`` plus a DOC-VALUES sidecar (the Lucene doc
    values / ES ``keyword``+numeric field role): one row per indexed doc
    carrying the requested structured columns, keyed by the SAME
    (segment, doc_id) the doc's postings landed in — what structured
    ``term``/``range``/``exists`` filter clauses evaluate against
    (operators/boolquery filters=).

    Segment agreement is guaranteed, not assumed: the filtered corpus is
    staged ONCE with its partition id pinned as a column and
    ``localCheckpoint(eager=True)``-materialized, then BOTH the postings
    build and the docvalues projection consume those checkpointed
    partitions — ``spark_partition_id()`` re-evaluated downstream of a
    checkpoint without any shuffle is the partition index of the pinned
    data, so the two relations cannot disagree (the same
    derive-don't-recompute argument as the positional builder's derived
    postings). Cost: the staged corpus is materialized once
    (MEMORY_AND_DISK); at cluster scale, write the staging relation to a
    table instead and build both relations from that snapshot.

    Returns (postings, docvalues(segment int, doc_id long, *fields),
    meta). Custom JVM tokenizers without a Python twin fall back to
    ``build_postings``'s doc_id-range segments, and the docvalues
    segment is derived arithmetically to match.
    """
    from sgpt_spark.operators.corpus import non_empty_text

    missing = [f for f in fields if f not in docs.columns]
    if missing:
        raise ValueError(
            f"docvalue fields {missing} not in corpus columns {docs.columns}"
        )
    if not fields:
        raise ValueError("build_postings_with_docvalues: pass >= 1 field")

    partition_local = py_tokenizer is not None or tokenizer is tokenize_ws
    staged = non_empty_text(docs, text_col).select("doc_id", text_col, *fields)
    if partition_local:
        staged = staged.withColumn(
            "_dv_seg", F.spark_partition_id()
        ).localCheckpoint(eager=True)
        dv_seg = F.col("_dv_seg")
    else:
        # fallback build uses doc_id-range segments; mirror arithmetically
        dv_seg = (F.col("doc_id") / segment_size).cast("int")
    postings, meta = build_postings(
        staged.select("doc_id", text_col),
        segment_size=segment_size,
        tokenizer=tokenizer,
        py_tokenizer=py_tokenizer,
        text_col=text_col,
        k1=k1,
        b=b,
        codec=codec,
    )
    docvalues = staged.select(
        dv_seg.cast("int").alias("segment"), "doc_id", *fields
    )
    return postings, docvalues, meta


def write_docvalues(docvalues: DataFrame, path: str) -> None:
    """Persist the doc-values sidecar next to the postings
    (``{path}/docvalues``)."""
    docvalues.write.mode("overwrite").parquet(f"{path}/docvalues")


def read_docvalues(spark, path: str) -> DataFrame:
    """Read the doc-values sidecar written by ``write_docvalues``."""
    return spark.read.parquet(f"{path}/docvalues")


def write_index(postings: DataFrame, meta: IndexMeta, path: str) -> None:
    """Persist the index: postings parquet + meta JSON.

    ``build_postings`` emits one segment per partition with terms already
    sorted (factorize(sort=True)), so no repartition/sort is needed
    before the write and parquet row-group min/max stats on ``term``
    prune query scans for free.

    On a real cluster this would target an Iceberg table
    (``writeTo(...).createOrReplace()``) for snapshot-based resumability;
    Iceberg jars are absent in this environment so the layout is plain
    parquet + a sidecar meta file (see plans/pipeline.py for the
    checkpoint protocol).
    """
    import json
    import os

    postings.write.mode("overwrite").parquet(f"{path}/postings")
    os.makedirs(path, exist_ok=True)
    with open(f"{path}/meta.json", "w") as fp:
        json.dump(meta.__dict__, fp)


def _multifield_jvm_twin(py_tok, tokenizer: Tokenizer | None):
    """JVM column twin of the multifield build analyzer, used for the
    per-field >=1-token filter. Built-in analyzers resolve automatically;
    a custom ``py_tokenizer`` must come WITH its JVM twin (``tokenizer=``)
    — the old behavior raised "pass py_tokenizer=" at callers who already
    had (round-3 ADVICE)."""
    from sgpt_spark.functions.analyzer import resolve_jvm_analyzer

    if tokenizer is not None:
        return tokenizer
    try:
        return resolve_jvm_analyzer(getattr(py_tok, "__name__", "custom"))
    except ValueError:
        raise ValueError(
            "multifield build/append with a custom py_tokenizer also needs "
            "its JVM column twin for the per-field empty filter: pass "
            "tokenizer= (a Column -> Column tokenizer matching py_tokenizer), "
            "or use a built-in analyzer"
        ) from None


def build_multifield_index(
    docs: DataFrame,
    path: str,
    fields: tuple[str, ...] = ("title", "text"),
    segment_size: int = DEFAULT_SEGMENT_SIZE,
    py_tokenizer=None,
    tokenizer: Tokenizer | None = None,
    codec: str = "varint",
) -> dict:
    """docs(doc_id, <field columns>) -> one standard index per field
    under ``{path}/{field}_index`` — the index-backed substrate for ES
    ``multi_match`` scoring (each field an INDEPENDENT BM25 index with
    its own N/avgdl/df, exactly BEIR's ``{"title", "txt"}`` mapping,
    crossencoder_beir_bm25.ipynb:298-310 cell 10).

    CO-SEGMENTATION invariant: all field indexes are built from ONE
    range-partitioned scan of ``docs`` (partition == segment in the
    single-pass builder, and the per-field empty filter is narrow), so
    segment s covers the SAME doc-id range in every field index. The
    multifield scorer relies on this to combine per-field scores
    segment-locally without any cross-segment shuffle
    (``index_search.search_multifield_index``).

    Per-field docs are pre-filtered to >=1 token under the build
    analyzer (JVM twin in the filter, Python twin in the build — one
    word pattern, tested spellings), so each field's meta.n_docs/avgdl
    equal the exhaustive operator's per-field docCount/avgdl even for
    punctuation-only field values under the standard analyzer. A custom
    ``py_tokenizer`` therefore needs its JVM column twin passed as
    ``tokenizer=`` (the ``build_postings`` contract) for that filter;
    with the built-in analyzers the twin is resolved automatically.
    """
    import json as _json
    import os

    py_tok = py_tokenizer or tokenize_py_ws
    jvm_tok = _multifield_jvm_twin(py_tok, tokenizer)
    n = docs.count()
    n_seg = max(1, -(-n // segment_size))
    src = docs.repartitionByRange(n_seg, "doc_id")
    src.persist()
    try:
        metas = {}
        for f in fields:
            fd = src.select("doc_id", F.col(f).alias("text")).filter(
                F.size(jvm_tok(F.col("text"))) > 0
            )
            metas[f] = build_index(
                fd, f"{path}/{f}_index", segment_size=segment_size,
                py_tokenizer=py_tok, codec=codec,
            )
    finally:
        src.unpersist()
    os.makedirs(path, exist_ok=True)
    with open(f"{path}/fields.json", "w") as fp:
        _json.dump({"fields": list(fields)}, fp)
    return metas


def read_index(spark, path: str) -> tuple[DataFrame, IndexMeta]:
    import json

    with open(f"{path}/meta.json") as fp:
        meta = IndexMeta(**json.load(fp))
    # drop build_index's per-segment stats sentinels (term NULL); no-op
    # for write_index-produced layouts
    return (
        spark.read.parquet(f"{path}/postings").filter(F.col("term").isNotNull()),
        meta,
    )


_REENCODE_MAX = 1_000_000  # max decoded postings per re-blocked group


_MERGE_CHUNK_ROWS = 1 << 17  # flush complete groups past this many rows


def _merge_partition_arrow(batches, codec: str):
    """Arrow-native compaction merge for one shuffle partition: rows are
    sorted by (term, _new_seg), so merge groups are contiguous. Never
    converts the nested blocks column to Python dicts on the main path
    — that pandas conversion, not the merge itself, was 63s of the 72s
    round-4 bench compaction (profiled; the merge added ~0).

    Memory contract: incoming Arrow batches accumulate only until
    ``_MERGE_CHUNK_ROWS``; then every COMPLETE group in the buffer is
    merged and flushed and only the trailing (possibly continuing)
    group carries over — peak per task is the accumulation chunk plus
    one group's working set, NOT the whole shuffle partition (round-4
    review). A single group's working set is itself bounded per regime
    below (verbatim: its compressed block structs — unavoidable, that
    IS the output row; reencode: capped at ``_REENCODE_MAX`` decoded
    postings; stream: O(runs x block)).

    Per group, three regimes:
      verbatim  doc-disjoint runs (ALL groups produced by this engine's
                doc-range-partitioned segments): the merged block list
                is a pure gather of input block structs in doc order —
                one vectorized ``take`` for the whole partition, zero
                decode. A df==N head term merges in O(its block count)
                index entries, still never decoding postings.
      reencode  disjoint but fragmented (avg block fill < ~50%, the
                Zipf tail: many 1-5-posting runs) and small enough
                (<= _REENCODE_MAX postings): batch-decoded via
                ``decode_posting_columns`` and re-blocked via
                ``encode_blocks_batch`` — both whole-array passes over
                ALL such groups at once.
      stream    overlapping doc ranges (external ids / unusual appends):
                per-group ``merge_runs_streaming`` fallback, peak
                O(runs x block) regardless of df.

    Sentinel rows (term NULL) merge additively: df/token totals sum,
    max doc id maxes.
    """
    import pyarrow as pa

    pend: list = []
    pend_rows = 0
    # One group can span many accumulation chunks (a df~N head term).
    # Once a full buffer turns out to be a single group, switch to
    # constant-work-per-batch accumulation: remember the group key and
    # only scan each NEW batch for the first key change, instead of
    # re-combining and re-scanning the whole growing buffer (which was
    # O(chunks^2) copying — round-4 advice).
    giant: list = []
    giant_key: tuple | None = None
    for b in batches:
        if b.num_rows == 0:
            continue
        if giant_key is not None:
            p = _first_key_change(b, giant_key)
            if p is None:
                giant.append(b)
                continue
            if p > 0:
                giant.append(b.slice(0, p))
            yield from _merge_rows_arrow(
                pa.Table.from_batches(giant).combine_chunks(), codec
            )
            giant, giant_key = [], None
            b = b.slice(p)
            if b.num_rows == 0:
                continue
        pend.append(b)
        pend_rows += b.num_rows
        if pend_rows < _MERGE_CHUNK_ROWS:
            continue
        tbl = pa.Table.from_batches(pend).combine_chunks()
        cut = _last_group_start(tbl)
        if cut == 0:
            # the whole buffer is one giant group — its merge stays
            # bounded by the per-regime contracts above
            giant = tbl.to_batches()
            giant_key = _key_at(tbl, 0)
            pend, pend_rows = [], 0
            continue
        yield from _merge_rows_arrow(tbl.slice(0, cut), codec)
        pend = tbl.slice(cut).to_batches()
        pend_rows = tbl.num_rows - cut
    tail = giant or pend  # mutually exclusive by construction
    if tail:
        tbl = pa.Table.from_batches(tail).combine_chunks()
        if tbl.num_rows:
            yield from _merge_rows_arrow(tbl, codec)


def _key_at(tbl, i: int) -> tuple:
    """(term-or-None, new segment) group key of row ``i``."""
    return (tbl.column("term")[i].as_py(), tbl.column("_new_seg")[i].as_py())


def _first_key_change(batch, key: tuple) -> "int | None":
    """Index of the first row of ``batch`` whose (term, _new_seg) key
    differs from ``key``, or None if every row matches."""
    import pyarrow.compute as pc

    term, seg = key
    tcol = batch.column("term")
    if term is None:
        tmatch = pc.is_null(tcol)
    else:
        tmatch = pc.fill_null(pc.equal(tcol, term), False)
    smatch = pc.fill_null(pc.equal(batch.column("_new_seg"), seg), False)
    m = pc.and_(tmatch, smatch).to_numpy(zero_copy_only=False)
    nz = np.flatnonzero(~m)
    return int(nz[0]) if len(nz) else None


def _group_keys(tbl) -> "tuple[np.ndarray, np.ndarray]":
    """(term codes with -1 for NULL, bucket ids) of a sorted merge
    table — the shared group-boundary derivation."""
    import pyarrow.compute as pc

    term = tbl.column("term").combine_chunks()
    denc = term.dictionary_encode()
    idx = pc.fill_null(denc.indices, -1).to_numpy(zero_copy_only=False).astype(np.int64)
    seg = (
        tbl.column("_new_seg").combine_chunks()
        .to_numpy(zero_copy_only=False).astype(np.int64)
    )
    return idx, seg


def _last_group_start(tbl) -> int:
    """Row index where the table's LAST (term, _new_seg) group begins."""
    idx, seg = _group_keys(tbl)
    change = np.flatnonzero((idx[1:] != idx[:-1]) | (seg[1:] != seg[:-1])) + 1
    return int(change[-1]) if len(change) else 0


def _merge_rows_arrow(tbl, codec: str):
    """Merge one buffer of WHOLE groups (see ``_merge_partition_arrow``
    for the regime docs and memory contract)."""
    import pyarrow as pa
    import pyarrow.compute as pc  # noqa: F401 — via _group_keys

    from sgpt_spark.functions.compress import (
        decode_posting_columns,
        encode_blocks_batch,
        merge_runs_streaming,
    )

    nrows = tbl.num_rows
    term = tbl.column("term").combine_chunks()
    idx, seg = _group_keys(tbl)
    dfv = tbl.column("df").combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
    row_mtf = tbl.column("max_tf").combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
    row_mdl = tbl.column("min_dl").combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
    blocks = tbl.column("blocks").combine_chunks()
    blocks_type = blocks.type
    offs = np.asarray(blocks.offsets).astype(np.int64)
    blk = blocks.values
    b_first = np.asarray(blk.field("first_doc")).astype(np.int64)
    b_last = np.asarray(blk.field("last_doc")).astype(np.int64)
    b_cnt = np.asarray(blk.field("count")).astype(np.int64)
    row_nb = offs[1:] - offs[:-1]
    cum_cnt = np.concatenate(([0], np.cumsum(b_cnt)))
    row_cnt = cum_cnt[offs[1:]] - cum_cnt[offs[:-1]]

    change = np.flatnonzero((idx[1:] != idx[:-1]) | (seg[1:] != seg[:-1])) + 1
    gs = np.concatenate(([0], change))
    ge = np.concatenate((change, [nrows]))

    n_groups = len(gs)
    group_id = np.repeat(np.arange(n_groups, dtype=np.int64), ge - gs)
    # row first/last doc fences, guarded for sentinel rows (0 blocks) —
    # including the ALL-sentinel partition, whose block child array is
    # EMPTY and must not be indexed at all (latent crash whenever the
    # (null-term, seg) keys hashed into a partition with no term keys;
    # AQE partition coalescing made it appear run-dependent)
    if len(b_first):
        safe_lo = np.minimum(offs[:-1], len(b_first) - 1)
        row_first = np.where(row_nb > 0, b_first[safe_lo], -1)
        row_last = np.where(row_nb > 0, b_last[np.maximum(offs[1:] - 1, 0)], -1)
    else:
        row_first = np.full(nrows, -1, dtype=np.int64)
        row_last = np.full(nrows, -1, dtype=np.int64)
    # rows in (group, first_doc) order — the doc order of every merge;
    # one lexsort for the whole partition instead of a per-group argsort
    order_all = np.lexsort((row_first, group_id))
    og = group_id[order_all]
    # disjointness per group: every within-group transition must keep
    # last_doc(prev) < first_doc(next)
    trans_bad = (og[1:] == og[:-1]) & (
        row_last[order_all][:-1] >= row_first[order_all][1:]
    )
    overlapping = np.zeros(n_groups, dtype=bool)
    if trans_bad.any():
        np.logical_or.at(overlapping, og[1:][trans_bad], True)

    # per-group reductions — groups are contiguous in row space
    g_cnt = np.add.reduceat(row_cnt, gs)
    g_nb = np.add.reduceat(row_nb, gs)
    g_df_sum = np.add.reduceat(dfv, gs)
    g_mtf_max = np.maximum.reduceat(row_mtf, gs)
    g_mtf_sum = np.add.reduceat(row_mtf, gs)
    g_mdl_min = np.minimum.reduceat(row_mdl, gs)
    g_mdl_max = np.maximum.reduceat(row_mdl, gs)

    sentinel = idx[gs] == -1
    from sgpt_spark.functions.compress import BLOCK_SIZE as block_size

    small_frag = (g_nb * block_size > 2 * g_cnt + block_size) & (
        g_cnt <= _REENCODE_MAX
    )
    stream_g = (~sentinel) & overlapping
    reenc_g = (~sentinel) & ~overlapping & small_frag
    verb_g = (~sentinel) & ~overlapping & ~small_frag

    names = ["term", "segment", "df", "max_tf", "min_dl", "blocks"]

    def ordered_rows(mask: np.ndarray) -> np.ndarray:
        """Rows of the masked groups, in (group, first_doc) order."""
        return order_all[mask[og]]

    def gather_index(rows_ordered: np.ndarray) -> np.ndarray:
        starts = offs[:-1][rows_ordered]
        lens = row_nb[rows_ordered]
        total = int(lens.sum())
        within = np.arange(total, dtype=np.int64) - np.repeat(
            np.concatenate(([0], np.cumsum(lens)[:-1])), lens
        )
        return np.repeat(starts, lens) + within

    # ---- sentinel groups: vectorized stats-only rows --------------------
    if sentinel.any():
        sg = np.flatnonzero(sentinel)
        k = len(sg)
        empty_child = blk.take(pa.array(np.empty(0, dtype=np.int64)))
        yield pa.RecordBatch.from_arrays(
            [
                pa.nulls(k, pa.string()),
                pa.array(seg[gs[sg]].astype(np.int32), type=pa.int32()),
                pa.array(g_df_sum[sg], type=pa.int64()),
                pa.array(g_mtf_sum[sg], type=pa.int64()),
                pa.array(g_mdl_max[sg], type=pa.int64()),
                pa.ListArray.from_arrays(
                    pa.array(np.zeros(k + 1, dtype=np.int32)), empty_child
                ),
            ],
            names=names,
        )

    # ---- overlapping groups: per-group streaming merge (rare) -----------
    py_rows: list[tuple] = []
    for g in np.flatnonzero(stream_g):
        lo = int(np.searchsorted(og, g, side="left"))
        hi = int(np.searchsorted(og, g, side="right"))
        runs = [blocks[int(r)].as_py() for r in order_all[lo:hi]]
        merged = merge_runs_streaming(runs, codec=codec)
        py_rows.append(
            (term[int(gs[g])].as_py(), int(seg[gs[g]]), int(g_df_sum[g]),
             int(g_mtf_max[g]), int(g_mdl_min[g]), merged)
        )

    # ---- batched re-encode of small fragmented groups -------------------
    if reenc_g.any():
        rows_r = ordered_rows(reenc_g)
        bidx = gather_index(rows_r)
        take = pa.array(bidx, type=pa.int64())
        d_bufs = blk.field("doc_deltas").take(take).to_pylist()
        t_bufs = blk.field("tfs").take(take).to_pylist()
        l_bufs = blk.field("dls").take(take).to_pylist()
        d_ids, d_tfs, d_dls = decode_posting_columns(
            b_first[bidx], b_cnt[bidx], d_bufs, t_bufs, l_bufs, codec
        )
        r_list = np.flatnonzero(reenc_g)
        g_ends2 = np.cumsum(g_cnt[r_list])
        g_starts2 = np.concatenate(([0], g_ends2[:-1]))
        enc = encode_blocks_batch(
            d_ids, d_tfs.astype(np.uint64), d_dls.astype(np.uint64),
            g_starts2, g_ends2, codec=codec,
        )
        for g, blocks_list in zip(r_list, enc):
            py_rows.append(
                (term[int(gs[g])].as_py(), int(seg[gs[g]]), int(g_df_sum[g]),
                 int(g_mtf_max[g]), int(g_mdl_min[g]), blocks_list)
            )

    if py_rows:
        yield pa.RecordBatch.from_arrays(
            [
                pa.array([r[0] for r in py_rows], type=pa.string()),
                pa.array([r[1] for r in py_rows], type=pa.int32()),
                pa.array([r[2] for r in py_rows], type=pa.int64()),
                pa.array([r[3] for r in py_rows], type=pa.int64()),
                pa.array([r[4] for r in py_rows], type=pa.int64()),
                pa.array([r[5] for r in py_rows], type=blocks_type),
            ],
            names=names,
        )

    # ---- one vectorized gather for every verbatim group -----------------
    if verb_g.any():
        rows_v = ordered_rows(verb_g)
        gather = gather_index(rows_v)
        new_struct = blk.take(pa.array(gather, type=pa.int64()))
        v_list = np.flatnonzero(verb_g)
        out_offsets = np.concatenate(
            ([0], np.cumsum(g_nb[v_list]))
        ).astype(np.int32)
        g_rows = gs[v_list]
        yield pa.RecordBatch.from_arrays(
            [
                term.take(pa.array(g_rows, type=pa.int64())),
                pa.array(seg[g_rows].astype(np.int32), type=pa.int32()),
                pa.array(g_df_sum[v_list], type=pa.int64()),
                pa.array(g_mtf_max[v_list], type=pa.int64()),
                pa.array(g_mdl_min[v_list], type=pa.int64()),
                pa.ListArray.from_arrays(pa.array(out_offsets), new_struct),
            ],
            names=names,
        )



def compact_index(
    spark, path: str, target_segments: int, _seg_map: dict | None = None
) -> int:
    """Merge index segments down to ``target_segments`` — the external
    merge stage that unifies partition-local segments (the Lucene
    TieredMergePolicy role; incremental appends create one segment per
    batch partition, and query-side per-segment overhead grows with the
    segment count).

    Plan: old segments map deterministically onto target buckets
    (contiguous by sorted segment id); rows shuffle once keyed by
    (term, bucket) and merge Arrow-native inside ``mapInArrow``
    (``_merge_partition_arrow``): doc-disjoint runs — every group this
    engine's doc-range-partitioned segments produce, head terms
    included — merge as a vectorized VERBATIM gather of block structs
    (zero posting decode); fragmented tail groups batch-re-block via
    one whole-array decode+encode pass; only overlapping-range groups
    (external ids) fall back to the per-group streaming k-way merge
    with peak O(n_runs x block) memory, independent of the term's df.
    Per-segment sentinel stats rows merge additively (doc count/token
    totals sum, max doc id maxes); term-row stats (df/max_tf/min_dl)
    fold from the source rows' own stats without any decode. The
    (term, df) side table is unchanged (global stats don't move).
    Search results are identical before and after (tested). Returns the
    new segment count.

    Multifield layouts: the per-field indexes of
    ``build_multifield_index`` share doc-id ranges segment-for-segment
    (the co-segmentation invariant ``search_multifield_index`` depends
    on). Compacting ONE field independently would renumber its buckets
    by ITS OWN segment id set — a field with missing segments (e.g.
    all-empty-title partitions) would land docs in different buckets
    than its siblings and silently mis-combine scores. This function
    therefore REFUSES to run on a ``{path}/..._index`` that sits next to
    a ``fields.json``; use ``compact_multifield_index`` on the parent
    path, which derives ONE bucket mapping from the union of all
    fields' segment ids (``_seg_map``) and applies it to every field.
    """
    import json
    import os
    import shutil

    codec, has_positions = "varint", False
    if os.path.exists(f"{path}/meta.json"):
        with open(f"{path}/meta.json") as fp:
            meta_dict = json.load(fp)
        codec = meta_dict.get("codec", "varint")
        has_positions = bool(meta_dict.get("positions", False))

    parent = os.path.dirname(path.rstrip("/"))
    if _seg_map is None and os.path.exists(os.path.join(parent, "fields.json")):
        raise ValueError(
            f"{path!r} is one field of a multifield index: compacting it "
            "alone breaks co-segmentation — call compact_multifield_index "
            f"on {parent!r} instead"
        )

    raw = spark.read.parquet(f"{path}/postings")
    if _seg_map is not None:
        bucket = dict(_seg_map)
        target_segments = len(set(bucket.values()))
        # the mapping join below is INNER: a segment absent from the
        # map (e.g. a sentinel-only segment a size-based policy didn't
        # see) would have its rows silently deleted from the rewrite —
        # refuse instead
        present = {
            r["segment"] for r in raw.select("segment").distinct().collect()
        }
        missing = sorted(present - bucket.keys())
        if missing:
            raise ValueError(
                f"_seg_map omits segments {missing} present in "
                f"{path}/postings — compacting would drop their rows"
            )
    else:
        segs = sorted(r["segment"] for r in raw.select("segment").distinct().collect())
        n_old = len(segs)
        target_segments = max(1, min(target_segments, n_old))
        bucket = {s: (i * target_segments) // n_old for i, s in enumerate(segs)}
    if has_positions:
        # the positional sidecar re-segments under the SAME mapping,
        # FIRST (its doc-disjointness assert is the likely failure; a
        # crash between the two renames leaves two individually-valid
        # relations that merely disagree on segment grouping — every
        # query on either stays correct)
        from sgpt_spark.operators.positions import compact_positions

        compact_positions(spark, path, bucket)
    mapping_df = spark.createDataFrame(
        [(s, b) for s, b in bucket.items()], "segment int, _new_seg int"
    )
    with_bucket = raw.join(F.broadcast(mapping_df), "segment")

    postings_schema = raw.schema
    # hash-partition by the merge key so each group lands whole in one
    # partition, sort so groups are contiguous, then merge Arrow-native:
    # the earlier applyInPandas formulation spent ~90% of its wall in
    # the pandas conversion of the nested blocks column (profiled —
    # 63s of 72s was a NOOP applyInPandas), not in merging
    n_part = max(int(spark.conf.get("spark.sql.shuffle.partitions", "32")), 1)
    shuffled = (
        with_bucket.select("term", "_new_seg", "df", "max_tf", "min_dl", "blocks")
        .repartition(n_part, "term", "_new_seg")
        .sortWithinPartitions("term", "_new_seg")
    )
    merged = shuffled.mapInArrow(
        lambda batches: _merge_partition_arrow(batches, codec),
        schema=postings_schema,
    )
    tmp = f"{path}/postings_compact"
    merged.write.mode("overwrite").parquet(tmp)
    shutil.rmtree(f"{path}/postings")
    os.rename(tmp, f"{path}/postings")
    return target_segments


def compact_multifield_index(spark, path: str, target_segments: int) -> int:
    """Compact every field index of a ``build_multifield_index`` layout
    with ONE shared bucket mapping, preserving the co-segmentation
    invariant: the mapping is derived from the UNION of all fields'
    segment ids (a field missing some segments — all-empty-field
    partitions — still lands every doc in the same bucket as its
    siblings, because the mapping is keyed by the shared original
    segment id, not by each field's own contiguous renumbering).
    Returns the new segment count. Search results identical before and
    after (tested, incl. a field with a missing segment)."""
    import json as _json

    with open(f"{path}/fields.json") as fp:
        fields = _json.load(fp)["fields"]
    all_segs: set = set()
    for f in fields:
        raw = spark.read.parquet(f"{path}/{f}_index/postings")
        all_segs.update(r["segment"] for r in raw.select("segment").distinct().collect())
    segs = sorted(all_segs)
    n_old = len(segs)
    target_segments = max(1, min(target_segments, n_old))
    seg_map = {s: (i * target_segments) // n_old for i, s in enumerate(segs)}
    for f in fields:
        compact_index(spark, f"{path}/{f}_index", target_segments, _seg_map=seg_map)
    return target_segments


def read_term_stats_dict(spark, path: str) -> dict | None:
    """The (term, df) side table collected to a plain ``{term: df}``
    dict — for long-running query services that answer many batches
    against one index snapshot: pass it as ``search_index(term_stats=
    ...)`` and the per-batch stats job disappears (ES keeps global term
    stats resident the same way). Driver memory is O(vocabulary); for
    web-scale vocabularies keep the DataFrame form instead. Refresh
    after appends/compaction (stats move)."""
    ts = read_term_stats(spark, path)
    if ts is None:
        return None
    return {r["term"]: int(r["df"]) for r in ts.collect()}


def read_term_stats(spark, path: str) -> DataFrame | None:
    """(term, df) global stats written by ``build_index`` — pass to
    ``search_index(term_stats=...)`` to skip the query-time df
    aggregation (None for older/append-modified layouts, which fall back
    to aggregating over the candidate postings)."""
    import os

    p = f"{path}/termstats"
    return spark.read.parquet(p) if os.path.isdir(p) else None
