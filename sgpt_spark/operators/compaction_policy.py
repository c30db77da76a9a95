"""Compaction POLICY: decide when and how to merge segments.

``compact_index`` (operators/indexer.py) is the MECHANISM — it takes an
explicit target. Lucene's TieredMergePolicy shows the missing layer: a
size-based policy so incremental-append users (one new segment per
batch partition, streaming/incremental.py) don't hand-pick targets.

The policy is pure math over per-segment sizes, unit-testable without
Spark:

- a segment is *underfull* when its posting count is below
  ``min_postings`` (appends create many tiny segments — each adds a
  per-segment task + decode overhead to every query);
- the index is *oversharded* when it has more than ``max_segments``
  segments (query-side per-segment overhead grows linearly);
- when either holds, adjacent-by-id segments greedily pack into buckets
  of at least ``target = max(min_postings, ceil(total/max_segments))``
  postings. Adjacency preserves doc-range contiguity, which is what
  keeps the merge on the verbatim-gather fast path (doc-disjoint runs,
  indexer._merge_rows_arrow) and future merges cheap — the same reason
  Lucene merges adjacent-by-age tiers.
- a single segment already >= target stays alone (merging it buys
  nothing and re-writes its bytes).

Size proxy: posting-row count per segment (sum of df over that
segment's terms) — cheap from the postings parquet, monotone in bytes.
Sentinel doc counts are NOT used because append-created segments carry
no sentinels (meta.json is authoritative for doc totals).
"""

from __future__ import annotations

import math


def plan_compaction(
    seg_postings: dict[int, int],
    max_segments: int = 32,
    min_postings: int = 10_000,
) -> dict[int, int] | None:
    """{segment: posting_count} -> {segment: bucket} or None (no-op).

    Returns None when no merge is warranted: segment count within
    ``max_segments`` AND no underfull segment (or only one segment
    total, or an underfull segment with no neighbor to merge into).
    Buckets are numbered 0..n-1 in segment-id order, ready for
    ``compact_index(_seg_map=...)``.
    """
    if max_segments < 1:
        raise ValueError(f"max_segments must be >= 1, got {max_segments}")
    segs = sorted(seg_postings)
    n = len(segs)
    if n <= 1:
        return None
    sizes = [int(seg_postings[s]) for s in segs]
    oversharded = n > max_segments
    underfull = any(sz < min_postings for sz in sizes)
    if not oversharded and not underfull:
        return None

    total = sum(sizes)
    target = max(min_postings, math.ceil(total / max_segments))
    mapping: dict[int, int] = {}
    bucket = 0
    acc = 0
    for s, sz in zip(segs, sizes):
        if acc >= target:
            bucket += 1
            acc = 0
        mapping[s] = bucket
        acc += sz
    n_buckets = bucket + 1
    # fold an underfull trailing bucket into its neighbor (the [big,
    # tiny-append] shape: the tiny tail must not keep its own bucket)
    if n_buckets > 1 and acc < min_postings:
        for s in segs:
            if mapping[s] == n_buckets - 1:
                mapping[s] = n_buckets - 2
        n_buckets -= 1
    # greedy close-at->=target can, in degenerate cases, exceed
    # max_segments by one — fold the tail
    while n_buckets > max_segments:
        for s in segs:
            if mapping[s] == n_buckets - 1:
                mapping[s] = n_buckets - 2
        n_buckets -= 1
    if n_buckets == n:
        return None  # every segment kept its own bucket: nothing merges
    return mapping


def segment_postings_stats(spark, path: str) -> dict[int, int]:
    """Per-segment posting-row sizes of an index at ``path`` — one
    column-pruned agg over the postings parquet. Sentinel stats rows
    (term NULL) don't count toward size — appended and built segments
    are measured alike — but a sentinel-ONLY segment (all-empty-text
    partition; streaming/incremental.py documents the shape) still
    appears with size 0: every segment must be in the plan or
    ``compact_index``'s mapping join would drop its sentinel rows."""
    from pyspark.sql import functions as F

    rows = (
        spark.read.parquet(f"{path}/postings")
        .groupBy("segment")
        .agg(
            F.sum(
                F.when(F.col("term").isNotNull(), F.col("df")).otherwise(F.lit(0))
            ).alias("n")
        )
        .collect()
    )
    return {int(r["segment"]): int(r["n"]) for r in rows}


def auto_compact_index(
    spark,
    path: str,
    max_segments: int = 32,
    min_postings: int = 10_000,
) -> int | None:
    """Apply ``plan_compaction`` to a single-field index: returns the
    new segment count, or None when the policy says leave it alone.

    Refuses to run on one field of a multifield layout for the same
    reason ``compact_index`` does: a per-field bucket renumbering
    breaks the co-segmentation invariant its siblings rely on (the
    explicit ``_seg_map`` handoff below would otherwise bypass that
    mechanism-level guard). Use ``auto_compact_multifield_index`` on
    the parent path."""
    import os

    from sgpt_spark.operators.indexer import compact_index

    parent = os.path.dirname(path.rstrip("/"))
    if os.path.exists(os.path.join(parent, "fields.json")):
        raise ValueError(
            f"{path!r} is one field of a multifield index: auto-compacting "
            "it alone breaks co-segmentation — call "
            f"auto_compact_multifield_index on {parent!r} instead"
        )
    plan = plan_compaction(
        segment_postings_stats(spark, path), max_segments, min_postings
    )
    if plan is None:
        return None
    return compact_index(spark, path, len(set(plan.values())), _seg_map=plan)


def auto_compact_multifield_index(
    spark,
    path: str,
    max_segments: int = 32,
    min_postings: int = 10_000,
) -> int | None:
    """Policy-driven compaction of a multifield layout: sizes are the
    UNION across fields per original segment id, and ONE shared bucket
    mapping is applied to every field (the co-segmentation invariant —
    see compact_multifield_index)."""
    import json

    from sgpt_spark.operators.indexer import compact_index

    with open(f"{path}/fields.json") as fp:
        fields = json.load(fp)["fields"]
    sizes: dict[int, int] = {}
    for f in fields:
        for s, n in segment_postings_stats(spark, f"{path}/{f}_index").items():
            sizes[s] = sizes.get(s, 0) + n
    plan = plan_compaction(sizes, max_segments, min_postings)
    if plan is None:
        return None
    for f in fields:
        compact_index(spark, f"{path}/{f}_index", len(set(plan.values())), _seg_map=plan)
    return len(set(plan.values()))
