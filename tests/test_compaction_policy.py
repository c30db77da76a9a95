"""Tiered size-based compaction policy (round-4 advice #6): pure-math
unit tests + an incremental-append -> auto-compact -> search-identity
lifecycle test."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sgpt_spark.operators.compaction_policy import (
    auto_compact_index,
    plan_compaction,
    segment_postings_stats,
)


def _bucket_sizes(plan, sizes):
    out: dict[int, int] = {}
    for s, b in plan.items():
        out[b] = out.get(b, 0) + sizes[s]
    return out


def test_policy_noop_when_healthy():
    sizes = {0: 50_000, 1: 60_000, 2: 55_000}
    assert plan_compaction(sizes, max_segments=8, min_postings=10_000) is None


def test_policy_single_segment_never_merges():
    assert plan_compaction({0: 5}, max_segments=1, min_postings=10_000) is None
    assert plan_compaction({}, max_segments=4) is None


def test_policy_merges_many_small_appends():
    """The append shape: many tiny segments -> packed into few buckets,
    each reaching the floor, adjacency (segment-id order) preserved."""
    sizes = {s: 1_000 for s in range(20)}
    plan = plan_compaction(sizes, max_segments=8, min_postings=5_000)
    assert plan is not None
    bsz = _bucket_sizes(plan, sizes)
    assert len(bsz) <= 8
    assert all(v >= 5_000 for v in bsz.values())
    # adjacency: bucket ids are non-decreasing in segment-id order
    buckets_in_order = [plan[s] for s in sorted(plan)]
    assert buckets_in_order == sorted(buckets_in_order)
    assert sorted(set(buckets_in_order)) == list(range(len(bsz)))


def test_policy_oversized_segment_stays_alone():
    sizes = {0: 1_000_000, 1: 2_000, 2: 2_000, 3: 2_000}
    plan = plan_compaction(sizes, max_segments=8, min_postings=5_000)
    assert plan is not None
    assert [s for s, b in plan.items() if b == plan[0]] == [0]
    # the three tiny ones merge together
    assert len({plan[1], plan[2], plan[3]}) == 1


def test_policy_tiny_tail_folds_into_neighbor():
    sizes = {0: 50_000, 1: 300}
    plan = plan_compaction(sizes, max_segments=8, min_postings=5_000)
    assert plan == {0: 0, 1: 0}


def test_policy_respects_max_segments():
    sizes = {s: 100_000 for s in range(64)}
    plan = plan_compaction(sizes, max_segments=16, min_postings=1_000)
    assert plan is not None
    assert len(set(plan.values())) <= 16


def test_policy_rejects_bad_max():
    with pytest.raises(ValueError):
        plan_compaction({0: 1, 1: 1}, max_segments=0)


def test_auto_compact_lifecycle(spark, tmp_path):
    """build -> two appends (many tiny segments) -> auto_compact merges
    them; search results identical; a second auto_compact is a no-op."""
    from sgpt_spark.operators.index_search import search_index
    from sgpt_spark.operators.indexer import (
        assign_doc_ids,
        build_index,
        read_index,
        release_doc_ids,
    )
    from sgpt_spark.sources.pages import generate_pages, make_page
    from sgpt_spark.streaming.incremental import append_to_index

    idx = str(tmp_path / "auto")
    base = generate_pages(spark, 240, partitions=4).persist()
    assigned = assign_doc_ids(base.select("url", "text"))
    build_index(assigned.select("doc_id", "text"), idx, segment_size=60)
    release_doc_ids(assigned)

    pool = generate_pages(spark, 400, partitions=4).persist()
    seen = {r["url"] for r in base.select("url").collect()}
    b1 = pool.filter(~F.col("url").isin(list(seen))).limit(80)
    append_to_index(spark, b1, idx)
    seen |= {r["url"] for r in b1.select("url").collect()}
    b2 = pool.filter(~F.col("url").isin(list(seen)))
    append_to_index(spark, b2, idx)

    stats = segment_postings_stats(spark, idx)
    assert len(stats) >= 6  # appends really made many segments

    body = make_page(9)[3].split("\n")[1].split(" ")
    queries = spark.createDataFrame(
        [(1, " ".join(body[:4])), (2, " ".join(body[4:9]))], "qid long, query string"
    )
    postings, meta = read_index(spark, idx)
    before = sorted(
        tuple(r) for r in search_index(spark, postings, meta, queries, k=20).collect()
    )

    # floor chosen above every tiny segment: the policy must merge
    floor = max(stats.values()) + 1
    n_new = auto_compact_index(spark, idx, max_segments=3, min_postings=floor)
    assert n_new is not None and n_new <= 3
    assert len(segment_postings_stats(spark, idx)) == n_new

    p2, m2 = read_index(spark, idx)
    after = sorted(
        tuple(r) for r in search_index(spark, p2, m2, queries, k=20).collect()
    )
    assert after == before and before

    # healthy index now: policy declines to touch it again
    assert auto_compact_index(spark, idx, max_segments=8, min_postings=1) is None


def test_cli_compact_auto(spark, tmp_path):
    """CLI surface: --auto merges an oversharded index, then declines
    on the now-healthy one; --target-segments and --auto are mutually
    exclusive."""
    import pytest

    from sgpt_spark.cli import main
    from sgpt_spark.operators.indexer import (
        assign_doc_ids,
        build_index,
        release_doc_ids,
    )
    from sgpt_spark.sources.pages import generate_pages

    idx = str(tmp_path / "cli_auto")
    pages = generate_pages(spark, 300, partitions=4)
    assigned = assign_doc_ids(pages.select("url", "text"))
    build_index(assigned.select("doc_id", "text"), idx, segment_size=40)
    release_doc_ids(assigned)
    n_before = len(segment_postings_stats(spark, idx))
    assert n_before > 2

    main(["compact", "--index", idx, "--auto", "--max-segments", "2",
          "--min-postings", "1"])
    assert len(segment_postings_stats(spark, idx)) <= 2

    # healthy now: --auto declines (still exits 0, prints healthy)
    main(["compact", "--index", idx, "--auto", "--max-segments", "8",
          "--min-postings", "1"])
    assert len(segment_postings_stats(spark, idx)) <= 2

    with pytest.raises(SystemExit):
        main(["compact", "--index", idx])
    with pytest.raises(SystemExit):
        main(["compact", "--index", idx, "--auto", "--target-segments", "2"])


def test_auto_compact_multifield_shared_mapping(spark, tmp_path):
    """Multifield auto-compact: ONE policy plan from the union of all
    fields' per-segment sizes, applied to every field — co-segmentation
    preserved (search identity), then declines when healthy."""
    from sgpt_spark.operators.compaction_policy import (
        auto_compact_multifield_index,
    )
    from sgpt_spark.operators.index_search import search_multifield_index
    from sgpt_spark.operators.indexer import (
        assign_doc_ids,
        build_multifield_index,
        release_doc_ids,
    )
    from sgpt_spark.sources.pages import generate_pages, make_page

    mf = str(tmp_path / "mf_auto")
    pages = generate_pages(spark, 300, partitions=4)
    a = assign_doc_ids(pages.select("url", "text"))
    docs = a.withColumn(
        "title", F.array_join(F.slice(F.split("text", " ", -1), 1, 4), " ")
    ).select("doc_id", "title", "text")
    build_multifield_index(docs, mf, segment_size=40)
    release_doc_ids(a)

    n_before = len(segment_postings_stats(spark, f"{mf}/text_index"))
    assert n_before > 3

    body = make_page(11)[3].split("\n")[1].split(" ")
    queries = spark.createDataFrame(
        [(1, " ".join(body[:4])), (2, " ".join(body[4:8]))], "qid long, query string"
    )
    before = sorted(
        tuple(r)
        for r in search_multifield_index(spark, mf, queries, k=15).collect()
    )

    n_new = auto_compact_multifield_index(spark, mf, max_segments=3, min_postings=1)
    assert n_new is not None and n_new <= 3
    # every field compacted with the SAME segment count
    for f in ("title", "text"):
        assert len(segment_postings_stats(spark, f"{mf}/{f}_index")) <= n_new

    after = sorted(
        tuple(r)
        for r in search_multifield_index(spark, mf, queries, k=15).collect()
    )
    assert after == before and before

    assert auto_compact_multifield_index(spark, mf, max_segments=8, min_postings=1) is None


def test_auto_compact_preserves_sentinel_only_segment(spark, tmp_path):
    """A build partition whose docs are ALL empty-text leaves a segment
    that exists only as its sentinel stats row (term NULL;
    streaming/incremental.py:_next_segment_id documents the shape).
    The size-based policy must still see it (size 0) and the mapping
    join must keep its sentinel rows — an earlier draft dropped them
    (inner join on a plan built from term-row stats only), silently
    erasing per-segment doc/token totals from disk."""
    from sgpt_spark.operators.index_search import search_index
    from sgpt_spark.operators.indexer import build_index, read_index

    idx = str(tmp_path / "sent_auto")
    # build_index segments BY INPUT PARTITION (spark_partition_id), so a
    # sentinel-only segment = a partition whose docs are all empty-text;
    # union preserves child partitioning, giving partition 0 = all-empty
    empty = spark.createDataFrame(
        [(i, "") for i in range(60)], "doc_id long, text string"
    ).coalesce(1)
    full = spark.createDataFrame(
        [(i, f"alpha{i % 7} beta{i % 3} common w{i}") for i in range(60, 240)],
        "doc_id long, text string",
    ).repartition(3)
    build_index(empty.union(full), idx, segment_size=60)

    raw = spark.read.parquet(f"{idx}/postings")
    sent_segs_before = {
        r["segment"] for r in raw.filter(F.col("term").isNull()).collect()
    }
    stats = segment_postings_stats(spark, idx)
    empty_segs = {s for s, n in stats.items() if n == 0}
    assert empty_segs, "fixture must produce a sentinel-only segment"
    assert empty_segs <= set(stats)  # visible to the policy at size 0

    def sentinel_totals():
        # sums/max only: compaction merges per-segment sentinels
        # ADDITIVELY (one row per new segment), so row count changes but
        # the totals they carry must not
        return tuple(
            spark.read.parquet(f"{idx}/postings")
            .filter(F.col("term").isNull())
            .agg(
                F.sum("df"),
                F.sum("max_tf"),
                F.max("min_dl"),
            )
            .collect()[0]
        )

    totals_before = sentinel_totals()
    queries = spark.createDataFrame(
        [(1, "alpha1 common"), (2, "beta2 common")], "qid long, query string"
    )
    postings, meta = read_index(spark, idx)
    before = sorted(
        tuple(r) for r in search_index(spark, postings, meta, queries, k=20).collect()
    )

    n_new = auto_compact_index(
        spark, idx, max_segments=2, min_postings=max(stats.values()) + 1
    )
    assert n_new is not None and n_new <= 2

    # sentinel stats survived the rewrite (merged additively, not dropped)
    assert sentinel_totals() == totals_before
    # exactly one merged sentinel row per surviving segment
    sent_after = (
        spark.read.parquet(f"{idx}/postings")
        .filter(F.col("term").isNull())
        .select("segment")
        .collect()
    )
    assert len(sent_after) == len({r["segment"] for r in sent_after}) == n_new
    p2, m2 = read_index(spark, idx)
    after = sorted(
        tuple(r) for r in search_index(spark, p2, m2, queries, k=20).collect()
    )
    assert after == before and before
    assert sent_segs_before  # the fixture really had sentinel rows


def test_compact_index_refuses_incomplete_seg_map(spark, tmp_path):
    """Defense in depth for any _seg_map caller: the mapping join is
    inner, so a map omitting a present segment would silently delete
    its rows — compact_index must refuse instead."""
    import pytest as _pytest

    from sgpt_spark.operators.indexer import build_index, compact_index

    idx = str(tmp_path / "bad_map")
    # segment == input partition in build_index, so 3 partitions -> 3 segments
    docs = spark.createDataFrame(
        [(i, f"alpha{i % 5} beta w{i}") for i in range(120)],
        "doc_id long, text string",
    ).repartition(3)
    build_index(docs, idx, segment_size=40)
    segs = sorted(
        r["segment"]
        for r in spark.read.parquet(f"{idx}/postings").select("segment").distinct().collect()
    )
    assert len(segs) >= 2
    bad = {s: 0 for s in segs[:-1]}  # omits the last segment
    with _pytest.raises(ValueError, match="omits segments"):
        compact_index(spark, idx, 1, _seg_map=bad)


def test_auto_compact_refuses_multifield_field_dir(spark, tmp_path):
    """auto_compact_index hands compact_index an explicit _seg_map,
    which bypasses the mechanism-level fields.json refusal — the policy
    layer must refuse per-field auto-compaction itself or one field
    gets renumbered away from its co-segmented siblings."""
    import pytest as _pytest

    from sgpt_spark.operators.indexer import build_multifield_index

    mf = str(tmp_path / "mf_guard")
    docs = spark.createDataFrame(
        [(i, f"t{i % 3}", f"alpha{i % 5} beta w{i}") for i in range(120)],
        "doc_id long, title string, text string",
    )
    build_multifield_index(docs, mf, segment_size=40)
    with _pytest.raises(ValueError, match="auto_compact_multifield_index"):
        auto_compact_index(spark, f"{mf}/text_index", max_segments=1, min_postings=10)


# ---- hypothesis: policy invariants over arbitrary size maps ------------

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=300, deadline=None)
@given(
    sizes=st.dictionaries(
        st.integers(min_value=0, max_value=10_000),  # sparse segment ids
        st.integers(min_value=0, max_value=2_000_000),
        min_size=0,
        max_size=80,
    ),
    max_segments=st.integers(min_value=1, max_value=64),
    min_postings=st.integers(min_value=0, max_value=100_000),
)
def test_policy_invariants(sizes, max_segments, min_postings):
    """plan_compaction feeds compact_index(_seg_map=...), whose mapping
    join REWRITES the index — a hole here is silent data loss. Invariants
    for every input:

    1. coverage: mapping keys == input segments exactly (a dropped
       segment would be erased from disk; an invented one breaks the
       rewrite);
    2. dense bucket ids 0..n-1;
    3. adjacency: buckets are contiguous runs in segment-id order (the
       doc-disjoint verbatim-gather fast path depends on it);
    4. it merges something (n_buckets < n_segments) — None is the only
       no-op spelling;
    5. no-op exactly when healthy: within max_segments and nothing
       underfull.
    """
    plan = plan_compaction(sizes, max_segments=max_segments, min_postings=min_postings)
    n = len(sizes)
    healthy = n <= max_segments and all(v >= min_postings for v in sizes.values())
    if plan is None:
        # bidirectional: None happens EXACTLY when n <= 1 or healthy.
        # (Unhealthy n > 1 always merges: an underfull segment never
        # closes its own bucket — target >= min_postings — and a
        # trailing underfull bucket folds into its neighbor; oversharded
        # inputs can't give every segment its own >= target bucket since
        # n * ceil(total/max_segments) > total for n > max_segments.)
        assert n <= 1 or healthy
        return
    assert n > 1 and not healthy
    assert set(plan.keys()) == set(sizes.keys())  # (1)
    buckets = [plan[s] for s in sorted(plan)]
    assert buckets == sorted(buckets)  # (3)
    uniq = sorted(set(buckets))
    assert uniq == list(range(len(uniq)))  # (2)
    assert len(uniq) < n  # (4)
    assert len(uniq) <= max_segments  # cap honored
