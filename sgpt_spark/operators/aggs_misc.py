"""ES bucket aggregations rounding out the ``aggs`` DSL — ``global``,
``date_range``, ``ip_range``, ``children`` / ``parent`` (the join-field
bucket pair, ES ``reverse_nested``'s role for nested docs), and
``geo_line``.

Same substrate as operators/aggs.py (the analytics surface of the
reference's ES search bodies, crossencoder/beir/
crossencoder_beir_bm25.ipynb): every aggregation composes a CANDIDATES
relation (qid, doc_id — the agg phase's hit set) with a doc-values
sidecar. The bucket-mapping aggs here (`global`, `children`, `parent`)
return a NEW candidates relation, exactly how ES nests them: any
metric/bucket agg in this engine runs inside them by taking their
output as its ``candidates`` input.

``global_candidates``   ES ``global``: the bucket that IGNORES the
    query — every doc, per query. The relation is |queries| x |docs|
    rows by contract (ES pays the same iteration); at scale compute
    the sub-agg body once on a single sentinel qid and fan the
    (tiny) bucket rows out to the real qids instead — the helper
    supports that spelling via ``qids=None``.
``children_candidates`` ES ``children`` agg: parent hit set -> the
    bucket of their CHILDREN (one equi-join on the join-field
    relation); sub-aggs then run over child doc-values.
``parent_candidates``   ES ``parent`` agg (and ``reverse_nested`` for
    block-join children): child hit set -> their distinct parents.
``date_range_agg``      ES ``date_range``: explicit [from, to) DATE
    buckets, every requested bucket emitted per query (doc_count 0
    included), keys "from-to" with "*" for open ends (ISO dates).
``ip_range_agg``        ES ``ip_range``: [from, to) IPv4 buckets or
    CIDR masks, evaluated on a dotted-quad string doc-value via an
    in-codegen aton (split + shifts — no UDF, DuckDB-reproducible).
``ip_prefix_agg``       ES ``ip_prefix``: buckets keyed by the IPv4
    network at prefix_length bits ("a.b.c.d/L"), one shift/mask +
    map-side-combinable groupBy off the same aton.
``geo_line_agg``        ES ``geo_line``: per query, the match set's
    points ordered by a sort doc-value, truncated to ``size`` — one
    partial/final WindowGroupLimit; emitted FLAT (qid, seq, lon, lat,
    sort_value) rather than as a LineString geometry (the engine's
    geo rows are value-gateable that way; wrapping into GeoJSON is a
    presentation step).

Scale notes (10^12 docs): the join-field maps are one shuffle join on
doc ids; date/ip range counting broadcasts the request's range list
and counts map-side; geo_line's window carries <= size rows per query
past the partial rank. Nothing is per-row Python.
"""

from __future__ import annotations

import datetime as _dt
import ipaddress
from typing import Iterable

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from sgpt_spark.operators.aggs import range_key

__all__ = [
    "global_candidates",
    "children_candidates",
    "parent_candidates",
    "date_range_agg",
    "ipv4_to_long",
    "ip_range_agg",
    "ip_prefix_agg",
    "geo_line_agg",
]


def global_candidates(
    candidates: DataFrame, docvalues: DataFrame, qids: Iterable | None = None
) -> DataFrame:
    """ES ``global`` bucket -> (qid, doc_id) over EVERY indexed doc for
    every query in ``candidates`` (or the explicit ``qids``) — the
    bucket that escapes the query scope so a sub-agg can compare the
    match set against the whole corpus (the ES docs' avg-price idiom).

    The output is |qids| x |docs| rows — the ES global bucket iterates
    the same set. When the sub-agg body is query-independent, run it
    once: pass ``qids=[sentinel]`` and join the (tiny) bucket result to
    the real qids afterwards."""
    if qids is not None:
        spark = candidates.sparkSession
        qdf = spark.createDataFrame([(q,) for q in qids], ["qid"])
    else:
        qdf = candidates.select("qid").distinct()
    return qdf.crossJoin(docvalues.select("doc_id"))


def children_candidates(
    candidates: DataFrame, parent_of: DataFrame
) -> DataFrame:
    """ES ``children`` aggregation bucket mapper: parent hit set (qid,
    parent doc_id) -> (qid, doc_id) of their CHILDREN via the
    (doc_id, parent_id) join-field relation (joinfield.py's model).
    Sub-aggs run over CHILD doc-values by taking this as candidates."""
    return (
        candidates.select("qid", F.col("doc_id").alias("parent_id"))
        .join(parent_of.select("doc_id", "parent_id"), "parent_id")
        .select("qid", "doc_id")
    )


def parent_candidates(
    candidates: DataFrame, parent_of: DataFrame
) -> DataFrame:
    """ES ``parent`` aggregation bucket mapper (and the
    ``reverse_nested`` role for ``explode_nested`` children): child hit
    set -> their DISTINCT parents (qid, doc_id). Distinct because many
    children share a parent and ES counts each parent once."""
    return (
        candidates.join(parent_of.select("doc_id", "parent_id"), "doc_id")
        .select("qid", F.col("parent_id").alias("doc_id"))
        .distinct()
    )


def date_range_agg(
    candidates: DataFrame,
    docvalues: DataFrame,
    field: str,
    ranges: Iterable[tuple],
) -> DataFrame:
    """ES ``date_range`` aggregation over the match set -> (qid,
    range_key, doc_count): explicit half-open [from, to) DATE buckets
    (``from`` inclusive, ``to`` exclusive — the ES contract; None =
    open end; bounds as ISO "YYYY-MM-DD" strings or date objects).
    Every requested bucket is emitted for every query with a non-empty
    match set (doc_count 0 included); NULL dates fall in no bucket;
    overlapping ranges each count (ES allows them).

    Plan: the ``range_agg`` shape on the date domain — the tiny range
    relation broadcast-joins the match values on the [from, to)
    predicate, and the qid x range cross product keeps empty buckets.
    (ES date math like "now-1M/d" resolves at request build time; this
    engine takes the resolved bounds.)"""
    if field not in docvalues.columns:
        raise ValueError(
            f"date_range_agg field {field!r} not in docvalues columns "
            f"{docvalues.columns}"
        )
    rs = []
    for lo, hi in ranges:
        lo = _coerce_date(lo, "from")
        hi = _coerce_date(hi, "to")
        if lo is not None and hi is not None and lo >= hi:
            raise ValueError(f"empty date range [{lo}, {hi})")
        rs.append((lo, hi))
    if not rs:
        raise ValueError("date_range_agg needs at least one range")
    keys = [
        range_key(lo and lo.isoformat(), hi and hi.isoformat()) for lo, hi in rs
    ]
    if len(set(keys)) != len(keys):
        raise ValueError(f"duplicate date_range buckets in {keys}")
    spark = candidates.sparkSession
    rdf = spark.createDataFrame(
        [(k, lo, hi) for k, (lo, hi) in zip(keys, rs)],
        "range_key string, lo date, hi date",
    )
    vals = candidates.join(
        docvalues.select("doc_id", F.col(field).cast("date").alias("_v")), "doc_id"
    ).filter(F.col("_v").isNotNull())
    cond = (F.col("lo").isNull() | (F.col("_v") >= F.col("lo"))) & (
        F.col("hi").isNull() | (F.col("_v") < F.col("hi"))
    )
    counts = (
        vals.join(F.broadcast(rdf), cond)
        .groupBy("qid", "range_key")
        .agg(F.count("*").alias("doc_count"))
    )
    full = candidates.select("qid").distinct().crossJoin(
        F.broadcast(rdf.select("range_key"))
    )
    return full.join(counts, ["qid", "range_key"], "left").select(
        "qid",
        "range_key",
        F.coalesce(F.col("doc_count"), F.lit(0)).alias("doc_count"),
    )


def _coerce_date(v, side: str):
    if v is None:
        return None
    if isinstance(v, _dt.date) and not isinstance(v, _dt.datetime):
        return v
    if isinstance(v, str):
        return _dt.date.fromisoformat(v)
    raise ValueError(f"date_range {side} bound must be None, date, or ISO string, got {v!r}")


def ipv4_to_long(col: Column) -> Column:
    """Dotted-quad IPv4 string -> uint32 as long, in whole-stage codegen
    (split + shifts — the aton every ip_range comparison runs on;
    byte-for-byte the DuckDB spelling the tests twin). NULL/malformed
    strings (wrong part count or non-numeric octet) -> NULL."""
    parts = F.split(col, r"\.")
    # F.get / try_cast (not getItem / cast): out-of-bounds and
    # non-numeric octets must be NULL, not an ANSI error
    octets = [F.get(parts, i).try_cast("long") for i in range(4)]
    ok = (F.size(parts) == 4) & F.lit(True)
    for o in octets:
        ok = ok & o.isNotNull() & (o >= 0) & (o <= 255)
    val = octets[0] * F.lit(16777216) + octets[1] * F.lit(65536) + octets[2] * F.lit(256) + octets[3]
    return F.when(ok, val)


def ip_range_agg(
    candidates: DataFrame,
    docvalues: DataFrame,
    field: str,
    ranges: Iterable[tuple] = (),
    masks: Iterable[str] = (),
) -> DataFrame:
    """ES ``ip_range`` aggregation over the match set -> (qid,
    range_key, doc_count): [from, to) IPv4 buckets (``ranges`` of
    dotted-quad strings, None = open end, keyed "from-to"/"*") and/or
    CIDR ``masks`` ("10.0.0.0/8", keyed by the mask — ES keys CIDR
    buckets by the mask string; a /n mask covers [network, broadcast+1)).
    Every requested bucket is emitted per query (doc_count 0 included);
    NULL/malformed addresses fall in no bucket. IPv6 is a documented
    boundary (the testdata carries no ip column at all — callers derive
    or supply one; the comparison domain here is uint32).

    Plan: one in-codegen aton (``ipv4_to_long``) on the doc-value, the
    broadcast range-relation theta join + qid x range fill of
    ``range_agg``."""
    if field not in docvalues.columns:
        raise ValueError(
            f"ip_range_agg field {field!r} not in docvalues columns "
            f"{docvalues.columns}"
        )
    rs = []  # (key, lo_long | None, hi_long | None)
    for lo, hi in ranges:
        lo_l = None if lo is None else int(ipaddress.IPv4Address(lo))
        hi_l = None if hi is None else int(ipaddress.IPv4Address(hi))
        if lo_l is not None and hi_l is not None and lo_l >= hi_l:
            raise ValueError(f"empty ip range [{lo}, {hi})")
        rs.append((range_key(lo, hi), lo_l, hi_l))
    for m in masks:
        net = ipaddress.IPv4Network(m, strict=False)
        rs.append((m, int(net.network_address), int(net.broadcast_address) + 1))
    if not rs:
        raise ValueError("ip_range_agg needs at least one range or mask")
    keys = [k for k, _, _ in rs]
    if len(set(keys)) != len(keys):
        raise ValueError(f"duplicate ip_range buckets in {keys}")
    spark = candidates.sparkSession
    rdf = spark.createDataFrame(rs, "range_key string, lo long, hi long")
    vals = candidates.join(
        docvalues.select("doc_id", ipv4_to_long(F.col(field)).alias("_v")),
        "doc_id",
    ).filter(F.col("_v").isNotNull())
    cond = (F.col("lo").isNull() | (F.col("_v") >= F.col("lo"))) & (
        F.col("hi").isNull() | (F.col("_v") < F.col("hi"))
    )
    counts = (
        vals.join(F.broadcast(rdf), cond)
        .groupBy("qid", "range_key")
        .agg(F.count("*").alias("doc_count"))
    )
    full = candidates.select("qid").distinct().crossJoin(
        F.broadcast(rdf.select("range_key"))
    )
    return full.join(counts, ["qid", "range_key"], "left").select(
        "qid",
        "range_key",
        F.coalesce(F.col("doc_count"), F.lit(0)).alias("doc_count"),
    )


def geo_line_agg(
    candidates: DataFrame,
    geo: DataFrame,
    sort_field: str,
    size: int = 10000,
    sort_order: str = "asc",
) -> DataFrame:
    """ES ``geo_line`` aggregation over the match set -> (qid, seq, lon,
    lat, sort_value): each query's matching points ordered by the sort
    doc-value (the ES contract — geo_line REQUIRES a sort field, e.g. a
    timestamp, and truncates to ``size``; ES max 10000). ``geo`` is the
    (doc_id, lat, lon) sidecar (geo.py's model) carrying ``sort_field``
    or joined with a doc-values relation that does. Ties on the sort
    value break by doc_id asc (deterministic — ES's truncation order on
    ties is unspecified). Rows come out FLAT, one per vertex, ``seq``
    1-based; a LineString is ``collect_list`` over seq at presentation.

    Plan: one join to the sidecar, one partial/final WindowGroupLimit
    rank — <= size rows per query cross the final shuffle."""
    for c in ("lat", "lon", sort_field):
        if c not in geo.columns:
            raise ValueError(f"geo_line_agg needs {c!r} in geo columns {geo.columns}")
    if sort_order not in ("asc", "desc"):
        raise ValueError(f"sort_order must be asc|desc, got {sort_order!r}")
    if not 1 <= size <= 10000:
        raise ValueError(f"size must be in [1, 10000] (the ES cap), got {size}")
    vals = candidates.join(
        geo.select("doc_id", "lat", "lon", F.col(sort_field).alias("sort_value")),
        "doc_id",
    ).filter(F.col("sort_value").isNotNull())
    key = F.col("sort_value").asc() if sort_order == "asc" else F.col("sort_value").desc()
    w = Window.partitionBy("qid").orderBy(key, F.col("doc_id").asc())
    return (
        vals.withColumn("seq", F.row_number().over(w))
        .filter(F.col("seq") <= size)
        .select("qid", "seq", "lon", "lat", "sort_value")
    )


def ip_prefix_agg(
    candidates: DataFrame,
    docvalues: DataFrame,
    field: str,
    prefix_length: int,
    min_doc_count: int = 1,
) -> DataFrame:
    """ES ``ip_prefix`` aggregation over the match set -> (qid, prefix,
    doc_count): buckets keyed by the IPv4 NETWORK at ``prefix_length``
    bits, spelled "a.b.c.d/L" (the ES key shape), ordered semantics left
    to the caller (ES orders by key; the relation is unordered as every
    agg here). ``min_doc_count`` default 1 — ES emits only non-empty
    prefixes (there is no bounded key universe to fill). NULL/malformed
    addresses fall in no bucket; IPv6 (``is_ipv6``) is the same
    documented boundary as ``ip_range_agg``.

    Plan: the in-codegen aton, one shift/mask to the network id, one
    map-side-combinable groupBy, and a codegen dotted-quad render of
    the key — no UDF anywhere."""
    if field not in docvalues.columns:
        raise ValueError(
            f"ip_prefix_agg field {field!r} not in docvalues columns "
            f"{docvalues.columns}"
        )
    if not 1 <= int(prefix_length) <= 32:
        raise ValueError(f"prefix_length must be in [1, 32], got {prefix_length}")
    if min_doc_count < 1:
        raise ValueError(f"min_doc_count must be >= 1, got {min_doc_count}")
    shift = 32 - int(prefix_length)
    vals = candidates.join(
        docvalues.select("doc_id", ipv4_to_long(F.col(field)).alias("_v")),
        "doc_id",
    ).filter(F.col("_v").isNotNull())
    net = (F.shiftright(F.col("_v"), shift) * F.lit(1 << shift)).cast("long")
    counts = vals.groupBy("qid", net.alias("_net")).agg(
        F.count("*").alias("doc_count")
    )
    if min_doc_count > 1:
        counts = counts.filter(F.col("doc_count") >= min_doc_count)
    octets = [
        F.shiftright(F.col("_net"), 24).bitwiseAND(F.lit(255)),
        F.shiftright(F.col("_net"), 16).bitwiseAND(F.lit(255)),
        F.shiftright(F.col("_net"), 8).bitwiseAND(F.lit(255)),
        F.col("_net").bitwiseAND(F.lit(255)),
    ]
    key = F.concat_ws(
        "/", F.concat_ws(".", *[o.cast("string") for o in octets]),
        F.lit(str(int(prefix_length))),
    )
    return counts.select("qid", key.alias("prefix"), "doc_count")
