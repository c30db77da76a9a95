"""ES global / children / parent / date_range / ip_range / geo_line
aggregations (operators/aggs_misc.py): from-scratch Python brute forces
over the shared toy corpus + match set, composition with the existing
bucket/metric aggs (the ES sub-agg nesting), the aton codegen twin, and
the guards."""

from __future__ import annotations

import datetime as dt
import ipaddress

import pytest

from sgpt_spark.operators.aggs import match_candidates, terms_agg
from sgpt_spark.operators.aggs_misc import (
    children_candidates,
    date_range_agg,
    geo_line_agg,
    global_candidates,
    ip_range_agg,
    ipv4_to_long,
    parent_candidates,
)
from sgpt_spark.operators.indexer import build_postings_with_docvalues

pytestmark = pytest.mark.usefixtures("spark")

D = dt.date
DOCS = [
    (0, "quick brown fox", "en", D(2024, 1, 15), "10.0.0.5"),
    (1, "quick dog", "en", D(2024, 2, 1), "10.0.1.9"),
    (2, "lazy dog sleeps", "es", D(2024, 2, 20), "192.168.1.1"),
    (3, "quick quick brown", "es", D(2024, 3, 5), "10.255.255.255"),
    (4, "a cat", "fr", None, "256.1.1.1"),  # null date, malformed ip
    (5, "brown bear quick", None, D(2023, 12, 31), "172.16.0.1"),
    (6, "unrelated words only", "de", D(2024, 1, 1), "10.0.0.6"),
    (7, "quick brown dance", "en", D(2024, 6, 30), None),  # null ip
]
SCHEMA = "doc_id long, text string, lang string, d date, ip string"
QUERIES = [(100, "quick"), (101, "brown dog"), (102, "absentterm")]
ROWS = {r[0]: r for r in DOCS}


def _brute_match():
    out = set()
    for qid, q in QUERIES:
        for d, t, *_ in DOCS:
            if any(w in t.split() for w in q.split()):
                out.add((qid, d))
    return out


def _build(spark):
    docs = spark.createDataFrame(DOCS, SCHEMA)
    postings, dv, meta = build_postings_with_docvalues(
        docs.repartition(3), ["lang", "d", "ip"], segment_size=3
    )
    cand = match_candidates(
        spark, postings, meta,
        spark.createDataFrame(QUERIES, "qid long, query string"),
    )
    return cand, dv


# ---- global ------------------------------------------------------------


def test_global_candidates(spark):
    cand, dv = _build(spark)
    got = sorted(
        (r["qid"], r["doc_id"]) for r in global_candidates(cand, dv).collect()
    )
    qids = sorted({q for q, _ in _brute_match()})
    assert got == sorted((q, d) for q in qids for d in ROWS)
    # explicit qids spelling (the compute-once sentinel idiom)
    got1 = sorted(
        (r["qid"], r["doc_id"])
        for r in global_candidates(cand, dv, qids=[0]).collect()
    )
    assert got1 == [(0, d) for d in sorted(ROWS)]
    # ES nesting: a terms sub-agg inside global counts the WHOLE corpus
    # per query, independent of the match set
    buckets = terms_agg(global_candidates(cand, dv), dv, "lang", size=10).collect()
    by_qid = {}
    for r in buckets:
        by_qid.setdefault(r["qid"], set()).add((r["value"], r["doc_count"]))
    want = {("en", 3), ("es", 2), ("fr", 1), ("de", 1)}
    assert all(v == want for v in by_qid.values()) and len(by_qid) == len(qids)


# ---- children / parent (join-field buckets) -----------------------------


PARENT_OF = [(2, 0), (3, 0), (5, 1), (6, 1), (7, 4)]  # (child, parent)


def test_children_and_parent_candidates(spark):
    cand, dv = _build(spark)
    rel = spark.createDataFrame(PARENT_OF, "doc_id long, parent_id long")
    match = _brute_match()
    got_c = sorted(
        (r["qid"], r["doc_id"])
        for r in children_candidates(cand, rel).collect()
    )
    want_c = sorted(
        (q, c) for q, p in match for c, pp in PARENT_OF if pp == p
    )
    assert got_c == want_c
    got_p = sorted(
        (r["qid"], r["doc_id"])
        for r in parent_candidates(cand, rel).collect()
    )
    want_p = sorted({(q, pp) for q, c in match for cc, pp in PARENT_OF if cc == c})
    assert got_p == want_p
    # composition: terms over the children bucket == brute
    buckets = sorted(
        (r["qid"], r["value"], r["doc_count"])
        for r in terms_agg(children_candidates(cand, rel), dv, "lang").collect()
    )
    want_b: dict = {}
    for q, c in want_c:
        lang = ROWS[c][2]
        if lang is not None:
            want_b[(q, lang)] = want_b.get((q, lang), 0) + 1
    assert buckets == sorted((q, v, n) for (q, v), n in want_b.items())


# ---- date_range ---------------------------------------------------------


def test_date_range_brute_force(spark):
    cand, dv = _build(spark)
    ranges = [
        (None, "2024-01-01"),
        ("2024-01-01", "2024-03-01"),
        ("2024-03-01", None),
        ("2024-01-01", "2024-07-01"),  # overlapping — each bucket counts
    ]
    got = sorted(
        (r["qid"], r["range_key"], r["doc_count"])
        for r in date_range_agg(cand, dv, "d", ranges).collect()
    )
    want: dict = {}
    qids = sorted({q for q, _ in _brute_match()})
    for q in qids:
        for lo, hi in ranges:
            key = f"{lo or '*'}-{hi or '*'}"
            want[(q, key)] = 0
    for q, d in _brute_match():
        v = ROWS[d][3]
        if v is None:
            continue
        for lo, hi in ranges:
            lo_d = lo and dt.date.fromisoformat(lo)
            hi_d = hi and dt.date.fromisoformat(hi)
            if (lo_d is None or v >= lo_d) and (hi_d is None or v < hi_d):
                key = f"{lo or '*'}-{hi or '*'}"
                want[(q, key)] += 1
    assert got == sorted((q, k, n) for (q, k), n in want.items())
    with pytest.raises(ValueError, match="empty date range"):
        date_range_agg(cand, dv, "d", [("2024-05-01", "2024-05-01")])
    with pytest.raises(ValueError, match="ISO string"):
        date_range_agg(cand, dv, "d", [(123, None)])
    with pytest.raises(ValueError, match="not in docvalues"):
        date_range_agg(cand, dv, "nope", [(None, None)])


# ---- ip_range -----------------------------------------------------------


def test_ipv4_to_long_codegen(spark):
    from pyspark.sql import functions as F

    rows = [("10.0.0.5",), ("0.0.0.0",), ("255.255.255.255",),
            ("256.1.1.1",), ("1.2.3",), ("a.b.c.d",), (None,), ("1.2.3.4.5",)]
    df = spark.createDataFrame(rows, "ip string")
    got = [r["v"] for r in df.select(ipv4_to_long(F.col("ip")).alias("v")).collect()]
    want = []
    for (s,) in rows:
        try:
            want.append(int(ipaddress.IPv4Address(s)) if s else None)
        except Exception:
            want.append(None)
    assert got == want


def test_ip_range_brute_force(spark):
    cand, dv = _build(spark)
    ranges = [("10.0.0.0", "10.0.2.0"), ("192.0.0.0", None)]
    masks = ["10.0.0.0/8", "172.16.0.0/12"]
    got = sorted(
        (r["qid"], r["range_key"], r["doc_count"])
        for r in ip_range_agg(cand, dv, "ip", ranges=ranges, masks=masks).collect()
    )
    bounds = {}
    for lo, hi in ranges:
        key = f"{lo or '*'}-{hi or '*'}"
        bounds[key] = (
            lo and int(ipaddress.IPv4Address(lo)),
            hi and int(ipaddress.IPv4Address(hi)),
        )
    for m in masks:
        net = ipaddress.IPv4Network(m)
        bounds[m] = (int(net.network_address), int(net.broadcast_address) + 1)
    want: dict = {}
    qids = sorted({q for q, _ in _brute_match()})
    for q in qids:
        for key in bounds:
            want[(q, key)] = 0
    for q, d in _brute_match():
        s = ROWS[d][4]
        try:
            v = int(ipaddress.IPv4Address(s)) if s else None
        except Exception:
            v = None  # malformed falls in no bucket
        if v is None:
            continue
        for key, (lo, hi) in bounds.items():
            if (lo is None or v >= lo) and (hi is None or v < hi):
                want[(q, key)] += 1
    assert got == sorted((q, k, n) for (q, k), n in want.items())
    with pytest.raises(ValueError, match="at least one range or mask"):
        ip_range_agg(cand, dv, "ip")
    with pytest.raises(ValueError, match="empty ip range"):
        ip_range_agg(cand, dv, "ip", ranges=[("10.0.0.1", "10.0.0.1")])


# ---- geo_line -----------------------------------------------------------


def test_geo_line_brute_force(spark):
    from pyspark.sql import functions as F

    from sgpt_spark.operators.geo import derive_geo_docvalues

    cand, dv = _build(spark)
    docs = spark.createDataFrame(DOCS, SCHEMA)
    geo = derive_geo_docvalues(docs).join(
        docs.select("doc_id", F.col("d").alias("ts")), "doc_id"
    )
    got = sorted(
        (r["qid"], r["seq"], round(r["lon"], 9), round(r["lat"], 9))
        for r in geo_line_agg(cand, geo, "ts", size=3).collect()
    )
    pts = {
        r["doc_id"]: (r["lat"], r["lon"])
        for r in derive_geo_docvalues(docs).collect()
    }
    want = []
    by_qid: dict = {}
    for q, d in _brute_match():
        if ROWS[d][3] is not None:
            by_qid.setdefault(q, []).append((ROWS[d][3], d))
    for q, lst in by_qid.items():
        lst.sort()
        for seq, (_, d) in enumerate(lst[:3], 1):
            want.append((q, seq, round(pts[d][1], 9), round(pts[d][0], 9)))
    assert got == sorted(want)
    # desc ordering reverses the walk
    got_desc = sorted(
        (r["qid"], r["seq"])
        for r in geo_line_agg(cand, geo, "ts", size=3, sort_order="desc").collect()
    )
    assert len(got_desc) == len(got)
    with pytest.raises(ValueError, match="sort_order"):
        geo_line_agg(cand, geo, "ts", sort_order="sideways")
    with pytest.raises(ValueError, match="ES cap"):
        geo_line_agg(cand, geo, "ts", size=20000)
    with pytest.raises(ValueError, match="in geo columns"):
        geo_line_agg(cand, geo.drop("lat"), "ts")


# ---- ip_prefix -----------------------------------------------------------


def test_ip_prefix_brute_force(spark):
    from sgpt_spark.operators.aggs_misc import ip_prefix_agg

    cand, dv = _build(spark)
    for plen in (8, 20, 32):
        got = sorted(
            (r["qid"], r["prefix"], r["doc_count"])
            for r in ip_prefix_agg(cand, dv, "ip", plen).collect()
        )
        want: dict = {}
        for q, d in _brute_match():
            s = ROWS[d][4]
            try:
                v = int(ipaddress.IPv4Address(s)) if s else None
            except Exception:
                v = None
            if v is None:
                continue
            net = (v >> (32 - plen)) << (32 - plen)
            key = f"{str(ipaddress.IPv4Address(net))}/{plen}"
            want[(q, key)] = want.get((q, key), 0) + 1
        assert got == sorted((q, k, n) for (q, k), n in want.items())
    with pytest.raises(ValueError, match="prefix_length"):
        ip_prefix_agg(cand, dv, "ip", 0)
    with pytest.raises(ValueError, match="min_doc_count"):
        ip_prefix_agg(cand, dv, "ip", 8, min_doc_count=0)
    # min_doc_count floor keeps only repeated prefixes
    got2 = {
        (r["qid"], r["prefix"]): r["doc_count"]
        for r in ip_prefix_agg(cand, dv, "ip", 8, min_doc_count=2).collect()
    }
    assert all(n >= 2 for n in got2.values())
    assert all(k[1] == "10.0.0.0/8" for k in got2)
