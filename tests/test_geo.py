"""ES geo family (operators/geo.py): haversine vs independent python
math; the derived md5-arithmetic geo sidecar reproduced BIT-FOR-BIT in
DuckDB; the codegen geohash against the textbook bisection algorithm
(plus the classic test vector); bounding-box and distance filters,
the geo_distance range agg, and the geohash_grid agg against python
brute forces; and a DuckDB twin of geo_distance search at gate rigor
over the real sf0.001 corpus."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sgpt_spark.operators.geo import (
    derive_geo_docvalues,
    geo_bounding_box_filter,
    geo_distance_agg,
    geo_distance_filter,
    geo_distance_search_index,
    geo_distance_sort,
    geohash_col,
    geohash_grid_agg,
    geohash_py,
    haversine_m,
    haversine_m_py,
)
from sgpt_spark.operators.indexer import build_postings

pytestmark = pytest.mark.usefixtures("spark")

SF = "/root/testdata/sf0.001"

PAIRS = [
    (0.0, 0.0, 0.0, 0.0),
    (0.0, 0.0, 0.0, 1.0),
    (52.52, 13.405, 48.8566, 2.3522),      # Berlin - Paris
    (57.64911, 10.40744, -33.8688, 151.2093),
    (89.9, 0.0, -89.9, 179.9),             # near-antipodal
    (10.0, 179.95, 10.0, -179.95),         # across the dateline
]


def _dv(spark):
    from sgpt_spark.sources.tables import load_table

    return derive_geo_docvalues(load_table(spark, SF, "documents"))


def test_haversine_matches_python(spark):
    df = spark.createDataFrame(
        PAIRS, "lat1 double, lon1 double, lat2 double, lon2 double"
    ).select(
        haversine_m(F.col("lat1"), F.col("lon1"), F.col("lat2"), F.col("lon2"))
        .alias("d")
    )
    got = [r["d"] for r in df.collect()]
    want = [haversine_m_py(*p) for p in PAIRS]
    for g, w in zip(got, want):
        assert g == pytest.approx(w, rel=1e-12)
    # sanity: one degree of longitude at the equator ~ 111.2 km
    assert 111_000 < want[1] < 111_400


def test_derived_sidecar_bit_identical_in_duckdb(spark):
    """The md5-arithmetic lat/lon derivation is ONE exact integer fold
    plus one IEEE multiply-subtract — DuckDB reproduces every
    coordinate bit-for-bit (the operators.encode oracle pattern)."""
    import duckdb

    got = {
        r["doc_id"]: (r["lat"], r["lon"])
        for r in _dv(spark).collect()
    }
    con = duckdb.connect()
    rows = con.execute(
        f"""
SELECT doc_id,
       (CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':lat'), 1, 8))
             AS BIGINT) / 4294967296.0) * 180.0 - 90.0 AS lat,
       (CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':lon'), 1, 8))
             AS BIGINT) / 4294967296.0) * 360.0 - 180.0 AS lon
FROM read_parquet('{SF}/documents.parquet')
"""
    ).fetchall()
    want = {d: (la, lo) for d, la, lo in rows}
    assert got == want and len(got) > 100
    lats = [la for la, _ in got.values()]
    lons = [lo for _, lo in got.values()]
    assert min(lats) >= -90 and max(lats) < 90
    assert min(lons) >= -180 and max(lons) < 180


def test_geohash_classic_vector():
    assert geohash_py(57.64911, 10.40744, 7) == "u4pruyd"
    assert geohash_py(57.64911, 10.40744, 5) == "u4pru"


@pytest.mark.parametrize("precision", [1, 5, 7, 9])
def test_geohash_codegen_vs_textbook(spark, precision):
    dv = _dv(spark)
    got = {
        r["doc_id"]: r["gh"]
        for r in dv.select(
            "doc_id", geohash_col(F.col("lat"), F.col("lon"), precision).alias("gh")
        ).collect()
    }
    pts = {r["doc_id"]: (r["lat"], r["lon"]) for r in dv.collect()}
    want = {d: geohash_py(la, lo, precision) for d, (la, lo) in pts.items()}
    assert got == want and len(got) > 100


def test_geohash_edge_points(spark):
    pts = [
        (0, 90.0, 180.0),   # the exact north-east edge (clamped cell)
        (1, -90.0, -180.0),
        (2, 0.0, 0.0),
        (3, 89.999999, 179.999999),
    ]
    df = spark.createDataFrame(pts, "doc_id long, lat double, lon double")
    got = {
        r["doc_id"]: r["gh"]
        for r in df.select(
            "doc_id", geohash_col(F.col("lat"), F.col("lon"), 6).alias("gh")
        ).collect()
    }
    # textbook bisection never exceeds the last cell, so +90/+180 land
    # in the same cell as the clamped codegen index
    for d, la, lo in pts:
        assert got[d] == geohash_py(min(la, 89.9999999999), min(lo, 179.9999999999), 6)


def test_filters_match_python_brute(spark):
    dv = _dv(spark)
    pts = {r["doc_id"]: (r["lat"], r["lon"]) for r in dv.collect()}

    origin, dist = (10.0, 20.0), 6_000_000.0
    got = {
        r["doc_id"]
        for r in dv.filter(geo_distance_filter(origin, dist)).collect()
    }
    want = {
        d
        for d, (la, lo) in pts.items()
        if haversine_m_py(la, lo, *origin) <= dist
    }
    assert got == want and 0 < len(got) < len(pts)

    # plain box
    got = {
        r["doc_id"]
        for r in dv.filter(
            geo_bounding_box_filter((40.0, -30.0), (-10.0, 60.0))
        ).collect()
    }
    want = {
        d
        for d, (la, lo) in pts.items()
        if -10.0 <= la <= 40.0 and -30.0 <= lo <= 60.0
    }
    assert got == want and len(got) > 0

    # dateline-crossing box: west 150 > east -150
    got = {
        r["doc_id"]
        for r in dv.filter(
            geo_bounding_box_filter((60.0, 150.0), (-60.0, -150.0))
        ).collect()
    }
    want = {
        d
        for d, (la, lo) in pts.items()
        if -60.0 <= la <= 60.0 and (lo >= 150.0 or lo <= -150.0)
    }
    assert got == want and len(got) > 0


def test_guards(spark):
    with pytest.raises(ValueError, match="distance_m"):
        geo_distance_filter((0, 0), 0)
    with pytest.raises(ValueError, match="latitude"):
        geo_distance_filter((91, 0), 1)
    with pytest.raises(ValueError, match="south"):
        geo_bounding_box_filter((0.0, 0.0), (10.0, 10.0))
    with pytest.raises(ValueError, match="precision"):
        geohash_col(F.col("lat"), F.col("lon"), 10)
    with pytest.raises(ValueError, match="at least one range"):
        geo_distance_agg(None, None, (0, 0), [])


def test_geo_distance_agg_matches_brute(spark):
    from sgpt_spark.sources.tables import load_table

    docs = load_table(spark, SF, "documents")
    dv = derive_geo_docvalues(docs)
    pts = {r["doc_id"]: (r["lat"], r["lon"]) for r in dv.collect()}
    hits = docs.select(F.lit(1).alias("qid"), "doc_id")
    origin = (0.0, 0.0)
    ranges = [(None, 3e6), (3e6, 8e6), (8e6, None)]
    got = sorted(
        (r["qid"], r["bucket"], r["doc_count"])
        for r in geo_distance_agg(hits, dv, origin, ranges).collect()
    )
    import collections

    cnt: dict = collections.Counter()
    for d, (la, lo) in pts.items():
        dist = haversine_m_py(la, lo, *origin)
        for fr, to in ranges:
            if (fr is None or dist >= fr) and (to is None or dist < to):
                label = f"{'*' if fr is None else float(fr)}-{'*' if to is None else float(to)}"
                cnt[label] += 1
    want = sorted(
        (1, f"{'*' if fr is None else float(fr)}-{'*' if to is None else float(to)}",
         cnt[f"{'*' if fr is None else float(fr)}-{'*' if to is None else float(to)}"])
        for fr, to in ranges
    )
    assert got == want
    assert sum(c for _, _, c in got) == len(pts)  # buckets partition the corpus


def test_geohash_grid_agg_matches_brute(spark):
    from sgpt_spark.sources.tables import load_table

    docs = load_table(spark, SF, "documents")
    dv = derive_geo_docvalues(docs)
    pts = {r["doc_id"]: (r["lat"], r["lon"]) for r in dv.collect()}
    hits = docs.select(F.lit(1).alias("qid"), "doc_id")
    got = sorted(
        (r["qid"], r["geohash"], r["doc_count"])
        for r in geohash_grid_agg(hits, dv, precision=1, size=5).collect()
    )
    import collections

    cnt = collections.Counter(geohash_py(la, lo, 1) for la, lo in pts.values())
    want = sorted(
        (1, gh, c)
        for gh, c in sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    )
    assert got == want and len(got) == 5


def test_geo_distance_sort(spark):
    from sgpt_spark.sources.tables import load_table

    docs = load_table(spark, SF, "documents")
    dv = derive_geo_docvalues(docs)
    hits = docs.select(F.lit(1).alias("qid"), "doc_id").limit(50)
    origin = (45.0, 45.0)
    rows = geo_distance_sort(hits, dv, origin).collect()
    assert len(rows) == 50
    by_rank = sorted(rows, key=lambda r: r["rank"])
    dists = [r["distance_m"] for r in by_rank]
    assert dists == sorted(dists)
    # the distance column is the haversine of the derived point
    pts = {r["doc_id"]: (r["lat"], r["lon"]) for r in dv.collect()}
    for r in by_rank[:5]:
        assert r["distance_m"] == pytest.approx(
            haversine_m_py(*pts[r["doc_id"]], *origin), rel=1e-12
        )


# ---- DuckDB twin at gate rigor ---------------------------------------------


def test_geo_distance_search_duckdb_equality(spark):
    """bool {must: match, filter: geo_distance} on the real sf0.001
    corpus with the derived geo sidecar, checked against a full DuckDB
    reimplementation (BM25 + haversine on the md5-derived points)."""
    import duckdb

    import __spark_entry__ as entry
    from sgpt_spark.sources.queryset import QUERIES_SQL, derived_queries
    from sgpt_spark.sources.tables import load_table

    docs = load_table(spark, SF, "documents")
    postings, meta = build_postings(docs, segment_size=200)
    q = derived_queries(docs).filter("qid < 500")
    dv = derive_geo_docvalues(docs)
    origin, dist = (0.0, 0.0), 8_000_000.0
    got = sorted(
        (r["qid"], r["doc_id"], round(r["score"], 6), r["rank"])
        for r in geo_distance_search_index(
            spark, postings, meta, q, dv, origin, dist, k=10
        ).collect()
    )

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    sql = f"""
WITH {entry._TOKENS_CTE},
  stats AS (SELECT count(*) AS n, avg(doc_len) AS avgdl FROM doclen),
  queryset AS (SELECT * FROM ({QUERIES_SQL}) WHERE qid < 500),
  qterms AS (
    SELECT qid, u.term AS term, count(*) AS qtf
    FROM queryset, unnest(string_split(query, ' ')) AS u(term)
    WHERE u.term <> '' GROUP BY qid, u.term
  ),
  geo AS (
    SELECT doc_id,
           (CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':lat'), 1, 8))
                 AS BIGINT) / 4294967296.0) * 180.0 - 90.0 AS lat,
           (CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':lon'), 1, 8))
                 AS BIGINT) / 4294967296.0) * 360.0 - 180.0 AS lon
    FROM documents
  ),
  near AS (
    SELECT doc_id FROM geo
    WHERE CAST({2.0 * 6371008.7714150598!r} AS DOUBLE) *
          asin(sqrt(least(
            pow(sin(radians(lat - {origin[0]}) / 2), 2)
            + cos(radians({origin[0]})) * cos(radians(lat))
              * pow(sin(radians(lon - {origin[1]}) / 2), 2), 1.0)))
          <= {dist}
  ),
  bm25 AS (
    SELECT q.qid, tf.doc_id,
           sum(q.qtf * ln(1 + (s.n - tdf.df + 0.5) / (tdf.df + 0.5))
               * tf.tf / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.doc_len / s.avgdl))
           ) AS score
    FROM qterms q
    JOIN tf ON q.term = tf.term
    JOIN tdf ON tf.term = tdf.term
    JOIN doclen dl ON tf.doc_id = dl.doc_id
    CROSS JOIN stats s
    GROUP BY q.qid, tf.doc_id
  )
SELECT qid, doc_id, round(score, 6) AS score,
       CAST(row_number() OVER (PARTITION BY qid
            ORDER BY round(score, 6) DESC, doc_id ASC) AS INTEGER) AS rank
FROM bm25 JOIN near USING (doc_id)
QUALIFY rank <= 10
"""
    want = sorted(
        (int(q_), d, float(s), int(rk))
        for q_, d, s, rk in con.execute(sql).fetchall()
    )
    assert got == want and len(got) > 0
    # the filter bit: the geo-filtered page differs from the plain
    # match page (the filter dropped docs that would otherwise rank)
    from sgpt_spark.operators.index_search import search_index

    plain = {
        (r["qid"], r["doc_id"])
        for r in search_index(spark, postings, meta, q, k=10).collect()
    }
    assert {(g[0], g[1]) for g in got} != plain


# ---- geotile_grid / geo_centroid / geo_bounds -------------------------------


def test_geotile_classic_vectors(spark):
    from sgpt_spark.operators.geo import geotile_py

    # slippy-map textbook points: origin at z1 sits in tile (1, 1)'s
    # corner; zoom 0 is always "0/0/0"; poles clamp into the edge tiles
    assert geotile_py(0.0, 0.0, 0) == "0/0/0"
    assert geotile_py(0.0, 0.0, 1) == "1/1/1"
    assert geotile_py(89.9, 0.0, 2) == "2/2/0"     # above mercator bound -> top row
    assert geotile_py(-89.9, 179.99, 2) == "2/3/3" # below -> bottom row, east edge
    assert geotile_py(51.5074, -0.1278, 10) == "10/511/340"  # London z10


@pytest.mark.parametrize("precision", [0, 1, 3, 7, 12])
def test_geotile_codegen_vs_textbook(spark, precision):
    from sgpt_spark.operators.geo import geotile_col, geotile_py

    pts = [
        (0.0, 0.0), (0.001, 0.001), (-0.001, -0.001),
        (85.06, 12.0), (-85.06, 12.0), (89.9, -179.99), (-89.9, 179.99),
        (52.52, 13.405), (-33.8688, 151.2093), (37.7749, -122.4194),
        (10.0, 179.95), (10.0, -179.95), (66.51, 25.73),
    ]
    df = spark.createDataFrame(pts, "lat double, lon double").select(
        "lat", "lon",
        geotile_col(F.col("lat"), F.col("lon"), precision).alias("t"),
    )
    for r in df.collect():
        assert r["t"] == geotile_py(r["lat"], r["lon"], precision), (
            r["lat"], r["lon"], precision,
        )


def test_geotile_codegen_vs_textbook_corpus(spark):
    from sgpt_spark.operators.geo import geotile_col, geotile_py

    rows = _dv(spark).select(
        "lat", "lon", geotile_col(F.col("lat"), F.col("lon"), 5).alias("t")
    ).collect()
    assert rows and all(
        r["t"] == geotile_py(r["lat"], r["lon"], 5) for r in rows
    )


def test_geotile_grid_agg_matches_brute(spark):
    import collections

    from sgpt_spark.operators.geo import geotile_grid_agg, geotile_py
    from sgpt_spark.sources.tables import load_table

    docs = load_table(spark, SF, "documents")
    dv = derive_geo_docvalues(docs)
    pts = {r["doc_id"]: (r["lat"], r["lon"]) for r in dv.collect()}
    hits = docs.select(F.lit(1).alias("qid"), "doc_id")
    got = sorted(
        (r["qid"], r["geotile"], r["doc_count"])
        for r in geotile_grid_agg(hits, dv, precision=2, size=5).collect()
    )
    cnt = collections.Counter(geotile_py(la, lo, 2) for la, lo in pts.values())
    want = sorted(
        (1, t, c)
        for t, c in sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    )
    assert got == want and len(got) == 5


def test_geo_centroid_matches_brute(spark):
    from sgpt_spark.operators.geo import geo_centroid_agg
    from sgpt_spark.sources.tables import load_table

    docs = load_table(spark, SF, "documents")
    dv = derive_geo_docvalues(docs)
    pts = [(r["lat"], r["lon"]) for r in dv.collect()]
    hits = docs.select(F.lit(7).alias("qid"), "doc_id")
    [row] = geo_centroid_agg(hits, dv).collect()
    assert row["qid"] == 7 and row["count"] == len(pts)
    assert row["lat"] == pytest.approx(sum(p[0] for p in pts) / len(pts), abs=1e-9)
    assert row["lon"] == pytest.approx(sum(p[1] for p in pts) / len(pts), abs=1e-9)


def _brute_bounds(pts, wrap):
    """Independent largest-gap bounding box (the operator's declared
    rule, recomputed from scratch)."""
    top, bottom = max(p[0] for p in pts), min(p[0] for p in pts)
    lons = sorted({p[1] for p in pts})
    if not wrap or len(lons) == 1:
        return top, bottom, lons[0], lons[-1]
    gaps = [
        (lons[i + 1] - lons[i], lons[i], lons[i + 1])
        for i in range(len(lons) - 1)
    ] + [(lons[0] + 360.0 - lons[-1], lons[-1], lons[0] + 360.0)]
    g, right_of, left_raw = max(gaps, key=lambda t: (t[0], -t[1]))
    left = left_raw - 360.0 if left_raw >= 180.0 else left_raw
    return top, bottom, left, right_of


@pytest.mark.parametrize("wrap", [True, False])
def test_geo_bounds_matches_brute_corpus(spark, wrap):
    from sgpt_spark.operators.geo import geo_bounds_agg
    from sgpt_spark.sources.tables import load_table

    docs = load_table(spark, SF, "documents")
    dv = derive_geo_docvalues(docs)
    pts = [(r["lat"], r["lon"]) for r in dv.collect()]
    hits = docs.select(F.lit(1).alias("qid"), "doc_id")
    [row] = geo_bounds_agg(hits, dv, wrap_longitude=wrap).collect()
    top, bottom, left, right = _brute_bounds(pts, wrap)
    assert row["top"] == top and row["bottom"] == bottom
    assert row["left"] == left and row["right"] == right


def test_geo_bounds_dateline_cluster(spark):
    """A cluster hugging the dateline: wrap=True finds the narrow
    crossing box (left > right), wrap=False reports the wide one."""
    from sgpt_spark.operators.geo import geo_bounds_agg

    dv = spark.createDataFrame(
        [(0, 10.0, 170.0), (1, 12.0, 178.0), (2, -5.0, -175.0),
         (3, 2.0, -179.5), (4, 8.0, 174.0)],
        "doc_id long, lat double, lon double",
    )
    hits = dv.select(F.lit(1).alias("qid"), "doc_id")
    [w] = geo_bounds_agg(hits, dv, wrap_longitude=True).collect()
    assert (w["left"], w["right"]) == (170.0, -175.0)   # crosses the dateline
    assert (w["top"], w["bottom"]) == (12.0, -5.0)
    [nw] = geo_bounds_agg(hits, dv, wrap_longitude=False).collect()
    assert (nw["left"], nw["right"]) == (-179.5, 178.0)
    # single-point degenerate box
    one = dv.filter(F.col("doc_id") == 0)
    [s] = geo_bounds_agg(
        one.select(F.lit(2).alias("qid"), "doc_id"), one, wrap_longitude=True
    ).collect()
    assert (s["left"], s["right"]) == (170.0, 170.0)


def test_geotile_guards(spark):
    from sgpt_spark.operators.geo import geotile_col, geotile_grid_agg

    with pytest.raises(ValueError, match="precision"):
        geotile_col(F.col("lat"), F.col("lon"), 30)
    with pytest.raises(ValueError, match="size"):
        geotile_grid_agg(None, None, precision=2, size=0)
