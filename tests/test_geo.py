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
