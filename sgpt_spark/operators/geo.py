"""ES geo queries and aggregations — ``geo_distance``,
``geo_bounding_box``, distance sort, the ``geo_distance`` range
aggregation, and the ``geohash_grid`` aggregation.

The reference delegates this DSL to its ES indexes
(crossencoder/beir/crossencoder_beir_bm25.ipynb cell 10); a
Common-Crawl-scale web corpus (BASELINE.json's input shape) carries
page geolocation as a doc-values field in production, and geo filters
("pages near X") compose with BM25 exactly like the engine's other
structured filters. No geo data exists in the sandbox, so
``derive_geo_docvalues`` derives a DETERMINISTIC (doc_id, lat, lon)
sidecar from the corpus keys with the engine's md5-arithmetic idiom
(``operators.encode``): lat/lon are ``uint32(md5(key||':lat'))/2^32``
scaled to [-90, 90) / [-180, 180) — ONE exact integer fold plus one
IEEE multiply-subtract, so DuckDB reproduces every coordinate
bit-for-bit and the whole family is oracle-checkable. A real corpus
swaps in its own (doc_id, lat, lon) relation; every plan is identical.

Distance is the haversine great-circle distance in METERS on ES's
mean-earth-radius sphere (GeoUtils.EARTH_MEAN_RADIUS =
6371008.7714150598 m) — pure whole-stage-codegen arithmetic
(radians/sin/cos/asin/sqrt), no UDF anywhere in the filter/agg path.

Geohash cells are the standard base-32 interleaved encoding
(lon bit first), computed ENTIRELY in codegen: the morton interleave
is statically unrolled per precision (5p bits, p <= 9 keeps the cell
id under 45 bits) and the base-32 characters come from element_at
over a literal alphabet array — a 10^12-row corpus geohashes without
a Python worker in the plan.

Plan shapes:
- ``geo_distance_search_index``: the gated BM25 match relation
  (``funcscore.match_scores``) joins the doc-values sidecar once,
  filters ``haversine <= distance``, and ranks through the engine's
  deterministic top-k — the ES bool {must: match, filter:
  geo_distance} request. Candidate rows = the match set, never the
  corpus.
- ``geo_bounding_box_filter`` / ``geo_distance_filter``: predicate
  columns over the sidecar (bounding boxes handle dateline-crossing
  boxes with west > east); composable with any match relation.
- ``geo_distance_agg``: ES's geo_distance range agg — one codegen
  distance column + the range agg's CASE bucketing, counts per
  (query, bucket), empty buckets filled per the ES response shape.
- ``geohash_grid_agg``: groupBy the codegen geohash cell, top
  ``size`` cells by (count desc, key asc) — ES's bucket ordering.
- ``geotile_grid_agg``: the same plan over web-mercator "z/x/y" map
  tiles (GeoTileUtils), the key again pure codegen (tan/asinh/floor).
- ``geo_centroid_agg`` / ``geo_bounds_agg``: the ES geo metric aggs —
  exact mean coordinates (sum/count, one IEEE division each) and the
  match set's bounding box, ``wrap_longitude`` solved EXACTLY by the
  largest-longitude-gap rule (one window — strictly stronger than
  ES's positive/negative-cluster heuristic, documented).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "EARTH_RADIUS_M",
    "GEOHASH_ALPHABET",
    "derive_geo_docvalues",
    "haversine_m",
    "haversine_m_py",
    "geo_distance_filter",
    "geo_bounding_box_filter",
    "geo_distance_search_index",
    "geo_distance_sort",
    "geo_distance_agg",
    "geohash_col",
    "geohash_py",
    "geohash_grid_agg",
    "MAX_MERCATOR_LAT",
    "geotile_col",
    "geotile_py",
    "geotile_grid_agg",
    "geo_centroid_agg",
    "geo_bounds_agg",
]

# ES GeoUtils.EARTH_MEAN_RADIUS (meters) — the sphere ES measures
# geo_distance on.
EARTH_RADIUS_M = 6371008.7714150598

GEOHASH_ALPHABET = "0123456789bcdefghjkmnpqrstuvwxyz"


def derive_geo_docvalues(
    docs: DataFrame, id_col: str = "doc_id", key_col: str | None = None
) -> DataFrame:
    """-> (doc_id, lat, lon) sidecar, deterministically derived from
    ``key_col`` (default: the id column rendered as a string) with the
    md5-arithmetic idiom — exactly reproducible in DuckDB (the
    ``operators.encode`` pattern). lat in [-90, 90), lon in [-180,
    180); every value is uint32/2^32 scaled by one IEEE multiply."""
    key = F.col(key_col) if key_col else F.col(id_col).cast("string")

    def fold(salt: str) -> Column:
        h = F.md5(F.concat(key, F.lit(salt)))
        return F.conv(F.substring(h, 1, 8), 16, 10).cast("double") / F.lit(
            float(2**32)
        )

    return docs.select(
        F.col(id_col),
        (fold(":lat") * F.lit(180.0) - F.lit(90.0)).alias("lat"),
        (fold(":lon") * F.lit(360.0) - F.lit(180.0)).alias("lon"),
    )


def haversine_m(lat1, lon1, lat2, lon2) -> Column:
    """Great-circle distance in meters (haversine on the ES mean-radius
    sphere) as a pure codegen column. Arguments: Columns or numeric
    literals (degrees)."""

    def c(x):
        return x if isinstance(x, Column) else F.lit(float(x))

    la1, lo1, la2, lo2 = (F.radians(c(x)) for x in (lat1, lon1, lat2, lon2))
    dlat, dlon = la2 - la1, lo2 - lo1
    a = F.pow(F.sin(dlat / 2), 2) + F.cos(la1) * F.cos(la2) * F.pow(
        F.sin(dlon / 2), 2
    )
    # clamp against rounding: a can exceed 1 by one ulp at antipodes
    return F.lit(2.0 * EARTH_RADIUS_M) * F.asin(F.sqrt(F.least(a, F.lit(1.0))))


def haversine_m_py(lat1: float, lon1: float, lat2: float, lon2: float) -> float:
    """Driver-side twin of ``haversine_m`` (same formula, same
    radius) for tests and small computations."""
    la1, lo1, la2, lo2 = map(math.radians, (lat1, lon1, lat2, lon2))
    a = (
        math.sin((la2 - la1) / 2) ** 2
        + math.cos(la1) * math.cos(la2) * math.sin((lo2 - lo1) / 2) ** 2
    )
    return 2.0 * EARTH_RADIUS_M * math.asin(math.sqrt(min(a, 1.0)))


def geo_distance_filter(
    origin: tuple, distance_m: float, lat_col="lat", lon_col="lon"
) -> Column:
    """Predicate: within ``distance_m`` meters of ``origin``
    (lat, lon) — the ES geo_distance query as a filter column."""
    if distance_m <= 0:
        raise ValueError(f"distance_m must be > 0, got {distance_m}")
    olat, olon = origin
    _check_point(olat, olon)
    return haversine_m(F.col(lat_col), F.col(lon_col), olat, olon) <= F.lit(
        float(distance_m)
    )


def geo_bounding_box_filter(
    top_left: tuple, bottom_right: tuple, lat_col="lat", lon_col="lon"
) -> Column:
    """Predicate: inside the box — the ES geo_bounding_box query.
    ``top_left`` = (north_lat, west_lon), ``bottom_right`` =
    (south_lat, east_lon); west > east means the box crosses the
    antimeridian (the ES contract) and the longitude test wraps."""
    north, west = top_left
    south, east = bottom_right
    _check_point(north, west)
    _check_point(south, east)
    if south > north:
        raise ValueError(
            f"bounding box south {south} > north {north} (top_left is the "
            "north-west corner)"
        )
    lat_ok = (F.col(lat_col) >= F.lit(float(south))) & (
        F.col(lat_col) <= F.lit(float(north))
    )
    if west <= east:
        lon_ok = (F.col(lon_col) >= F.lit(float(west))) & (
            F.col(lon_col) <= F.lit(float(east))
        )
    else:  # dateline-crossing box
        lon_ok = (F.col(lon_col) >= F.lit(float(west))) | (
            F.col(lon_col) <= F.lit(float(east))
        )
    return lat_ok & lon_ok


def _check_point(lat: float, lon: float) -> None:
    if not (-90.0 <= lat <= 90.0):
        raise ValueError(f"latitude out of range: {lat}")
    if not (-180.0 <= lon <= 180.0):
        raise ValueError(f"longitude out of range: {lon}")


def geo_distance_search_index(
    spark: SparkSession,
    postings: DataFrame,
    meta,
    queries,
    docvalues: DataFrame,
    origin: tuple,
    distance_m: float,
    k: int = 10,
    term_stats: DataFrame | dict | None = None,
    broadcast_filter: bool = True,
) -> DataFrame:
    """BM25 match restricted to docs within ``distance_m`` of
    ``origin`` -> (qid, doc_id, score, rank) — the ES bool
    {must: match, filter: geo_distance} request. ``docvalues``:
    (doc_id, lat, lon). One match-scores plan + one doc_id-keyed
    sidecar join + codegen haversine; the filter never widens the
    match set and scores are untouched (ES filter context).

    ``broadcast_filter=True`` (default) broadcasts the filtered doc-id
    set into the scored-set join: the planner cannot estimate the
    post-haversine cardinality and falls back to shuffling the FULL
    scored match set by doc_id (measured ~6s of a ~12s row at sf0.1,
    r6). A geo circle is the selective side of the request by
    construction; pass False for radii known to capture an
    unbroadcastable share of the corpus (the boolquery
    ``broadcast_queries`` convention)."""
    from sgpt_spark.operators.funcscore import match_scores
    from sgpt_spark.operators.topk import topk_per_group

    # pinned relational: this consumer immediately semi-joins the FULL
    # scored set against the geo predicate in the JVM — the kernel
    # spelling would pay Arrow emission of every hit row only to hand
    # them back to a relational join (A/B'd ~25% slower, r6)
    scored = match_scores(
        spark, postings, meta, queries, term_stats=term_stats,
        strategy="relational",
    )
    pred = geo_distance_filter(origin, distance_m)
    near = docvalues.select("doc_id").filter(pred)
    if broadcast_filter:
        near = F.broadcast(near)
    filtered = scored.join(near, "doc_id", "inner")
    return topk_per_group(filtered, k=k).select("qid", "doc_id", "score", "rank")


def geo_distance_sort(
    hits: DataFrame,
    docvalues: DataFrame,
    origin: tuple,
    ascending: bool = True,
) -> DataFrame:
    """Re-rank a hits relation (qid, doc_id, ...) by distance to
    ``origin`` — the ES _geo_distance sort. Adds ``distance_m`` and
    re-derives ``rank`` (distance, doc_id asc tie-break)."""
    from pyspark.sql import Window

    olat, olon = origin
    _check_point(olat, olon)
    with_d = hits.drop("rank").join(
        docvalues.select(
            "doc_id",
            haversine_m(F.col("lat"), F.col("lon"), olat, olon).alias(
                "distance_m"
            ),
        ),
        "doc_id",
        "left",
    )
    order = (
        [F.col("distance_m").asc_nulls_last(), F.col("doc_id").asc()]
        if ascending
        else [F.col("distance_m").desc_nulls_last(), F.col("doc_id").asc()]
    )
    w = Window.partitionBy("qid").orderBy(*order)
    return with_d.withColumn("rank", F.row_number().over(w))


def geo_distance_agg(
    hits: DataFrame,
    docvalues: DataFrame,
    origin: tuple,
    ranges: list,
) -> DataFrame:
    """ES geo_distance range aggregation over a match relation
    (qid, doc_id, ...) -> (qid, bucket, from_m, to_m, doc_count).
    ``ranges``: (from_m | None, to_m | None) pairs, ES semantics
    [from, to); every requested bucket appears for every qid (empty
    buckets at 0 — the ES response shape)."""
    if not ranges:
        raise ValueError("geo_distance_agg needs at least one range")
    olat, olon = origin
    _check_point(olat, olon)
    dist = haversine_m(F.col("lat"), F.col("lon"), olat, olon)
    with_d = hits.select("qid", "doc_id").join(
        docvalues.select("doc_id", dist.alias("_d")), "doc_id", "inner"
    )
    counts = []
    for i, (fr, to) in enumerate(ranges):
        cond = F.lit(True)
        if fr is not None:
            cond = cond & (F.col("_d") >= F.lit(float(fr)))
        if to is not None:
            cond = cond & (F.col("_d") < F.lit(float(to)))
        counts.append(
            F.sum(F.when(cond, F.lit(1)).otherwise(F.lit(0))).alias(f"_b{i}")
        )
    agg = with_d.groupBy("qid").agg(*counts)
    rows = []
    for i, (fr, to) in enumerate(ranges):
        label = f"{'*' if fr is None else float(fr)}-{'*' if to is None else float(to)}"
        rows.append(
            F.struct(
                F.lit(label).alias("bucket"),
                F.lit(None if fr is None else float(fr))
                .cast("double")
                .alias("from_m"),
                F.lit(None if to is None else float(to))
                .cast("double")
                .alias("to_m"),
                F.col(f"_b{i}").cast("long").alias("doc_count"),
            )
        )
    return (
        agg.select("qid", F.explode(F.array(*rows)).alias("r"))
        .select("qid", "r.bucket", "r.from_m", "r.to_m", "r.doc_count")
    )


def geohash_col(lat_col, lon_col, precision: int) -> Column:
    """Standard base-32 geohash of (lat, lon) at ``precision`` chars,
    entirely in codegen: the 5p-bit morton interleave (lon bit first)
    statically unrolled, characters via element_at over the literal
    alphabet. ``precision`` <= 9 keeps the cell id under 45 bits."""
    if not (1 <= precision <= 9):
        raise ValueError(f"geohash precision must be 1..9, got {precision}")
    total_bits = 5 * precision
    lon_bits = (total_bits + 1) // 2
    lat_bits = total_bits // 2
    # quantized cell indexes; least() guards the exact +90/+180 edge
    lat_q = F.least(
        F.floor((lat_col + F.lit(90.0)) / F.lit(180.0) * F.lit(float(2**lat_bits))),
        F.lit(2**lat_bits - 1),
    ).cast("long")
    lon_q = F.least(
        F.floor((lon_col + F.lit(180.0)) / F.lit(360.0) * F.lit(float(2**lon_bits))),
        F.lit(2**lon_bits - 1),
    ).cast("long")
    # morton interleave: bit j of lon lands at output bit (from the
    # top) 2j, bit j of lat at 2j+1 — statically unrolled
    code = F.lit(0).cast("long")
    for j in range(lon_bits):
        out_pos = total_bits - 1 - 2 * j
        code = code + F.shiftleft(
            F.shiftright(lon_q, lon_bits - 1 - j).bitwiseAND(F.lit(1)), out_pos
        )
    for j in range(lat_bits):
        out_pos = total_bits - 1 - (2 * j + 1)
        code = code + F.shiftleft(
            F.shiftright(lat_q, lat_bits - 1 - j).bitwiseAND(F.lit(1)), out_pos
        )
    alphabet = F.lit(GEOHASH_ALPHABET)
    chars = [
        F.substring(
            alphabet,
            F.shiftright(code, 5 * (precision - 1 - i))
            .bitwiseAND(F.lit(31))
            .cast("int")
            + F.lit(1),
            1,
        )
        for i in range(precision)
    ]
    return F.concat(*chars)


def geohash_py(lat: float, lon: float, precision: int) -> str:
    """Textbook bisection geohash — the independent driver-side twin
    ``geohash_col`` is tested against."""
    lat_lo, lat_hi = -90.0, 90.0
    lon_lo, lon_hi = -180.0, 180.0
    bits, ch, out = 0, 0, []
    even = True  # lon bit first
    while len(out) < precision:
        if even:
            mid = (lon_lo + lon_hi) / 2
            if lon >= mid:
                ch = ch * 2 + 1
                lon_lo = mid
            else:
                ch = ch * 2
                lon_hi = mid
        else:
            mid = (lat_lo + lat_hi) / 2
            if lat >= mid:
                ch = ch * 2 + 1
                lat_lo = mid
            else:
                ch = ch * 2
                lat_hi = mid
        even = not even
        bits += 1
        if bits == 5:
            out.append(GEOHASH_ALPHABET[ch])
            bits, ch = 0, 0
    return "".join(out)


def geohash_grid_agg(
    hits: DataFrame,
    docvalues: DataFrame,
    precision: int = 5,
    size: int = 10,
) -> DataFrame:
    """ES geohash_grid aggregation over a match relation (qid, doc_id,
    ...) -> (qid, geohash, doc_count): per query, the top ``size``
    geohash cells by (doc_count desc, geohash asc) — ES's bucket
    ordering, made deterministic by the key tie-break. One codegen
    geohash column + one map-side-combinable groupBy + the engine's
    partial/final window cut."""
    from pyspark.sql import Window

    if size < 1:
        raise ValueError(f"size must be >= 1, got {size}")
    cells = hits.select("qid", "doc_id").join(
        docvalues.select(
            "doc_id",
            geohash_col(F.col("lat"), F.col("lon"), precision).alias("geohash"),
        ),
        "doc_id",
        "inner",
    )
    counts = cells.groupBy("qid", "geohash").agg(
        F.count(F.lit(1)).alias("doc_count")
    )
    w = Window.partitionBy("qid").orderBy(
        F.col("doc_count").desc(), F.col("geohash").asc()
    )
    return (
        counts.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= size)
        .drop("_r")
    )


# ---- geotile_grid / geo_bounds / geo_centroid -------------------------------

# Web-mercator latitude bound: atan(sinh(pi)) in degrees. ES
# GeoTileUtils clamps latitudes beyond it into the edge tiles.
MAX_MERCATOR_LAT = 85.0511287798066


def geotile_col(lat_col, lon_col, precision: int) -> Column:
    """ES ``geotile_grid`` cell key "z/x/y" (standard web-mercator map
    tiles, GeoTileUtils.longitudeToX/latitudeToY) as a pure codegen
    column:

        x = floor((lon + 180) / 360 * 2^z)
        y = floor((1 - asinh(tan(lat_rad)) / pi) / 2 * 2^z)

    with lat clamped to the mercator bound (+-85.05112878...) and both
    indexes clamped into [0, 2^z - 1] — the ES edge-tile behavior.
    ``precision`` (zoom) 0..29, the ES range; the arithmetic is
    tan/asinh/floor, no UDF anywhere."""
    if not (0 <= precision <= 29):
        raise ValueError(f"geotile precision must be 0..29, got {precision}")
    tiles = float(2**precision)
    hi = 2**precision - 1
    x = F.least(
        F.greatest(
            F.floor((lon_col + F.lit(180.0)) / F.lit(360.0) * F.lit(tiles)),
            F.lit(0),
        ),
        F.lit(hi),
    ).cast("long")
    lat = F.least(
        F.greatest(lat_col, F.lit(-MAX_MERCATOR_LAT)), F.lit(MAX_MERCATOR_LAT)
    )
    y = F.least(
        F.greatest(
            F.floor(
                (F.lit(1.0) - F.asinh(F.tan(F.radians(lat))) / F.lit(math.pi))
                / F.lit(2.0)
                * F.lit(tiles)
            ),
            F.lit(0),
        ),
        F.lit(hi),
    ).cast("long")
    return F.concat_ws("/", F.lit(str(precision)), x.cast("string"), y.cast("string"))


def geotile_py(lat: float, lon: float, precision: int) -> str:
    """Driver-side twin of ``geotile_col`` — the textbook slippy-map
    tile formula, written independently (math.log form of asinh)."""
    tiles = 2**precision
    x = min(max(math.floor((lon + 180.0) / 360.0 * tiles), 0), tiles - 1)
    lat = min(max(lat, -MAX_MERCATOR_LAT), MAX_MERCATOR_LAT)
    lat_rad = math.radians(lat)
    t = math.tan(lat_rad)
    y_raw = (1.0 - math.log(t + math.sqrt(t * t + 1.0)) / math.pi) / 2.0 * tiles
    y = min(max(math.floor(y_raw), 0), tiles - 1)
    return f"{precision}/{x}/{y}"


def geotile_grid_agg(
    hits: DataFrame,
    docvalues: DataFrame,
    precision: int = 7,
    size: int = 10,
) -> DataFrame:
    """ES geotile_grid aggregation over a match relation (qid, doc_id,
    ...) -> (qid, geotile, doc_count): per query, the top ``size``
    web-mercator tiles by (doc_count desc, key asc) — the geohash_grid
    plan with the tile key swapped in (one codegen key column + one
    map-side-combinable groupBy + the partial/final window cut)."""
    from pyspark.sql import Window

    if size < 1:
        raise ValueError(f"size must be >= 1, got {size}")
    cells = hits.select("qid", "doc_id").join(
        docvalues.select(
            "doc_id",
            geotile_col(F.col("lat"), F.col("lon"), precision).alias("geotile"),
        ),
        "doc_id",
        "inner",
    )
    counts = cells.groupBy("qid", "geotile").agg(
        F.count(F.lit(1)).alias("doc_count")
    )
    w = Window.partitionBy("qid").orderBy(
        F.col("doc_count").desc(), F.col("geotile").asc()
    )
    return (
        counts.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= size)
        .drop("_r")
    )


def geo_centroid_agg(hits: DataFrame, docvalues: DataFrame) -> DataFrame:
    """ES geo_centroid metric aggregation over a match relation ->
    (qid, lat, lon, count): the arithmetic mean of the match set's
    coordinates, each mean spelled sum/count (two aggregates, one IEEE
    division — the engine's exact-avg idiom). Documented divergence:
    ES averages the QUANTIZED doc-values coordinates (its lat/lon are
    stored as int32 cells); this engine averages the exact doubles."""
    joined = hits.select("qid", "doc_id").join(
        docvalues.select("doc_id", "lat", "lon"), "doc_id", "inner"
    )
    return joined.groupBy("qid").agg(
        (F.sum("lat") / F.count(F.lit(1))).alias("lat"),
        (F.sum("lon") / F.count(F.lit(1))).alias("lon"),
        F.count(F.lit(1)).alias("count"),
    )


def geo_bounds_agg(
    hits: DataFrame, docvalues: DataFrame, wrap_longitude: bool = True
) -> DataFrame:
    """ES geo_bounds metric aggregation over a match relation ->
    (qid, top, bottom, left, right): the bounding box of each query's
    match set. top/bottom are max/min latitude. With
    ``wrap_longitude=False``, left/right are min/max longitude. With
    ``wrap_longitude=True`` (the ES default) the box may cross the
    dateline (left > right signals the wrap, the ES response
    convention): the engine finds the TRUE minimal-width box by the
    largest-gap rule — sort each query's distinct longitudes, measure
    every consecutive gap plus the wrap-around gap, and exclude the
    largest one (ties: the westernmost such gap). Documented
    divergence, strictly stronger: ES's heuristic only considers
    splitting between its positive and negative longitude clusters, so
    it can report a wider box than necessary; the largest-gap box is
    minimal. One window over the distinct longitudes + one groupBy —
    no collect, no UDF."""
    from pyspark.sql import Window

    joined = hits.select("qid", "doc_id").join(
        docvalues.select("doc_id", "lat", "lon"), "doc_id", "inner"
    )
    lat_bounds = joined.groupBy("qid").agg(
        F.max("lat").alias("top"), F.min("lat").alias("bottom")
    )
    if not wrap_longitude:
        lon_bounds = joined.groupBy("qid").agg(
            F.min("lon").alias("left"), F.max("lon").alias("right")
        )
        return lat_bounds.join(lon_bounds, "qid")
    lons = joined.select("qid", "lon").distinct()
    w_ord = Window.partitionBy("qid").orderBy(F.col("lon").asc())
    # gap east of each longitude; the easternmost wraps to the first
    gapped = lons.select(
        "qid",
        "lon",
        F.coalesce(
            F.lead("lon").over(w_ord),
            F.first("lon").over(
                w_ord.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
            )
            + F.lit(360.0),
        ).alias("_nxt"),
    ).withColumn("_gap", F.col("_nxt") - F.col("lon"))
    w_pick = Window.partitionBy("qid").orderBy(
        F.col("_gap").desc(), F.col("lon").asc()
    )
    picked = (
        gapped.withColumn("_r", F.row_number().over(w_pick))
        .filter(F.col("_r") == 1)
        .select(
            "qid",
            # the box spans from the longitude AFTER the excluded gap
            # (wrapped back into [-180, 180)) eastward to the one before
            F.when(F.col("_nxt") >= F.lit(180.0), F.col("_nxt") - F.lit(360.0))
            .otherwise(F.col("_nxt"))
            .alias("left"),
            F.col("lon").alias("right"),
        )
    )
    return lat_bounds.join(picked, "qid")
