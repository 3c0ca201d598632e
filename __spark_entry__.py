"""Driver contract for the eodal_spark engine.

``entry(spark)`` — flagship pipeline (geocode → broadcast spatial join →
zonal stats) on a synthesized pages table.

``queries()`` — one entry per implemented operator family from
SURVEY.md §2.  Pages-table queries synthesize their input
deterministically (FIXTURES.md §1) via ``spark.range`` column
arithmetic; the DuckDB oracle reproduces the identical table via
`sql_pages_subquery` — bit-identical integer/decimal math end to end,
so the value-hash gate is exact, not approximate.

``oracle_sql()`` — DuckDB SQL per query; EVERY query is gated,
including the four probabilistic operators (MinHash LSH, SimHash,
SRP ANN, IVF ANN), whose outputs are deterministic given their seeds
and have exact relational definitions the oracle computes directly
(see the "probabilistic operators" section for the guarantees).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from eodal_spark import geometry, grid
from eodal_spark.operators import asof as ASOF
from eodal_spark.operators import bpe as BPE
from eodal_spark.operators import dedup as D
from eodal_spark.operators import exact_substr as ES
from eodal_spark.operators import export as EX
from eodal_spark.operators import focal as FO
from eodal_spark.operators import graph as GR
from eodal_spark.operators import knn as K
from eodal_spark.operators import lm as LM
from eodal_spark.operators import multimodal as MM
from eodal_spark.operators import resample as RS
from eodal_spark.operators import retrieval as RET
from eodal_spark.operators import similarity as SIM
from eodal_spark.operators import spatial_join as SJ
from eodal_spark.operators import text as TX
from eodal_spark.operators import tiling as TIL
from eodal_spark.operators import timeseries as TS
from eodal_spark.operators import zonal as Z
from eodal_spark.sources import pages as P
from eodal_spark.sources import sensors as SN
from eodal_spark.sources import warc as WARC

# ---------------------------------------------------------------------------
# Fixed configuration shared by the Spark queries and the DuckDB oracles
# ---------------------------------------------------------------------------

N_PAGES = 20_000      # correctness-scale pages table (fixed for oracles)
RES = 12              # page cell resolution
JOIN_RES = 8          # spatial-join covering resolution
TILE_RES = 5          # mosaic tile resolution
BUCKET = TIL.DEFAULT_BUCKET_SECONDS

# convex polygon layer over the pages extent (FIXTURES.md §2 analogue)
PAGE_POLYS = [
    (1, [(7.0, 45.0), (10.0, 45.0), (10.0, 49.0), (7.0, 49.0)]),          # Zürich box
    (2, [(-75.5, 39.0), (-72.5, 39.5), (-74.0, 42.5)]),                   # NYC triangle
    (3, [(138.0, 34.0), (141.5, 34.5), (142.0, 36.5), (139.5, 37.8), (137.5, 36.0)]),
    (4, [(-170.0, -89.0), (-160.0, -89.0), (-160.0, -85.0), (-170.0, -85.0)]),  # empty
]

# real-geometry layer (FIXTURES.md §2: WKB polygon columns, "one
# MultiPolygon"): a holed box over the Zürich cluster and a 2-part
# MultiPolygon covering the NYC + Japan clusters — parsed from WKT,
# exact-rule membership is even-odd over all rings
HOLED_POLYS = [
    (1, "POLYGON ((6.5 44.5, 10.5 44.5, 10.5 49.5, 6.5 49.5, 6.5 44.5), "
        "(8.0 46.0, 9.5 46.0, 9.5 48.0, 8.0 48.0, 8.0 46.0))"),
    (2, "MULTIPOLYGON (((-75.5 39.0, -72.5 39.5, -74.0 42.5, -75.5 39.0)), "
        "((138.0 34.0, 142.0 34.5, 140.0 37.8, 138.0 34.0)))"),
]

KNN_QUERIES = [  # (query_id, lat_centi, lon_centi)
    (1, 13737, 18854),
    (2, 13070, 10600),
    (3, 9000, 18000),
    (4, 500, 100),
    (5, 12570, 31970),
    (6, 9000, 35995),  # lon ≈ +179.95: nearest pages wrap across ±180°
]

SAMPLE_POINTS = [  # (id, lon, lat) — point sampling at JOIN_RES
    (1, 8.54, 47.37),
    (2, -74.0, 40.7),
    (3, 139.7, 35.7),
    (4, 0.01, -89.99),   # dead zone → NULL url
    (5, 0.0, 30.0),
]


def _pages_geo(spark: SparkSession, n: int = N_PAGES) -> DataFrame:
    return P.geocode(P.synth_pages(spark, n), RES)


def _polys_spark(spark: SparkSession) -> DataFrame:
    return geometry.polygons_df(spark, PAGE_POLYS)


def _ccw(ring):
    # the engine's own normalization — ONE code path, so the convex
    # oracle's arrays can never drift from polygons_df's
    xs, ys = geometry._clean_ring(ring)
    return xs.tolist(), ys.tolist()


def _polys_duck() -> str:
    """The same polygon layer as a DuckDB inline relation (CCW rings)."""
    rows = []
    for pid, ring in PAGE_POLYS:
        xs, ys = _ccw(ring)
        xs_sql = "CAST(" + str([float(v) for v in xs]) + " AS DOUBLE[])"
        ys_sql = "CAST(" + str([float(v) for v in ys]) + " AS DOUBLE[])"
        rows.append(f"({pid}, {xs_sql}, {ys_sql})")
    return "(VALUES " + ", ".join(rows) + ") AS polys(poly_id, xs, ys)"


def _duck_pages() -> str:
    return P.sql_pages_subquery(N_PAGES, "duckdb")


def _buffered_oracle() -> str:
    """spatial_join_buffered as DuckDB SQL: a page is in the buffered
    covering iff SOME cell within Chebyshev distance BUFFER_K of its
    join cell (x wrapped, y clamped — mirroring `grid.cell_ring`) has
    its centroid inside the polygon.  Same integer cell math and float
    centroid op order as the engine's covering."""
    n = 1 << JOIN_RES
    k = BUFFER_K
    x = f"(lon_centi * {n} // 36000)"
    y = f"(lat_centi * {n} // 18000)"
    xw = f"((({x} + dx) % {n} + {n}) % {n})"
    clon = f"(({xw} + 0.5) / {n} * 360.0 - 180.0)"
    clat = f"((({y} + dy) + 0.5) / {n} * 180.0 - 90.0)"
    hit = (
        f"CASE WHEN ({y} + dy) >= 0 AND ({y} + dy) < {n} "
        f"AND {_duck_pip(clon, clat)} THEN 1 ELSE 0 END"
    )
    any_hit = (
        f"len(list_filter(flatten(list_transform(generate_series(-{k}, {k}), dx -> "
        f"list_transform(generate_series(-{k}, {k}), dy -> {hit}))), v -> v = 1)) > 0"
    )
    return f"""
        SELECT polys.poly_id, p.url
        FROM {_duck_pages()} p, {_polys_duck()}
        WHERE {any_hit}
    """


def _duck_cell(res: int) -> str:
    return grid.sql_cell_encode_centi("lon_centi", "lat_centi", res, "duckdb")


def _duck_centroid(res: int) -> tuple[str, str]:
    """Centroid lon/lat SQL from centi-degrees at ``res`` — the exact
    float op order of `geometry.polygon_cover_cells`."""
    n = 1 << res
    x = f"(lon_centi * {n} // 36000)"
    y = f"(lat_centi * {n} // 18000)"
    clon = f"(({x} + 0.5) / {n} * 360.0 - 180.0)"
    clat = f"(({y} + 0.5) / {n} * 180.0 - 90.0)"
    return clon, clat


def _duck_pip(px: str, py: str) -> str:
    return geometry.sql_pip_convex(px, py, "polys.xs", "polys.ys", "duckdb")


def _holed_polys_duck() -> str:
    """HOLED_POLYS as a DuckDB inline relation with DOUBLE[][] ring
    columns — the *same normalized ring arrays* (CCW, closing vertex
    stripped) the engine stores, so the even-odd crossing arithmetic is
    bit-identical on both sides."""
    rows = []
    for pid, wkt in HOLED_POLYS:
        rings_x, rings_y = [], []
        for part in geometry._as_parts(wkt):
            for ring in part:
                xs, ys = geometry._clean_ring(ring)
                rings_x.append(xs.tolist())
                rings_y.append(ys.tolist())
        rows.append(
            f"({pid}, CAST({rings_x} AS DOUBLE[][]), "
            f"CAST({rings_y} AS DOUBLE[][]))"
        )
    return "(VALUES " + ", ".join(rows) + ") AS polys(poly_id, rings_x, rings_y)"


# ---------------------------------------------------------------------------
# entry
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: geocode pages → broadcast spatial join → zonal stats
    (the SURVEY.md §7.1-step-3 end-to-end slice)."""
    geo = _pages_geo(spark, 5_000).withColumn("n_chars", F.length("text"))
    polys = _polys_spark(spark)
    joined = SJ.spatial_join(
        geo, polys, JOIN_RES, rule="centroid", page_cols=("url", "n_chars"),
        page_res=RES,
    )
    return Z.zonal_stats(joined, "n_chars")


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------

def _q_tile_assignment(spark, sf_dir):
    tiled = TIL.assign_tiles(_pages_geo(spark), RES, TILE_RES)
    return tiled.select("url", "tile_cell", "ts_bucket")


def _q_cell_encode(spark, sf_dir):
    return _pages_geo(spark).select("url", "cell_id", "lat_centi", "lon_centi")


def _q_text_extraction(spark, sf_dir):
    df = P.synth_pages(spark, N_PAGES)
    return df.select(
        "url", F.sha2(P.extract_text(F.col("html")), 256).alias("text_sha")
    )


def _q_warc_roundtrip(spark, sf_dir):
    """WARC ingestion end-to-end (the Common-Crawl upstream of the
    pages table): synth pages → executor-side WARC sink (per-record
    gzip members, CC layout) → distributed WARC scan → canonical pages
    relation.  The gate proves BYTE-identical html through the archive
    round-trip — md5(html) per url vs the DuckDB generator oracle —
    which is the input_hint invariant extended to the external format.
    """
    import tempfile

    fix_dir = os.path.join(
        tempfile.gettempdir(), f"eodal_spark_warc_{N_PAGES}"
    )
    if not os.path.exists(os.path.join(fix_dir, "_SUCCESS")):
        src = (
            P.synth_pages(spark, N_PAGES)
            .repartitionByRange(8, "url")
            .sortWithinPartitions("url")
        )
        WARC.write_warc(src, fix_dir, gzip_records=True).collect()
        open(os.path.join(fix_dir, "_SUCCESS"), "w").close()
    df = WARC.pages_from_warc(spark, fix_dir)
    return df.select(
        "url",
        F.unix_timestamp("warc_ts").alias("ts_sec"),
        F.md5("html").alias("html_md5"),
        "text",
        "lang",
    )


def _q_spatial_join_centroid(spark, sf_dir):
    return SJ.spatial_join(
        _pages_geo(spark), _polys_spark(spark), JOIN_RES, rule="centroid",
        page_res=RES,
    ).select("poly_id", "url")


def _q_spatial_join_exact(spark, sf_dir):
    return SJ.spatial_join(
        _pages_geo(spark), _polys_spark(spark), JOIN_RES, rule="exact",
        page_res=RES,
    ).select("poly_id", "url")


def _q_spatial_join_biglayer(spark, sf_dir):
    """The big-layer SHUFFLE spatial join: ``broadcast_layer=False`` is
    the plan the engine picks when the polygon layer is too large to
    broadcast (10⁸ parcels) — pages and cover co-partition on the cell
    key in a shuffle join instead of a broadcast-hash join.  Same
    exact-rule semantics and the same DuckDB oracle as
    ``spatial_join_exact``, so the driver row proves the non-broadcast
    plan's ANSWERS, not just its local parity/plan tests."""
    return SJ.spatial_join(
        _pages_geo(spark), _polys_spark(spark), JOIN_RES, rule="exact",
        page_res=RES, broadcast_layer=False,
    ).select("poly_id", "url")


def _q_spatial_join_holes(spark, sf_dir):
    """Exact join against a holed polygon + a MultiPolygon (WKT-parsed):
    pages in the hole must NOT match; either part of the multi matches.
    Refinement is the native even-odd parity expression — zero Python."""
    polys = geometry.polygons_df(spark, HOLED_POLYS)
    return SJ.spatial_join(
        _pages_geo(spark), polys, JOIN_RES, rule="exact", page_res=RES,
    ).select("poly_id", "url")


BUFFER_K = 2  # cell rings for the buffered join (≡ AOI padding)


def _q_spatial_join_buffered(spark, sf_dir):
    """Pages within BUFFER_K cells of a polygon (centroid rule): the
    covering is buffered via `geometry.buffer_cells` (grid Minkowski
    sum) and broadcast — the within-distance join shape."""
    geo = _pages_geo(spark)
    polys = _polys_spark(spark)
    cover = geometry.polygon_cover_cells(polys, JOIN_RES, mode="centroid")
    buf = geometry.buffer_cells(cover.select("poly_id", "cell_id"), BUFFER_K, JOIN_RES)
    pages = geo.withColumn(
        "_join_cell", grid.cell_parent("cell_id", RES, JOIN_RES)
    )
    return pages.join(
        F.broadcast(buf.withColumnRenamed("cell_id", "_join_cell")), "_join_cell"
    ).select("poly_id", "url")


def _q_polygon_overlay(spark, sf_dir):
    """Polygon × polygon overlay — the vector-overlay analogue of the
    raster mosaic path (clip composed twice, ref `eodal/core/raster.py`
    clip + `band.py:1058-1072` rasterize): the convex layer against the
    holed/multipart WKT layer at JOIN_RES.  ``cells`` is the exact
    integer intersection measure (count of cover cells whose centroid
    lies in BOTH polygons) — deterministic, hence hash-gateable where a
    float area would not be.  Disjoint pairs never appear (the pairing
    is an equi-join on cell_id, never polygon all-pairs)."""
    a = _polys_spark(spark)
    b = geometry.polygons_df(spark, HOLED_POLYS)
    return SJ.polygon_overlay(a, b, JOIN_RES, mode="centroid")


def _q_areal_interpolate(spark, sf_dir):
    """Areal interpolation: per-polygon quantities on the convex layer
    (deterministic ``poly_id * 1000 + 37``) re-apportioned onto the
    holed/multipart layer by exact shared-cover-cell proportion
    (bigint milli-units — no float drift; see
    `spatial_join.areal_interpolate`)."""
    a = _polys_spark(spark)
    vals = a.select(
        "poly_id", (F.col("poly_id") * 1000 + 37).alias("value")
    )
    b = geometry.polygons_df(spark, HOLED_POLYS)
    return SJ.areal_interpolate(a, vals, b, JOIN_RES)


def _overlay_ctes() -> str:
    """Shared DuckDB CTE prefix for the overlay-family oracles:
    enumerate the full JOIN_RES grid, keep cells whose centroid is
    inside each layer's polygons (convex half-plane test for layer A,
    even-odd ring parity for layer B — the SAME sql_pip_* expressions
    the spatial-join gates already proved bit-identical to the engine's
    covers).  Full-grid enumeration equals the engine's bbox-bounded
    enumeration because a centroid-inside cell is always inside the
    polygon's bbox."""
    n = 1 << JOIN_RES
    clon = f"((g.x + 0.5) / {n} * 360.0 - 180.0)"
    clat = f"((g.y + 0.5) / {n} * 180.0 - 90.0)"
    pip_a = geometry.sql_pip_convex(clon, clat, "polys.xs", "polys.ys", "duckdb")
    pip_b = geometry.sql_pip_even_odd_rings(
        clon, clat, "polys.rings_x", "polys.rings_y", "duckdb"
    )
    return f"""
        WITH g AS (
          SELECT gx.range AS x, gy.range AS y
          FROM range({n}) gx, range({n}) gy
        ),
        a_cells AS (
          SELECT polys.poly_id AS a_id, g.x, g.y
          FROM g, {_polys_duck()} WHERE {pip_a}
        ),
        b_cells AS (
          SELECT polys.poly_id AS b_id, g.x, g.y
          FROM g, {_holed_polys_duck()} WHERE {pip_b}
        )
    """


def _overlay_oracle() -> str:
    """polygon_overlay as DuckDB SQL — join the two layers' cell sets
    and count per pair."""
    return f"""
        {_overlay_ctes()}
        SELECT a_id, b_id, count(*) AS cells
        FROM a_cells JOIN b_cells USING (x, y)
        GROUP BY a_id, b_id
    """


def _areal_oracle() -> str:
    """areal_interpolate as DuckDB SQL — the same bigint floor
    apportionment: value_a * shared_cells * 1000 // total_cells_a,
    summed per target."""
    return f"""
        {_overlay_ctes()},
        tot AS (SELECT a_id, count(*) AS a_cells FROM a_cells GROUP BY a_id),
        ov AS (
          SELECT a_id, b_id, count(*) AS cells
          FROM a_cells JOIN b_cells USING (x, y)
          GROUP BY a_id, b_id
        )
        SELECT b_id,
               CAST(sum((a_id * 1000 + 37) * cells * 1000 // a_cells)
                    AS BIGINT) AS value_scaled
        FROM ov JOIN tot USING (a_id)
        GROUP BY b_id
    """


def _q_zonal_stats(spark, sf_dir):
    geo = _pages_geo(spark).withColumn("n_chars", F.length("text"))
    joined = SJ.spatial_join(
        geo, _polys_spark(spark), JOIN_RES, rule="centroid",
        page_cols=("url", "n_chars"), page_res=RES,
    )
    return joined.groupBy("poly_id").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
        F.sum("n_chars").alias("sum_chars"),
        F.expr("sum(n_chars) * 1000 div count(*)").alias("avg_chars_milli"),
        F.median("n_chars").alias("median_chars"),
    )


def _q_mosaic_dedup(spark, sf_dir):
    tiled = TIL.assign_tiles(_pages_geo(spark), RES, TILE_RES)
    return TIL.mosaic_dedup(tiled).select("cell_id", "ts_bucket", "url")


def _q_duplicate_split(spark, sf_dir):
    """Duplicated-vs-unique split (≡ `mapper.py:565-570`): every row
    tagged with its (cell, bucket) multiplicity."""
    tiled = TIL.assign_tiles(_pages_geo(spark), RES, TILE_RES)
    return TIL.duplicate_split(tiled).select("url", "cell_id", "ts_bucket", "n_dup")


def _q_tile_histogram(spark, sf_dir):
    tiled = TIL.assign_tiles(_pages_geo(spark), RES, TILE_RES)
    return tiled.groupBy("tile_cell", "ts_bucket").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("cell_id").alias("n_cells"),
    )


def _q_knn(spark, sf_dir):
    q = spark.createDataFrame(KNN_QUERIES, ["query_id", "lat_centi", "lon_centi"])
    return K.knn(q, _pages_geo(spark), RES, k=5)


def _q_knn_join(spark, sf_dir):
    """Grid-bounded kNN JOIN (layer × layer, both sides large): a
    deterministic ~1% hash-sample of the pages layer probes the FULL
    layer for its 3 nearest pages within a 2-cell Chebyshev disk at
    JOIN_RES — one static relational plan, no broadcast, no per-query
    escalation (that is `knn`'s job for small query sets).  Oracle
    reproduces the identical disk bound and wrapped metric."""
    geo = _pages_geo(spark)
    probes = TX.hash_sample(geo, "url", 10).select(
        F.col("url").alias("query_id"), "lat_centi", "lon_centi"
    )
    return K.knn_join(probes, geo, JOIN_RES, k=3, radius=2)


def _q_temporal_composite(spark, sf_dir):
    """Per-cell temporal composite (the EO cloud-free-mosaic
    reduction): every (res-6 cell, time bucket) collapses its
    observation stack to {count, min, max, exact median, integer
    mean} over the page-length band."""
    geo = _pages_geo(spark)
    df = geo.select(
        grid.cell_parent("cell_id", RES, 6).alias("cell6"),
        F.unix_timestamp("warc_ts").alias("ts_sec"),
        F.length("text").alias("n_chars"),
    )
    return TS.temporal_composite(df, "cell6", "ts_sec", "n_chars", BUCKET)


def _q_stratified_sample(spark, sf_dir):
    """Per-language deterministic rebalancing (training-data mix):
    en 50% / de 25% / fr 12.5% / it 5%, 1% default tail — one
    codegen'd map lookup + the md5-bucket filter, reproduced exactly
    by the oracle's CASE."""
    pages = P.synth_pages(spark, N_PAGES)
    return TX.stratified_hash_sample(
        pages.select("url", "lang"),
        "url",
        "lang",
        {"en": 500, "de": 250, "fr": 125, "it": 50},
        default_milli=10,
        key_out="bucket",
    )


def _q_focal_mean(spark, sf_dir):
    """Box-kernel focal statistics over the rasterized page-count
    band: pages → per-cell counts at res 6, then every cell within
    Chebyshev distance 1 of an occupied cell aggregates its occupied
    neighbours (x wraps, y clamps — `grid.cell_ring` semantics,
    mirrored in the oracle's modular arithmetic)."""
    geo = _pages_geo(spark)
    cells = geo.groupBy(
        grid.cell_parent("cell_id", RES, 6).alias("cell_id")
    ).agg(F.count(F.lit(1)).alias("v"))
    return FO.focal_stats(cells, res=6, radius=1)


def _q_focal_gradient(spark, sf_dir):
    """Horn (1981) gradients over the rasterized page-count band —
    the directional-kernel generalization of `focal_mean` and the
    integer core under `focal.slope_aspect` (terrain slope/aspect).
    gx8/gy8 = 8×∂v/∂(x,y), integer-exact by construction (integer
    Horn weights × integer counts); the float slope/aspect edge on
    top is python-reference-tested in test_focal.  ONE explode over
    the union footprint + ONE shuffle evaluates both kernels
    (plan-asserted); x wraps, y clamps, mirrored by the oracle's
    modular arithmetic and VALUES-table weights."""
    geo = _pages_geo(spark)
    cells = geo.groupBy(
        grid.cell_parent("cell_id", RES, 6).alias("cell_id")
    ).agg(F.count(F.lit(1)).alias("v"))
    return FO.gradient(cells, res=6)


def _q_sample_points(spark, sf_dir):
    pts = spark.createDataFrame(SAMPLE_POINTS, ["id", "lon", "lat"])
    return SJ.sample_points(
        pts, _pages_geo(spark), JOIN_RES, page_res=RES
    ).select("id", "url")


def _q_lang_histogram(spark, sf_dir):
    pages = P.synth_pages(spark, N_PAGES)
    dim = spark.createDataFrame(
        [("en",), ("de",), ("fr",), ("it",), ("zz",)], ["lang"]
    )
    counts = pages.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    out = dim.join(counts, "lang", "left").withColumn(
        "n", F.coalesce(F.col("n"), F.lit(0))
    )
    return out.select(
        "lang", "n", F.expr(f"n * 1000 div {N_PAGES}").alias("share_milli")
    )


def _q_bounds(spark, sf_dir):
    return _pages_geo(spark).agg(
        F.min("lat_centi").alias("min_lat"),
        F.max("lat_centi").alias("max_lat"),
        F.min("lon_centi").alias("min_lon"),
        F.max("lon_centi").alias("max_lon"),
    )


def _q_adaptive_cells(spark, sf_dir):
    geo = _pages_geo(spark)
    coarse = geo.withColumn("cell6", grid.cell_parent("cell_id", RES, 6))
    hist = coarse.groupBy("cell6").agg(F.count(F.lit(1)).alias("n"))
    hot = hist.filter("n > 500").select("cell6", F.lit(True).alias("_hot"))
    out = coarse.join(F.broadcast(hot), "cell6", "left")
    fine = F.expr(grid.sql_cell_encode_centi("lon_centi", "lat_centi", 9, "spark"))
    return out.select(
        "url",
        F.when(F.col("_hot"), fine).otherwise(F.col("cell6")).alias("cell_adaptive"),
    )


def _q_asof_join(spark, sf_dir):
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").withColumnRenamed(
        "o_custkey", "user_id"
    )
    out = ASOF.asof_join(
        events, orders, on="user_id", left_ts="ts", right_ts="o_orderdate",
        right_vals=("o_orderkey",), left_vals=("event_id",),
    )
    return out.select("event_id", F.col("asof_o_orderkey").alias("okey"))


def _q1_pricing_summary(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-01"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("sum_qty"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,4)")).cast("double").alias("sum_base"),
            F.sum(
                (F.col("l_extendedprice").cast("decimal(18,4)")
                 * (F.lit(1).cast("decimal(18,4)") - F.col("l_discount").cast("decimal(18,4)"))).cast("decimal(28,8)")
            ).cast("double").alias("sum_disc_price"),
            F.count(F.lit(1)).alias("cnt"),
        )
    )


def _q3_shipping_priority(spark, sf_dir):
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").filter(
        "c_mktsegment = 'BUILDING'"
    )
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
        F.col("o_orderdate") < F.lit("1998-03-15")
    )
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").filter(
        F.col("l_shipdate") > F.lit("1995-03-15")
    )
    rev = (F.col("l_extendedprice").cast("decimal(18,4)")
           * (F.lit(1).cast("decimal(18,4)") - F.col("l_discount").cast("decimal(18,4)")))
    # Stream the fact table, broadcast the selective dimension chain
    # (guide §3.1): the planner's post-filter size estimates made it
    # BROADCAST the filtered lineitem (5.7M rows ≈ 180 MB built on one
    # thread) into the customer×orders side.  customer(BUILDING)×orders
    # projected to the single o_orderkey join/group key is the genuinely
    # small side — broadcast it explicitly and lineitem is never moved;
    # only the post-join partial aggregate crosses the wire.  Join
    # reordering only — the joined set and the aggregate are unchanged.
    co = cust.join(orders, cust.c_custkey == orders.o_custkey).select("o_orderkey")
    return (
        li.join(F.broadcast(co), F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderkey")
        .agg(F.sum(rev.cast("decimal(28,8)")).alias("_rev"))
        .orderBy(F.col("_rev").desc(), F.col("o_orderkey").asc())
        .limit(10)
        .select("o_orderkey", F.col("_rev").cast("double").alias("revenue"))
    )


def _q5_region_revenue(spark, sf_dir):
    region = spark.read.parquet(f"{sf_dir}/region.parquet").filter("r_name = 'ASIA'")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    supp = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    rev = (F.col("l_extendedprice").cast("decimal(18,4)")
           * (F.lit(1).cast("decimal(18,4)") - F.col("l_discount").cast("decimal(18,4)")))
    # Stream the fact table, broadcast the dimension chain (guide
    # §3.1): written dimension-first, the planner kept the accumulated
    # region×nation×customer chain as the probe side and BROADCAST
    # both orders (1.5M rows) and lineitem (6M rows ≈ 200 MB) — the two
    # largest tables built single-threaded on the driver.  Collapsing
    # the dimensions into one compact (o_orderkey, c_nationkey, n_name)
    # relation (ASIA-selective: ~1/5 of orders, three narrow columns)
    # and probing it from lineitem leaves the fact table in place;
    # supplier joins broadcast as before.  Inner-join reordering only —
    # same joined set, same aggregate.
    dims = (
        region.join(nation, nation.n_regionkey == region.r_regionkey)
        .join(cust, cust.c_nationkey == nation.n_nationkey)
        .join(orders, orders.o_custkey == cust.c_custkey)
        .select("o_orderkey", "c_nationkey", "n_name")
    )
    return (
        li.join(F.broadcast(dims), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(supp),
            (supp.s_suppkey == F.col("l_suppkey"))
            & (supp.s_nationkey == F.col("c_nationkey")),
        )
        .groupBy("n_name")
        .agg(F.sum(rev.cast("decimal(28,8)")).cast("double").alias("revenue"),
             F.count(F.lit(1)).alias("cnt"))
    )


def _q_events_window(spark, sf_dir):
    from pyspark.sql.window import Window

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return events.select(
        "user_id",
        "event_id",
        F.row_number().over(w).alias("rn"),
        (
            F.unix_micros(F.col("ts").cast("timestamp"))
            - F.unix_micros(F.lag("ts").over(w).cast("timestamp"))
        ).alias("gap_us"),
    )


def _q_events_sessions(spark, sf_dir):
    from pyspark.sql.window import Window

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros(F.col("ts").cast("timestamp")) - F.unix_micros(
        F.lag("ts").over(w).cast("timestamp")
    )
    new_sess = F.when(gap.isNull() | (gap > 1_800_000_000), 1).otherwise(0)
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return events.select(
        "user_id", "event_id", new_sess.alias("_ns"), F.col("ts")
    ).select(
        "user_id", "event_id", F.sum("_ns").over(wsum).alias("session_id")
    )


def _q_part_antijoin(spark, sf_dir):
    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").filter("l_quantity >= 48")
    return part.join(
        li, part.p_partkey == li.l_partkey, "left_anti"
    ).select("p_partkey", "p_size")


def _q_orders_rollup(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    return orders.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(F.col("o_totalprice").cast("decimal(18,4)")).cast("double").alias("sum_total"),
    )


def _q_segment_mode(spark, sf_dir):
    from pyspark.sql.window import Window

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    counts = (
        cust.join(nation, cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name", "c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("n_name").orderBy(
        F.col("n").desc(), F.col("c_mktsegment").asc()
    )
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .select("n_name", F.col("c_mktsegment").alias("mode_segment"), "n")
    )


def _docs_spread(spark, sf_dir):
    """documents scan spread to the session's parallelism: the compact
    parquet (50k docs ≈ 15 MB at sf1.0) is ONE input split, so every
    compute-dense per-doc expression chain (regexp batteries, n-gram
    windows, md5 fingerprints, Arrow UDFs) otherwise runs on a single
    core.  Deterministic hash repartition on doc_id (~0.2 s exchange of
    the 15 MB) vs a 32× parallelism unlock; inputs that already have ≥
    defaultParallelism partitions pass through untouched, so a real
    100 TB corpus never pays the exchange.  Row set unchanged (gates
    compare sorted)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    target = spark.sparkContext.defaultParallelism
    if docs.rdd.getNumPartitions() >= target:
        return docs
    # lazy localCheckpoint = lineage barrier: Catalyst pushes
    # deterministic filters below a bare repartition, so a query that
    # filters on its computed columns would inline the whole expression
    # battery into the filter and evaluate it on the ONE pre-spread
    # split (measured 6 s vs 1 s for docs_quality_filter).  The barrier
    # pins evaluation above the spread; materialization is one 15 MB
    # in-memory write on first action of each invocation.
    return docs.repartition(target, F.col("doc_id")).localCheckpoint(
        eager=False
    )


def _q_docs_exact_dedup(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    survivors = D.exact_dedup(docs)
    return survivors.select("doc_id")


def _q_docs_jaccard(spark, sf_dir):
    docs = _docs_spread(spark, sf_dir)
    return D.jaccard_pairs(docs, threshold_milli=500)


def _messy_url_sql(dialect: str, i: str) -> str:
    """Deterministically-messy URL per row id (both dialects): scheme/
    host case flips, default vs non-default ports, query params in two
    orders, an occasional fragment — every normalization `canonical_url`
    performs is exercised."""
    e = P._exprs(dialect, i)
    h = e["h"]
    s = (lambda x: f"CAST({x} AS STRING)") if dialect == "spark" else (
        lambda x: f"CAST({x} AS VARCHAR)"
    )
    host_up = f"('HTTPS://SITE' || {s(f'{h} % 1000')} || '.EXAMPLE')"
    host_lo = f"('https://site' || {s(f'{h} % 1000')} || '.example')"
    return (
        f"(CASE WHEN ({i}) % 2 = 0 THEN {host_up} ELSE {host_lo} END"
        f" || CASE ({i}) % 3 WHEN 0 THEN ':443' WHEN 1 THEN ':8443' ELSE '' END"
        f" || '/p/' || {s(i)}"
        f" || CASE WHEN ({i}) % 2 = 0"
        f"      THEN '?b=' || {s(f'({i}) % 7')} || '&a=' || {s(f'({i}) % 5')}"
        f"      ELSE '?a=' || {s(f'({i}) % 5')} || '&b=' || {s(f'({i}) % 7')} END"
        f" || CASE WHEN ({i}) % 4 = 0 THEN '#frag' ELSE '' END)"
    )


def _q_url_canonical(spark, sf_dir):
    """URL canonicalization (the crawl-dedup key): messy variants —
    upper/lower scheme+host, default :443 vs kept :8443 ports, two
    query-param orders, fragments — must normalize to ONE canonical
    form.  The oracle computes the EXPECTED canonical analytically from
    the same construction, so the gate checks the spec, not the
    implementation against itself."""
    df = spark.range(N_PAGES)
    mess = F.expr(_messy_url_sql("spark", "id"))
    return df.select(
        F.col("id").alias("rid"), P.canonical_url(mess).alias("curl")
    )


LINK_N = 20_000
LINK_DEG = 3
LINK_ITERS = 4


def _q_link_pagerank(spark, sf_dir):
    """Link-based document weighting (the crawl-frontier / quality
    signal): integer-exact PageRank over the deterministic synthetic
    webgraph.  Bit-identical across engines because every step is
    bigint floor arithmetic — the oracle unrolls the same recurrence as
    nested DuckDB CTEs."""
    edges = GR.synth_links(spark, LINK_N, LINK_DEG)
    return GR.pagerank_micro(edges, LINK_N, iters=LINK_ITERS)


def _q_docs_hash_sample(spark, sf_dir):
    """Deterministic content-addressed sampling (training-data
    curation): keep documents whose md5-bucket falls under the rate —
    reproducible across engines/partitionings, monotone in the rate
    (test-asserted).  Oracle reproduces the identical md5-prefix
    arithmetic in DuckDB."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return TX.hash_sample(
        docs.select("doc_id"), "doc_id", 200, key_out="bucket"
    )


def _q_docs_curation_pipeline(spark, sf_dir):
    """The END-TO-END curation pass a training-data pipeline runs, as
    ONE composed relational plan: quality gate ∧ language gate ∧
    exact-dedup survivorship ∧ deterministic hash sampling — each stage
    is an independently-gated operator; this query gates their
    COMPOSITION (filter ordering, semi-join survivorship, sample
    stability under the combined plan)."""
    docs = _docs_spread(spark, sf_dir)
    t = F.col("text")
    scored = docs.select(
        "doc_id",
        TX.quality_score_milli(t).alias("quality_milli"),
        TX.lang_id(t).alias("lang_guess"),
    ).filter((F.col("quality_milli") >= 700) & (F.col("lang_guess") == "en"))
    survivors = D.exact_dedup(docs).select("doc_id")
    kept = scored.join(survivors, "doc_id", "left_semi")
    return TX.hash_sample(kept, "doc_id", 500, key_out="bucket").select(
        "doc_id", "quality_milli", "bucket"
    )


def _q_host_cap(spark, sf_dir):
    """Per-host quota (C4/RefinedWeb-style domain cap): at most 3
    pages per host, winners = the 3 url-smallest (deterministic total
    order — reproducible across engines/partitionings/reruns, unlike
    LIMIT).  Engine: the skew-proof two-phase salted window
    (`text.cap_per_key`) — a mega-host ranks across 16 salt tasks
    first, then only its ≤ 48 survivors meet in one task.  Oracle: a
    single ROW_NUMBER per host (the two-phase plan is exact, so the
    naive SQL form is the correct twin)."""
    pages = P.synth_pages(spark, N_PAGES)
    host = F.regexp_extract(P.canonical_url(F.col("url")), r"://([^/]*)", 1)
    capped = TX.cap_per_key(
        pages.withColumn("host", host), "host", 3, ["url"]
    )
    return capped.select("host", "url")


def _q_zonal_quantiles(spark, sf_dir):
    """Exact per-zone quantiles (lower-nearest-rank, pure integer rank
    arithmetic) of the text-length band per res-6 zone — the
    percentile extension of Band.reduce.  Engine: per-(zone, value)
    histogram first (map-side combine crushes hot zones), then the
    cumulative window runs over DISTINCT VALUES, not rows
    (`zonal.zonal_quantiles`); the oracle replicates the identical
    histogram/cumsum/rank arithmetic."""
    geo = _pages_geo(spark)
    g = geo.select(
        grid.cell_parent("cell_id", RES, 6).alias("zone"),
        F.length("text").alias("v"),
    )
    return Z.zonal_quantiles(g, "v", by="zone")


def _q_host_stats(spark, sf_dir):
    """Per-host crawl statistics over canonical urls (host extraction +
    aggregation — the politeness/curation breakdown every crawl
    pipeline reports)."""
    pages = P.synth_pages(spark, N_PAGES)
    host = F.regexp_extract(P.canonical_url(F.col("url")), r"://([^/]*)", 1)
    return (
        pages.withColumn("host", host)
        .groupBy("host")
        .agg(
            F.count(F.lit(1)).alias("n_pages"),
            F.countDistinct("lang").alias("n_langs"),
            F.min("url").alias("first_url"),
        )
    )


def _q_docs_dup_groups(spark, sf_dir):
    """Pairs → canonical duplicate GROUPS (transitive closure): the
    retention step of a dedup pipeline.  Engine: verified near-dup
    pairs (the LSH pipeline — candidates + exact shingle-Jaccard
    verify, the SAME pair set the all-pairs inverted index yields:
    banding recall is total on these corpora, machine-checked by the
    docs_minhash_pairs gate against the identical all-pairs oracle) →
    `dedup.connected_components` min-label propagation → every doc
    labeled with its component's min id (singletons label themselves).
    The historical `jaccard_pairs` input computed the identical set
    through a full inverted-index self-join — Σf² pair explosion on a
    small-shingle-universe corpus (~10¹¹ aggregate rows at 50k bench
    docs, unfinishable) where LSH candidates stay linear-ish.
    Oracle: the all-pairs SQL + a DuckDB recursive CTE computing min
    reachable id."""
    docs = _docs_spread(spark, sf_dir)
    pairs = D.minhash_dedup(docs, threshold_milli=500)
    return D.dup_groups(docs, pairs)


def _q_docs_token_stats(spark, sf_dir):
    docs = _docs_spread(spark, sf_dir)
    t = F.col("text")
    return docs.select(
        "doc_id",
        TX.token_count(t).alias("n_tokens"),
        TX.bpe_ish_token_count(t).alias("n_subtokens"),
        TX.punct_ratio_milli(t).alias("punct_milli"),
        TX.stopword_ratio_milli(t).alias("stop_milli"),
        TX.quality_score_milli(t).alias("quality_milli"),
    )


def _q_docs_quality_filter(spark, sf_dir):
    """The canonical corpus-filter op: keep documents passing a quality
    threshold AND a language gate — the composition every training-data
    pipeline runs before dedup."""
    docs = _docs_spread(spark, sf_dir)
    t = F.col("text")
    return docs.select(
        "doc_id",
        TX.quality_score_milli(t).alias("quality_milli"),
        TX.lang_id(t).alias("lang_guess"),
    ).filter((F.col("quality_milli") >= 700) & (F.col("lang_guess") == "en"))


def _q_docs_repetition(spark, sf_dir):
    """Gopher/MassiveText-style repetition-quality signals (Rae et al.
    2021, App. A — public method): duplicate-line fraction,
    duplicate-line character mass, most-repeated word-2-gram character
    mass, bullet/ellipsis line fraction, and the composite keep flag —
    all integer per-mille arithmetic, native higher-order functions
    (whole-stage codegen, no UDF); DuckDB list-lambda oracle."""
    docs = _docs_spread(spark, sf_dir)
    return TX.repetition_signals(docs.select("doc_id", "text")).drop("text")


def _q_docs_pii_scrub(spark, sf_dir):
    """PII scrub (C4/CCNet-style privacy pass): per-doc email/IPv4/
    phone counts + typed-sentinel redaction, all native chained regexp
    (one pass, no shuffle).  PII is PLANTED into every 5th document
    (deterministic concat — identical SQL on the oracle side), but the
    gate does not depend on the plant: the oracle re-runs the same
    RE2/Java-identical patterns over the same text, so natural matches
    (if any) agree too.  Output hashes the redacted text (md5) so the
    replacement semantics — not just the counts — are value-gated."""
    docs = _docs_spread(spark, sf_dir)
    d = F.col("doc_id").cast("string")
    planted = docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat(
                F.col("text"),
                F.lit(" mail user"), d, F.lit("@example.com or +1234567"),
                d, F.lit(" from 10.0.0."), (F.col("doc_id") % 256).cast("string"),
            ),
        ).otherwise(F.col("text")).alias("text"),
    )
    out = TX.scrub_pii(planted, mode="redact")
    return out.select(
        "doc_id", "n_email", "n_ipv4", "n_phone", "pii_total",
        F.md5("text").alias("scrub_md5"),
    )


def _q_docs_line_scrub(spark, sf_dir):
    """Corpus-level boilerplate-line scrub (CCNet/RefinedWeb line
    dedup — public method): lines ≥ 10 chars appearing in ≥ 2 distinct
    documents are dropped from every document, order preserved.
    Engine: one explode + two line-key shuffles + anti-join +
    order-preserving agg reassembly (`text.scrub_boilerplate_lines`).
    Oracle: the same definition via DuckDB zipped unnest + string_agg
    ORDER BY pos."""
    docs = _docs_spread(spark, sf_dir)
    return TX.scrub_boilerplate_lines(docs.select("doc_id", "text"))


def _q_docs_lm_bigram(spark, sf_dir):
    """CCNet-style bigram-LM quality scoring (Wenzek et al. 2020 §4.3,
    public method): train add-one-smoothed bigram counts on the
    deterministic md5 reference slice (bucket < 200 — the same
    cross-engine slice rule as `docs_hash_sample`), score EVERY doc by
    joining its bigrams against the model relations.  Gated columns
    are the integer-exact model-join statistics (bigram count, model
    hits, context hits, count masses) that pin tokenization, slice,
    both joins and the smoothing denominators; the float log/exp step
    on top (`ppl`) is verified against a pure-Python reference in
    tests/test_lm.py — same integers-at-the-gate stance as BM25's
    micro-idf.  Engine: one explode, broadcast model joins, one
    map-side-combinable groupBy.  Oracle: the same slice/counts in
    DuckDB via unnest + generate_series bigrams."""
    docs = _docs_spread(spark, sf_dir)
    m = LM.train_bigram_lm(docs, ref_milli=200)
    return LM.score_bigram_lm(docs, m).select(
        "doc_id", "n_bigrams", "n_seen", "n_ctx", "sum_c2", "sum_c1"
    )


# Fixed demonstration merge table for the BPE APPLICATION gate — the
# apply path is what runs corpus-wide at 10^12 tokens; training is
# gated locally by python-reference equality (tests/test_bpe.py).
# A literal table keeps the DuckDB twin a pure function of the same
# constants (oracle_sql cannot train).
_BPE_MERGES = [
    ("t", "h"), ("th", "e"), ("the", "</w>"), ("i", "n"), ("in", "g"),
    ("ing", "</w>"), ("e", "r"), ("a", "n"), ("an", "d"), ("o", "n"),
    ("e", "</w>"), ("s", "</w>"),
]


def _q_docs_bpe_pieces(spark, sf_dir):
    """BPE tokenization (Sennrich et al. 2016) applied with the fixed
    merge table — map-side only: split → per-word native replace
    chain → re-split inside transforms, ZERO shuffles (plan-asserted
    in test_bpe).  The gate hashes the full piece sequence
    byte-for-byte (joined) plus word/piece counts against a DuckDB
    twin running the identical replace chain, so the greedy
    resume-after-match overlap semantics are pinned cross-engine."""
    docs = _docs_spread(spark, sf_dir)
    out = BPE.bpe_pieces(docs, _BPE_MERGES)
    return out.select(
        "doc_id", "n_words", "n_pieces",
        F.array_join("pieces", " ").alias("piece_str"),
    )


def _q_docs_chunked(spark, sf_dir):
    """Passage chunking (the embed/RAG prep stage): 32-token windows,
    8-token overlap, tail kept, fully-contained tails never emitted.
    Pure flatMap — split → strided sequence → slice → array_join →
    posexplode, no shuffle (plan-asserted in test_text).  The gate
    hashes the chunk TEXT itself plus ordinals and token counts, so
    window arithmetic and join separators are pinned byte-for-byte
    against the DuckDB twin."""
    docs = _docs_spread(spark, sf_dir)
    return TX.chunk_tokens(docs, size=32, overlap=8)


def _q_docs_curation_v2(spark, sf_dir):
    """Round-6 curation tail composed as ONE relational plan (the
    composition gate, like `docs_curation_pipeline` for the r5 parts):
    keep docs whose bigram-LM model-hit rate ≥ 500‰ (the integer-exact
    core under the perplexity filter — n_seen·1000 div n_bigrams) AND
    whose duplicated-substring coverage ≤ 300‰ (`exact_substr`), then
    chunk the survivors into 32-token / 8-overlap passages.  Every
    stage is individually hash-gated; this gate proves they COMPOSE —
    semi-joins over the two filters feed the map-side chunker."""
    docs = _docs_spread(spark, sf_dir)
    m = LM.train_bigram_lm(docs, ref_milli=200)
    lm_ok = (
        LM.score_bigram_lm(docs, m)
        .filter(
            (F.col("n_bigrams") > 0)
            & (F.col("n_seen") * 1000 >= F.col("n_bigrams") * 500)
        )
        .select("doc_id")
    )
    sub_ok = (
        ES.duplicate_span_stats(docs, n=10, hashed=False)
        .filter(F.col("dup_token_milli") <= 300)
        .select("doc_id")
    )
    kept = docs.join(lm_ok, "doc_id", "semi").join(sub_ok, "doc_id", "semi")
    return TX.chunk_tokens(kept, size=32, overlap=8)


def _q_docs_exact_substr(spark, sf_dir):
    """ExactSubstr duplicate-span statistics (Lee et al. 2022, public
    method): word-10-gram windows occurring ≥2 times corpus-wide,
    merged into maximal spans per doc (gaps-and-islands over window
    start positions).  All-integer output — window counts, span
    counts, covered-token mass, per-mille coverage — hashed against a
    DuckDB twin running the identical windows/HAVING/LAG plan.  The
    gate runs ``hashed=False`` (exact string keys, collision-free by
    construction); the scale path's xxhash64 keying is test-asserted
    equal on fixtures (tests/test_exact_substr.py)."""
    docs = _docs_spread(spark, sf_dir)
    return ES.duplicate_span_stats(docs, n=10, hashed=False)


def _q_docs_decontaminate(spark, sf_dir):
    """Benchmark decontamination (GPT-3 App. C 13-gram rule, public
    method; n=4 here because the synthetic docs are ~54 words): every
    training doc sharing a word-4-gram with the held-out benchmark
    slice (doc_id % 50 = 3) is flagged.  Engine: benchmark n-grams
    explode+distinct (small) → broadcast; corpus n-grams via native
    higher-order fns (no UDF) → flatMap explode → map-side semi-join;
    only contaminated ids shuffle.  Oracle: DuckDB unnest +
    generate_series sliding window over the same tokenization."""
    docs = _docs_spread(spark, sf_dir)
    bench = docs.filter(F.col("doc_id") % 50 == 3)
    train = docs.filter(F.col("doc_id") % 50 != 3)
    return TX.decontaminate(train, bench, n=4).select(
        "doc_id", "contaminated"
    )


def _q_docs_lang_id(spark, sf_dir):
    docs = _docs_spread(spark, sf_dir)
    return docs.select("doc_id", TX.lang_id(F.col("text")).alias("lang_guess"))


def _q_docs_fingerprint(spark, sf_dir):
    docs = _docs_spread(spark, sf_dir)
    return docs.select("doc_id", TX.fingerprint(F.col("text")).alias("fp"))


def _q_emb_l2_topk(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter("vec_id < 5").select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    out = SIM.brute_force_topk_l2(q, emb, k=10)
    return out.select("query_id", "vec_id", "rank", "sqdist")


def _q_multimodal_bytes(spark, sf_dir):
    # spread: the per-payload codec loop is single-core on the one
    # input split otherwise (see _docs_spread)
    docs = _docs_spread(spark, sf_dir).select(
        "doc_id", F.col("text").cast("binary").alias("payload")
    )
    return MM.extract_features(docs).select("doc_id", "n_bytes", "byte_mean_milli")


# bbox in centi-degrees for the range/set-op queries
BBOX_A = (18000, 20000, 13000, 14500)  # lon0, lon1, lat0, lat1 (half-open)
BBOX_B = (19000, 21000, 13500, 15000)


def _bbox_cells(bbox, res):
    lon0, lon1, lat0, lat1 = bbox
    n = 1 << res
    return (
        lon0 * n // 36000, (lon1 - 1) * n // 36000,
        lat0 * n // 18000, (lat1 - 1) * n // 18000,
    )


def _q_bbox_cell_range(spark, sf_dir):
    """Spatial range query via the cell layout (≡ bounds_window byte-
    range pruning, `eodal/core/utils/raster.py:88-104`): the predicate
    is pure arithmetic on the stored cell id — with a cell-sorted table
    this prunes parquet row groups by min/max stats."""
    x0, x1, y0, y1 = _bbox_cells(BBOX_A, JOIN_RES)
    geo = _pages_geo(spark)
    cell8 = grid.cell_parent("cell_id", RES, JOIN_RES)
    return geo.filter(
        grid.cell_x_of(cell8).between(x0, x1)
        & grid.cell_y_of(cell8).between(y0, y1)
    ).select("url", "cell_id")


def _q_snapshot_pruned_scan(spark, sf_dir):
    """Manifest-level file skipping (≡ Iceberg manifests; the catalog
    contract of SURVEY §2.1): the geocoded pages table is committed to
    a SnapshotCatalog range-partitioned+sorted by cell_id, the manifest
    records per-file min/max from the parquet footers, and scan()
    selects files on the DRIVER before Spark ever lists them.  Result
    is identical to read+filter (residual applied); file-count skipping
    is metric-asserted in tests/test_infra.py."""
    import tempfile

    from eodal_spark.sources.catalog import SnapshotCatalog

    root = os.path.join(
        tempfile.gettempdir(), f"eodal_spark_snapcat_{N_PAGES}"
    )
    cat = SnapshotCatalog(root)
    if not cat.snapshots("pages_geo"):
        geo = _pages_geo(spark).select("url", "cell_id")
        cat.write(geo, "pages_geo", sort_by=("cell_id",), n_files=16)
    x0, x1 = 130, 180  # JOIN-res-independent: raw x range at RES
    lo = (RES << 58) + (x0 << 29)
    hi = (RES << 58) + (x1 << 29) + ((1 << 29) - 1)
    return cat.scan(spark, "pages_geo", {"cell_id": (lo, hi)})


def _q_snapshot_bloom_lookup(spark, sf_dir):
    """Per-file Bloom point-lookup pruning (≡ Delta/parquet bloom file
    skipping; Iceberg bucket-partition point pruning): pages commit with
    ``bloom_cols=("url",)`` — url is NOT the sort key, so no file-level
    min/max stats exist for it and every equality probe would otherwise
    open all files.  Three present urls (ids 10/20/30) must return their
    rows; two provably-absent urls contribute ZERO files (bloom prunes
    all of them — file-skip metric asserted in tests/test_infra.py).
    Result ≡ read+filter; the bloom is a pure optimization."""
    import functools
    import tempfile

    from eodal_spark.sources.catalog import SnapshotCatalog

    root = os.path.join(
        tempfile.gettempdir(), f"eodal_spark_bloomcat_{N_PAGES}"
    )
    cat = SnapshotCatalog(root)
    if not cat.snapshots("pages_bloom"):
        geo = _pages_geo(spark).select("url", "cell_id")
        cat.write(
            geo, "pages_bloom", sort_by=("cell_id",), n_files=8,
            bloom_cols=("url",),
        )
    pid = F.regexp_extract("url", r"/p/(\d+)$", 1).cast("long")
    probes = sorted(
        r["url"]
        for r in cat.read(spark, "pages_bloom")
        .filter(pid.isin(10, 20, 30))
        .collect()
    )
    probes += [f"https://absent.example/p/{i}" for i in (1, 2)]
    parts = [
        cat.scan(spark, "pages_bloom", eq={"url": u}) for u in probes
    ]
    out = functools.reduce(lambda a, b: a.unionByName(b), parts)
    return out.select("url", "cell_id")


def _q_snapshot_zorder_scan(spark, sf_dir):
    """Z-order clustered commit (≡ Delta OPTIMIZE ZORDER BY / Iceberg
    z-curve sort orders): pages land clustered in TWO independent
    derived dimensions at once, so a predicate on the SECOND dimension
    — hopeless for any linear sort — still prunes files via per-file
    min/max on both z columns (file-skip asserted in tests/test_infra).
    Result ≡ read+filter (residual applied)."""
    import tempfile

    from eodal_spark.sources.catalog import SnapshotCatalog

    root = os.path.join(
        tempfile.gettempdir(), f"eodal_spark_zcat_{N_PAGES}"
    )
    cat = SnapshotCatalog(root)
    if not cat.snapshots("pages_z"):
        pid = F.regexp_extract("url", r"/p/(\d+)$", 1).cast("long")
        df = _pages_geo(spark).select(
            "url",
            (pid % 1000).alias("x"),
            ((pid * 2654435761) % 1000).alias("y"),
        )
        cat.write(df, "pages_z", zorder=("x", "y"), n_files=16)
    return cat.scan(spark, "pages_z", {"y": (300, 350)}).select(
        "url", "x", "y"
    )


def _q_snapshot_partition_scan(spark, sf_dir):
    """Hidden partitioning (≡ Iceberg partition transforms): pages
    commit hive-partitioned by day(warc_ts) × bucket(8, lang) — derived
    columns the USER NEVER SEES (the logical schema stays url/warc_ts/
    lang; partition values live in dir names + the manifest).  A plain
    timestamp-range predicate is translated into the day-transform
    space and prunes whole partition dirs before any stats/file I/O
    (file-skip asserted in tests/test_infra).  Result ≡ read+filter;
    timestamps round-trip as epoch seconds for the tz-free oracle."""
    import datetime as dt
    import tempfile

    from eodal_spark.sources.catalog import SnapshotCatalog

    root = os.path.join(
        tempfile.gettempdir(), f"eodal_spark_pcat_{N_PAGES}"
    )
    cat = SnapshotCatalog(root)
    if not cat.snapshots("pages_part"):
        pg = P.synth_pages(spark, N_PAGES).select("url", "warc_ts", "lang")
        cat.write(
            pg,
            "pages_part",
            partition_by=[["day", "warc_ts"], ["bucket", 8, "lang"]],
        )
    day = (
        dt.datetime(2019, 6, 15, 0, 0, 0),
        dt.datetime(2019, 6, 15, 23, 59, 59),
    )
    out = cat.scan(spark, "pages_part", {"warc_ts": day})
    return out.select(
        "url", F.unix_timestamp("warc_ts").alias("ts_sec"), "lang"
    )


def _q_snapshot_deletes(spark, sf_dir):
    """Equality deletes, merge-on-read (≡ Iceberg v2 delete files —
    the corpus-curation primitive: purge urls without rewriting data).
    Pages land sorted; page-ids ≡ 0,1,2 (mod 10) are DELETED by url;
    ids ≡ 0 (mod 10) are RE-INGESTED by a later append and must
    REAPPEAR (sequence semantics: a delete applies only to files
    committed at or before it).  Final relation = ids not ≡ 1,2."""
    import shutil
    import tempfile

    from eodal_spark.sources.catalog import SnapshotCatalog

    root = os.path.join(
        tempfile.gettempdir(), f"eodal_spark_delcat_{N_PAGES}"
    )
    cat = SnapshotCatalog(root)
    if len(cat.snapshots("pages_del")) < 3:  # partial build → rebuild
        shutil.rmtree(root, ignore_errors=True)
        cat = SnapshotCatalog(root)
        geo = _pages_geo(spark).select("url", "cell_id")
        pid = F.regexp_extract("url", r"/p/(\d+)$", 1).cast("long")
        cat.write(geo, "pages_del", sort_by=("cell_id",), n_files=8)
        cat.delete_keys(
            spark, "pages_del", geo.filter(pid % 10 < 3).select("url")
        )
        cat.write(
            geo.filter(pid % 10 == 0),
            "pages_del",
            sort_by=("cell_id",),
            n_files=2,
            mode="append",
        )
    return cat.read(spark, "pages_del").select("url", "cell_id")


def _q_snapshot_range_delete(spark, sf_dir):
    """Metadata range delete (≡ Iceberg metadata/partition drop): an
    O(manifest) purge of a cell band — fully-covered files leave the
    snapshot, partial files get a residual filter — then a later
    append INTO the band whose rows must reappear (sequence
    semantics).  Final relation = pages outside x∈[130,180] at RES,
    plus re-ingested pages with id ≡ 0 (mod 7) inside it."""
    import shutil
    import tempfile

    from eodal_spark.sources.catalog import SnapshotCatalog

    root = os.path.join(
        tempfile.gettempdir(), f"eodal_spark_rdelcat_{N_PAGES}"
    )
    lo = (RES << 58) + (130 << 29)
    hi = (RES << 58) + (180 << 29) + ((1 << 29) - 1)
    cat = SnapshotCatalog(root)
    if len(cat.snapshots("pages_rdel")) < 3:
        shutil.rmtree(root, ignore_errors=True)
        cat = SnapshotCatalog(root)
        geo = _pages_geo(spark).select("url", "cell_id")
        pid = F.regexp_extract("url", r"/p/(\d+)$", 1).cast("long")
        cat.write(geo, "pages_rdel", sort_by=("cell_id",), n_files=8)
        cat.delete_range("pages_rdel", "cell_id", (lo, hi))
        cat.write(
            geo.filter(
                (pid % 7 == 0)
                & F.col("cell_id").between(lo, hi)
            ),
            "pages_rdel",
            sort_by=("cell_id",),
            n_files=1,
            mode="append",
        )
    return cat.read(spark, "pages_rdel").select("url", "cell_id")


def _q_snapshot_wap(spark, sf_dir):
    """Write-audit-publish branches (≡ Iceberg branch refs +
    fast_forward + cherrypick_snapshot): page-ids ≡ 0-4 (mod 10) land
    on main; ids ≡ 5,6 then 7 are STAGED on an ``audit`` branch (main
    readers see none of them) and fast-forward-published; ids ≡ 9 with
    pid%100 >= 50 are staged on a ``reject`` branch and DROPPED; ids
    ≡ 8 are staged on a ``late`` branch, main advances past its fork
    (appending the pid%100 < 50 half of the 9s), so publish is
    non-fast-forward and the staged append is CHERRY-PICKED onto the
    moved head instead.  Final relation = ids ≡ 0-8 plus half the 9s —
    the dropped branch's rows must be absent, every published/picked
    row present exactly once."""
    import shutil
    import tempfile

    from eodal_spark.sources.catalog import SnapshotCatalog

    root = os.path.join(
        tempfile.gettempdir(), f"eodal_spark_wapcat_{N_PAGES}"
    )
    cat = SnapshotCatalog(root)
    if len(cat.snapshots("pages_wap")) < 5 or cat.branches("pages_wap"):
        shutil.rmtree(root, ignore_errors=True)
        cat = SnapshotCatalog(root)
        geo = _pages_geo(spark).select("url", "cell_id")
        pid = F.regexp_extract("url", r"/p/(\d+)$", 1).cast("long")
        cat.write(
            geo.filter(pid % 10 < 5), "pages_wap",
            sort_by=("cell_id",), n_files=4,
        )
        cat.create_branch("pages_wap", "audit")
        for sel in (pid % 10).isin(5, 6), (pid % 10) == 7:
            cat.write(
                geo.filter(sel), "pages_wap",
                sort_by=("cell_id",), n_files=1,
                mode="append", branch="audit",
            )
        cat.create_branch("pages_wap", "reject")
        cat.write(
            geo.filter((pid % 10 == 9) & (pid % 100 >= 50)), "pages_wap",
            sort_by=("cell_id",), n_files=1,
            mode="append", branch="reject",
        )
        cat.drop_branch("pages_wap", "reject")
        cat.publish_branch("pages_wap", "audit")
        cat.create_branch("pages_wap", "late")
        staged = cat.write(
            geo.filter(pid % 10 == 8), "pages_wap",
            sort_by=("cell_id",), n_files=1,
            mode="append", branch="late",
        )
        cat.write(  # main moves past the fork → late is non-FF
            geo.filter((pid % 10 == 9) & (pid % 100 < 50)), "pages_wap",
            sort_by=("cell_id",), n_files=1, mode="append",
        )
        try:
            cat.publish_branch("pages_wap", "late")
            raise AssertionError("publish must refuse non-FF")
        except ValueError:
            cat.cherrypick_snapshot("pages_wap", staged["snapshot_id"])
        cat.drop_branch("pages_wap", "late")
    return cat.read(spark, "pages_wap").select("url", "cell_id")


def _q_snapshot_upsert(spark, sf_dir):
    """Atomic MERGE INTO (merge-on-read upsert — ≡ Iceberg MERGE
    compiled to equality deletes + appended data files in ONE commit):
    pages land sorted; one upsert REPLACES pages with id ≡ 0 (mod 5) —
    cell_id bumped by 1 — and INSERTS 100 new urls.  The replacements
    must survive their own commit's delete (the delete file carries the
    PARENT's sequence number) while every old version vanishes; either
    all of the merge is visible or none (single manifest CAS)."""
    import shutil
    import tempfile

    from eodal_spark.sources.catalog import SnapshotCatalog

    root = os.path.join(
        tempfile.gettempdir(), f"eodal_spark_upscat_{N_PAGES}"
    )
    cat = SnapshotCatalog(root)
    if len(cat.snapshots("pages_ups")) < 2:  # partial build → rebuild
        shutil.rmtree(root, ignore_errors=True)
        cat = SnapshotCatalog(root)
        geo = _pages_geo(spark).select("url", "cell_id")
        pid = F.regexp_extract("url", r"/p/(\d+)$", 1).cast("long")
        cat.write(geo, "pages_ups", sort_by=("cell_id",), n_files=8)
        repl = geo.filter(pid % 5 == 0).select(
            "url", (F.col("cell_id") + 1).alias("cell_id")
        )
        ins = spark.range(100).select(
            F.concat(
                F.lit("https://upsert.example/p/"),
                F.col("id").cast("string"),
            ).alias("url"),
            F.col("id").alias("cell_id"),
        )
        cat.upsert(
            spark,
            repl.unionByName(ins),
            "pages_ups",
            key_cols=("url",),
            n_files=2,
        )
    return cat.read(spark, "pages_ups").select("url", "cell_id")


def _q_snapshot_pos_delete(spark, sf_dir):
    """DELETE WHERE compiled to POSITION deletes (≡ Iceberg v2 position
    delete files): an arbitrary predicate — no key, no manifest stats —
    records (file, row-ordinal) pairs in O(matches); reads anti-join
    them merge-on-read.  Ids ≡ 2,5 (mod 9) are deleted by predicate;
    ids ≡ 2 are re-ingested by a later append and must REAPPEAR
    (positions only name files that existed at commit).  Final
    relation = ids not ≡ 5 (mod 9)."""
    import shutil
    import tempfile

    from eodal_spark.sources.catalog import SnapshotCatalog

    root = os.path.join(
        tempfile.gettempdir(), f"eodal_spark_pdelcat_{N_PAGES}"
    )
    cat = SnapshotCatalog(root)
    if len(cat.snapshots("pages_pdel")) < 3:  # partial build → rebuild
        shutil.rmtree(root, ignore_errors=True)
        cat = SnapshotCatalog(root)
        geo = _pages_geo(spark).select("url", "cell_id")
        pid = F.regexp_extract("url", r"/p/(\d+)$", 1).cast("long")
        cat.write(geo, "pages_pdel", sort_by=("cell_id",), n_files=8)
        cat.delete_where(
            spark,
            "pages_pdel",
            "CAST(regexp_extract(url, '/p/(\\\\d+)$', 1) AS BIGINT) "
            "% 9 IN (2, 5)",
        )
        cat.write(
            geo.filter(pid % 9 == 2),
            "pages_pdel",
            sort_by=("cell_id",),
            n_files=1,
            mode="append",
        )
    return cat.read(spark, "pages_pdel").select("url", "cell_id")


def _q_snapshot_incremental(spark, sf_dir):
    """Incremental consumption (≡ Iceberg incremental scan / the
    reference's scene-append resume, `eodal/core/scene.py:381-413`):
    the pages table lands in TWO append commits; `read_changes` from
    the first snapshot must return exactly the second batch — read from
    the file-level delta only.  Oracle: the generator restricted to the
    second id range."""
    import tempfile

    from eodal_spark.sources.catalog import SnapshotCatalog

    half = N_PAGES // 2
    root = os.path.join(
        tempfile.gettempdir(), f"eodal_spark_snapinc_{N_PAGES}"
    )
    cat = SnapshotCatalog(root)
    # per-commit guards (not one emptiness check): a crash between the
    # two commits must RESUME at the missing one on the next run, never
    # leave a one-snapshot fixture that fails the gate forever
    geo = _pages_geo(spark).select("url", "cell_id")
    rowid = F.regexp_extract("url", r"/p/(\d+)$", 1).cast("long")
    if len(cat.snapshots("pages_inc")) < 1:
        cat.write(
            geo.filter(rowid < half), "pages_inc",
            sort_by=("cell_id",), n_files=4,
        )
    if len(cat.snapshots("pages_inc")) < 2:
        cat.write(
            geo.filter(rowid >= half), "pages_inc",
            sort_by=("cell_id",), n_files=4, mode="append",
        )
    return cat.read_changes(spark, "pages_inc", from_snapshot=1)


def _q_setops_except(spark, sf_dir):
    """Set ops (≡ EPSG set difference / band pruning, SURVEY §2.7):
    urls in bbox A minus urls in bbox B (overlapping boxes)."""
    geo = _pages_geo(spark)

    def in_box(b):
        lon0, lon1, lat0, lat1 = b
        return (
            F.col("lon_centi").between(lon0, lon1 - 1)
            & F.col("lat_centi").between(lat0, lat1 - 1)
        )

    a = geo.filter(in_box(BBOX_A)).select("url")
    b = geo.filter(in_box(BBOX_B)).select("url")
    return a.exceptAll(b)


def _q_share_en_per_tile(spark, sf_dir):
    """Conditional-aggregate ratio per tile (≡ get_cloudy_pixel_
    percentage, `eodal/core/sensors/sentinel2.py:780-814`)."""
    tiled = TIL.assign_tiles(
        P.geocode(P.synth_pages(spark, N_PAGES), RES), RES, TILE_RES
    )
    return tiled.groupBy("tile_cell").agg(
        F.count(F.lit(1)).alias("n"),
        F.expr(
            "count(CASE WHEN lang = 'en' THEN 1 END) * 1000 div count(*)"
        ).alias("en_milli"),
    )


def _q_rolling_events(spark, sf_dir):
    from pyspark.sql.window import Window

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-2, 0)
    )
    return events.select(
        "user_id",
        "event_id",
        F.sum(F.col("value").cast("decimal(18,6)")).over(w).cast("double").alias("roll3"),
    )


def _q_scalar_battery(spark, sf_dir):
    """String / date / math / bitwise scalar functions (SURVEY §2.8)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.upper(F.substring("l_returnflag", 1, 1)).alias("flag_u"),
        F.concat_ws("-", "l_returnflag", "l_linestatus").alias("tag"),
        F.datediff(
            F.date_trunc("month", "l_shipdate").cast("date"), F.lit("1970-01-01")
        ).alias("ship_month_days"),
        F.shiftrightunsigned(
            F.col("l_linenumber").bitwiseAND(F.lit(6)).cast("long"), 1
        ).alias("qa_bits"),
        F.floor(F.col("l_extendedprice")).cast("long").alias("price_floor"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.signum(F.col("l_quantity") - 25.0).cast("int").alias("qty_sign"),
    )


def _q_product_uri_battery(spark, sf_dir):
    """SAFE product-name utilities (`eodal/utils/sentinel2.py:40-145`)
    + the mapper's ``&&`` product-uri merge (`mapper.py:626-628`).

    Synthesizes STAC hrefs containing deterministic .SAFE names from
    lineitem columns, then recovers every field through the Column
    helpers — url → safe name → platform / level / sensing time /
    baseline / tile — and the per-order ``&&`` merge.  The oracle
    reconstructs each expected value ANALYTICALLY from the same integer
    columns (spec-level gate, like `url_canonical`)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"
    )
    safe = F.concat_ws(
        "_",
        F.concat(
            F.lit("S2"),
            F.when(F.col("l_orderkey") % 2 == 0, F.lit("A")).otherwise(F.lit("B")),
        ),
        F.concat(
            F.lit("MSIL"),
            F.when(F.col("l_linenumber") % 2 == 0, F.lit("1C")).otherwise(F.lit("2A")),
        ),
        F.concat(
            F.lit("202201"),
            F.lpad((F.col("l_orderkey") % 28 + 1).cast("string"), 2, "0"),
            F.lit("T"),
            F.lpad((F.col("l_partkey") % 24).cast("string"), 2, "0"),
            F.lpad((F.col("l_suppkey") % 60).cast("string"), 2, "0"),
            F.lpad((F.col("l_linenumber") % 60).cast("string"), 2, "0"),
        ),
        F.concat(
            F.lit("N"),
            F.lpad(((F.col("l_partkey") % 5) * 100 + 300).cast("string"), 4, "0"),
        ),
        F.concat(
            F.lit("R"),
            F.lpad((F.col("l_suppkey") % 143 + 1).cast("string"), 3, "0"),
        ),
        F.concat(F.lit("T32TM"), F.char(F.col("l_suppkey") % 5 + 65)),
        F.lit("20230101T000000.SAFE"),
    )
    df = li.withColumn(
        "url",
        F.concat(
            F.lit("https://stac.example.com/collections/sentinel-2/"),
            safe,
            F.lit("/GRANULE/B01.jp2"),
        ),
    )
    sn = SN.safe_name_from_url(F.col("url"))
    # the && merge rides a WINDOW over the same key instead of a
    # groupBy + join-back: the join plan computed the whole SAFE-name
    # synthesis + regex chain TWICE (once per join side) and paid a
    # second exchange; the window shuffles only the four source ints
    # and evaluates the synthesis once per row (same sorted-distinct
    # merge semantics as sensors.merge_product_uris — collect_set over
    # the key partition).  Measured 13.2 s → ~4 s at 6M rows.
    from pyspark.sql.window import Window

    w = Window.partitionBy("l_orderkey")
    return df.select(
        "l_orderkey",
        "l_linenumber",
        sn.alias("safe_name"),
        SN.s2_platform(sn).alias("platform"),
        SN.s2_processing_level(sn).alias("level"),
        F.date_format(SN.s2_acquisition_time(sn), "yyyy-MM-dd HH:mm:ss").alias(
            "acq_ts"
        ),
        SN.s2_processing_baseline(sn).alias("baseline"),
        SN.s2_tile(sn).alias("tile"),
        F.array_join(F.array_sort(F.collect_set(sn).over(w)), "&&").alias(
            "merged_uri"
        ),
    )


def _q_indices_battery(spark, sf_dir):
    """Named-index registry over generic bands (≡ SpectralIndices,
    `eodal/core/spectral_indices.py:89-122`) — bound to lineitem
    columns; one fused projection."""
    from eodal_spark.operators import algebra as A

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").cast("double").alias("nir"),
        (F.col("l_discount").cast("double") * 10 + 0.1).alias("red"),
        (F.col("l_tax").cast("double") * 10 + 0.2).alias("green"),
        (F.col("l_extendedprice").cast("double") * 0.00001 + 0.05).alias("blue"),
        ((F.col("l_partkey") % 100).cast("double") * 0.01 + 0.3).alias("rededge"),
        ((F.col("l_suppkey") % 100).cast("double") * 0.01 + 0.4).alias("rededge3"),
        (F.col("l_linenumber").cast("double") * 0.1 + 0.2).alias("swir"),
        ((F.col("l_orderkey") % 7).cast("double") * 0.1 + 0.15).alias("swir2"),
    )
    bind = {
        "nir": "nir", "red": "red", "green": "green", "blue": "blue",
        "rededge": "rededge", "rededge3": "rededge3",
        "swir": "swir", "swir2": "swir2", "vh": "green", "vv": "red",
    }
    # the reference's full 16-index set, pinned explicitly (the registry
    # is user-extensible at runtime, so list_indices() is not stable)
    names = [
        "BSI", "CI_GREEN", "CR", "EVI", "GNDVI", "MCARI", "MSAVI",
        "MTCARI_OSAVI", "NDRE", "NDRI", "NDTI", "NDVI", "NDWI", "NDYI",
        "NHI", "VARI",
    ]
    out = A.with_indices(li, bind, *names)
    return out.select("l_orderkey", "l_linenumber", *[n.lower() for n in names])


def _q_sensor_s2_scale(spark, sf_dir):
    """Sentinel-2-style adapter: gain 1e-4 + per-row baseline-switched
    offset (PDGS >= 400 → -0.1; `sentinel2.py:100-121`), nodata-0 → NULL.
    Scenes synthesized from lineitem columns."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_partkey") % 10000).alias("B04"),
        (F.col("l_suppkey") % 10000).alias("B08"),
        (300 + (F.col("l_orderkey") % 2) * 100).alias("baseline"),
    )
    return SN.apply_adapter(
        li, "sentinel2", bands=("red", "nir"), baseline_col="baseline",
        keep=("l_orderkey", "l_linenumber", "baseline"),
    )


def _q_sensor_landsat_qa(spark, sf_dir):
    """Landsat-style adapter: Collection-2 reflectance scaling + named
    cloud/shadow (bits 1,2,3,5) and water (bit 7) masks from qa_pixel
    (`landsat.py:354-519`, ``:559-671``)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_partkey") % 10000).alias("red_raw"),
        (F.col("l_suppkey") % 1024).alias("qa_pixel"),
    )
    ad = SN.get_adapter("landsat")
    out = li.select(
        "l_orderkey",
        "l_linenumber",
        ad.scale(F.col("red_raw")).alias("red"),
        SN.cloud_shadow_mask(F.col("qa_pixel"), ad.cloud_classes).alias("cloud_mask"),
        SN.water_mask(F.col("qa_pixel"), ad.water_class).alias("water_mask"),
    )
    return out


def _q_filter_grammar(spark, sf_dir):
    """The reference's Filter grammar compiled to Catalyst predicates
    (`eodal/mapper/filter.py:24-97`)."""
    from eodal_spark.operators.filters import Filter, apply_filters

    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    out = apply_filters(
        part,
        [
            Filter("p_size", ">=", 20),
            Filter("p_size", "<", 40),
            Filter("p_brand", "!=", "Brand#13"),
        ],
    )
    return out.select("p_partkey", "p_size", "p_brand")


def _q_scale_mask(spark, sf_dir):
    """scale*x+offset projection + class masking + QA-bit extract in
    one pass (≡ Band.scale_data raster.py:1550-1592, RasterCollection.
    mask raster.py:1445-1548, mask_from_qa_bits landsat.py:673-716)."""
    from eodal_spark.operators import algebra as A

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_linenumber", "l_extendedprice", "l_quantity",
        "l_returnflag",
    )
    scaled = li.withColumn(
        "price_scaled", A.scale_values(F.col("l_extendedprice"), 0.01, 5.0)
    )
    masked = A.mask_values(scaled, "l_returnflag", ["R"], ["l_quantity"])
    return masked.select(
        "l_orderkey", "l_linenumber", "price_scaled",
        F.col("l_quantity").alias("qty_masked"),
    )


def _q_value_histogram(spark, sf_dir):
    """Binned value histogram (Band.hist, band.py:1482-1520): integer
    bin edges, empty bins backfilled, per return-flag zone."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return Z.histogram(li, "l_quantity", n_bins=10, lo=0, hi=50,
                       by=("l_returnflag",))


def _q_cell_upsample(spark, sf_dir):
    """Upsampling resample (≡ pixel-division value carry-down,
    `eodal/utils/arrays.py:66-109`): each page's res-6 parent explodes
    into its 4 res-7 children carrying the page count down."""
    geo = _pages_geo(spark)
    per6 = geo.groupBy(grid.cell_parent("cell_id", RES, 6).alias("cell6")).agg(
        F.count(F.lit(1)).alias("n")
    )
    return per6.select(
        F.explode(grid.cell_children("cell6", 6, 7)).alias("cell7"), "n"
    )


def _q_cell_resample(spark, sf_dir):
    """Resolution rollup (≡ Band.resample downsampling,
    `eodal/core/band.py:1771-1860`): res-12 cells → res-6 parents via
    pure bit shifts, then per-parent aggregation."""
    geo = _pages_geo(spark)
    c6 = grid.cell_parent("cell_id", RES, 6)
    return geo.groupBy(c6.alias("cell6")).agg(F.count(F.lit(1)).alias("n"))


def _q_cell_resample_mean(spark, sf_dir):
    """AREA-kernel downsample (≡ Band.resample with an interpolating
    kernel, `eodal/core/band.py:1771-1860`): res-12 cells aggregate to
    res-6 parents with the full reduce set — exact integer mean."""
    geo = _pages_geo(spark).withColumn("n_chars", F.length("text"))
    return RS.downsample_agg(
        geo, "cell_id", RES, 6, "n_chars",
        stats=("count", "mean_milli", "min", "max", "median"),
    )


def _q_cell_upsample_bilinear(spark, sf_dir):
    """Bilinear upsample (≡ Band.resample cv2.INTER_LINEAR/CUBIC,
    `eodal/core/band.py:1771-1860`): per-res-6-cell page counts
    interpolate down to res-7 children with exact integer weights."""
    geo = _pages_geo(spark)
    coarse = geo.groupBy(grid.cell_parent("cell_id", RES, 6).alias("c6")).agg(
        F.count(F.lit(1)).alias("n")
    )
    return RS.upsample_bilinear(coarse, "c6", 6, 7, "n", broadcast_coarse=True)


def _q_poly_timeseries(spark, sf_dir):
    """Per-feature time series (≡ get_feature_timeseries,
    `eodal/core/scene.py:469-539`): the reference's per-scene loop +
    concat becomes ONE scan → join → groupBy(poly, time bucket)."""
    geo = _pages_geo(spark).withColumn("n_chars", F.length("text"))
    joined = SJ.spatial_join(
        geo, _polys_spark(spark), JOIN_RES, rule="centroid",
        page_cols=("url", "n_chars", "warc_ts"), page_res=RES,
    )
    bucket = (F.unix_timestamp("warc_ts") / F.lit(BUCKET)).cast("long")
    return joined.withColumn("ts_bucket", bucket).groupBy(
        "poly_id", "ts_bucket"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("sum(n_chars) * 1000 div count(*)").alias("avg_chars_milli"),
    )


def _q_poly_timeseries_reindexed(spark, sf_dir):
    """Dense time axis + gap fill (≡ get_feature_timeseries
    reindexing, `eodal/core/scene.py:472-539`, plus the pandas
    ``reindex().ffill()`` idiom): the observed per-poly buckets complete
    to a global spine; counts zero-fill, measurements forward-fill."""
    observed = _q_poly_timeseries(spark, sf_dir)
    return TS.reindex_buckets(
        observed, "poly_id", "ts_bucket",
        fill_zero=("n",), fill_forward=("avg_chars_milli",),
    )


def _q_heatmap_grid(spark, sf_dir):
    """2-D binned density+mean grid (≡ the distributed half of
    Band.plot / plot_multiple_bands, `eodal/core/band.py:1522`,
    `raster.py:1060-1076`): per render-bin count and exact integer
    mean of page length at a 64×64 render resolution."""
    geo = _pages_geo(spark).withColumn("n_chars", F.length("text"))
    return EX.heatmap_grid(geo, 6, value_col="n_chars", cell_res=RES)


def _q_morton_bbox_scan(spark, sf_dir):
    """Z-order layout end-to-end (≡ the COG tiled layout contract,
    `eodal/core/band.py` to_rasterio tiling): write the pages table
    Morton-sorted, turn the bbox covering into OR-of-BETWEEN morton
    ranges (row-group skipping at scan time — metric-asserted in
    tests/test_grid.py::test_morton_scan_metrics_skip_row_groups), and
    apply the exact bbox residual so the result is IDENTICAL to the
    direct query the oracle runs on the unsorted table."""
    import tempfile

    import numpy as np

    # cache the Morton-sorted fixture like the WARC/snapshot siblings —
    # re-sorting the table inside every timed/gated invocation would
    # measure fixture construction, not the pruned scan
    path = os.path.join(
        tempfile.gettempdir(), f"eodal_spark_morton_{N_PAGES}", "pages"
    )
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        (
            _pages_geo(spark)
            .withColumn("morton", grid.cell_morton("cell_id"))
            .repartitionByRange(16, "morton")
            .sortWithinPartitions("morton")
            .write.mode("overwrite")
            .parquet(path)
        )
    table = spark.read.parquet(path)
    lo_lon, hi_lon, lo_lat, hi_lat = BBOX_A
    cells = grid.np_bbox_cells_centi(lo_lon, hi_lon, lo_lat, hi_lat, RES)
    pred = grid.ranges_predicate("morton", grid.morton_ranges(cells))
    return table.filter(pred).filter(
        F.col("lon_centi").between(lo_lon, hi_lon - 1)
        & F.col("lat_centi").between(lo_lat, hi_lat - 1)
    ).select("url", "cell_id", "lat_centi", "lon_centi")


def _q_valid_counts(spark, sf_dir):
    """count_valid + all-invalid test (≡ eodal/utils/arrays.py:34-63
    count_valid and Sentinel2.is_blackfilled sentinel2.py:77-98)."""
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    return events.groupBy("event_type").agg(
        F.count(F.when(F.col("value") > 0, 1)).alias("n_valid"),
        F.expr("bool_and(value > 0)").alias("all_valid"),
        F.count(F.lit(1)).alias("n_total"),
    )


# ----- probabilistic operators with deterministic oracles ------------------
#
# Each of the four "probabilistic" operators is deterministic given its
# seed, and its output has an exact relational definition the oracle can
# compute directly:
#   * minhash_dedup verifies candidates with EXACT shingle Jaccard, and
#     banding recall on this corpus is total (verified at sf0.001/0.01:
#     output == all-pairs exact Jaccard ≥ threshold), so the oracle is
#     the same inverted-index SQL that gates docs_jaccard;
#   * simhash pigeonhole banding GUARANTEES recall at the requested
#     radius (dedup.py:357-364), so the output is exactly the Hamming
#     ball — the oracle recomputes the 64-bit signatures in DuckDB SQL
#     (Horner polynomial + splitmix64 under emulated 2^64 wraparound,
#     validated bit-exact against `_token_hashes`) and brute-forces
#     XOR popcount;
#   * IVF/SRP top-k run over a planted fixture whose true top-10 per
#     query (self + nine ×(1+j/1000) scaled copies) is provably inside
#     every probed bucket, so the ANN result equals the brute-force
#     quantized ranking the oracle computes.

SIMHASH_MAX_HAMMING = 10


def _q_docs_minhash_pairs(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return D.minhash_dedup(docs, threshold_milli=500)


def _q_docs_simhash_pairs(spark, sf_dir):
    docs = _docs_spread(spark, sf_dir)
    sigs = D.simhash_signatures(docs)
    return D.simhash_near_pairs(sigs, max_hamming=SIMHASH_MAX_HAMMING)


# emb_near_dup: planted near-duplicates are *scaled* copies (×1.001) —
# positive scaling provably preserves every SRP sign, so bucket collision
# (100% recall) is guaranteed and the query is deterministic.  Threshold
# 1e10 sits 2 decades above the planted q7 distance (~1e8) and 3 below
# the closest natural pair (~8e13 at sf0.01/0.1) — measured margins.
NEAR_DUP_THRESHOLD = 10_000_000_000
NEAR_DUP_PLANT = 50        # vec_id < 50 get a planted near-copy
NEAR_DUP_ID_OFFSET = 1_000_000


def _q_emb_near_dup(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    planted = emb.filter(F.col("vec_id") < NEAR_DUP_PLANT).select(
        (F.col("vec_id") + NEAR_DUP_ID_OFFSET).alias("vec_id"),
        F.transform(
            "embedding", lambda x: (x.cast("double") * F.lit(1.001)).cast("float")
        ).alias("embedding"),
    )
    uni = emb.select("vec_id", "embedding").unionByName(planted)
    dim = len(emb.select("embedding").first()[0])
    out = SIM.embedding_near_dup_pairs(
        uni, sqdist_threshold=NEAR_DUP_THRESHOLD, dim=dim, n_tables=4
    )
    return out.select("id_a", "id_b", "sqdist")


# ANN top-k fixture: corpus ∪ nine ×(1 + j/1000) scaled copies of each
# query vector.  Positive scaling provably preserves every SRP sign, so
# every copy collides with its query in every hash table; the copies'
# q7 distances (~8·10⁵ … 8·10⁷) sit six decades below the nearest
# natural neighbour (~1.2·10¹⁴, measured at sf0.001 and sf0.01), so the
# TRUE top-10 per query is self + the nine copies — all guaranteed
# candidates ⇒ the ANN output equals the brute-force oracle exactly.
TOPK_PLANT_BASE = 2_000_000
TOPK_PLANT_SCALES = [(j, f"1.{j:03d}") for j in range(1, 10)]


def _scale_fn(s: float):
    """Unary transform lambda scaling a float component by ``s`` — a
    factory, NOT a default-arg lambda: F.transform inspects lambda
    arity and would feed the ARRAY INDEX into a second parameter."""
    return lambda x: (x.cast("double") * F.lit(s)).cast("float")


def _emb_with_planted(emb):
    # ONE explode branch instead of a 9-way union: the per-branch form
    # re-instantiated every downstream Python stage (assign/encode)
    # once per branch — 20 ArrowEvalPython nodes in the ivfpq plan —
    # while the explode keeps a single scan + a single Python stage
    # per operator.  Same rows: float(lit) parses to the same IEEE
    # double in both engines, so the scaled float32 vectors and ids
    # are identical to the union form's.
    src = emb.filter(F.col("vec_id") < 5)
    plant = F.array(
        *[
            F.struct(
                (F.col("vec_id") * 100 + F.lit(TOPK_PLANT_BASE + j)).alias(
                    "vec_id"
                ),
                F.transform("embedding", _scale_fn(float(lit))).alias(
                    "embedding"
                ),
            )
            for j, lit in TOPK_PLANT_SCALES
        ]
    )
    copies = src.select(F.explode(plant).alias("p")).select(
        "p.vec_id", "p.embedding"
    )
    return emb.select("vec_id", "embedding").unionByName(copies)


# semantic-dedup fixture: three copies of each of the first 5 corpus
# vectors scaled by EXACT POWERS OF TWO (2, 4, 0.5).  Power-of-two
# scaling is exact in IEEE float/double, so the scaled vector's L2 norm
# scales exactly and its UNIT-NORMALIZED form is bit-identical to the
# source's — within whichever engine computes it.  The planted groups
# are therefore exactly the q7-identical normalized-vector groups (the
# oracle's definition), and SemDeDup must find them regardless of
# clustering: identical vectors always share a nearest centroid, and
# their cosine is exactly 1 ≥ tau.  Natural pairs top out at cosine
# ≈0.513 (measured at sf0.001/sf0.01) — four decades of margin below
# tau=0.95, so no natural link exists in either engine.
SEMDUP_PLANT_BASE = 3_000_000
SEMDUP_PLANT_SCALES = [(0, "2.0"), (1, "4.0"), (2, "0.5")]


def _q_emb_quantize_int8(spark, sf_dir):
    """Scalar int8 quantization of the embeddings table (FAISS SQ8
    storage prep) — `similarity.quantize_int8`: per-vector max-abs
    scale as an integer micro (gate-safe), symmetric round-away-from-
    zero values in [-127, 127]; zero vectors → zeros with scale 0.
    Map-side only (no shuffle, plan-asserted).  The gate hashes the
    FULL quantized vector (comma-joined) — float32→double is exact,
    the multiply chain is identically associated in the DuckDB twin,
    and both engines round ties away from zero.

    The operator itself stays shuffle-free (plan-asserted); the QUERY
    spreads the single-split embeddings scan first so the interpreted
    higher-order quantization chain runs on every core, not one
    (measured 5.4 s → sub-second at 22k vectors)."""
    emb = SIM._spread_corpus(
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    )
    q = SIM.quantize_int8(emb)
    return q.select(
        "vec_id",
        "scale_micro",
        F.array_join(
            F.transform(F.col("qvec"), lambda v: v.cast("string")), ","
        ).alias("qvec_str"),
    )


def _q_emb_semantic_dedup(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    # single explode branch (same rows as the historical 3-way union —
    # see _emb_with_planted on why branch count multiplies downstream
    # Python stages)
    src = emb.filter(F.col("vec_id") < 5)
    plant = F.array(
        *[
            F.struct(
                (F.col("vec_id") * 10 + F.lit(SEMDUP_PLANT_BASE + j)).alias(
                    "vec_id"
                ),
                F.transform("embedding", _scale_fn(float(lit))).alias(
                    "embedding"
                ),
            )
            for j, lit in SEMDUP_PLANT_SCALES
        ]
    )
    uni = emb.select("vec_id", "embedding").unionByName(
        src.select(F.explode(plant).alias("p")).select(
            "p.vec_id", "p.embedding"
        )
    )
    out = SIM.semantic_dedup(uni, tau=0.95, n_clusters=8, seed=7)
    return out.select("vec_id", "comp", "keep")


def _q_emb_ivf_topk(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    uni = _emb_with_planted(emb)
    q = emb.filter("vec_id < 5").select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    return SIM.ivf_topk(q, uni, k=10, n_centroids=8, n_probe=4).select(
        "query_id", "vec_id", "sqdist", "rank"
    )


BM25_QUERIES = [
    (0, "spark vector hash"),
    (1, "customer query window window"),
    (2, "stream batch"),
    # stopword-laden: table/merge/batch sit ABOVE the df cap and are
    # pruned from the index — only 'dup' (df ≈ 5%) and the sub-cap
    # commons score, so this query hash-gates the defense itself
    (3, "a the table merge batch dup"),
]
# the synthetic corpus has a near-FLAT df distribution (29 of 31 terms
# at ~0.78 doc frequency) — the production default 0.5 would empty the
# whole index here, proving nothing.  25/32 is exact in binary (no
# float-floor ambiguity between engines) and splits this vocabulary:
# ~half the terms are pruned as stopwords, ~half still score, so BOTH
# the capped and the surviving paths carry hash signal.
BM25_DF_CAP = 25 / 32


def _q_docs_bm25_topk(spark, sf_dir):
    """BM25 keyword retrieval over the documents inverted index
    (Robertson/Okapi, k1=6/5 b=3/4) — integer-exact micro-scaled
    scoring (see operators/retrieval.py), so the per-doc scores and
    the tie-broken ranking hash-match the DuckDB twin exactly.  The
    df-cap hot-bucket defense is ACTIVE (see BM25_DF_CAP): terms above
    the cap leave the index, and query 3's stopword-heavy text proves
    the pruned path end to end."""
    docs = _docs_spread(spark, sf_dir)
    q = spark.createDataFrame(BM25_QUERIES, ["query_id", "qtext"])
    return RET.bm25_topk(docs, q, k=10, max_df_frac=BM25_DF_CAP)


def _q_emb_ivfpq_topk(spark, sf_dir):
    """IVF-PQ ANN (Jégou et al. 2011 product quantization): coarse
    inverted lists + m-byte PQ codes + ADC shortlist + exact re-rank.
    On the planted fixture the top-10 per query is {self} ∪ {9 scaled
    copies}: all land in the query's probed lists with near-zero ADC
    estimates, survive any rerank ≥ 10, and the exact q7 re-rank makes
    the output hash-identical to the brute oracle."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    uni = _emb_with_planted(emb)
    q = emb.filter("vec_id < 5").select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    return SIM.ivfpq_topk(
        q, uni, k=10, n_centroids=8, n_probe=4, m=8, n_codes=16, rerank=64
    ).select("query_id", "vec_id", "sqdist", "rank")


def _q_emb_ann_srp(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    uni = _emb_with_planted(emb)
    q = emb.filter("vec_id < 5").select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    dim = len(emb.select("embedding").first()[0])
    out = SIM.ann_topk_srp(q, uni, k=10, dim=dim, n_planes=3, n_tables=8)
    return out.select("query_id", "vec_id", "sqdist", "rank")


def _q_emb_cosine_topk(spark, sf_dir):
    """Brute-force COSINE top-k (the brief's baseline alongside the L2
    one): on the planted fixture the top-10 per query is exactly
    {self} ∪ {its 9 positively-scaled copies} — cosine is
    scale-invariant, so their similarity is maximal by construction.
    The gate compares the SET (query_id, vec_id): rank order among the
    ≈1.0 ties depends on float rounding and is not a cross-engine
    contract, but set membership is (copies ≈1 vs natural ≪1)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    uni = _emb_with_planted(emb)
    q = emb.filter("vec_id < 5").select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    out = SIM.brute_force_topk_cosine(q, uni, k=10)
    return out.select("query_id", "vec_id")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Registered driver queries.

    ORDERING MATTERS: the round driver gates only the FIRST 50 dict entries.

    STANDING ROTATION POLICY (do not drop): every registered query must
    appear inside the 50-entry window at least every 2 rounds.  Each round,
    front-load (a) any query that has NEVER had a driver row, then (b) the
    queries parked outside the window LAST round, then fill the remaining
    slots with the queries whose code paths changed THIS round (they must
    re-prove hash-exactness); park only queries that are green as of the
    previous round and untouched this round.  With 100 registered queries and
    a 50-row window, parked entries are stale by exactly one round — never
    more.  All parked entries remain gated every round by the local DuckDB
    twin in tests/test_entry_oracles.

    Round 6 (100 registered, incl. the four post-freeze entries
    documented below the dict): positions 1-10 are the ten
    never-driver-checked queries (spatial_join_biglayer — the
    non-broadcast shuffle spatial-join plan — plus the nine round-6
    operators: knn_join, temporal_composite, stratified_sample,
    focal_mean, docs_lm_bigram, docs_exact_substr, docs_chunked,
    focal_gradient, docs_bpe_pieces); positions 11-46 are ALL 36
    queries parked in round 5 (every one r4-green, rotated back per
    the policy's half-cycle); positions 47-50 are r5-green queries
    whose code paths changed in round 6 and must re-prove
    hash-exactness: docs_bm25_topk (df-cap default + runtime
    micro-scale), areal_interpolate (conditional dim broadcast +
    Column-built apportionment), and the two snapshot_* gates the
    manifest-tier rewrite (root + immutable per-commit segments,
    binpack compaction) touches hardest: snapshot_pruned_scan (segment
    pruning) and snapshot_incremental (segment deltas).  Just outside
    at positions 51-55, r6-touched but lighter-touched and
    battery-tested in test_infra/test_plans: snapshot_deletes and
    snapshot_upsert (MoR anti-join semantics unchanged by the rewrite;
    only segment STORAGE moved — the in-window pruned_scan/incremental
    pair exercises the new segment logic directly),
    snapshot_partition_scan (per-dir spec grouping), snapshot_wap
    (refs path), spatial_join_exact (geometry.py box-constructor
    edits — exercised in-window by spatial_join_biglayer, same
    cover/refine geometry, same oracle family).  The 46 entries
    outside the window are ALL r5-green (stale by exactly one round,
    never more) and remain gated every round by the local DuckDB twin.
    """
    return {
        # -- never driver-checked (new this round) --------------------------
        "spatial_join_biglayer": _q_spatial_join_biglayer,
        "knn_join": _q_knn_join,
        "temporal_composite": _q_temporal_composite,
        "stratified_sample": _q_stratified_sample,
        "focal_mean": _q_focal_mean,
        "docs_lm_bigram": _q_docs_lm_bigram,
        "docs_exact_substr": _q_docs_exact_substr,
        "docs_chunked": _q_docs_chunked,
        "focal_gradient": _q_focal_gradient,
        "docs_bpe_pieces": _q_docs_bpe_pieces,
        # -- ALL 36 queries parked in round 5 — rotate back in --------------
        "q1_pricing_summary": _q1_pricing_summary,
        "q3_shipping_priority": _q3_shipping_priority,
        "events_window": _q_events_window,
        "events_sessions": _q_events_sessions,
        "url_canonical": _q_url_canonical,
        "host_stats": _q_host_stats,
        "docs_hash_sample": _q_docs_hash_sample,
        "link_pagerank": _q_link_pagerank,
        "emb_cosine_topk": _q_emb_cosine_topk,
        "emb_l2_topk": _q_emb_l2_topk,
        "emb_near_dup": _q_emb_near_dup,
        "docs_token_stats": _q_docs_token_stats,
        "docs_lang_id": _q_docs_lang_id,
        "docs_quality_filter": _q_docs_quality_filter,
        "docs_fingerprint": _q_docs_fingerprint,
        "multimodal_bytes": _q_multimodal_bytes,
        "product_uri_battery": _q_product_uri_battery,
        "morton_bbox_scan": _q_morton_bbox_scan,
        "bbox_cell_range": _q_bbox_cell_range,
        "poly_timeseries": _q_poly_timeseries,
        "poly_timeseries_reindexed": _q_poly_timeseries_reindexed,
        "cell_resample_mean": _q_cell_resample_mean,
        "cell_upsample_bilinear": _q_cell_upsample_bilinear,
        "filter_grammar": _q_filter_grammar,
        "sensor_s2_scale": _q_sensor_s2_scale,
        "text_extraction": _q_text_extraction,
        "warc_roundtrip": _q_warc_roundtrip,
        "tile_assignment": _q_tile_assignment,
        "zonal_stats": _q_zonal_stats,
        "mosaic_dedup": _q_mosaic_dedup,
        "duplicate_split": _q_duplicate_split,
        "tile_histogram": _q_tile_histogram,
        "sample_points": _q_sample_points,
        "adaptive_cells": _q_adaptive_cells,
        "asof_join": _q_asof_join,
        "q5_region_revenue": _q5_region_revenue,
        # -- r5-green, code paths touched in round 6 ------------------------
        "docs_bm25_topk": _q_docs_bm25_topk,
        "areal_interpolate": _q_areal_interpolate,
        "snapshot_pruned_scan": _q_snapshot_pruned_scan,
        "snapshot_incremental": _q_snapshot_incremental,
        # ------------------------------------------------------------------
        # Entries below are OUTSIDE the driver's 50-row window this round —
        # every one has a FRESH r5-green driver row (stale by exactly one
        # round; rotate back in round 7 per the policy above).  All remain
        # gated by the local DuckDB twin in tests/test_entry_oracles.
        # ------------------------------------------------------------------
        "snapshot_deletes": _q_snapshot_deletes,
        "snapshot_upsert": _q_snapshot_upsert,
        "snapshot_partition_scan": _q_snapshot_partition_scan,
        "snapshot_wap": _q_snapshot_wap,
        "spatial_join_exact": _q_spatial_join_exact,
        "snapshot_range_delete": _q_snapshot_range_delete,
        "snapshot_pos_delete": _q_snapshot_pos_delete,
        "snapshot_zorder_scan": _q_snapshot_zorder_scan,
        "snapshot_bloom_lookup": _q_snapshot_bloom_lookup,
        "polygon_overlay": _q_polygon_overlay,
        "emb_ivfpq_topk": _q_emb_ivfpq_topk,
        "docs_decontaminate": _q_docs_decontaminate,
        "docs_curation_pipeline": _q_docs_curation_pipeline,
        "emb_semantic_dedup": _q_emb_semantic_dedup,
        "docs_pii_scrub": _q_docs_pii_scrub,
        "docs_repetition": _q_docs_repetition,
        "docs_line_scrub": _q_docs_line_scrub,
        "indices_battery": _q_indices_battery,
        "lang_histogram": _q_lang_histogram,
        "bounds": _q_bounds,
        "part_antijoin": _q_part_antijoin,
        "orders_rollup": _q_orders_rollup,
        "segment_mode": _q_segment_mode,
        "heatmap_grid": _q_heatmap_grid,
        "setops_except": _q_setops_except,
        "share_en_per_tile": _q_share_en_per_tile,
        "rolling_events": _q_rolling_events,
        "scalar_battery": _q_scalar_battery,
        "sensor_landsat_qa": _q_sensor_landsat_qa,
        "scale_mask": _q_scale_mask,
        "valid_counts": _q_valid_counts,
        "cell_resample": _q_cell_resample,
        "cell_upsample": _q_cell_upsample,
        "value_histogram": _q_value_histogram,
        "docs_exact_dedup": _q_docs_exact_dedup,
        "docs_jaccard": _q_docs_jaccard,
        "knn": _q_knn,
        "docs_minhash_pairs": _q_docs_minhash_pairs,
        "docs_simhash_pairs": _q_docs_simhash_pairs,
        "docs_dup_groups": _q_docs_dup_groups,
        "emb_ivf_topk": _q_emb_ivf_topk,
        "emb_ann_srp": _q_emb_ann_srp,
        "spatial_join_centroid": _q_spatial_join_centroid,
        "spatial_join_holes": _q_spatial_join_holes,
        "spatial_join_buffered": _q_spatial_join_buffered,
        "cell_encode": _q_cell_encode,
        # -- registered after this round's window was frozen: never
        # -- driver-checked, gated by the local DuckDB twin this round,
        # -- front-loads into the round-7 window per the policy above
        "host_cap": _q_host_cap,
        "zonal_quantiles": _q_zonal_quantiles,
        "emb_quantize_int8": _q_emb_quantize_int8,
        "docs_curation_v2": _q_docs_curation_v2,
    }


# ---------------------------------------------------------------------------
# oracle SQL (DuckDB dialect)
# ---------------------------------------------------------------------------

def _duck_simhash_sigs() -> str:
    """DuckDB SQL computing the SAME 64-bit SimHash as
    `dedup.simhash_signatures` (validated bit-exact on all documents):
    ASCII-whitespace tokens → Horner polynomial byte hash (base
    1099511628211 mod 2^64) → splitmix64 finalizer → per-bit majority
    vote → 63-bit word.  2^64 wraparound is emulated on HUGEINT; the
    splitmix64 multiplies split the constant into 32-bit halves
    (h·C mod 2^64 = h·C_lo + ((h·C_hi) mod 2^32)·2^32 mod 2^64).
    Valid because the documents corpus is pure ASCII (ord == byte)."""
    c1h, c1l = 0xBF58476D1CE4E5B9 >> 32, 0xBF58476D1CE4E5B9 & 0xFFFFFFFF
    c2h, c2l = 0x94D049BB133111EB >> 32, 0x94D049BB133111EB & 0xFFFFFFFF
    m = 1 << 64
    return f"""
      toks AS (
        SELECT doc_id AS id,
               unnest(regexp_extract_all(text, '[^ \\t\\n\\x0B\\x0C\\r]+')) AS tok
        FROM documents
      ),
      th AS (
        SELECT id, xor(s4, s4 >> 31) AS h FROM (
          SELECT id,
            list_reduce(list_prepend(CAST(0 AS HUGEINT),
              list_transform(generate_series(1, length(tok)),
                             i -> CAST(ord(substr(tok, i, 1)) AS HUGEINT))),
              (a, c) -> (a * 1099511628211 + c) % {m}) AS h0,
            xor(h0, h0 >> 30) AS s1,
            (s1 * {c1l} + ((s1 * {c1h}) % 4294967296) * 4294967296) % {m} AS s2,
            xor(s2, s2 >> 27) AS s3,
            (s3 * {c2l} + ((s3 * {c2h}) % 4294967296) * 4294967296) % {m} AS s4
          FROM toks
        )
      ),
      votes AS (
        SELECT id, b, sum(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS v
        FROM th, UNNEST(generate_series(0, 62)) AS t(b)
        GROUP BY id, b
      ),
      sigs AS (
        SELECT d.doc_id AS id, COALESCE(CAST(s.w AS BIGINT), 0) AS simhash
        FROM documents d LEFT JOIN (
          SELECT id,
                 CAST(sum(CASE WHEN v > 0 THEN CAST(1 AS HUGEINT) << b
                               ELSE CAST(0 AS HUGEINT) END) AS HUGEINT) AS w
          FROM votes GROUP BY id
        ) s ON s.id = d.doc_id
      )
    """


def _semdup_plant_sql() -> str:
    """SQL twin of `_q_emb_semantic_dedup`'s power-of-two plant."""
    return " UNION ALL ".join(
        f"""SELECT vec_id * 10 + {SEMDUP_PLANT_BASE + j} AS vec_id,
              list_transform(embedding,
                x -> CAST(CAST(x AS DOUBLE) * CAST({lit} AS DOUBLE) AS FLOAT)) AS embedding
            FROM embeddings WHERE vec_id < 5"""
        for j, lit in SEMDUP_PLANT_SCALES
    )


def _plant_sql() -> str:
    """The planted scaled-copy UNION as DuckDB SQL — the single SQL
    twin of `_emb_with_planted` (used by every planted-fixture oracle,
    so the cast chain can never desync between them)."""
    return " UNION ALL ".join(
        f"""SELECT vec_id * 100 + {TOPK_PLANT_BASE + j} AS vec_id,
              list_transform(embedding,
                x -> CAST(CAST(x AS DOUBLE) * CAST({lit} AS DOUBLE) AS FLOAT)) AS embedding
            FROM embeddings WHERE vec_id < 5"""
        for j, lit in TOPK_PLANT_SCALES
    )


def _emb_topk_planted_oracle() -> str:
    """Brute-force quantized top-10 over corpus ∪ planted scaled copies
    — the exact answer both ANN variants (IVF, SRP) provably return on
    the planted fixture (see `_emb_with_planted`)."""
    plant = _plant_sql()
    return f"""
        WITH uni AS (
          SELECT vec_id, embedding FROM embeddings
          UNION ALL {plant}
        ),
        qq AS (
          SELECT vec_id,
                 list_transform(embedding,
                   x -> CAST(floor(CAST(x AS DOUBLE) * 10000000.0) AS BIGINT)) AS qv
          FROM uni
        )
        SELECT query_id, vec_id, sqdist, rank FROM (
          SELECT a.vec_id AS query_id, b.vec_id,
                 list_aggregate(list_transform(generate_series(1, len(a.qv)),
                   i -> (a.qv[i] - b.qv[i]) * (a.qv[i] - b.qv[i])), 'sum')::BIGINT AS sqdist,
                 row_number() OVER (PARTITION BY a.vec_id
                                    ORDER BY sqdist, b.vec_id) AS rank
          FROM (SELECT * FROM qq WHERE vec_id < 5) a, qq b
        ) WHERE rank <= 10
    """



def _emb_cosine_planted_oracle() -> str:
    """Brute-force cosine top-10 over corpus ∪ planted scaled copies,
    SET output (no rank — see `_q_emb_cosine_topk`)."""
    plant = _plant_sql()
    dot = (
        "list_aggregate(list_transform(generate_series(1, len(a.embedding)),"
        " i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)), 'sum')"
    )
    nrm = (
        lambda t: "sqrt(list_aggregate(list_transform("
        f"generate_series(1, len({t}.embedding)),"
        f" i -> CAST({t}.embedding[i] AS DOUBLE) * CAST({t}.embedding[i] AS DOUBLE)), 'sum'))"
    )
    return f"""
        WITH uni AS (
          SELECT vec_id, embedding FROM embeddings
          UNION ALL {plant}
        )
        SELECT query_id, vec_id FROM (
          SELECT a.vec_id AS query_id, b.vec_id,
                 row_number() OVER (PARTITION BY a.vec_id
                   ORDER BY {dot} / ({nrm('a')} * {nrm('b')}) DESC,
                            b.vec_id) AS rank
          FROM (SELECT * FROM uni WHERE vec_id < 5) a, uni b
        ) WHERE rank <= 10
    """


def _pagerank_oracle_sql() -> str:
    """The integer PageRank recurrence unrolled as nested CTEs — the
    oracle runs the SAME bigint floor arithmetic, so the gate is
    hash-exact (no float summation anywhere)."""
    from eodal_spark.operators.graph import MICRO, sql_links_subquery

    base = (1000 - 850) * MICRO // 1000
    ctes = [
        f"e AS (SELECT src, dst FROM {sql_links_subquery(LINK_N, LINK_DEG, 'duckdb')})",
        "d AS (SELECT src, count(*) AS deg FROM e GROUP BY src)",
        f"r0 AS (SELECT range AS id, CAST({MICRO} AS BIGINT) AS r FROM range({LINK_N}))",
    ]
    for k in range(1, LINK_ITERS + 1):
        ctes.append(
            f"r{k} AS ("
            f" SELECT t.id AS id,"
            f" {base} + (850 * COALESCE(s.s, 0)) // 1000 AS r"
            f" FROM range({LINK_N}) t(id)"
            f" LEFT JOIN ("
            f"   SELECT e.dst AS id, CAST(SUM(p.r // d.deg) AS BIGINT) AS s"
            f"   FROM e JOIN d ON d.src = e.src JOIN r{k - 1} p ON p.id = e.src"
            f"   GROUP BY e.dst"
            f" ) s ON s.id = t.id)"
        )
    return (
        "WITH " + ", ".join(ctes)
        + f" SELECT id, r AS rank_micro FROM r{LINK_ITERS}"
    )


def oracle_sql() -> dict[str, str]:
    pages = _duck_pages()
    _E_DUCK = P._exprs("duckdb", "range")
    polys = _polys_duck()
    cell = _duck_cell(RES)
    tile_cell = _duck_cell(TILE_RES)
    clon, clat = _duck_centroid(JOIN_RES)
    plon = "(lon_centi / 100.0 - 180.0)"
    plat = "(lat_centi / 100.0 - 90.0)"
    knn_q = " UNION ALL ".join(
        f"SELECT {qid} AS query_id, {la} AS q_lat, {lo} AS q_lon"
        for qid, la, lo in KNN_QUERIES
    )
    pts = " UNION ALL ".join(
        f"SELECT {pid} AS id, CAST({int(round((lon+180)*100))} AS BIGINT) AS p_lon_centi, "
        f"CAST({int(round((lat+90)*100))} AS BIGINT) AS p_lat_centi"
        for pid, lon, lat in SAMPLE_POINTS
    )
    pt_cell = grid.sql_cell_encode_centi("p_lon_centi", "p_lat_centi", JOIN_RES, "duckdb")
    cell6 = _duck_cell(6)
    cell9 = _duck_cell(9)
    # the BPE replace chain, one nested replace per fixed merge, over
    # the char-interleaved symbol string (\x1f separator, </w> marker)
    _sep = "\x1f"
    bpe_chain = f"regexp_replace(w, '(.)', '\\1{_sep}', 'g') || '</w>'"
    for _a, _b in _BPE_MERGES:
        bpe_chain = f"replace({bpe_chain}, '{_a}{_sep}{_b}', '{_a}{_b}')"

    en_words = TX.LANG_MARKERS["en"]
    count_word = lambda w: f"len(regexp_extract_all(lower(text), '\\b{w}\\b'))"  # noqa: E731
    lang_score = {
        lang: "(" + " + ".join(count_word(w) for w in ws) + ")"
        for lang, ws in TX.LANG_MARKERS.items()
    }
    n_tokens = "len(regexp_extract_all(trim(text), '\\S+'))"
    n_subtokens = "len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))"
    n_punct = "len(regexp_extract_all(text, '[^\\w\\s]'))"
    punct_milli = f"({n_punct} * 1000 // greatest(length(text), 1))"
    stop_hits = lang_score["en"]
    stop_milli = f"({stop_hits} * 1000 // greatest({n_tokens}, 1))"
    quality = (
        f"(CASE WHEN length(text) >= 20 AND length(text) <= 100000 THEN 400 ELSE 0 END"
        f" + CASE WHEN {punct_milli} < 300 THEN 300 ELSE 0 END"
        f" + CASE WHEN {stop_milli} > 0 THEN 300 ELSE 0 END)"
    )

    shingle_rel = (
        "(SELECT DISTINCT doc_id AS id, substr(text, g, 5) AS s "
        "FROM documents, UNNEST(generate_series(1, greatest(length(text) - 4, 1))) AS t(g))"
    )
    rev = "CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4))) AS DECIMAL(28,8))"

    return {
        "cell_encode": f"""
            SELECT url, {cell} AS cell_id, lat_centi, lon_centi FROM {pages}
        """,
        "text_extraction": f"""
            SELECT url, sha256(text) AS text_sha FROM {pages}
        """,
        "warc_roundtrip": f"""
            SELECT url, ts_sec, md5(html) AS html_md5, text, lang
            FROM (SELECT {_E_DUCK["url"]} AS url, {_E_DUCK["ts_sec"]} AS ts_sec,
                         {_E_DUCK["html"]} AS html, {_E_DUCK["text"]} AS text,
                         {_E_DUCK["lang"]} AS lang
                  FROM range({N_PAGES}))
        """,
        "tile_assignment": f"""
            SELECT url, {tile_cell} AS tile_cell, ts_sec // {BUCKET} AS ts_bucket
            FROM {pages}
        """,
        "spatial_join_centroid": f"""
            SELECT polys.poly_id, p.url
            FROM {pages} p, {polys}
            WHERE {_duck_pip(clon, clat)}
        """,
        "spatial_join_exact": f"""
            SELECT polys.poly_id, p.url
            FROM {pages} p, {polys}
            WHERE {_duck_pip(plon, plat)}
        """,
        # identical relation to spatial_join_exact — the gate's value is
        # that the SPARK side runs the shuffle (non-broadcast) plan
        "spatial_join_biglayer": f"""
            SELECT polys.poly_id, p.url
            FROM {pages} p, {polys}
            WHERE {_duck_pip(plon, plat)}
        """,
        "spatial_join_holes": f"""
            SELECT polys.poly_id, p.url
            FROM {pages} p, {_holed_polys_duck()}
            WHERE {geometry.sql_pip_even_odd_rings(
                plon, plat, "polys.rings_x", "polys.rings_y", "duckdb")}
        """,
        "spatial_join_buffered": _buffered_oracle(),
        "polygon_overlay": _overlay_oracle(),
        "areal_interpolate": _areal_oracle(),
        "zonal_stats": f"""
            SELECT polys.poly_id,
                   count(*) AS cnt,
                   min(length(p.text)) AS min_chars,
                   max(length(p.text)) AS max_chars,
                   CAST(sum(length(p.text)) AS BIGINT) AS sum_chars,
                   CAST(sum(length(p.text)) * 1000 // count(*) AS BIGINT) AS avg_chars_milli,
                   median(length(p.text)) AS median_chars
            FROM {pages} p, {polys}
            WHERE {_duck_pip(clon, clat)}
            GROUP BY polys.poly_id
        """,
        "mosaic_dedup": f"""
            SELECT cell_id, ts_bucket, url FROM (
              SELECT {cell} AS cell_id, ts_sec // {BUCKET} AS ts_bucket, url,
                     row_number() OVER (PARTITION BY {cell}, ts_sec // {BUCKET}
                                        ORDER BY ts_sec, url) AS rn
              FROM {pages}
            ) WHERE rn = 1
        """,
        "duplicate_split": f"""
            SELECT url, {cell} AS cell_id, ts_sec // {BUCKET} AS ts_bucket,
                   count(*) OVER (PARTITION BY {cell}, ts_sec // {BUCKET}) AS n_dup
            FROM {pages}
        """,
        "tile_histogram": f"""
            SELECT {tile_cell} AS tile_cell, ts_sec // {BUCKET} AS ts_bucket,
                   count(*) AS n_rows, count(DISTINCT {cell}) AS n_cells
            FROM {pages}
            GROUP BY 1, 2
        """,
        "knn": f"""
            SELECT query_id, url, sqdist, rank FROM (
              SELECT q.query_id, p.url,
                     (p.lat_centi - q.q_lat) * (p.lat_centi - q.q_lat)
                   + least(abs(p.lon_centi - q.q_lon), 36000 - abs(p.lon_centi - q.q_lon))
                   * least(abs(p.lon_centi - q.q_lon), 36000 - abs(p.lon_centi - q.q_lon)) AS sqdist,
                     row_number() OVER (PARTITION BY q.query_id
                                        ORDER BY sqdist, p.url) AS rank
              FROM {pages} p, ({knn_q}) q
            ) WHERE rank <= 5
        """,
        "knn_join": f"""
            WITH p AS (
              SELECT url, lat_centi, lon_centi,
                     (lon_centi * {1 << JOIN_RES} // 36000) AS x,
                     (lat_centi * {1 << JOIN_RES} // 18000) AS y
              FROM {pages}
            ),
            q AS (
              SELECT url AS qid, lat_centi AS qlat, lon_centi AS qlon,
                     x AS qx, y AS qy
              FROM p
              WHERE CAST(('0x' || substr(md5(url), 1, 8)) AS BIGINT) % 1000 < 10
            )
            SELECT qid AS query_id, url, sqdist, rank FROM (
              SELECT q.qid, p.url,
                     (p.lat_centi - q.qlat) * (p.lat_centi - q.qlat)
                   + least(abs(p.lon_centi - q.qlon), 36000 - abs(p.lon_centi - q.qlon))
                   * least(abs(p.lon_centi - q.qlon), 36000 - abs(p.lon_centi - q.qlon)) AS sqdist,
                     row_number() OVER (PARTITION BY q.qid
                                        ORDER BY sqdist, p.url) AS rank
              FROM p, q
              WHERE least(abs(p.x - q.qx), {1 << JOIN_RES} - abs(p.x - q.qx)) <= 2
                AND abs(p.y - q.qy) <= 2
            ) WHERE rank <= 3
        """,
        "temporal_composite": f"""
            SELECT {_duck_cell(6)} AS cell_id, ts_sec // {BUCKET} AS ts_bucket,
                   count(*) AS n_obs,
                   min(length(text)) AS v_min,
                   max(length(text)) AS v_max,
                   median(length(text)) AS v_median,
                   CAST(sum(length(text)) * 1000 // count(*) AS BIGINT) AS v_mean_milli
            FROM {pages}
            GROUP BY 1, 2
        """,
        "stratified_sample": f"""
            SELECT url, lang,
                   CAST(('0x' || substr(md5(url), 1, 8)) AS BIGINT) % 1000 AS bucket
            FROM {pages}
            WHERE CAST(('0x' || substr(md5(url), 1, 8)) AS BIGINT) % 1000 <
                  CASE lang WHEN 'en' THEN 500 WHEN 'de' THEN 250
                            WHEN 'fr' THEN 125 WHEN 'it' THEN 50 ELSE 10 END
        """,
        "focal_mean": f"""
            WITH src AS (
              SELECT (lon_centi * 64 // 36000) AS x,
                     (lat_centi * 64 // 18000) AS y,
                     count(*) AS v
              FROM {pages}
              GROUP BY 1, 2
            ),
            tgt AS (
              SELECT CAST(6 AS BIGINT) * {1 << 58}
                     + (((x + dx) % 64 + 64) % 64) * {1 << 29}
                     + (y + dy) AS cell_id,
                     v
              FROM src,
                   (SELECT unnest(generate_series(-1, 1)) AS dx) dxs,
                   (SELECT unnest(generate_series(-1, 1)) AS dy) dys
              WHERE y + dy >= 0 AND y + dy < 64
            )
            SELECT cell_id, count(*) AS n_src,
                   CAST(sum(v) AS BIGINT) AS v_sum,
                   min(v) AS v_min, max(v) AS v_max,
                   CAST(sum(v) * 1000 // count(*) AS BIGINT) AS v_mean_milli
            FROM tgt
            GROUP BY 1
        """,
        # Horn gradients: scatter form (target = source - offset) with
        # a VALUES weight table; x modular-wraps, y range-filters —
        # identical to the Spark plan's arithmetic
        "focal_gradient": f"""
            WITH src AS (
              SELECT (lon_centi * 64 // 36000) AS x,
                     (lat_centi * 64 // 18000) AS y,
                     count(*) AS v
              FROM {pages}
              GROUP BY 1, 2
            ),
            k(dx, dy, wx, wy) AS (VALUES
              (1, -1, 1, -1), (1, 0, 2, 0), (1, 1, 1, 1),
              (-1, -1, -1, -1), (-1, 0, -2, 0), (-1, 1, -1, 1),
              (0, 1, 0, 2), (0, -1, 0, -2)
            ),
            tgt AS (
              SELECT CAST(6 AS BIGINT) * {1 << 58}
                     + (((x - dx) % 64 + 64) % 64) * {1 << 29}
                     + (y - dy) AS cell_id,
                     v, wx, wy
              FROM src, k
              WHERE y - dy >= 0 AND y - dy < 64
            )
            SELECT cell_id, count(*) AS n_src,
                   CAST(sum(wx * v) AS BIGINT) AS gx8,
                   CAST(sum(wy * v) AS BIGINT) AS gy8
            FROM tgt
            GROUP BY 1
        """,
        "sample_points": f"""
            SELECT pts.id, p.url
            FROM ({pts}) pts
            LEFT JOIN (SELECT url, {_duck_cell(JOIN_RES)} AS pcell FROM {pages}) p
              ON p.pcell = {pt_cell}
        """,
        "lang_histogram": f"""
            SELECT d.lang, coalesce(c.n, 0) AS n,
                   coalesce(c.n, 0) * 1000 // {N_PAGES} AS share_milli
            FROM (VALUES ('en'), ('de'), ('fr'), ('it'), ('zz')) d(lang)
            LEFT JOIN (SELECT lang, count(*) AS n FROM {pages} GROUP BY lang) c
              ON d.lang = c.lang
        """,
        "bounds": f"""
            SELECT min(lat_centi) AS min_lat, max(lat_centi) AS max_lat,
                   min(lon_centi) AS min_lon, max(lon_centi) AS max_lon
            FROM {pages}
        """,
        "adaptive_cells": f"""
            WITH geo AS (SELECT url, lat_centi, lon_centi, {cell6} AS cell6 FROM {pages}),
                 hist AS (SELECT cell6, count(*) AS n FROM geo GROUP BY cell6)
            SELECT geo.url,
                   CASE WHEN hist.n > 500 THEN {cell9} ELSE geo.cell6 END AS cell_adaptive
            FROM geo JOIN hist USING (cell6)
        """,
        "asof_join": """
            SELECT event_id, okey FROM (
              SELECT e.event_id, o.o_orderkey AS okey,
                     row_number() OVER (PARTITION BY e.event_id
                                        ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
              FROM events e LEFT JOIN orders o
                ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
            ) WHERE rn = 1
        """,
        "q1_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
                   CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base,
                   CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4))) AS DECIMAL(28,8))) AS DOUBLE) AS sum_disc_price,
                   count(*) AS cnt
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
            GROUP BY l_returnflag, l_linestatus
        """,
        "q3_shipping_priority": f"""
            SELECT o_orderkey, CAST(_rev AS DOUBLE) AS revenue FROM (
              SELECT o.o_orderkey, sum({rev}) AS _rev
              FROM customer c
              JOIN orders o ON c.c_custkey = o.o_custkey
              JOIN lineitem l ON o.o_orderkey = l.l_orderkey
              WHERE c.c_mktsegment = 'BUILDING'
                AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
                AND l.l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
              GROUP BY o.o_orderkey
              ORDER BY _rev DESC, o.o_orderkey ASC
              LIMIT 10
            )
        """,
        "q5_region_revenue": f"""
            SELECT n.n_name,
                   CAST(sum({rev}) AS DOUBLE) AS revenue,
                   count(*) AS cnt
            FROM region r
            JOIN nation n ON n.n_regionkey = r.r_regionkey
            JOIN customer c ON c.c_nationkey = n.n_nationkey
            JOIN orders o ON o.o_custkey = c.c_custkey
            JOIN lineitem l ON l.l_orderkey = o.o_orderkey
            JOIN supplier s ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = c.c_nationkey
            WHERE r.r_name = 'ASIA'
            GROUP BY n.n_name
        """,
        "events_window": """
            SELECT user_id, event_id,
                   row_number() OVER w AS rn,
                   epoch_us(ts) - lag(epoch_us(ts)) OVER w AS gap_us
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        """,
        "events_sessions": """
            SELECT user_id, event_id,
                   CAST(sum(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
            FROM (
              SELECT user_id, event_id, ts,
                     CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                               OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
                          THEN 1 ELSE 0 END AS ns
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            )
        """,
        "part_antijoin": """
            SELECT p_partkey, p_size FROM part
            WHERE NOT EXISTS (
              SELECT 1 FROM lineitem
              WHERE l_partkey = p_partkey AND l_quantity >= 48
            )
        """,
        "orders_rollup": """
            SELECT o_orderstatus, o_orderpriority, count(*) AS cnt,
                   CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_total
            FROM orders
            GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
        """,
        "segment_mode": """
            SELECT n_name, mode_segment, n FROM (
              SELECT n.n_name, c.c_mktsegment AS mode_segment, count(*) AS n,
                     row_number() OVER (PARTITION BY n.n_name
                                        ORDER BY count(*) DESC, c.c_mktsegment ASC) AS rn
              FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
              GROUP BY n.n_name, c.c_mktsegment
            ) WHERE rn = 1
        """,
        "docs_exact_dedup": """
            SELECT min(doc_id) AS doc_id FROM documents GROUP BY text
        """,
        "docs_jaccard": f"""
            WITH sh AS {shingle_rel},
                 sizes AS (SELECT id, count(*) AS n FROM sh GROUP BY id),
                 pairs AS (
                   SELECT a.id AS id_a, b.id AS id_b, count(*) AS inter
                   FROM sh a JOIN sh b ON a.s = b.s AND a.id < b.id
                   GROUP BY a.id, b.id
                 )
            SELECT id_a, id_b, inter, (na.n + nb.n - inter) AS uni
            FROM pairs
            JOIN sizes na ON na.id = id_a
            JOIN sizes nb ON nb.id = id_b
            WHERE inter * 1000 >= 500 * (na.n + nb.n - inter)
        """,
        "link_pagerank": _pagerank_oracle_sql(),
        "docs_hash_sample": f"""
            SELECT doc_id,
                   CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 1000 AS bucket
            FROM documents
            WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 1000 < 200
        """,
        # SQ8 quantization: identical (127*x)*1e6/scale_micro chain
        # (left-associated both engines), ties round away from zero in
        # both; the full quantized vector is hashed comma-joined
        "emb_quantize_int8": """
            WITH s AS (
              SELECT vec_id, embedding,
                     CAST(FLOOR(list_aggregate(
                       list_transform(embedding,
                                      x -> abs(CAST(x AS DOUBLE))),
                       'max') * 1e6) AS BIGINT) AS scale_micro
              FROM embeddings
            )
            SELECT vec_id, scale_micro,
                   CASE WHEN scale_micro <= 0 THEN
                     array_to_string(list_transform(embedding, x -> '0'), ',')
                   ELSE
                     array_to_string(list_transform(embedding,
                       x -> CAST(CAST(ROUND(127.0 * CAST(x AS DOUBLE)
                                  * 1000000.0 / scale_micro)
                                  AS INTEGER) AS VARCHAR)), ',')
                   END AS qvec_str
            FROM s
        """,
        # exact per-zone quantiles: identical histogram -> cumulative
        # span -> integer rank-pick arithmetic (lower nearest rank)
        "zonal_quantiles": f"""
            WITH g AS (
              SELECT {cell6} AS zone, length(text) AS v FROM {pages}
            ),
            h AS (SELECT zone, v, COUNT(*) AS c FROM g GROUP BY 1, 2),
            cum AS (
              SELECT zone, v, c,
                     SUM(c) OVER (PARTITION BY zone) AS n,
                     SUM(c) OVER (PARTITION BY zone ORDER BY v
                                  ROWS UNBOUNDED PRECEDING) AS hi
              FROM h
            )
            SELECT zone, p_milli, v AS q_value, CAST(n AS BIGINT) AS n
            FROM cum, (SELECT unnest([250, 500, 750, 900]) AS p_milli)
            WHERE hi - c < 1 + (n - 1) * p_milli // 1000
              AND 1 + (n - 1) * p_milli // 1000 <= hi
        """,
        # per-host quota: the naive single ROW_NUMBER is the correct
        # twin of the two-phase salted plan (phase 1 never drops a
        # true winner - each ranks <= n inside its own salt bucket)
        "host_cap": f"""
            SELECT host, url FROM (
              SELECT regexp_extract(url, '://([^/]*)', 1) AS host, url,
                     ROW_NUMBER() OVER (
                       PARTITION BY regexp_extract(url, '://([^/]*)', 1)
                       ORDER BY url) AS rn
              FROM {pages}
            ) WHERE rn <= 3
        """,
        "host_stats": f"""
            SELECT regexp_extract(url, '://([^/]*)', 1) AS host,
                   count(*) AS n_pages,
                   count(DISTINCT lang) AS n_langs,
                   min(url) AS first_url
            FROM {pages}
            GROUP BY 1
        """,
        "url_canonical": f"""
            SELECT range AS rid,
                   'https://site' || CAST({P._exprs("duckdb", "range")["h"]} % 1000 AS VARCHAR)
                   || '.example'
                   || CASE WHEN range % 3 = 1 THEN ':8443' ELSE '' END
                   || '/p/' || CAST(range AS VARCHAR)
                   || '?a=' || CAST(range % 5 AS VARCHAR)
                   || '&b=' || CAST(range % 7 AS VARCHAR) AS curl
            FROM range({N_PAGES})
        """,
        "docs_dup_groups": f"""
            WITH RECURSIVE sh AS {shingle_rel},
                 sizes AS (SELECT id, count(*) AS n FROM sh GROUP BY id),
                 pairs AS (
                   SELECT a.id AS id_a, b.id AS id_b, count(*) AS inter
                   FROM sh a JOIN sh b ON a.s = b.s AND a.id < b.id
                   GROUP BY a.id, b.id
                   HAVING count(*) * 1000 >= 500 * (
                     (SELECT n FROM sizes WHERE id = a.id)
                     + (SELECT n FROM sizes WHERE id = b.id) - count(*))
                 ),
                 edges AS (
                   SELECT id_a AS u, id_b AS v FROM pairs
                   UNION SELECT id_b, id_a FROM pairs
                 ),
                 reach(id, r) AS (
                   SELECT u, u FROM edges
                   UNION
                   SELECT e.u, reach.r FROM edges e JOIN reach ON reach.id = e.v
                 )
            SELECT d.doc_id, coalesce(min(reach.r), d.doc_id) AS group_id
            FROM documents d LEFT JOIN reach ON reach.id = d.doc_id
            GROUP BY d.doc_id
        """,
        "docs_token_stats": f"""
            SELECT doc_id,
                   {n_tokens} AS n_tokens,
                   {n_subtokens} AS n_subtokens,
                   {punct_milli} AS punct_milli,
                   {stop_milli} AS stop_milli,
                   {quality} AS quality_milli
            FROM documents
        """,
        # Gopher-style repetition signals: DuckDB list lambdas replicate
        # the Spark higher-order functions term for term; all-integer
        # per-mille arithmetic (// floor division both engines)
        "docs_repetition": """
            SELECT doc_id, dup_line_milli, dup_line_char_milli,
                   top2gram_milli, bullet_ellipsis_milli,
                   (dup_line_milli < 300 AND dup_line_char_milli < 200
                    AND top2gram_milli < 200
                    AND bullet_ellipsis_milli < 900) AS repetition_ok
            FROM (
              SELECT doc_id,
                CAST(CASE WHEN nl <= 0 THEN 0
                          ELSE ((nl - ndl) * 1000) // nl END AS BIGINT)
                  AS dup_line_milli,
                CAST((dup_chars * 1000) // greatest(length(text), 1)
                     AS BIGINT) AS dup_line_char_milli,
                CAST(CASE WHEN nw < 2 THEN 0
                          ELSE (gmass * 1000) // greatest(length(text), 1)
                     END AS BIGINT) AS top2gram_milli,
                CAST(CASE WHEN nl <= 0 THEN 0
                          ELSE (bhits * 1000) // nl END AS BIGINT)
                  AS bullet_ellipsis_milli
              FROM (
                SELECT doc_id, text,
                  len(lines) AS nl,
                  len(list_distinct(lines)) AS ndl,
                  CAST(coalesce(list_sum(list_transform(
                    list_filter(lines,
                      x -> len(list_filter(lines, y -> y = x)) > 1),
                    x -> length(x))), 0) AS BIGINT) AS dup_chars,
                  len(words) AS nw,
                  CAST(coalesce(list_max(list_transform(
                    list_distinct(grams),
                    g -> len(list_filter(grams, x -> x = g)) * length(g))),
                    0) AS BIGINT) AS gmass,
                  len(list_filter(lines,
                    x -> starts_with(x, '-') OR starts_with(x, '*')
                         OR ends_with(x, '...'))) AS bhits
                FROM (
                  SELECT doc_id, text, lines, words,
                    list_transform(
                      range(1, greatest(len(words) - 1, 1) + 1),
                      i -> words[i] || ' ' || words[i + 1]) AS grams
                  FROM (
                    SELECT doc_id, text,
                      string_split(text, chr(10)) AS lines,
                      list_filter(regexp_split_to_array(text, '\\s+'),
                                  w -> length(w) > 0) AS words
                    FROM documents
                  )
                )
              )
            )
        """,
        # benchmark decontamination: train doc flagged iff it shares a
        # word-4-gram with the doc_id%50=3 benchmark slice; same
        # regexp tokenization as the Spark side
        # CCNet bigram-LM gate: identical md5 slice rule, identical
        # tokenization, bigrams via generate_series; the gated columns
        # are all-integer (counts + coalesced count masses) so the
        # hash is float-free — the log/exp perplexity on top is
        # python-reference-tested locally (tests/test_lm.py)
        "docs_lm_bigram": """
            WITH words AS (
              SELECT doc_id,
                     list_filter(regexp_split_to_array(lower(text), '\\s+'),
                                 w -> w <> '') AS ws
              FROM documents
            ),
            bg AS (
              SELECT doc_id, ws[i] AS w1, ws[i+1] AS w2
              FROM words, UNNEST(generate_series(1, len(ws) - 1)) AS t(i)
            ),
            ref AS (
              SELECT w1, w2, COUNT(*) AS c2
              FROM bg
              WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                         AS BIGINT) % 1000 < 200
              GROUP BY 1, 2
            ),
            ctx AS (SELECT w1, CAST(SUM(c2) AS BIGINT) AS c1 FROM ref GROUP BY 1)
            SELECT b.doc_id,
                   COUNT(*) AS n_bigrams,
                   CAST(SUM(CASE WHEN r.c2 IS NULL THEN 0 ELSE 1 END)
                        AS BIGINT) AS n_seen,
                   CAST(SUM(CASE WHEN c.c1 IS NULL THEN 0 ELSE 1 END)
                        AS BIGINT) AS n_ctx,
                   CAST(SUM(COALESCE(r.c2, 0)) AS BIGINT) AS sum_c2,
                   CAST(SUM(COALESCE(c.c1, 0)) AS BIGINT) AS sum_c1
            FROM bg b
            LEFT JOIN ref r ON b.w1 = r.w1 AND b.w2 = r.w2
            LEFT JOIN ctx c ON b.w1 = c.w1
            GROUP BY 1
        """,
        # BPE application: identical fixed merge table as one nested
        # replace chain per word inside a list lambda — same greedy
        # resume-after-match semantics both engines
        "docs_bpe_pieces": f"""
            WITH words AS (
              SELECT doc_id,
                     list_filter(regexp_split_to_array(lower(text), '\\s+'),
                                 w -> w <> '') AS ws
              FROM documents
            ),
            p AS (
              SELECT doc_id,
                     len(ws) AS n_words,
                     flatten(list_transform(ws,
                       w -> string_split({bpe_chain}, '{_sep}'))) AS pieces
              FROM words
            )
            SELECT doc_id,
                   CAST(n_words AS BIGINT) AS n_words,
                   CAST(len(pieces) AS BIGINT) AS n_pieces,
                   array_to_string(pieces, ' ') AS piece_str
            FROM p
        """,
        # passage chunking: identical strided windows (size 32, overlap
        # 8, step 24), 1-based inclusive slices, single-space joins;
        # chunk_id = (start-1)//step since starts are exactly 1+k*step
        "docs_chunked": """
            WITH words AS (
              SELECT doc_id,
                     list_filter(regexp_split_to_array(text, '\\s+'),
                                 w -> w <> '') AS ws
              FROM documents
            ),
            sized AS (
              SELECT doc_id, ws,
                     CASE WHEN len(ws) <= 0 THEN 0
                          ELSE GREATEST((len(ws) - 8 - 1) // 24 + 1, 1)
                     END AS n_chunks
              FROM words
            )
            SELECT doc_id,
                   CAST((s - 1) // 24 AS BIGINT) AS chunk_id,
                   CAST(len(ws[s:s+31]) AS BIGINT) AS n_tokens,
                   array_to_string(ws[s:s+31], ' ') AS chunk
            FROM sized,
                 UNNEST(generate_series(1, (n_chunks - 1) * 24 + 1, 24))
                   AS t(s)
            WHERE n_chunks > 0
        """,
        # curation v2 composition: the lm-hit and substr-coverage
        # filters are the same CTE bodies as their individual gates;
        # chunking runs on the RAW-case words (chunk_tokens does not
        # lowercase), the filters on the lowercased stream
        "docs_curation_v2": """
            WITH raw AS (
              SELECT doc_id,
                     list_filter(regexp_split_to_array(text, '\\s+'),
                                 w -> w <> '') AS ws
              FROM documents
            ),
            low AS (
              SELECT doc_id,
                     list_filter(regexp_split_to_array(lower(text), '\\s+'),
                                 w -> w <> '') AS ws
              FROM documents
            ),
            bg AS (
              SELECT doc_id, ws[i] AS w1, ws[i+1] AS w2
              FROM low, UNNEST(generate_series(1, len(ws) - 1)) AS t(i)
            ),
            ref AS (
              SELECT w1, w2, COUNT(*) AS c2
              FROM bg
              WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                         AS BIGINT) % 1000 < 200
              GROUP BY 1, 2
            ),
            lmok AS (
              SELECT b.doc_id
              FROM bg b LEFT JOIN ref r ON b.w1 = r.w1 AND b.w2 = r.w2
              GROUP BY 1
              HAVING SUM(CASE WHEN r.c2 IS NULL THEN 0 ELSE 1 END) * 1000
                     >= COUNT(*) * 500
            ),
            wins AS (
              SELECT doc_id, i AS pos, array_to_string(ws[i:i+9], ' ') AS ng
              FROM low, UNNEST(generate_series(1, len(ws) - 9)) AS t(i)
            ),
            hot AS (SELECT ng FROM wins GROUP BY ng HAVING COUNT(*) >= 2),
            dup AS (
              SELECT doc_id, pos,
                     pos - LAG(pos) OVER (PARTITION BY doc_id ORDER BY pos)
                       AS delta
              FROM wins WHERE ng IN (SELECT ng FROM hot)
            ),
            spans AS (
              SELECT doc_id,
                     CAST(SUM(CASE WHEN delta IS NULL OR delta > 10
                                   THEN 10 ELSE LEAST(delta, 10) END)
                          AS BIGINT) AS dup_tokens
              FROM dup GROUP BY 1
            ),
            subok AS (
              SELECT l.doc_id
              FROM low l LEFT JOIN spans s USING (doc_id)
              WHERE CASE WHEN len(l.ws) <= 0 THEN 0
                         ELSE (COALESCE(s.dup_tokens, 0) * 1000)
                              // len(l.ws) END <= 300
            ),
            kept AS (
              SELECT r.doc_id, r.ws
              FROM raw r
              JOIN lmok USING (doc_id) JOIN subok USING (doc_id)
            ),
            sized AS (
              SELECT doc_id, ws,
                     CASE WHEN len(ws) <= 0 THEN 0
                          ELSE GREATEST((len(ws) - 8 - 1) // 24 + 1, 1)
                     END AS n_chunks
              FROM kept
            )
            SELECT doc_id,
                   CAST((s - 1) // 24 AS BIGINT) AS chunk_id,
                   CAST(len(ws[s:s+31]) AS BIGINT) AS n_tokens,
                   array_to_string(ws[s:s+31], ' ') AS chunk
            FROM sized,
                 UNNEST(generate_series(1, (n_chunks - 1) * 24 + 1, 24))
                   AS t(s)
            WHERE n_chunks > 0
        """,
        # ExactSubstr span stats: identical windows (10-gram, 1-based
        # inclusive slices), identical HAVING >= 2 hot set, identical
        # gaps-and-islands LAG merge; all-integer output
        "docs_exact_substr": """
            WITH words AS (
              SELECT doc_id,
                     list_filter(regexp_split_to_array(lower(text), '\\s+'),
                                 w -> w <> '') AS ws
              FROM documents
            ),
            wins AS (
              SELECT doc_id, i AS pos, array_to_string(ws[i:i+9], ' ') AS ng
              FROM words, UNNEST(generate_series(1, len(ws) - 9)) AS t(i)
            ),
            hot AS (SELECT ng FROM wins GROUP BY ng HAVING COUNT(*) >= 2),
            dup AS (
              SELECT doc_id, pos,
                     pos - LAG(pos) OVER (PARTITION BY doc_id ORDER BY pos)
                       AS delta
              FROM wins WHERE ng IN (SELECT ng FROM hot)
            ),
            spans AS (
              SELECT doc_id,
                     COUNT(*) AS n_dup_windows,
                     CAST(SUM(CASE WHEN delta IS NULL OR delta > 10
                                   THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_dup_spans,
                     CAST(SUM(CASE WHEN delta IS NULL OR delta > 10
                                   THEN 10 ELSE LEAST(delta, 10) END)
                          AS BIGINT) AS dup_tokens
              FROM dup GROUP BY doc_id
            )
            SELECT w.doc_id,
                   CAST(len(w.ws) AS BIGINT) AS n_tokens,
                   CAST(GREATEST(len(w.ws) - 9, 0) AS BIGINT) AS n_windows,
                   CAST(COALESCE(s.n_dup_windows, 0) AS BIGINT)
                     AS n_dup_windows,
                   CAST(COALESCE(s.n_dup_spans, 0) AS BIGINT) AS n_dup_spans,
                   CAST(COALESCE(s.dup_tokens, 0) AS BIGINT) AS dup_tokens,
                   CAST(CASE WHEN len(w.ws) <= 0 THEN 0
                             ELSE (COALESCE(s.dup_tokens, 0) * 1000)
                                  // len(w.ws) END AS BIGINT)
                     AS dup_token_milli
            FROM words w LEFT JOIN spans s USING (doc_id)
        """,
        "docs_decontaminate": """
            WITH words AS (
              SELECT doc_id,
                     list_filter(regexp_split_to_array(lower(text), '\\s+'),
                                 w -> w <> '') AS ws
              FROM documents
            ),
            bench_ng AS (
              SELECT DISTINCT array_to_string(ws[i:i+3], ' ') AS ng
              FROM words, UNNEST(generate_series(1, len(ws) - 3)) AS t(i)
              WHERE doc_id % 50 = 3
            ),
            hits AS (
              SELECT DISTINCT w.doc_id
              FROM words w,
                   UNNEST(generate_series(1, len(ws) - 3)) AS t(i)
              WHERE w.doc_id % 50 <> 3
                AND array_to_string(ws[i:i+3], ' ')
                    IN (SELECT ng FROM bench_ng)
            )
            SELECT w.doc_id,
                   CAST(CASE WHEN h.doc_id IS NULL THEN 0 ELSE 1 END
                        AS INTEGER) AS contaminated
            FROM words w LEFT JOIN hits h ON w.doc_id = h.doc_id
            WHERE w.doc_id % 50 <> 3
        """,
        # corpus-level boilerplate line scrub: lines >=10 chars in >=2
        # distinct docs dropped everywhere, order preserved (zipped
        # unnest gives (pos, line); string_agg ORDER BY pos rebuilds)
        "docs_pii_scrub": """
            WITH planted AS (
              SELECT doc_id,
                     CASE WHEN doc_id % 5 = 0 THEN
                       text || ' mail user' || CAST(doc_id AS VARCHAR)
                            || '@example.com or +1234567'
                            || CAST(doc_id AS VARCHAR)
                            || ' from 10.0.0.'
                            || CAST(doc_id % 256 AS VARCHAR)
                     ELSE text END AS text
              FROM documents
            ), c AS (
              SELECT doc_id, text,
                len(regexp_extract_all(text,
                  '[A-Za-z0-9._%+-]+@[A-Za-z0-9-]+(?:\\.[A-Za-z0-9-]+)+'))
                  AS n_email,
                len(regexp_extract_all(text,
                  '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b')) AS n_ipv4,
                len(regexp_extract_all(text, '\\+\\d{7,15}\\b')) AS n_phone
              FROM planted
            )
            SELECT doc_id, n_email, n_ipv4, n_phone,
                   n_email + n_ipv4 + n_phone AS pii_total,
                   md5(regexp_replace(regexp_replace(regexp_replace(text,
                     '[A-Za-z0-9._%+-]+@[A-Za-z0-9-]+(?:\\.[A-Za-z0-9-]+)+',
                     '<EMAIL>', 'g'),
                     '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b', '<IP>', 'g'),
                     '\\+\\d{7,15}\\b', '<PHONE>', 'g')) AS scrub_md5
            FROM c
        """,
        "docs_line_scrub": """
            WITH docl AS (
              SELECT doc_id,
                     unnest(range(1, len(lines) + 1)) AS pos,
                     unnest(lines) AS line
              FROM (
                SELECT doc_id, string_split(text, chr(10)) AS lines
                FROM documents
              )
            ),
            bad AS (
              SELECT line
              FROM (SELECT DISTINCT doc_id, line FROM docl
                    WHERE length(line) >= 10)
              GROUP BY line HAVING count(*) >= 2
            ),
            kept AS (
              SELECT d.doc_id, d.pos, d.line
              FROM docl d LEFT JOIN bad b ON d.line = b.line
              WHERE b.line IS NULL
            )
            SELECT doc.doc_id,
                   coalesce(string_agg(k.line, chr(10) ORDER BY k.pos), '')
                     AS text,
                   CAST(len(string_split(doc.text, chr(10))) - count(k.line)
                        AS BIGINT) AS n_removed
            FROM documents doc LEFT JOIN kept k ON k.doc_id = doc.doc_id
            GROUP BY doc.doc_id, doc.text
        """,
        "docs_lang_id": f"""
            SELECT doc_id,
                   CASE WHEN greatest({lang_score['de']}, {lang_score['en']},
                                      {lang_score['fr']}, {lang_score['it']}) = 0 THEN 'und'
                        WHEN {lang_score['de']} >= greatest({lang_score['en']}, {lang_score['fr']}, {lang_score['it']}) THEN 'de'
                        WHEN {lang_score['en']} >= greatest({lang_score['fr']}, {lang_score['it']}) THEN 'en'
                        WHEN {lang_score['fr']} >= {lang_score['it']} THEN 'fr'
                        ELSE 'it' END AS lang_guess
            FROM documents
        """,
        "docs_quality_filter": f"""
            SELECT doc_id, quality_milli, lang_guess FROM (
              SELECT doc_id,
                     {quality} AS quality_milli,
                     CASE WHEN greatest({lang_score['de']}, {lang_score['en']},
                                        {lang_score['fr']}, {lang_score['it']}) = 0 THEN 'und'
                          WHEN {lang_score['de']} >= greatest({lang_score['en']}, {lang_score['fr']}, {lang_score['it']}) THEN 'de'
                          WHEN {lang_score['en']} >= greatest({lang_score['fr']}, {lang_score['it']}) THEN 'en'
                          WHEN {lang_score['fr']} >= {lang_score['it']} THEN 'fr'
                          ELSE 'it' END AS lang_guess
              FROM documents
            ) WHERE quality_milli >= 700 AND lang_guess = 'en'
        """,
        "docs_curation_pipeline": f"""
            SELECT doc_id, quality_milli,
                   CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 1000 AS bucket
            FROM (
              SELECT doc_id, {quality} AS quality_milli,
                     CASE WHEN greatest({lang_score['de']}, {lang_score['en']},
                                        {lang_score['fr']}, {lang_score['it']}) = 0 THEN 'und'
                          WHEN {lang_score['de']} >= greatest({lang_score['en']}, {lang_score['fr']}, {lang_score['it']}) THEN 'de'
                          WHEN {lang_score['en']} >= greatest({lang_score['fr']}, {lang_score['it']}) THEN 'en'
                          WHEN {lang_score['fr']} >= {lang_score['it']} THEN 'fr'
                          ELSE 'it' END AS lang_guess
              FROM documents
            )
            WHERE quality_milli >= 700 AND lang_guess = 'en'
              AND doc_id IN (SELECT min(doc_id) FROM documents GROUP BY text)
              AND CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 1000 < 500
        """,
        "docs_fingerprint": """
            SELECT doc_id,
                   list_aggregate(list_transform(
                     generate_series(1, greatest(length(text) - 7, 1)),
                     i -> md5(substr(text, i, 8))), 'min') AS fp
            FROM documents
        """,
        "emb_l2_topk": f"""
            SELECT query_id, vec_id, rank, sqdist FROM (
              SELECT q.vec_id AS query_id, e.vec_id,
                     list_aggregate(list_transform(
                       generate_series(1, len(e.embedding)),
                       i -> (CAST(floor(CAST(e.embedding[i] AS DOUBLE) * 10000000.0) AS BIGINT) - CAST(floor(CAST(q.embedding[i] AS DOUBLE) * 10000000.0) AS BIGINT))
                          * (CAST(floor(CAST(e.embedding[i] AS DOUBLE) * 10000000.0) AS BIGINT) - CAST(floor(CAST(q.embedding[i] AS DOUBLE) * 10000000.0) AS BIGINT))
                     ), 'sum')::BIGINT AS sqdist,
                     row_number() OVER (PARTITION BY q.vec_id
                                        ORDER BY sqdist, e.vec_id) AS rank
              FROM embeddings e, (SELECT * FROM embeddings WHERE vec_id < 5) q
            ) WHERE rank <= 10
        """,
        "emb_near_dup": f"""
            WITH uni AS (
              SELECT vec_id, embedding FROM embeddings
              UNION ALL
              SELECT vec_id + {NEAR_DUP_ID_OFFSET} AS vec_id,
                     list_transform(embedding,
                       x -> CAST(CAST(x AS DOUBLE) * CAST(1.001 AS DOUBLE) AS FLOAT)) AS embedding
              FROM embeddings WHERE vec_id < {NEAR_DUP_PLANT}
            ),
            q AS (
              SELECT vec_id,
                     list_transform(embedding,
                       x -> CAST(floor(CAST(x AS DOUBLE) * 10000000.0) AS BIGINT)) AS qv
              FROM uni
            )
            SELECT id_a, id_b, sqdist FROM (
              SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                     list_aggregate(list_transform(generate_series(1, len(a.qv)),
                       i -> (a.qv[i] - b.qv[i]) * (a.qv[i] - b.qv[i])), 'sum')::BIGINT AS sqdist
              FROM q a, q b
              WHERE a.vec_id < b.vec_id
            ) WHERE sqdist <= {NEAR_DUP_THRESHOLD}
        """,
        # minhash_dedup verifies LSH candidates with EXACT shingle
        # Jaccard; banding recall is total on this corpus (verified
        # sf0.001 + sf0.01), so the output equals the all-pairs
        # inverted-index set — the same SQL that gates docs_jaccard.
        "docs_minhash_pairs": f"""
            WITH sh AS {shingle_rel},
                 sizes AS (SELECT id, count(*) AS n FROM sh GROUP BY id),
                 pairs AS (
                   SELECT a.id AS id_a, b.id AS id_b, count(*) AS inter
                   FROM sh a JOIN sh b ON a.s = b.s AND a.id < b.id
                   GROUP BY a.id, b.id
                 )
            SELECT id_a, id_b, inter, (na.n + nb.n - inter) AS uni
            FROM pairs
            JOIN sizes na ON na.id = id_a
            JOIN sizes nb ON nb.id = id_b
            WHERE inter * 1000 >= 500 * (na.n + nb.n - inter)
        """,
        # pigeonhole banding guarantees recall at the radius, so the
        # output is exactly the Hamming ball — brute-force XOR popcount
        # over signatures recomputed bit-exactly in SQL.
        "docs_simhash_pairs": f"""
            WITH {_duck_simhash_sigs()}
            SELECT id_a, id_b, hamming FROM (
              SELECT a.id AS id_a, b.id AS id_b,
                     CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
              FROM sigs a JOIN sigs b ON a.id < b.id
            ) WHERE hamming <= {SIMHASH_MAX_HAMMING}
        """,
        "emb_semantic_dedup": f"""
        WITH uni AS (
          SELECT vec_id, embedding FROM embeddings
          UNION ALL {_semdup_plant_sql()}
        ),
        nq AS (
          SELECT vec_id,
                 array_to_string(list_transform(embedding,
                   x -> CAST(floor(CAST(x AS DOUBLE)
                     / sqrt(list_aggregate(list_transform(embedding,
                         y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE)), 'sum'))
                     * 10000000.0) AS BIGINT)), ',') AS qn
          FROM uni
        )
        SELECT vec_id,
               MIN(vec_id) OVER (PARTITION BY qn) AS comp,
               vec_id = MIN(vec_id) OVER (PARTITION BY qn) AS keep
        FROM nq
        """,
        "emb_ivf_topk": _emb_topk_planted_oracle(),
        "emb_ivfpq_topk": _emb_topk_planted_oracle(),
        "emb_ann_srp": _emb_topk_planted_oracle(),
        "emb_cosine_topk": _emb_cosine_planted_oracle(),
        "multimodal_bytes": """
            SELECT doc_id,
                   CAST(length(text) AS BIGINT) AS n_bytes,
                   CAST(list_aggregate(list_transform(
                          generate_series(1, length(text)),
                          i -> ord(substr(text, i, 1))), 'sum') * 1000
                        // greatest(length(text), 1) AS BIGINT) AS byte_mean_milli
            FROM documents
        """,
        "bbox_cell_range": _bbox_range_sql(),
        "snapshot_bloom_lookup": f"""
            SELECT url, {cell} AS cell_id FROM {pages}
            WHERE CAST(regexp_extract(url, '/p/(\\d+)$', 1) AS BIGINT)
                  IN (10, 20, 30)
        """,
        "snapshot_partition_scan": f"""
            SELECT url, ts_sec, lang FROM {pages}
            WHERE ts_sec BETWEEN 1560556800 AND 1560643199
        """,
        "snapshot_zorder_scan": f"""
            SELECT url,
                   pid % 1000 AS x,
                   (pid * 2654435761) % 1000 AS y
            FROM (
              SELECT url,
                     CAST(regexp_extract(url, '/p/(\\d+)$', 1) AS BIGINT)
                       AS pid
              FROM {pages}
            )
            WHERE (pid * 2654435761) % 1000 BETWEEN 300 AND 350
        """,
        "snapshot_pruned_scan": f"""
            SELECT url, {cell} AS cell_id FROM {pages}
            WHERE {cell} BETWEEN {(RES << 58) + (130 << 29)}
                             AND {(RES << 58) + (180 << 29) + ((1 << 29) - 1)}
        """,
        "snapshot_incremental": f"""
            SELECT url, {cell} AS cell_id FROM {pages}
            WHERE CAST(regexp_extract(url, '/p/(\\d+)$', 1) AS BIGINT)
                  >= {N_PAGES // 2}
        """,
        # metadata range delete of the x∈[130,180] cell band; pages
        # with id ≡ 0 (mod 7) inside the band re-appended afterwards
        "snapshot_range_delete": f"""
            SELECT url, {cell} AS cell_id FROM {pages}
            WHERE {cell} NOT BETWEEN {(RES << 58) + (130 << 29)}
                               AND {(RES << 58) + (180 << 29) + ((1 << 29) - 1)}
               OR CAST(regexp_extract(url, '/p/(\\d+)$', 1) AS BIGINT) % 7 = 0
        """,
        # position deletes: ids ≡ 2,5 (mod 9) deleted by predicate,
        # ids ≡ 2 re-appended later and resurrected by sequence rules
        "snapshot_pos_delete": f"""
            SELECT url, {cell} AS cell_id FROM {pages}
            WHERE CAST(regexp_extract(url, '/p/(\\d+)$', 1) AS BIGINT)
                  % 9 != 5
        """,
        # atomic MERGE: ids ≡ 0 (mod 5) replaced with cell_id+1 (their
        # own commit's delete must not touch them), 100 new urls
        # inserted, every old version of a replaced key gone
        "snapshot_upsert": f"""
            SELECT url,
                   CASE WHEN CAST(regexp_extract(url, '/p/(\\d+)$', 1)
                             AS BIGINT) % 5 = 0
                        THEN {cell} + 1 ELSE {cell} END AS cell_id
            FROM {pages}
            UNION ALL
            SELECT 'https://upsert.example/p/' || CAST(i AS VARCHAR) AS url,
                   CAST(i AS BIGINT) AS cell_id
            FROM range(100) AS t(i)
        """,
        # equality deletes: ids 0,1,2 (mod 10) deleted by url, ids 0
        # (mod 10) re-appended later — sequence semantics resurrect
        # them, so the final relation is ids not congruent to 1 or 2
        "snapshot_deletes": f"""
            SELECT url, {cell} AS cell_id FROM {pages}
            WHERE CAST(regexp_extract(url, '/p/(\\d+)$', 1) AS BIGINT)
                  % 10 NOT IN (1, 2)
        """,
        # BM25: same whitespace tokenization, same integer formula —
        # micro-scaled Robertson idf surrogate (2(N-df)+1)e6 // (2df+1)
        # times the k1=6/5 b=3/4 tf norm multiplied through by 20T.
        # micro = 1e6 is the envelope-checked value bm25_micro_scale
        # derives for this corpus (if the engine ever stepped it down
        # the scores would hash-MISMATCH here — a loud failure, never a
        # silent pass).  The df cap mirrors BM25_DF_CAP: terms in more
        # than 25/32 of docs leave the index before scoring.
        "docs_bm25_topk": f"""
            WITH tok AS (
              SELECT doc_id,
                     unnest(list_filter(
                       regexp_split_to_array(text, '\\s+'),
                       w -> w <> '')) AS term
              FROM documents
            ),
            dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
            tf AS (SELECT doc_id, term, count(*) AS tf
                   FROM tok GROUP BY doc_id, term),
            st AS (SELECT term, count(*) AS df FROM tf GROUP BY term
                   HAVING count(*) <= CAST(
                     floor((25.0 / 32.0)
                           * (SELECT count(*) FROM documents)) AS BIGINT)),
            g AS (SELECT (SELECT count(*) FROM documents) AS n,
                         (SELECT count(*) FROM tok) AS t),
            q(query_id, qtext) AS (VALUES {", ".join(
                f"({i}, '{s}')" for i, s in BM25_QUERIES)}),
            qt AS (SELECT DISTINCT query_id,
                     unnest(list_filter(
                       regexp_split_to_array(qtext, '\\s+'),
                       w -> w <> '')) AS term
                   FROM q),
            scored AS (
              SELECT qt.query_id, tf.doc_id,
                CAST(SUM( ((((2 * (n - df) + 1) * CAST(1000000 AS BIGINT))
                       // (2 * df + 1)) * (44 * t * tf))
                     // (20 * t * tf + 6 * t + 18 * dl.dl * n)
                ) AS BIGINT) AS score_micro
              FROM qt JOIN st USING(term) JOIN tf USING(term)
              JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN g
              GROUP BY 1, 2
              HAVING score_micro >= 1
            )
            SELECT query_id, doc_id, score_micro, rank FROM (
              SELECT *, row_number() OVER (
                PARTITION BY query_id
                ORDER BY score_micro DESC, doc_id) AS rank
              FROM scored
            ) WHERE rank <= 10
        """,
        # WAP branches: ids 0-4 on main; 5,6,7 staged on a branch and
        # published; 8 cherry-picked after a non-FF; the lower half of
        # the 9s appended straight to main; the upper half staged on a
        # DROPPED branch — absent is the proof the drop dropped
        "snapshot_wap": f"""
            SELECT url, {cell} AS cell_id FROM (
              SELECT url, lon_centi, lat_centi,
                     CAST(regexp_extract(url, '/p/(\\d+)$', 1) AS BIGINT)
                       AS pid
              FROM {pages}
            ) WHERE NOT (pid % 10 = 9 AND pid % 100 >= 50)
        """,
        "morton_bbox_scan": f"""
            SELECT url, {cell} AS cell_id, lat_centi, lon_centi
            FROM {pages}
            WHERE lon_centi BETWEEN {BBOX_A[0]} AND {BBOX_A[1] - 1}
              AND lat_centi BETWEEN {BBOX_A[2]} AND {BBOX_A[3] - 1}
        """,
        "heatmap_grid": f"""
            SELECT ({cell6} >> 29) & 536870911 AS x,
                   {cell6} & 536870911 AS y,
                   count(*) AS n,
                   CAST(sum(length(text)) AS BIGINT) * 1000 // count(*) AS mean_milli
            FROM {pages}
            GROUP BY 1, 2
        """,
        "setops_except": f"""
            SELECT url FROM {pages}
            WHERE lon_centi BETWEEN {BBOX_A[0]} AND {BBOX_A[1] - 1}
              AND lat_centi BETWEEN {BBOX_A[2]} AND {BBOX_A[3] - 1}
            EXCEPT ALL
            SELECT url FROM {pages}
            WHERE lon_centi BETWEEN {BBOX_B[0]} AND {BBOX_B[1] - 1}
              AND lat_centi BETWEEN {BBOX_B[2]} AND {BBOX_B[3] - 1}
        """,
        "share_en_per_tile": f"""
            SELECT {tile_cell} AS tile_cell, count(*) AS n,
                   count(CASE WHEN lang = 'en' THEN 1 END) * 1000 // count(*) AS en_milli
            FROM {pages}
            GROUP BY 1
        """,
        "rolling_events": """
            SELECT user_id, event_id,
                   CAST(sum(CAST(value AS DECIMAL(18,6)))
                        OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
                        AS DOUBLE) AS roll3
            FROM events
        """,
        "scalar_battery": """
            SELECT l_orderkey, l_linenumber,
                   upper(substr(l_returnflag, 1, 1)) AS flag_u,
                   concat_ws('-', l_returnflag, l_linestatus) AS tag,
                   date_diff('day', DATE '1970-01-01', CAST(date_trunc('month', l_shipdate) AS DATE)) AS ship_month_days,
                   CAST((l_linenumber & 6) >> 1 AS BIGINT) AS qa_bits,
                   CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
                   abs(l_discount - 0.05) AS disc_dev,
                   CAST(sign(l_quantity - 25.0) AS INT) AS qty_sign
            FROM lineitem
        """,
        # spec-level oracle: every expected value is reconstructed
        # ANALYTICALLY from the integer columns, never by re-running the
        # string parse — the gate checks the .SAFE-name spec itself
        "product_uri_battery": """
            WITH base AS (
              SELECT l_orderkey, l_linenumber,
                     'S2' || CASE WHEN l_orderkey % 2 = 0 THEN 'A' ELSE 'B' END
                       || '_MSIL'
                       || CASE WHEN l_linenumber % 2 = 0 THEN '1C' ELSE '2A' END
                       || '_202201' || lpad(CAST(l_orderkey % 28 + 1 AS VARCHAR), 2, '0')
                       || 'T' || lpad(CAST(l_partkey % 24 AS VARCHAR), 2, '0')
                              || lpad(CAST(l_suppkey % 60 AS VARCHAR), 2, '0')
                              || lpad(CAST(l_linenumber % 60 AS VARCHAR), 2, '0')
                       || '_N' || lpad(CAST((l_partkey % 5) * 100 + 300 AS VARCHAR), 4, '0')
                       || '_R' || lpad(CAST(l_suppkey % 143 + 1 AS VARCHAR), 3, '0')
                       || '_T32TM' || chr(65 + CAST(l_suppkey % 5 AS INT))
                       || '_20230101T000000.SAFE' AS safe_name,
                     'S2' || CASE WHEN l_orderkey % 2 = 0 THEN 'A' ELSE 'B' END
                       AS platform,
                     CASE WHEN l_linenumber % 2 = 0 THEN 'L1C' ELSE 'L2A' END
                       AS level,
                     '2022-01-' || lpad(CAST(l_orderkey % 28 + 1 AS VARCHAR), 2, '0')
                       || ' ' || lpad(CAST(l_partkey % 24 AS VARCHAR), 2, '0')
                       || ':' || lpad(CAST(l_suppkey % 60 AS VARCHAR), 2, '0')
                       || ':' || lpad(CAST(l_linenumber % 60 AS VARCHAR), 2, '0')
                       AS acq_ts,
                     CAST((l_partkey % 5) * 100 + 300 AS INT) AS baseline,
                     'T32TM' || chr(65 + CAST(l_suppkey % 5 AS INT)) AS tile
              FROM lineitem
            )
            SELECT b.l_orderkey, b.l_linenumber, b.safe_name, b.platform,
                   b.level, b.acq_ts, b.baseline, b.tile, m.merged_uri
            FROM base b
            JOIN (SELECT l_orderkey,
                         string_agg(DISTINCT safe_name, '&&' ORDER BY safe_name)
                           AS merged_uri
                  FROM base GROUP BY l_orderkey) m
            USING (l_orderkey)
        """,
        "indices_battery": """
            SELECT l_orderkey, l_linenumber,
                   (swir + red - (nir + blue)) / NULLIF(swir + red + (nir + blue), 0) AS bsi,
                   nir / NULLIF(green, 0) - 1 AS ci_green,
                   green / NULLIF(red, 0) AS cr,
                   CASE WHEN (2.5 * (nir - red)) / NULLIF(nir + 6 * red - 7.5 * blue + 1, 0) IS NULL
                        THEN NULL
                        ELSE least(greatest(
                          (2.5 * (nir - red)) / NULLIF(nir + 6 * red - 7.5 * blue + 1, 0),
                          -1.0), 1.0) END AS evi,
                   (nir - green) / NULLIF(nir + green, 0) AS gndvi,
                   ((rededge - red) - 0.2 * (rededge - green))
                     * (rededge / NULLIF(red, 0)) AS mcari,
                   0.5 * (2 * nir + 1
                     - sqrt((2 * nir + 1) * (2 * nir + 1) - 8 * (nir - red))) AS msavi,
                   (3 * ((rededge - red)
                         - 0.2 * (rededge - green) * (rededge / NULLIF(red, 0))))
                     / NULLIF(1.16 * ((rededge3 - red) / NULLIF(rededge3 + red + 0.16, 0)), 0)
                     AS mtcari_osavi,
                   (nir - rededge) / NULLIF(nir + rededge, 0) AS ndre,
                   (red - swir2) / NULLIF(red + swir2, 0) AS ndri,
                   (swir - swir2) / NULLIF(swir + swir2, 0) AS ndti,
                   (nir - red) / NULLIF(nir + red, 0) AS ndvi,
                   (green - nir) / NULLIF(green + nir, 0) AS ndwi,
                   (green - blue) / NULLIF(green + blue, 0) AS ndyi,
                   (swir - green) / NULLIF(swir + green, 0) AS nhi,
                   (green - red) / NULLIF(green + red - blue, 0) AS vari
            FROM (
              SELECT l_orderkey, l_linenumber,
                     CAST(l_quantity AS DOUBLE) AS nir,
                     CAST(l_discount AS DOUBLE) * 10 + 0.1 AS red,
                     CAST(l_tax AS DOUBLE) * 10 + 0.2 AS green,
                     CAST(l_extendedprice AS DOUBLE) * 0.00001 + 0.05 AS blue,
                     CAST(l_partkey % 100 AS DOUBLE) * 0.01 + 0.3 AS rededge,
                     CAST(l_suppkey % 100 AS DOUBLE) * 0.01 + 0.4 AS rededge3,
                     CAST(l_linenumber AS DOUBLE) * 0.1 + 0.2 AS swir,
                     CAST(l_orderkey % 7 AS DOUBLE) * 0.1 + 0.15 AS swir2
              FROM lineitem
            )
        """,
        "sensor_s2_scale": """
            SELECT l_orderkey, l_linenumber, baseline,
                   CASE WHEN B04 = 0 THEN NULL
                        ELSE CAST(B04 AS DOUBLE) * 0.0001
                             + CASE WHEN baseline >= 400 THEN -0.1 ELSE 0.0 END
                   END AS red,
                   CASE WHEN B08 = 0 THEN NULL
                        ELSE CAST(B08 AS DOUBLE) * 0.0001
                             + CASE WHEN baseline >= 400 THEN -0.1 ELSE 0.0 END
                   END AS nir
            FROM (
              SELECT l_orderkey, l_linenumber,
                     l_partkey % 10000 AS B04,
                     l_suppkey % 10000 AS B08,
                     300 + (l_orderkey % 2) * 100 AS baseline
              FROM lineitem
            )
        """,
        "sensor_landsat_qa": """
            SELECT l_orderkey, l_linenumber,
                   CASE WHEN red_raw = 0 THEN NULL
                        ELSE CAST(red_raw AS DOUBLE) * 0.0000275 + -0.2
                   END AS red,
                   (qa_pixel & 46) != 0 AS cloud_mask,
                   ((qa_pixel >> 7) & 1) = 1 AS water_mask
            FROM (
              SELECT l_orderkey, l_linenumber,
                     l_partkey % 10000 AS red_raw,
                     l_suppkey % 1024 AS qa_pixel
              FROM lineitem
            )
        """,
        "filter_grammar": """
            SELECT p_partkey, p_size, p_brand FROM part
            WHERE p_size >= 20 AND p_size < 40 AND p_brand != 'Brand#13'
        """,
        "scale_mask": """
            SELECT l_orderkey, l_linenumber,
                   l_extendedprice * 0.01 + 5.0 AS price_scaled,
                   CASE WHEN l_returnflag IN ('R') THEN NULL
                        ELSE l_quantity END AS qty_masked
            FROM lineitem
        """,
        "valid_counts": """
            SELECT event_type,
                   count(CASE WHEN value > 0 THEN 1 END) AS n_valid,
                   bool_and(value > 0) AS all_valid,
                   count(*) AS n_total
            FROM events
            GROUP BY event_type
        """,
        "poly_timeseries": f"""
            SELECT polys.poly_id, p.ts_sec // {BUCKET} AS ts_bucket,
                   count(*) AS n,
                   CAST(sum(length(p.text)) * 1000 // count(*) AS BIGINT) AS avg_chars_milli
            FROM {pages} p, {polys}
            WHERE {_duck_pip(clon, clat)}
            GROUP BY 1, 2
        """,
        "poly_timeseries_reindexed": TS.sql_reindex_buckets(
            f"""(
              SELECT polys.poly_id, p.ts_sec // {BUCKET} AS ts_bucket,
                     count(*) AS n,
                     CAST(sum(length(p.text)) * 1000 // count(*) AS BIGINT) AS avg_chars_milli
              FROM {pages} p, {polys}
              WHERE {_duck_pip(clon, clat)}
              GROUP BY 1, 2
            )""",
            "poly_id", "ts_bucket", ("n", "avg_chars_milli"),
            fill_zero=("n",), fill_forward=("avg_chars_milli",),
        ),
        "cell_resample": f"""
            SELECT {_duck_cell(6)} AS cell6, count(*) AS n
            FROM {pages}
            GROUP BY 1
        """,
        "cell_resample_mean": f"""
            SELECT {_duck_cell(6)} AS cell_to,
                   count(*) AS count,
                   CAST(sum(length(text)) AS BIGINT) * 1000 // count(*) AS mean_milli,
                   min(length(text)) AS min,
                   max(length(text)) AS max,
                   median(length(text)) AS median
            FROM {pages}
            GROUP BY 1
        """,
        "cell_upsample_bilinear": RS.sql_upsample_bilinear(
            f"(SELECT {_duck_cell(6)} AS cell_from, count(*) AS v FROM {pages} GROUP BY 1)",
            6, 7,
        ),
        "value_histogram": """
            SELECT k.l_returnflag, k.bin, coalesce(c.n, 0) AS n
            FROM (
              SELECT l_returnflag, b.bin
              FROM (SELECT DISTINCT l_returnflag FROM lineitem),
                   (SELECT CAST(unnest(generate_series(0, 9)) AS INT) AS bin) b
            ) k
            LEFT JOIN (
              SELECT l_returnflag,
                     least(greatest(CAST(floor((CAST(l_quantity AS DOUBLE) - 0.0) * 10 / 50.0) AS BIGINT), 0), 9) AS bin,
                     count(*) AS n
              FROM lineitem
              GROUP BY 1, 2
            ) c ON c.l_returnflag = k.l_returnflag AND c.bin = k.bin
        """,
        "cell_upsample": f"""
            SELECT (CAST(7 AS BIGINT) << 58)
                   + ((x6 * 2 + dx) << 29) + (y6 * 2 + dy) AS cell7, n
            FROM (
              SELECT lon_centi * 64 // 36000 AS x6,
                     lat_centi * 64 // 18000 AS y6,
                     count(*) AS n
              FROM {pages}
              GROUP BY 1, 2
            ), (VALUES (CAST(0 AS BIGINT)), (1)) dxs(dx),
               (VALUES (CAST(0 AS BIGINT)), (1)) dys(dy)
        """,
    }


def _bbox_range_sql() -> str:
    x0, x1, y0, y1 = _bbox_cells(BBOX_A, JOIN_RES)
    n = 1 << JOIN_RES
    return f"""
        SELECT url, {_duck_cell(RES)} AS cell_id FROM {_duck_pages()}
        WHERE (lon_centi * {n} // 36000) BETWEEN {x0} AND {x1}
          AND (lat_centi * {n} // 18000) BETWEEN {y0} AND {y1}
    """
