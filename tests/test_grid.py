"""Grid invariants — the analogue of the reference's GeoInfo tests
(`tests/core/test_band.py:94-134` geo-referencing golden checks)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from eodal_spark import grid


def test_encode_roundtrip_native_vs_numpy(spark):
    res = 12
    df = spark.range(2000).select(
        (F.col("id") % 3600 / 10.0 - 180.0).alias("lon"),
        (F.col("id") % 1700 / 10.0 - 85.0).alias("lat"),
    )
    out = df.select(
        "lon", "lat", grid.cell_encode("lon", "lat", res).alias("cell")
    ).toPandas()
    expect = grid.np_cell_encode(
        out["lon"].to_numpy(), out["lat"].to_numpy(), res
    )
    assert (out["cell"].to_numpy() == expect).all()


def test_arrow_udf_matches_native(spark):
    res = 9
    df = spark.range(500).select(
        (F.col("id") * 0.7 % 360 - 180.0).alias("lon"),
        (F.col("id") * 0.3 % 180 - 90.0).alias("lat"),
    )
    out = df.select(
        grid.cell_encode("lon", "lat", res).alias("native"),
        grid.cell_encode_arrow(res)(F.col("lon"), F.col("lat")).alias("arrow"),
    )
    assert out.filter("native != arrow").count() == 0


def test_decode_centroid_reencodes_to_same_cell(spark):
    res = 10
    df = spark.range(1000).select(
        (F.col("id") * 1.37 % 360 - 180.0).alias("lon"),
        (F.col("id") * 0.59 % 170 - 85.0).alias("lat"),
    )
    cells = df.select(grid.cell_encode("lon", "lat", res).alias("cell"))
    back = cells.select(
        "cell",
        grid.cell_encode(
            grid.cell_centroid_lon("cell", res),
            grid.cell_centroid_lat("cell", res),
            res,
        ).alias("cell2"),
    )
    assert back.filter("cell != cell2").count() == 0


def test_parent_child_roundtrip(spark):
    res, parent_res = 12, 8
    df = spark.range(300).select(
        (F.col("id") * 1.1 % 360 - 180.0).alias("lon"),
        (F.col("id") * 0.77 % 170 - 85.0).alias("lat"),
    )
    cells = df.select(grid.cell_encode("lon", "lat", res).alias("cell"))
    par = cells.select(
        "cell", grid.cell_parent("cell", res, parent_res).alias("parent")
    )
    # every child of the parent set contains the original cell
    kids = par.select(
        "cell", F.explode(grid.cell_children("parent", parent_res, res)).alias("kid")
    )
    hit = kids.filter("cell = kid").count()
    assert hit == 300
    # child count is exactly 4^(res-parent_res)
    cnt = par.select(
        F.size(grid.cell_children("parent", parent_res, res)).alias("n")
    ).agg(F.min("n"), F.max("n")).first()
    assert cnt[0] == cnt[1] == 4 ** (res - parent_res)


def test_ring_contains_self_and_neighbors(spark):
    res = 6
    df = spark.createDataFrame([(0.0, 0.0)], ["lon", "lat"])
    cells = df.select(grid.cell_encode("lon", "lat", res).alias("cell"))
    ring = cells.select(
        "cell", grid.cell_ring("cell", 1, res).alias("ring")
    ).first()
    assert len(ring["ring"]) == 9
    assert ring["cell"] in ring["ring"]
    # Chebyshev distance of every member is <= 1
    x0 = (ring["cell"] >> 29) & ((1 << 29) - 1)
    y0 = ring["cell"] & ((1 << 29) - 1)
    for c in ring["ring"]:
        x = (c >> 29) & ((1 << 29) - 1)
        y = c & ((1 << 29) - 1)
        assert max(abs(x - x0), abs(y - y0)) <= 1


def test_ring_clamps_at_pole_and_wraps_lon(spark):
    res = 4
    n = 1 << res
    # cell at the north edge, lon edge: y = n-1, x = n-1
    df = spark.createDataFrame([(179.9, 89.9)], ["lon", "lat"])
    ring = df.select(
        grid.cell_ring(grid.cell_encode("lon", "lat", res), 1, res).alias("r")
    ).first()["r"]
    assert len(ring) == 6  # 3x3 minus the 3 cells beyond the pole
    xs = [(c >> 29) & ((1 << 29) - 1) for c in ring]
    assert 0 in xs  # wrapped across the antimeridian


def test_sql_centi_encode_matches_duckdb():
    import duckdb

    res = 12
    expr = grid.sql_cell_encode_centi("lon_centi", "lat_centi", res, "duckdb")
    got = duckdb.sql(
        f"SELECT {expr} AS cell FROM (SELECT range % 36000 AS lon_centi, "
        f"range % 18000 AS lat_centi FROM range(5000))"
    ).fetchnumpy()["cell"]
    lon = (np.arange(5000) % 36000) / 100.0 - 180.0
    lat = (np.arange(5000) % 18000) / 100.0 - 90.0
    expect = grid.np_cell_encode(lon, lat, res)
    assert (got == expect).all()


def test_spark_and_duckdb_centi_encode_agree(spark):
    import duckdb

    res = 14
    sexpr = grid.sql_cell_encode_centi("lon_centi", "lat_centi", res, "spark")
    got_spark = (
        spark.range(3000)
        .selectExpr("id % 36000 AS lon_centi", "id % 18000 AS lat_centi")
        .selectExpr(f"{sexpr} AS cell")
        .toPandas()["cell"]
        .to_numpy()
    )
    dexpr = grid.sql_cell_encode_centi("lon_centi", "lat_centi", res, "duckdb")
    got_duck = duckdb.sql(
        f"SELECT {dexpr} AS cell FROM (SELECT range % 36000 AS lon_centi, "
        f"range % 18000 AS lat_centi FROM range(3000))"
    ).fetchnumpy()["cell"]
    assert (got_spark == got_duck).all()


def test_cell_morton_native_matches_numpy(spark):
    import numpy as np
    from pyspark.sql import functions as F

    rng = np.random.default_rng(5)
    lon = rng.uniform(-180, 180, 500)
    lat = rng.uniform(-90, 90, 500)
    cells = grid.np_cell_encode(lon, lat, 12)
    expect = grid.np_cell_morton(cells)
    df = spark.createDataFrame([(int(c),) for c in cells], ["cell_id"])
    got = np.array(
        [r[0] for r in df.select(grid.cell_morton("cell_id")).collect()]
    )
    assert (got == expect).all()
    # interleave spot-check against a hand value: x=0b11, y=0b01 -> 0b0111
    one = grid.np_cell_morton(np.array([(12 << 58) | (3 << 29) | 1]))
    assert one[0] == 0b0111


def test_morton_ranges_cover_all_cells():
    import numpy as np

    rng = np.random.default_rng(6)
    lon = rng.uniform(7.0, 10.0, 300)
    lat = rng.uniform(45.0, 49.0, 300)
    cells = np.unique(grid.np_cell_encode(lon, lat, 10))
    ranges = grid.morton_ranges(cells, max_ranges=8)
    assert 1 <= len(ranges) <= 8
    keys = grid.np_cell_morton(cells)
    for k in keys:
        assert any(lo <= k <= hi for lo, hi in ranges)
    # ranges are disjoint and ordered
    flat = [b for r in ranges for b in r]
    assert flat == sorted(flat)


def test_morton_sorted_layout_prunes_files(spark, tmp_path):
    """Z-order layout: a bbox query hits a handful of files on a
    Morton-sorted table, not a stripe across all of them."""
    import numpy as np
    from pyspark.sql import functions as F

    from eodal_spark.sources import pages as P

    res = 8
    geo = P.geocode(P.synth_pages(spark, 40_000), res).select("url", "cell_id")
    path = str(tmp_path / "zorder")
    (
        geo.withColumn("morton", grid.cell_morton("cell_id"))
        .repartitionByRange(16, "morton")
        .sortWithinPartitions("morton")
        .write.parquet(path)
    )
    table = spark.read.parquet(path)
    n_files = table.select(F.input_file_name()).distinct().count()
    assert n_files >= 8
    # bbox covering (Zürich box) -> morton ranges -> OR-of-BETWEEN
    lon = np.arange(7.0, 10.0, 0.2)
    lat = np.arange(45.0, 49.0, 0.2)
    gx, gy = np.meshgrid(lon, lat)
    cells = np.unique(grid.np_cell_encode(gx.ravel(), gy.ravel(), res))
    ranges = grid.morton_ranges(cells, max_ranges=8)
    pred = None
    for lo, hi in ranges:
        p = (F.col("morton") >= lo) & (F.col("morton") <= hi)
        pred = p if pred is None else (pred | p)
    hit = table.filter(pred)
    hit_files = hit.select(F.input_file_name()).distinct().count()
    assert hit.count() > 0
    assert hit_files <= max(2, n_files // 4), (hit_files, n_files)


def test_morton_scan_metrics_skip_row_groups(spark, tmp_path):
    """The 100 TB layout claim, measured: on a Morton-sorted table the
    OR-of-BETWEEN range predicate reaches the parquet reader
    (PushedFilters) and row-group min/max stats skip most of the data —
    the scan node MATERIALIZES a fraction of the rows — while results
    stay identical to the same bbox filter on the unsorted table."""
    import numpy as np
    from pyspark.sql import functions as F

    from eodal_spark.sources import pages as P

    res = 8
    geo = P.geocode(P.synth_pages(spark, 40_000), res).select(
        "url", "cell_id", "lon_centi", "lat_centi"
    )
    path = str(tmp_path / "zorder_metrics")
    (
        geo.withColumn("morton", grid.cell_morton("cell_id"))
        .repartitionByRange(16, "morton")
        .sortWithinPartitions("morton")
        .write.parquet(path)
    )
    table = spark.read.parquet(path)
    lon = np.arange(7.0, 10.0, 0.2)
    lat = np.arange(45.0, 49.0, 0.2)
    gx, gy = np.meshgrid(lon, lat)
    cells = np.unique(grid.np_cell_encode(gx.ravel(), gy.ravel(), res))
    pred = None
    for lo, hi in grid.morton_ranges(cells, max_ranges=8):
        p = (F.col("morton") >= lo) & (F.col("morton") <= hi)
        pred = p if pred is None else (pred | p)
    hit = table.filter(pred)
    got = {r["url"] for r in hit.collect()}

    # pushed down: the ranges must reach the parquet scan
    plan_str = hit._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan_str and "GreaterThanOrEqual(morton" in plan_str

    # scan metric: rows MATERIALIZED from parquet (after row-group
    # min/max skipping) must be a fraction of the table
    leaves = hit._jdf.queryExecution().executedPlan().collectLeaves()
    scan = leaves.apply(0)
    scanned = scan.metrics().apply("numOutputRows").value()
    total = 40_000
    assert 0 < scanned <= total // 4, (scanned, total)

    # unchanged results vs the unsorted path
    unsorted_hit = {
        r["url"]
        for r in geo.join(
            spark.createDataFrame(
                [(int(c),) for c in cells], ["cell_id"]
            ).hint("broadcast"),
            "cell_id",
        ).collect()
    }
    # morton ranges are a superset of the covering cells: every covering
    # row must be found; rows outside the covering can only come from
    # range consolidation (the documented residual-filter contract)
    assert unsorted_hit <= got


def test_morton_ranges_edge_cases():
    import numpy as np

    assert grid.morton_ranges(np.array([], dtype=np.int64)) == []
    one = grid.np_cell_encode(np.array([8.0]), np.array([47.0]), 10)
    r = grid.morton_ranges(one, max_ranges=1)
    k = int(grid.np_cell_morton(one)[0])
    assert r == [(k, k)]
    # max_ranges=1 over scattered cells collapses to one covering range
    many = grid.np_cell_encode(
        np.array([-170.0, 0.0, 170.0]), np.array([-80.0, 0.0, 80.0]), 10
    )
    r1 = grid.morton_ranges(many, max_ranges=1)
    keys = grid.np_cell_morton(many)
    assert len(r1) == 1 and r1[0][0] == keys.min() and r1[0][1] == keys.max()
