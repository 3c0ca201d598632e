"""PIP kernel + covering invariants (≡ reference clip/rasterize tests,
`tests/core/test_band.py:331-388` from_vector / clip golden checks)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from eodal_spark import geometry, grid


def test_pip_convex_native_matches_numpy(spark, sample_polys):
    pts = spark.range(4000).select(
        (F.col("id") * 1.7 % 360 - 180.0).alias("px"),
        (F.col("id") * 0.9 % 170 - 85.0).alias("py"),
    )
    joined = pts.crossJoin(F.broadcast(sample_polys.filter("is_convex")))
    got = (
        joined.select(
            "px", "py", "poly_id",
            geometry.pip_convex(F.col("px"), F.col("py"), F.col("xs"), F.col("ys")).alias("inside"),
        )
        .toPandas()
        .sort_values(["poly_id", "px", "py"])
        .reset_index(drop=True)
    )
    polys = {r["poly_id"]: (np.array(r["xs"]), np.array(r["ys"]))
             for r in sample_polys.collect()}
    expect = np.concatenate([
        geometry.np_pip_convex(
            g["px"].to_numpy(), g["py"].to_numpy(), *polys[pid]
        )
        for pid, g in got.groupby("poly_id", sort=True)
    ])
    # groupby preserves within-group order after our sort
    assert (got["inside"].to_numpy() == expect).all()


def test_pip_convex_boundary_inclusive(spark):
    square = geometry.polygons_df(
        spark, [(1, [(0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0)])]
    )
    pts = spark.createDataFrame(
        [(0.0, 0.0), (10.0, 10.0), (5.0, 0.0), (0.0, 5.0), (5.0, 5.0),
         (10.000001, 5.0), (-0.000001, 5.0)],
        ["px", "py"],
    )
    out = (
        pts.crossJoin(F.broadcast(square))
        .select("px", geometry.pip_convex(F.col("px"), F.col("py"), F.col("xs"), F.col("ys")).alias("inside"))
        .collect()
    )
    by_px = {r["px"]: r["inside"] for r in out}
    assert by_px[0.0] and by_px[10.0] and by_px[5.0]
    assert not by_px[10.000001] and not by_px[-0.000001]


def test_pip_even_odd_concave():
    # concave "L": the notch (x>-25, y>5) must be outside
    xs = np.array([-30.0, -10.0, -10.0, -25.0, -25.0, -30.0])
    ys = np.array([0.0, 0.0, 5.0, 5.0, 20.0, 20.0])
    px = np.array([-28.0, -12.0, -15.0, -28.0, -50.0])
    py = np.array([2.0, 2.0, 10.0, 15.0, 2.0])
    got = geometry.np_pip_even_odd(px, py, xs, ys)
    assert got.tolist() == [True, True, False, True, False]


def test_sql_pip_dialects_agree(spark, sample_polys):
    import duckdb

    rows = sample_polys.filter("is_convex").select("poly_id", "xs", "ys").collect()
    px, py = 8.5, 47.4  # inside poly 1 only
    for r in rows:
        sexpr = geometry.sql_pip_convex(str(px), str(py), "xs", "ys", "spark")
        got_s = (
            spark.createDataFrame([(r["xs"], r["ys"])], ["xs", "ys"])
            .selectExpr(f"{sexpr} AS inside")
            .first()["inside"]
        )
        dexpr = geometry.sql_pip_convex(str(px), str(py), "xs", "ys", "duckdb")
        got_d = duckdb.sql(
            f"SELECT {dexpr} AS inside FROM (SELECT {r['xs']} AS xs, {r['ys']} AS ys)"
        ).fetchone()[0]
        assert got_s == got_d == (r["poly_id"] == 1)


def test_cover_cells_centroid_rule(spark, sample_polys):
    res = 8
    cover = geometry.polygon_cover_cells(sample_polys, res, mode="centroid")
    pdf = cover.toPandas()
    polys = {r["poly_id"]: (np.array(r["xs"]), np.array(r["ys"]),
                            bool(r["is_convex"]))
             for r in sample_polys.collect()}
    # oracle: brute-force over the full grid bbox of each polygon
    n = 1 << res
    for pid, (xs, ys, convex) in polys.items():
        gx, gy = np.meshgrid(np.arange(n), np.arange(n // 2 * 2), indexing="ij")
        # restrict to bbox candidates for speed
        x0, _ = grid.np_cell_xy(np.array([xs.min()]), np.array([0.0]), res)
        x1, _ = grid.np_cell_xy(np.array([xs.max()]), np.array([0.0]), res)
        _, y0 = grid.np_cell_xy(np.array([0.0]), np.array([ys.min()]), res)
        _, y1 = grid.np_cell_xy(np.array([0.0]), np.array([ys.max()]), res)
        cx = np.arange(x0[0], x1[0] + 1)
        cy = np.arange(y0[0], y1[0] + 1)
        gx, gy = np.meshgrid(cx, cy, indexing="ij")
        gx, gy = gx.ravel(), gy.ravel()
        clon = (gx + 0.5) / n * 360.0 - 180.0
        clat = (gy + 0.5) / n * 180.0 - 90.0
        inside = (
            geometry.np_pip_convex(clon, clat, xs, ys)
            if convex
            else geometry.np_pip_even_odd(clon, clat, xs, ys)
        )
        expect = set(((np.int64(res) << 58) | (gx[inside] << 29) | gy[inside]).tolist())
        got = set(pdf[pdf["poly_id"] == pid]["cell_id"].tolist())
        assert got == expect, f"poly {pid}"
    # full-cell flags: a full cell's centroid must be inside (sanity)
    full = pdf[pdf["full"]]
    assert len(full) > 0  # big polys at res 8 have interior cells


def test_cover_cells_size_guard(spark):
    # a hemisphere-sized polygon at res 16 must fail fast, not OOM
    from eodal_spark.geometry import polygon_cover_cells, polygons_df

    big = polygons_df(
        spark, [(1, [(-170.0, -80.0), (170.0, -80.0), (170.0, 80.0), (-170.0, 80.0)])]
    )
    with pytest.raises(Exception, match="coarser"):
        polygon_cover_cells(big, 16).count()
