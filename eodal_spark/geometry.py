"""Vector geometry over DataFrames — the engine's `Feature` layer.

The reference models vector features as shapely geometries with EPSG codes
(`eodal/mapper/feature.py:35-111`) and bridges raster↔vector with
rasterio mask/rasterize (`eodal/core/band.py:758-775`, ``:1058-1072``).
This engine represents a polygon layer as a small **broadcastable
DataFrame**::

    poly_id: long, <attrs...>, xs: array<double>, ys: array<double>,
    xmin/ymin/xmax/ymax: double

``xs``/``ys`` are the exterior-ring vertices (open ring, CCW-normalized).
Two point-in-polygon kernels:

* `pip_convex` — boundary-inclusive convex PIP as a **pure Catalyst
  expression** (min of edge cross products ≥ 0) → whole-stage codegen,
  zero Python.  The engine's pinned membership rule (FIXTURES.md §5) —
  the analogue of the reference's ``all_touched=True`` mask read
  (`eodal/core/band.py:828-835`).
* `np_pip_even_odd` — general (possibly concave) ray-casting in numpy,
  used inside Arrow-batched pandas UDF refinement stages.

Cell coverings (`polygon_cover_cells`) replace shapely STRtree
pre-filtering: the covering is exploded to rows and broadcast, so the
big-side join is a plain equi-join on ``cell_id``.
No shapely/geos anywhere — pure numpy + Catalyst (sandbox constraint and
a deliberate zero-native-deps choice for ``spark-submit --py-files``).
"""

from __future__ import annotations

from typing import Iterable, Iterator, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from eodal_spark import grid

# ---------------------------------------------------------------------------
# Layer construction
# ---------------------------------------------------------------------------

POLY_SCHEMA = T.StructType(
    [
        T.StructField("poly_id", T.LongType(), False),
        T.StructField("xs", T.ArrayType(T.DoubleType()), False),
        T.StructField("ys", T.ArrayType(T.DoubleType()), False),
        T.StructField("xmin", T.DoubleType(), False),
        T.StructField("ymin", T.DoubleType(), False),
        T.StructField("xmax", T.DoubleType(), False),
        T.StructField("ymax", T.DoubleType(), False),
        T.StructField("is_convex", T.BooleanType(), False),
    ]
)


def _signed_area(xs: np.ndarray, ys: np.ndarray) -> float:
    x2, y2 = np.roll(xs, -1), np.roll(ys, -1)
    return float(np.sum(xs * y2 - x2 * ys) / 2.0)


def _is_convex(xs: np.ndarray, ys: np.ndarray) -> bool:
    x1, y1 = np.roll(xs, -1), np.roll(ys, -1)
    x2, y2 = np.roll(xs, -2), np.roll(ys, -2)
    cross = (x1 - xs) * (y2 - y1) - (y1 - ys) * (x2 - x1)
    return bool(np.all(cross >= 0) or np.all(cross <= 0))


def polygons_df(
    spark: SparkSession,
    polys: Iterable[tuple[int, Sequence[tuple[float, float]]]],
    attrs: dict[int, dict] | None = None,
) -> DataFrame:
    """Build a polygon-layer DataFrame from (poly_id, [(x, y), ...]) pairs.

    Rings are normalized to CCW and 3-D inputs flattened (≡ the
    reference's 2-D flattening, `eodal/core/utils/geometry.py:106-136`).
    This is a *dimension table* — small by construction, meant to be
    broadcast (`F.broadcast`) into the page-side join.
    """
    rows = []
    for poly_id, ring in polys:
        pts = [(float(p[0]), float(p[1])) for p in ring]  # drop z if present
        if pts[0] == pts[-1]:
            pts = pts[:-1]
        xs = np.array([p[0] for p in pts])
        ys = np.array([p[1] for p in pts])
        if _signed_area(xs, ys) < 0:  # normalize to CCW
            xs, ys = xs[::-1], ys[::-1]
        rows.append(
            (
                int(poly_id),
                xs.tolist(),
                ys.tolist(),
                float(xs.min()),
                float(ys.min()),
                float(xs.max()),
                float(ys.max()),
                _is_convex(xs, ys),
            )
        )
    df = spark.createDataFrame(rows, POLY_SCHEMA)
    if attrs:
        attr_keys = sorted({k for a in attrs.values() for k in a})
        attr_rows = [
            (int(pid), *[a.get(k) for k in attr_keys]) for pid, a in attrs.items()
        ]
        adf = spark.createDataFrame(attr_rows, ["poly_id", *attr_keys])
        df = df.join(adf, "poly_id", "left")
    return df


def explode_multipoints(df: DataFrame, xs_col: str = "mxs", ys_col: str = "mys") -> DataFrame:
    """MultiPoint → single-part points (≡ multi_to_single_points,
    `eodal/core/utils/geometry.py:139-154`): a row carrying coordinate
    arrays explodes into one row per vertex with ``lon``/``lat``
    columns — native posexplode, no UDF."""
    z = F.arrays_zip(F.col(xs_col), F.col(ys_col))
    out = df.withColumn("_pt", F.explode(z))
    return (
        out.withColumn("lon", F.col(f"_pt.{xs_col}"))
        .withColumn("lat", F.col(f"_pt.{ys_col}"))
        .drop("_pt", xs_col, ys_col)
    )


# ---------------------------------------------------------------------------
# Point-in-polygon kernels
# ---------------------------------------------------------------------------

def pip_convex(px: Column, py: Column, xs: Column, ys: Column) -> Column:
    """Boundary-inclusive convex PIP as a native Column expression.

    For a CCW ring, point is inside-or-on-boundary iff every edge cross
    product ``(x2-x1)*(py-y1) - (y2-y1)*(px-x1)`` is >= 0, i.e. the
    minimum over edges is >= 0.  Entirely Catalyst → codegen; this is the
    hot-path replacement for the reference's per-pixel mask loop
    (`eodal/core/band.py:1716-1720`).
    """
    n = F.size(xs)
    idx = F.sequence(F.lit(1), n)  # element_at is 1-based

    def cross(i: Column) -> Column:
        j = F.pmod(i, n) + F.lit(1)  # wrap to first vertex
        x1, y1 = F.element_at(xs, i), F.element_at(ys, i)
        x2, y2 = F.element_at(xs, j), F.element_at(ys, j)
        return (x2 - x1) * (py - y1) - (y2 - y1) * (px - x1)

    min_cross = F.aggregate(
        idx, F.lit(float("inf")), lambda acc, i: F.least(acc, cross(i))
    )
    return min_cross >= F.lit(0.0)


def sql_pip_convex(px: str, py: str, xs: str, ys: str, dialect: str) -> str:
    """The same convex PIP as a SQL string — Spark and DuckDB dialects —
    so the DuckDB oracle can verify the join row-for-row."""
    if dialect == "spark":
        return (
            f"aggregate(sequence(1, size({xs})), cast('Infinity' as double), "
            f"(acc, i) -> least(acc, "
            f"(element_at({xs}, pmod(i, size({xs})) + 1) - element_at({xs}, i)) * ({py} - element_at({ys}, i)) "
            f"- (element_at({ys}, pmod(i, size({xs})) + 1) - element_at({ys}, i)) * ({px} - element_at({xs}, i))"
            f")) >= 0.0"
        )
    if dialect == "duckdb":
        return (
            f"list_aggregate(list_transform(generate_series(1, len({xs})), i -> "
            f"CASE WHEN ("
            f"({xs}[(i % len({xs})) + 1] - {xs}[i]) * ({py} - {ys}[i]) "
            f"- ({ys}[(i % len({xs})) + 1] - {ys}[i]) * ({px} - {xs}[i])"
            f") >= 0.0 THEN 1 ELSE 0 END), 'min') = 1"
        )
    raise ValueError(dialect)


def np_pip_convex(
    px: np.ndarray, py: np.ndarray, xs: np.ndarray, ys: np.ndarray
) -> np.ndarray:
    """Vectorized numpy oracle for `pip_convex` (points × one CCW ring)."""
    x1 = xs[:, None]
    y1 = ys[:, None]
    x2 = np.roll(xs, -1)[:, None]
    y2 = np.roll(ys, -1)[:, None]
    cross = (x2 - x1) * (py[None, :] - y1) - (y2 - y1) * (px[None, :] - x1)
    return np.all(cross >= 0.0, axis=0)


def np_pip_even_odd(
    px: np.ndarray, py: np.ndarray, xs: np.ndarray, ys: np.ndarray
) -> np.ndarray:
    """General even-odd ray-casting PIP (handles concave rings).

    Vectorized over points; used inside Arrow-batched refinement UDFs.
    Boundary behaviour follows the standard half-open edge rule; tests
    keep query points off exact boundaries (documented limitation).
    """
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    inside = np.zeros(px.shape, dtype=bool)
    n = len(xs)
    j = n - 1
    for i in range(n):
        xi, yi, xj, yj = xs[i], ys[i], xs[j], ys[j]
        cond = (yi > py) != (yj > py)
        with np.errstate(divide="ignore", invalid="ignore"):
            xint = (xj - xi) * (py - yi) / (yj - yi) + xi
        inside ^= cond & (px < xint)
        j = i
    return inside


# ---------------------------------------------------------------------------
# Polygon → covering cells (the broadcast pre-filter)
# ---------------------------------------------------------------------------

# per-polygon covering-size guard: a continent-sized polygon at a fine
# resolution would explode into billions of covering cells — fail fast
# with the fix (coarser join res / split the polygon) instead of OOMing
MAX_COVER_CELLS_PER_POLY = 2_000_000


def _cover_one(row, res: int, mode: str):
    """Covering cells of one polygon (numpy): (cell_ids, full_flags)."""
    n = 1 << res
    xs = np.asarray(row.xs, dtype=np.float64)
    ys = np.asarray(row.ys, dtype=np.float64)
    x0, _ = grid.np_cell_xy(np.array([row.xmin]), np.array([0.0]), res)
    x1, _ = grid.np_cell_xy(np.array([row.xmax]), np.array([0.0]), res)
    _, y0 = grid.np_cell_xy(np.array([0.0]), np.array([row.ymin]), res)
    _, y1 = grid.np_cell_xy(np.array([0.0]), np.array([row.ymax]), res)
    n_cand = int(x1[0] - x0[0] + 1) * int(y1[0] - y0[0] + 1)
    if n_cand > MAX_COVER_CELLS_PER_POLY:
        raise ValueError(
            f"polygon {row.poly_id} would cover {n_cand:,} candidate cells "
            f"at res {res} (> {MAX_COVER_CELLS_PER_POLY:,}); use a coarser "
            f"join resolution or split the polygon"
        )
    cx = np.arange(x0[0], x1[0] + 1, dtype=np.int64)
    cy = np.arange(y0[0], y1[0] + 1, dtype=np.int64)
    gx, gy = np.meshgrid(cx, cy, indexing="ij")
    gx, gy = gx.ravel(), gy.ravel()
    clon = (gx + 0.5) / n * 360.0 - 180.0
    clat = (gy + 0.5) / n * 180.0 - 90.0
    if row.is_convex:
        centroid_in = np_pip_convex(clon, clat, xs, ys)
        half_x, half_y = 180.0 / n, 90.0 / n
        full = np.ones(gx.shape, dtype=bool)
        for sx in (-half_x, half_x):
            for sy in (-half_y, half_y):
                full &= np_pip_convex(clon + sx, clat + sy, xs, ys)
    else:
        centroid_in = np_pip_even_odd(clon, clat, xs, ys)
        full = np.zeros(gx.shape, dtype=bool)
    keep = centroid_in if mode == "centroid" else np.ones(gx.shape, dtype=bool)
    cell = (np.int64(res) << 58) | (gx[keep] << 29) | gy[keep]
    return cell, full[keep]


# polygon layers up to this size are covered driver-side (one tiny
# collect of an already-small dimension) — avoids paying Python-worker
# startup on the query's critical path; larger layers distribute.
DRIVER_COVER_MAX_POLYS = 10_000


def polygon_cover_cells(
    polys: DataFrame, res: int, mode: str = "centroid",
    distributed: bool | None = None,
) -> DataFrame:
    """Explode each polygon into its covering cells at resolution ``res``.

    mode="centroid": cells whose **centroid** lies in the polygon
      (boundary-inclusive) — exact for the engine's pinned membership
      rule (FIXTURES.md §5; analogue of rasterize
      `eodal/core/band.py:1058-1072`).
    mode="bbox": every cell intersecting the polygon's bbox — a superset
      used as the coarse stage before exact point-level PIP refinement.

    Output: (poly_id, cell_id, full) where ``full`` marks cells whose 4
    corners are all inside (convex polygons only) — downstream exact
    joins skip PIP refinement for full cells.

    Small layers (≤ `DRIVER_COVER_MAX_POLYS`) are covered **driver-side**
    (one collect of the already-small dimension; the cover becomes a
    literal broadcast relation — no Python stage on the critical path).
    Large layers run as `mapInPandas` (Arrow-batched, distributed); the
    per-polygon cost is O(bbox cells) either way, independent of the
    pages table.
    """
    out_schema = T.StructType(
        [
            T.StructField("poly_id", T.LongType(), False),
            T.StructField("cell_id", T.LongType(), False),
            T.StructField("full", T.BooleanType(), False),
        ]
    )
    cols = ["poly_id", "xs", "ys", "xmin", "ymin", "xmax", "ymax", "is_convex"]

    if distributed is None:
        distributed = polys.count() > DRIVER_COVER_MAX_POLYS

    if not distributed:
        spark = polys.sparkSession
        out = []
        for row in polys.select(*cols).collect():
            cell, full = _cover_one(row, res, mode)
            out.extend(
                (int(row.poly_id), int(c), bool(f)) for c, f in zip(cell, full)
            )
        return spark.createDataFrame(out, out_schema)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_pid, out_cell, out_full = [], [], []
            for row in pdf.itertuples(index=False):
                cell, full = _cover_one(row, res, mode)
                out_pid.append(np.full(cell.shape, row.poly_id, dtype=np.int64))
                out_cell.append(cell)
                out_full.append(full)
            if out_pid:
                yield pd.DataFrame(
                    {
                        "poly_id": np.concatenate(out_pid),
                        "cell_id": np.concatenate(out_cell),
                        "full": np.concatenate(out_full),
                    }
                )

    return polys.select(*cols).mapInPandas(gen, out_schema)
