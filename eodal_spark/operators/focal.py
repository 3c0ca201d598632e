"""Focal (neighbourhood) raster statistics over the global cell grid.

The reference's focal story is single-scene numpy: `Band.values`
(`/root/reference/eodal/core/band.py:353-365`) hands the masked pixel
array to scipy-style kernels downstream, and its only built-in
neighbourhood op is the nearest-cell argmin snap
(`eodal/core/band.py:1431-1454`).  The relational form below is the
distributed generalization: a box-kernel focal reduction (mean / min /
max / sum / count) over ANY sparse cell relation, with the grid's edge
semantics (x wraps at ±180°, y clamps at the poles — `grid.cell_ring`).

Algorithm (gather as scatter): Chebyshev disks are symmetric, so
"collect every neighbour's value at each target" is exactly "explode
every SOURCE cell's value to its own disk and re-aggregate by target".
That keeps the operator ONE explode ((2r+1)² row growth, no join at
all) + ONE shuffle with map-side partial aggregation — at 10^12 cells
the cost is linear in cells × kernel area, the floor for any focal op.
No UDF anywhere; the disk explode and every statistic stay inside
whole-stage codegen.

Sparse semantics: inputs are one row per OCCUPIED cell; a target's
``n_src`` counts occupied neighbours and ``v_mean_milli`` averages over
them (the zonal/masked convention).  Dense-raster semantics (absent
cells = 0) are a projection away: ``v_sum * 1000 div (2r+1)²``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from eodal_spark import grid


def focal_stats(
    cells: DataFrame,
    res: int,
    radius: int = 1,
    cell_col: str = "cell_id",
    value_col: str = "v",
) -> DataFrame:
    """Box-kernel focal statistics: for every cell within Chebyshev
    distance ``radius`` of an occupied cell, aggregate the occupied
    neighbours' values.  ``cells`` must hold ONE row per cell (the
    usual upstream is a groupBy-cell rasterization); sum/mean are
    integer-exact (``v_mean_milli`` = sum·1000 div n) so gated outputs
    hash across engines."""
    t = cells.select(
        F.explode(
            grid.cell_ring(F.col(cell_col), radius, res)
        ).alias("cell_id"),
        F.col(value_col).alias("_v"),
    )
    return t.groupBy("cell_id").agg(
        F.count(F.lit(1)).alias("n_src"),
        F.sum("_v").cast("long").alias("v_sum"),
        F.min("_v").alias("v_min"),
        F.max("_v").alias("v_max"),
        F.expr("sum(_v) * 1000 div count(*)").alias("v_mean_milli"),
    )
