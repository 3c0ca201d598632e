"""Interpolating resample kernels — the relational analogues of the
reference's `Band.resample` interpolation modes
(`/root/reference/eodal/core/band.py:1771-1860`, mask resample :1917).

The reference changes pixel size with an OpenCV kernel over a dense
array; on a relation keyed by grid cell the same semantics decompose
into:

* ``downsample_agg``    — cv2.INTER_AREA analogue: each coarse cell is
  an aggregate (mean/median/min/max) of the fine cells it covers; one
  groupBy on the bit-shifted parent key, map-side combinable.
* ``upsample_bilinear`` — cv2.INTER_LINEAR/CUBIC analogue: each fine
  cell interpolates the (up to) four coarse cells whose centroids
  surround its own, with exact INTEGER bilinear weights, so the result
  is bit-identical across engines (the DuckDB oracle runs the same
  arithmetic — see `sql_upsample_bilinear`).
* the NEAREST analogue stays `grid.cell_parent`/`grid.cell_children`
  (pure bit shifts — carry-down).

Nodata handling matches the reference ("nodata pixels are not used for
resampling"): absent cells simply contribute nothing, and bilinear
weights renormalize over the parents actually present.

Scale notes: downsample is one partial-aggregated shuffle on compact
long keys.  Upsample is an explode (×4 contributions per child) plus
one equi-join on the parent cell key against the coarse relation —
broadcastable when the coarse side is small, shuffle-on-key otherwise;
no Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from eodal_spark import grid

_STATS = ("count", "mean_milli", "min", "max", "median")


def downsample_agg(
    df: DataFrame,
    cell_col: str,
    res_from: int,
    res_to: int,
    value_col: str,
    stats: tuple[str, ...] = ("count", "mean_milli"),
) -> DataFrame:
    """Aggregate a fine-cell relation to coarse cells (AREA kernel).

    ``mean_milli`` is exact integer arithmetic (sum·1000 div count) so
    oracle gates hash-match; median/min/max/count are the usual
    `Band.reduce` set applied per parent cell."""
    unknown = set(stats) - set(_STATS)
    if unknown:
        raise ValueError(f"unknown stats {sorted(unknown)}; supported: {_STATS}")
    v = F.col(value_col)
    exprs = {
        "count": F.count(F.lit(1)).alias("count"),
        "mean_milli": F.expr(f"sum({value_col}) * 1000 div count(*)").alias(
            "mean_milli"
        ),
        "min": F.min(v).alias("min"),
        "max": F.max(v).alias("max"),
        "median": F.median(v).alias("median"),
    }
    parent = grid.cell_parent(F.col(cell_col), res_from, res_to)
    return df.groupBy(parent.alias("cell_to")).agg(
        *[exprs[s] for s in stats]
    )


def _contrib_array(
    x: Column, y: Column, res_from: int, res_to: int
) -> Column:
    """Array of the four (parent_cell, weight) bilinear contributions of
    the child cell (x, y) at ``res_to`` against the ``res_from`` grid.

    All integers.  With D = 2^(res_to-res_from) children per axis, the
    child centroid sits at 2x+1 and a parent centroid at 2·px·D + D in
    half-child units; the fractional offset rx = (2x+1-D) - 2D·floor(·)
    ∈ [0, 2D) splits the axis weight (2D-rx, rx).  Longitude wraps,
    latitude clamps (boundary parents absorb both weights)."""
    d = 1 << (res_to - res_from)
    n_from = 1 << res_from
    two_d = 2 * d
    base = F.lit(res_from << 58)

    def axis(c: Column):
        # 2D is a power of two: the +two_d offset keeps the dividend
        # nonnegative so a right shift IS the floor division (and DuckDB's
        # `//` on the same nonnegative dividend is identical)
        num = 2 * c + 1 - d
        p0 = F.shiftrightunsigned(num + two_d, res_to - res_from + 1) - 1
        r = num - two_d * p0
        return p0, F.lit(two_d) - r, r

    p0x, wx0, wx1 = axis(x)
    p0y, wy0, wy1 = axis(y)

    def pack(px: Column, py: Column) -> Column:
        pxw = F.pmod(px, F.lit(n_from)).cast("long")
        pyc = F.greatest(F.lit(0).cast("long"), F.least(py.cast("long"), F.lit(n_from - 1).cast("long")))
        return base + F.shiftleft(pxw, 29) + pyc

    return F.array(
        *[
            F.struct(pack(px, py).alias("cell_from"), (wx * wy).alias("w"))
            for px, wx in ((p0x, wx0), (p0x + 1, wx1))
            for py, wy in ((p0y, wy0), (p0y + 1, wy1))
        ]
    )


def upsample_bilinear(
    coarse: DataFrame,
    cell_col: str,
    res_from: int,
    res_to: int,
    value_col: str,
    broadcast_coarse: bool = False,
) -> DataFrame:
    """Interpolating upsample: every child of an observed coarse cell
    gets the integer-bilinear blend of the ≤4 surrounding coarse values,
    renormalized over the parents present (nodata contributes nothing).

    Returns (cell_to, value_milli) with
    value_milli = Σ wᵢ·vᵢ·1000 div Σ wᵢ — exact integers end to end.
    """
    children = coarse.select(
        F.explode(
            grid.cell_children(F.col(cell_col), res_from, res_to)
        ).alias("cell_to")
    ).distinct()
    contribs = children.select(
        "cell_to",
        F.explode(
            _contrib_array(
                grid.cell_x_of(F.col("cell_to")).cast("long"),
                grid.cell_y_of(F.col("cell_to")).cast("long"),
                res_from,
                res_to,
            )
        ).alias("c"),
    ).select(
        "cell_to", F.col("c.cell_from").alias("cell_from"), F.col("c.w").alias("w")
    )
    vals = coarse.select(
        F.col(cell_col).alias("cell_from"), F.col(value_col).alias("_v")
    )
    if broadcast_coarse:
        vals = F.broadcast(vals)
    joined = contribs.join(vals, "cell_from")
    return (
        joined.groupBy("cell_to")
        .agg(
            F.expr("sum(w * _v) * 1000 div sum(w)").alias("value_milli"),
        )
    )


def sql_upsample_bilinear(
    coarse_rel: str, res_from: int, res_to: int, value_expr: str = "v"
) -> str:
    """DuckDB twin of `upsample_bilinear` for oracle gates.

    ``coarse_rel`` must be a relation (subquery string) with columns
    (cell_from, v).  Emits identical integer arithmetic: nonnegative
    truncating division, pmod-wrapped x, clamped y."""
    d = 1 << (res_to - res_from)
    n_from = 1 << res_from
    two_d = 2 * d
    base_from = res_from << 58
    base_to = res_to << 58
    dr = res_to - res_from
    # children of every coarse cell (cross with the D×D offsets)
    return f"""
        WITH coarse AS (SELECT cell_from, {value_expr} AS v FROM {coarse_rel}),
        children AS (
          SELECT DISTINCT
            {base_to} + ((((cell_from >> 29) & 536870911) << {dr}) + dx) * 536870912
                      + (((cell_from & 536870911) << {dr}) + dy) AS cell_to
          FROM coarse,
               UNNEST(generate_series(0, {d - 1})) AS tx(dx),
               UNNEST(generate_series(0, {d - 1})) AS ty(dy)
        ),
        ax AS (
          SELECT cell_to,
                 (cell_to >> 29) & 536870911 AS x,
                 cell_to & 536870911 AS y
          FROM children
        ),
        frac AS (
          SELECT cell_to,
                 ((2 * x + 1 - {d} + {two_d}) // {two_d}) - 1 AS p0x,
                 ((2 * y + 1 - {d} + {two_d}) // {two_d}) - 1 AS p0y,
                 (2 * x + 1 - {d}) - {two_d} * (((2 * x + 1 - {d} + {two_d}) // {two_d}) - 1) AS rx,
                 (2 * y + 1 - {d}) - {two_d} * (((2 * y + 1 - {d} + {two_d}) // {two_d}) - 1) AS ry
          FROM ax
        ),
        contrib AS (
          SELECT cell_to,
                 {base_from} + (((p0x + ox) % {n_from} + {n_from}) % {n_from}) * 536870912
                             + greatest(0, least(p0y + oy, {n_from - 1})) AS cell_from,
                 (CASE WHEN ox = 0 THEN {two_d} - rx ELSE rx END)
               * (CASE WHEN oy = 0 THEN {two_d} - ry ELSE ry END) AS w
          FROM frac,
               UNNEST([0, 1]) AS t1(ox),
               UNNEST([0, 1]) AS t2(oy)
        )
        SELECT c.cell_to,
               CAST(sum(c.w * coarse.v) * 1000 // sum(c.w) AS BIGINT) AS value_milli
        FROM contrib c JOIN coarse ON c.cell_from = coarse.cell_from
        GROUP BY c.cell_to
    """
