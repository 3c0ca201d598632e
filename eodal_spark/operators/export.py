"""Labeled nd-array export — the engine's `to_xarray` sink.

The reference exports a Band / RasterCollection to a labeled xarray
DataArray with coordinate vectors derived from the affine geo-transform
(`eodal/core/band.py:2305-2364`, `eodal/core/raster.py:1986-2040`).
Here the analogue pivots a (cell, band-value...) relation into dense
per-band 2-D grids labeled with cell-centroid lon/lat coordinate
vectors.

Contract: this is an **export sink** — the selected window must fit on
the driver (the reference's in-memory Band has the same bound).  The
heavy lifting (filtering to the window, per-cell aggregation) stays in
Spark; only the final pivot runs driver-side on the Arrow-fetched
pandas frame.  ``xarray`` is optional in the runtime (not in this
sandbox): `to_labeled` returns plain numpy + coord dict; `to_xarray`
wraps it when the library is importable and raises with guidance when
not.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from eodal_spark import grid

# dense-window guard (the covering/bucket-guard pattern): two observed
# cells at opposite corners of a fine grid must fail fast with guidance,
# not allocate a driver-crushing dense array
MAX_EXPORT_CELLS = 100_000_000  # ~800 MB float64 per value column


def to_labeled(
    df: DataFrame,
    value_cols: tuple[str, ...],
    res: int,
    cell_col: str = "cell_id",
    nodata: float = np.nan,
) -> dict:
    """Pivot (cell_id, values...) into dense labeled 2-D arrays.

    Returns ``{"coords": {"lon": 1-D, "lat": 1-D}, "data": {band: 2-D
    (lat × lon)}, "res": res}`` — the xarray-free labeled form.  Cells
    absent from ``df`` hold ``nodata`` (≡ the reference's masked-fill on
    export, band.py:2337-2344).  Duplicate cells must be aggregated
    upstream (raises otherwise — silent last-wins would be
    nondeterministic under shuffle)."""
    sel = df.select(
        grid.cell_x_of(F.col(cell_col)).alias("_x"),
        grid.cell_y_of(F.col(cell_col)).alias("_y"),
        *[F.col(c) for c in value_cols],
    )
    pdf = sel.toPandas()  # Arrow batch fetch — the one driver transfer
    if pdf.duplicated(["_x", "_y"]).any():
        raise ValueError(
            "duplicate cells in export window; aggregate per cell first "
            "(e.g. zonal.reduce or mosaic_dedup)"
        )
    if len(pdf) == 0:
        return {
            "coords": {"lon": np.empty(0), "lat": np.empty(0)},
            "data": {c: np.empty((0, 0)) for c in value_cols},
            "res": res,
        }
    # DENSE coordinate ranges (min..max), not just observed values —
    # an entirely-empty lon column / lat row inside the window must
    # appear as a nodata stripe, or consumers treating the result as a
    # regular raster misplace every cell past the gap
    x_lo, x_hi = int(pdf["_x"].min()), int(pdf["_x"].max())
    y_lo, y_hi = int(pdf["_y"].min()), int(pdf["_y"].max())
    n_cells = (x_hi - x_lo + 1) * (y_hi - y_lo + 1)
    if n_cells > MAX_EXPORT_CELLS:
        raise ValueError(
            f"dense export window spans {n_cells:,} cells "
            f"(> {MAX_EXPORT_CELLS:,}); export a smaller window, a coarser "
            f"resolution (grid.cell_parent), or keep the relation sparse"
        )
    xs = np.arange(x_lo, x_hi + 1, dtype=np.int64)
    ys = np.arange(y_lo, y_hi + 1, dtype=np.int64)
    n = 1 << res
    coords = {
        "lon": (xs + 0.5) / n * 360.0 - 180.0,
        "lat": (ys + 0.5) / n * 180.0 - 90.0,
    }
    # contiguous ranges → indices by subtraction (no per-row dict maps)
    row_i = pdf["_y"].to_numpy(dtype=np.int64) - y_lo
    col_i = pdf["_x"].to_numpy(dtype=np.int64) - x_lo
    data = {}
    for c in value_cols:
        a = np.full((len(ys), len(xs)), nodata, dtype=np.float64)
        a[row_i, col_i] = pdf[c].to_numpy(dtype=np.float64)
        data[c] = a
    return {"coords": coords, "data": data, "res": res}


def to_xarray(
    df: DataFrame,
    value_cols: tuple[str, ...],
    res: int,
    cell_col: str = "cell_id",
    nodata: float = np.nan,
):
    """`Band.to_xarray` twin: an ``xarray.Dataset`` with (lat, lon)
    coords, one variable per value column.  Requires ``xarray`` at
    runtime; `to_labeled` is the dependency-free equivalent."""
    try:
        import xarray as xr
    except ImportError as e:  # pragma: no cover - xarray absent in sandbox
        raise ImportError(
            "xarray is not installed; use to_labeled() for the plain "
            "numpy + coords form"
        ) from e
    lab = to_labeled(df, value_cols, res, cell_col, nodata)
    return xr.Dataset(
        {c: (("lat", "lon"), a) for c, a in lab["data"].items()},
        coords=lab["coords"],
    )
