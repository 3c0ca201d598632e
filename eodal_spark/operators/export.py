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


def heatmap_grid(
    df: DataFrame,
    res: int,
    value_col: str | None = None,
    cell_col: str = "cell_id",
    cell_res: int | None = None,
) -> DataFrame:
    """2-D binned aggregate — the distributed half of `Band.plot`
    (`eodal/core/band.py:1522`) / `RasterCollection.plot_multiple_bands`
    (`raster.py:1060-1076`): per render-bin row counts and an exact
    integer mean of ``value_col``.  The caller renders (see
    `plot_data`); the engine's job ends at the (x, y, n, mean) grid.
    Pure Catalyst; one partial-aggregated shuffle on the bin key."""
    cell = F.col(cell_col)
    if cell_res is not None and cell_res != res:
        cell = grid.cell_parent(cell, cell_res, res)
    aggs = [F.count(F.lit(1)).alias("n")]
    if value_col is not None:
        aggs.append(
            F.expr(f"sum({value_col}) * 1000 div count(*)").alias("mean_milli")
        )
    return df.groupBy(
        grid.cell_x_of(cell).alias("x"), grid.cell_y_of(cell).alias("y")
    ).agg(*aggs)


def plot_data(
    df: DataFrame,
    value_cols: tuple[str, ...],
    res: int,
    cell_col: str = "cell_id",
) -> dict:
    """`Band.plot`'s data contract without the renderer: the dense
    labeled grid (`to_labeled`) plus extent + per-band value range —
    everything a plotting frontend needs.  Rendering itself
    (`render_plot`) is import-gated on matplotlib, which this container
    does not ship; the reference's epsg/colorbar/colormap handling
    (band.py:1522-1700) belongs to that frontend layer."""
    lab = to_labeled(df, value_cols, res, cell_col)
    lon, lat = lab["coords"]["lon"], lab["coords"]["lat"]
    extent = (
        (float(lon.min()), float(lon.max()), float(lat.min()), float(lat.max()))
        if len(lon) and len(lat)
        else None
    )
    ranges = {
        c: (float(np.nanmin(a)), float(np.nanmax(a))) if a.size and not np.isnan(a).all() else None
        for c, a in lab["data"].items()
    }
    return {**lab, "extent": extent, "vrange": ranges}


DISCRETE_VALUES_CAP = 256


def plot_spec(
    df: DataFrame,
    value_col: str,
    colormap: str = "viridis",
    discrete_values: bool = False,
    user_defined_ticks: list | None = None,
    colorbar_label: str | None = None,
    vmin: float | None = None,
    vmax: float | None = None,
    fontsize: int = 12,
    robust_quantiles: tuple[float, float] = (0.02, 0.98),
) -> dict:
    """`Band.plot`'s STYLING vocabulary (reference
    `eodal/core/band.py:1522-1680`) with the data-plane half computed
    distributed — at 10^12 cells the reference's driver-side
    ``np.nanquantile(values, 0.02)`` / ``np.unique(values)`` cannot
    run, so:

    * ``vmin``/``vmax`` default to the reference's robust 2%/98%
      stretch via ``percentile_approx`` (one aggregation, no
      collect of the band);
    * ``discrete_values`` collects the SORTED DISTINCT value set (the
      reference's ``BoundaryNorm(np.unique(values))`` boundaries +
      colorbar ticks), guarded at ``DISCRETE_VALUES_CAP`` — a
      "discrete" band with 10⁶ levels is a modeling error, surfaced
      loudly instead of OOMing the driver;
    * renderer-plane knobs (``colormap``, ``user_defined_ticks``,
      ``colorbar_label``, ``fontsize``) pass through untouched.

    Returns a plain dict a frontend (`render_plot`, or any client-side
    matplotlib) applies; no matplotlib import needed here."""
    spec: dict = {
        "colormap": colormap,
        "discrete_values": discrete_values,
        "user_defined_ticks": user_defined_ticks,
        "colorbar_label": colorbar_label or value_col,
        "fontsize": fontsize,
    }
    col = F.col(value_col).cast("double")
    if discrete_values:
        rows = (
            df.select(col.alias("v"))
            .where(F.col("v").isNotNull())
            .distinct()
            .orderBy("v")
            .limit(DISCRETE_VALUES_CAP + 1)
            .collect()
        )
        if len(rows) > DISCRETE_VALUES_CAP:
            raise ValueError(
                f"{value_col!r} has more than {DISCRETE_VALUES_CAP} "
                "distinct values — not a discrete band; plot it "
                "continuous (discrete_values=False)"
            )
        uniques = [r["v"] for r in rows]
        spec["boundaries"] = uniques
        spec["ticks"] = (
            user_defined_ticks if user_defined_ticks is not None else uniques
        )
        return spec
    if vmin is None or vmax is None:
        lo_q, hi_q = robust_quantiles
        row = df.agg(
            F.percentile_approx(col, float(lo_q)).alias("lo"),
            F.percentile_approx(col, float(hi_q)).alias("hi"),
        ).first()
        if vmin is None:
            vmin = row["lo"]
        if vmax is None:
            vmax = row["hi"]
    spec["vmin"], spec["vmax"] = vmin, vmax
    spec["ticks"] = user_defined_ticks
    return spec


def render_plot(df: DataFrame, value_col: str, res: int, **plot_kwargs):
    """Matplotlib rendering of one band — import-gated (the sandbox has
    no matplotlib; `plot_data` + `plot_spec` are the dependency-free
    hand-off).  Accepts the reference's styling keywords
    (`plot_spec`'s signature); unknown kwargs flow to ``imshow``."""
    try:
        import matplotlib as mpl
        import matplotlib.pyplot as plt
    except ImportError as e:  # pragma: no cover - matplotlib absent here
        raise ImportError(
            "matplotlib is not installed; use plot_data()/plot_spec() "
            "for the render-ready grid + extent + styling spec"
        ) from e
    spec_keys = (
        "colormap", "discrete_values", "user_defined_ticks",
        "colorbar_label", "vmin", "vmax", "fontsize", "robust_quantiles",
    )
    spec = plot_spec(
        df, value_col,
        **{k: plot_kwargs.pop(k) for k in spec_keys if k in plot_kwargs},
    )
    pd_ = plot_data(df, (value_col,), res)
    fig, ax = plt.subplots()
    kw = dict(cmap=spec["colormap"], **plot_kwargs)
    if spec["discrete_values"]:
        cmap = mpl.colormaps.get_cmap(spec["colormap"])
        kw["norm"] = mpl.colors.BoundaryNorm(spec["boundaries"], cmap.N)
    else:
        kw["vmin"], kw["vmax"] = spec["vmin"], spec["vmax"]
    im = ax.imshow(
        pd_["data"][value_col], origin="lower", extent=pd_["extent"], **kw
    )
    cb = fig.colorbar(im, ax=ax, label=spec["colorbar_label"])
    if spec.get("ticks") is not None:
        cb.set_ticks(spec["ticks"])
    cb.ax.tick_params(labelsize=spec["fontsize"])
    ax.set_xlabel("lon [deg]", fontsize=spec["fontsize"])
    ax.set_ylabel("lat [deg]", fontsize=spec["fontsize"])
    return fig


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
