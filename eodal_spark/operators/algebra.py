"""Column algebra + named-index registry — `BandOperator` and
`SpectralIndices` re-expressed as Catalyst expressions.

The reference dispatches band arithmetic through ``eval`` strings
(`eodal/core/operators.py:29`, `eodal/core/band.py:74-148`) and holds a
registry of 17 named spectral-index formulas
(`eodal/core/spectral_indices.py:89-122`, NDVI band.py:124-138, EVI with
±1 clipping :140-160, …).  Here every index is a named Column
expression; a chain of them is **one fused whole-stage-codegen
projection** — the eval dispatch, the per-op array materialization and
the deepcopies (band.py:141-148) all disappear.

The "bands" of the web-text engine are per-row numeric metrics (token
counts, quality scores, byte sizes…), but the registry is generic: any
column names can be bound to an index formula (band-alias remapping ≡
`spectral_indices.py:34-73`).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# registry: name -> fn(bands: dict[str, Column]) -> Column
_REGISTRY: dict[str, Callable[[dict], Column]] = {}


def register_index(name: str, fn: Callable[[dict], Column]) -> None:
    """User-extensible registration — ≡ custom upper-case SI methods
    (`spectral_indices.py:76-87`)."""
    _REGISTRY[name.upper()] = fn


def list_indices() -> list[str]:
    return sorted(_REGISTRY)


def calc_index(name: str, bands: dict[str, Column]) -> Column:
    """Materialize index ``name`` over a band→Column binding, with the
    reference's inf→NULL post-processing (`spectral_indices.py:113-121`)."""
    key = name.upper()
    if key not in _REGISTRY:
        raise ValueError(f"unknown index {name}; known: {list_indices()}")
    v = _REGISTRY[key](bands)
    return F.when(F.isnan(v) | (F.abs(v) == float("inf")), None).otherwise(v)


def with_indices(df: DataFrame, bindings: dict[str, str], *names: str) -> DataFrame:
    """Add one column per index, all in a single fused projection.
    ``bindings`` maps logical band names (nir, red, …) to df columns."""
    bands = {k: F.col(v) for k, v in bindings.items()}
    return df.select(
        "*", *[calc_index(n, bands).alias(n.lower()) for n in names]
    )


def _norm_diff(a: Column, b: Column) -> Column:
    # try_divide: x/0 → NULL — the Spark-ANSI-safe equivalent of the
    # reference's inf→NaN post-processing (spectral_indices.py:113-121)
    return F.try_divide(a - b, a + b)


# the reference's index set (formulas from eodal/core/band.py:124-356),
# expressed over generic band bindings
register_index("NDVI", lambda b: _norm_diff(b["nir"], b["red"]))
def _evi(b: dict) -> Column:
    # ±1 clip per Huete et al. (band.py:140-160); div-by-zero stays NULL
    # (Spark's least/greatest would otherwise swallow the NULL into the
    # clip bound — engines disagree on NULL there, so guard explicitly)
    v = F.try_divide(
        2.5 * (b["nir"] - b["red"]),
        b["nir"] + 6 * b["red"] - 7.5 * b["blue"] + 1,
    )
    return F.when(v.isNull(), None).otherwise(
        F.least(F.greatest(v, F.lit(-1.0)), F.lit(1.0))
    )


register_index("EVI", _evi)
register_index(
    "MSAVI",
    lambda b: 0.5
    * (2 * b["nir"] + 1 - F.sqrt((2 * b["nir"] + 1) * (2 * b["nir"] + 1) - 8 * (b["nir"] - b["red"]))),
)
register_index("CI_GREEN", lambda b: F.try_divide(b["nir"], b["green"]) - 1)
register_index("NDRE", lambda b: _norm_diff(b["nir"], b["rededge"]))
register_index("BSI", lambda b: _norm_diff(b["swir"] + b["red"], b["nir"] + b["blue"]))
register_index(
    "VARI",
    lambda b: F.try_divide(b["green"] - b["red"], b["green"] + b["red"] - b["blue"]),
)
register_index("NDYI", lambda b: _norm_diff(b["green"], b["blue"]))
register_index("NDWI", lambda b: _norm_diff(b["green"], b["nir"]))
register_index("GNDVI", lambda b: _norm_diff(b["nir"], b["green"]))
register_index("CR", lambda b: F.try_divide(b["vh"], b["vv"]))
register_index("NDTI", lambda b: _norm_diff(b["swir"], b["swir2"]))
# MCARI (spectral_indices.py:229-242): chlorophyll absorption in
# reflectance; rededge = red_edge_1
register_index(
    "MCARI",
    lambda b: ((b["rededge"] - b["red"]) - 0.2 * (b["rededge"] - b["green"]))
    * F.try_divide(b["rededge"], b["red"]),
)
# MTCARI_OSAVI (spectral_indices.py:192-213): TCARI / OSAVI ratio;
# rededge3 = red_edge_3
register_index(
    "MTCARI_OSAVI",
    lambda b: F.try_divide(
        3
        * (
            (b["rededge"] - b["red"])
            - 0.2 * (b["rededge"] - b["green"]) * F.try_divide(b["rededge"], b["red"])
        ),
        (1 + 0.16)
        * F.try_divide(b["rededge3"] - b["red"], b["rededge3"] + b["red"] + 0.16),
    ),
)
# NHI (spectral_indices.py:303-315): ponds with vegetation
register_index("NHI", lambda b: _norm_diff(b["swir"], b["green"]))
# NDRI (spectral_indices.py:331-343): crop residues
register_index("NDRI", lambda b: _norm_diff(b["red"], b["swir2"]))


def scale_values(
    col: Column, scale: float, offset: float, ignore: list | None = None
) -> Column:
    """`Band.scale_data` (`eodal/core/band.py:2205-2259`): gain/offset
    skipping nodata/ignore values — a conditional projection."""
    scaled = col * F.lit(scale) + F.lit(offset)
    if ignore:
        return F.when(col.isin(ignore), col).otherwise(scaled)
    return scaled


def mask_values(
    df: DataFrame, mask_col: str, mask_values: list, target_cols: list[str],
    keep: bool = False,
) -> DataFrame:
    """`RasterCollection.mask` (`eodal/core/raster.py:1445-1548`):
    NULL out target columns where mask_col is (or isn't) in mask_values
    — the reference's per-pixel loop (band.py:1716-1720) becomes a
    vectorized conditional projection."""
    hit = F.col(mask_col).isin(mask_values)
    cond = ~hit if keep else hit
    return df.select(
        *[
            F.when(cond, None).otherwise(F.col(c)).alias(c)
            if c in target_cols
            else F.col(c)
            for c in df.columns
        ]
    )


def mask_from_bits(col: Column, start: int, width: int) -> Column:
    """`Landsat.mask_from_qa_bits` (`eodal/core/sensors/landsat.py:673-716`):
    (x & pattern) >> start — native bitwise ops."""
    pattern = ((1 << width) - 1) << start
    return F.shiftrightunsigned(col.bitwiseAND(F.lit(pattern)).cast("long"), start)
