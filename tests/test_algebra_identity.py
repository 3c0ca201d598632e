"""Column-algebra identity tests — ≡ the reference's operator-inverse
suite (`tests/core/test_band_algebra.py:6-113`,
`tests/core/test_raster_algebra.py:7-120`): ``(band+s)-band == s`` in
both operand orders, comparison ops returning masks, etc.  Property-
based via hypothesis over the scalar, like-for-like."""

from __future__ import annotations

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

scalars = st.floats(
    min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
).map(lambda v: round(v, 6))


@pytest.fixture(scope="module")
def band(spark):
    # a "band": one numeric column over a deterministic grid
    return spark.range(500).select(
        (F.col("id") * 0.37 - 92.5).alias("v")
    ).cache()


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(s=scalars)
def test_add_sub_inverse(band, s):
    # (v + s) - v == s and (s + v) - v == s  (both operand orders,
    # ≡ test_band_algebra scalar identities)
    out = band.select(
        ((F.col("v") + F.lit(s)) - F.col("v")).alias("a"),
        ((F.lit(s) + F.col("v")) - F.col("v")).alias("b"),
    ).agg(F.max(F.abs(F.col("a") - F.lit(s))), F.max(F.abs(F.col("b") - F.lit(s)))).first()
    assert out[0] <= 1e-9 and out[1] <= 1e-9


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(s=scalars.filter(lambda v: abs(v) > 1e-3))
def test_mul_div_inverse(band, s):
    out = band.select(
        ((F.col("v") * F.lit(s)) / F.lit(s)).alias("a"), F.col("v")
    ).agg(F.max(F.abs(F.col("a") - F.col("v")))).first()[0]
    assert out <= 1e-6


def test_comparison_ops_return_masks(band):
    # comparisons yield boolean columns usable as masks (≡ band
    # comparison dunders returning mask arrays)
    n = band.count()
    lt = band.filter(F.col("v") < 0).count()
    ge = band.filter(F.col("v") >= 0).count()
    assert lt + ge == n and 0 < lt < n
    # mask algebra: (v<0) OR (v>=0) is total, AND is empty
    both = band.filter((F.col("v") < 0) & (F.col("v") >= 0)).count()
    assert both == 0


def test_band_on_band_algebra(spark):
    # band-on-band ops (rops included): v2 = v*2 → v2/v == 2, v2-v == v
    df = spark.range(1, 300).select((F.col("id") * 0.5).alias("v"))
    out = df.select(
        ((F.col("v") * 2) / F.col("v")).alias("ratio"),
        ((F.col("v") * 2) - F.col("v")).alias("diff"),
        F.col("v"),
    )
    bad = out.filter(
        (F.abs(F.col("ratio") - 2) > 1e-12) | (F.abs(F.col("diff") - F.col("v")) > 1e-12)
    ).count()
    assert bad == 0


def test_power_and_sqrt(spark):
    df = spark.range(1, 100).select(F.col("id").cast("double").alias("v"))
    out = df.select((F.sqrt(F.col("v") * F.col("v"))).alias("s"), "v")
    assert out.filter(F.abs(F.col("s") - F.col("v")) > 1e-12).count() == 0
