"""Dtype promotion lattice (≡ eodal/core/utils/__init__.py:7-39)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from eodal_spark import dtypes as DT


def test_rank_and_highest():
    assert DT.type_rank(T.ByteType()) < DT.type_rank(T.LongType())
    # int32 + float32 promotes past float32 (24-bit mantissa would
    # corrupt large ints) — numpy's int32+float32→float64 rule
    assert DT.highest_type([T.IntegerType(), T.FloatType()]) == T.DoubleType()
    assert DT.highest_type([T.LongType(), T.ShortType()]) == T.LongType()
    with pytest.raises(ValueError, match="unknown"):
        DT.type_rank(T.StringType())
    with pytest.raises(ValueError, match="empty"):
        DT.highest_type([])


def test_highest_decimal_widens():
    got = DT.highest_type([T.DecimalType(10, 2), T.DecimalType(8, 5)])
    assert got == T.DecimalType(13, 5)  # intpart 8 + scale 5


def test_stack_union_promotes_losslessly(spark):
    qa = spark.createDataFrame([(1, 100)], ["cell", "v"]).select(
        "cell", F.col("v").cast("tinyint").alias("v")
    )
    refl = spark.createDataFrame([(2, 0.5)], ["cell", "v"]).select(
        "cell", F.col("v").cast("float").alias("v")
    )
    uni = DT.stack_union([qa, refl], ("v",))
    assert uni.schema["v"].dataType == T.FloatType()
    got = {r["cell"]: r["v"] for r in uni.collect()}
    assert got[1] == 100.0 and got[2] == 0.5


def test_long_decimal_stack_does_not_truncate(spark):
    """Regression: a LongType member must widen the promoted decimal's
    integer digits — decimal(5,2) alone would NULL 1_000_000."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    a = spark.createDataFrame([(1_000_000,)], "v long")
    b = spark.createDataFrame([(1.25,)], "v double").select(
        F.col("v").cast(T.DecimalType(5, 2)).alias("v")
    )
    t = DT.highest_type([T.LongType(), T.DecimalType(5, 2)])
    assert isinstance(t, T.DecimalType) and (t.precision, t.scale) == (21, 2)
    out = DT.stack_union([a, b], ("v",)).collect()
    vals = sorted(float(r.v) for r in out)
    assert vals == [1.25, 1_000_000.0]  # nothing NULLed


def test_float_int_promotes_to_double(spark):
    from pyspark.sql import types as T

    # numpy rule the reference inherits: int32/int64 + float32 → float64
    assert isinstance(
        DT.highest_type([T.LongType(), T.FloatType()]), T.DoubleType
    )
    assert isinstance(
        DT.highest_type([T.IntegerType(), T.FloatType()]), T.DoubleType
    )
    # small ints fit float32's mantissa exactly
    assert isinstance(
        DT.highest_type([T.ShortType(), T.FloatType()]), T.FloatType
    )


def test_decimal_float_mix_promotes_to_double(spark):
    from pyspark.sql import types as T

    assert isinstance(
        DT.highest_type([T.DecimalType(10, 2), T.DoubleType()]),
        T.DoubleType,
    )


def test_decimal_widths_combine(spark):
    from pyspark.sql import types as T

    t = DT.highest_type([T.DecimalType(5, 2), T.DecimalType(10, 0)])
    assert (t.precision, t.scale) == (12, 2)
