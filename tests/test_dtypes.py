"""Dtype promotion lattice (≡ eodal/core/utils/__init__.py:7-39)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from eodal_spark import dtypes as DT


def test_rank_and_highest():
    assert DT.type_rank(T.ByteType()) < DT.type_rank(T.LongType())
    assert DT.highest_type([T.IntegerType(), T.FloatType()]) == T.FloatType()
    assert DT.highest_type([T.LongType(), T.ShortType()]) == T.LongType()
    with pytest.raises(ValueError, match="unknown"):
        DT.type_rank(T.StringType())
    with pytest.raises(ValueError, match="empty"):
        DT.highest_type([])


def test_highest_decimal_widens():
    got = DT.highest_type(
        [T.DecimalType(10, 2), T.DecimalType(8, 5), T.DoubleType()]
    )
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
