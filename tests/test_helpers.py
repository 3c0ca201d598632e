"""Filter grammar, CSV stacking, salting, multipoint explode, 3-D
flattening — FIXTURES.md edge cases and SURVEY §2 helpers."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from eodal_spark import geometry
from eodal_spark.operators.filters import Filter, apply_filters
from eodal_spark.operators.tiling import salted_repartition
from eodal_spark.sources.stacking import stack_csv


def test_filter_grammar_validation(spark):
    with pytest.raises(ValueError):
        Filter("x", "~=", 1)
    f = Filter("cloudy_pixel_percentage", "<", 90)
    assert "cloudy_pixel_percentage" in str(f.expression())


def test_filter_apply_and_pushdown(spark, tmp_path):
    p = str(tmp_path / "t.parquet")
    spark.range(100).select(
        F.col("id"), (F.col("id") % 10).alias("cloud")
    ).write.parquet(p)
    df = spark.read.parquet(p)
    out = apply_filters(df, [Filter("cloud", "<", 3), Filter("id", ">=", 10)])
    assert out.count() == 27
    # predicate reaches the scan (PushedFilters non-empty)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "IsNotNull" in plan or "LessThan" in plan


def test_stack_csv_filename_pruning(spark, tmp_path):
    import pandas as pd

    for d, n in [("2020-01-01", 3), ("2020-02-01", 4), ("2021-01-01", 5)]:
        pd.DataFrame({"a": range(n)}).to_csv(tmp_path / f"data_{d}.csv", index=False)
    out = stack_csv(
        spark, str(tmp_path), dt.date(2020, 1, 1), dt.date(2020, 12, 31)
    )
    assert out.count() == 7  # 2021 file pruned before read
    dates = {str(r["file_date"]) for r in out.select("file_date").distinct().collect()}
    assert dates == {"2020-01-01", "2020-02-01"}
    with pytest.raises(FileNotFoundError):
        stack_csv(spark, str(tmp_path), dt.date(1999, 1, 1), dt.date(1999, 2, 1))


def test_salted_repartition_balances(spark):
    # one hot key: 10k rows of key 7, 100 of others
    df = spark.range(10_100).select(
        F.when(F.col("id") < 10_000, 7).otherwise(F.col("id") % 10).alias("k"),
        F.concat(F.lit("u"), F.col("id")).alias("url"),
    )
    salted = salted_repartition(df, "k", salt_buckets=8)
    # two-level aggregate gives the same counts as direct groupBy
    two_level = (
        salted.groupBy("k", "_salt").agg(F.count(F.lit(1)).alias("c"))
        .groupBy("k").agg(F.sum("c").alias("n"))
    )
    direct = df.groupBy("k").agg(F.count(F.lit(1)).alias("n"))
    assert (
        two_level.join(direct, "k")
        .filter(two_level["n"] != direct["n"])
        .count()
        == 0
    )
    # the hot key spreads over multiple salt buckets
    spread = (
        salted.filter("k = 7").select("_salt").distinct().count()
    )
    assert spread >= 6
    # deterministic salt (content-derived, survives recomputation)
    s1 = salted.select("url", "_salt").orderBy("url").collect()
    s2 = salted_repartition(df.repartition(5), "k", 8).select(
        "url", "_salt"
    ).orderBy("url").collect()
    assert s1 == s2


def test_explode_multipoints(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 2.0], [10.0, 20.0]), (2, [3.0], [30.0])],
        ["id", "mxs", "mys"],
    )
    out = geometry.explode_multipoints(df).orderBy("id", "lon").collect()
    assert [(r["id"], r["lon"], r["lat"]) for r in out] == [
        (1, 1.0, 10.0), (1, 2.0, 20.0), (2, 3.0, 30.0),
    ]


def test_polygons_df_flattens_3d(spark):
    # z coordinates must be dropped (≡ core/utils/geometry.py:106-136)
    polys = geometry.polygons_df(
        spark, [(1, [(0.0, 0.0, 5.0), (4.0, 0.0, 5.0), (4.0, 4.0, 5.0), (0.0, 4.0, 5.0)])]
    )
    row = polys.first()
    assert row["xs"] == [0.0, 4.0, 4.0, 0.0]
    assert row["is_convex"]


def test_polygons_df_closed_ring_and_cw_normalized(spark):
    # closed CW ring: last point dropped, orientation flipped to CCW
    cw_closed = [(0.0, 0.0), (0.0, 4.0), (4.0, 4.0), (4.0, 0.0), (0.0, 0.0)]
    polys = geometry.polygons_df(spark, [(1, cw_closed)])
    row = polys.first()
    assert len(row["xs"]) == 4
    import numpy as np

    xs, ys = np.array(row["xs"]), np.array(row["ys"])
    area2 = float(np.sum(xs * np.roll(ys, -1) - np.roll(xs, -1) * ys))
    assert area2 > 0  # CCW
