"""Shared fixtures — one session-scoped SparkSession (local, AQE on)."""

from __future__ import annotations

import pytest

from eodal_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(
        "eodal_spark_tests",
        master="local[4]",
        shuffle_partitions=8,
        extra_conf={
            "spark.sql.warehouse.dir": "/tmp/eodal_spark_test_warehouse",
        },
    )
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def pages_small(spark):
    from eodal_spark.sources.pages import synth_pages

    return synth_pages(spark, 10_000).cache()


@pytest.fixture(scope="session")
def sample_polys(spark):
    """Small deterministic polygon layer inside the pages extent —
    mirrors data/sample_polygons (FIXTURES.md §2): convex polys, one
    concave, one far outside the data extent (empty-result path)."""
    from eodal_spark.geometry import polygons_df

    polys = [
        # Zürich-hotspot box (covers the densest cells — skew case)
        (1, [(7.0, 45.0), (10.0, 45.0), (10.0, 49.0), (7.0, 49.0)]),
        # NYC triangle
        (2, [(-75.5, 39.0), (-72.5, 39.5), (-74.0, 42.5)]),
        # convex pentagon over Tokyo
        (3, [(138.0, 34.0), (141.5, 34.5), (142.0, 36.5), (139.5, 37.8), (137.5, 36.0)]),
        # concave "L" in the uniform background
        (4, [(-30.0, 0.0), (-10.0, 0.0), (-10.0, 5.0), (-25.0, 5.0), (-25.0, 20.0), (-30.0, 20.0)]),
        # fully outside any data (south of lat -60 floor): empty result
        (5, [(-170.0, -89.0), (-160.0, -89.0), (-160.0, -85.0), (-170.0, -85.0)]),
    ]
    attrs = {
        1: {"crop_code": "C1", "crop_type": "urban"},
        2: {"crop_code": "C2", "crop_type": "urban"},
        3: {"crop_code": "C3", "crop_type": "urban"},
        4: {"crop_code": "C4", "crop_type": "rural"},
        5: {"crop_code": "C5", "crop_type": "void"},
    }
    return polygons_df(spark, polys, attrs).cache()
