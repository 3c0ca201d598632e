"""Sensor-adapter registry: named column maps + scale/QA rules over the
generic primitives (≡ eodal/core/sensors/{sentinel2,landsat,sentinel1}.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from eodal_spark.sources import sensors as SN


def test_registry_contents():
    assert {"sentinel2", "landsat", "sentinel1", "superdove"} <= set(SN.list_adapters())
    with pytest.raises(ValueError, match="unknown sensor"):
        SN.get_adapter("modis")


def test_s2_baseline_switch(spark):
    """PDGS >= 400 rows get the -0.1 offset, older rows don't; DN 0 is
    nodata → NULL (sentinel2.py:100-121)."""
    df = spark.createDataFrame(
        [(1, 2000, 300), (2, 2000, 400), (3, 0, 400)],
        ["id", "B04", "baseline"],
    )
    out = SN.apply_adapter(
        df, "sentinel2", bands=("red",), baseline_col="baseline", keep=("id",)
    ).orderBy("id").collect()
    assert out[0]["red"] == pytest.approx(0.2)
    assert out[1]["red"] == pytest.approx(0.1)   # 0.2 - 0.1 offset
    assert out[2]["red"] is None                 # nodata
    # the baseline column is REQUIRED for baseline-dependent adapters
    with pytest.raises(ValueError, match="baseline"):
        SN.apply_adapter(df, "sentinel2", bands=("red",))


def test_landsat_qa_masks(spark):
    df = spark.createDataFrame(
        [
            (1, 100, 1 << 3),            # cloud bit
            (2, 100, 1 << 7),            # water bit
            (3, 100, (1 << 5) | (1 << 7)),  # both
            (4, 100, 1 << 0),            # neither (fill bit)
        ],
        ["id", "red", "qa_pixel"],
    )
    out = SN.apply_adapter(
        df, "landsat", bands=("red",), keep=("id",)
    ).orderBy("id").collect()
    assert [(r["cloud_mask"], r["water_mask"]) for r in out] == [
        (True, False), (False, True), (True, True), (False, False)
    ]
    # Collection-2 reflectance scaling
    assert out[0]["red"] == pytest.approx(100 * 0.0000275 - 0.2)


def test_s1_polarization_selection(spark):
    df = spark.createDataFrame([(1, 10, 20, 99)], ["id", "VV", "VH", "junk"])
    out = SN.apply_adapter(df, "sentinel1", keep=("id",))
    assert set(out.columns) == {"id", "vv", "vh"}   # junk not read
    row = out.first()
    assert row["vv"] == 10.0 and row["vh"] == 20.0


def test_adapter_is_single_projection_no_python(spark):
    df = spark.createDataFrame([(1, 100, 3)], ["id", "red", "qa_pixel"])
    out = SN.apply_adapter(df, "landsat", bands=("red",), keep=("id",))
    plan = out._jdf.queryExecution().executedPlan().toString()
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan


def test_s2_scl_class_mask(spark):
    """S2's SCL is categorical, not a bitmask: cloud_mask is class
    membership in the reference default set [1,2,3,7,8,9,10,11]
    (sentinel2.py:606), and the SCL band passes through UNscaled."""
    df = spark.createDataFrame(
        [(1, 2000, 300, 4), (2, 2000, 300, 9), (3, 2000, 300, 3)],
        ["id", "B04", "baseline", "SCL"],
    )
    out = SN.apply_adapter(
        df, "sentinel2", bands=("red", "scl"), baseline_col="baseline",
        keep=("id",),
    ).orderBy("id").collect()
    assert [r["cloud_mask"] for r in out] == [False, True, True]
    assert [r["scl"] for r in out] == [4, 9, 3]   # raw class codes, not scaled
    # a frame WITHOUT the SCL column still works (metadata-only scans)
    df2 = spark.createDataFrame([(1, 2000, 300)], ["id", "B04", "baseline"])
    out2 = SN.apply_adapter(
        df2, "sentinel2", bands=("red",), baseline_col="baseline", keep=("id",)
    )
    assert "cloud_mask" not in out2.columns


def test_safe_name_helpers_null_safe_under_ansi(spark):
    """Malformed hrefs / short SAFE names must yield NULL, not throw —
    element_at on an empty array and strict casts THROW under Spark 4's
    default ANSI mode, so the helpers use get/try_* forms."""
    from pyspark.sql import functions as F

    from eodal_spark.sources import sensors as SN

    df = spark.createDataFrame(
        [
            ("https://x.example/no/safe/here.jp2",),
            ("https://a/S2X_weird.SAFE/b.jp2",),  # too few fields
            ("https://a/S2A_MSIL2A_20220101T103421_N0400_R108_T32TMT_"
             "20230101T000000.SAFE/b.jp2",),
        ],
        ["url"],
    )
    sn = SN.safe_name_from_url("url")
    rows = df.select(
        sn.alias("s"),
        SN.s2_platform(sn).alias("p"),
        SN.s2_processing_level(sn).alias("l"),
        SN.s2_acquisition_time(sn).alias("t"),
        SN.s2_processing_baseline(sn).alias("b"),
        SN.s2_tile(sn).alias("tile"),
    ).collect()
    assert rows[0].s is None and rows[0].b is None and rows[0].t is None
    assert rows[1].s == "S2X_weird.SAFE" and rows[1].l is None
    assert rows[1].tile is None and rows[1].b is None
    assert rows[2].p == "S2A" and rows[2].b == 400 and rows[2].tile == "T32TMT"
