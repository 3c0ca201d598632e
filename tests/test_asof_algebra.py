"""As-of join + column algebra registry tests."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from eodal_spark.operators import algebra as A
from eodal_spark.operators import asof


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_asof_join_latest_at_or_before(spark):
    left = spark.createDataFrame(
        [
            (1, _ts("2020-01-05T00:00:00"), "e1"),
            (1, _ts("2020-01-10T00:00:00"), "e2"),
            (2, _ts("2020-01-02T00:00:00"), "e3"),
            (3, _ts("2020-01-02T00:00:00"), "e4"),  # key with no right rows
        ],
        ["user_id", "ts", "name"],
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2020-01-04T00:00:00"), 10.0),
            (1, _ts("2020-01-08T00:00:00"), 20.0),
            (1, _ts("2020-01-12T00:00:00"), 30.0),
            (2, _ts("2020-01-02T00:00:00"), 5.0),  # equal ts → inclusive
        ],
        ["user_id", "ots", "val"],
    )
    out = asof.asof_join(
        left, right, on="user_id", left_ts="ts", right_ts="ots",
        right_vals=("val",),
    )
    rows = {r["name"]: r["asof_val"] for r in out.collect()}
    assert rows == {"e1": 10.0, "e2": 20.0, "e3": 5.0, "e4": None}


def test_asof_tolerance(spark):
    left = spark.createDataFrame(
        [(1, _ts("2020-01-10T00:00:00"), "e1")], ["user_id", "ts", "name"]
    )
    right = spark.createDataFrame(
        [(1, _ts("2020-01-01T00:00:00"), 1.0)], ["user_id", "ots", "val"]
    )
    hit = asof.asof_join(left, right, "user_id", "ts", "ots", ("val",),
                         tolerance_seconds=10 * 86400)
    miss = asof.asof_join(left, right, "user_id", "ts", "ots", ("val",),
                          tolerance_seconds=86400)
    assert hit.first()["asof_val"] == 1.0
    assert miss.first()["asof_val"] is None


def test_index_registry_ndvi_evi(spark):
    df = spark.createDataFrame(
        [(0.8, 0.1, 0.05), (0.5, 0.5, 0.1), (0.0, 0.0, 0.0)],
        ["nir", "red", "blue"],
    )
    out = A.with_indices(
        df, {"nir": "nir", "red": "red", "blue": "blue"}, "NDVI", "EVI"
    ).collect()
    assert out[0]["ndvi"] == pytest.approx((0.8 - 0.1) / (0.8 + 0.1))
    assert out[1]["ndvi"] == pytest.approx(0.0)
    assert out[2]["ndvi"] is None  # 0/0 → NULL (inf→NaN rule)
    assert -1.0 <= out[0]["evi"] <= 1.0  # EVI clipping


def test_index_registry_custom_and_unknown(spark):
    A.register_index("DOUBLE_NIR", lambda b: b["nir"] * 2)
    df = spark.createDataFrame([(0.4,)], ["nir"])
    out = A.with_indices(df, {"nir": "nir"}, "DOUBLE_NIR").first()
    assert out["double_nir"] == pytest.approx(0.8)
    with pytest.raises(ValueError):
        A.calc_index("NOPE", {})


def test_scale_and_mask(spark):
    df = spark.createDataFrame(
        [(1, 100, 3), (2, -999, 8), (3, 50, 9)], ["id", "v", "scl"]
    )
    scaled = df.select(
        "id", A.scale_values(F.col("v"), 0.01, 0.0, ignore=[-999]).alias("s")
    ).collect()
    by = {r["id"]: r["s"] for r in scaled}
    assert by[1] == pytest.approx(1.0) and by[2] == -999
    masked = A.mask_values(df, "scl", [8, 9], ["v"]).collect()
    bym = {r["id"]: r["v"] for r in masked}
    assert bym == {1: 100, 2: None, 3: None}
    kept = A.mask_values(df, "scl", [3], ["v"], keep=True).collect()
    byk = {r["id"]: r["v"] for r in kept}
    assert byk == {1: 100, 2: None, 3: None}


def test_mask_from_bits(spark):
    df = spark.createDataFrame([(0b1011000,)], ["qa"])
    out = df.select(A.mask_from_bits(F.col("qa"), 3, 4).alias("b")).first()
    assert out["b"] == 0b1011


def test_asof_nullable_right_vals_come_from_one_row(spark):
    """If the latest right row has NULL in one value column, the output
    must carry that NULL — not stitch the column from an older row."""
    import datetime as dt

    from eodal_spark.operators.asof import asof_join

    t = lambda s: dt.datetime(2024, 1, 1, 0, 0, s)  # noqa: E731
    left = spark.createDataFrame([(1, t(10))], ["k", "lts"])
    right = spark.createDataFrame(
        [(1, t(5), 1, 2), (1, t(8), None, 9)],
        "k long, rts timestamp, a long, b long",
    )
    out = asof_join(
        left, right, on="k", left_ts="lts", right_ts="rts",
        right_vals=("a", "b"),
    ).collect()
    assert len(out) == 1
    assert out[0]["asof_a"] is None     # from the ts=8 row, NOT ts=5's 1
    assert out[0]["asof_b"] == 9


def test_asof_tolerance_subsecond(spark):
    """Tolerance is checked at microsecond precision: a 0.9 s gap must
    fail tolerance 0 (whole-second truncation used to accept it)."""
    import datetime as dt

    from eodal_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1, 10, 0, 0, 900000))], ["k", "lts"]
    )
    right = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1, 10, 0, 0, 0), 7)],
        "k long, rts timestamp, v long",
    )
    out = asof_join(
        left, right, on="k", left_ts="lts", right_ts="rts",
        right_vals=("v",), tolerance_seconds=0,
    ).first()
    assert out["asof_v"] is None
    out1 = asof_join(
        left, right, on="k", left_ts="lts", right_ts="rts",
        right_vals=("v",), tolerance_seconds=1,
    ).first()
    assert out1["asof_v"] == 7
