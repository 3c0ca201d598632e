"""Interpolating resample kernels (≡ `eodal/core/band.py:1771-1860`):
AREA downsample aggregation and integer-bilinear upsample."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from eodal_spark import grid
from eodal_spark.operators import resample as RS


def _cell(x: int, y: int, res: int) -> int:
    return (res << 58) + (x << 29) + y


def test_downsample_agg_stats(spark):
    # four res-2 cells under one res-1 parent, values 1..4
    rows = [(_cell(x, y, 2), 1 + x * 2 + y) for x in (0, 1) for y in (0, 1)]
    df = spark.createDataFrame(rows, ["cell", "v"])
    out = RS.downsample_agg(
        df, "cell", 2, 1, "v", stats=("count", "mean_milli", "min", "max", "median")
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r["cell_to"] == _cell(0, 0, 1)
    assert (r["count"], r["mean_milli"], r["min"], r["max"]) == (4, 2500, 1, 4)
    assert r["median"] == 2.5


def test_downsample_agg_unknown_stat_raises(spark):
    df = spark.createDataFrame([(_cell(0, 0, 2), 1)], ["cell", "v"])
    with pytest.raises(ValueError, match="unknown stats"):
        RS.downsample_agg(df, "cell", 2, 1, "v", stats=("variance",))


def test_upsample_bilinear_constant_field_is_constant(spark):
    # constant coarse field → every child must equal value*1000 exactly
    rows = [(_cell(x, y, 2), 7) for x in range(4) for y in range(4)]
    df = spark.createDataFrame(rows, ["cell", "v"])
    out = RS.upsample_bilinear(df, "cell", 2, 4, "v").collect()
    assert len(out) == 16 * 16  # full 4×4 grid → 16×16 fine cells
    assert {r["value_milli"] for r in out} == {7000}


def test_upsample_bilinear_single_parent_carries_value(spark):
    # one isolated parent: all its children renormalize to the lone value
    df = spark.createDataFrame([(_cell(1, 1, 3), 5)], ["cell", "v"])
    out = RS.upsample_bilinear(df, "cell", 3, 5, "v").collect()
    assert len(out) == 16  # 4×4 children
    assert {r["value_milli"] for r in out} == {5000}


def test_upsample_bilinear_gradient_interpolates(spark):
    # two adjacent parents 0 and 8: children between the centroids step
    # linearly; child column aligned with a centroid hits it exactly
    df = spark.createDataFrame(
        [(_cell(0, 0, 3), 0), (_cell(1, 0, 3), 8)], ["cell", "v"]
    )
    out = {
        (grid_x(r["cell_to"]), grid_y(r["cell_to"])): r["value_milli"]
        for r in RS.upsample_bilinear(df, "cell", 3, 4, "v").collect()
    }
    # res-4 children x=0..3 over the two parents; centroids at x=0.5,2.5
    # child centers 0.5,1.5,2.5,3.5 → fractions 0, 1/4... with D=2,
    # contributions renormalize at the outer edges (missing neighbours)
    assert out[(1, 0)] == 2000  # midpointish: (3*0 + 1*8)/4 = 2
    assert out[(2, 0)] == 6000  # (1*0 + 3*8)/4 = 6
    assert out[(0, 0)] == 0     # left edge: renormalized to parent 0
    assert out[(3, 0)] == 8000  # right edge: renormalized to parent 8


def grid_x(cell: int) -> int:
    return (cell >> 29) & ((1 << 29) - 1)


def grid_y(cell: int) -> int:
    return cell & ((1 << 29) - 1)


def test_upsample_matches_duckdb_twin(spark):
    """Random-ish sparse coarse field: Spark and the oracle SQL twin must
    agree bit-for-bit (the cross-engine guarantee the gate relies on)."""
    import duckdb

    rows = [
        (_cell(x, y, 4), (x * 7 + y * 13) % 23 + 1)
        for x in range(16)
        for y in range(16)
        if (x + y) % 3  # holes: exercise renormalization
    ]
    df = spark.createDataFrame(rows, ["cell_from", "v"])
    got = sorted(
        (r["cell_to"], r["value_milli"])
        for r in RS.upsample_bilinear(df, "cell_from", 4, 6, "v").collect()
    )
    vals = ", ".join(f"({c}, {v})" for c, v in rows)
    exp = sorted(
        map(
            tuple,
            duckdb.sql(
                RS.sql_upsample_bilinear(
                    f"(SELECT * FROM (VALUES {vals}) t(cell_from, v))", 4, 6
                )
            ).fetchall(),
        )
    )
    assert got == exp
