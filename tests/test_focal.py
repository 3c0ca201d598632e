"""Focal statistics: hand-computed box-kernel neighbourhoods on a tiny
grid, exercising the x-wrap and y-clamp edge semantics of
`grid.cell_ring` (distributed analogue of the numpy kernel post-
processing the reference leaves to callers of `Band.values`,
`/root/reference/eodal/core/band.py:353-365`)."""

from __future__ import annotations

from eodal_spark.operators.focal import focal_stats

RES = 2  # 4 × 4 grid


def _cell(x: int, y: int) -> int:
    return (RES << 58) | (x << 29) | y


def test_focal_stats_wrap_clamp_and_values(spark):
    src = spark.createDataFrame(
        [(_cell(0, 0), 10), (_cell(3, 0), 20), (_cell(1, 3), 5)],
        ["cell_id", "v"],
    )
    out = {r.cell_id: r for r in focal_stats(src, RES, radius=1).collect()}

    # wrap: x=0 and x=3 are Chebyshev-1 neighbours on a 4-wide grid,
    # so (0,0) aggregates BOTH sources on row 0
    r = out[_cell(0, 0)]
    assert (r.n_src, r.v_sum, r.v_min, r.v_max, r.v_mean_milli) == (
        2, 30, 10, 20, 15_000,
    )
    assert out[_cell(3, 0)].v_sum == 30  # ditto, via the other wrap side
    # non-wrapping neighbours see one source each
    assert out[_cell(1, 0)].v_sum == 10
    assert out[_cell(2, 0)].v_sum == 20
    # clamp: y=-1 / y=4 targets must not exist
    assert all((c & ((1 << 29) - 1)) < 4 for c in out)
    # full target set: 8 around the row-0 pair + 6 around (1,3)
    assert len(out) == 14
    assert out[_cell(0, 3)].v_sum == 5 and out[_cell(2, 2)].v_sum == 5


def test_focal_stats_radius_zero_is_identity(spark):
    src = spark.createDataFrame(
        [(_cell(1, 1), 7), (_cell(2, 2), 9)], ["cell_id", "v"]
    )
    out = {
        r.cell_id: (r.n_src, r.v_sum)
        for r in focal_stats(src, RES, radius=0).collect()
    }
    assert out == {_cell(1, 1): (1, 7), _cell(2, 2): (1, 9)}


def test_gradient_linear_plane(spark):
    """v = 3x + 5y on a full patch: interior Horn gradients are exactly
    (24, 40) = 8*(3, 5); stencil-starved edges report n_src < 8."""
    from eodal_spark.operators.focal import gradient

    rows = [(_cell(x, y), 3 * x + 5 * y) for x in range(4) for y in range(4)]
    src = spark.createDataFrame(rows, ["cell_id", "v"])
    out = {r.cell_id: r for r in gradient(src, RES).collect()}
    # res 2 -> 4-wide grid: x WRAPS, so every x is interior; y clamps
    for x in range(4):
        for y in (1, 2):
            r = out[_cell(x, y)]
            assert r.n_src == 8
            if x in (1, 2):  # away from the wrap seam the plane is linear
                assert (r.gx8, r.gy8) == (24, 40)
    # wrap seam: x=0 gathers x=3's values (v jumps by -9), not 3*(-1)
    assert out[_cell(0, 1)].gx8 != 24
    # y edges lack the full stencil
    assert out[_cell(1, 0)].n_src < 8


def test_slope_aspect_vs_python(spark):
    import math

    from eodal_spark.operators.focal import slope_aspect

    rows = [(_cell(x, y), 3 * x + 5 * y) for x in range(4) for y in range(4)]
    src = spark.createDataFrame(rows, ["cell_id", "v"])
    out = {r.cell_id: r for r in slope_aspect(src, RES, cell_size=1.0).collect()}
    # require_full drops y-edge cells
    assert all((c & ((1 << 29) - 1)) in (1, 2) for c in out)
    r = out[_cell(1, 1)]
    want_slope = math.degrees(math.atan(math.hypot(24, 40) / 8.0))
    want_aspect = (math.degrees(math.atan2(-24, -40)) + 360) % 360
    assert abs(r.slope_deg - want_slope) < 1e-9
    assert abs(r.aspect_deg - want_aspect) < 1e-9
    # ascending towards +x/+y => descent points into the third quadrant
    assert 180 < r.aspect_deg < 270


def test_focal_kernel_single_pass_plan(spark):
    from eodal_spark.operators.focal import gradient

    src = spark.createDataFrame([(_cell(1, 1), 7)], ["cell_id", "v"])
    plan = gradient(src, RES)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert plan.count("Exchange") == 1  # ONE shuffle for both kernels
