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
