"""Property-based tests (hypothesis) for the pure-numpy kernels — the
parts of the engine where a silent edge-case break would corrupt every
downstream join: cell encoding, WKT round-trips, PIP kernels, token
hashing. No SparkSession needed; fast."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from eodal_spark import grid
from eodal_spark import geometry as G
from eodal_spark.operators.dedup import _mix64, _token_hashes, _POLY_BASE

lon_st = st.floats(min_value=-180.0, max_value=179.999, allow_nan=False)
lat_st = st.floats(min_value=-90.0, max_value=89.999, allow_nan=False)
res_st = st.integers(min_value=0, max_value=28)


@settings(max_examples=200, deadline=None)
@given(lon=lon_st, lat=lat_st, res=res_st)
def test_cell_encode_decode_roundtrip(lon, lat, res):
    cell = grid.np_cell_encode(np.array([lon]), np.array([lat]), res)[0]
    n = 1 << res
    x = (cell >> 29) & ((1 << 29) - 1)
    y = cell & ((1 << 29) - 1)
    assert cell >> 58 == res
    assert 0 <= x < n and 0 <= y < n
    # the centroid of the decoded cell is within half a cell of the input
    clon = (x + 0.5) / n * 360.0 - 180.0
    clat = (y + 0.5) / n * 180.0 - 90.0
    assert abs(clon - lon) <= 180.0 / n + 1e-9
    assert abs(clat - lat) <= 90.0 / n + 1e-9


@settings(max_examples=100, deadline=None)
@given(lon=lon_st, lat=lat_st, res=st.integers(min_value=1, max_value=28))
def test_cell_parent_contains_child(lon, lat, res):
    child = grid.np_cell_encode(np.array([lon]), np.array([lat]), res)[0]
    parent = grid.np_cell_encode(np.array([lon]), np.array([lat]), res - 1)[0]
    # parent via bit shift == parent via re-encode
    cx = (child >> 29) & ((1 << 29) - 1)
    cy = child & ((1 << 29) - 1)
    assert ((res - 1) << 58) | ((cx >> 1) << 29) | (cy >> 1) == parent


coord_st = st.tuples(
    st.floats(min_value=-170.0, max_value=170.0, allow_nan=False),
    st.floats(min_value=-80.0, max_value=80.0, allow_nan=False),
)


@settings(max_examples=100, deadline=None)
@given(pts=st.lists(coord_st, min_size=3, max_size=12, unique=True))
def test_wkt_round_trip_property(pts):
    wkt = G.to_wkt("POLYGON", [pts])
    gtype, coords = G.parse_wkt(wkt)
    assert gtype == "POLYGON"
    got = coords[0][:-1]  # closing vertex re-added on the wire
    assert len(got) == len(pts)
    for (gx, gy), (px, py) in zip(got, pts):
        assert gx == px and gy == py  # repr round-trip is lossless


@settings(max_examples=60, deadline=None)
@given(
    cx=st.floats(min_value=-100, max_value=100, allow_nan=False),
    cy=st.floats(min_value=-60, max_value=60, allow_nan=False),
    r=st.floats(min_value=0.5, max_value=20.0, allow_nan=False),
    nv=st.integers(min_value=3, max_value=24),
    seed=st.integers(min_value=0, max_value=2**31),
)
def test_pip_convex_agrees_with_even_odd(cx, cy, r, nv, seed):
    """For convex rings the boundary-inclusive convex kernel and the
    half-open even-odd kernel agree on every strictly-interior and
    strictly-exterior point."""
    ang = np.sort(np.random.RandomState(seed).uniform(0, 2 * np.pi, nv))
    if len(np.unique(ang)) < 3:
        return
    xs = cx + r * np.cos(ang)
    ys = cy + r * np.sin(ang)
    rng = np.random.RandomState(seed + 1)
    px = cx + rng.uniform(-1.5 * r, 1.5 * r, 200)
    py = cy + rng.uniform(-1.5 * r, 1.5 * r, 200)
    cvx = G.np_pip_convex(px, py, xs, ys)
    eo = G.np_pip_even_odd(px, py, xs, ys)
    # exclude near-boundary points (kernels differ on the boundary rule)
    x2, y2 = np.roll(xs, -1), np.roll(ys, -1)
    ex, ey = x2 - xs, y2 - ys
    elen = np.hypot(ex, ey)
    dist = np.abs(
        ex[:, None] * (py[None, :] - ys[:, None])
        - ey[:, None] * (px[None, :] - xs[:, None])
    ) / np.maximum(elen[:, None], 1e-12)
    clear = dist.min(axis=0) > 1e-6 * r
    assert (cvx[clear] == eo[clear]).all()


@settings(max_examples=100, deadline=None)
@given(words=st.lists(st.text(
    alphabet=st.characters(min_codepoint=33, max_codepoint=126),
    min_size=1, max_size=10), min_size=0, max_size=20))
def test_token_hashes_match_per_token_reference(words):
    text = " ".join(words)
    arr = np.frombuffer(text.encode(), dtype=np.uint8)
    got = _token_hashes(arr).tolist()

    def ref(tok: bytes) -> int:
        h = 0
        for b in tok:
            h = (h * int(_POLY_BASE) + b) & 0xFFFFFFFFFFFFFFFF
        return int(_mix64(np.array([h], dtype=np.uint64))[0])

    assert got == [ref(w.encode()) for w in text.split()]
    # the finalizer spreads short tokens over all 64 bits
    if any(len(w) <= 2 for w in words):
        short = [ref(w.encode()) for w in words if len(w) <= 2]
        assert any(h >> 48 for h in short) or len(short) < 3


@settings(max_examples=150, deadline=None)
@given(
    res=st.integers(min_value=2, max_value=12),
    k=st.integers(min_value=1, max_value=4),
    seed=st.integers(min_value=0, max_value=10_000),
    n_cells=st.integers(min_value=1, max_value=6),
)
def test_cell_disk_ranges_enumerates_exact_disk(res, k, seed, n_cells):
    """Property: the ranges enumerate EXACTLY the wrapped/clamped disk
    membership — same set as a direct per-cell computation."""
    rng = np.random.RandomState(seed)
    n = 1 << res
    xs = rng.randint(0, n, size=n_cells)
    ys = rng.randint(0, n, size=n_cells)
    cells = [(res << 58) + (int(x) << 29) + int(y) for x, y in zip(xs, ys)]

    expected = set()
    for x, y in zip(xs, ys):
        for dx in range(-k, k + 1):
            for dy in range(-k, k + 1):
                yy = y + dy
                if 0 <= yy < n:
                    expected.add(
                        (res << 58) + ((int(x) + dx) % n << 29) + int(yy)
                    )

    ranges = grid.cell_disk_ranges(cells, k, res, max_ranges=10**9)
    got = set()
    for lo, hi in ranges:
        got.update(range(lo, hi + 1))
    assert got == expected
    # ranges are normalized: sorted, non-overlapping, non-adjacent
    for (l1, h1), (l2, h2) in zip(ranges, ranges[1:]):
        assert h1 + 1 < l2
