"""Property-based tests (hypothesis) over the pure numpy kernels.

The golden-number tests pin the reference's exact values; these pin the
ALGEBRAIC invariants on randomized inputs — the class of bug (int32
wraparound, y-flip, off-by-one at tile edges) that golden numbers can
miss between their sample points.
"""

import numpy as np
from hypothesis import given, settings, strategies as st

from geodesk_spark.geo import mercator, pip, rings as R, tile as T

I32 = st.integers(min_value=-(1 << 31), max_value=(1 << 31) - 1)
ZOOM = st.integers(min_value=0, max_value=12)
LON = st.floats(min_value=-180.0, max_value=180.0, allow_nan=False)
LAT = st.floats(min_value=-85.05, max_value=85.05, allow_nan=False)


@settings(max_examples=300, deadline=None)
@given(x=I32, y=I32, zoom=ZOOM)
def test_tile_contains_its_point(x, y, zoom):
    """The tile computed for (x, y) must span (x, y): leftX ≤ x ≤ rightX,
    bottomY ≤ y ≤ topY (Tile.java:127-172 edge algebra)."""
    col = int(T.column_from_x(x, zoom)[()])
    row = int(T.row_from_y(y, zoom)[()])
    t = T.from_col_row_zoom(col, row, zoom)
    assert T.left_x(t) <= x <= T.right_x(t)
    assert T.bottom_y(t) <= y <= T.top_y(t)


@settings(max_examples=300, deadline=None)
@given(x=I32, y=I32, zoom=st.integers(min_value=2, max_value=12))
def test_zoomed_out_is_parent(x, y, zoom):
    """zoomedOut(tile, z-2) equals the tile computed directly at z-2 —
    the pyramid is consistent across levels (Tile.java:184-190)."""
    t = T.from_col_row_zoom(int(T.column_from_x(x, zoom)[()]), int(T.row_from_y(y, zoom)[()]), zoom)
    parent = T.zoomed_out(t, zoom - 2)
    direct = T.from_col_row_zoom(
        int(T.column_from_x(x, zoom - 2)[()]), int(T.row_from_y(y, zoom - 2)[()]), zoom - 2
    )
    assert parent == direct


@settings(max_examples=300, deadline=None)
@given(lon=LON, lat=LAT)
def test_projection_round_trip(lon, lat):
    """lonFromX(xFromLon(lon)) within one imp's angular size (the
    reference's own round-trip tolerance, MercatorTest.java:245-291)."""
    x = mercator.x_from_lon(lon)
    y = mercator.y_from_lat(lat)
    assert abs(float(mercator.lon_from_x(x)[()]) - lon) < 1e-7 * 360
    # y round-trips through the same clamped latitude
    lat2 = float(mercator.lat_from_y(y)[()])
    y2 = mercator.y_from_lat(lat2)
    assert abs(float(y2[()]) - float(y[()])) <= 1


@settings(max_examples=200, deadline=None)
@given(
    cx=st.floats(min_value=-1e9, max_value=1e9),
    cy=st.floats(min_value=-1e9, max_value=1e9),
    data=st.data(),
)
def test_pip_convex_matches_halfplanes(cx, cy, data):
    """Ray-cast PIP on a random convex polygon == half-plane conjunction
    (independent oracle) for points strictly off the boundary."""
    n = data.draw(st.integers(min_value=3, max_value=12))
    radii = data.draw(
        st.lists(st.floats(min_value=1e3, max_value=1e6), min_size=n, max_size=n)
    )
    r = max(radii)
    ang = np.sort(np.random.default_rng(7).uniform(0, 2 * np.pi, n))
    xs = 0.0 + r * np.cos(ang)
    ys = 0.0 + r * np.sin(ang)  # circle points => convex
    ring = np.stack([xs, ys], axis=1)
    ring = np.vstack([ring, ring[:1]])

    px = np.array([cx], dtype=np.float64)
    py = np.array([cy], dtype=np.float64)
    got = pip.points_in_polygon(px, py, [ring])[0]
    inside = True
    on_edge = False
    for i in range(len(ring) - 1):
        x1, y1 = ring[i]
        x2, y2 = ring[i + 1]
        crossz = (x2 - x1) * (cy - y1) - (y2 - y1) * (cx - x1)
        if abs(crossz) < 1e-3 * r:
            on_edge = True  # boundary: both algorithms may disagree
        if crossz < 0:
            inside = False
    if not on_edge:
        assert bool(got) == inside


@settings(max_examples=100, deadline=None)
@given(data=st.data())
def test_ring_assembly_roundtrip_random(data):
    """Random star polygons chopped into shuffled/reversed runs always
    reassemble to a PIP-identical ring set."""
    rng_seed = data.draw(st.integers(min_value=0, max_value=10_000))
    rng = np.random.default_rng(rng_seed)
    n = int(rng.integers(6, 40))
    ang = np.sort(rng.uniform(0, 2 * np.pi, n))
    rad = rng.uniform(1e4, 1e6, n)
    ring = np.stack([rad * np.cos(ang), rad * np.sin(ang)], axis=1).round()
    ring = np.vstack([ring, ring[:1]])
    k = int(rng.integers(1, min(6, n - 1)))
    cuts = sorted(rng.choice(np.arange(1, n), size=k - 1, replace=False)) if k > 1 else []
    bounds = [0, *cuts, n]
    runs = [ring[bounds[i] : bounds[i + 1] + 1].copy() for i in range(k)]
    rng.shuffle(runs)
    runs = [r[::-1].copy() if rng.random() < 0.5 else r for r in runs]

    rebuilt = R.assemble_rings(runs)
    assert len(rebuilt) == 1
    px = rng.uniform(-1.2e6, 1.2e6, 500)
    py = rng.uniform(-1.2e6, 1.2e6, 500)
    want = pip.points_in_polygon(px, py, [ring])
    got = pip.points_in_polygon(px, py, rebuilt)
    assert np.array_equal(got, want)


@settings(max_examples=300, deadline=None)
@given(y=I32)
def test_scale_symmetry_and_bounds(y):
    """Mercator scale: even in y, ≥1 everywhere, and metersAtY ≤ equator
    meters-per-imp (Mercator.java:128-179)."""
    s = float(mercator.scale(y)[()])
    s_neg = float(mercator.scale(-y)[()])
    assert s >= 1.0
    assert abs(s - s_neg) <= 1e-9 * max(s, s_neg)
    m = float(mercator.meters_at_y(y)[()])
    m0 = float(mercator.meters_at_y(0)[()])
    assert m <= m0 + 1e-9


@settings(max_examples=200, deadline=None)
@given(
    x=I32, y=I32,
    zoom=st.integers(min_value=1, max_value=16),
)
def test_hilbert_vs_morton_same_cell_grid(x, y, zoom):
    """Hilbert and Morton ids at a zoom address the SAME cell grid: two
    points share a Hilbert id iff they share a Morton id (both are
    bijections of (col, row))."""
    from geodesk_spark.geo import curve

    x2 = x ^ 0x5A5A5A5A  # a second, usually-different point
    h1, h2 = curve.hilbert_cell(np.array([x, x2]), np.array([y, y]), zoom)
    same_cell = int(T.column_from_x(x, zoom)[()]) == int(T.column_from_x(x2, zoom)[()])
    assert (h1 == h2) == same_cell


@settings(max_examples=50, deadline=None)
@given(data=st.data())
def test_phash_banding_exact_for_hamming_3(data):
    """Pigeonhole exactness as a PROPERTY: for any base hash and any ≤3
    flipped bits, at least one of the four 16-bit bands is unchanged —
    the pair can never be missed by the banding."""
    base = data.draw(st.integers(min_value=-(1 << 63), max_value=(1 << 63) - 1))
    k = data.draw(st.integers(min_value=0, max_value=3))
    bits = data.draw(
        st.lists(st.integers(min_value=0, max_value=63), min_size=k, max_size=k, unique=True)
    )
    other = base
    for b in bits:
        other ^= 1 << b
    shared = any(
        ((base >> (16 * t)) & 0xFFFF) == ((other >> (16 * t)) & 0xFFFF) for t in range(4)
    )
    assert shared


@settings(max_examples=30, deadline=None)
@given(data=st.data())
def test_pack_sequences_bound_property(data):
    """Straddle-packing bound as a property over random length sets:
    every bin total ≤ budget + max_len − 1, totals preserved, bins
    contiguous (driver-side replica of the operator's arithmetic)."""
    lens = data.draw(
        st.lists(st.integers(min_value=1, max_value=5000), min_size=1, max_size=300)
    )
    budget = data.draw(st.integers(min_value=100, max_value=8192))
    order = sorted(range(len(lens)), key=lambda i: (-lens[i], i))
    csum, bins = 0, {}
    for i in order:
        start = csum
        csum += lens[i]
        bins.setdefault(start // budget, []).append(lens[i])
    max_len = max(lens)
    keys = sorted(bins)
    # bin ids are labels: dense when every doc fits the budget, and may
    # skip values after an oversized doc (it consumes several blocks)
    if max_len <= budget:
        assert keys == list(range(len(keys)))
    assert sum(sum(v) for v in bins.values()) == sum(lens)
    assert all(sum(v) <= budget + max_len - 1 for v in bins.values())
