"""Golden parity with the reference's PointInPolygonTest
(/root/reference/src/test/java/com/geodesk/geom/PointInPolygonTest.java:12-81)
plus kernel-level checks for holes and segment distance."""

import numpy as np

from geodesk_spark.geo import pip

# Polygon P — PointInPolygonTest.java:13-21
P = np.array(
    [
        [-400, 200],
        [-200, 500],
        [100, 500],
        [400, 200],
        [-200, -300],
        [-400, -100],
        [-400, 200],
    ],
    dtype=np.float64,
)

# (x, y, expected) — PointInPolygonTest.java:40-59
POINTS = [
    (-200, 200, 1),
    (200, -200, 0),
    (200, 500, 0),
    (-300, 0, 1),
    (100, 0, 1),
    (300, 0, 0),
    (300, 200, 1),
    (350, 300, 0),
    (-400, -200, 0),
    (0, 400, 1),
    (0, 499, 1),
    (0, 501, 0),
    (0, 600, 0),
    (0, -100, 1),
    (0, -300, 0),
    (100, 300, 1),
    (-400, 100, 1),
]


def test_golden_truth_table():
    xs = np.array([p[0] for p in POINTS], dtype=np.float64)
    ys = np.array([p[1] for p in POINTS], dtype=np.float64)
    exp = np.array([bool(p[2]) for p in POINTS])
    got = pip.points_in_ring(xs, ys, P)
    assert (got == exp).all(), list(zip(POINTS, got))


def test_hole_xor():
    # Square with a square hole: XOR rule (PointInPolygon.java:21-23).
    outer = np.array([[-10, -10], [10, -10], [10, 10], [-10, 10], [-10, -10]], dtype=np.float64)
    hole = np.array([[-3, -3], [3, -3], [3, 3], [-3, 3], [-3, -3]], dtype=np.float64)
    xs = np.array([0.0, 5.0, 20.0])
    ys = np.array([0.0, 5.0, 0.0])
    got = pip.points_in_polygon(xs, ys, [outer, hole])
    assert list(got) == [False, True, False]


def test_segment_distance():
    ring = np.array([[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]], dtype=np.float64)
    d2 = pip.segment_distance_sq(np.array([5.0, 15.0, 5.0]), np.array([5.0, 0.0, -3.0]), ring)
    assert d2[0] == 25.0  # center → nearest edge 5 away
    assert d2[1] == 25.0  # 5 right of the corner (10,0)
    assert d2[2] == 9.0  # 3 below bottom edge


def test_pack_unpack_roundtrip():
    rings = [P, P * 0.5]
    blob = pip.pack_rings(rings)
    back = pip.unpack_rings(blob)
    assert len(back) == 2
    assert np.array_equal(back[0], P)
    assert np.array_equal(back[1], P * 0.5)
