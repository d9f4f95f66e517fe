"""Geometry predicate kernels: hand-built truth table + consistency laws."""

import numpy as np
import pytest

from geodesk_spark.geo import geom

SQ = [np.array([[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]], dtype=np.float64)]  # 10×10 square
SQ_HOLE = SQ + [np.array([[4, 4], [6, 4], [6, 6], [4, 6], [4, 4]], dtype=np.float64)]


def ring(pts):
    a = np.array(pts, dtype=np.float64)
    return np.vstack([a, a[:1]])


CASES = [
    # (name, A (line array | polygon list), B, expected true predicates)
    ("line inside", np.array([[2, 2], [8, 8]], float), SQ, {"intersects", "within", "covered_by"}),
    ("line crossing", np.array([[-5, 5], [15, 5]], float), SQ, {"intersects", "crosses"}),
    ("line outside", np.array([[20, 20], [30, 30]], float), SQ, {"disjoint"}),
    ("line exits", np.array([[5, 5], [15, 5]], float), SQ, {"intersects", "crosses"}),
    ("line touches corner", np.array([[10, 10], [20, 20]], float), SQ, {"intersects", "touches"}),
    ("line along edge", np.array([[0, 0], [10, 0]], float), SQ, {"intersects", "touches", "covered_by"}),
    ("poly inside", [ring([(2, 2), (8, 2), (8, 8), (2, 8)])], SQ, {"intersects", "within", "covered_by"}),
    ("poly equal-ish big", [ring([(-5, -5), (15, -5), (15, 15), (-5, 15)])], SQ, {"intersects", "contains"}),
    ("poly overlap", [ring([(5, 5), (15, 5), (15, 15), (5, 15)])], SQ, {"intersects", "overlaps"}),
    ("poly outside", [ring([(20, 20), (30, 20), (30, 30), (20, 30)])], SQ, {"disjoint"}),
    ("poly touch edge", [ring([(10, 2), (20, 2), (20, 8), (10, 8)])], SQ, {"intersects", "touches"}),
    ("line in hole", np.array([[4.5, 4.5], [5.5, 5.5]], float), SQ_HOLE, {"disjoint"}),
    ("line spans hole", np.array([[2, 5], [8, 5]], float), SQ_HOLE, {"intersects", "crosses"}),
    ("poly in hole", [ring([(4.5, 4.5), (5.5, 4.5), (5.5, 5.5), (4.5, 5.5)])], SQ_HOLE, {"disjoint"}),
]


@pytest.mark.parametrize("name,a,b,expected", CASES, ids=[c[0] for c in CASES])
def test_truth_table(name, a, b, expected):
    r = geom.relate(a, b)
    got = {k for k, v in r.items() if v}
    # disjoint is the complement of intersects — check consistency first
    assert r["disjoint"] != r["intersects"]
    missing = expected - got
    assert not missing, f"{name}: missing {missing}, got {got}"
    # mutually exclusive outcomes
    if r["within"]:
        assert not r["crosses"] and not r["overlaps"] and r["covered_by"]
    if r["touches"]:
        assert not r["within"] and not r["crosses"] and not r["overlaps"]


def test_consistency_random():
    rng = np.random.default_rng(11)
    B = SQ_HOLE
    for _ in range(300):
        pts = rng.integers(-15, 25, size=(4, 2)).astype(np.float64)
        line = pts[:3]
        r = geom.relate(line, B)
        assert r["disjoint"] != r["intersects"]
        if r["within"]:
            assert r["intersects"] and r["covered_by"]
        if r["crosses"]:
            assert r["intersects"] and not r["within"]
        if r["touches"]:
            assert r["intersects"] and not r["within"] and not r["crosses"]


def test_orient_exact_fallback():
    # nearly-collinear big-coordinate case where float64 cross is ambiguous
    ox, oy = -2_000_000_000, -2_000_000_000
    ax, ay = 2_000_000_000, 2_000_000_001
    bx, by = 2_000_000_001, 2_000_000_002  # slightly above the o-a line?
    s = geom.orient_sign([ox], [oy], [ax], [ay], [bx], [by])[0]
    # exact integer cross product:
    exact = (ax - ox) * (by - oy) - (ay - oy) * (bx - ox)
    assert s == (0 if exact == 0 else (1 if exact > 0 else -1))


def test_segments_cross():
    a = np.array([[0, 0, 10, 10]], dtype=np.float64)
    assert geom.segments_cross(a, np.array([[0, 10, 10, 0]], float))  # X cross
    assert geom.segments_cross(a, np.array([[10, 10, 20, 10]], float))  # endpoint touch
    assert not geom.segments_cross(a, np.array([[0, 5, 4, 9]], float))  # parallel offset
    assert geom.segments_cross(a, np.array([[5, 5, 7, 7]], float))  # collinear overlap


def test_orient_exact_half_integer_midpoints():
    """relate() feeds segment MIDPOINTS (half-integers) to the exact
    fallback; bare int() truncation evaluated a different point
    (regression, r03 review): (1.5, 1.5) lies ON the line (0,1)-(3,2)."""
    s = geom.orient_sign([0.0], [1.0], [3.0], [2.0], [1.5], [1.5])[0]
    assert s == 0


def test_relate_identical_polygons():
    """A == B: within/contains/covered_by True, touches False (JTS
    DE-9IM) — sampling alone cannot see it (every probe lands on the
    boundary), so equality is detected via the canonical segment set."""
    ring = np.array(
        [[0, 0], [100, 0], [100, 100], [0, 100], [0, 0]], dtype=np.float64
    )
    r = geom.relate([ring], [ring])
    assert r["within"] and r["contains"] and r["covered_by"] and r["intersects"]
    assert not r["touches"] and not r["disjoint"] and not r["overlaps"]
    # same region, reversed winding + rotated start: still equal
    ring2 = np.array(
        [[100, 0], [0, 0], [0, 100], [100, 100], [100, 0]], dtype=np.float64
    )
    r2 = geom.relate([ring2], [ring])
    assert r2["within"] and r2["contains"] and not r2["touches"]


def test_convex_hull_by_group(spark):
    from geodesk_spark.operators.geometry_ops import convex_hull_by_group

    rng = np.random.default_rng(5)
    rows = []
    # group 0: random cloud; group 1: square + interior + edge-collinear midpoint;
    # group 2: single point; group 3: two points; group 4: collinear line w/ dups
    for _ in range(40):
        rows.append((0, int(rng.integers(-1000, 1000)), int(rng.integers(-1000, 1000))))
    rows += [(1, 0, 0), (1, 10, 0), (1, 10, 10), (1, 0, 10), (1, 5, 5), (1, 5, 0)]
    rows += [(2, 7, 9)]
    rows += [(3, -5, 2), (3, 4, -3)]
    rows += [(4, 0, 0), (4, 2, 2), (4, 4, 4), (4, 2, 2)]
    df = spark.createDataFrame(rows, "gid int, x long, y long")
    out = convex_hull_by_group(df).collect()
    by_g = {}
    for r in out:
        by_g.setdefault(r["gid"], []).append((r["seq"], r["x"], r["y"]))
    for g in by_g:
        by_g[g] = [(x, y) for _, x, y in sorted(by_g[g])]

    # group 1: exactly the 4 corners, CCW from lexicographic min (0,0)
    assert by_g[1] == [(0, 0), (10, 0), (10, 10), (0, 10)]
    assert by_g[2] == [(7, 9)]
    assert set(by_g[3]) == {(-5, 2), (4, -3)}
    assert by_g[4] == [(0, 0), (4, 4)]

    # group 0: CCW (positive shoelace), convex (all strict left turns),
    # and every input point inside-or-on the hull
    h = by_g[0]
    n = len(h)
    assert n >= 3
    area2 = sum(h[i][0] * h[(i + 1) % n][1] - h[(i + 1) % n][0] * h[i][1] for i in range(n))
    assert area2 > 0
    for i in range(n):
        o, a, b = h[i], h[(i + 1) % n], h[(i + 2) % n]
        assert (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0]) > 0
    pts0 = [(x, y) for g_, x, y in rows if g_ == 0]
    for p in pts0:
        for i in range(n):
            a, b = h[i], h[(i + 1) % n]
            assert (b[0] - a[0]) * (p[1] - a[1]) - (b[1] - a[1]) * (p[0] - a[0]) >= 0


def test_buffer_convex_closed_forms(spark):
    """Minkowski buffer vs closed forms: square ⊕ diamond (k=4) is the
    octagon with area a² + 4ar + 2r²; point ⊕ k-gon is the k-gon; and
    the k=8 buffer strictly contains the original square."""
    from geodesk_spark.operators.geometry_ops import (
        buffer_convex_by_group,
        kgon_offsets,
        ring_area2_by_group,
    )

    a, r = 1000, 100
    sq = [(1, 0, 0), (1, a, 0), (1, a, a), (1, 0, a)]
    pt = [(2, 50, -70)]
    df = spark.createDataFrame(sq + pt, "gid int, x long, y long")

    buf4 = buffer_convex_by_group(df, r, k=4, group_col="gid")
    got = {r_["gid"]: (r_["nv"], r_["area2"])
           for r_ in ring_area2_by_group(buf4, "gid").collect()}
    # k=4 offsets are exactly (±r,0),(0,±r): octagon, 8 verts
    assert got[1] == (8, float(2 * a * a + 8 * a * r + 4 * r * r))
    # single point buffered by the diamond: the diamond itself, 2r² area
    assert got[2] == (4, float(4 * r * r))

    buf8 = buffer_convex_by_group(df.filter("gid = 1"), r, k=8, group_col="gid")
    ring = sorted((r_["seq"], r_["x"], r_["y"]) for r_ in buf8.collect())
    verts = [(x, y) for _, x, y in ring]
    n = len(verts)
    # contains every square corner strictly (each corner pushed out)
    for p in [(0, 0), (a, 0), (a, a), (0, a)]:
        for i in range(n):
            aa, bb = verts[i], verts[(i + 1) % n]
            assert (bb[0] - aa[0]) * (p[1] - aa[1]) - (bb[1] - aa[1]) * (p[0] - aa[0]) > 0
    # area agrees with the direct python Minkowski-hull construction
    import itertools

    sums = sorted({(x + ox, y + oy) for (_, x, y), (ox, oy)
                   in itertools.product(sq, kgon_offsets(r, 8))})

    def cross(o, p, q):
        return (p[0] - o[0]) * (q[1] - o[1]) - (p[1] - o[1]) * (q[0] - o[0])

    lo, hi = [], []
    for q in sums:
        while len(lo) >= 2 and cross(lo[-2], lo[-1], q) <= 0:
            lo.pop()
        lo.append(q)
    for q in reversed(sums):
        while len(hi) >= 2 and cross(hi[-2], hi[-1], q) <= 0:
            hi.pop()
        hi.append(q)
    exp = lo[:-1] + hi[:-1]
    m = len(exp)
    exp_area2 = abs(sum(exp[i][0] * exp[(i + 1) % m][1]
                        - exp[(i + 1) % m][0] * exp[i][1] for i in range(m)))
    [ar] = ring_area2_by_group(buf8, "gid").collect()
    assert (ar["nv"], ar["area2"]) == (m, float(exp_area2))


def test_chaikin_smooth_replay(spark):
    """Chaikin laws on a planted right-angle polyline: exact quarter
    replay (incl. negative coords through the offset floor), endpoint
    preservation, row doubling, and corner rounding (turn angles
    shrink)."""
    from geodesk_spark.operators import geometry_ops

    pts = [(-1000, -1000), (0, 1000), (1000, -1000), (2001, 999)]
    verts = spark.createDataFrame(
        [(7, i, x, y) for i, (x, y) in enumerate(pts)],
        "line_id long, seq long, x long, y long",
    )

    def replay(ps):
        out = [ps[0]]
        q = lambda a, b: ((3 * a + b + (1 << 33)) // 4) - (1 << 31)
        for (x1, y1), (x2, y2) in zip(ps, ps[1:]):
            out.append((q(x1, x2), q(y1, y2)))
            out.append((q(x2, x1), q(y2, y1)))
        out.append(ps[-1])
        return out

    exp1 = replay(pts)
    got1 = [(r.x, r.y) for r in
            geometry_ops.chaikin_smooth(verts, rounds=1).orderBy("seq").collect()]
    assert got1 == exp1
    got2 = [(r.x, r.y) for r in
            geometry_ops.chaikin_smooth(verts, rounds=2).orderBy("seq").collect()]
    assert got2 == replay(exp1)
    # endpoints survive; interior count = 2·edges per round
    assert got2[0] == pts[0] and got2[-1] == pts[-1]
    assert len(got1) == 2 + 2 * (len(pts) - 1)

    import math
    def max_turn(ps):
        worst = 0.0
        for a, b, c in zip(ps, ps[1:], ps[2:]):
            v1 = (b[0] - a[0], b[1] - a[1])
            v2 = (c[0] - b[0], c[1] - b[1])
            dot = v1[0] * v2[0] + v1[1] * v2[1]
            n = math.hypot(*v1) * math.hypot(*v2)
            worst = max(worst, math.acos(max(-1.0, min(1.0, dot / n))))
        return worst

    assert max_turn(got1) < max_turn(pts)
    assert max_turn(got2) < max_turn(got1)


def test_sample_points_in_polygons(spark):
    """Interior sampling laws: k samples per non-degenerate polygon,
    every sample within 1 imp of the closed polygon, deterministic
    across partitionings, degenerate polygons yield nothing, and the
    triangle pick is area-weighted (a polygon double the area of a
    planted slim one collects the matching share of a shared-id check
    is overkill — instead verify per-triangle placement replays)."""
    from geodesk_spark.operators.geometry_ops import (
        kgon_offsets,
        sample_points_in_polygons,
    )

    offs = kgon_offsets(4000, 8)
    rows = []
    for p in range(6):
        cx, cy = p * 9000 - 20000, (p * 7) % 5 * 6000 - 10000
        for j, (ox, oy) in enumerate(offs):
            rows.append((p, j, cx + ox, cy + oy))
    # degenerate: 2-vertex polygon and a zero-area triangle
    rows += [(100, 0, 0, 0), (100, 1, 10, 10)]
    rows += [(101, 0, 0, 0), (101, 1, 500, 500), (101, 2, 1000, 1000)]
    df = spark.createDataFrame(rows, "poly_id long, seq long, x long, y long")
    out = sample_points_in_polygons(df, k=5).collect()
    by_poly = {}
    for r in out:
        by_poly.setdefault(r.poly_id, []).append(r)
    assert set(by_poly) == set(range(6))
    for p, rs in by_poly.items():
        assert sorted(r.sample_id for r in rs) == [1, 2, 3, 4, 5]
        cx, cy = p * 9000 - 20000, (p * 7) % 5 * 6000 - 10000
        ring = [(cx + ox, cy + oy) for ox, oy in offs]
        for r in rs:
            for i in range(8):
                ax, ay = ring[i]
                bx, by = ring[(i + 1) % 8]
                cross = (bx - ax) * (r.py - ay) - (by - ay) * (r.px - ax)
                # CCW ring: interior is left of every edge; allow the
                # 1-imp floor slack scaled by the edge length bound
                assert cross >= -2 * 4000, (p, r.sample_id, cross)
    # partitioning determinism (integer pipeline)
    out8 = sample_points_in_polygons(df.repartition(8), k=5).collect()
    assert sorted((r.poly_id, r.sample_id, r.px, r.py) for r in out8) == sorted(
        (r.poly_id, r.sample_id, r.px, r.py) for r in out
    )
