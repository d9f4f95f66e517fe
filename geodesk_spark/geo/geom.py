"""Geometry predicate kernels (pure numpy, exact on integer inputs).

The reference delegates DE-9IM to JTS (filter/*.java all wrap
PreparedGeometry).  Shapely/JTS are unavailable here, so the engine
ships its own kernels.  Coordinates are imp int32, so orientation tests
can be made EXACT: the float64 cross product carries a bounded rounding
error; ambiguous signs (|cross| under the error bound) are recomputed
with Python big-ints on the few affected pairs — a classic floating-
point-filter robust predicate.

Geometries are vertex arrays:
- polyline: (n,2) open chain
- polygon: list of closed rings (shell + holes), as in geo/pip.py

Predicate definitions follow DE-9IM on these primitives:
- intersects: any boundary crossing, any vertex-in, or containment
- within / contains / coveredBy: vertex containment + no boundary cross
- crosses (line × polygon): interior points on both sides
- touches: intersects but interiors disjoint (boundary contact only)
- overlaps (polygon × polygon): interiors intersect, neither contains
"""

from __future__ import annotations

import numpy as np

from geodesk_spark.geo import pip

# |cross| values below this bound may have the wrong float64 sign for
# int32 inputs: products ≤ 2^66, float64 mantissa 53 bits → error ≤ 2^13·…
# Use a generous bound; exact fallback handles the rest.
_EPS_BOUND = 2.0**16


def _orient_exact(ox, oy, ax, ay, bx, by) -> np.ndarray:
    out = np.empty(len(ox), dtype=np.int8)
    for i in range(len(ox)):
        # inputs may be segment MIDPOINTS (half-integers from relate()'s
        # sampling): scale by 2 — sign-invariant — so the int conversion
        # is exact; bare int() TRUNCATED x.5 to a different point and the
        # "exact" fallback then evaluated the wrong orientation
        # (r03 review)
        o_x, o_y = int(2 * ox[i]), int(2 * oy[i])
        a_x, a_y = int(2 * ax[i]), int(2 * ay[i])
        b_x, b_y = int(2 * bx[i]), int(2 * by[i])
        v = (a_x - o_x) * (b_y - o_y) - (a_y - o_y) * (b_x - o_x)
        out[i] = 0 if v == 0 else (1 if v > 0 else -1)
    return out


def orient_sign(ox, oy, ax, ay, bx, by) -> np.ndarray:
    """Sign of cross((a-o),(b-o)) — exact via float filter + bigint fallback."""
    ox = np.asarray(ox, dtype=np.float64)
    oy = np.asarray(oy, dtype=np.float64)
    ax = np.asarray(ax, dtype=np.float64)
    ay = np.asarray(ay, dtype=np.float64)
    bx = np.asarray(bx, dtype=np.float64)
    by = np.asarray(by, dtype=np.float64)
    cross = (ax - ox) * (by - oy) - (ay - oy) * (bx - ox)
    sign = np.sign(cross).astype(np.int8)
    ambiguous = np.abs(cross) < _EPS_BOUND
    if ambiguous.any():
        idx = np.nonzero(ambiguous)[0]
        sign[idx] = _orient_exact(ox[idx], oy[idx], ax[idx], ay[idx], bx[idx], by[idx])
    return sign


def _pairs(a_segs: np.ndarray, b_segs: np.ndarray):
    """Cross all segments of A with all of B → flat pair arrays."""
    n, m = len(a_segs), len(b_segs)
    ai = np.repeat(np.arange(n), m)
    bi = np.tile(np.arange(m), n)
    return a_segs[ai], b_segs[bi]


def segments_cross(a_segs: np.ndarray, b_segs: np.ndarray) -> bool:
    """True if ANY segment of A intersects any of B (touching counts).

    a_segs/b_segs: (k,4) arrays [x1,y1,x2,y2].  Bbox-prefilters pairs,
    then exact orientation tests (incl. collinear-overlap handling).
    """
    if len(a_segs) == 0 or len(b_segs) == 0:
        return False
    A, B = _pairs(a_segs, b_segs)
    # bbox prefilter
    aminx = np.minimum(A[:, 0], A[:, 2]); amaxx = np.maximum(A[:, 0], A[:, 2])
    aminy = np.minimum(A[:, 1], A[:, 3]); amaxy = np.maximum(A[:, 1], A[:, 3])
    bminx = np.minimum(B[:, 0], B[:, 2]); bmaxx = np.maximum(B[:, 0], B[:, 2])
    bminy = np.minimum(B[:, 1], B[:, 3]); bmaxy = np.maximum(B[:, 1], B[:, 3])
    cand = (aminx <= bmaxx) & (amaxx >= bminx) & (aminy <= bmaxy) & (amaxy >= bminy)
    if not cand.any():
        return False
    A, B = A[cand], B[cand]

    d1 = orient_sign(B[:, 0], B[:, 1], B[:, 2], B[:, 3], A[:, 0], A[:, 1])
    d2 = orient_sign(B[:, 0], B[:, 1], B[:, 2], B[:, 3], A[:, 2], A[:, 3])
    d3 = orient_sign(A[:, 0], A[:, 1], A[:, 2], A[:, 3], B[:, 0], B[:, 1])
    d4 = orient_sign(A[:, 0], A[:, 1], A[:, 2], A[:, 3], B[:, 2], B[:, 3])
    proper = (d1 * d2 < 0) & (d3 * d4 < 0)
    if proper.any():
        return True
    # collinear / endpoint contact: any zero orientation with bbox overlap
    # (bbox already overlaps for these candidate pairs)
    touch = ((d1 == 0) | (d2 == 0) | (d3 == 0) | (d4 == 0)) & (
        (d1 * d2 <= 0) & (d3 * d4 <= 0)
    )
    return bool(touch.any())


def ring_segments(ring: np.ndarray) -> np.ndarray:
    return np.concatenate([ring[:-1], ring[1:]], axis=1)


def line_segments(line: np.ndarray) -> np.ndarray:
    return np.concatenate([line[:-1], line[1:]], axis=1)


def polygon_segments(rings: list[np.ndarray]) -> np.ndarray:
    return np.concatenate([ring_segments(r) for r in rings], axis=0)


def points_on_boundary(xs, ys, segs: np.ndarray) -> np.ndarray:
    """Exact point-on-segment test for each point vs any segment."""
    xs = np.asarray(xs, dtype=np.float64)
    ys = np.asarray(ys, dtype=np.float64)
    out = np.zeros(len(xs), dtype=bool)
    for x1, y1, x2, y2 in segs:
        collin = orient_sign(
            np.full(len(xs), x1), np.full(len(xs), y1),
            np.full(len(xs), x2), np.full(len(xs), y2), xs, ys,
        ) == 0
        inbox = (
            (xs >= min(x1, x2)) & (xs <= max(x1, x2))
            & (ys >= min(y1, y2)) & (ys <= max(y1, y2))
        )
        out |= collin & inbox
    return out


# ---------------------------------------------------------------------------
# Predicates: geometry A (line or polygon) vs polygon B.
# ---------------------------------------------------------------------------

def _verts(a) -> np.ndarray:
    if isinstance(a, list):  # polygon: stack ring vertices (w/o closing dup)
        return np.concatenate([r[:-1] for r in a], axis=0)
    return np.asarray(a, dtype=np.float64)


def _segs(a) -> np.ndarray:
    return polygon_segments(a) if isinstance(a, list) else line_segments(np.asarray(a, dtype=np.float64))


def _seg_key_set(segs: np.ndarray) -> set:
    """Undirected canonical segment set — the boundary's identity
    (order- and direction-independent)."""
    keys = set()
    for x1, y1, x2, y2 in segs.tolist():
        p, q = (x1, y1), (x2, y2)
        keys.add((p, q) if p <= q else (q, p))
    return keys


def _classify_points(xs, ys, rings: list[np.ndarray], segs: np.ndarray):
    """→ (strictly_inside, on_boundary, strictly_outside) bool arrays."""
    inside = pip.points_in_polygon(xs, ys, rings)
    on = points_on_boundary(xs, ys, segs)
    return inside & ~on, on, ~inside & ~on


def relate(a, b_rings: list[np.ndarray]) -> dict[str, bool]:
    """Predicate family for A (polyline (n,2) | polygon ring-list) vs
    polygon B: intersects, within, contains, covered_by, disjoint,
    crosses, touches, overlaps.

    Method: classify A's vertices AND segment midpoints against B
    (strict-in / on-boundary / strict-out), detect proper boundary
    crossings, and symmetrically classify B's vertices against A when A
    is a polygon.  Exact for the non-degenerate inputs the reference's
    own PIP documents (boundary-grazing points may classify either way,
    PointInPolygon.java:17-19); deeply collinear adversarial cases may
    diverge from JTS DE-9IM — documented engine caveat."""
    av = _verts(a)
    asegs = _segs(a)
    bsegs = polygon_segments(b_rings)
    bverts = _verts(b_rings)
    a_is_poly = isinstance(a, list)

    # Equal polygons first: sampling cannot see it (every probe lands ON
    # the boundary, which reads as touches) — but identical boundaries
    # imply identical even-odd regions, so A == B ⇒ within = contains =
    # covered_by = True, touches = False (JTS/DE-9IM; r03 review).  The
    # undirected canonical segment SET is the boundary identity.
    if a_is_poly and _seg_key_set(asegs) == _seg_key_set(bsegs):
        return {
            "intersects": True,
            "within": True,
            "contains": True,
            "covered_by": True,
            "disjoint": False,
            "crosses": False,
            "touches": False,
            "overlaps": False,
        }

    # A sample points: vertices + segment midpoints (catches bulges).
    sx = np.concatenate([av[:, 0], (asegs[:, 0] + asegs[:, 2]) / 2])
    sy = np.concatenate([av[:, 1], (asegs[:, 1] + asegs[:, 3]) / 2])
    a_strict_in, a_on, a_strict_out = _classify_points(sx, sy, b_rings, bsegs)

    proper = _proper_cross(asegs, bsegs)
    any_touch_cross = segments_cross(asegs, bsegs)

    if a_is_poly:
        b_strict_in_a, b_on_a, _ = _classify_points(bverts[:, 0], bverts[:, 1], a, asegs)
        any_b_interior_in_a = bool(b_strict_in_a.any())
        all_b_covered_by_a = bool((b_strict_in_a | b_on_a).all())
    else:
        any_b_interior_in_a = False
        all_b_covered_by_a = False

    interiors_meet = bool(a_strict_in.any()) or any_b_interior_in_a or proper
    intersects = interiors_meet or bool(a_on.any()) or any_touch_cross
    all_a_covered = bool((~a_strict_out).all())
    covered_by = all_a_covered and not proper and intersects and not any_b_interior_in_a
    within = covered_by and bool(a_strict_in.any())
    contains = (
        a_is_poly and all_b_covered_by_a and not proper and intersects and any_b_interior_in_a
    )
    disjoint = not intersects
    touches = intersects and not interiors_meet
    crosses = (not a_is_poly) and interiors_meet and bool(a_strict_out.any())
    overlaps = (
        a_is_poly
        and interiors_meet
        and bool(a_strict_out.any())
        and not contains
        and not covered_by
    )
    return {
        "intersects": intersects,
        "within": within,
        "contains": contains,
        "covered_by": covered_by,
        "disjoint": disjoint,
        "crosses": crosses,
        "touches": touches,
        "overlaps": overlaps,
    }


def _proper_cross(asegs: np.ndarray, bsegs: np.ndarray) -> bool:
    if len(asegs) == 0 or len(bsegs) == 0:
        return False
    A, B = _pairs(asegs, bsegs)
    d1 = orient_sign(B[:, 0], B[:, 1], B[:, 2], B[:, 3], A[:, 0], A[:, 1])
    d2 = orient_sign(B[:, 0], B[:, 1], B[:, 2], B[:, 3], A[:, 2], A[:, 3])
    d3 = orient_sign(A[:, 0], A[:, 1], A[:, 2], A[:, 3], B[:, 0], B[:, 1])
    d4 = orient_sign(A[:, 0], A[:, 1], A[:, 2], A[:, 3], B[:, 2], B[:, 3])
    return bool(((d1 * d2 < 0) & (d3 * d4 < 0)).any())


