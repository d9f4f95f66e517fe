"""Box algebra — ported from the reference's BoxTest.java verbatim."""

from geodesk_spark.geo.box import Box, I32_MAX, I32_MIN

EMPTY = Box()
A = Box(-800, 600, -100, 800)
B = Box(100, 500, 700, 800)
C = Box(-900, I32_MIN, -700, -200)
D = Box(300, -700, 800, -300)
E = Box(-300, 300, 200, 900)
F = Box(-700, 200, -200, 700)
G = Box(600, 300, I32_MAX, 600)
H = Box(-800, -300, 500, 300)
AE = Box(-300, 600, -100, 800)
MAX = Box(I32_MIN, I32_MIN, I32_MAX, I32_MAX)
INVALID = Box(I32_MAX, I32_MAX, I32_MIN, I32_MIN)
INVALID2 = Box(200, 200, 100, 100)


def _inter(a, b, want):
    assert a.intersection(b) == want
    assert b.intersection(a) == want


def test_intersection_table():
    # BoxTest.testIntersection, all 16 cases
    _inter(A, B, EMPTY)
    _inter(A, EMPTY, EMPTY)
    _inter(EMPTY, B, EMPTY)
    _inter(A, E, AE)
    _inter(A, MAX, A)
    _inter(B, MAX, B)
    _inter(MAX, EMPTY, EMPTY)
    _inter(MAX, MAX, MAX)
    _inter(INVALID, EMPTY, EMPTY)
    _inter(INVALID, INVALID, EMPTY)
    _inter(A, INVALID, EMPTY)
    _inter(MAX, INVALID, EMPTY)
    _inter(INVALID2, INVALID, EMPTY)
    _inter(INVALID2, A, EMPTY)
    _inter(INVALID2, MAX, EMPTY)
    _inter(INVALID2, INVALID2, EMPTY)


def _isect(a, b, want):
    assert a.intersects(b) == want
    assert b.intersects(a) == want


def test_intersects_table():
    # BoxTest.testIntersects, all 22 cases
    for a, b in [(A, B), (A, C), (A, D), (B, C), (B, D), (C, D)]:
        _isect(a, b, False)
    _isect(E, A, True); _isect(E, B, True); _isect(E, C, False); _isect(E, D, False)
    _isect(F, A, True); _isect(F, B, False); _isect(F, C, False)
    _isect(F, D, False); _isect(F, E, True)
    _isect(G, A, False); _isect(G, B, True); _isect(G, C, False)
    _isect(G, D, False); _isect(G, E, False); _isect(G, F, False)
    _isect(H, A, False); _isect(H, B, False); _isect(H, C, True)
    _isect(H, D, True); _isect(H, E, True); _isect(H, F, True); _isect(H, G, False)


def test_expand_buffer_contains():
    # BoxTest.test(): expandToInclude + buffer + contains
    box = Box()
    box = box.expand_to_include_xy(90, 100)
    box = box.expand_to_include_xy(-4000, -8000)
    box = box.buffer(200)
    assert box.contains_xy(0, 0)
    assert not box.contains_xy(-7000, -3000)


def test_antimeridian_contains():
    # Box.ofWSEN(170, -40, -160, 30) wraps: contains both int extremes
    box2 = Box.of_wsen(170, -40, -160, 30)
    assert box2.wraps_antimeridian
    assert box2.contains_xy(I32_MIN, -3000)
    assert box2.contains_xy(I32_MAX, -3000)
    assert not box2.contains_xy(0, 0)


def test_world_buffer_wraps_x_trims_y():
    w = Box.of_world().buffer(10)
    # x wraps through the antimeridian; y clamps at the poles
    assert w.minx == I32_MAX - 9 and w.maxx == I32_MIN + 9
    assert w.miny == I32_MIN and w.maxy == I32_MAX
    back = w.buffer(-10)
    assert back.minx == I32_MIN and back.maxx == I32_MAX


def test_smaller_and_factories():
    assert Box.smaller(A, MAX) == A
    assert Box.at_xy(5, 6) == Box(5, 6, 5, 6)
    d = Box.imps_around_xy(100, 0, I32_MAX - 50)
    assert d.maxy == I32_MAX  # y trimmed, no overflow
    assert d.minx == -100 and d.maxx == 100
