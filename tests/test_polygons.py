"""Ring assembly (PolygonBuilder parity): chained runs == original
polygon under PIP, hole nesting, invalid detection."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from geodesk_spark.geo import pip, rings as R
from geodesk_spark.operators import polygons
from geodesk_spark.sources import synth


def _chop(ring: np.ndarray, n_chunks: int, rng) -> list[np.ndarray]:
    """Cut a closed ring into n runs with shared endpoints, shuffle and
    reverse some — the arbitrary order/direction a relation's member
    ways arrive in."""
    k = len(ring) - 1  # distinct vertices
    cuts = sorted(rng.choice(np.arange(1, k), size=n_chunks - 1, replace=False))
    bounds = [0, *cuts, k]
    runs = [ring[bounds[i] : bounds[i + 1] + 1].copy() for i in range(n_chunks)]
    rng.shuffle(runs)
    return [r[::-1].copy() if rng.random() < 0.5 else r for r in runs]


def test_assemble_matches_original_pip():
    rng = np.random.default_rng(11)
    for poly in synth.polygon_layer()[:6]:
        orig = pip.unpack_rings(poly["rings"])
        runs = []
        for ring in orig:
            runs.extend(_chop(ring, min(4, len(ring) - 2), rng))
        rebuilt = R.assemble_rings(runs)
        assert len(rebuilt) == len(orig)
        xs = rng.uniform(poly["minx"] - 10, poly["maxx"] + 10, 3000)
        ys = rng.uniform(poly["miny"] - 10, poly["maxy"] + 10, 3000)
        got = pip.points_in_polygon(xs, ys, rebuilt)
        want = pip.points_in_polygon(xs, ys, orig)
        assert np.array_equal(got, want)


def test_group_rings_nesting():
    sq = lambda c, s: np.array(
        [[c - s, c - s], [c + s, c - s], [c + s, c + s], [c - s, c + s], [c - s, c - s]],
        dtype=np.float64,
    )
    outer_a = sq(0, 100)
    hole_a = sq(0, 40)
    island = sq(0, 10)  # inside the hole → its own part (depth 2)
    outer_b = sq(1000, 50)
    parts = R.group_rings([hole_a, island, outer_b, outer_a])
    sizes = sorted(len(p) for p in parts)
    assert len(parts) == 3 and sizes == [1, 1, 2]
    # the 2-ring part is outer_a + hole_a
    two = next(p for p in parts if len(p) == 2)
    assert abs(R.signed_area(two[0])) == 200.0 * 200.0


def test_dangling_raises():
    open_run = np.array([[0, 0], [10, 0], [10, 10]], dtype=np.float64)
    with pytest.raises(R.RingAssemblyError):
        R.assemble_rings([open_run])


def _sq(x0, y0, x1, y1):
    return np.array(
        [[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]], dtype=np.float64
    )


def test_fixup_keeps_closed_rings():
    """RingBuilder.build semantics: dangling runs are dropped, the rings
    that closed are kept (RingBuilder.java:246-249)."""
    closed = _sq(0, 0, 10, 10)
    dangling = np.array([[100, 100], [110, 100]], dtype=np.float64)
    rings, n_dangling = R.try_assemble_rings([closed, dangling])
    assert len(rings) == 1 and n_dangling == 1
    assert np.array_equal(rings[0], closed)


def test_touching_rings_backtrack():
    """Two rings sharing one vertex (4 run endpoints at (10,10)): the
    chainer must close each ring instead of welding a figure-eight."""
    a1 = np.array([[0, 0], [10, 0], [10, 10]], dtype=np.float64)
    a2 = np.array([[10, 10], [0, 10], [0, 0]], dtype=np.float64)
    b1 = np.array([[10, 10], [20, 10], [20, 20]], dtype=np.float64)
    b2 = np.array([[20, 20], [10, 20], [10, 10]], dtype=np.float64)
    for runs in ([a1, b1, a2, b2], [b1, a1, b2, a2], [a1, b2, b1, a2]):
        rings = R.assemble_rings(runs)
        assert len(rings) == 2, [r.tolist() for r in rings]
        for r in rings:
            assert len(r) == 5 and np.array_equal(r[0], r[-1])
            # each ring stays within its own quadrant
            assert (r[:, 0].max() - r[:, 0].min()) == 10


def test_points_in_parts_overlapping_holes():
    """Union-of-holes membership == the reference's buffer(0) hole merge
    (PolygonBuilder.java:105-126): the overlap region of two holes stays
    OUTSIDE, where raw XOR composition would re-include it."""
    outer = _sq(0, 0, 100, 100)
    hole_a = _sq(30, 30, 60, 60)
    hole_b = _sq(50, 50, 80, 80)
    part = [outer, hole_a, hole_b]
    assert R.holes_overlap(part)
    assert not R.holes_overlap([outer, hole_a, _sq(70, 10, 90, 20)])
    xs = np.array([55.0, 40.0, 70.0, 10.0, 200.0])
    ys = np.array([55.0, 40.0, 70.0, 10.0, 200.0])
    got = R.points_in_parts(xs, ys, [part])
    # (55,55) is in BOTH holes: XOR would flip it back to "inside"
    assert got.tolist() == [False, False, False, True, False]
    xor = pip.points_in_polygon(xs, ys, part)
    assert bool(xor[0])  # documents the XOR divergence the merge fixes


def test_spark_operator(spark):
    """Distributed assembly: two relations (one with a hole, one broken)."""
    rng = np.random.default_rng(5)
    outer = np.array(
        [[0, 0], [100, 0], [100, 100], [0, 100], [0, 0]], dtype=np.float64
    )
    hole = np.array([[40, 40], [60, 40], [60, 60], [40, 60], [40, 40]], dtype=np.float64)
    runs = _chop(outer, 3, rng) + [hole]
    member_rows, wn_rows = [], []
    wid = 100
    for r in runs:
        member_rows.append((7, wid, "outer" if len(r) > 5 or r is runs[0] else "outer"))
        for s, (x, y) in enumerate(r):
            wn_rows.append((wid, s, int(x), int(y)))
        wid += 1
    # rel 8: dangling (drop last run)
    for r in _chop(outer, 3, rng)[:-1]:
        member_rows.append((8, wid, "outer"))
        for s, (x, y) in enumerate(r):
            wn_rows.append((wid, s, int(x), int(y)))
        wid += 1
    members = spark.createDataFrame(member_rows, "rel_id long, member_id long, role string")
    way_nodes = spark.createDataFrame(wn_rows, "way_id long, seq int, x int, y int")
    out = {
        r["rel_id"]: r
        for r in polygons.assemble_relation_polygons(members, way_nodes).collect()
    }
    assert out[7]["valid"] and out[7]["n_rings"] == 2 and out[7]["n_parts"] == 1
    assert out[7]["status"] == "valid" and out[7]["n_dangling"] == 0
    assert out[8]["status"] == "invalid"
    assert out[7]["minx"] == 0 and out[7]["maxy"] == 100
    got = pip.points_in_polygon(
        np.array([50.0, 20.0, 200.0]),
        np.array([50.0, 20.0, 200.0]),
        pip.unpack_rings(bytes(out[7]["rings"])),
    )
    assert got.tolist() == [False, True, False]  # hole, interior, outside
    assert not out[8]["valid"]


def test_relation_geometry_collection(spark):
    """Non-area relation assembly (StoredRelation.toGeometryCollection):
    typing rules, recursive gathering, cycle guard, empty relation."""
    import __spark_entry__ as em

    members, rels, wn, nodes = em._geomcoll_fixture()
    m = spark.createDataFrame(
        members, "rel_id long, member_id long, member_type string, role string"
    )
    ra = spark.createDataFrame(rels, "rel_id long, is_area boolean")
    w = spark.createDataFrame(wn, "way_id long, seq int, x int, y int")
    n = spark.createDataFrame(nodes, "node_id long, x int, y int")
    out = {
        r["rel_id"]: r
        for r in polygons.relation_geometry_collection(m, ra, w, n).collect()
    }
    assert set(out) == {100, 101, 102, 103, 104, 105, 106}  # area rels excluded
    # all-LineString → MultiLineString; all-Point → MultiPoint
    assert out[100]["geom_type"] == "MultiLineString" and out[100]["n_geoms"] == 3
    assert out[100]["n_vertices"] == 7
    assert out[101]["geom_type"] == "MultiPoint" and out[101]["n_geoms"] == 4
    # mixed members incl. an area sub-relation's polygon
    assert out[102]["geom_type"] == "GeometryCollection" and out[102]["n_geoms"] == 3
    assert (out[102]["minx"], out[102]["miny"], out[102]["maxx"], out[102]["maxy"]) == (
        0, 0, 520, 510,
    )
    # super-relation recurses through non-area sub-relation 100
    assert out[103]["n_geoms"] == 5 and out[103]["n_vertices"] == 12
    assert out[103]["geom_type"] == "GeometryCollection"
    # reference cycle 104↔105: both converge on the same member set
    assert out[104]["n_geoms"] == 2 and out[105]["n_geoms"] == 2
    assert out[104]["maxx"] == 999 and out[105]["maxx"] == 999
    # empty relation = empty GeometryCollection, not an absent row
    assert out[106]["geom_type"] == "GeometryCollection" and out[106]["n_geoms"] == 0
