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
    assert out[7]["minx"] == 0 and out[7]["maxy"] == 100
    got = pip.points_in_polygon(
        np.array([50.0, 20.0, 200.0]),
        np.array([50.0, 20.0, 200.0]),
        pip.unpack_rings(bytes(out[7]["rings"])),
    )
    assert got.tolist() == [False, True, False]  # hole, interior, outside
    assert not out[8]["valid"]
