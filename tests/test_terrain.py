"""Terrain slope/aspect/hillshade vs an independent dense-numpy oracle."""

import math

import numpy as np

from geodesk_spark.operators import terrain


def dem_rows():
    # deterministic lumpy integer surface on a 12x12 grid
    rows = []
    for gx in range(12):
        for gy in range(12):
            z = (gx * gx * 3 + gy * 5 + ((gx * 7 + gy * 11) % 13) * 2) % 97
            rows.append((gx, gy, z))
    return rows


def _brute(rows, cell, az, alt):
    """Dense libm reference (allclose check, not bit-equality)."""
    z = np.zeros((16, 16))
    for gx, gy, v in rows:
        z[gx + 2, gy + 2] = v
    out = {}
    zen = math.radians(90 - alt)
    azr = math.radians(az)
    for i in range(1, 15):
        for j in range(1, 15):
            gxn = (
                z[i + 1, j - 1] + 2 * z[i + 1, j] + z[i + 1, j + 1]
                - z[i - 1, j - 1] - 2 * z[i - 1, j] - z[i - 1, j + 1]
            )
            gyn = (
                z[i - 1, j + 1] + 2 * z[i, j + 1] + z[i + 1, j + 1]
                - z[i - 1, j - 1] - 2 * z[i, j - 1] - z[i + 1, j - 1]
            )
            p, q = gxn / (8 * cell), gyn / (8 * cell)
            slope = 100.0 * math.hypot(p, q)
            if gxn == 0 and gyn == 0:
                aspect = -1.0
            else:
                deg = math.degrees(math.atan2(gyn, -gxn))
                aspect = 90.0 - deg if deg <= 90.0 else 450.0 - deg
            hs = (
                255.0
                * (math.cos(zen) + math.sin(zen) * (-p * math.cos(azr) + q * math.sin(azr)))
                / math.sqrt(1.0 + p * p + q * q)
            )
            out[(i - 2, j - 2)] = (slope, aspect, max(hs, 0.0))
    return out


def test_terrain_matches_brute(spark):
    rows = dem_rows()
    df = spark.createDataFrame(rows, "gx long, gy long, n long")
    got = {
        (r.gx, r.gy): (r.slope_pct, r.aspect_deg, r.hillshade)
        for r in terrain.slope_aspect_hillshade(df, cell=2.0).collect()
    }
    exp = _brute(rows, 2.0, 315.0, 45.0)
    # spark emits the dilated support; brute covers [-1..12] fully
    assert set(exp) >= set(got) and len(got) > 100
    for k, (s, a, h) in got.items():
        es, ea, eh = exp[k]
        assert abs(s - es) < 1e-5, (k, s, es)
        assert abs(h - eh) < 1e-5, (k, h, eh)
        if ea == -1.0 or a == -1.0:
            assert a == ea, (k, a, ea)
        else:
            assert abs(a - ea) < 1e-5, (k, a, ea)


def test_terrain_flat_region(spark):
    # constant plateau: interior gradients all zero -> aspect -1,
    # slope 0, hillshade = 255*cos(zenith) quantized
    rows = [(x, y, 50) for x in range(6) for y in range(6)]
    df = spark.createDataFrame(rows, "gx long, gy long, n long")
    res = terrain.slope_aspect_hillshade(df, cell=1.0)
    interior = {
        (r.gx, r.gy): r for r in res.collect() if 1 <= r.gx <= 4 and 1 <= r.gy <= 4
    }
    want_hs = math.floor(255.0 * math.cos(math.radians(45)) * 1e6 + 0.5) / 1e6
    for r in interior.values():
        assert r.slope_pct == 0.0
        assert r.aspect_deg == -1.0
        assert r.hillshade == want_hs


def test_viewshed_planted_wall(spark):
    """Line-of-sight laws on a planted terrain: a tall wall east of the
    observer hides the cells behind it, the gap row stays visible, high
    towers behind the wall peek over it, and everything west (flat) is
    visible.  Cross-checked against an independent float-angle brute."""
    import math

    from geodesk_spark.operators import terrain

    rows = []
    # flat plain z=10 on [-8..8]^2, observer at origin height +5
    for gx in range(-8, 9):
        for gy in range(-8, 9):
            z = 10
            if gx == 3 and gy != 5:
                z = 100  # wall at x=3 with a gap at gy=5
            if gx == 6 and gy == 0:
                z = 400  # tower peeking over the wall
            rows.append((gx, gy, z))
    dem = spark.createDataFrame(rows, "gx long, gy long, n long")
    got = {(r.gx, r.gy): r.visible for r in terrain.viewshed(dem, 0, 0, 5, 8).collect()}

    zmap = {(gx, gy): z for gx, gy, z in rows}

    def brute(tx, ty, tz, oz=15):
        # independent replay of the exact integer rule
        n = max(abs(tx), abs(ty))
        for k in range(1, n):
            sx = math.floor(k * tx / n + 0.5)
            sy = math.floor(k * ty / n + 0.5)
            if (zmap.get((sx, sy), 0) - oz) * n >= (tz - oz) * k:
                return False
        return True

    for (gx, gy), vis in got.items():
        assert vis == brute(gx, gy, zmap[(gx, gy)]), (gx, gy)
    # spot laws
    assert got[(-5, 0)] is True            # flat west: visible
    assert got[(3, 0)] is True             # the wall itself is visible
    assert got[(5, 0)] is False            # plain behind the wall: hidden
    assert got[(6, 0)] is True             # tall tower peeks over
    assert got[(3, 5)] is True             # the wall-gap cell: visible


def test_cost_distance_planted_barrier(spark):
    """Cost spreading on a planted friction surface: a cheap corridor
    beats the direct expensive route; exact chamfer arithmetic matches
    an independent Dijkstra."""
    from geodesk_spark.operators import terrain

    # 9x9 grid: friction 1 everywhere, a high-friction wall at x=2
    # (cost 100) with a cheap gap at (2, 7)
    rows = []
    for gx in range(9):
        for gy in range(9):
            c = 1
            if gx == 2 and gy != 7:
                c = 100
            rows.append((gx, gy, c))
    cost = spark.createDataFrame(rows, "gx long, gy long, n long")
    got = {(r.gx, r.gy): r.dist for r in terrain.cost_distance(cost, [(0, 0)], rounds=16).collect()}

    cm = {(gx, gy): c for gx, gy, c in rows}
    d8 = [(1, 0, 5), (-1, 0, 5), (0, 1, 5), (0, -1, 5),
          (1, 1, 7), (1, -1, 7), (-1, 1, 7), (-1, -1, 7)]

    def dijkstra(src, max_hops):
        # bounded-hop minimum (the operator's exact semantics)
        dist = {src: 0}
        frontier = {src: 0}
        for _ in range(max_hops):
            nxt = {}
            for (cx, cy), dv in frontier.items():
                for dx, dy, m in d8:
                    q = (cx + dx, cy + dy)
                    if q not in cm:
                        continue
                    nd = dv + m * (cm[(cx, cy)] + cm[q])
                    if nd < dist.get(q, 1 << 60):
                        dist[q] = nd
                        nxt[q] = nd
            frontier = nxt
            if not frontier:
                break
        return dist

    exp = dijkstra((0, 0), 16)
    assert got == exp
    # the planted law: reaching (4, 0) goes around via the gap, so its
    # cost exceeds the naive straight-line lower bound through the wall
    straight = 5 * (1 + 100) + 5 * (100 + 1) + 5 * (1 + 1) * 2
    assert got[(4, 0)] < straight  # the corridor detour wins


def test_d8_flow_and_accumulation_valley(spark):
    """Hydrology laws on a planted V-valley: every cell's D8 direction
    is the steepest-descent neighbor (independent replay of the exact
    cross-multiplied rule), the valley floor accumulates the hillsides,
    and accumulation grows monotonically downstream along the floor."""
    from geodesk_spark.operators import terrain

    # V-valley: z = |gx - 4| * 10 + (7 - gy)  -> drains toward x=4,
    # then down-gy along the floor
    rows = [(gx, gy, abs(gx - 4) * 10 + (7 - gy)) for gx in range(9) for gy in range(8)]
    dem = spark.createDataFrame(rows, "gx long, gy long, n long")
    fd = {(r.gx, r.gy): r for r in terrain.d8_flow_direction(dem).collect()}
    acc = {(r.gx, r.gy): r.acc for r in terrain.flow_accumulation(dem, rounds=16).collect()}

    zmap = {(gx, gy): z for gx, gy, z in rows}
    d8 = [(1, 0, 5), (-1, 0, 5), (0, 1, 5), (0, -1, 5),
          (1, 1, 7), (1, -1, 7), (-1, 1, 7), (-1, -1, 7)]

    for (gx, gy), r in fd.items():
        z = zmap[(gx, gy)]
        best = None
        for i, (dx, dy, m) in enumerate(d8):
            drop = z - zmap.get((gx + dx, gy + dy), 0)
            k = drop * (35 // m)
            if k > 0 and (best is None or k * 8 + (7 - i) > best[0]):
                best = (k * 8 + (7 - i), i)
        if best is None:
            assert r.is_sink and r.dir == -1, (gx, gy)
        else:
            assert (not r.is_sink) and r.dir == best[1], (gx, gy, r.dir, best)

    # floor cell (4, 7) is the global low point: it accumulates a large
    # basin; ridge-top cells accumulate only themselves
    assert acc[(4, 7)] > 20
    assert acc[(0, 0)] == 1 and acc[(8, 0)] == 1
    # monotone growth down the valley floor
    floor = [acc[(4, gy)] for gy in range(8)]
    assert all(a < b for a, b in zip(floor, floor[1:]))


def test_watershed_basins_valley(spark):
    """Watershed pointer-doubling on the planted V-valley: basin labels
    equal a slow Python walk of the D8 pointers to the terminal cell,
    and hillside cells on either side of the valley land in the floor
    outlet's basin."""
    from geodesk_spark.operators import terrain

    rows = [(gx, gy, abs(gx - 4) * 10 + (7 - gy)) for gx in range(9) for gy in range(8)]
    dem = spark.createDataFrame(rows, "gx long, gy long, n long")
    got = {(r.gx, r.gy): (r.bx, r.by)
           for r in terrain.watershed_basins(dem, rounds=6).collect()}

    fd = {(r.gx, r.gy): r for r in terrain.d8_flow_direction(dem).collect()}
    support = set(fd)

    def walk(c):
        seen = 0
        while True:
            r = fd[c]
            nxt = (r.to_gx, r.to_gy)
            if r.is_sink or nxt not in support:
                return c
            c = nxt
            seen += 1
            assert seen < 100, "cycle in D8 forest"

    exp = {c: walk(c) for c in support}
    assert got == exp
    # terminals are fixpoints (pointer doubling converged)
    for c, t in got.items():
        assert got[t] == t, (c, t)
    # planted facts: the floor's low end (4, 7) is a sink (z = 0, and
    # off-support neighbors also read 0 — no STRICT drop), the floor
    # column and the diagonal hillside chain drain into it, while a
    # border corner with z > 0 drains off-support and is its own basin
    assert all(got[(4, gy)] == (4, 7) for gy in range(1, 8))
    assert got[(1, 1)] == (4, 7)
    assert got[(0, 0)] == (0, 0)
