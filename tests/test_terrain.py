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
