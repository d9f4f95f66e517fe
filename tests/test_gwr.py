"""GWR-lite vs an independent dense numpy weighted-OLS oracle."""

import numpy as np

from geodesk_spark.operators import stats


def _pts():
    # 3 spatial clusters with DIFFERENT local slopes; integer covariate
    # and response so the operator's exactness contract applies
    rows = []
    rng = np.random.default_rng(7)
    # cluster A around cell (2,2)-ish: slope +3; B: slope -2; C: slope 0
    for cx, cy, slope, base in [(-1.6e9, 1.2e9, 3, 1000), (0.4e9, -0.9e9, -2, 5000), (1.5e9, 1.4e9, 0, 200)]:
        for _ in range(120):
            x = int(cx + rng.integers(-8e7, 8e7))
            y = int(cy + rng.integers(-8e7, 8e7))
            xv = int(rng.integers(0, 500))
            yv = base + slope * xv + int(rng.integers(-20, 21))
            rows.append((x, y, xv, yv))
    return rows


def _brute(rows, grid_bits, radius):
    step = 1 << (32 - grid_bits)
    cells = {}
    for x, y, xv, yv in rows:
        gx = (x + 2**31) // step
        gy = (2**31 - 1 - y) // step
        c = cells.setdefault((gx, gy), [0, 0, 0, 0, 0])
        c[0] += 1
        c[1] += xv
        c[2] += yv
        c[3] += xv * xv
        c[4] += xv * yv
    taps = [
        (dx, dy, radius * radius + 1 - dx * dx - dy * dy)
        for dx in range(-radius, radius + 1)
        for dy in range(-radius, radius + 1)
        if radius * radius + 1 - dx * dx - dy * dy > 0
    ]
    out = {}
    targets = {(gx + dx, gy + dy) for gx, gy in cells for dx, dy, _ in taps}
    for gx, gy in targets:
        s = [0, 0, 0, 0, 0]
        for dx, dy, w in taps:
            c = cells.get((gx - dx, gy - dy))
            if c:
                for i in range(5):
                    s[i] += w * c[i]
        den = s[0] * s[3] - s[1] * s[1]
        if den == 0:
            out[(gx, gy)] = (s[0], None, None)
        else:
            slope = (s[0] * s[4] - s[1] * s[2]) / den
            out[(gx, gy)] = (s[0], slope, (s[2] - slope * s[1]) / s[0])
    return out


def test_gwr_matches_brute(spark):
    rows = _pts()
    df = spark.createDataFrame(rows, "x long, y long, xv long, yv long")
    got = {
        (r.gx, r.gy): (r.n_eff, r.slope, r.intercept)
        for r in stats.gwr_local(df, grid_bits=6, radius=2).collect()
    }
    exp = _brute(rows, 6, 2)
    assert set(got) == set(exp) and len(got) > 30
    for k, (n, s, i) in got.items():
        en, es, ei = exp[k]
        assert n == en, (k, n, en)
        if es is None:
            assert s is None and i is None
        else:
            assert abs(s - es) < 1e-5, (k, s, es)
            assert abs(i - ei) < 1e-4, (k, i, ei)


def test_gwr_recovers_local_slopes(spark):
    # inside each cluster's core the local fit recovers the planted
    # slope to the noise floor
    rows = _pts()
    df = spark.createDataFrame(rows, "x long, y long, xv long, yv long")
    res = stats.gwr_local(df, grid_bits=6, radius=2).collect()
    step = 1 << 26
    for cx, cy, slope in [(-1.6e9, 1.2e9, 3), (0.4e9, -0.9e9, -2), (1.5e9, 1.4e9, 0)]:
        gx = int((cx + 2**31) // step)
        gy = int((2**31 - 1 - cy) // step)
        core = [r for r in res if abs(r.gx - gx) <= 1 and abs(r.gy - gy) <= 1 and r.n_eff > 100]
        assert core, (gx, gy)
        for r in core:
            assert abs(r.slope - slope) < 0.35, (r.gx, r.gy, r.slope, slope)
