"""Raster stencil filters (generic stencil, Sobel, Epanechnikov KDE) vs
dense numpy convolution brute force."""

import numpy as np

from geodesk_spark.operators import tiles_sink


def _sparse(rng, n=40, lo=0, hi=12):
    pix = {}
    for _ in range(n):
        k = (int(rng.integers(lo, hi)), int(rng.integers(lo, hi)))
        pix[k] = pix.get(k, 0) + int(rng.integers(1, 9))
    return pix


def _dense(pix, pad):
    xs = [x for x, _ in pix]
    ys = [y for _, y in pix]
    ox, oy = min(xs) - pad, min(ys) - pad
    a = np.zeros((max(xs) - ox + pad + 1, max(ys) - oy + pad + 1), dtype=np.int64)
    for (x, y), n in pix.items():
        a[x - ox, y - oy] = n
    return a, ox, oy


def test_stencil_filter_matches_dense_scatter(spark):
    rng = np.random.default_rng(7)
    pix = _sparse(rng)
    taps = [(1, 0, -3), (-1, 0, 2), (0, 2, 5)]
    df = spark.createDataFrame(
        [(x, y, n) for (x, y), n in pix.items()], "gx long, gy long, n long"
    )
    got = {
        (r["gx"], r["gy"]): r["v"]
        for r in tiles_sink.stencil_filter(df, {"v": taps}).collect()
    }
    # brute scatter: out(q) = sum over taps w * n(q - d) -> n at p lands on p + d
    exp = {}
    for (x, y), n in pix.items():
        for dx, dy, w in taps:
            k = (x + dx, y + dy)
            exp[k] = exp.get(k, 0) + n * w
    assert got == exp


def test_sobel_edge_energy_flat_vs_step(spark):
    """A constant raster has zero interior energy; a step edge doesn't."""
    rows = [(x, y, 5) for x in range(6) for y in range(6)]
    df = spark.createDataFrame(rows, "gx long, gy long, n long")
    got = {
        (r["gx"], r["gy"]): r["g2"] for r in tiles_sink.sobel_edge_energy(df).collect()
    }
    for x in range(1, 5):
        for y in range(1, 5):
            assert got[(x, y)] == 0, (x, y)
    # vertical step: left half 0, right half 9
    rows = [(x, y, 9) for x in range(3, 6) for y in range(6)]
    df = spark.createDataFrame(rows, "gx long, gy long, n long")
    got = {
        (r["gx"], r["gy"]): r["g2"] for r in tiles_sink.sobel_edge_energy(df).collect()
    }
    # interior rows along the edge column see |Gx| = 4*9, Gy = 0
    for y in range(2, 4):
        assert got[(3, y)] == (4 * 9) ** 2
        assert got[(4, y)] == 0


def test_kde_heatmap_matches_dense_epanechnikov(spark):
    rng = np.random.default_rng(11)
    pix = _sparse(rng)
    r = 3
    df = spark.createDataFrame(
        [(x, y, n) for (x, y), n in pix.items()], "gx long, gy long, n long"
    )
    got = {
        (r_["gx"], r_["gy"]): r_["density"]
        for r_ in tiles_sink.kde_heatmap_counts(df, radius=r).collect()
    }
    exp = {}
    for (x, y), n in pix.items():
        for dx in range(-r, r + 1):
            for dy in range(-r, r + 1):
                w = r * r + 1 - dx * dx - dy * dy
                if w > 0:
                    k = (x + dx, y + dy)
                    exp[k] = exp.get(k, 0) + n * w
    assert got == exp
    # center weight is r^2+1, rim weight 1: single point sanity
    df1 = spark.createDataFrame([(0, 0, 2)], "gx long, gy long, n long")
    got1 = {
        (r_["gx"], r_["gy"]): r_["density"]
        for r_ in tiles_sink.kde_heatmap_counts(df1, radius=r).collect()
    }
    assert got1[(0, 0)] == 2 * (r * r + 1)
    assert got1[(3, 0)] == 2
    assert (4, 0) not in got1
