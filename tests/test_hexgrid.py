"""H3-style hex cell encode: Voronoi (nearest-center) correctness,
numpy↔Column parity, id packing bounds."""

import numpy as np
from pyspark.sql import functions as F

from geodesk_spark.geo import hexgrid

SIZE = 25_000_000


def test_hex_nearest_center_property():
    # The defining property of hex binning: each point's assigned hex
    # center is the nearest center among the cell and its two
    # neighbor rings (boundary-tie-free random points).
    rng = np.random.default_rng(7)
    xs = rng.integers(-2_000_000_000, 2_000_000_000, size=4000)
    ys = rng.integers(-2_000_000_000, 2_000_000_000, size=4000)
    q, r = hexgrid.hex_cell(xs, ys, SIZE)
    cx, cy = hexgrid.hex_center(q, r, SIZE)
    d0 = (xs - cx) ** 2 + (ys - cy) ** 2
    # ring-1 and ring-2 neighbor offsets in axial coords
    ring = [
        (dq, dr)
        for dq in range(-2, 3)
        for dr in range(-2, 3)
        if (dq, dr) != (0, 0) and abs(dq + dr) <= 2
    ]
    for dq, dr in ring:
        nx, ny = hexgrid.hex_center(q + dq, r + dr, SIZE)
        dn = (xs - nx) ** 2 + (ys - ny) ** 2
        assert (d0 <= dn + 1e-3 * SIZE**2).all()  # strict up to fp slack
        # and strictly nearer than the far ring for almost all points
    # centers must round-trip onto their own cell
    q2, r2 = hexgrid.hex_cell(cx, cy, SIZE)
    assert (q2 == q).all() and (r2 == r).all()


def test_hex_column_parity(spark):
    rng = np.random.default_rng(11)
    xs = rng.integers(-2_000_000_000, 2_000_000_000, size=2000)
    ys = rng.integers(-2_000_000_000, 2_000_000_000, size=2000)
    expected = hexgrid.hex_cell_id(xs, ys, SIZE)
    df = spark.createDataFrame(
        [(int(x), int(y)) for x, y in zip(xs, ys)], "x long, y long"
    )
    got = (
        hexgrid.hex_cell_cols(df, "x", "y", SIZE)
        .orderBy("x", "y")
        .select("hcell")
        .toPandas()["hcell"]
        .to_numpy()
    )
    order = np.lexsort((ys, xs))
    assert (got == expected[order]).all()


def test_hex_id_pack_unpack():
    rng = np.random.default_rng(3)
    xs = rng.integers(-2_000_000_000, 2_000_000_000, size=500)
    ys = rng.integers(-2_000_000_000, 2_000_000_000, size=500)
    q, r = hexgrid.hex_cell(xs, ys, SIZE)
    cid = hexgrid.hex_cell_id(xs, ys, SIZE)
    assert (cid >= 0).all()
    uq = (cid >> 21) - (1 << 20)
    ur = (cid & ((1 << 21) - 1)) - (1 << 20)
    assert (uq == q).all() and (ur == r).all()


def test_hex_neighbors_are_six(spark):
    # aggregate sanity on a dense grid: interior cells see exactly 6
    # adjacent populated cells when every cell is populated
    rng = np.random.default_rng(5)
    xs = rng.integers(-200_000_000, 200_000_000, size=20000)
    ys = rng.integers(-200_000_000, 200_000_000, size=20000)
    q, r = hexgrid.hex_cell(xs, ys, SIZE)
    cells = set(zip(q.tolist(), r.tolist()))
    interior = [
        (cq, cr)
        for (cq, cr) in cells
        if all((cq + dq, cr + dr) in cells for dq, dr in
               [(1, 0), (-1, 0), (0, 1), (0, -1), (1, -1), (-1, 1)])
    ]
    assert len(interior) > 10
