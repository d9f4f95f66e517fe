"""kRing hex smoothing: brute-force parity and ring topology."""

import numpy as np
from pyspark.sql import functions as F

from geodesk_spark.geo import hexgrid
from geodesk_spark.operators import hexes


def test_kring_offsets_counts():
    assert len(hexes.kring_offsets(1)) == 7
    assert len(hexes.kring_offsets(2)) == 19
    assert (0, 0) in hexes.kring_offsets(1)


def test_kring_smooth_matches_bruteforce(spark):
    rng = np.random.default_rng(23)
    qs = rng.integers(-5, 6, size=300)
    rs = rng.integers(-5, 6, size=300)
    cells = {}
    for q, r in zip(qs.tolist(), rs.tolist()):
        cid = ((q + hexgrid._OFF) << 21) | (r + hexgrid._OFF)
        cells[cid] = cells.get(cid, 0) + 1
    df = spark.createDataFrame(list(cells.items()), "hcell long, n long")
    got = {
        row["hcell"]: (row["ring_sum"], row["ring_cells"])
        for row in hexes.kring_smooth(df, k=1).collect()
    }
    assert set(got) == set(cells)
    offs = hexes.kring_offsets(1)
    for cid, n in cells.items():
        q = (cid >> 21) - hexgrid._OFF
        r = (cid & ((1 << 21) - 1)) - hexgrid._OFF
        members = [
            ((q + dq + hexgrid._OFF) << 21) | ((r + dr + hexgrid._OFF))
            for dq, dr in offs
        ]
        exp_sum = sum(cells.get(m, 0) for m in members)
        exp_cnt = sum(1 for m in members if m in cells)
        assert got[cid] == (exp_sum, exp_cnt), cid


def test_polyfill_bbox_matches_bruteforce(spark):
    rng = np.random.default_rng(31)
    SIZE = 25_000_000
    boxes = []
    for i in range(60):
        cx = int(rng.integers(-1_500_000_000, 1_500_000_000))
        cy = int(rng.integers(-1_500_000_000, 1_500_000_000))
        hw = int(rng.integers(1_000_000, 300_000_000))
        hh = int(rng.integers(1_000_000, 300_000_000))
        boxes.append((i, cx - hw, cy - hh, cx + hw, cy + hh))
    df = spark.createDataFrame(boxes, "fid long, minx long, miny long, maxx long, maxy long")
    got = {}
    for row in hexes.polyfill_bbox(df, size=SIZE).collect():
        got.setdefault(row["fid"], set()).add(row["hcell"])
    D = SIZE * np.sqrt(3.0)
    C = 1.5 * SIZE
    for fid, minx, miny, maxx, maxy in boxes:
        exp = set()
        for r in range(int(np.ceil(miny / C)), int(np.floor(maxy / C)) + 1):
            # brute force: every q whose center x lands inside
            for q in range(
                int(np.floor(minx / D - r * 0.5)) - 1,
                int(np.ceil(maxx / D - r * 0.5)) + 2,
            ):
                cx_, cy_ = hexgrid.hex_center(np.array([q]), np.array([r]), SIZE)
                if minx <= cx_[0] <= maxx and miny <= cy_[0] <= maxy:
                    exp.add(int(((q + hexgrid._OFF) << 21) | (r + hexgrid._OFF)))
        assert got.get(fid, set()) == exp, fid
        # every covered cell's center really is inside the box, and every
        # sampled in-box point's own cell is in the polyfill
        for _ in range(5):
            px = int(rng.integers(minx, maxx + 1))
            py = int(rng.integers(miny, maxy + 1))
            cid = int(hexgrid.hex_cell_id(np.array([px]), np.array([py]), SIZE)[0])
            cq = (cid >> 21) - hexgrid._OFF
            cr = (cid & ((1 << 21) - 1)) - hexgrid._OFF
            ccx, ccy = hexgrid.hex_center(np.array([cq]), np.array([cr]), SIZE)
            if minx <= ccx[0] <= maxx and miny <= ccy[0] <= maxy:
                assert cid in exp


def test_kring_smooth_symmetric_uniform(spark):
    # a fully populated block with uniform value: every interior cell's
    # ring_sum is 7x the value and ring_cells is 7
    rows = [
        (((q + hexgrid._OFF) << 21) | (r + hexgrid._OFF), 3)
        for q in range(-3, 4)
        for r in range(-3, 4)
    ]
    df = spark.createDataFrame(rows, "hcell long, n long")
    out = hexes.kring_smooth(df, k=1).collect()
    interior = [
        row
        for row in out
        if abs((row["hcell"] >> 21) - hexgrid._OFF) <= 1
        and abs((row["hcell"] & ((1 << 21) - 1)) - hexgrid._OFF) <= 1
    ]
    assert interior and all(
        row["ring_sum"] == 21 and row["ring_cells"] == 7 for row in interior
    )


def test_polyfill_centers_roundtrip_and_nonconvex_composition(spark):
    """polyfill_centers: every emitted center maps back to its own cell,
    and composing centers with an exact ray-cast fills a NON-convex
    polygon identically to a brute lattice sweep (the general H3
    polyfill recipe)."""
    import numpy as np

    from geodesk_spark.geo import hexgrid, pip

    size = 1 << 16
    # concave "arrow" polygon (closed CCW ring)
    ring = np.array(
        [
            [0.0, 0.0],
            [900_000.0, 0.0],
            [450_000.0, 350_000.0],  # notch pulls inward
            [900_000.0, 800_000.0],
            [0.0, 800_000.0],
            [0.0, 0.0],
        ]
    )
    minx, miny = ring[:, 0].min(), ring[:, 1].min()
    maxx, maxy = ring[:, 0].max(), ring[:, 1].max()
    df = spark.createDataFrame(
        [(1, int(minx), int(miny), int(maxx), int(maxy))],
        "key int, minx long, miny long, maxx long, maxy long",
    )
    got = hexes.polyfill_centers(df, size).collect()
    assert got, "bbox polyfill should emit cells"
    cx = np.array([r.cx for r in got])
    cy = np.array([r.cy for r in got])
    # (a) round trip: each center's own hex is the emitted cell
    assert (hexgrid.hex_cell_id(cx, cy, size) == np.array([r.hcell for r in got])).all()
    # (b) center-in-polygon composition matches the brute lattice sweep
    inside = pip.points_in_ring(cx, cy, ring)
    got_cells = {r.hcell for r, ins in zip(got, inside) if ins}
    D, C = size * np.sqrt(3.0), 1.5 * size
    want = set()
    for rr in range(int(np.ceil(miny / C)), int(np.floor(maxy / C)) + 1):
        for q in range(
            int(np.ceil(minx / D - rr * 0.5)), int(np.floor(maxx / D - rr * 0.5)) + 1
        ):
            px, py = hexgrid.hex_center(np.array([q]), np.array([rr]), size)
            if pip.points_in_ring(px, py, ring)[0]:
                want.add(((q + (1 << 20)) << 21) | (rr + (1 << 20)))
    assert got_cells == want and len(want) > 20
