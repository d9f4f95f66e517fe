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


_MS_CASES = {
    1: [(0, 3)], 2: [(0, 1)], 3: [(3, 1)], 4: [(1, 2)],
    5: [(0, 1), (2, 3)], 6: [(0, 2)], 7: [(3, 2)], 8: [(2, 3)],
    9: [(0, 2)], 10: [(0, 3), (1, 2)], 11: [(1, 2)], 12: [(1, 3)],
    13: [(0, 1)], 14: [(0, 3)],
}


def _brute_contour(pix, level):
    """Reference marching squares over the sparse raster dict (absent = 0),
    same fixed saddle rule and same IEEE expressions as the operator."""
    t = float(level)
    blocks = set()
    for (x, y), n in pix.items():
        if n != 0:
            for dx, dy in ((0, 0), (1, 0), (0, 1), (1, 1)):
                blocks.add((x - dx, y - dy))
    out = {}
    for bx, by in blocks:
        tl = float(pix.get((bx, by), 0))
        tr = float(pix.get((bx + 1, by), 0))
        bl = float(pix.get((bx, by + 1), 0))
        br = float(pix.get((bx + 1, by + 1), 0))
        case = (tl >= t) + (tr >= t) * 2 + (br >= t) * 4 + (bl >= t) * 8
        for seg, (e1, e2) in enumerate(_MS_CASES.get(case, [])):
            def pt(e):
                if e == 0:
                    return (bx + (t - tl) / (tr - tl), float(by))
                if e == 1:
                    return (bx + 1.0, by + (t - tr) / (br - tr))
                if e == 2:
                    return (bx + (t - bl) / (br - bl), by + 1.0)
                return (float(bx), by + (t - tl) / (bl - tl))
            out[(bx, by, case, seg)] = pt(e1) + pt(e2)
    return out


def test_contour_segments_matches_brute_marching_squares(spark):
    rng = np.random.default_rng(23)
    pix = _sparse(rng, n=60)
    df = spark.createDataFrame(
        [(x, y, n) for (x, y), n in pix.items()], "gx long, gy long, n long"
    )
    got = {
        (r["bx"], r["by"], r["case_id"], r["seg"]): (r["x1"], r["y1"], r["x2"], r["y2"])
        for r in tiles_sink.contour_segments(df, level=4).collect()
    }
    exp = _brute_contour(pix, 4)
    assert got == exp  # bit-exact: same IEEE division, fixed saddle rule


def test_contour_single_cell_is_closed_diamond(spark):
    """An isolated above-level cell yields exactly 4 segments whose
    endpoints chain into one closed ring around the cell sample."""
    df = spark.createDataFrame([(5, 5, 8)], "gx long, gy long, n long")
    rows = tiles_sink.contour_segments(df, level=2).collect()
    assert len(rows) == 4
    ends = {}
    for r in rows:
        ends.setdefault((r["x1"], r["y1"]), 0)
        ends.setdefault((r["x2"], r["y2"]), 0)
        ends[(r["x1"], r["y1"])] += 1
        ends[(r["x2"], r["y2"])] += 1
    # closed ring: every endpoint shared by exactly two segments
    assert len(ends) == 4 and all(v == 2 for v in ends.values())
    # all endpoints lie strictly inside the 2x2 neighborhood of (5,5)
    for x, y in ends:
        assert 4.0 < x < 6.0 and 4.0 < y < 6.0


def test_contour_handles_negative_samples(spark):
    """Signed rasters (Laplacian/Sobel outputs) are valid input: a
    negative corner must interpolate as its real value, not as absent."""
    pix = {(0, 0): 5, (1, 0): -5, (0, 1): -3, (1, 1): 7}
    df = spark.createDataFrame(
        [(x, y, n) for (x, y), n in pix.items()], "gx long, gy long, n long"
    )
    got = {
        (r["bx"], r["by"], r["case_id"], r["seg"]): (r["x1"], r["y1"], r["x2"], r["y2"])
        for r in tiles_sink.contour_segments(df, level=2).collect()
    }
    assert got == _brute_contour(pix, 2)
    # the (0,0) block's top edge crossing: (2-5)/(-5-5) = 0.3 exactly
    assert any(abs(v[0] - 0.3) < 1e-12 for k, v in got.items() if k[:2] == (0, 0))


def test_morphology_laws_and_replay(spark):
    """Morphology on a planted mask: slow set replay + the algebraic
    laws (extensive closing, anti-extensive opening, pinhole fill,
    speckle removal)."""
    from geodesk_spark.operators import tiles_sink

    # 8x8 block with a 1-cell pinhole + an isolated speckle far away
    block = {(x, y) for x in range(8) for y in range(8)} - {(4, 4)}
    mask = sorted(block | {(20, 20)})
    df = spark.createDataFrame(mask, "gx long, gy long")

    def run(op):
        return {(r.gx, r.gy)
                for r in tiles_sink.morphology_mask(df, op=op, radius=1).collect()}

    src = set(mask)
    se = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]

    def dil(s):
        return {(x + dx, y + dy) for (x, y) in s for dx, dy in se}

    def ero(s):
        return {(x, y) for (x, y) in dil(s)  # candidate support
                if all((x + dx, y + dy) in s for dx, dy in se)}

    assert run("dilate") == dil(src)
    assert run("erode") == ero(src)
    close, open_ = run("close"), run("open")
    assert close == ero(dil(src)) and open_ == dil(ero(src))
    assert close >= src and open_ <= src       # extensive / anti-extensive
    assert (4, 4) in close                     # pinhole filled
    assert (20, 20) not in open_               # speckle removed
    assert (20, 20) in close                   # closing keeps isolated cells


def test_label_blobs_planted(spark):
    """CCL on planted masks: 8-conn merges diagonal chains, 4-conn
    splits them; blob ids are the lexicographically first cell; stats
    match a slow flood fill."""
    from geodesk_spark.operators import tiles_sink

    cells = [(1, 1), (1, 2), (2, 2), (3, 3), (10, 10), (11, 11), (20, 5)]
    df = spark.createDataFrame(cells, "gx long, gy long")

    def flood(conn):
        offs = ([(1, 0), (0, 1), (1, 1), (1, -1)] if conn == 8
                else [(1, 0), (0, 1)])
        offs = offs + [(-dx, -dy) for dx, dy in offs]
        left = set(cells)
        blobs = []
        while left:
            seed = min(left)
            comp, frontier = {seed}, [seed]
            while frontier:
                x, y = frontier.pop()
                for dx, dy in offs:
                    q = (x + dx, y + dy)
                    if q in left and q not in comp:
                        comp.add(q)
                        frontier.append(q)
            left -= comp
            xs = [c[0] for c in comp]
            ys = [c[1] for c in comp]
            blobs.append((min(comp)[0] * (1 << 32) + min(comp)[1], len(comp),
                          min(xs), min(ys), max(xs), max(ys)))
        return sorted(blobs)

    for conn in (8, 4):
        got = sorted(
            (r.blob_id, r.n_cells, r.gx0, r.gy0, r.gx1, r.gy1)
            for r in tiles_sink.label_blobs(df, connectivity=conn).collect()
        )
        assert got == flood(conn), conn


def test_concave_footprint_closed_loops(spark):
    """Composition law: boundary edges of a CLOSED mask form closed
    directed loops — every vertex's out-degree equals its in-degree —
    and closing first never leaves the pinhole's boundary behind."""
    from collections import Counter

    from geodesk_spark.operators import tiles_sink

    block = [(x, y) for x in range(6) for y in range(6) if (x, y) != (3, 3)]
    df = spark.createDataFrame(block, "gx long, gy long")

    raw = tiles_sink.cells_boundary_edges(df).collect()
    closed = tiles_sink.cells_boundary_edges(
        tiles_sink.morphology_mask(df, op="close", radius=1)
    ).collect()

    def degrees_balanced(edges):
        outs = Counter((e.x1, e.y1) for e in edges)
        ins = Counter((e.x2, e.y2) for e in edges)
        return outs == ins

    assert degrees_balanced(raw) and degrees_balanced(closed)
    # raw mask has the outer ring + the pinhole ring; closing seals the
    # pinhole, leaving strictly fewer boundary edges (just the outline)
    assert len(closed) < len(raw)
    assert len(closed) == 24  # 6x6 outline = 4 * 6 unit edges
