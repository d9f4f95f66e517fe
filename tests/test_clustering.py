"""Exact DBSCAN vs an O(n^2) union-find brute force with the same
deterministic labeling rule (component label = min core id, border = min
core-neighbor label, noise = -1)."""

import numpy as np

from geodesk_spark.operators import clustering


def _brute_dbscan(pts, eps, min_pts):
    ids = sorted(pts)
    eps2 = eps * eps
    nbrs = {
        i: [
            j
            for j in ids
            if j != i
            and (pts[i][0] - pts[j][0]) ** 2 + (pts[i][1] - pts[j][1]) ** 2 <= eps2
        ]
        for i in ids
    }
    core = {i for i in ids if len(nbrs[i]) + 1 >= min_pts}
    parent = {i: i for i in core}

    def find(i):
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    for i in core:
        for j in nbrs[i]:
            if j in core:
                a, b = find(i), find(j)
                if a != b:
                    parent[max(a, b)] = min(a, b)
    comp_min = {}
    for i in core:
        r = find(i)
        comp_min[r] = min(comp_min.get(r, i), i)
    out = {}
    for i in ids:
        if i in core:
            out[i] = (comp_min[find(i)], 1)
        else:
            labs = [comp_min[find(j)] for j in nbrs[i] if j in core]
            out[i] = (min(labs) if labs else -1, 0)
    return out


def _random_points(seed, n=120, spread=60):
    """Clustered + uniform mix so all three point classes occur."""
    rng = np.random.default_rng(seed)
    pts = {}
    i = 0
    for _ in range(5):  # dense blobs
        cx, cy = rng.integers(-spread, spread, 2)
        for _ in range(12):
            pts[i] = (int(cx + rng.integers(-3, 4)), int(cy + rng.integers(-3, 4)))
            i += 1
    while i < n:  # sparse background
        pts[i] = (int(rng.integers(-spread, spread)), int(rng.integers(-spread, spread)))
        i += 1
    return pts


def test_dbscan_matches_bruteforce(spark):
    pts = _random_points(31)
    df = spark.createDataFrame(
        [(i, x, y) for i, (x, y) in pts.items()], "id long, x long, y long"
    )
    got = {
        r["id"]: (r["label"], r["is_core"])
        for r in clustering.dbscan(df, eps=4, min_pts=4).collect()
    }
    assert got == _brute_dbscan(pts, 4, 4)
    # all three classes actually present in the fixture
    labs = set(v[0] for v in got.values())
    assert -1 in labs and len(labs) > 2
    assert any(c == 0 and l != -1 for l, c in got.values())  # border exists


def test_dbscan_minpts1_is_eps_components(spark):
    """min_pts=1: every point core, clusters = eps-graph components."""
    pts = {1: (0, 0), 2: (3, 0), 3: (6, 0), 4: (100, 0)}
    df = spark.createDataFrame(
        [(i, x, y) for i, (x, y) in pts.items()], "id long, x long, y long"
    )
    got = {r["id"]: r["label"] for r in clustering.dbscan(df, eps=3, min_pts=1).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 4}


def test_neighbor_pairs_exact_at_cell_borders(spark):
    """Pairs straddling cell boundaries at distance exactly eps are kept;
    one unit farther is dropped (<= semantics, exact int64)."""
    df = spark.createDataFrame(
        [(1, 0, 0), (2, 5, 0), (3, 6, 0), (4, 3, 4)], "id long, x long, y long"
    )
    pairs = {
        (r["id_a"], r["id_b"])
        for r in clustering.neighbor_pairs(df, eps=5).collect()
    }
    assert (1, 2) in pairs and (2, 1) in pairs  # d = 5 = eps
    assert (1, 4) in pairs  # 3-4-5 triangle, d = 5
    assert (1, 3) not in pairs  # d = 6
    assert (2, 3) in pairs


def test_connected_components_long_chain_converges(spark):
    """A 200-vertex path graph: pure min-propagation would need 200
    rounds (far past max_iter); star contraction must close it in ~log
    rounds."""
    from geodesk_spark.operators import dedup

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(200)], "doc_a long, doc_b long"
    )
    got = {r["doc_id"]: r["comp_id"] for r in dedup.connected_components(edges).collect()}
    assert got == {i: 0 for i in range(201)}


def test_stdbscan_matches_bruteforce(spark):
    """ST-DBSCAN: the time window must both split spatially-coincident
    points and keep the spatial semantics intact."""
    rng = np.random.default_rng(47)
    pts = {}
    i = 0
    for burst_t in (0, 1000, 2000):  # same blob revisited at 3 epochs
        for _ in range(8):
            pts[i] = (int(rng.integers(-3, 4)), int(rng.integers(-3, 4)), burst_t + int(rng.integers(0, 50)))
            i += 1
    while i < 40:  # scattered background
        pts[i] = (int(rng.integers(-40, 40)), int(rng.integers(-40, 40)), int(rng.integers(0, 2100)))
        i += 1
    eps, eps_t, mp = 4, 100, 4
    df = spark.createDataFrame(
        [(k, x, y, t) for k, (x, y, t) in pts.items()], "id long, x long, y long, t long"
    )
    got = {
        r["id"]: (r["label"], r["is_core"])
        for r in clustering.dbscan(
            df, eps=eps, min_pts=mp, t_col="t", eps_t=eps_t
        ).collect()
    }
    # brute with the space-time neighborhood
    ids = sorted(pts)
    nbrs = {
        i: [
            j
            for j in ids
            if j != i
            and (pts[i][0] - pts[j][0]) ** 2 + (pts[i][1] - pts[j][1]) ** 2 <= eps * eps
            and abs(pts[i][2] - pts[j][2]) <= eps_t
        ]
        for i in ids
    }
    core = {i for i in ids if len(nbrs[i]) + 1 >= mp}
    parent = {i: i for i in core}

    def find(i):
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    for i in core:
        for j in nbrs[i]:
            if j in core:
                a, b = find(i), find(j)
                if a != b:
                    parent[max(a, b)] = min(a, b)
    comp_min = {}
    for i in core:
        r = find(i)
        comp_min[r] = min(comp_min.get(r, i), i)
    exp = {}
    for i in ids:
        if i in core:
            exp[i] = (comp_min[find(i)], 1)
        else:
            labs = [comp_min[find(j)] for j in nbrs[i] if j in core]
            exp[i] = (min(labs) if labs else -1, 0)
    assert got == exp
    # the three temporal bursts of the SAME blob form >= 3 distinct clusters
    burst_labels = {got[k][0] for k in range(24) if got[k][0] != -1}
    assert len(burst_labels) >= 3


def test_dbscan_invariant_under_partitioning_and_order(spark):
    """Labels are a pure function of the SET of points: reshuffled row
    order + different partitioning must give identical output (the
    determinism classic DBSCAN lacks)."""
    pts = _random_points(71)
    rows = [(i, x, y) for i, (x, y) in pts.items()]
    a = spark.createDataFrame(rows, "id long, x long, y long")
    b = spark.createDataFrame(rows[::-1], "id long, x long, y long").repartition(7)
    ra = {(r["id"], r["label"], r["is_core"]) for r in clustering.dbscan(a, 4, 4).collect()}
    rb = {(r["id"], r["label"], r["is_core"]) for r in clustering.dbscan(b, 4, 4).collect()}
    assert ra == rb


def test_connected_components_string_ids(spark):
    """Doc ids may be strings (the image pipeline's img… ids): comp_id
    is the lexicographic min; convergence must not rely on numeric ops."""
    from geodesk_spark.operators import dedup

    edges = spark.createDataFrame(
        [("img_b", "img_a"), ("img_b", "img_c"), ("img_x", "img_y")],
        "doc_a string, doc_b string",
    )
    got = {r["doc_id"]: r["comp_id"] for r in dedup.connected_components(edges).collect()}
    assert got == {
        "img_a": "img_a", "img_b": "img_a", "img_c": "img_a",
        "img_x": "img_x", "img_y": "img_x",
    }


def test_geo_medoid_matches_bruteforce(spark):
    """Exact integer-d2 argmin per group with min-id ties, vs brute."""
    rng = np.random.default_rng(83)
    rows = [
        (int(i % 5), i, int(rng.integers(-1000, 1000)), int(rng.integers(-1000, 1000)))
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "gid long, id long, x long, y long")
    got = {
        r["gid"]: (r["medoid_id"], r["n_members"])
        for r in clustering.geo_medoid_per_group(df).collect()
    }
    groups = {}
    for g, i, x, y in rows:
        groups.setdefault(g, []).append((i, x, y))
    exp = {}
    for g, mem in groups.items():
        best = min(
            mem,
            key=lambda m: (
                sum((m[1] - x) ** 2 + (m[2] - y) ** 2 for _, x, y in mem),
                m[0],
            ),
        )
        exp[g] = (best[0], len(mem))
    assert got == exp
    # the md5 cap keeps one mega-group from going quadratic but still
    # returns a medoid from the capped subset
    capped = {
        r["gid"]: r["n_members"]
        for r in clustering.geo_medoid_per_group(df, max_group=4).collect()
    }
    assert set(capped) == set(exp) and all(v == 12 for v in capped.values())
