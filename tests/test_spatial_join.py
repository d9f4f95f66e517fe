"""Three-band PIP join + distance filter + kNN vs brute-force numpy."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from geodesk_spark.geo import mercator, pip
from geodesk_spark.operators import knn as knn_mod, spatial_join, tiling
from geodesk_spark.sources import synth


@pytest.fixture(scope="module")
def world(spark):
    df = synth.images_df(spark, 20_000, with_bytes=False, partitions=8)
    df = tiling.with_point_tiles(tiling.with_imp_coords(df)).cache()
    pdf = df.select("image_id", "lon", "lat", "x", "y").toPandas()
    yield df, pdf
    df.unpersist()


@pytest.fixture(scope="module")
def layer():
    return synth.polygon_layer()


def test_contains_points_matches_bruteforce(world, layer):
    df, pdf = world
    prepared = spatial_join.prepare_layer(layer)
    got = (
        spatial_join.contains_points(df, prepared, keep_cols=["image_id"])
        .toPandas()
    )
    got_set = set(map(tuple, got[["image_id", "poly_id"]].to_numpy().tolist()))

    x = pdf["x"].to_numpy(dtype=np.float64)
    y = pdf["y"].to_numpy(dtype=np.float64)
    exp_set = set()
    for p in layer:
        rings = pip.unpack_rings(p["rings"])
        inside = pip.points_in_polygon(x, y, rings)
        for iid in pdf["image_id"].to_numpy()[inside]:
            exp_set.add((iid, p["poly_id"]))
    assert got_set == exp_set
    assert len(got_set) > 100  # hot cities guarantee plenty of matches


def test_disjoint_anti_join(world, layer):
    df, pdf = world
    prepared = spatial_join.prepare_layer(layer)
    n_total = len(pdf)
    matched = (
        spatial_join.contains_points(df, prepared, keep_cols=["image_id"])
        .select("image_id").distinct().count()
    )
    anti = spatial_join.contains_points(df, prepared, keep_cols=["image_id"], anti=True).count()
    assert anti == n_total - matched


def test_within_distance(world):
    df, pdf = world
    lon, lat, radius = 139.69, 35.69, 25_000.0  # 25 km around Tokyo
    got = spatial_join.within_distance(df, lon, lat, radius, keep_cols=["image_id"]).toPandas()

    qx = float(mercator.x_from_lon(lon)[()])
    qy = float(mercator.y_from_lat(lat)[()])
    d = mercator.distance(pdf["x"].to_numpy(np.float64), pdf["y"].to_numpy(np.float64), qx, qy)
    exp = set(pdf["image_id"].to_numpy()[d <= radius])
    assert set(got["image_id"]) == exp
    assert len(exp) > 50
    assert np.allclose(np.sort(got["dist_m"].to_numpy()), np.sort(d[d <= radius]))


def test_knn_matches_bruteforce(world):
    df, pdf = world
    queries = [("q_tokyo", 139.7, 35.7), ("q_paris", 2.3, 48.9), ("q_ocean", -140.0, -30.0)]
    k = 10
    got = knn_mod.knn(df, queries, k=k).toPandas()

    x = pdf["x"].to_numpy(np.float64)
    y = pdf["y"].to_numpy(np.float64)
    ids = pdf["image_id"].to_numpy()
    for qid, lon, lat in queries:
        qx = float(mercator.x_from_lon(lon)[()])
        qy = float(mercator.y_from_lat(lat)[()])
        d = mercator.distance(x, y, qx, qy)
        order = np.lexsort((ids, d))[:k]
        exp = list(ids[order])
        sub = got[got["query_id"] == qid].sort_values("rank")
        assert list(sub["image_id"]) == exp, qid


def _ngon_layer(n_polys: int, n_verts: int) -> list[dict]:
    """Many detailed polygons: regular n-gons on a lon/lat grid."""
    polys = []
    for i in range(n_polys):
        lon = -150 + (i % 20) * 15.0
        lat = -60 + (i // 20) * 25.0
        cx = float(mercator.x_from_lon(lon)[()])
        cy = float(mercator.y_from_lat(lat)[()])
        ang = np.arange(n_verts) * (2 * np.pi / n_verts)
        r = 40_000_000 * (1 + 0.1 * np.sin(5 * ang + i))
        ring = np.stack([cx + r * np.cos(ang), cy + r * np.sin(ang)], axis=1)
        ring = np.vstack([ring, ring[:1]]).astype(np.float64)
        polys.append(dict(poly_id=f"ngon_{i}", rings=pip.pack_rings([ring])))
    return polys


def test_jvm_auto_switch_identical(world, monkeypatch):
    """Vertex-budget auto-switch (VERDICT r01 #5): above JVM_SEG_BUDGET the
    join must drop the literal-segment plan for the Arrow kernel, with
    identical output; the auto plan must not embed the segment map."""
    df, _ = world
    pts = df.select("image_id", "x", "y").limit(4000)
    layer = _ngon_layer(12, 60)  # 720 segments
    prepared = spatial_join.prepare_layer(layer)
    monkeypatch.setattr(spatial_join, "JVM_SEG_BUDGET", 500)

    auto = spatial_join.contains_points(pts, prepared, keep_cols=["image_id"])
    forced = spatial_join.contains_points(pts, prepared, keep_cols=["image_id"], jvm_exact=True)
    got_auto = set(map(tuple, auto.toPandas()[["image_id", "poly_id"]].to_numpy().tolist()))
    got_jvm = set(map(tuple, forced.toPandas()[["image_id", "poly_id"]].to_numpy().tolist()))
    assert got_auto == got_jvm and len(got_auto) > 0
    # the auto plan fell back to the kernel: no giant map literal
    auto_plan = auto._jdf.queryExecution().executedPlan().toString()
    forced_plan = forced._jdf.queryExecution().executedPlan().toString()
    assert "map(" not in auto_plan and "MapInPandas" in auto_plan
    assert len(auto_plan) < len(forced_plan)


def test_knn_many_queries_bounded(world):
    """≥100 concurrent queries: the expansion loop stays bounded and every
    query returns exactly k exact neighbours (spot-checked vs brute force)."""
    df, pdf = world
    rng = np.random.default_rng(3)
    queries = [
        (f"q{i}", float(rng.uniform(-170, 170)), float(rng.uniform(-60, 60)))
        for i in range(120)
    ]
    k = 3
    got = knn_mod.knn(df, queries, k=k).toPandas()
    assert len(got) == len(queries) * k
    assert got.groupby("query_id")["rank"].max().eq(k).all()
    x = pdf["x"].to_numpy(np.float64)
    y = pdf["y"].to_numpy(np.float64)
    ids = pdf["image_id"].to_numpy()
    for qid, lon, lat in queries[::17]:
        qx = float(mercator.x_from_lon(lon)[()])
        qy = float(mercator.y_from_lat(lat)[()])
        d = mercator.distance(x, y, qx, qy)
        exp = list(ids[np.lexsort((ids, d))[:k]])
        sub = got[got["query_id"] == qid].sort_values("rank")
        assert list(sub["image_id"]) == exp, qid


def test_knn_join_matches_bruteforce(world):
    """Table×table kNN join: DataFrame query side, exact vs brute force —
    includes an ocean query to force the distributed re-expansion path."""
    df, pdf = world
    queries = [("q_tokyo", 139.7, 35.7), ("q_paris", 2.3, 48.9), ("q_ocean", -140.0, -30.0)]
    k = 10
    spark = df.sparkSession
    qrows = [
        (qid, int(mercator.x_from_lon(lon)[()]), int(mercator.y_from_lat(lat)[()]))
        for qid, lon, lat in queries
    ]
    qdf = spark.createDataFrame(qrows, "query_id string, x long, y long")
    got = knn_mod.knn_join(df.select("image_id", "x", "y"), qdf, k=k).toPandas()
    assert len(got) == len(queries) * k

    x = pdf["x"].to_numpy(np.float64)
    y = pdf["y"].to_numpy(np.float64)
    ids = pdf["image_id"].to_numpy()
    for qid, lon, lat in queries:
        qx = float(mercator.x_from_lon(lon)[()])
        qy = float(mercator.y_from_lat(lat)[()])
        d = mercator.distance(x, y, qx, qy)
        exp = list(ids[np.lexsort((ids, d))[:k]])
        sub = got[got["query_id"] == qid].sort_values("rank")
        assert list(sub["image_id"]) == exp, qid


def test_knn_join_matches_knn(world):
    """knn_join (DataFrame query side) must agree row-for-row with the
    driver-list knn() on an identical query set, including re-expansion."""
    df, _ = world
    rng = np.random.default_rng(11)
    queries = [
        (f"q{i}", float(rng.uniform(-170, 170)), float(rng.uniform(-60, 60)))
        for i in range(60)
    ]
    k = 4
    spark = df.sparkSession
    qdf = spark.createDataFrame(
        [
            (qid, int(mercator.x_from_lon(lon)[()]), int(mercator.y_from_lat(lat)[()]))
            for qid, lon, lat in queries
        ],
        "query_id string, x long, y long",
    )
    pts = df.select("image_id", "x", "y")
    a = knn_mod.knn(pts, queries, k=k).toPandas()
    b = knn_mod.knn_join(pts, qdf, k=k).toPandas()
    key = ["query_id", "rank"]
    a = a.sort_values(key).reset_index(drop=True)
    b = b.sort_values(key).reset_index(drop=True)
    assert list(a["image_id"]) == list(b["image_id"])
    assert np.allclose(a["dist_m"].to_numpy(), b["dist_m"].to_numpy())


def test_knn_join_shuffle_path(world):
    """broadcast_queries=False (the huge-query-side path) returns the
    identical result through a shuffle join."""
    df, pdf = world
    spark = df.sparkSession
    qdf = spark.createDataFrame(
        [("qa", int(mercator.x_from_lon(139.7)[()]), int(mercator.y_from_lat(35.7)[()]))],
        "query_id string, x long, y long",
    )
    pts = df.select("image_id", "x", "y")
    a = knn_mod.knn_join(pts, qdf, k=5).toPandas().sort_values("rank")
    b = (
        knn_mod.knn_join(pts, qdf, k=5, broadcast_queries=False)
        .toPandas()
        .sort_values("rank")
    )
    assert list(a["image_id"]) == list(b["image_id"])


def test_knn_join_k_exceeds_points(spark):
    """k larger than the point count: the world-window round must return
    every point (rank ≤ n) instead of looping or dropping the query."""
    pts = spark.createDataFrame(
        [("a", 10, 10), ("b", 500_000, -20), ("c", -300_000, 9_000)],
        "image_id string, x long, y long",
    )
    qdf = spark.createDataFrame([("q", 0, 0)], "query_id string, x long, y long")
    got = knn_mod.knn_join(pts, qdf, k=10).toPandas().sort_values("rank")
    # by exact distance: a (~14 imps), c (~300k imps), b (500k imps)
    assert list(got["image_id"]) == ["a", "c", "b"]
    assert list(got["rank"]) == [1, 2, 3]


def test_knn_join_empty_queries(spark):
    pts = spark.createDataFrame([("a", 0, 0)], "image_id string, x long, y long")
    qdf = spark.createDataFrame([], "query_id string, x long, y long")
    out = knn_mod.knn_join(pts, qdf, k=3)
    assert out.count() == 0
    assert set(out.columns) == {"image_id", "query_id", "dist_m", "rank"}


def test_knn_assert_unique_ids(spark):
    dup = spark.createDataFrame(
        [("a", 0, 0), ("a", 5, 5), ("b", 9, 9)], "image_id string, x int, y int"
    )
    with pytest.raises(ValueError, match="duplicate"):
        knn_mod.knn(dup, [("q", 0.0, 0.0)], k=1, assert_unique_ids=True)


def test_bbox_query_pushdown(world):
    df, _ = world
    q = spatial_join.bbox_query(df.select("image_id", "x", "y"), 0, 0, 1 << 28, 1 << 28)
    plan = q._jdf.queryExecution().executedPlan().toString()
    # The bbox predicate must sit in the scan stage, not behind an exchange.
    assert "Exchange" not in plan


def test_snap_to_segments_bruteforce(world):
    """The bbox+slack prefilter must never drop the true argmin segment:
    full numpy brute force over every (point, segment) pair."""
    df, pdf = world
    rng = np.random.default_rng(11)
    n_seg = 60
    sx1 = rng.integers(-2_000_000_000, 2_000_000_000, n_seg)
    sy1 = rng.integers(-1_500_000_000, 1_500_000_000, n_seg)
    sx2 = sx1 + rng.integers(-(1 << 24), 1 << 24, n_seg)
    sy2 = sy1 + rng.integers(-(1 << 24), 1 << 24, n_seg)
    sx2[0], sy2[0] = sx1[0], sy1[0]  # one degenerate (point) segment
    segs = df.sparkSession.createDataFrame(
        [(int(i), int(sx1[i]), int(sy1[i]), int(sx2[i]), int(sy2[i])) for i in range(n_seg)],
        "seg_id long, x1 long, y1 long, x2 long, y2 long",
    )
    meters = 900_000.0
    got = {
        r["image_id"]: (r["seg_id"], r["t"], r["dist_m"])
        for r in knn_mod.snap_to_segments(
            df.limit(3000), segs, meters, point_id="image_id"
        ).collect()
    }

    px = pdf["x"].to_numpy()[:3000].astype(np.float64)
    py = pdf["y"].to_numpy()[:3000].astype(np.float64)
    ids = pdf["image_id"].to_numpy()[:3000]
    abx = (sx2 - sx1).astype(np.float64)
    aby = (sy2 - sy1).astype(np.float64)
    len2 = abx * abx + aby * aby
    n_checked = 0
    for i in range(len(px)):
        apx = px[i] - sx1
        apy = py[i] - sy1
        dot = apx * abx + apy * aby
        t = np.where(len2 == 0, 0.0, np.clip(np.divide(dot, np.where(len2 == 0, 1, len2)), 0, 1))
        cx = sx1 + t * abx
        cy = sy1 + t * aby
        d = mercator.distance(px[i], py[i], cx, cy)
        j = int(np.argmin(d))
        if d[j] <= meters:
            n_checked += 1
            want = (j, float(t[j]), float(d[j]))
            have = got[ids[i]]
            assert have[0] == want[0], (ids[i], have, want)
            assert abs(have[1] - want[1]) < 1e-9
            assert abs(have[2] - want[2]) < 1e-6 * max(1.0, want[2])
        else:
            assert ids[i] not in got
    assert n_checked > 20  # the radius actually matched a useful subset


def test_idw_interpolate_matches_numpy_fold(world):
    """IDW = rank-ordered 1/d² folds over the exact kNN set; bit-compared
    against the same fold in numpy, plus the exact-hit guard."""
    df, pdf = world
    val = (F.crc32(F.col("image_id")) % 1000).cast("double")
    pts = df.withColumn("val", val)
    queries = [("q_tokyo", 139.7, 35.7), ("q_paris", 2.3, 48.9)]
    k = 6
    got = {
        r["query_id"]: (r["idw_value"], r["n_samples"])
        for r in knn_mod.idw_interpolate(pts, queries, k=k, val_col="val").collect()
    }
    vals = {r["image_id"]: float(r["val"]) for r in pts.select("image_id", "val").collect()}
    x = pdf["x"].to_numpy(np.float64)
    y = pdf["y"].to_numpy(np.float64)
    ids = pdf["image_id"].to_numpy()
    for qid, lon, lat in queries:
        qxi = int(mercator.x_from_lon(lon)[()])
        qyi = int(mercator.y_from_lat(lat)[()])
        d = mercator.distance(x, y, float(qxi), float(qyi))
        order = np.lexsort((ids, d))[:k]
        num = den = 0.0
        for i in order:  # rank order, same fold
            dx = float(int(x[i]) - qxi)
            dy = float(int(y[i]) - qyi)
            d2 = max(dx * dx + dy * dy, 1.0)
            num += vals[ids[i]] / d2
            den += 1.0 / d2
        assert got[qid][1] == k
        assert got[qid][0] == num / den, qid


def test_idw_exact_hit_dominates(spark):
    """A sample exactly ON the query point gets weight 1/1 and must pull
    the estimate to (almost) its own value."""
    lon, lat = 10.0, 20.0
    qx = int(mercator.x_from_lon(lon)[()])
    qy = int(mercator.y_from_lat(lat)[()])
    rows = [("hit", qx, qy, 500.0)] + [
        (f"far{i}", qx + 2_000_000 + i, qy, 1.0) for i in range(4)
    ]
    df = spark.createDataFrame(rows, "image_id string, x long, y long, val double")
    [r] = knn_mod.idw_interpolate(df, [("q", lon, lat)], k=5, val_col="val").collect()
    assert abs(r["idw_value"] - 500.0) < 1e-3


def test_route_measure_along_polyline(spark):
    """Measures accumulate exactly along an equatorial 3-segment route;
    points at a shared vertex tie-break to the lower seq segment."""
    from geodesk_spark.operators import knn as knn_mod

    # 3 equal segments along the equator (y=0): scale=cosh(0)=1, so
    # meters-per-imp is the exact constant EC/W.
    L = 1 << 20
    segs = spark.createDataFrame(
        [(7, 1, 0, 0, L, 0), (7, 2, L, 0, 2 * L, 0), (7, 3, 2 * L, 0, 3 * L, 0)],
        "route_id long, seq long, x1 long, y1 long, x2 long, y2 long",
    )
    pts = spark.createDataFrame(
        [(1, L // 2, 1000),    # mid segment 1
         (2, L, -1000),        # exactly at the shared vertex of seq 1/2
         (3, 3 * L, 0)],       # route end
        "key long, x long, y long",
    )
    out = {r["key"]: r for r in
           knn_mod.route_measure(pts, segs, 100_000.0, point_id="key").collect()}
    from geodesk_spark.geo import mercator
    seg_m = float(mercator.distance(0, 0, L, 0)[()])
    seg_um = int(seg_m * 1e6 + 0.5)
    assert out[1]["seq"] == 1 and out[1]["t_micro"] == 500_000
    assert out[1]["measure_um"] == int(0.5 * seg_um + 0.5)
    # vertex tie: dist equal on seq 1 (t=1) and seq 2 (t=0) -> lower seg_id
    assert out[2]["seq"] == 1 and out[2]["t_micro"] == 1_000_000
    assert out[2]["measure_um"] == seg_um
    assert out[3]["seq"] == 3 and out[3]["measure_um"] == 3 * seg_um


def test_flagship_plan_shape_regression(spark, tmp_path):
    """Pin the flagship pipeline's physical plan — the engine's headline
    scale claims as hard asserts, so a regression (an accidental
    shuffle, a Python worker in the hot path, a lost broadcast) fails
    CI instead of silently costing 10x at 100 TB:
    - ZERO shuffle Exchange before the rollup (one fact-side pass),
    - the polygon band table arrives by BroadcastExchange into a
      BroadcastHashJoin,
    - no BatchEvalPython / ArrowEvalPython / MapInPandas / FlatMapsInPandas
      nodes anywhere (100% JVM whole-stage codegen)."""
    import re

    from geodesk_spark.operators import spatial_join, tiling
    from geodesk_spark.sources import synth

    path = str(tmp_path / "imgs")
    synth.images_df(spark, 20_000, with_bytes=False, partitions=4).write.parquet(path)
    prepared = spatial_join.prepare_layer(synth.polygon_layer())
    imgs = spark.read.parquet(path)
    pts = tiling.with_point_tiles(tiling.with_imp_coords(imgs))
    joined = spatial_join.contains_points(
        pts.select("image_id", "x", "y", "cell"), prepared,
        keep_cols=["image_id", "cell"],
    )
    plan = spark._jvm.PythonSQLUtils.explainString(
        joined._jdf.queryExecution(), "formatted"
    )
    nodes = re.findall(r"\(\d+\) ([A-Za-z]+)", plan)
    assert "BroadcastHashJoin" in nodes and "BroadcastExchange" in nodes
    assert "Exchange" not in nodes  # shuffle-free: only BroadcastExchange
    for py_node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas",
                    "FlatMapGroupsInPandas"):
        assert py_node not in nodes, py_node
    # the projection must prune to the three columns the kernel needs
    assert re.search(r"ReadSchema: struct<image_id:string,lon:double,lat:double>", plan)
