"""kNN over point features via cell-ring expansion (BASELINE north_star).

The reference's nearest-neighbour surface is ``maxMetersFromXY`` — a
radius filter (PointDistanceFilter.java:28-122).  kNN is built on the
same primitive the way the north star prescribes: expand a square
candidate window of pyramid cells around each query point until the
k-th neighbour is provably inside the window, then take the top-k by
exact Mercator-scaled distance.

Window → cells uses the SAME pyramid the tiling layer uses: the zoom
level adapts so a window never enumerates more than ~32×32 cells —
dense areas search a handful of z12 cells, ocean queries escalate to
z10/z8/… exactly like the reference's sparse tile tree keeps per-level
fan-out bounded (TileIndexWalker.java:85-107).

Spark shape (no per-query scans):

1. Driver: per-query candidate cell set from int math (cheap).
2. Broadcast the (cell, query, in-small-window) table; candidates are
   a pure-JVM broadcast hash join against the point's exploded pyramid
   cell ids, exact Mercator distance as a codegen'd column — no Python
   workers anywhere.
3. ``Window.partitionBy(query_id).orderBy(dist)`` + row_number ≤ k;
   the shuffle moves only ring-bounded candidate rows.
4. Queries whose k-th distance is NOT provably inside their window
   double the window and re-run (only those queries).

Acceptance proof: all points within Chebyshev radius ``radius_imps``
of (qx,qy) are candidates, so if kth_dist_m ≤ radius_imps × (min
meters-per-imp anywhere in the window), the top-k is exact.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F, types as T_

from geodesk_spark.geo import mercator, tile as T

I32_MAX = (1 << 31) - 1
I32_MIN = -(1 << 31)


def _window_zoom(radius_imps: int, max_per_axis: int = 32) -> int:
    """Pyramid-adaptive zoom: coarsen until the window spans ≤max cells/axis."""
    zoom = T.MAX_ZOOM
    while zoom > 0 and ((2 * radius_imps) >> (32 - zoom)) + 1 > max_per_axis:
        zoom -= 2  # pyramid steps of 2, like the default level set
    return zoom


def _cells_at_zoom(qx: int, qy: int, radius_imps: int, zoom: int) -> np.ndarray:
    x0, x1 = max(qx - radius_imps, I32_MIN), min(qx + radius_imps, I32_MAX)
    y0, y1 = max(qy - radius_imps, I32_MIN), min(qy + radius_imps, I32_MAX)
    c0, c1 = int(T.column_from_x(x0, zoom)[()]), int(T.column_from_x(x1, zoom)[()])
    r0, r1 = int(T.row_from_y(y1, zoom)[()]), int(T.row_from_y(y0, zoom)[()])
    cols = np.arange(c0, c1 + 1, dtype=np.int64)
    rows = np.arange(r0, r1 + 1, dtype=np.int64)
    cc, rr = np.meshgrid(cols, rows)
    return ((zoom << 24) | (rr.ravel() << 12) | cc.ravel()).astype(np.int64)


def _guarantee_m(qy: int, radius_imps: int) -> float:
    """Max distance provably covered: radius × min meters/imp in the window."""
    ys = [max(qy - radius_imps, I32_MIN), min(qy + radius_imps, I32_MAX)]
    m_per_imp = min(float(mercator.meters_at_y(y)[()]) for y in ys)
    return radius_imps * m_per_imp


def knn(
    points: DataFrame,
    queries: list[tuple[str, float, float]],
    k: int,
    init_radius_imps: int | str = "auto",
    id_col: str = "image_id",
    assert_unique_ids: bool = False,
    n_points: int | None = None,
) -> DataFrame:
    """queries: [(query_id, lon, lat), ...] → (query_id, id, dist_m, rank).

    The interactive front end of :func:`knn_join`: the query list is
    projected to imp coordinates and handed to the distributed
    table×table join, so BOTH entry points share one engine — no
    per-query driver state anywhere (r02 carried a second, driver-loop
    implementation here; ``test_knn_join_matches_knn`` pinned the two
    row-for-row equal before it was removed).

    ``id_col`` must be unique per point — it is the deterministic
    tie-break for equal distances.  Pass ``assert_unique_ids=True`` to
    pay one aggregate up front and fail fast on duplicates (off by
    default: the check is a full shuffle of the fact table).
    """
    spark = points.sparkSession
    if assert_unique_ids:
        dup = (
            points.groupBy(id_col).count().filter(F.col("count") > 1).limit(1).count()
        )
        if dup:
            raise ValueError(f"knn: id column {id_col!r} has duplicate values")
    qrows = [
        (qid, int(mercator.x_from_lon(lon)[()]), int(mercator.y_from_lat(lat)[()]))
        for qid, lon, lat in queries
    ]
    qdf = spark.createDataFrame(qrows, "query_id string, x long, y long")
    return knn_join(
        points, qdf, k, init_radius_imps=init_radius_imps, id_col=id_col,
        n_points=n_points,
    ).select("query_id", id_col, "dist_m", "rank")


def _guarantee_col(qy_col, radius: int):
    """Column form of :func:`_guarantee_m`: max distance provably covered
    by the Chebyshev window of ``radius`` imps around a query row at
    projected latitude ``qy_col`` — radius × the minimum meters-per-imp
    anywhere in the window (scale is monotone in |y|, so the min is at
    one of the two clamped y endpoints)."""
    F_ = F
    mpi0 = F_.lit(mercator.EARTH_CIRCUMFERENCE / mercator.MAP_WIDTH)
    y_lo = F_.greatest(qy_col - F_.lit(radius), F_.lit(I32_MIN)).cast("double")
    y_hi = F_.least(qy_col + F_.lit(radius), F_.lit(I32_MAX)).cast("double")
    mpi = F_.least(mpi0 / mercator.scale_col(y_lo), mpi0 / mercator.scale_col(y_hi))
    return F_.lit(float(radius)) * mpi


def _auto_radius(points: DataFrame, k: int, n_points: int | None = None) -> int:
    """Density-derived initial window radius (VERDICT r03 #2): size the
    Chebyshev window so a globally-uniform corpus puts ~6k points inside
    it — E[pts in (2r)²] = 6k ⇒ r = W·sqrt(6k/n)/2 — so virtually every
    query completes in ROUND ONE (each extra round is a full fact scan
    + candidate window).  One column-pruned count() job up front buys
    that; locally non-uniform data (ocean/polar windows) still escalates
    through the exact guarantee, so this is a pure schedule heuristic —
    results are provably exact either way.  Clamped to [1<<18, 1<<28]:
    the floor keeps dense-city windows from degenerating below cell
    granularity, the cap keeps a near-empty corpus from starting at a
    near-world window (escalation reaches the world anyway).

    ``n_points`` skips the count() job when the caller already knows the
    corpus size (an APPROXIMATE figure is fine — the radius only needs
    order-of-magnitude density; parquet footer metadata is the free
    source)."""
    n = max(n_points if n_points is not None else points.count(), 1)
    r = int(mercator.MAP_WIDTH * float(np.sqrt(6.0 * k / n)) / 2)
    return min(max(r, 1 << 18), 1 << 28)


def knn_join(
    points: DataFrame,
    queries: DataFrame,
    k: int,
    init_radius_imps: int | str = "auto",
    id_col: str = "image_id",
    query_id: str = "query_id",
    broadcast_queries: bool = True,
    max_per_axis: int = 32,
    n_points: int | None = None,
) -> DataFrame:
    """Table×table kNN join: exact k nearest ``points`` for EVERY row of
    a DataFrame-sized query side → (id, query_id, dist_m, rank).

    The 100 TB consumer shape ("nearest POI for every image") that the
    interactive :func:`knn` cannot serve: that variant keeps per-query
    radii on the driver and ``collect()``\\ s per-round stats, capping the
    query side at driver memory and serializing rounds.  Here the query
    side stays a DataFrame end to end:

    1. Per-round, every active query shares one radius (init × 16^round),
       so the window zoom is a compile-time constant and the candidate
       cell cover is generated AS COLUMNS — two chained
       ``explode(sequence(...))`` over the clamped col/row ranges, with
       the in-small-window flag a pure range test.  No driver cell math.
    2. Candidates = one hash join on the cell id (broadcast when the
       query side is dimension-sized — ``broadcast_queries`` — else a
       shuffle join keyed on the cell), exact Mercator distance and the
       dual small/big rank computed exactly like :func:`knn`.
    3. The completion test (k-th distance provably inside the window,
       :func:`_guarantee_col`) is a per-query COLUMN over the aggregated
       stats frame; finished queries' top-k detach via localCheckpoint,
       unfinished ones re-expand — the only driver-side signal per round
       is the scalar "any queries left?".

    The radius schedule doubles-twice per probe (window r and 4r share
    one scan) and multiplies 16× per round, capping at the world window,
    so the loop is bounded at 4 rounds from the default init radius and
    every query terminates (a world window makes every point a
    candidate).  Semantics match :func:`knn` exactly: same pyramid, same
    acceptance proof, same (dist, id) deterministic tie-break.

    ``queries`` must carry (``query_id``, x, y) with imp-space coords;
    ``id_col`` must be unique per point (the tie-break).
    """
    if init_radius_imps == "auto":
        init_radius_imps = _auto_radius(points, k, n_points)
    pts = points.select(id_col, "x", "y")
    active = queries.select(
        F.col(query_id).alias("_qid"),
        F.col("x").cast("long").alias("_qx"),
        F.col("y").cast("long").alias("_qy"),
    )
    maybe_b = (lambda df: F.broadcast(df)) if broadcast_queries else (lambda df: df)

    # radius schedule: (r, 4r) per round, 16× between rounds, final round
    # capped at the world window (everything becomes a candidate)
    schedule = []
    radius = init_radius_imps
    while True:
        big = min(radius * 4, 1 << 31)
        schedule.append((radius, big))
        if big >= (1 << 31):
            break
        radius *= 16

    spark = points.sparkSession
    results: list[DataFrame] = []
    if broadcast_queries:
        # dimension-sized query side (that IS the broadcast contract): the
        # per-round control state is ≤ |queries| rows and the round output
        # ≤ k·|queries| rows, so the round's ranked top-k is collected and
        # ALL control flow (stats, completion proof, output split, next
        # active set) runs in Python — ONE Spark action per round.  The
        # distributed alternative costs ~5 control jobs/round at ~0.2-0.5s
        # fixed scheduler overhead each (measured: 3.8s → ~1.3s on the
        # interactive bench query); the table×table path below keeps the
        # fully distributed machinery because its state is table-sized.
        act_schema = active.schema
        act_rows = [(r["_qid"], r["_qx"], r["_qy"]) for r in active.collect()]
        collected_rows: list = []
    for radius, big in schedule:
        zoom = _window_zoom(big, max_per_axis)
        shift = 32 - zoom
        if broadcast_queries:
            if not act_rows:
                break
            # NB: no coalesce() here — it would block the LocalRelation
            # conversion and turn the broadcast build into a real stage
            # (measured 6× on the round's one action)
            active = spark.createDataFrame(act_rows, act_schema)

        def col_range(rad):
            x0 = F.greatest(F.col("_qx") - F.lit(rad).cast("long"), F.lit(I32_MIN).cast("long"))
            x1 = F.least(F.col("_qx") + F.lit(rad).cast("long"), F.lit(I32_MAX).cast("long"))
            return (
                F.shiftright(x0 + F.lit(1 << 31).cast("long"), shift).cast("int"),
                F.shiftright(x1 + F.lit(1 << 31).cast("long"), shift).cast("int"),
            )

        def row_range(rad):
            y0 = F.greatest(F.col("_qy") - F.lit(rad).cast("long"), F.lit(I32_MIN).cast("long"))
            y1 = F.least(F.col("_qy") + F.lit(rad).cast("long"), F.lit(I32_MAX).cast("long"))
            return (
                F.shiftright(F.lit((1 << 31) - 1).cast("long") - y1, shift).cast("int"),
                F.shiftright(F.lit((1 << 31) - 1).cast("long") - y0, shift).cast("int"),
            )

        bc0, bc1 = col_range(big)
        br0, br1 = row_range(big)
        sc0, sc1 = col_range(radius)
        sr0, sr1 = row_range(radius)
        cover = (
            active.withColumn("_row", F.explode(F.sequence(br0, br1)))
            .withColumn("_col", F.explode(F.sequence(bc0, bc1)))
            .select(
                (
                    F.lit(zoom << 24).cast("long")
                    + F.shiftleft(F.col("_row").cast("long"), 12)
                    + F.col("_col").cast("long")
                ).alias("_qcell"),
                "_qid",
                "_qx",
                "_qy",
                (
                    (F.col("_col") >= sc0)
                    & (F.col("_col") <= sc1)
                    & (F.col("_row") >= sr0)
                    & (F.col("_row") <= sr1)
                ).alias("small"),
            )
        )

        probe = pts.withColumn("_qcell", T.tile_col(F.col("x"), F.col("y"), zoom).cast("long"))
        cand = (
            probe.join(maybe_b(cover), "_qcell")
            .withColumn(
                "dist_m",
                mercator.distance_col(F.col("x"), F.col("y"), F.col("_qx"), F.col("_qy")),
            )
            .select(id_col, "_qid", "dist_m", "small")
        )
        w = Window.partitionBy("_qid").orderBy(F.col("dist_m").asc(), F.col(id_col).asc())
        ranked = (
            cand.withColumn("rank_all", F.row_number().over(w))
            .withColumn(
                "rank_small",
                F.sum(F.when(F.col("small"), 1).otherwise(0)).over(
                    w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
                ),
            )
            .filter(F.col("rank_all") <= k)
        )
        final_round = big >= (1 << 31)
        if broadcast_queries:
            rows = ranked.collect()  # the round's ONE action: ≤ k·|queries| rows
            by_q: dict = {}
            for r in rows:
                by_q.setdefault(r["_qid"], []).append(r)
            next_act = []
            for qid, qx, qy in act_rows:
                rs = by_q.get(qid, [])
                small_rows = [r for r in rs if r["small"] and r["rank_small"] <= k]
                kth_s = max((r["dist_m"] for r in small_rows), default=None)
                kth_a = max((r["dist_m"] for r in rs), default=None)
                ok_s = (
                    len(small_rows) >= k
                    and kth_s is not None
                    and kth_s <= _guarantee_m(qy, radius)
                )
                ok_a = (
                    len(rs) >= k and kth_a is not None and kth_a <= _guarantee_m(qy, big)
                )
                if ok_s:
                    collected_rows.extend(
                        (r[id_col], qid, r["dist_m"], int(r["rank_small"]))
                        for r in small_rows
                    )
                elif ok_a or final_round:
                    collected_rows.extend(
                        (r[id_col], qid, r["dist_m"], int(r["rank_all"])) for r in rs
                    )
                else:
                    next_act.append((qid, qx, qy))
            act_rows = next_act
            if final_round or not act_rows:
                break
            continue
        ranked = ranked.cache()
        stats = ranked.groupBy("_qid").agg(
            F.sum(
                F.when(F.col("small") & (F.col("rank_small") <= k), 1).otherwise(0)
            ).alias("cnt_s"),
            F.max(
                F.when(F.col("small") & (F.col("rank_small") <= k), F.col("dist_m"))
            ).alias("kth_s"),
            F.count("*").alias("cnt_a"),
            F.max("dist_m").alias("kth_a"),
        )
        ok_s = (
            (F.coalesce(F.col("cnt_s"), F.lit(0)) >= k)
            & F.col("kth_s").isNotNull()
            & (F.col("kth_s") <= _guarantee_col(F.col("_qy"), radius))
        )
        ok_a = (
            (F.coalesce(F.col("cnt_a"), F.lit(0)) >= k)
            & F.col("kth_a").isNotNull()
            & (F.col("kth_a") <= _guarantee_col(F.col("_qy"), big))
        )
        decide = active.join(stats, "_qid", "left").select(
            "_qid",
            "_qx",
            "_qy",
            ok_s.alias("take_small"),
            (ok_s | ok_a | F.lit(final_round)).alias("done"),
        )
        done_q = decide.filter(F.col("done")).select("_qid", "take_small")
        round_out = (
            ranked.join(maybe_b(done_q), "_qid")
            .filter(
                (F.col("take_small") & F.col("small") & (F.col("rank_small") <= k))
                | (~F.col("take_small") & (F.col("rank_all") <= k))
            )
            .select(
                id_col,
                F.col("_qid").alias(query_id),
                "dist_m",
                F.when(F.col("take_small"), F.col("rank_small"))
                .otherwise(F.col("rank_all"))
                .cast("int")  # rank_small is a sum (long); contract says int
                .alias("rank"),
            )
        )
        # ≤ k rows per finished query: detach from the cached candidate
        # lineage so the round cache releases immediately
        results.append(round_out.localCheckpoint(eager=True))
        if final_round:
            ranked.unpersist()
            break
        active = (
            decide.filter(~F.col("done"))
            .select("_qid", "_qx", "_qy")
            .localCheckpoint(eager=True)
        )
        ranked.unpersist()
        if active.isEmpty():  # scalar signal only — no per-query collect
            break

    if broadcast_queries:
        out_schema = T_.StructType(
            [
                pts.schema[id_col],
                T_.StructField(query_id, act_schema["_qid"].dataType),
                T_.StructField("dist_m", T_.DoubleType()),
                T_.StructField("rank", T_.IntegerType()),
            ]
        )
        return spark.createDataFrame(collected_rows, out_schema)
    # the schedule always runs ≥1 round and every round appends (possibly
    # empty) output, so `results` is never empty — even for zero queries
    out = results[0]
    for r in results[1:]:
        out = out.unionByName(r)
    return out


def distance_join(
    points: DataFrame,
    targets: list[tuple[str, float, float]],
    meters: float,
    id_col: str = "image_id",
) -> DataFrame:
    """Table-to-dimension distance join: every point within ``meters`` of
    each target → (id, target_id, dist_m).

    Generalizes the reference's single-target radius filter
    (PointDistanceFilter.java:28-122) to a broadcast join: per target,
    the Chebyshev box of deltaFromMeters(meters, target_y) imps is
    covered with pyramid cells (zoom adaptive per target); candidates
    come from ONE pure-JVM broadcast hash join on exploded cell ids.
    The exact test mirrors the reference: bbox first (the deltaFromMeters
    box IS the semantics, Box.java:421), then Mercator distance ≤ m —
    all codegen'd columns.
    """
    spark = points.sparkSession
    rows = []
    zooms = set()
    for tid, lon, lat in targets:
        qx = int(mercator.x_from_lon(lon)[()])
        qy = int(mercator.y_from_lat(lat)[()])
        delta = int(np.ceil(float(mercator.delta_from_meters(meters, qy)[()])))
        zoom = _window_zoom(delta)
        zooms.add(zoom)
        for c in _cells_at_zoom(qx, qy, delta, zoom).tolist():
            rows.append((int(c), tid, qx, qy, delta))
    tcells = spark.createDataFrame(
        pd.DataFrame(rows, columns=["_qcell", "target_id", "qx", "qy", "delta"]),
        schema="_qcell long, target_id string, qx long, qy long, delta long",
    )
    probe = points.select(id_col, "x", "y").withColumn(
        "_qcell",
        F.explode(
            F.array(
                *[T.tile_col(F.col("x"), F.col("y"), z).cast("long") for z in sorted(zooms)]
            )
        ),
    )
    xd = F.col("x").cast("long")
    yd = F.col("y").cast("long")
    return (
        probe.join(F.broadcast(tcells), "_qcell")
        .filter(
            (F.abs(xd - F.col("qx")) <= F.col("delta"))
            & (F.abs(yd - F.col("qy")) <= F.col("delta"))
        )
        .withColumn(
            "dist_m",
            mercator.distance_col(F.col("x"), F.col("y"), F.col("qx"), F.col("qy")),
        )
        .filter(F.col("dist_m") <= meters)
        .select(id_col, "target_id", "dist_m")
    )


def segment_candidates(
    points: DataFrame,
    segs: DataFrame,
    meters: float,
    point_cols: list[str],
    seg_id: str = "seg_id",
    slack: float = 1.5,
) -> DataFrame:
    """Point × segment candidates within ``meters`` — the shared front
    half of ``snap_to_segments`` (argmin) and ``mobility.map_match``
    (HMM lattice).  ``points`` needs (point_cols…, x, y); returns
    (point_cols…, px, py, seg_id, t, sx, sy, dist_m) with the clamped
    int64-exact projection and exact Mercator foot distance (expression
    order documented in snap_to_segments — its oracle mirrors this)."""
    p = points.select(
        *point_cols, F.col("x").alias("px"), F.col("y").alias("py")
    )
    s = segs.select(
        seg_id, "x1", "y1", "x2", "y2",
        F.least("x1", "x2").alias("_sminx"),
        F.greatest("x1", "x2").alias("_smaxx"),
        F.least("y1", "y2").alias("_sminy"),
        F.greatest("y1", "y2").alias("_smaxy"),
    )
    delta = mercator.delta_from_meters_col(
        F.lit(float(meters)), F.col("py")
    ) * F.lit(float(slack))
    cand = p.join(
        F.broadcast(s),
        (F.col("px") >= F.col("_sminx") - delta)
        & (F.col("px") <= F.col("_smaxx") + delta)
        & (F.col("py") >= F.col("_sminy") - delta)
        & (F.col("py") <= F.col("_smaxy") + delta),
    )
    abx, aby = F.col("x2") - F.col("x1"), F.col("y2") - F.col("y1")
    apx, apy = F.col("px") - F.col("x1"), F.col("py") - F.col("y1")
    dot = apx * abx + apy * aby
    len2 = abx * abx + aby * aby
    t = F.when(len2 == 0, F.lit(0.0)).otherwise(
        F.least(F.greatest(dot / len2, F.lit(0.0)), F.lit(1.0))
    )
    sx = F.col("x1") + t * abx
    sy = F.col("y1") + t * aby
    return cand.select(
        *point_cols,
        "px",
        "py",
        seg_id,
        t.alias("t"),
        sx.alias("sx"),
        sy.alias("sy"),
        mercator.distance_col(F.col("px"), F.col("py"), sx, sy).alias("dist_m"),
    ).filter(F.col("dist_m") <= meters)


def snap_to_segments(
    points: DataFrame,
    segs: DataFrame,
    meters: float,
    point_id: str = "image_id",
    seg_id: str = "seg_id",
    slack: float = 1.5,
) -> DataFrame:
    """Map-matching primitive: snap each point to the nearest segment
    within ``meters`` → (point_id, seg_id, t, sx, sy, dist_m).

    Extends the reference's radius filter (PointDistanceFilter.java:
    28-122) from point targets to a segment layer: the foot point is
    the clamped projection onto the segment *in imp space* — Mercator
    is conformal, so the local scale is isotropic and the imp-space
    projection IS the metric projection for segments short relative to
    their latitude span — then the exact Mercator distance to that foot
    point (Mercator.java:194-201).

    Plan shape: ONE broadcast join (the segment layer is dimension-
    sized; for planet-scale layers use the cell-blocked ``distance_join``
    candidates instead), candidate filter = segment bbox expanded by
    ``delta_from_meters(meters, point_y) × slack`` — a strict superset
    of the radius ball whenever cosh(y_seg)/cosh(y_pt) ≤ slack, i.e.
    for any sane radius — then argmin per point via one bounded window
    (tie-break on seg id).  Dot products stay in exact int64 (|Δseg| ≤
    2²⁶ imps for derived layers keeps them < 2⁶⁰); the t = dot/len²
    division is the only float step before the distance itself, so an
    oracle mirroring the op order is hash-exact.
    """
    snapped = segment_candidates(
        points, segs, meters, [point_id], seg_id=seg_id, slack=slack
    ).drop("px", "py")
    w = Window.partitionBy(point_id).orderBy(F.asc("dist_m"), F.asc(seg_id))
    return (
        snapped.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") == 1)
        .drop("rnk")
    )


def idw_interpolate(
    points: DataFrame,
    queries: list[tuple[str, float, float]],
    k: int = 8,
    val_col: str = "v",
    id_col: str = "image_id",
    n_points: int | None = None,
) -> DataFrame:
    """Inverse-distance-weighted interpolation at query locations — the
    classic spatial-interpolation consumer of kNN: estimate a field value
    at (lon, lat) as the 1/d²-weighted mean of its k nearest samples.

    value(q) = Σᵢ vᵢ/d²ᵢ ÷ Σᵢ 1/d²ᵢ over the exact kNN set, where d² is
    the squared imp-space distance (exact-hit guard: d² floored at 1, so
    a sample ON the query point dominates without a division by zero).

    Determinism contract: both folds run in RANK order (knn's ranking is
    itself deterministic), every float op is fixed-order, so the result
    is bit-reproducible across partitionings and engines.

    Scale shape: the kNN candidate machinery does all the heavy lifting
    (broadcast cell windows, one bounded rank shuffle); the value
    join-back broadcasts the tiny (query, neighbor) table against the
    fact table, and the final fold groups k·|queries| rows.  Returns
    (query_id, idw_value, n_samples).
    """
    spark = points.sparkSession
    # project the query list ONCE and share the frame between the kNN
    # candidate machinery and the value join-back (r03 review: knn()
    # used to re-project the same list internally)
    qrows = [
        (
            qid,
            int(mercator.x_from_lon(lon)[()]),
            int(mercator.y_from_lat(lat)[()]),
        )
        for qid, lon, lat in queries
    ]
    qdf = spark.createDataFrame(qrows, "query_id string, x long, y long")
    nn = knn_join(points, qdf, k, id_col=id_col, n_points=n_points).select(
        "query_id", id_col, "rank"
    )
    j = (
        points.select(id_col, "x", "y", F.col(val_col).cast("double").alias("v"))
        .join(F.broadcast(nn), id_col)
        .join(
            F.broadcast(
                qdf.select("query_id", F.col("x").alias("qx"), F.col("y").alias("qy"))
            ),
            "query_id",
        )
    )
    dx = (F.col("x") - F.col("qx")).cast("double")
    dy = (F.col("y") - F.col("qy")).cast("double")
    d2 = F.greatest(dx * dx + dy * dy, F.lit(1.0))
    terms = j.select(
        "query_id",
        F.struct(F.col("rank"), (F.col("v") / d2).alias("t"), (F.lit(1.0) / d2).alias("w")).alias("s"),
    )
    acc0 = F.lit(0.0)
    return (
        terms.groupBy("query_id")
        .agg(F.sort_array(F.collect_list("s")).alias("ss"))
        .select(
            "query_id",
            (
                F.aggregate("ss", acc0, lambda a, s: a + s["t"])
                / F.aggregate("ss", acc0, lambda a, s: a + s["w"])
            ).alias("idw_value"),
            F.size("ss").alias("n_samples"),
        )
    )


def route_measure(
    points: DataFrame,
    route_segs: DataFrame,
    meters: float,
    point_id: str = "pid",
    route_col: str = "route_id",
    seq_col: str = "seq",
    slack: float = 1.5,
) -> DataFrame:
    """Linear referencing: locate each point ALONG its nearest route —
    the step after map matching that turns snapped positions into
    route-relative measures (km-posts, progress along a trajectory,
    offset joins between datasets referenced to the same network).

    ``route_segs`` carries (route_id, seq, x1, y1, x2, y2) with seq
    ordering the segments along the route (seq < 2^20).  Each point
    snaps to the globally nearest segment within ``meters``
    (snap_to_segments machinery: one broadcast join + one bounded
    window), then

        measure_um = prefix_um(route, seq) + floor(t · len_um + 0.5)

    where len_um is the segment's Mercator length floor-quantized to
    integer MICRO-METERS and prefix_um its exclusive running sum.  The
    prefix sum is over BIGINTS — exact under any association, so
    engines whose window sums tree-reduce (DuckDB) agree bit-for-bit
    with Spark's sequential fold; a float prefix here would be the
    ln-sum mistake from the transcendental law.  t quantizes to
    micro-units.  Lengths use det_cosh scale (bit-identical libm-free
    cosh), so every emitted integer is engine-independent.

    Returns (point_id, route_id, seq, t_micro, dist_m, measure_um);
    dist_m is raw — callers quantize at the output boundary.
    """
    from geodesk_spark.geo import mercator

    len_m = mercator.distance_col(
        F.col("x1"), F.col("y1"), F.col("x2"), F.col("y2")
    )
    w = (
        Window.partitionBy(route_col)
        .orderBy(seq_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    segs = (
        route_segs.withColumn("_len_m", len_m)
        .withColumn("len_um", F.expr("cast(floor(_len_m * 1e6 + 0.5) as bigint)"))
        .withColumn(
            "prefix_um",
            F.coalesce(F.sum("len_um").over(w), F.lit(0).cast("long")),
        )
        .withColumn(
            "seg_id",
            F.col(route_col).cast("long") * F.lit(1 << 20).cast("long") + F.col(seq_col),
        )
    )
    snapped = snap_to_segments(
        points,
        segs.select("seg_id", "x1", "y1", "x2", "y2"),
        meters,
        point_id=point_id,
        seg_id="seg_id",
        slack=slack,
    )
    j = snapped.join(
        F.broadcast(segs.select("seg_id", route_col, seq_col, "len_um", "prefix_um")),
        "seg_id",
    )
    t_micro = F.expr("cast(floor(t * 1e6 + 0.5) as bigint)")
    measure = F.col("prefix_um") + F.expr("cast(floor(t * len_um + 0.5) as bigint)")
    return j.select(
        point_id,
        route_col,
        seq_col,
        t_micro.alias("t_micro"),
        "dist_m",
        measure.alias("measure_um"),
    )
