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
2. Broadcast an inverted cell→queries index; ONE narrow mapInPandas
   emits (query_id, point, dist) for points in any candidate cell —
   vectorized np.searchsorted per Arrow batch.
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
from pyspark.sql import DataFrame, Window, functions as F

from geodesk_spark.geo import mercator, tile as T

I32_MAX = (1 << 31) - 1
I32_MIN = -(1 << 31)


def _cells_for_window(qx: int, qy: int, radius_imps: int, max_per_axis: int = 32) -> np.ndarray:
    """Cells (pyramid-adaptive zoom) covering the square window around q."""
    zoom = T.MAX_ZOOM
    while zoom > 0 and ((2 * radius_imps) >> (32 - zoom)) + 1 > max_per_axis:
        zoom -= 2  # pyramid steps of 2, like the default level set
    x0, x1 = max(qx - radius_imps, I32_MIN), min(qx + radius_imps, I32_MAX)
    y0, y1 = max(qy - radius_imps, I32_MIN), min(qy + radius_imps, I32_MAX)
    c0, c1 = int(T.column_from_x(x0, zoom)[()]), int(T.column_from_x(x1, zoom)[()])
    r0, r1 = int(T.row_from_y(y1, zoom)[()]), int(T.row_from_y(y0, zoom)[()])
    cols = np.arange(c0, c1 + 1, dtype=np.int64)
    rows = np.arange(r0, r1 + 1, dtype=np.int64)
    cc, rr = np.meshgrid(cols, rows)
    return ((zoom << 24) | (rr.ravel() << 12) | cc.ravel()).astype(np.int64), zoom


def _guarantee_m(qy: int, radius_imps: int) -> float:
    """Max distance provably covered: radius × min meters/imp in the window."""
    ys = [max(qy - radius_imps, I32_MIN), min(qy + radius_imps, I32_MAX)]
    m_per_imp = min(float(mercator.meters_at_y(y)[()]) for y in ys)
    return radius_imps * m_per_imp


def knn(
    points: DataFrame,
    queries: list[tuple[str, float, float]],
    k: int,
    init_radius_imps: int = 1 << 20,  # one z12 tile
    id_col: str = "image_id",
) -> DataFrame:
    """queries: [(query_id, lon, lat), ...] → (query_id, id, dist_m, rank)."""
    spark = points.sparkSession
    qinfo = {}
    for qid, lon, lat in queries:
        qinfo[qid] = (int(mercator.x_from_lon(lon)[()]), int(mercator.y_from_lat(lat)[()]))

    remaining = {qid: init_radius_imps for qid in qinfo}
    results: list[DataFrame] = []
    pts = points.select(id_col, "x", "y")

    while remaining:
        frames = []
        zooms = {}
        for qid, radius in remaining.items():
            qx, qy = qinfo[qid]
            cells, zoom = _cells_for_window(qx, qy, radius)
            zooms[qid] = zoom
            frames.append(pd.DataFrame({"cell": cells, "qid": qid}))
        inv = pd.concat(frames, ignore_index=True).sort_values("cell")
        bc = spark.sparkContext.broadcast(
            (
                inv["cell"].to_numpy(np.int64),
                inv["qid"].to_numpy(object),
                dict(qinfo),
                sorted(set(zooms.values())),
            )
        )

        def candidates(batches):
            cells_sorted, qids_sorted, qxy, zoom_list = bc.value
            for pdf in batches:
                x = pdf["x"].to_numpy(dtype=np.int64)
                y = pdf["y"].to_numpy(dtype=np.int64)
                all_rows, all_qids = [], []
                for zoom in zoom_list:
                    cell = (
                        (zoom << 24)
                        | ((((1 << 31) - 1 - y) >> (32 - zoom)) << 12)
                        | ((x + (1 << 31)) >> (32 - zoom))
                    )
                    lo = np.searchsorted(cells_sorted, cell, side="left")
                    hi = np.searchsorted(cells_sorted, cell, side="right")
                    nh = hi - lo
                    rows = np.nonzero(nh > 0)[0]
                    if len(rows) == 0:
                        continue
                    counts = nh[rows]
                    all_rows.append(np.repeat(rows, counts))
                    idx = np.concatenate(
                        [np.arange(lo[i], hi[i]) for i in rows]
                    )
                    all_qids.append(qids_sorted[idx])
                if not all_rows:
                    continue
                rows = np.concatenate(all_rows)
                qids = np.concatenate(all_qids)
                sub = pdf.iloc[rows][[pdf.columns[0]]].copy()
                sub["query_id"] = qids
                qx_arr = np.array([qxy[q][0] for q in qids], dtype=np.float64)
                qy_arr = np.array([qxy[q][1] for q in qids], dtype=np.float64)
                sub["dist_m"] = mercator.distance(
                    x[rows].astype(np.float64), y[rows].astype(np.float64), qx_arr, qy_arr
                )
                yield sub

        cand = pts.mapInPandas(candidates, schema=f"{id_col} string, query_id string, dist_m double")
        w = Window.partitionBy("query_id").orderBy(F.col("dist_m").asc(), F.col(id_col).asc())
        topk = cand.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k).cache()
        stats = {
            r["query_id"]: (r["cnt"], r["kth"])
            for r in topk.groupBy("query_id")
            .agg(F.count("*").alias("cnt"), F.max("dist_m").alias("kth"))
            .collect()
        }

        done, still = [], {}
        for qid, radius in remaining.items():
            cnt, kth = stats.get(qid, (0, None))
            whole_world = radius >= (1 << 31)
            ok = cnt >= k and kth is not None and kth <= _guarantee_m(qinfo[qid][1], radius)
            if ok or whole_world:
                done.append(qid)
            else:
                still[qid] = radius * 2
        if done:
            results.append(topk.filter(F.col("query_id").isin(done)))
        remaining = still

    out = results[0]
    for r in results[1:]:
        out = out.unionByName(r)
    return out
