"""kNN over point features via cell-ring expansion (BASELINE north_star).

The reference's nearest-neighbour surface is ``maxMetersFromXY`` — a
radius filter (PointDistanceFilter.java:28-122).  kNN is built on the
same primitive the way the north star prescribes: expand square rings
of z12 cells around each query point until ≥k candidates are found,
then take the top-k by exact Mercator-scaled distance.

Spark shape (single pass, no per-query scans):

1. Driver: for each query point, compute the ring-0..R candidate cell
   set (cheap int math).  R starts at ``init_rings`` and doubles only
   for queries that did not reach k (rare; the loop re-runs ONLY those).
2. Broadcast a cell→[query…] inverted index; one narrow mapInPandas
   emits (query_id, point, dist) for points landing in any query's
   candidate cells — vectorized np.searchsorted per batch.
3. ``Window.partitionBy(query_id).orderBy(dist)`` + row_number ≤ k.
   The shuffle moves only candidate rows (ring-bounded), not the table.

At cluster scale the candidate cells also drive partition pruning when
the table is partitioned by tile — the scan itself skips files.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F

from geodesk_spark.geo import mercator, tile as T


def _ring_cells(qx: int, qy: int, rings: int, zoom: int = 12) -> np.ndarray:
    """All cells within `rings` tiles (Chebyshev) of the query's cell."""
    c = int(T.column_from_x(qx, zoom)[()])
    r = int(T.row_from_y(qy, zoom)[()])
    n = 1 << zoom
    cols = np.arange(max(c - rings, 0), min(c + rings, n - 1) + 1, dtype=np.int64)
    rows = np.arange(max(r - rings, 0), min(r + rings, n - 1) + 1, dtype=np.int64)
    cc, rr = np.meshgrid(cols, rows)
    return ((zoom << 24) | (rr.ravel() << 12) | cc.ravel()).astype(np.int64)


def knn(
    points: DataFrame,
    queries: list[tuple[str, float, float]],
    k: int,
    zoom: int = 12,
    init_rings: int = 1,
    max_rings: int = 64,
    id_col: str = "image_id",
) -> DataFrame:
    """queries: [(query_id, lon, lat), ...].  Returns
    (query_id, <id_col>, dist_m, rank) with rank 1..k per query.

    Correct even near sparse regions: any query that cannot reach k
    candidates within ``max_rings`` returns what exists (documented
    divergence; raise max_rings for guaranteed-k)."""
    spark = points.sparkSession
    qinfo = []
    for qid, lon, lat in queries:
        qx = int(mercator.x_from_lon(lon)[()])
        qy = int(mercator.y_from_lat(lat)[()])
        qinfo.append((qid, qx, qy))

    remaining = {qid: init_rings for qid, _, _ in qinfo}
    results: list[DataFrame] = []
    pts = points.select(id_col, "x", "y")

    while remaining:
        cell_lists = {
            qid: _ring_cells(qx, qy, remaining[qid], zoom)
            for qid, qx, qy in qinfo
            if qid in remaining
        }
        # Inverted candidate index: sorted cells + per-cell query lists.
        pairs = []
        for qid, cells in cell_lists.items():
            pairs.append(pd.DataFrame({"cell": cells, "qid": qid}))
        inv = pd.concat(pairs, ignore_index=True)
        qxy = {qid: (qx, qy) for qid, qx, qy in qinfo}
        bc = spark.sparkContext.broadcast(
            (inv.sort_values("cell").to_numpy(), qxy)
        )

        def candidates(batches):
            inv_arr, qxy_l = bc.value
            cells_sorted = inv_arr[:, 0].astype(np.int64)
            qids_sorted = inv_arr[:, 1]
            for pdf in batches:
                x = pdf["x"].to_numpy(dtype=np.int64)
                y = pdf["y"].to_numpy(dtype=np.int64)
                cell = (zoom << 24) | ((((1 << 31) - 1 - y) >> (32 - zoom)) << 12) | (
                    (x + (1 << 31)) >> (32 - zoom)
                )
                lo = np.searchsorted(cells_sorted, cell, side="left")
                hi = np.searchsorted(cells_sorted, cell, side="right")
                n_hits = hi - lo
                if n_hits.sum() == 0:
                    continue
                rows = np.nonzero(n_hits > 0)[0]
                out_rows, out_qids = [], []
                for i in rows:  # tiny: only matched rows, ≤ queries per cell
                    for j in range(lo[i], hi[i]):
                        out_rows.append(i)
                        out_qids.append(qids_sorted[j])
                sub = pdf.iloc[out_rows][[pdf.columns[0], "x", "y"]].copy()
                sub["query_id"] = out_qids
                qx_arr = np.array([qxy_l[q][0] for q in out_qids], dtype=np.float64)
                qy_arr = np.array([qxy_l[q][1] for q in out_qids], dtype=np.float64)
                sub["dist_m"] = mercator.distance(
                    sub["x"].to_numpy(dtype=np.float64), sub["y"].to_numpy(dtype=np.float64), qx_arr, qy_arr
                )
                yield sub.drop(columns=["x", "y"])

        cand = pts.mapInPandas(candidates, schema=f"{id_col} string, query_id string, dist_m double")
        w = Window.partitionBy("query_id").orderBy(F.col("dist_m").asc(), F.col(id_col).asc())
        topk = cand.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
        stats = {
            r["query_id"]: (r["cnt"], r["kth"])
            for r in topk.groupBy("query_id")
            .agg(F.count("*").alias("cnt"), F.max("dist_m").alias("kth"))
            .collect()
        }

        done, still = [], {}
        tile_extent = 1 << (32 - zoom)
        for qid, rings_now in remaining.items():
            cnt, kth = stats.get(qid, (0, None))
            # Ring R is guaranteed to contain every point within R tile
            # widths of the query cell's edge → all true neighbors closer
            # than `guarantee_m` were candidates.  Conservative meters/imp
            # at the query latitude with a 0.8 margin for in-ring scale
            # variation (scale varies smoothly; rings are ≤64 z12 tiles).
            qy = qxy[qid][1]
            guarantee_m = rings_now * tile_extent * float(mercator.meters_at_y(qy)[()]) * 0.8
            if (cnt >= k and kth is not None and kth <= guarantee_m) or rings_now >= max_rings:
                done.append(qid)
            else:
                still[qid] = min(rings_now * 2, max_rings)
        if done:
            results.append(topk.filter(F.col("query_id").isin(done)))
        remaining = still

    out = results[0]
    for r in results[1:]:
        out = out.unionByName(r)
    return out
