"""Benchmark harness.

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric", "value" (total sec), "unit": "sec", "queries": {name:
sec}, "sf", plus flagship rows/sec at two parallelism levels and the
scaling efficiency mandated by BASELINE.json (N vs 4N evidence —
local[8] vs local[32] in this sandbox)}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

FLAGSHIP_ROWS = int(os.environ.get("SPARK_GRAFT_FLAGSHIP_ROWS", "2000000"))


def flagship(spark, n_rows: int):
    """Synthetic image table → imp encode → tile pyramid → three-band PIP
    broadcast join → per-polygon counts.  Returns (match_count, rows)."""
    from pyspark.sql import functions as F

    from geodesk_spark.operators import spatial_join, tiling
    from geodesk_spark.sources import synth

    imgs = synth.images_df(spark, n_rows, with_bytes=False,
                           partitions=spark.sparkContext.defaultParallelism * 2)
    pts = tiling.with_point_tiles(tiling.with_imp_coords(imgs))
    prepared = spatial_join.prepare_layer(synth.polygon_layer())
    joined = spatial_join.contains_points(
        pts.select("image_id", "x", "y", "cell"), prepared, keep_cols=["image_id", "cell"]
    )
    agg = joined.groupBy("poly_id").agg(F.count("*").alias("n"))
    return sum(r["n"] for r in agg.collect())


def run_headline(spark, sf_dir: str) -> dict[str, float]:
    import __spark_entry__ as em

    names = [
        "tile_assign",
        "pip_join",
        "distance_filter",
        "knn_cellring",
        "agg_pricing_summary",
        "join_customer_orders",
        "window_top3_orders",
        "text_quality",
        "dedup_minhash_lsh",
        "dedup_exact",
        "ann_cosine_topk",
        "events_hourly",
    ]
    qs = em.queries()
    times = {}
    for name in names:
        t0 = time.time()
        df = qs[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        times[name] = round(time.time() - t0, 3)
    return times


def timed_flagship(cores: int, n_rows: int) -> tuple[float, float]:
    from geodesk_spark.session import get_spark

    spark = get_spark(f"bench-{cores}", cores=cores, shuffle_partitions=max(cores, 8))
    try:
        flagship(spark, 50_000)  # warm-up: JIT + Arrow init
        t0 = time.time()
        flagship(spark, n_rows)
        dt = time.time() - t0
    finally:
        spark.stop()
    return dt, n_rows / dt


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = sf_dir.rstrip("/").split("sf")[-1]

    from geodesk_spark.session import get_spark

    spark = get_spark("bench", cores=cores, shuffle_partitions=max(cores, 8))
    t0 = time.time()
    queries = run_headline(spark, sf_dir)
    total = round(time.time() - t0, 3)
    spark.stop()

    lo_cores = max(cores // 4, 1)
    dt_lo, thr_lo = timed_flagship(lo_cores, FLAGSHIP_ROWS)
    dt_hi, thr_hi = timed_flagship(cores, FLAGSHIP_ROWS)
    eff = (thr_hi / thr_lo) / (cores / lo_cores)

    out = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "flagship_rows": FLAGSHIP_ROWS,
        "flagship_rows_per_sec": {f"local[{lo_cores}]": round(thr_lo), f"local[{cores}]": round(thr_hi)},
        "flagship_sec": {f"local[{lo_cores}]": round(dt_lo, 2), f"local[{cores}]": round(dt_hi, 2)},
        "scaling_efficiency": round(eff, 3),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
