"""spark-submit entrypoint for zonal coverage analytics over the
image+caption table — the geospatial-overlay twin of jobs/flagship_job.py
(tiles) and jobs/curation_job.py (text).

Deployment shape (BASELINE.json north_rule): ship the package as a zip
via ``--py-files`` and run the staged, checkpoint-resumable pipeline on
any cluster size:

    python tools/make_pyfiles.py              # builds dist/geodesk_spark.zip
    spark-submit --master local[8]  --py-files dist/geodesk_spark.zip \
        jobs/zonal_job.py --rows 200000 --workdir /tmp/zonal_run
    spark-submit --master local[32] --py-files dist/geodesk_spark.zip \
        jobs/zonal_job.py --rows 200000 --workdir /tmp/zonal_run4

Stages (each an atomic parquet snapshot via streaming.checkpoint.Pipeline;
a killed job resumes from the last committed stage):
  ingest  — synthesize the (image_id, caption, lon, lat) table
            (sources/synth.py, the BASELINE input shape), project to imp
            coords, derive a deterministic octagon FOOTPRINT per image
            (capture-area polygon; radius keyed on crc32(image_id))
  zones   — deterministic NON-CONVEX L-shaped districts (the worst-case
            zone shape: exercises the signed-fan general overlay)
  overlay — overlay.overlay_area_general footprints × districts:
            districts broadcast, ONE footprint scan, zero fact shuffle
  rollup  — per-district coverage: n_images, footprint-area micro sum

Prints per-stage lineage and one final JSON metrics line, so the same
N-vs-4N submit comparison applies as for the other two jobs.
"""

from __future__ import annotations

import argparse
import json
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=200_000, help="synthetic image count")
    ap.add_argument("--zones", type=int, default=64, help="district count")
    ap.add_argument("--workdir", required=True, help="checkpoint root")
    ap.add_argument("--partitions", type=int, default=64)
    args = ap.parse_args()

    # Import AFTER spark-submit has placed the --py-files zip on sys.path.
    from pyspark.sql import SparkSession, functions as F

    from geodesk_spark.operators import overlay, tiling
    from geodesk_spark.sources import synth
    from geodesk_spark.streaming.checkpoint import Pipeline

    spark = SparkSession.builder.appName("geodesk-zonal").getOrCreate()
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    t0 = time.time()
    pipe = Pipeline(spark, args.workdir)

    # star-octagon footprint: 8 compass directions, per-vertex radius
    # keyed on crc32(image_id) — deterministic on any executor
    DIRS = [(1, 0), (1, 1), (0, 1), (-1, 1), (-1, 0), (-1, -1), (0, -1), (1, -1)]
    PRIMES = [40503, 58921, 71993, 83417, 15137, 29383, 96179, 47981]

    def ingest(s):
        imgs = synth.images_df(s, args.rows, with_bytes=False, partitions=args.partitions)
        pts = tiling.with_imp_coords(imgs).select("image_id", "x", "y")
        h = F.crc32(F.col("image_id")).cast("bigint")
        ring = F.array(
            *[
                F.struct(
                    (
                        F.col("x").cast("double")
                        + F.lit(sx) * ((h * p) % F.lit(1 << 22) + F.lit(1 << 21)).cast("double")
                    ).alias("x"),
                    (
                        F.col("y").cast("double")
                        + F.lit(sy) * ((h * p) % F.lit(1 << 22) + F.lit(1 << 21)).cast("double")
                    ).alias("y"),
                )
                for (sx, sy), p in zip(DIRS, PRIMES)
            ]
        )
        return pts.select(F.col("image_id").alias("sid"), ring.alias("ring"))

    def zones(s):
        z = s.range(0, args.zones, 1, 1)
        cx = (F.col("id") * 2654435761 % F.lit(1 << 31)) - F.lit(1 << 30)
        cy = (F.col("id") * 2246822519 % F.lit(1 << 31)) - F.lit(1 << 30)
        hw = (F.col("id") % 5 + 4).cast("bigint") * F.lit(1 << 25)
        hh = (F.col("id") % 4 + 4).cast("bigint") * F.lit(1 << 25)
        verts = [
            (cx, cy),
            (cx + 2 * hw, cy),
            (cx + 2 * hw, cy + hh),
            (cx + hw, cy + hh),
            (cx + hw, cy + 2 * hh),
            (cx, cy + 2 * hh),
        ]
        cring = F.array(
            *[
                F.struct(vx.cast("double").alias("x"), vy.cast("double").alias("y"))
                for vx, vy in verts
            ]
        )
        return z.select(F.col("id").alias("cid"), cring.alias("cring"))

    def overlay_stage(s):
        return overlay.overlay_area_general(
            pipe.read("ingest"), pipe.read("zones"), clip_k=6
        )

    def rollup(s):
        ov = pipe.read("overlay")
        return (
            ov.groupBy("cid")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_images"),
                F.sum(
                    F.floor(F.col("inter_area") * F.lit(1e-3) + F.lit(0.5)).cast("bigint")
                ).alias("area_kilo_sum"),
            )
            .orderBy("cid")
        )

    pipe.stage("ingest", ingest)
    pipe.stage("zones", zones)
    pipe.stage("overlay", overlay_stage, inputs=["ingest", "zones"])
    out = pipe.stage("rollup", rollup, inputs=["overlay"])

    tot = out.agg(
        F.count(F.lit(1)).alias("zones_hit"), F.sum("n_images").alias("pair_total")
    ).collect()[0]
    elapsed = time.time() - t0
    n_in = pipe.lineage("ingest")["n_rows"]
    print(
        json.dumps(
            {
                "job": "zonal",
                "input_images": n_in,
                "districts": pipe.lineage("zones")["n_rows"],
                "overlay_pairs": pipe.lineage("overlay")["n_rows"],
                "zones_hit": int(tot["zones_hit"]),
                "elapsed_sec": round(elapsed, 2),
                "rows_per_sec": round(n_in / elapsed),
                "parallelism": spark.sparkContext.defaultParallelism,
                "executors": max(
                    spark.sparkContext._jsc.sc().getExecutorMemoryStatus().size() - 1, 1
                ),
                "stages": {
                    s: {
                        k: pipe.lineage(s)[k]
                        for k in ("elapsed_sec", "n_rows", "rows_per_sec")
                    }
                    for s in ("ingest", "zones", "overlay", "rollup")
                },
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
