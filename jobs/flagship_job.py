"""spark-submit entrypoint for the flagship spatial pipeline.

The deployment shape the engine is designed for (BASELINE.json
north_rule): ship the package as a zip via ``--py-files`` and run the
staged, checkpoint-resumable pipeline on any cluster size:

    python tools/make_pyfiles.py              # builds dist/geodesk_spark.zip
    spark-submit --master local[8]  --py-files dist/geodesk_spark.zip \
        jobs/flagship_job.py --rows 1000000 --workdir /tmp/flagship_run
    spark-submit --master local[32] --py-files dist/geodesk_spark.zip \
        jobs/flagship_job.py --rows 1000000 --workdir /tmp/flagship_run4

On a real cluster ``--master yarn``/k8s and 4× executors is the N→4N
scaling test; the job prints per-stage lineage (rows, rows/sec,
per-partition file counts) and a final JSON metrics line.

Stages (each an atomic parquet snapshot; re-running skips committed
stages, so a killed job resumes where it stopped):
  ingest   — synthesize (or read) the image+caption table
  encode   — imp projection + tile pyramid columns (pure JVM)
  joined   — three-band broadcast PIP join vs the polygon layer
  rollup   — per-polygon counts
"""

from __future__ import annotations

import argparse
import json
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1_000_000, help="synthetic input rows")
    ap.add_argument("--input", default=None, help="existing parquet input (else synthesized)")
    ap.add_argument("--workdir", required=True, help="checkpoint root")
    ap.add_argument("--partitions", type=int, default=64)
    ap.add_argument(
        "--layout",
        choices=["plain", "zorder"],
        default="plain",
        help="encode-snapshot layout: zorder = zoom-16 Morton range-partition "
        "+ in-file sort (measured −24%% scan wall at low parallelism and "
        "better zstd ratios; enables spatial partition pruning on the "
        "snapshot via sources/layout.bbox_partition_filter)",
    )
    ap.add_argument("--codec", default=None, help="parquet codec for snapshots (e.g. zstd)")
    args = ap.parse_args()

    # Import AFTER spark-submit has placed the --py-files zip on sys.path.
    from pyspark.sql import SparkSession, functions as F

    from geodesk_spark.operators import spatial_join, tiling
    from geodesk_spark.sources import synth
    from geodesk_spark.streaming.checkpoint import Pipeline

    spark = SparkSession.builder.appName("geodesk-flagship").getOrCreate()
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    # Scan-partition sizing (measured, BENCH.md r03): the pipeline is ONE
    # long codegen stage rooted at the scan, so scan partitions ARE the
    # task granularity — target ~10 tasks/core; the 128 MB default left
    # a 32-core run at 1.34 waves (25% tail idle) and let coarse tasks
    # amplify city-hot-cell skew.  When reading an existing input whose
    # size we can cheaply know, shrink maxPartitionBytes accordingly.
    if args.input:
        try:
            cores = spark.sparkContext.defaultParallelism
            total = sum(
                int(f.length)
                for f in spark._jvm.org.apache.hadoop.fs.FileSystem.get(
                    spark._jsc.hadoopConfiguration()
                ).listStatus(spark._jvm.org.apache.hadoop.fs.Path(args.input))
            )
            mpb = min(max(total // (10 * cores), 16 << 20), 128 << 20)
            spark.conf.set("spark.sql.files.maxPartitionBytes", str(mpb))
        except Exception:
            pass  # keep the default on exotic filesystems
    t0 = time.time()
    pipe = Pipeline(spark, args.workdir)

    def ingest(s):
        if args.input:
            return s.read.parquet(args.input)
        return synth.images_df(s, args.rows, with_bytes=False, partitions=args.partitions)

    if args.codec:
        spark.conf.set("spark.sql.parquet.compression.codec", args.codec)

    def encode(s):
        df = tiling.with_point_tiles(tiling.with_imp_coords(pipe.read("ingest")))
        if args.layout == "zorder":
            from geodesk_spark.geo import curve

            zf = curve.morton_cell_col(F.col("x"), F.col("y"), 16).alias("_zfine")
            df = (
                df.select("*", zf)
                .repartitionByRange(args.partitions, "_zfine")
                .sortWithinPartitions("_zfine")
                .drop("_zfine")
            )
        return df

    def joined(s):
        prepared = spatial_join.prepare_layer(synth.polygon_layer())
        pts = pipe.read("encode").select("image_id", "x", "y", "cell")
        return spatial_join.contains_points(pts, prepared, keep_cols=["image_id", "cell"])

    def rollup(s):
        return pipe.read("joined").groupBy("poly_id").agg(F.count("*").alias("n_matches"))

    pipe.stage("ingest", ingest)
    pipe.stage("encode", encode, inputs=["ingest"])
    pipe.stage("joined", joined, inputs=["encode"])
    out = pipe.stage("rollup", rollup, inputs=["joined"])

    rows = {r["poly_id"]: r["n_matches"] for r in out.collect()}
    elapsed = time.time() - t0
    n_in = pipe.lineage("ingest")["n_rows"]
    print(
        json.dumps(
            {
                "job": "flagship",
                "input_rows": n_in,
                "matches": rows,
                "elapsed_sec": round(elapsed, 2),
                "rows_per_sec": round(n_in / elapsed),
                "parallelism": spark.sparkContext.defaultParallelism,
                # Executor JVM count (driver excluded; 1 in local[*]
                # where the driver hosts the executor threads) — proves
                # the N-vs-4N deployment shape actually ran multi-JVM.
                "executors": max(
                    spark.sparkContext._jsc.sc().getExecutorMemoryStatus().size() - 1, 1
                ),
                "stages": {
                    s: {
                        k: pipe.lineage(s)[k]
                        for k in ("elapsed_sec", "n_rows", "rows_per_sec")
                    }
                    for s in ("ingest", "encode", "joined", "rollup")
                },
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
