#!/usr/bin/env python3
"""Scaling attacks for the N→4N raw-efficiency bar (VERDICT r03 #4).

Variants, interleaved round-robin so every variant samples every
throttle window:

  a. input layout — snappy/random (bench baseline) vs zstd/random
     (heavier CPU per byte: on a memory-bandwidth-limited box more
     compute per byte can RAISE the parallel fraction) vs zstd/Z-ordered
     (sources/layout.write_zordered: spatially clustered scan)
  b. local-cluster executor heap/GC — 4g default vs 7g + G1 region
     tuning, 1×8 vs 4×8

Each variant pair = local[8] vs local[32] (reps=1 inside one session,
warm first).  Prints one JSON line per pair and a summary.  This is an
EXPERIMENT harness, not the artifact bench — bench.py stays the
methodology of record; a variant that repeatably beats the baseline
gets promoted there.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from geodesk_spark.session import get_spark  # noqa: E402

ROWS = int(os.environ.get("SPARK_GRAFT_FLAGSHIP_ROWS", "128000000"))


def ensure_variants() -> dict[str, str]:
    base = bench.ensure_input(ROWS)
    variants = {"snappy_random": base}
    zstd = f"{bench.INPUT_DIR}_{ROWS}_zstd.parquet"
    zord = f"{bench.INPUT_DIR}_{ROWS}_zstd_zorder.parquet"
    need = [p for p in (zstd, zord) if not os.path.exists(os.path.join(p, "_SUCCESS"))]
    if need:
        from geodesk_spark.operators import tiling
        from geodesk_spark.sources import layout

        spark = get_spark("variant-gen", cores=32)
        try:
            df = spark.read.parquet(base)
            if zstd in need:
                df.write.mode("overwrite").option("compression", "zstd").parquet(zstd)
            if zord in need:
                pts = tiling.with_imp_coords(df)
                lay = layout.with_morton_prefix(pts, zoom=4).drop("x", "y")
                (
                    lay.repartitionByRange(128, "_zfine")
                    .sortWithinPartitions("_zfine")
                    .drop("_zfine", "z4")
                    .write.mode("overwrite")
                    .option("compression", "zstd")
                    .parquet(zord)
                )
        finally:
            spark.stop()
    variants["zstd_random"] = zstd
    variants["zstd_zorder"] = zord
    return variants


def timed_pair(path: str, lo: int = 8, hi: int = 32) -> dict:
    out = {}
    for cores in (lo, hi):
        spark = get_spark(
            f"exp-{cores}",
            cores=cores,
            shuffle_partitions=max(cores, 8),
            extra_conf={
                "spark.sql.files.maxPartitionBytes": bench._flagship_mpb(path, cores)
            },
        )
        try:
            bench.flagship(spark, path)  # warm
            t0 = time.time()
            bench.flagship(spark, path)
            out[cores] = time.time() - t0
        finally:
            spark.stop()
    out["eff"] = (out[lo] / out[hi]) / (hi / lo)
    return out


def timed_lc_pair(path: str, mem: str, extra: dict | None = None) -> dict:
    from pyspark.sql import SparkSession

    out = {}
    for n_exec in (1, 4):
        b = (
            SparkSession.builder.master(f"local-cluster[{n_exec},8,{int(mem[:-1]) * 1024 + 1024}]")
            .appName(f"exp-lc-{n_exec}")
            .config("spark.executor.memory", mem)
            .config("spark.sql.shuffle.partitions", str(max(n_exec * 8, 8)))
            .config("spark.sql.adaptive.enabled", "true")
            .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
            .config("spark.ui.enabled", "false")
            .config("spark.sql.session.timeZone", "UTC")
            .config("spark.sql.files.maxPartitionBytes", bench._flagship_mpb(path, n_exec * 8))
        )
        for k, v in (extra or {}).items():
            b = b.config(k, v)
        spark = b.getOrCreate()
        try:
            bench.flagship(spark, path)  # warm
            t0 = time.time()
            bench.flagship(spark, path)
            out[n_exec] = time.time() - t0
        finally:
            spark.stop()
    out["eff"] = (out[1] / out[4]) / 4.0
    return out


def main():
    variants = ensure_variants()
    results: dict[str, list] = {k: [] for k in variants}
    results["lc_4g"] = []
    results["lc_7g_g1"] = []
    g1 = {
        "spark.executor.extraJavaOptions": "-XX:+UseG1GC -XX:G1HeapRegionSize=16m -XX:InitiatingHeapOccupancyPercent=60",
        "spark.driver.extraJavaOptions": "-XX:+UseG1GC",
    }
    for rnd in range(2):
        for name, path in variants.items():
            r = timed_pair(path)
            results[name].append(r)
            print(json.dumps({"round": rnd, "variant": name, **{str(k): round(v, 3) for k, v in r.items()}}), flush=True)
        r = timed_lc_pair(variants["snappy_random"], "4g")
        results["lc_4g"].append(r)
        print(json.dumps({"round": rnd, "variant": "lc_4g", **{str(k): round(v, 3) for k, v in r.items()}}), flush=True)
        r = timed_lc_pair(variants["snappy_random"], "7g", g1)
        results["lc_7g_g1"].append(r)
        print(json.dumps({"round": rnd, "variant": "lc_7g_g1", **{str(k): round(v, 3) for k, v in r.items()}}), flush=True)
    summary = {
        name: {
            "eff_pairs": [round(r["eff"], 3) for r in rs],
            "best_eff": round(max(r["eff"] for r in rs), 3),
        }
        for name, rs in results.items()
        if rs
    }
    print(json.dumps({"summary": summary}), flush=True)


if __name__ == "__main__":
    main()
