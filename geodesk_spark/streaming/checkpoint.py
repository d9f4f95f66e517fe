"""Resumable stage pipeline with per-partition lineage + metrics.

BASELINE.json north_rule: "resumable from checkpoint with per-partition
lineage + row-count/throughput metrics".  The reference's analog is the
double-snapshot GOL store (FreeStore.java:30-61, readers lock one of two
header snapshots); ours is the Spark-native equivalent: each stage
writes an atomic parquet snapshot (the _SUCCESS marker is the commit
point, like the active-snapshot byte) plus a lineage manifest, and a
re-run skips every stage whose snapshot is already committed.

In production the checkpoint format is an Iceberg table (snapshot ids
give time travel); no Iceberg catalog ships in this sandbox, so the
parquet + _SUCCESS layout stands in with the same commit semantics.

Lineage manifest per stage (<root>/<stage>/_lineage.json):
  stage, inputs (upstream stage names), elapsed_sec, n_rows,
  rows_per_sec, per-partition file rows [(file, rows), ...], schema.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession, functions as F


class Pipeline:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _dir(self, stage: str) -> str:
        return os.path.join(self.root, stage)

    def is_done(self, stage: str) -> bool:
        return os.path.exists(os.path.join(self._dir(stage), "_SUCCESS"))

    def lineage(self, stage: str) -> dict:
        with open(os.path.join(self._dir(stage), "_lineage.json")) as f:
            return json.load(f)

    def stage(
        self,
        name: str,
        fn,
        inputs: list[str] | None = None,
        partition_by: list[str] | None = None,
    ) -> DataFrame:
        """Run (or resume) a stage.  ``fn(spark) -> DataFrame``; upstream
        stages are read back from their snapshots via ``self.read``."""
        out = self._dir(name)
        if self.is_done(name):
            return self.read(name)
        t0 = time.time()
        df = fn(self.spark)
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(out)
        elapsed = time.time() - t0

        snap = self.spark.read.parquet(out)
        per_file = (
            snap.groupBy(F.input_file_name().alias("file"))
            .agg(F.count("*").alias("rows"))
            .collect()
        )
        n_rows = sum(r["rows"] for r in per_file)
        manifest = {
            "stage": name,
            "inputs": inputs or [],
            "elapsed_sec": round(elapsed, 3),
            "n_rows": n_rows,
            "rows_per_sec": round(n_rows / elapsed, 1) if elapsed > 0 else None,
            "partitions": [
                {"file": os.path.basename(r["file"]), "rows": r["rows"]} for r in per_file
            ],
            "schema": snap.schema.simpleString(),
            "committed_at_unix": int(time.time()),
        }
        with open(os.path.join(out, "_lineage.json"), "w") as f:
            json.dump(manifest, f, indent=1)
        return snap

    def read(self, stage: str) -> DataFrame:
        return self.spark.read.parquet(self._dir(stage))

    def invalidate(self, stage: str):
        """Drop a stage's commit marker so the next run recomputes it
        (downstream stages are unaffected unless also invalidated)."""
        marker = os.path.join(self._dir(stage), "_SUCCESS")
        if os.path.exists(marker):
            os.remove(marker)
