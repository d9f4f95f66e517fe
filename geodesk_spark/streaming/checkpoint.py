"""Resumable stage pipeline with per-partition lineage + metrics.

BASELINE.json north_rule: "resumable from checkpoint with per-partition
lineage + row-count/throughput metrics".  The reference's analog is the
double-snapshot GOL store (FreeStore.java:30-61, readers lock one of two
header snapshots); ours is the Spark-native equivalent: each stage
writes a parquet snapshot plus a lineage manifest, then COMMITS by
appending to the snapshot log (an atomic os.replace — the
active-snapshot-byte analog).  _SUCCESS alone is NOT the commit: a
version is visible only when both its _SUCCESS marker exists AND the
log records it, so a crash between the parquet write and the log
append leaves an orphan directory that a re-run simply supersedes —
never a "done" stage with no lineage or snapshot id.  A re-run skips
every stage whose snapshot is already committed.

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
    """Stages commit as VERSIONED snapshots (<root>/<stage>/v<N>/), with
    an append-only snapshot log (<root>/_snapshots.json) — the Iceberg
    snapshot-id analog: `read(stage)` gives the current version,
    `read(stage, snapshot_id=…)` time-travels to any past commit, and
    `invalidate` starts a NEW version without destroying history (the
    reference's double-snapshot reader keeps serving the old snapshot
    while a writer builds the new one, FreeStore.java:30-61)."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)
        self._log_path = os.path.join(root, "_snapshots.json")

    # -- snapshot log -----------------------------------------------------
    def snapshots(self) -> list[dict]:
        if not os.path.exists(self._log_path):
            return []
        with open(self._log_path) as f:
            return json.load(f)

    def _append_snapshot(self, entry: dict) -> int:
        log = self.snapshots()
        entry["snapshot_id"] = len(log) + 1
        log.append(entry)
        tmp = self._log_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(log, f, indent=1)
        os.replace(tmp, self._log_path)  # atomic commit point
        return entry["snapshot_id"]

    # -- version resolution ----------------------------------------------
    def _version_dir(self, stage: str, version: int) -> str:
        return os.path.join(self.root, stage, f"v{version}")

    def _versions(self, stage: str) -> list[int]:
        base = os.path.join(self.root, stage)
        if not os.path.isdir(base):
            return []
        out = []
        for d in os.listdir(base):
            if d.startswith("v") and d[1:].isdigit():
                out.append(int(d[1:]))
        return sorted(out)

    def _active_version(self, stage: str) -> int | None:
        """Highest committed, non-invalidated version.

        Committed = _SUCCESS present AND recorded in the snapshot log;
        the log append is the single commit point, so a crash after the
        parquet write but before the log append leaves an invisible
        orphan directory (re-run supersedes it), never a half-committed
        'done' stage (r03 review)."""
        logged = {e["version"] for e in self.snapshots() if e["stage"] == stage}
        for v in reversed(self._versions(stage)):
            vd = self._version_dir(stage, v)
            if (
                v in logged
                and os.path.exists(os.path.join(vd, "_SUCCESS"))
                and not os.path.exists(os.path.join(vd, "_INVALIDATED"))
            ):
                return v
        return None

    def _dir(self, stage: str) -> str:
        v = self._active_version(stage)
        if v is None:
            v = (self._versions(stage)[-1] + 1) if self._versions(stage) else 1
        return self._version_dir(stage, v)

    def is_done(self, stage: str) -> bool:
        return self._active_version(stage) is not None

    def lineage(self, stage: str) -> dict:
        if self._active_version(stage) is None:
            raise ValueError(f"stage {stage!r} has no committed snapshot")
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
        if self._is_append_stage(name):
            raise ValueError(
                f"{name!r} is an append stage — use append_stage/read_all"
            )
        if self.is_done(name):
            return self.read(name)
        versions = self._versions(name)
        out = self._version_dir(name, (versions[-1] + 1) if versions else 1)
        t0 = time.time()
        df = fn(self.spark)
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(out)
        elapsed = time.time() - t0

        snap = self.spark.read.parquet(out)
        # per-partition lineage from the parquet FOOTERS (driver-side,
        # pyarrow): the old groupBy(input_file_name) rescanned the whole
        # just-written snapshot purely for metrics (r03 review)
        import glob as _glob

        import pyarrow.parquet as _pq

        files = sorted(
            _glob.glob(os.path.join(out, "**", "*.parquet"), recursive=True)
        )
        per_file = [
            {"file": os.path.basename(f), "rows": _pq.ParquetFile(f).metadata.num_rows}
            for f in files
        ]
        n_rows = sum(r["rows"] for r in per_file)
        manifest = {
            "stage": name,
            "inputs": inputs or [],
            "elapsed_sec": round(elapsed, 3),
            "n_rows": n_rows,
            "rows_per_sec": round(n_rows / elapsed, 1) if elapsed > 0 else None,
            "partitions": per_file,
            "schema": snap.schema.simpleString(),
            "committed_at_unix": int(time.time()),
        }
        with open(os.path.join(out, "_lineage.json"), "w") as f:
            json.dump(manifest, f, indent=1)
        self._append_snapshot(
            {
                "stage": name,
                "version": int(os.path.basename(out)[1:]),
                "n_rows": n_rows,
                "committed_at_unix": manifest["committed_at_unix"],
            }
        )
        return snap

    def _is_append_stage(self, stage: str) -> bool:
        return any(
            e["stage"] == stage and e.get("mode") == "append" for e in self.snapshots()
        )

    def read(self, stage: str, snapshot_id: int | None = None) -> DataFrame:
        """Current snapshot (append stages: union of ALL committed
        batches — Iceberg table-read semantics), or time-travel to a
        specific snapshot_id."""
        if snapshot_id is None:
            if self._is_append_stage(stage):
                return self.read_all(stage)
            if self._active_version(stage) is None:
                raise ValueError(f"stage {stage!r} has no committed snapshot")
            return self.spark.read.parquet(self._dir(stage))
        for e in self.snapshots():
            if e["snapshot_id"] == snapshot_id:
                if e["stage"] != stage:
                    raise ValueError(
                        f"snapshot {snapshot_id} belongs to stage {e['stage']!r}"
                    )
                return self.spark.read.parquet(self._version_dir(stage, e["version"]))
        raise ValueError(f"unknown snapshot_id {snapshot_id}")

    def invalidate(self, stage: str):
        """Start a new version on the next run; the old snapshot stays
        readable via its snapshot_id (time travel — nothing is deleted)."""
        v = self._active_version(stage)
        if v is not None:
            open(os.path.join(self._version_dir(stage, v), "_INVALIDATED"), "w").close()



def _committed_dirs(p: "Pipeline", stage: str) -> dict[int, str]:
    out = {}
    for e in p.snapshots():
        if e["stage"] != stage:
            continue
        vd = p._version_dir(stage, e["version"])
        if os.path.exists(os.path.join(vd, "_SUCCESS")) and not os.path.exists(
            os.path.join(vd, "_INVALIDATED")
        ):
            out[e["snapshot_id"]] = vd
    return out


def append_stage(p: "Pipeline", name: str, fn) -> int:
    """Batch-incremental ingest: each call appends a NEW snapshot holding
    only this batch's rows (the Iceberg append-commit analog); returns
    its snapshot_id.  Consumers use ``read_all`` for the full table or
    ``read_incremental(since)`` for exactly the rows committed after a
    known snapshot — the `option("start-snapshot-id", …)` pattern."""
    if any(e["stage"] == name and e.get("mode") != "append" for e in p.snapshots()):
        # the reverse of stage()'s guard: appending to a batch stage
        # would silently flip read() to read_all and union the old batch
        # snapshot with the append batches (r03 review)
        raise ValueError(f"{name!r} is a batch stage — use stage()/invalidate()")
    versions = p._versions(name)
    out = p._version_dir(name, (versions[-1] + 1) if versions else 1)
    df = fn(p.spark)
    df.write.mode("overwrite").parquet(out)
    n_rows = p.spark.read.parquet(out).count()
    return p._append_snapshot(
        {
            "stage": name,
            "version": int(os.path.basename(out)[1:]),
            "mode": "append",
            "n_rows": n_rows,
            "committed_at_unix": int(time.time()),
        }
    )


def read_all(p: "Pipeline", stage: str) -> DataFrame:
    dirs = list(_committed_dirs(p, stage).values())
    if not dirs:
        raise ValueError(f"no committed snapshots for stage {stage!r}")
    return p.spark.read.parquet(*dirs)


def read_incremental(p: "Pipeline", stage: str, since_snapshot_id: int) -> DataFrame:
    """Rows committed strictly AFTER the given snapshot id."""
    dirs = [d for sid, d in _committed_dirs(p, stage).items() if sid > since_snapshot_id]
    if not dirs:
        any_dir = next(iter(_committed_dirs(p, stage).values()), None)
        if any_dir is None:
            raise ValueError(f"no committed snapshots for stage {stage!r}")
        return p.spark.read.parquet(any_dir).limit(0)
    return p.spark.read.parquet(*dirs)


Pipeline.append_stage = append_stage
Pipeline.read_all = read_all
Pipeline.read_incremental = read_incremental


def merge_rollup(
    base_rollup: DataFrame,
    delta: DataFrame,
    keys: list[str],
    sums: dict[str, str],
) -> DataFrame:
    """Incremental materialized-view maintenance for additive rollups:
    fold a DELTA batch into an existing per-key aggregate WITHOUT
    rescanning the base fact table — the reason the snapshot log exists
    (at 10^12 rows a nightly full recompute of the tile pyramid is the
    single most expensive job you can delete).

    ``sums`` maps output column → input expression summed over the delta
    (counts are sums of 1); additive measures only (sum/count — min/max
    and distinct are not incrementally maintainable without auxiliary
    state, and this function refuses to pretend otherwise).

    Identity proven by the driver oracle: merge(rollup(A), B) ==
    rollup(A ∪ B), exactly (integer/decimal measures).

    Plan: aggregate the (small) delta, then ONE outer-merge groupBy over
    base ∪ delta-agg — the shuffle moves only |keys of base| +
    |keys of delta| rollup rows, never facts.
    """
    from pyspark.sql import functions as F

    dagg = delta.groupBy(*keys).agg(
        *[F.sum(F.expr(expr)).alias(out) for out, expr in sums.items()]
    )
    cols = list(sums)
    return (
        base_rollup.select(*keys, *cols)
        .unionByName(dagg.select(*keys, *cols))
        .groupBy(*keys)
        .agg(*[F.sum(c).alias(c) for c in cols])
    )
