"""Structured Streaming ingest for the image+caption table.

The reference is a static store with snapshot-swap updates
(common/store/FreeStore.java:56-61) and has no streaming surface
(SURVEY.md §2.7).  This module is the engine's incremental-ingest path:
new image batches land as parquet files, a file-source stream assigns
imp coordinates + tiles with the SAME JVM column expressions as the
batch path (geo/mercator.py, operators/tiling.py), and downstream
stateful operators run with exactly-once checkpointing.

Scale design:
- `maxFilesPerTrigger` bounds micro-batch size so a backlog of 10^6
  files drains in memory-bounded steps; with `Trigger.AvailableNow` the
  same job is a resumable batch-incremental drain (the cluster-friendly
  mode — run it from cron, it picks up where the checkpoint left off).
- State is keyed by (window, tile) / (tile): bounded by the tile
  pyramid (≤4^z keys per zoom), not by input size; the watermark evicts
  closed windows so state never grows with stream length.
- The stateful kernel is `applyInPandasWithState` — Arrow-batched
  pandas, no per-row Python, mirroring the batch engine's UDF rules.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import StructType

from geodesk_spark.operators import tiling
from geodesk_spark.sources.synth import SCHEMA_DDL

# ingest event-time column appended by the producer (epoch seconds)
STREAM_SCHEMA_DDL = SCHEMA_DDL + ", ingest_ts timestamp"


def read_image_stream(
    spark: SparkSession, input_dir: str, max_files_per_trigger: int = 8
) -> DataFrame:
    """File-source stream of image+caption rows (parquet dir)."""
    return (
        spark.readStream.schema(STREAM_SCHEMA_DDL)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )


def with_stream_tiles(stream_df: DataFrame, zoom: int = 8) -> DataFrame:
    """imp encode + tile assignment on a stream — identical JVM column
    expressions as the batch path, so batch and stream agree bit-for-bit."""
    pts = tiling.with_imp_coords(stream_df)
    from geodesk_spark.geo import tile as T

    return pts.withColumn("tile", T.tile_col(F.col("x"), F.col("y"), zoom))


def windowed_tile_counts(
    tiled: DataFrame,
    window: str = "10 minutes",
    watermark: str = "20 minutes",
) -> DataFrame:
    """Per-tile windowed ingest counts with late-data handling.

    Watermark bounds state: a (window, tile) group is finalized and
    evicted once event time passes window end + watermark; later rows
    are dropped (counted upstream via observe() metrics if needed)."""
    return (
        tiled.withWatermark("ingest_ts", watermark)
        .groupBy(F.window("ingest_ts", window).alias("win"), "tile")
        .agg(
            F.count("*").alias("n_rows"),
            F.approx_count_distinct("image_id").alias("n_distinct_ids"),
        )
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "tile",
            "n_rows",
            "n_distinct_ids",
        )
    )


def streaming_dedup(tiled: DataFrame, watermark: str = "20 minutes") -> DataFrame:
    """Exactly-once image_id dedup across micro-batches: a re-ingested
    id is dropped even when it arrives with a DIFFERENT timestamp, as
    long as the copies fall within the watermark window — state is keyed
    by image_id alone and evicted after the watermark passes
    (dropDuplicatesWithinWatermark; the streaming analog of exact_dedup)."""
    return tiled.withWatermark("ingest_ts", watermark).dropDuplicatesWithinWatermark(
        ["image_id"]
    )


_TILE_STATE_SCHEMA = "n long, sum_x double, sum_y double"
_TILE_OUT_SCHEMA = "tile int, n_total long, cx double, cy double"


def _tile_stats_fn(
    key, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Running per-tile count + centroid, carried across micro-batches."""
    n, sx, sy = state.get if state.exists else (0, 0.0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        sx += float(pdf["x"].sum())
        sy += float(pdf["y"].sum())
    state.update((n, sx, sy))
    yield pd.DataFrame(
        {"tile": [key[0]], "n_total": [n], "cx": [sx / max(n, 1)], "cy": [sy / max(n, 1)]}
    )


def running_tile_stats(tiled: DataFrame) -> DataFrame:
    """Custom stateful operator: applyInPandasWithState keyed by tile.

    Demonstrates the engine's arbitrary-stateful surface (the batch
    engine's applyInPandas kernels lift to streaming unchanged: same
    Arrow batch shape, plus a GroupState handle).  State size = one
    12-byte tuple per live tile."""
    return (
        tiled.select("tile", "x", "y")
        .groupBy("tile")
        .applyInPandasWithState(
            _tile_stats_fn,
            outputStructType=_TILE_OUT_SCHEMA,
            stateStructType=_TILE_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def drain_available_now(
    result: DataFrame, out_dir: str, checkpoint_dir: str, output_mode: str = "append"
) -> None:
    """Run the stream to exhaustion of currently-available files, then
    stop — the resumable batch-incremental mode.  Re-invoking after new
    files arrive processes ONLY the delta (file ledger + state live in
    the checkpoint), the streaming analog of streaming/checkpoint.py's
    stage-skip rule."""
    q = (
        result.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def drain_to_memory(
    spark: SparkSession, result: DataFrame, name: str, checkpoint_dir: str, output_mode: str
) -> DataFrame:
    """AvailableNow drain into an in-memory sink (tests/small results).
    NB: the memory sink cannot RESUME from a checkpoint — use
    drain_foreach_batch for resumable drains."""
    q = (
        result.writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def drain_foreach_batch(
    result: DataFrame, out_dir: str, checkpoint_dir: str, output_mode: str = "update"
) -> None:
    """Resumable AvailableNow drain via foreachBatch → parquet append.

    Unlike the memory/file sinks, foreachBatch supports BOTH update-mode
    stateful output and checkpoint recovery; each micro-batch appends
    its rows stamped with batch_id, so the latest batch_id per key is
    the current value (an upsert log — in production the writer would be
    an Iceberg MERGE).  Exactly-once: Spark replays an interrupted batch
    under the same batch_id; readers reduce by max(batch_id)."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.withColumn("batch_id", F.lit(batch_id)).write.mode("append").parquet(
            out_dir
        )

    q = (
        result.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
