"""Structured Streaming ingest: exactly-once resume across drains,
batch/stream tile-assignment agreement, stateful per-tile accumulation."""

import pandas as pd
import pytest

from pyspark.sql import functions as F

from geodesk_spark.operators import tiling
from geodesk_spark.sources import synth
from geodesk_spark.streaming import stream


def _produce(spark, input_dir: str, n: int, id_offset: int, ts: str):
    df = (
        synth.images_df(spark, n, with_bytes=False, partitions=2)
        .withColumn(
            "image_id", F.concat(F.lit(f"b{id_offset}_"), F.col("image_id"))
        )
        .withColumn("ingest_ts", F.lit(ts).cast("timestamp"))
    )
    df.write.mode("append").parquet(input_dir)


def _latest(pdf: pd.DataFrame, keys: list[str], val: str) -> pd.Series:
    """Current value per key from the foreachBatch upsert log."""
    return (
        pdf.sort_values("batch_id").groupby(keys).last()[val]
    )


def test_stream_counts_resume_exactly_once(spark, tmp_path):
    input_dir = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    _produce(spark, input_dir, 300, 0, "2024-01-01 00:01:00")
    tiled = stream.with_stream_tiles(stream.read_image_stream(spark, input_dir))
    counts = stream.windowed_tile_counts(tiled)

    stream.drain_foreach_batch(counts, out, ckpt)
    got1 = spark.read.parquet(out).toPandas()
    assert int(_latest(got1, ["win_start", "tile"], "n_rows").sum()) == 300

    # second batch lands; a NEW drain from the same checkpoint must
    # process only the delta and never double-count batch 1
    _produce(spark, input_dir, 200, 1, "2024-01-01 00:02:00")
    stream.drain_foreach_batch(counts, out, ckpt)
    got2 = spark.read.parquet(out).toPandas()
    assert int(_latest(got2, ["win_start", "tile"], "n_rows").sum()) == 500

    # idempotence: a drain with no new files changes nothing
    stream.drain_foreach_batch(counts, out, ckpt)
    got3 = spark.read.parquet(out).toPandas()
    assert int(_latest(got3, ["win_start", "tile"], "n_rows").sum()) == 500


def test_stream_tiles_match_batch(spark, tmp_path):
    input_dir = str(tmp_path / "in")
    _produce(spark, input_dir, 250, 0, "2024-01-01 00:01:00")
    tiled = stream.with_stream_tiles(stream.read_image_stream(spark, input_dir))
    ckpt = str(tmp_path / "ck")
    got = (
        stream.drain_to_memory(
            spark, tiled.select("image_id", "x", "y", "tile"), "tb", ckpt, "append"
        )
        .toPandas()
        .set_index("image_id")
        .sort_index()
    )
    batch_df = spark.read.parquet(input_dir)
    from geodesk_spark.geo import tile as T

    want = (
        tiling.with_imp_coords(batch_df)
        .withColumn("tile", T.tile_col(F.col("x"), F.col("y"), 8))
        .select("image_id", "x", "y", "tile")
        .toPandas()
        .set_index("image_id")
        .sort_index()
    )
    assert (got == want).all().all()


def test_running_tile_stats_state_accumulates(spark, tmp_path):
    input_dir = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ck")
    _produce(spark, input_dir, 150, 0, "2024-01-01 00:01:00")
    tiled = stream.with_stream_tiles(stream.read_image_stream(spark, input_dir))
    stats = stream.running_tile_stats(tiled)
    stream.drain_foreach_batch(stats, out, ckpt)
    g1 = spark.read.parquet(out).toPandas()
    assert int(_latest(g1, ["tile"], "n_total").sum()) == 150

    _produce(spark, input_dir, 150, 1, "2024-01-01 00:02:00")
    stream.drain_foreach_batch(stats, out, ckpt)
    g2 = spark.read.parquet(out).toPandas()
    latest = _latest(g2, ["tile"], "n_total")
    # state carried across separate drains: totals cumulative, never reset
    assert int(latest.sum()) == 300
    first = _latest(g1, ["tile"], "n_total").reindex(latest.index).fillna(0)
    assert (latest >= first).all()


def test_streaming_dedup(spark, tmp_path):
    input_dir = str(tmp_path / "in")
    ckpt = str(tmp_path / "ck")
    # duplicate producer: same ids written twice — the second copy at a
    # LATER timestamp (the realistic re-ingest case)
    _produce(spark, input_dir, 100, 0, "2024-01-01 00:01:00")
    _produce(spark, input_dir, 100, 0, "2024-01-01 00:05:00")
    tiled = stream.with_stream_tiles(stream.read_image_stream(spark, input_dir))
    ded = stream.streaming_dedup(tiled).select("image_id")
    got = stream.drain_to_memory(spark, ded, "dd", ckpt, "append").toPandas()
    assert len(got) == 100
    assert got["image_id"].nunique() == 100


def test_streaming_geofence_state_bridges_batches(spark, tmp_path):
    """A user ENTERs in micro-batch 1 and EXITs in micro-batch 2: the
    carried state must suppress the duplicate-state row and classify the
    batch-2 transition correctly (vs the batch operator on the union)."""
    import os
    import time

    from geodesk_spark.operators import relational

    b1 = pd.DataFrame(
        {
            "user_id": [1, 1, 2],
            "ts_us": [100, 200, 100],
            "event_id": [0, 1, 2],
            "fence_id": [None, "A", "B"],
        }
    )
    b2 = pd.DataFrame(
        {
            "user_id": [1, 1, 2, 3],
            "ts_us": [300, 400, 300, 300],
            "event_id": [3, 4, 5, 6],
            "fence_id": ["A", None, "B", "C"],  # user1 still in A then exits
        }
    )
    indir = str(tmp_path / "in")
    os.makedirs(indir)
    b1.to_parquet(f"{indir}/b0.parquet", index=False)
    time.sleep(0.15)
    b2.to_parquet(f"{indir}/b1.parquet", index=False)
    sdf = (
        spark.readStream.schema("user_id long, ts_us long, event_id long, fence_id string")
        .option("maxFilesPerTrigger", 1)
        .parquet(indir)
    )
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    stream.drain_foreach_batch(
        stream.streaming_geofence_transitions(sdf), out, ck, "append"
    )
    log = spark.read.parquet(out)
    assert log.select(F.count_distinct("batch_id")).collect()[0][0] >= 2
    got = {
        (r["user_id"], r["ts_us"], r["prev_fence"], r["fence"], r["kind"])
        for r in log.collect()
    }
    batch_df = spark.createDataFrame(pd.concat([b1, b2], ignore_index=True))
    exp = {
        (r["user_id"], r["ts_us"], r["prev_fence"], r["fence"], r["kind"])
        for r in relational.geofence_transitions(batch_df, ts_col="ts_us").collect()
    }
    assert got == exp
    assert (1, 400, "A", None, "exit") in got  # the cross-batch exit
    assert (1, 300, "A", "A", "switch") not in got
