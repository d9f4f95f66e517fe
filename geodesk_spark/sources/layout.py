"""Storage layout — the TIP walk-order clustering applied to parquet.

The reference clusters tile blobs in GOL files along the tile-index
walk so spatially-close tiles are byte-close (SURVEY §1.4/§2.1).  On a
data lake the same idea is Z-ORDER LAYOUT: partition (and sort) the
fact table by a Morton-cell prefix, so a bbox query's cell-range
predicate becomes PARTITION PRUNING — the scan never opens files
outside the query window.  At 100 TB this is the difference between
reading the world and reading a city.

``write_zordered`` materializes points partitioned by the zoom-k Morton
prefix and sorted by the fine Morton key within each partition (row-
group min/max stats then prune further inside each file).
``bbox_partition_filter`` compiles a bbox to the exact prefix IN-list a
reader needs; tests assert via ``inputFiles()`` that Spark actually
skips the other partitions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from geodesk_spark.geo import curve


def with_morton_prefix(df: DataFrame, zoom: int = 4) -> DataFrame:
    """Adds z{zoom} (the coarse Morton cell = partition key) and
    _zfine (zoom-16 Morton key = in-file sort key)."""
    z = curve.morton_cell_col(F.col("x"), F.col("y"), zoom).alias(f"z{zoom}")
    zf = curve.morton_cell_col(F.col("x"), F.col("y"), 16).alias("_zfine")
    return df.select("*", z, zf)


def write_zordered(df: DataFrame, path: str, zoom: int = 4) -> None:
    """Hive-partition by the coarse Morton cell, Z-sorted within files."""
    (
        with_morton_prefix(df, zoom)
        .repartition(F.col(f"z{zoom}"))
        .sortWithinPartitions("_zfine")
        .write.mode("overwrite")
        .partitionBy(f"z{zoom}")
        .parquet(path)
    )


def bbox_prefix_values(bbox: tuple[int, int, int, int], zoom: int = 4) -> list[int]:
    """All zoom-``zoom`` Morton cells intersecting the bbox — the exact
    partition IN-list for a bbox read (driver-side tile enumeration,
    the same walk the reference's tile index does)."""
    import numpy as np

    minx, miny, maxx, maxy = bbox
    step = 1 << (32 - zoom)
    cols = np.arange((minx + (1 << 31)) // step, (maxx + (1 << 31)) // step + 1, dtype=np.int64)
    rows = np.arange(((1 << 31) - 1 - maxy) // step, ((1 << 31) - 1 - miny) // step + 1, dtype=np.int64)
    cc, rr = np.meshgrid(cols, rows)
    # one vectorized kernel call over all cell corners (was one
    # single-element call per cell in a nested Python loop — r03 review)
    xs = cc.ravel() * step - (1 << 31)
    ys = (1 << 31) - 1 - rr.ravel() * step
    cells = curve.morton_cell(xs, ys, zoom)
    return sorted({int(v) for v in cells.tolist()})


def bbox_partition_filter(bbox: tuple[int, int, int, int], zoom: int = 4) -> Column:
    """Partition-pruning predicate for a z-ordered dataset."""
    return F.col(f"z{zoom}").isin(bbox_prefix_values(bbox, zoom))


def write_bucketed(
    df: DataFrame, table: str, key: str, n_buckets: int = 16
) -> None:
    """Materialize a table BUCKETED by the join key (Spark bucketBy +
    sortBy): every future equi-join or aggregation on ``key`` between
    tables bucketed the same way runs with ZERO shuffle — the storage
    layout carries the partitioning, the co-location a 100 TB pipeline
    sets up once for its hottest join key (e.g. the tile id between the
    feature table and the per-tile index).  Pair with
    ``spark.sql.sources.bucketing.enabled`` (on by default); the
    no-Exchange plan is asserted in tests/test_tile.py.
    """
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .format("parquet")
        .saveAsTable(table)
    )
