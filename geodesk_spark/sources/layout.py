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


def with_str_cells(
    df: DataFrame, nx: int = 8, ny: int = 8, id_col: str = "id"
) -> DataFrame:
    """Sort-Tile-Recursive (STR) packing cells — the classic R-tree
    bulk-load layout (Leutenegger et al. 1997), the third spatial
    layout next to Z-order and bucketing: rank rows by x into ``nx``
    equal SLICES, then rank each slice by y into ``ny`` cells.  Unlike
    the fixed Morton grid, STR adapts to the DATA distribution — every
    cell holds ~N/(nx·ny) rows no matter how skewed the field, which is
    exactly what balances file sizes under city-scale hot spots.

    This is the EXACT path (ntile over total orders, ties broken by
    ``id_col``): deterministic and engine-portable, used for parity and
    for bounded inputs (a tile's worth of features, a dimension layer).
    It requires two global sorts — for the fact-table WRITE path use
    ``write_str_packed``, which gets the same cells from SAMPLED
    boundaries with no global sort.

    Adds integer ``sx`` (1..nx), ``sy`` (1..ny).
    """
    from pyspark.sql import Window

    sx = F.ntile(nx).over(Window.orderBy(F.col("x"), F.col(id_col)))
    out = df.select("*", sx.alias("sx"))
    sy = F.ntile(ny).over(
        Window.partitionBy("sx").orderBy(F.col("y"), F.col(id_col))
    )
    return out.select("*", sy.alias("sy"))


def str_pack_stats(
    df: DataFrame, nx: int = 8, ny: int = 8, id_col: str = "id"
) -> DataFrame:
    """Per-STR-cell packing manifest: row count and the cell's tight
    bbox — the numbers a bulk-loader writes next to each file so a
    bbox reader can prune (min/max stats ARE the R-tree node rects).
    All columns exact integers — hash-stable across engines."""
    return (
        with_str_cells(df, nx, ny, id_col)
        .groupBy("sx", "sy")
        .agg(
            F.count("*").alias("n"),
            F.min("x").alias("minx"),
            F.max("x").alias("maxx"),
            F.min("y").alias("miny"),
            F.max("y").alias("maxy"),
        )
    )


def write_str_packed(
    df: DataFrame, path: str, nx: int = 8, ny: int = 8
) -> None:
    """STR bulk-load WRITE path at scale: slice boundaries come from
    ``approx_percentile`` (one sampled aggregate, no global sort), cell
    assignment is a broadcast-free narrow map against the boundary
    arrays, and the write hive-partitions by the cell id so a bbox
    reader opens only intersecting cells.  Two passes over the facts
    (bounds sample + write), zero wide shuffles besides the final
    partitioned write — the 100 TB shape.
    """
    qs = [i / nx for i in range(1, nx)]
    [xb] = df.agg(F.percentile_approx("x", qs, 10_000).alias("b")).collect()
    xbounds = list(xb["b"]) or []
    sx = F.lit(1)
    for i, b in enumerate(xbounds):
        sx = sx + F.when(F.col("x") > F.lit(int(b)), 1).otherwise(0)
    sliced = df.withColumn("sx", sx)
    yq = [i / ny for i in range(1, ny)]
    ybounds = {
        r["sx"]: list(r["b"])
        for r in sliced.groupBy("sx")
        .agg(F.percentile_approx("y", yq, 10_000).alias("b"))
        .collect()
    }
    sy = F.lit(1)
    for i in range(1, ny):
        # per-slice boundary lookup compiled to a CASE chain (nx·ny
        # literals total — tiny), keeping the assignment a narrow map
        cond = F.lit(False)
        for s, bs in ybounds.items():
            if len(bs) >= i:
                cond = cond | ((F.col("sx") == s) & (F.col("y") > F.lit(int(bs[i - 1]))))
        sy = sy + F.when(cond, 1).otherwise(0)
    cells = sliced.withColumn("sy", sy).withColumn(
        "str_cell", (F.col("sx") * (ny + 1) + F.col("sy")).cast("int")
    )
    (
        cells.repartition(F.col("str_cell"))
        .sortWithinPartitions("x", "y")
        .write.mode("overwrite")
        .partitionBy("str_cell")
        .parquet(path)
    )


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
