"""Skew handling for hot tiles (dense cities).

GeoDesk handles density skew at BUILD time: the tile tree simply has
deeper zoom levels where density demands (ZoomLevels.java:98-113,
TileIndexWalker.java:85-107 — a z8 tile with too many features gets z10
children).  The Spark analogs, per SURVEY.md §4.3.5:

1. AQE skew-join splitting (enabled in session.py) — runtime re-plan.
2. ``salt_hot_tiles`` — explicit salting: hot tiles get a per-row salt
   so a repartition spreads one hot key over k partitions.
3. ``adaptive_cell_split`` — the direct GeoDesk analog: rows in
   over-dense cells are re-encoded at a deeper zoom (cell → 4^step
   children), producing a cell column whose key histogram is bounded;
   downstream groupBy/join on ``cell_adaptive`` has no hot key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from geodesk_spark.geo import tile as T


def tile_histogram(df: DataFrame, tile_col: str) -> DataFrame:
    return df.groupBy(tile_col).agg(F.count("*").alias("n"))


def with_salt(
    df: DataFrame,
    tile_col: str,
    rows_per_partition: int = 100_000,
    sample_fraction: float | None = None,
) -> DataFrame:
    """Add a ``salt`` column: 0 for cold tiles; hot tiles are split into
    ceil(n / rows_per_partition) salts.  No repartition — the salt only
    becomes physical when a downstream shuffle keys on (tile, salt).

    One extra aggregate pass computes the histogram (broadcast back);
    at 100 TB this is a cheap map-side-combined count on the tile key —
    or pass ``sample_fraction`` to detect hot keys from a seeded sample
    with the threshold scaled accordingly (the standard sampled skew
    detection: a key hot enough to need salting is, by definition, far
    too frequent to be missed by a 1-10 % sample).  Salting affects the
    PLAN only, never the answer, so sampling the histogram is always
    result-safe.
    """
    hist_src = (
        df.sample(fraction=sample_fraction, seed=42) if sample_fraction else df
    )
    scale = 1.0 / sample_fraction if sample_fraction else 1.0
    hist = tile_histogram(hist_src, tile_col).withColumn(
        "n_salts",
        F.ceil(F.col("n") * F.lit(scale) / F.lit(rows_per_partition)).cast("int"),
    ).filter(F.col("n_salts") > 1)
    return (
        df.join(F.broadcast(hist.select(tile_col, "n_salts")), tile_col, "left")
        .withColumn(
            "salt",
            F.when(
                F.col("n_salts").isNotNull(),
                (F.rand(seed=42) * F.col("n_salts")).cast("int"),
            ).otherwise(F.lit(0)),
        )
        .drop("n_salts")
    )


def salt_hot_tiles(df: DataFrame, tile_col: str, rows_per_partition: int = 100_000) -> DataFrame:
    """``with_salt`` + an explicit ``repartition(tile, salt)``.

    Use ONLY when a per-partition kernel needs physical co-location of
    each (tile, salt) slice (e.g. mapInPandas raster work): the
    repartition is a full-data shuffle.  For aggregations, use
    ``with_salt`` + a two-stage groupBy instead — the partial aggregate
    shuffles on (tile, salt) by itself, one shuffle cheaper.
    """
    return with_salt(df, tile_col, rows_per_partition).repartition(
        F.col(tile_col), F.col("salt")
    )


def adaptive_cell_split(
    df: DataFrame,
    max_rows_per_cell: int = 50_000,
    base_zoom: int = 8,
    max_zoom: int = T.MAX_ZOOM,
    step: int = 2,
) -> DataFrame:
    """GeoDesk-style tile subdivision as a column rewrite: starting from
    ``tile_z{base_zoom}``, any cell with more rows than the cap is
    re-encoded ``step`` zooms deeper, repeatedly until the cap holds or
    max_zoom is reached.  Needs x/y columns; emits ``cell_adaptive``.
    """
    out = df.withColumn("cell_adaptive", F.col(f"tile_z{base_zoom}").cast("long"))
    zoom = base_zoom
    while zoom < max_zoom:
        next_zoom = min(zoom + step, max_zoom)
        hot = (
            out.groupBy("cell_adaptive")
            .agg(F.count("*").alias("n"))
            .filter(F.col("n") > max_rows_per_cell)
            .select("cell_adaptive")
            .withColumn("_hot", F.lit(True))
        )
        # Re-encode only rows in hot cells AT THE CURRENT ZOOM (cells
        # already deeper are left alone: zoom_of(cell) == zoom).
        out = (
            out.join(F.broadcast(hot), "cell_adaptive", "left")
            .withColumn(
                "cell_adaptive",
                F.when(
                    F.col("_hot").isNotNull()
                    & (F.shiftright(F.col("cell_adaptive"), 24) == zoom),
                    T.tile_col(F.col("x"), F.col("y"), next_zoom).cast("long"),
                ).otherwise(F.col("cell_adaptive")),
            )
            .drop("_hot")
        )
        zoom = next_zoom
    return out
