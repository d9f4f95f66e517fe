"""Tag-layer statistics — the taginfo surface of the OSM ecosystem.

The reference's tag layer is queried by GOQL; the ecosystem's standard
companion is key/value frequency statistics (taginfo: how many features
carry a key, how many distinct values, what the dominant value is).
Pure composition: map explode → (key, value) counts with map-side
combine → per-key rank + rollup that reuses the count shuffle's
partitioning — two bounded shuffles regardless of corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def tag_stats(features: DataFrame, tags_col: str = "tags") -> DataFrame:
    """Per tag key: feature count, distinct value count, dominant value
    (ties → lexicographically smallest) and its count.

    → (tag_key, n_features, n_values, top_value, top_n)."""
    kv = features.select(F.explode(F.col(tags_col)).alias("k", "v"))
    g = kv.groupBy("k", "v").agg(F.count("*").alias("c"))
    w = Window.partitionBy("k").orderBy(F.desc("c"), "v")
    return (
        g.withColumn("rn", F.row_number().over(w))
        .groupBy("k")
        .agg(
            F.sum("c").alias("n_features"),
            F.count("*").cast("int").alias("n_values"),
            F.max(F.when(F.col("rn") == 1, F.col("v"))).alias("top_value"),
            F.max(F.when(F.col("rn") == 1, F.col("c"))).alias("top_n"),
        )
        .withColumnRenamed("k", "tag_key")
    )
