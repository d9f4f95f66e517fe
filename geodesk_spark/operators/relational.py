"""Relational operators Spark lacks natively — as-of join.

The reference has no temporal joins (SURVEY §2.3); a training-data
pipeline needs them constantly (join each event to the latest model/
config/metrics snapshot at or before its timestamp).  Composition of
existing DataFrame ops per the build rules: no UDF, one shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    by: str,
    left_ts: str = "ts",
    right_ts: str = "rts",
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """For each left row, attach the right row with the greatest
    ``right_ts`` ≤ ``left_ts`` within the same ``by`` key (backward
    as-of join, DuckDB/kdb semantics).

    Plan: union the two sides tagged 0 (right) / 1 (left), sort within
    each ``by`` partition by (ts, tag), and carry the latest right
    payload forward with ``last(..., ignorenulls=True)`` — ONE shuffle
    (the window sort), no join explosion, no UDF.  Ties (equal
    timestamps) resolve to the right row, matching ASOF's ≤.  At 100 TB
    the shuffle is on the natural (by, ts) clustering, and a skewed key
    salts like any window (operators/skew.py).
    """
    lcols = [c for c in left.columns]
    rpay = [c for c in right.columns if c not in (by, right_ts)]

    lhs = left.select(
        F.col(by),
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_tag"),
        *[F.col(c) for c in lcols if c != by],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in rpay],
        F.lit(None).cast(right.schema[right_ts].dataType).alias("_rts"),
    )
    rhs = right.select(
        F.col(by),
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_tag"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c != by],
        *[F.col(c).alias(f"_r_{c}") for c in rpay],
        F.col(right_ts).alias("_rts"),
    )
    w = (
        Window.partitionBy(by)
        .orderBy(F.col("_t").asc(), F.col("_tag").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = lhs.unionByName(rhs).select(
        "*",
        *[F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"_rv_{c}") for c in rpay],
        F.last("_rts", ignorenulls=True).over(w).alias("_rv_ts"),
    )
    out = carried.filter(F.col("_tag") == 1)
    if tolerance_seconds is not None:
        keep = (
            F.col("_rv_ts").isNotNull()
            & (F.col("_t").cast("double") - F.col("_rv_ts").cast("double") <= tolerance_seconds)
        )
        out = out.select(
            "*", *[F.when(keep, F.col(f"_rv_{c}")).alias(f"_rk_{c}") for c in rpay]
        )
        rename = {f"_rk_{c}": c for c in rpay}
    else:
        rename = {f"_rv_{c}": c for c in rpay}
    return out.select(
        F.col(by),
        F.col("_t").alias(left_ts),
        *[F.col(c) for c in lcols if c not in (by, left_ts)],
        *[F.col(old).alias(new) for old, new in rename.items()],
    )
