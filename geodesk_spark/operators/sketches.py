"""Mergeable sketches for 100 TB rollups — HyperLogLog approx-distinct.

The reference computes exact counts per query (Features.count); at
10^12 rows a per-key COUNT(DISTINCT) is a full shuffle of every
distinct value.  The standard scale answer is a *mergeable sketch*:
each partition reduces its rows to a fixed 2^p-register state
(map-side combine — bytes per key, not rows), register states merge
associatively across partitions/tiles/days, and the estimate is read
off the merged state.  This mirrors how the reference's tile pyramid
merges child-tile statistics upward (tile rollup, SURVEY §2.4).

Spark's built-in ``approx_count_distinct`` is exactly this — but its
hash is JVM-internal, so its registers can't be cross-checked by an
independent engine.  This module builds the sketch from FIRST
PRINCIPLES on a *portable deterministic hash* (md5, identical text in
every SQL engine), which makes the register state itself bit-exact
reproducible in DuckDB — the driver oracle checks the registers, and
pytest pins the estimator's error bound and its invariance to
partitioning.

Hash layout (p = register-index bits, default 9 → m = 512 registers):

    h60    = first 15 hex chars of md5(value) as a 60-bit integer
    bucket = h60 mod 2^p                      (register index)
    w      = h60 >> p                         (a (60-p)-bit window)
    rho    = leading zeros of w in that window + 1
           = (60-p) - floor(log2(w))          (w>0; via length(bin(w)))
           = (60-p) + 1                       (w = 0)

All integer arithmetic — no float enters until the final estimate, so
registers match across Spark/DuckDB/numpy exactly.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

HEX = "0123456789abcdef"


def h60_sql(col: str) -> str:
    """Portable SQL for the 60-bit md5 prefix of ``col`` — runs verbatim
    in DuckDB (the oracle side).  Integer-exact, so any engine's native
    hex→int (Spark ``conv``) produces the identical value."""
    # Weights below 2^31 would otherwise type as 32-bit INT in Spark's
    # ANSI mode and overflow in (pos-1)*weight — force bigint.
    terms = [
        f"(position(substr(md5({col}), {i + 1}, 1) in '{HEX}') - 1)"
        f" * cast({16 ** (14 - i)} as bigint)"
        for i in range(15)
    ]
    return "(" + " + ".join(terms) + ")"


def hll_sql(col: str, p: int = 9) -> tuple[str, str]:
    """(bucket_sql, rho_sql) — portable SQL fragments over ``col``.

    ``w`` is recovered by exact-double division ((h - h%2^p) / 2^p ≤
    2^51, below the 2^53 double-mantissa limit) because integer-shift
    syntax differs across engines; ``bin()`` (minimal binary string) is
    common to Spark and DuckDB and gives floor(log2) via length()."""
    h = h60_sql(col)
    m = 1 << p
    bucket = f"({h} % {m})"
    w = f"cast(({h} - {h} % {m}) / {m} as bigint)"
    wbits = 60 - p
    rho = (
        f"(case when {w} = 0 then {wbits + 1} "
        f"else {wbits + 1} - length(bin({w})) end)"
    )
    return bucket, rho


def hll_registers(
    df: DataFrame, keys: list[str], value_col: str, p: int = 9
) -> DataFrame:
    """Per-key HLL register state: (keys…, bucket, rho) with rho = the
    register max.  ONE aggregation — Spark's partial-aggregate pass
    reduces every partition to ≤ m rows per key before the shuffle, so
    shuffle volume is O(keys × m), independent of row count.  The output
    is the mergeable sketch: states for the same key from different
    scans/days merge by a further groupBy(bucket) → max(rho)."""
    bucket_sql, rho_sql = hll_sql(value_col, p)
    return (
        df.withColumn("bucket", F.expr(bucket_sql).cast("int"))
        .withColumn("_rho", F.expr(rho_sql).cast("int"))
        .groupBy(*keys, "bucket")
        .agg(F.max("_rho").alias("rho"))
    )


def hll_estimate(
    df: DataFrame, keys: list[str], value_col: str, p: int = 9
) -> DataFrame:
    """Per-key approximate distinct count from the register state.

    Standard HLL estimator (Flajolet et al. 2007): alpha_m · m² /
    Σ 2^-M_j with empty registers contributing 2^0, plus the
    small-range linear-counting correction E ≤ 2.5m ∧ V>0 →
    m·ln(m/V).  Relative error ≈ 1.04/√m (~4.6 % at p=9) — pinned in
    tests/test_sketches.py, alongside partitioning-invariance (the
    registers, and therefore the estimate, cannot depend on how rows
    were split across tasks)."""
    m = 1 << p
    alpha = 0.7213 / (1 + 1.079 / m)
    regs = hll_registers(df, keys, value_col, p)
    agg = regs.groupBy(*keys).agg(
        F.sum(F.pow(F.lit(2.0), -F.col("rho"))).alias("_sum_pow"),
        F.count("*").alias("_nonempty"),
    )
    empty = F.lit(m) - F.col("_nonempty")
    raw = F.lit(alpha * m * m) / (F.col("_sum_pow") + empty)
    corrected = F.when(
        (raw <= 2.5 * m) & (empty > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / empty),
    ).otherwise(raw)
    return agg.select(*keys, corrected.alias("approx_distinct"))


def hll_error_bound(p: int = 9) -> float:
    return 1.04 / math.sqrt(1 << p)
