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
    # floor-form output quantization (CLAUDE.md transcendental law): the
    # small-range branch is m·ln(m/V) — a raw libm ln reaching the
    # compared output.  ln doesn't amplify like exp and V has ≤ m
    # distinct values, but a different engine build is one ulp away from
    # flipping the 9th significant digit; the estimate is ±4.6 % anyway,
    # so 6 dp is semantically free insurance (box_area_m2 lesson).
    q6 = F.floor(corrected * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)
    return agg.select(*keys, q6.alias("approx_distinct"))


def hll_error_bound(p: int = 9) -> float:
    return 1.04 / math.sqrt(1 << p)


# --- Count-min sketch --------------------------------------------------------

def cms_hash_sqls(col: str, w: int, d: int, salt: str = "cms") -> list[str]:
    """d portable row-hash SQL fragments: md5 over a per-depth salted
    value, reduced mod the sketch width.  Identical text runs in DuckDB,
    so the register counts are integer-exact across engines."""
    out = []
    for j in range(d):
        salted = f"concat('{salt}{j}:', {col})"
        out.append(f"({h60_sql(salted)} % {w})")
    return out


def cms_registers(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    w: int = 128,
    d: int = 4,
) -> DataFrame:
    """Per-key count-min register table (keys…, j, col, cnt).

    The frequency twin of the HLL sketch above: each partition reduces
    to ≤ d·w counter rows per key before the shuffle (map-side
    combine), register tables merge by element-wise ADD — the mergeable
    heavy-hitter / frequency primitive for 10^12-row streams (Cormode &
    Muthukrishnan 2005).  Estimate(v) = min_j cnt[j, hash_j(v)],
    biased high only (never under-counts) — pinned in
    tests/test_sketches.py along with merge associativity."""
    arr = F.array(
        *[
            F.struct(
                F.lit(j).alias("j"), F.expr(sql).cast("int").alias("col")
            )
            for j, sql in enumerate(cms_hash_sqls(value_col, w, d))
        ]
    )
    ex = df.withColumn("_h", F.explode(arr))
    return (
        ex.groupBy(*keys, F.col("_h.j").alias("j"), F.col("_h.col").alias("col"))
        .agg(F.count("*").alias("cnt"))
    )


def cms_estimate(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    probe: DataFrame,
    probe_col: str,
    w: int = 128,
    d: int = 4,
) -> DataFrame:
    """Point-frequency estimates for every probe value: build the
    register table, then ONE broadcast join of the probes' d hash
    columns against it and a min over depths.  Probe side is dimension-
    sized by construction (you ask about specific values); the register
    table is ≤ keys·d·w rows regardless of input scale.

    Empty registers COUNT AS ZERO: the (key-group × probe-hash) grid is
    LEFT-joined against the registers so a probe value whose register
    was never touched estimates 0 — an inner join would silently drop
    the untouched depths from the min, overestimating absent values and
    losing a probe row entirely when all d registers are empty
    (r03 code-review finding; the oracle mirrors the left join)."""
    regs = cms_registers(df, keys, value_col, w, d)
    parr = F.array(
        *[
            F.struct(F.lit(j).alias("j"), F.expr(sql).cast("int").alias("col"))
            for j, sql in enumerate(cms_hash_sqls(probe_col, w, d))
        ]
    )
    probes = probe.withColumn("_h", F.explode(parr)).select(
        F.col(probe_col).alias("probe_value"),
        F.col("_h.j").alias("j"),
        F.col("_h.col").alias("col"),
    )
    grid = regs.select(*keys).distinct().crossJoin(F.broadcast(probes))
    joined = grid.join(F.broadcast(regs), [*keys, "j", "col"], "left")
    return joined.groupBy(*keys, "probe_value").agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0).cast("long"))).alias("est_count")
    )


# --- Bloom filter ------------------------------------------------------------

def bloom_hash_sqls(col: str, m: int, k: int, salt: str = "blm") -> list[str]:
    """k portable bit positions in [0, m) for ``col``."""
    out = []
    for i in range(k):
        salted = f"concat('{salt}{i}:', {col})"
        out.append(f"({h60_sql(salted)} % {m})")
    return out


def bloom_bits(
    df: DataFrame, value_col: str, m: int = 8192, k: int = 4
) -> DataFrame:
    """Build-side Bloom filter as a sorted distinct-bit table (bit_idx).

    ≤ m rows however large the build input — broadcastable, mergeable
    by union+distinct.  The row form keeps the state engine-portable
    (bit-exact oracle); a 64-bit-word-packed variant is a trivial
    groupBy(bit_idx // 64) fold on top when wire size matters."""
    pos = F.array(*[F.expr(s).cast("int") for s in bloom_hash_sqls(value_col, m, k)])
    return df.select(F.explode(pos).alias("bit_idx")).distinct()


def bloom_might_contain(
    probe: DataFrame,
    bits: DataFrame,
    value_col: str,
    m: int = 8192,
    k: int = 4,
    out_col: str = "might_contain",
) -> DataFrame:
    """Adds ``out_col``: true iff ALL k bit positions of the probe value
    are set.  The scale use is semi-join pruning: broadcast the ≤ m-row
    bit table and drop the (1 − fp-rate) majority of a 10^12-row probe
    side BEFORE any shuffle — false positives are deterministic
    (identical md5 math in any engine), so an oracle reproduces the
    exact same candidate set."""
    pos = F.array(*[F.expr(s).cast("int") for s in bloom_hash_sqls(value_col, m, k)])
    # a per-row id keeps duplicate probe rows distinct: grouping by the
    # probe columns alone would both collapse duplicates to one output
    # row and inflate count(bit_idx) to 2k (making a present value read
    # as absent)
    ex = probe.withColumn("_rid", F.monotonically_increasing_id()).withColumn(
        "_bit", F.explode(pos)
    )
    hit = (
        ex.join(F.broadcast(bits), ex._bit == bits.bit_idx, "left")
        .groupBy("_rid", *probe.columns)
        .agg((F.count("bit_idx") == k).alias(out_col))
        .drop("_rid")
    )
    return hit


def hll_merge(regs: DataFrame, keys: list[str]) -> DataFrame:
    """Merge HLL register states onto (possibly coarser) keys — the
    sketch-mergeability property that makes pyramid/hypertable rollups
    re-aggregable WITHOUT rescanning facts: register-wise max over any
    partition of the inputs equals the registers computed directly
    (max is associative, commutative, idempotent).  Input rows are
    (…, bucket, rho); ``keys`` are columns/Columns of the coarser
    grouping already present on the frame."""
    return regs.groupBy(*keys, "bucket").agg(F.max("rho").alias("rho"))
