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


# --- KMV (k-minimum-values / theta) sketch -----------------------------------
# HLL merges unions only; the KMV/theta family also supports INTERSECTION
# and Jaccard estimates over the same register state (Beyer et al. 2007,
# the Theta-sketch framework).  Registers are the k smallest distinct
# 52-bit hashes of the value — an order statistic, so they are mergeable
# (k smallest of a union = k smallest of the concatenated registers) and
# deterministic given the hash.  Every quantity here is INTEGER: the
# estimator is div((k-1)·2^52, kth_min) — no float anywhere, so the full
# register state AND the estimates hash identically across engines.
# 52 bits (13 md5 hex chars) keep (k-1)·2^52 inside int64 for k ≤ 1023.

KMV_BITS = 52
KMV_FULL = 1 << KMV_BITS


def h52_sql(col: str) -> str:
    """Portable 52-bit md5 prefix (13 hex chars) — verbatim in DuckDB."""
    terms = [
        f"(position(substr(md5({col}), {i + 1}, 1) in '{HEX}') - 1)"
        f" * cast({16 ** (12 - i)} as bigint)"
        for i in range(13)
    ]
    return "(" + " + ".join(terms) + ")"


def kmv_registers(
    df: DataFrame, keys: list[str], value_col: str, k: int = 64
) -> DataFrame:
    """Per-key KMV register state: (keys…, slot, h) = the k smallest
    distinct h52 hashes, slot = 1-based rank.  Two exchanges: a partial-
    aggregated distinct on (keys, h), then the per-key rank window —
    the window input is already ≤ the distinct count, and the state out
    is ≤ k rows per key.  Merge state from different scans/days by
    re-ranking the concatenated registers (``kmv_merge``)."""
    from pyspark.sql import Window

    d = df.select(*keys, F.expr(h52_sql(value_col)).alias("h")).distinct()
    w = Window.partitionBy(*keys).orderBy("h")
    return d.withColumn("slot", F.row_number().over(w)).filter(F.col("slot") <= k)


def kmv_merge(regs: DataFrame, keys: list[str], k: int = 64) -> DataFrame:
    """Merge register states onto coarser keys: k smallest distinct
    hashes of the union — exactly ``kmv_registers`` of the concatenated
    state (order statistics are mergeable; dedup first since the same
    value may appear in many child states)."""
    from pyspark.sql import Window

    d = regs.select(*keys, "h").distinct()
    w = Window.partitionBy(*keys).orderBy("h")
    return d.withColumn("slot", F.row_number().over(w)).filter(F.col("slot") <= k)


def kmv_estimate(regs: DataFrame, keys: list[str], k: int = 64) -> DataFrame:
    """Distinct-count estimate from register state, all-integer:
    fewer than k slots → the count is EXACT (we saw every hash);
    otherwise est = div((k−1)·2^52, kth_min) (the classic unbiased KMV
    estimator, relative error ≈ 1/√(k−2)).  Emits (keys…, n_slots,
    kth_h, est_distinct) — bigint everywhere, bit-stable."""
    agg = regs.groupBy(*keys).agg(
        F.count("*").alias("n_slots"), F.max("h").alias("kth_h")
    )
    est = F.when(
        F.col("n_slots") < k, F.col("n_slots").cast("long")
    ).otherwise(F.expr(f"div({k - 1} * cast({KMV_FULL} as bigint), greatest(kth_h, 1))"))
    return agg.select(*keys, "n_slots", "kth_h", est.alias("est_distinct"))


def kmv_set_ops(
    regs_a: DataFrame, regs_b: DataFrame, k: int = 64
) -> DataFrame:
    """Union / intersection / Jaccard estimates from two register
    states (the theta-sketch composition HLL cannot do):

        K(A∪B) = k smallest of R_A ∪ R_B       (union registers)
        est_union = KMV estimate of K(A∪B)
        c = |{h ∈ K(A∪B) : h ∈ R_A ∧ h ∈ R_B}|  (matches below theta)
        jaccard ≈ c/k'          (k' = |K(A∪B)|, < k when the union is small)
        est_intersect = div(c · est_union, k')

    One row out: (n_a, n_b, n_union_slots, common_below_theta,
    est_a, est_b, est_union, est_intersect, jaccard_micro) — all bigint
    (jaccard in micro-units).  Register frames are ≤ k rows each, so
    every join here is a broadcast of constant-size state."""
    from pyspark.sql import Window

    a = regs_a.select("h").withColumn("in_a", F.lit(1))
    b = regs_b.select("h").withColumn("in_b", F.lit(1))
    both = a.join(b, "h", "full").select(
        "h",
        F.coalesce("in_a", F.lit(0)).alias("in_a"),
        F.coalesce("in_b", F.lit(0)).alias("in_b"),
    )
    w = Window.orderBy("h")
    u = both.withColumn("slot", F.row_number().over(w)).filter(F.col("slot") <= k)

    def est_expr(n, kth):
        return (
            F.when(F.col(n) < k, F.col(n).cast("long")).otherwise(
                F.expr(f"div({k - 1} * cast({KMV_FULL} as bigint), greatest({kth}, 1))")
            )
        )

    ua = u.agg(
        F.count("*").alias("n_union_slots"),
        F.max("h").alias("u_kth"),
        F.sum((F.col("in_a") * F.col("in_b"))).alias("common_below_theta"),
    )
    ea = regs_a.agg(F.count("*").alias("n_a"), F.max("h").alias("a_kth"))
    eb = regs_b.agg(F.count("*").alias("n_b"), F.max("h").alias("b_kth"))
    row = ua.crossJoin(ea).crossJoin(eb)
    est_union = est_expr("n_union_slots", "u_kth")
    return row.select(
        "n_a",
        "n_b",
        "n_union_slots",
        "common_below_theta",
        est_expr("n_a", "a_kth").alias("est_a"),
        est_expr("n_b", "b_kth").alias("est_b"),
        est_union.alias("est_union"),
        F.expr("div(common_below_theta * 1000000, greatest(n_union_slots, 1))").alias(
            "jaccard_micro"
        ),
        F.expr(
            f"div(common_below_theta * "
            f"(case when n_union_slots < {k} then n_union_slots "
            f" else div({k - 1} * cast({KMV_FULL} as bigint), greatest(u_kth, 1)) end), "
            f"greatest(n_union_slots, 1))"
        ).alias("est_intersect"),
    )


def heavy_hitters(
    df: DataFrame,
    value_col: str,
    threshold: int,
    w: int = 1024,
    d: int = 4,
) -> DataFrame:
    """Exact heavy hitters (values with ≥ ``threshold`` occurrences)
    without a full-cardinality shuffle — the two-pass sketch-prune
    pattern for frequent-items at 10^12 rows:

    pass 1 builds the constant-size CMS register table (map-side
    combined, ≤ d·w rows); pass 2 re-scans, reads each row's estimate
    by d BROADCAST register-slice joins (no explode, no re-group), and
    only rows with est ≥ threshold enter the exact groupBy.  CMS never
    under-counts, so est ≥ exact ≥ threshold — the prune is LOSSLESS
    for true hitters and the output is exactly
    {v : exact_count(v) ≥ threshold}; only collision-inflated light
    values cost exact-count work (tune w·d to the key skew).

    Emits (value, n_exact) — an oracle can verify with a plain
    GROUP BY … HAVING, no sketch replay needed.
    """
    regs = cms_registers(df, [], value_col, w, d)
    est = df.select(F.expr(value_col).alias("value"))
    hashes = cms_hash_sqls("value", w, d)  # same salts ⇒ same registers
    for j in range(d):
        rj = regs.filter(F.col("j") == j).select(
            F.col("col").alias(f"_c{j}"), F.col("cnt").alias(f"_n{j}")
        )
        est = est.withColumn(f"_h{j}", F.expr(hashes[j]).cast("int")).join(
            F.broadcast(rj), F.col(f"_h{j}") == F.col(f"_c{j}"), "left"
        )
    depth_counts = [F.coalesce(F.col(f"_n{j}"), F.lit(0).cast("long")) for j in range(d)]
    est_min = depth_counts[0] if d == 1 else F.least(*depth_counts)
    cand = est.withColumn("_est", est_min).filter(F.col("_est") >= threshold)
    return (
        cand.groupBy("value")
        .agg(F.count("*").alias("n_exact"))
        .filter(F.col("n_exact") >= threshold)
    )
