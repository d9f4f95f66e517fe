"""Training-data sampling / batching operators (build brief, beyond the
reference): deterministic stratified sampling and token-budget sequence
packing — the two ops every LLM-corpus pipeline runs between dedup and
training.

Both are pure window/aggregate compositions (no UDF, no RNG state):
determinism comes from md5-ranking, so the same corpus always yields the
same sample/packing on any cluster size, and each has an exact DuckDB
oracle twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fraction: float | dict,
    id_col: str = "doc_id",
    seed: str = "42",
    default_fraction: float = 0.0,
) -> DataFrame:
    """EXACT deterministic stratified sample: ceil(fraction · n_s) rows
    from every stratum s — unlike ``DataFrame.sampleBy``, whose
    per-stratum counts are binomially distributed (a small stratum can
    vanish entirely from a training mix).

    ``fraction`` is a single float, or a per-stratum dict — the
    training-data-MIX form ({"en": 0.1, "sw": 1.0, …}); strata absent
    from the dict get ``default_fraction`` (0.0 = dropped, the usual
    mix semantics).

    Mechanism: rows are ranked inside each stratum by md5(seed|id) — a
    uniform, reproducible permutation — and the top ceil(f·n) kept.
    The product is rounded to 9 dp (floor form) BEFORE the ceil: IEEE
    n·f often lands one ulp above the exact integer (15000·0.2 =
    3000.0000000000005), which a bare ceil turns into one extra row
    (r03 review).  Exact for n·f < ~9·10⁶ per stratum; beyond that the
    correction degrades to a no-op and a ±1-row edge is immaterial.
    One shuffle (the per-stratum window); count comes from the same
    window, no second pass.  Skewed strata are bounded by the window
    sort, which Spark spills; for a pathological mega-stratum rank
    computation can be salted two-stage, the operators/skew.py pattern.
    """
    if isinstance(fraction, dict):
        f_expr = F.lit(float(default_fraction))
        for k, v in fraction.items():
            f_expr = F.when(F.col(strata_col) == k, F.lit(float(v))).otherwise(f_expr)
    else:
        f_expr = F.lit(float(fraction))
    w = Window.partitionBy(strata_col).orderBy(
        F.md5(F.concat_ws("|", F.lit(seed), F.col(id_col).cast("string"))), id_col
    )
    wn = Window.partitionBy(strata_col)
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .withColumn("_n", F.count("*").over(wn))
        .filter(
            F.col("_rk")
            <= F.ceil(F.floor(F.col("_n") * f_expr * F.lit(1e9) + F.lit(0.5)) / F.lit(1e9))
        )
        .drop("_rk", "_n")
    )


def pack_sequences(
    df: DataFrame,
    budget: int,
    len_col: str = "n_tokens",
    id_col: str = "doc_id",
) -> DataFrame:
    """Token-budget sequence packing: assign each document a ``bin_id``
    so bins group documents for fixed-size context windows.

    Semantics (deterministic, distribution-independent): documents are
    ordered by (length desc, id) and packed by running token count —
    ``bin_id = floor(exclusive_prefix_sum / budget)``.  A document that
    straddles a boundary stays in the bin where it started, so a bin's
    total is ≤ budget + max_len − 1 (the standard approximate packing
    used by large pipelines; exact first-fit-decreasing is inherently
    sequential and buys <1 % fill on real length distributions).
    Documents longer than the budget each land in their own overflowing
    bin by construction — and such a document consumes several budget
    blocks, so bin ids may SKIP values after it (ids are labels, not a
    dense sequence; they are dense whenever every document fits the
    budget).

    Plan — a DISTRIBUTED two-phase prefix sum, because a naive global
    window (``Window.orderBy`` with no partitionBy) physically moves
    ALL rows to one partition (Spark's WindowExec warns exactly this):

    1. range-repartition + sort on (length desc, id) — the scalable
       total order;
    2. per-partition local prefix sums (parallel windows keyed by the
       partition id);
    3. per-partition totals (one tiny row each) → driver → broadcast
       exclusive offsets; global cum = local cum + offset.

    Bin assignments depend only on the TOTAL ORDER, which is unique by
    (length desc, id), so the result is independent of where the range
    partitioner draws its boundaries.  Returns (id, len, bin_id,
    cum_tokens) — the global running token total, from which bin
    boundaries are auditable downstream.
    """
    spark = df.sparkSession
    n_part = max(spark.sparkContext.defaultParallelism, 2)
    order = [F.col(len_col).desc(), F.col(id_col)]
    local = (
        df.select(id_col, len_col)
        .repartitionByRange(n_part, *order)
        .sortWithinPartitions(*order)
        .withColumn("_pid", F.spark_partition_id())
    )
    w = (
        Window.partitionBy("_pid")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # pin the physical layout so the totals job and the output job see
    # identical partition boundaries
    local = local.withColumn(
        "_lsum", F.sum(F.col(len_col).cast("long")).over(w)
    ).localCheckpoint(eager=True)
    totals = {
        r["_pid"]: r["_t"]
        for r in local.groupBy("_pid").agg(F.max("_lsum").alias("_t")).collect()
    }
    offs, acc = [], 0
    for pid in sorted(totals):
        offs.append((pid, acc))
        acc += totals[pid]
    off_df = spark.createDataFrame(offs, "_pid int, _off long")
    csum = F.col("_lsum") + F.col("_off")
    return (
        local.join(F.broadcast(off_df), "_pid")
        .select(
            id_col,
            F.col(len_col),
            F.floor((csum - F.col(len_col)) / F.lit(budget)).cast("long").alias("bin_id"),
            csum.alias("cum_tokens"),
        )
    )


def weighted_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    id_col: str = "doc_id",
    seed: str = "42",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement (Efraimidis–
    Spirakis A-ES): keep the k rows with the largest ln(u)/w, u a
    reproducible md5-uniform in (0,1].  Inclusion probability is
    proportional to weight, the selection is a pure function of
    (seed, id, weight) — the corpus-mixture draw every training-data
    pipeline needs to be able to REPLAY.

    Scale shape: no shuffle at all — orderBy(...).limit(k) plans as
    TakeOrderedAndProject (per-partition top-k, driver merges k·P rows),
    the same pattern as any distributed top-k.  The md5-uniform is the
    sketches-module h60 (integer-exact in every engine); only the final
    ln is float, and ranking gaps (~1/n²) dwarf cross-engine libm ulp.
    """
    from geodesk_spark.operators.sketches import h60_sql

    h = F.expr(h60_sql(f"concat('{seed}|', cast({id_col} as string))"))
    u = (h + F.lit(1)).cast("double") / F.lit(float(1 << 60))
    key = F.log(u) / F.col(weight_col).cast("double")
    return (
        # proportional-to-weight means weight<=0 rows are NEVER drawn —
        # exclude them rather than clamping them up to weight 1
        df.filter(F.col(weight_col) > 0)
        .withColumn("_key", key)
        .orderBy(F.desc("_key"), id_col)
        .limit(k)
        .withColumn("skey", F.floor(F.col("_key") * F.lit(1e9) + F.lit(0.5)) / F.lit(1e9))
        .drop("_key")
    )


def weighted_sample_sql(
    table: str, k: int, weight_col: str, id_col: str = "doc_id", seed: str = "42"
) -> str:
    """DuckDB twin of :func:`weighted_sample` — same h60, same op order."""
    from geodesk_spark.operators.sketches import h60_sql

    h = h60_sql(f"concat('{seed}|', cast({id_col} as string))")
    return f"""
      select * exclude (_key), floor(_key * 1e9 + 0.5) / 1e9 as skey
      from (
        select *, ln(cast({h} + 1 as double) / {float(1 << 60)!r})
                  / cast({weight_col} as double) as _key
        from {table}
        where {weight_col} > 0
        order by _key desc, {id_col}
        limit {k}
      )
    """


def epoch_shards(
    df: DataFrame,
    shard_size: int,
    id_col: str = "doc_id",
    seed: str = "0",
    epoch: int = 0,
) -> DataFrame:
    """Deterministic epoch shuffle → fixed-size shard assignment: the
    WebDataset/tar-shard dataloader layout.  Each epoch is a reproducible
    global permutation keyed by md5(seed|epoch|id), cut into shards of
    ``shard_size`` consecutive permuted rows — so every epoch re-mixes
    the corpus, any worker can recompute its own shard list from
    (seed, epoch) alone, and a resumed run sees the identical order.

    Output: (id_col, shard_id, pos) — shard ids dense 0..ceil(n/size)−1,
    pos 0-based within the shard.  All integers.

    Plan — the same DISTRIBUTED two-phase prefix as pack_sequences (a
    bare global window would move the corpus to one task): range-
    repartition + sort on (md5 key, id), per-partition local row
    numbers, per-partition counts → broadcast exclusive offsets.  The
    permutation depends only on the total order (unique by key, id), so
    shard assignment is independent of partition boundaries.
    """
    spark = df.sparkSession
    n_part = max(spark.sparkContext.defaultParallelism, 2)
    key = F.md5(
        F.concat_ws("|", F.lit(seed), F.lit(str(int(epoch))), F.col(id_col).cast("string"))
    )
    order = [F.col("_hk"), F.col(id_col)]
    local = (
        df.select(id_col)
        .withColumn("_hk", key)
        .repartitionByRange(n_part, *order)
        .sortWithinPartitions(*order)
        .withColumn("_pid", F.spark_partition_id())
    )
    w = (
        Window.partitionBy("_pid")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # pin the physical layout so the totals job and the output job see
    # identical partition boundaries (pack_sequences law)
    local = local.withColumn("_lrk", F.count(F.lit(1)).over(w)).localCheckpoint(eager=True)
    totals = {
        r["_pid"]: r["_t"]
        for r in local.groupBy("_pid").agg(F.max("_lrk").alias("_t")).collect()
    }
    offs, acc = [], 0
    for pid in sorted(totals):
        offs.append((pid, acc))
        acc += totals[pid]
    off_df = spark.createDataFrame(offs, "_pid int, _off long")
    rk0 = F.col("_lrk") + F.col("_off") - F.lit(1)  # 0-based global rank
    return local.join(F.broadcast(off_df), "_pid").select(
        id_col,
        (rk0 / F.lit(int(shard_size))).cast("long").alias("shard_id"),
        (rk0 % F.lit(int(shard_size))).cast("long").alias("pos"),
    )


def shard_manifest(
    assign: DataFrame,
    df: DataFrame,
    size_col: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-shard manifest over an epoch_shards assignment: row count,
    payload-size total, and the order-free membership fingerprint
    sum(id) — the audit record a shard WRITER emits next to each tar.
    One equi-join on id + one agg; all integers."""
    j = assign.join(df.select(id_col, size_col), id_col)
    return j.groupBy("shard_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(F.col(size_col).cast("long")).alias("payload_sum"),
        F.sum(F.col(id_col).cast("long")).alias("id_sum"),
    )


def epoch_shards_sql(
    table: str,
    shard_size: int,
    id_col: str = "doc_id",
    seed: str = "0",
    epoch: int = 0,
) -> str:
    """DuckDB twin of epoch_shards — the two-phase prefix collapses to
    one global row_number over the identical (md5 key, id) order."""
    key = f"md5(concat('{seed}', '|', '{int(epoch)}', '|', cast({id_col} as varchar)))"
    return f"""
      select {id_col},
             cast((rk - 1) // {int(shard_size)} as bigint) as shard_id,
             cast((rk - 1) % {int(shard_size)} as bigint) as pos
      from (select {id_col},
                   row_number() over (order by {key}, {id_col}) as rk
            from {table})
    """


def shard_manifest_sql(
    table: str,
    shard_size: int,
    size_col: str,
    id_col: str = "doc_id",
    seed: str = "0",
    epoch: int = 0,
) -> str:
    """DuckDB twin of shard_manifest over the epoch_shards twin."""
    return f"""
      with a as ({epoch_shards_sql(table, shard_size, id_col, seed, epoch)})
      select a.shard_id, cast(count(*) as bigint) as n_rows,
             cast(sum(t.{size_col}) as bigint) as payload_sum,
             cast(sum(t.{id_col}) as bigint) as id_sum
      from a join {table} t using ({id_col})
      group by a.shard_id
    """


def budget_allocate(
    domains: DataFrame,
    total: int,
    rounds: int = 8,
    key_col: str = "domain",
    weight_col: str = "weight_ppm",
    cap_col: str = "cap",
) -> DataFrame:
    """Capped proportional budget allocation — integer water-filling:
    split ``total`` units across domains proportionally to
    ``weight_col``, never exceeding ``cap_col`` (supply), redistributing
    the surplus of capped domains among the uncapped ones.  The missing
    step between mixture WEIGHTS (doremi_reweight, sample_mix) and an
    executable sampling plan: a naive target = w·N can exceed a small
    domain's supply, silently shrinking the corpus.

    Exact integer arithmetic throughout (Hamilton largest-remainder
    apportionment per round): base = floor(B·w/S) with the leftover
    B − Σbase (< #uncapped) granted +1 by remainder rank
    ((B·w) mod S descending, key ascending) — then domains over their
    cap clamp, leave the pool, and the next round re-apportions the
    freed budget.  ≤ ``rounds`` window passes over the DOMAIN table (a
    handful of rows; each round caps ≥ 1 domain or is the fixpoint, so
    rounds ≥ #domains is always exact).  No collect, no floats.

    → (key, weight, cap, alloc) with Σ alloc = min(total, Σ caps) once
    the fixpoint is reached within ``rounds``.
    """
    from pyspark.sql import Window

    w_all = Window.partitionBy()
    d = domains.select(
        F.col(key_col).alias("_k"),
        F.col(weight_col).cast("long").alias("_w"),
        F.col(cap_col).cast("long").alias("_cap"),
    )
    d = d.withColumn("_alloc", F.lit(0).cast("long")).withColumn(
        "_fixed", F.lit(False)
    )
    for _ in range(rounds):
        live_w = F.when(~F.col("_fixed"), F.col("_w")).otherwise(F.lit(0))
        d = d.withColumn("_S", F.sum(live_w).over(w_all)).withColumn(
            "_B", F.lit(int(total)) - F.sum(F.when(F.col("_fixed"), F.col("_alloc")).otherwise(F.lit(0))).over(w_all)
        )
        # greatest(_S, 1): vectorized engines may evaluate both CASE
        # arms, so the divisor must be safe even when the pool is empty
        base = F.expr("(_B * _w) div greatest(_S, 1)")
        rem = F.expr("(_B * _w) % greatest(_S, 1)")
        d = d.withColumn(
            "_base", F.when(~F.col("_fixed") & (F.col("_S") > 0), base).otherwise(F.lit(0))
        ).withColumn(
            "_rem", F.when(~F.col("_fixed") & (F.col("_S") > 0), rem).otherwise(F.lit(-1))
        )
        rk = F.row_number().over(
            Window.partitionBy().orderBy(F.col("_rem").desc(), F.col("_k").asc())
        )
        leftover = F.col("_B") - F.sum("_base").over(w_all)
        d = d.withColumn(
            "_try",
            F.col("_base")
            + F.when((~F.col("_fixed")) & (rk <= leftover), F.lit(1)).otherwise(F.lit(0)),
        )
        d = d.withColumn(
            "_alloc",
            F.when(F.col("_fixed"), F.col("_alloc")).otherwise(
                F.least(F.col("_try"), F.col("_cap"))
            ),
        ).withColumn(
            "_fixed", F.col("_fixed") | (F.col("_try") >= F.col("_cap"))
        )
        d = d.select("_k", "_w", "_cap", "_alloc", "_fixed")
    return d.select(
        F.col("_k").alias(key_col),
        F.col("_w").alias(weight_col),
        F.col("_cap").alias(cap_col),
        F.col("_alloc").cast("long").alias("alloc"),
    )


def budget_allocate_sql(
    rel: str,
    total: int,
    rounds: int = 8,
    key_col: str = "domain",
    weight_col: str = "weight_ppm",
    cap_col: str = "cap",
) -> str:
    """DuckDB twin of :func:`budget_allocate` over ``rel``
    (key, weight, cap) — unrolled materialized rounds."""
    parts = [
        f"""d0 as materialized (
          select {key_col} as k, cast({weight_col} as bigint) as w,
                 cast({cap_col} as bigint) as cap,
                 cast(0 as bigint) as alloc, false as fixed
          from {rel})"""
    ]
    for i in range(1, rounds + 1):
        p = f"d{i-1}"
        parts.append(
            f"""d{i} as materialized (
              with s as (select *,
                       sum(case when not fixed then w else 0 end) over () as S,
                       {int(total)} - sum(case when fixed then alloc else 0 end) over () as B
                     from {p}),
              b as (select *,
                       case when not fixed and S > 0 then (B * w) // greatest(S, 1) else 0 end as base,
                       case when not fixed and S > 0 then (B * w) % greatest(S, 1) else -1 end as rem
                    from s),
              r as (select *,
                       row_number() over (order by rem desc, k asc) as rk,
                       B - sum(base) over () as leftover
                    from b),
              t as (select *,
                       base + (case when not fixed and rk <= leftover then 1 else 0 end) as try_
                    from r)
              select k, w, cap,
                     case when fixed then alloc else least(try_, cap) end as alloc,
                     fixed or try_ >= cap as fixed
              from t)"""
        )
    return (
        "with " + ",\n".join(parts)
        + f"\nselect k as {key_col}, w as {weight_col}, cap as {cap_col}, "
        f"cast(alloc as bigint) as alloc from d{rounds}"
    )


_SPLIT_M31 = 2147483648


def leakage_safe_split(
    docs: DataFrame,
    components: DataFrame,
    fractions: tuple[int, ...] = (80, 10, 10),
    names: tuple[str, ...] = ("train", "val", "test"),
    seed: int = 42,
    id_col: str = "doc_id",
    comp_col: str = "comp_id",
) -> DataFrame:
    """Leakage-safe train/val/test assignment — the split rule a dedup'd
    corpus must use: hashing DOCUMENTS scatters near-duplicates across
    splits (test contamination); hashing the duplicate COMPONENT sends
    every member of a near-dup group to the SAME split (the Lee et al.
    deduplication-paper protocol).  Docs without a component row are
    singletons (component = themselves).

    Deterministic: a seeded MINSTD LCG of the component id picks a
    bucket in [0, 100); cumulative integer ``fractions`` cut the
    buckets.  One left join (components are dedup output, typically
    ≪ corpus) + pure codegen arithmetic — no RNG state, reruns are
    byte-stable, and a re-release reseeds explicitly.

    → (doc_id, comp_id, split).
    """
    assert sum(fractions) == 100 and len(fractions) == len(names)
    comp = components.select(
        F.col(id_col).alias("_id"), F.col(comp_col).alias("_c")
    )
    base = docs.select(F.col(id_col).alias("_id")).join(comp, "_id", "left")
    c = F.coalesce(F.col("_c"), F.col("_id"))
    h0 = ((c % _SPLIT_M31) * 48271 + F.lit((seed * 2654435761) % _SPLIT_M31)) % _SPLIT_M31
    b = ((h0 * 48271) % _SPLIT_M31) % 100
    cuts = []
    acc = 0
    for f_ in fractions:
        acc += f_
        cuts.append(acc)
    # nested whens lowest-cut-first: first matching band wins
    expr = F.lit(None).cast("string")
    prev_cut = 0
    for name, cut in zip(names, cuts):
        expr = F.when((b >= prev_cut) & (b < cut), F.lit(name)).otherwise(expr)
        prev_cut = cut
    return base.select(
        F.col("_id").alias(id_col),
        c.alias(comp_col),
        expr.alias("split"),
    )


def leakage_safe_split_sql(
    docs_rel: str,
    components_rel: str,
    fractions: tuple[int, ...] = (80, 10, 10),
    names: tuple[str, ...] = ("train", "val", "test"),
    seed: int = 42,
) -> str:
    """DuckDB twin of leakage_safe_split."""
    M = _SPLIT_M31
    cuts = []
    acc = 0
    for f_ in fractions:
        acc += f_
        cuts.append(acc)
    cases = []
    prev = 0
    for name, cut in zip(names, cuts):
        cases.append(f"when b >= {prev} and b < {cut} then '{name}'")
        prev = cut
    case = "case " + " ".join(cases) + " end"
    return f"""
      with d as (select doc_id from ({docs_rel}) dd),
      comp as (select doc_id, comp_id from ({components_rel}) cc),
      j as (select d.doc_id, coalesce(comp.comp_id, d.doc_id) as comp_id
            from d left join comp on comp.doc_id = d.doc_id),
      h as (select doc_id, comp_id,
                   (((comp_id % {M}) * 48271 + {(seed * 2654435761) % M})
                     % {M} * 48271) % {M} % 100 as b
            from j)
      select doc_id, comp_id, {case} as split from h
    """
