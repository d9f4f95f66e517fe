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
    # a right payload column shadowing a left column would emit TWO
    # output columns with the same name (ambiguous downstream, unwritable
    # to parquet) — fail loudly up front instead (r03 review); rename on
    # either input to disambiguate, as DuckDB ASOF's suffixing would
    clash = sorted(set(rpay) & set(lcols))
    if clash:
        raise ValueError(
            f"as_of_join: right payload column(s) {clash} collide with left "
            "columns — rename one side before joining"
        )

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


def interval_join(
    intervals: DataFrame,
    points: DataFrame,
    bucket_width: int,
    i_start: str = "s",
    i_end: str = "e",
    p_t: str = "t",
) -> DataFrame:
    """Point-in-interval join — Spark has no efficient range join (a
    plain ``t BETWEEN s AND e`` predicate plans as BroadcastNestedLoop /
    cartesian), so lift it to ONE bucketed equi-join:

      intervals: explode buckets floor(s/w) … floor(e/w)   map-side
      points:    bucket floor(t/w)                          map-side
      equi-join on bucket  →  residual s ≤ t ≤ e            the shuffle

    Exactly-once is FREE here (cf. the crossing join's intersection-cell
    rule): a point lies in exactly one bucket, so a matching (interval,
    point) pair meets only in that bucket — no distinct, no dedup.

    Pick ``bucket_width`` ≈ the typical interval length: fan-out stays
    O(1) per interval while buckets stay selective.  Hot buckets (many
    concurrent long intervals) are ordinary join skew — AQE splits them.
    Returns all interval columns + all point columns.
    """
    w = bucket_width
    bi = intervals.withColumn(
        "_b",
        F.explode(
            F.sequence(
                F.floor(F.col(i_start) / F.lit(w)), F.floor(F.col(i_end) / F.lit(w))
            )
        ),
    )
    bp = points.withColumn("_b", F.floor(F.col(p_t) / F.lit(w)))
    return (
        bi.join(bp, "_b")
        .filter((F.col(p_t) >= F.col(i_start)) & (F.col(p_t) <= F.col(i_end)))
        .drop("_b")
    )


def sessionize(
    events: DataFrame,
    gap_us: int,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """Gaps-and-islands sessionization: consecutive events of a user
    closer than ``gap_us`` microseconds share a session; a longer gap
    starts the next one.  The standard event-pipeline rollup Spark has
    no primitive for in batch (session_window exists only in streaming
    aggregations).

    Plan: ONE shuffle total — the per-user window computes the lag gap
    and the running session index (sum of boundary flags), and the
    per-(user, session) rollup reuses the window's hash partitioning
    (HashPartitioning(user) satisfies the grouping's clustered
    distribution, so Catalyst inserts no second exchange).

    Value sums go through decimal(18,4) — float addition is
    order-dependent across partitionings/engines; fixed-point is not.

    Returns (user, session_idx, n_events, start_us, end_us, sum_value).
    """
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    w = Window.partitionBy(user_col).orderBy("_us", order_col)
    flagged = (
        events.withColumn("_us", us)
        .withColumn("_prev", F.lag("_us").over(w))
        .withColumn(
            "_new",
            (F.col("_prev").isNull() | (F.col("_us") - F.col("_prev") > gap_us)).cast("int"),
        )
        .withColumn("session_idx", F.sum("_new").over(w).cast("int"))
    )
    return flagged.groupBy(user_col, "session_idx").agg(
        F.count("*").cast("int").alias("n_events"),
        F.min("_us").alias("start_us"),
        F.max("_us").alias("end_us"),
        F.sum(F.col(value_col).cast("decimal(18,4)")).cast("double").alias("sum_value"),
    )


def geofence_transitions(
    located: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
    fence_col: str = "fence_id",
) -> DataFrame:
    """Geofence ENTER/EXIT/SWITCH detection — the spatio-temporal event
    operator downstream of any spatial assignment: given per-event fence
    membership (``fence_col``, NULL = outside all fences, produced by a
    PIP join / bbox filter / hex lookup upstream), emit one row per
    transition of each user's fence state over time.

    kind: 'enter'  outside→fence (incl. a user's first located event),
          'exit'   fence→outside,
          'switch' fence A→fence B directly.

    Plan: ONE shuffle — the per-user lag window; tie-break on
    ``order_col`` makes the sequence (hence the transition set)
    deterministic.  State compares NULL-safely, which also gets the
    boundary right for free: a user's first event inside a fence has
    prev = NULL ≠ fence → 'enter'; a first event outside has
    NULL <=> NULL → no row.  Runs of equal state — the overwhelming
    bulk at scale — are dropped before anything else moves.

    Returns (user, ts, order, prev_fence, fence, kind).
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, order_col)
    out = (
        located.withColumn("_prev", F.lag(fence_col).over(w))
        .filter(~F.col(fence_col).eqNullSafe(F.col("_prev")))
    )
    kind = (
        F.when(F.col(fence_col).isNull(), F.lit("exit"))
        .when(F.col("_prev").isNull(), F.lit("enter"))
        .otherwise(F.lit("switch"))
    )
    return out.select(
        F.col(user_col),
        F.col(ts_col),
        F.col(order_col),
        F.col("_prev").alias("prev_fence"),
        F.col(fence_col).alias("fence"),
        kind.alias("kind"),
    )


# --- exponential time-decay rollups (exact integer half-life weights) --------


def decay_buckets(
    events: DataFrame,
    keys: list[str],
    now_us: "Column | int",
    half_life_us: int,
    ts_col: str = "ts",
    value_col: str | None = None,
    max_buckets: int = 40,
) -> DataFrame:
    """Mergeable register state for half-life-decayed aggregates: events
    group into integer AGE BUCKETS b = div(now − ts, half_life) and the
    state is the per-(key, bucket) exact count + micro-unit value sum.
    2^-b weighting happens only at read time (``decay_estimate``), so
    the state merges across partitions/scans/days by plain addition —
    the float-free analog of the usual exp(−λ·age) fold, which is
    order-dependent in IEEE arithmetic and non-deterministic under
    Spark's unordered aggregation.

    Ages beyond ``max_buckets`` half-lives (weight < 2^-40 ≈ 1e-12) and
    events from the future are dropped.  Values quantize floor-form to
    micro-units (the float-output law).  One partial-aggregated
    groupBy — shuffle volume is O(keys × max_buckets)."""
    now = F.lit(now_us).cast("long") if isinstance(now_us, int) else now_us
    age = now - F.unix_micros(F.col(ts_col).cast("timestamp"))
    d = events.withColumn("age_us", age).filter(
        (F.col("age_us") >= 0)
        & (F.col("age_us") < half_life_us * max_buckets)
    )
    d = d.withColumn("bucket", F.expr(f"div(age_us, {half_life_us})").cast("int"))
    val = (
        F.lit(0).cast("long")
        if value_col is None
        else F.expr(f"cast(floor({value_col} * 1e6 + 0.5) as bigint)")
    )
    return (
        d.withColumn("_vm", val)
        .groupBy(*keys, "bucket")
        .agg(F.count("*").alias("n"), F.sum("_vm").alias("value_micro"))
    )


def decay_estimate(state: DataFrame, keys: list[str]) -> DataFrame:
    """Read the decayed aggregates off the bucket state: each bucket
    contributes div(x·10^6, 2^b) (counts) / div(x, 2^b) (micro values)
    — one floor division per bucket, then an exact integer sum, so the
    result is bit-stable and within max_buckets micro-units of the real
    geometric weighting.  Emits (keys…, n_events, decayed_count_micro,
    decayed_value_micro)."""
    c = F.expr("div(n * 1000000, cast(pow(2.0, bucket) as bigint))")
    v = F.expr("div(value_micro, cast(pow(2.0, bucket) as bigint))")
    return (
        state.withColumn("_c", c)
        .withColumn("_v", v)
        .groupBy(*keys)
        .agg(
            F.sum("n").alias("n_events"),
            F.sum("_c").alias("decayed_count_micro"),
            F.sum("_v").alias("decayed_value_micro"),
        )
    )


def decay_merge(states: DataFrame, keys: list[str]) -> DataFrame:
    """Merge bucket states from different scans/shards/days: plain
    per-(key, bucket) addition (the whole point of keeping weights out
    of the state)."""
    return states.groupBy(*keys, "bucket").agg(
        F.sum("n").alias("n"), F.sum("value_micro").alias("value_micro")
    )


def funnel_conversion(
    events: DataFrame,
    steps: list[str],
    within_us: int,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """First-touch funnel analysis — the product-analytics staple: per
    user, greedily match the ordered step sequence (each step strictly
    after the previous match; the whole chain within ``within_us``
    microseconds of the FIRST step), then roll up users per step.

    First-touch semantics (the common default): step 1 anchors at its
    EARLIEST occurrence; each later step takes its earliest occurrence
    after the previous match; the window constraint applies to the
    completed chain.  A user abandoning early counts toward every step
    reached.  Deterministic — min() over integer microsecond
    timestamps, no window ordering ambiguity.

    Shape: k−1 broadcast-sized equi-joins on the user key — each step
    frame is a per-user min rollup (≤ |users| rows), so the fact table
    is scanned once per step type filter and everything downstream is
    dimension-sized.  At 10^12 events the per-step rollups are the only
    shuffles, all on the same user key (co-partitioned by AQE).

    → (step, step_name, users) — one row per funnel step, users
    descending down the funnel.
    """
    # integer microseconds since epoch: unix_micros is exact (DuckDB
    # twin: epoch_us) — a bare cast-to-long would truncate to SECONDS
    ev = events.select(
        F.col(user_col).alias("_u"),
        F.col(type_col).alias("_t"),
        # parquet timestamps load as TIMESTAMP_NTZ here; unix_micros
        # wants TIMESTAMP — the ntz→ltz cast is a wall-clock reinterpret
        # under the session's UTC timezone, identical to DuckDB epoch_us
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("_ts"),
    )
    cur = (
        ev.filter(F.col("_t") == steps[0])
        .groupBy("_u")
        .agg(F.min("_ts").alias("_m1"))
        .select("_u", F.col("_m1").alias("_anchor"), F.col("_m1").alias("_prev"))
    )
    counts = [("1", steps[0], cur)]
    for i, st in enumerate(steps[1:], start=2):
        nxt = (
            ev.filter(F.col("_t") == st)
            .join(cur, "_u")
            .filter(F.col("_ts") > F.col("_prev"))
            .groupBy("_u", "_anchor")
            .agg(F.min("_ts").alias("_prev"))
            .select("_u", "_anchor", "_prev")
        )
        if i == len(steps):
            nxt = nxt.filter(F.col("_prev") - F.col("_anchor") <= within_us)
        counts.append((str(i), st, nxt))
        cur = nxt
    frames = [
        df.agg(F.count("*").cast("long").alias("users")).select(
            F.lit(int(idx)).alias("step"), F.lit(name).alias("step_name"), "users"
        )
        for idx, name, df in counts
    ]
    out = frames[0]
    for f_ in frames[1:]:
        out = out.unionByName(f_)
    return out


def funnel_conversion_sql(
    events_rel: str, steps: list[str], within_us: int
) -> str:
    """DuckDB twin of funnel_conversion (same greedy min-join chain)."""
    parts = [
        f"""ev as materialized (
      select user_id as u, event_type as t, epoch_us(ts) as ts
      from ({events_rel}) e)""",
        f"""s1 as materialized (
      select u, min(ts) as anchor, min(ts) as prev
      from ev where t = '{steps[0]}' group by u)""",
    ]
    for i, st in enumerate(steps[1:], start=2):
        within = (
            f" having min(e.ts) - s.anchor <= {within_us}"
            if i == len(steps)
            else ""
        )
        parts.append(
            f"""s{i} as materialized (
      select s.u, s.anchor, min(e.ts) as prev
      from ev e join s{i-1} s on e.u = s.u and e.t = '{st}' and e.ts > s.prev
      group by s.u, s.anchor{within})"""
        )
    sel = "\n      union all\n      ".join(
        f"select {i} as step, '{st}' as step_name, "
        f"cast((select count(*) from s{i}) as bigint) as users"
        for i, st in enumerate(steps, start=1)
    )
    return "with " + ",\n".join(parts) + f"\n      {sel}"


def cohort_retention(
    events: DataFrame,
    bucket_us: int = 7 * 86_400 * 1_000_000,
    max_age: int = 8,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Cohort retention — the other product-analytics staple beside the
    funnel: users cohort by their FIRST-seen time bucket (week by
    default), and cell (cohort, age) counts the cohort's users active
    ``age`` buckets later.  All exact integers: microsecond epochs
    bucket by floor division (nonneg ⇒ Spark div = DuckDB //), ages cap
    at ``max_age``.

    Shape: one per-user min rollup (first touch), one broadcast-sized
    join back on the user key, one distinct + rollup — the fact table
    is scanned once; every later frame is user- or cell-sized.  Age 0
    is the cohort size itself, so retention = users / users@age0 is the
    caller's division.

    → (cohort_bucket, age, users).
    """
    ev = events.select(
        F.col(user_col).alias("_u"),
        F.expr(
            f"unix_micros(cast({ts_col} as timestamp)) div {bucket_us}"
        ).alias("_b"),
    )
    first = ev.groupBy("_u").agg(F.min("_b").alias("_c"))
    cells = (
        ev.join(first, "_u")
        .select("_u", "_c", (F.col("_b") - F.col("_c")).alias("_age"))
        .filter(F.col("_age") <= max_age)
        .distinct()
    )
    return (
        cells.groupBy(F.col("_c").alias("cohort_bucket"), F.col("_age").alias("age"))
        .agg(F.count("*").cast("long").alias("users"))
    )


def cohort_retention_sql(
    events_rel: str,
    bucket_us: int = 7 * 86_400 * 1_000_000,
    max_age: int = 8,
) -> str:
    """DuckDB twin of cohort_retention."""
    return f"""
      with ev as (select user_id as u, epoch_us(ts) // {bucket_us} as b
                  from ({events_rel}) e),
      first as (select u, min(b) as c from ev group by u),
      cells as (select distinct ev.u, f.c, ev.b - f.c as age
                from ev join first f on f.u = ev.u
                where ev.b - f.c <= {max_age})
      select c as cohort_bucket, age, cast(count(*) as bigint) as users
      from cells group by 1, 2
    """


def event_markov_stationary(
    events: DataFrame,
    iters: int = 12,
    scale: int = 1 << 20,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Event-type Markov chain: per-user consecutive-event transition
    counts (exact integers, ONE window pass) and the chain's stationary
    distribution — "where does a user's session settle" — by
    fixed-point power iteration on the INTEGER count matrix (πP = π;
    row-stochastic normalization and the iteration both run in exact
    fixed-point arithmetic, the pca_project discipline, so the result
    is bit-identical cross-engine with no float anywhere).

    Iteration in scaled integers: π′(j) = Σᵢ π(i)·C(i,j)·S div R(i)
    (R(i) = row total — the div happens per TERM on nonneg operands,
    floor on both engines), renormalized each round to Σ = S by
    largest-remainder... simpler: rescale by max; after ``iters``
    rounds report π at scale S by one final rescale.  The state space
    is |event types| (tiny); everything after the one fact-table
    window pass is driver/dimension-sized.

    → (state, stat_micro) with stat_micro ∈ [0, S] summing ≈ S, plus
    the transition counts as (state, next_state, n) rows via the
    companion ``event_transitions``.
    """
    trans = event_transitions(events, user_col, ts_col, order_col, type_col)
    rows = trans.collect()
    states = sorted({r.state for r in rows} | {r.next_state for r in rows})
    idx = {s: i for i, s in enumerate(states)}
    k = len(states)
    C = [[0] * k for _ in range(k)]
    for r in rows:
        C[idx[r.state]][idx[r.next_state]] = r.n
    R = [max(sum(row), 1) for row in C]
    S = scale
    pi = [S] * k
    for _ in range(iters):
        nxt = [0] * k
        for i in range(k):
            for j in range(k):
                nxt[j] += (pi[i] * C[i][j] * S) // R[i]
        m = max(nxt) if any(nxt) else 1
        pi = [(v * S) // m for v in nxt]
    tot = sum(pi) or 1
    out = [(states[i], (pi[i] * S) // tot) for i in range(k)]
    spark = events.sparkSession
    return spark.createDataFrame(out, "state string, stat_micro long")


def event_transitions(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Consecutive-event transition counts per (state, next_state) —
    one per-user window (lead over exact microseconds, order-column
    tie-break) + one rollup."""
    w = Window.partitionBy(user_col).orderBy(
        F.unix_micros(F.col(ts_col).cast("timestamp")), F.col(order_col)
    )
    pairs = events.select(
        F.col(type_col).alias("state"),
        F.lead(type_col).over(w).alias("next_state"),
    ).filter(F.col("next_state").isNotNull())
    return pairs.groupBy("state", "next_state").agg(
        F.count("*").cast("long").alias("n")
    )


def event_transitions_sql(events_rel: str) -> str:
    """DuckDB twin of event_transitions."""
    return f"""
      with p as (select event_type as state,
                        lead(event_type) over (partition by user_id
                          order by epoch_us(ts), event_id) as next_state
                 from ({events_rel}) e)
      select state, next_state, cast(count(*) as bigint) as n
      from p where next_state is not null
      group by 1, 2
    """


def event_markov_stationary_sql(
    events_rel: str, iters: int = 12, scale: int = 1 << 20
) -> str:
    """DuckDB twin of event_markov_stationary: the same fixed-point
    iteration unrolled as materialized hugeint CTEs over the integer
    count matrix (trainer-in-the-oracle)."""
    S = scale
    parts = [
        f"tr as materialized ({event_transitions_sql(events_rel)})",
        """states as materialized (
          select state from tr union select next_state from tr)""",
        """rt as materialized (
          select s.state, greatest(coalesce((select sum(n) from tr
                                             where tr.state = s.state), 0), 1) as r
          from states s)""",
        f"p0 as (select state, cast({S} as hugeint) as v from states)",
    ]
    for t in range(1, iters + 1):
        parts.append(
            f"""n{t} as materialized (
          select s.state,
                 coalesce((select sum((p.v * tr.n * {S}) // rt.r)
                           from p{t-1} p
                           join tr on tr.next_state = s.state and tr.state = p.state
                           join rt on rt.state = p.state), 0) as v
          from states s)"""
        )
        parts.append(
            f"""p{t} as materialized (
          select state,
                 (v * {S}) // greatest((select max(v) from n{t}), 1) as v
          from n{t})"""
        )
    return (
        "with " + ",\n".join(parts)
        + f"""
      select state, cast((v * {S}) // greatest((select sum(v) from p{iters}), 1)
                         as bigint) as stat_micro
      from p{iters}
    """
    )
