"""Exact distributed order statistics — the analytics rollup layer.

Spark ships approx_percentile (a KLL-ish sketch); pipelines auditing
data quality need EXACT per-group quantiles that reproduce bit-for-bit
across engines and cluster sizes.  Exact quantiles are a rank-select
composition: one window shuffle ranks each group's values, and the
aggregation picks the elements at the quantile ranks — the rollup
reuses the window's hash partitioning, so the whole operator is ONE
shuffle.

Rank convention: q_p = value at row_number ceil(p·n) (1-based, ties
broken by an id column for a deterministic total order; the SELECTED
value is order-independent under ties, the tiebreak just fixes the
sort).  This is percentile_disc semantics with the "ceil" rule, chosen
because ceil(p·n) is integer-exact in every engine (p·n < 2^52).

At 10^12 rows a single group's sort is the classic skew risk: the
window sort spills, and a pathological mega-group can be pre-reduced
by value-bucketing (count per value bucket → cumulative counts →
within-bucket select) — the same two-stage shape as skew.with_salt.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def group_quantiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    order_col: str,
    ps: tuple[float, ...] = (0.5, 0.9, 0.99),
) -> DataFrame:
    """Per-group exact quantiles of ``value_col`` at probabilities ``ps``
    → (group, n, q_<p> …).  One shuffle (window + reusing rollup).
    NULL values are dropped (Spark sorts nulls first, DuckDB last — the
    only cross-engine-stable rank semantics excludes them)."""
    w = Window.partitionBy(group_col).orderBy(value_col, order_col)
    wn = Window.partitionBy(group_col)
    ranked = df.select(group_col, value_col, order_col).filter(
        F.col(value_col).isNotNull()
    ).withColumn(
        "_rn", F.row_number().over(w)
    ).withColumn("_n", F.count("*").over(wn))
    aggs = [F.max("_n").cast("int").alias("n")]
    for p in ps:
        rank = F.greatest(F.ceil(F.lit(p) * F.col("_n")), F.lit(1))
        name = f"q{str(p)[2:]}"  # 0.5 -> q5, 0.99 -> q99
        aggs.append(
            F.max(F.when(F.col("_rn") == rank, F.col(value_col))).alias(name)
        )
    return ranked.groupBy(group_col).agg(*aggs)


def group_quantiles_sql(
    table: str,
    group_col: str,
    value_col: str,
    order_col: str,
    ps: tuple[float, ...] = (0.5, 0.9, 0.99),
) -> str:
    """DuckDB twin — identical rank rule, identical names."""
    cols = []
    for p in ps:
        name = f"q{str(p)[2:]}"
        cols.append(
            f"max(case when _rn = greatest(ceil({p!r} * _n), 1)"
            f" then {value_col} end) as {name}"
        )
    return f"""
      with r as (
        select {group_col}, {value_col}, {order_col},
               row_number() over (partition by {group_col}
                                  order by {value_col}, {order_col}) as _rn,
               count(*) over (partition by {group_col}) as _n
        from {table} where {value_col} is not null)
      select {group_col}, cast(max(_n) as int) as n, {', '.join(cols)}
      from r group by {group_col}
    """


def group_linreg(
    df: DataFrame,
    group_col: str,
    x_col: str,
    y_col: str,
    out_scale: int = 9,
) -> DataFrame:
    """Exact per-group OLS trend (drift detection over event streams):
    slope/intercept from the closed form

        slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)

    with every sum accumulated in DECIMAL — float partial sums are
    order-dependent across partitionings and engines, fixed-point is
    not, so the aggregate state is bit-identical on any cluster size.
    ONE aggregation (map-side partial + final); the only floats are the
    final two divisions, emitted with the floor(x·10^k + 0.5)/10^k
    cross-engine rounding form.

    → (group, n, slope, intercept); slope/intercept NULL for a
    degenerate group (constant x).
    """
    x = F.col(x_col).cast("decimal(18,0)")
    y = F.col(y_col).cast("decimal(18,4)")
    g = df.groupBy(group_col).agg(
        F.count("*").alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * x).alias("sxx"),
        F.sum(x * y).alias("sxy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    den = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    slope = num / F.nullif(den, F.lit(0.0))
    intercept = (F.col("sy").cast("double") - slope * F.col("sx").cast("double")) / F.col("n")
    m = 10 ** out_scale

    def r(c):
        return F.floor(c * F.lit(float(m)) + F.lit(0.5)) / F.lit(float(m))

    return g.select(
        group_col,
        F.col("n").cast("int").alias("n"),
        r(slope).alias("slope"),
        r(intercept).alias("intercept"),
    )


def group_linreg_sql(
    table: str, group_col: str, x_expr: str, y_expr: str, out_scale: int = 9
) -> str:
    """DuckDB twin — same decimal accumulation, same op order."""
    m = 10 ** out_scale
    return f"""
      with g as (
        select {group_col}, count(*) as n,
               sum(cast({x_expr} as decimal(28,0))) as sx,
               sum(cast({y_expr} as decimal(18,4))) as sy,
               sum(cast({x_expr} as decimal(28,0)) * cast({x_expr} as decimal(28,0))) as sxx,
               sum(cast({x_expr} as decimal(28,0)) * cast({y_expr} as decimal(18,4))) as sxy
        from {table} group by {group_col}),
      s as (
        select {group_col}, n,
               cast(n * sxy - sx * sy as double)
                 / nullif(cast(n * sxx - sx * sx as double), 0.0) as slope,
               sx, sy
        from g)
      select {group_col}, cast(n as int) as n,
             floor(slope * {float(m)!r} + 0.5) / {float(m)!r} as slope,
             floor(((cast(sy as double) - slope * cast(sx as double)) / n)
                   * {float(m)!r} + 0.5) / {float(m)!r} as intercept
      from s
    """
