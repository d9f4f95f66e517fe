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


def _epanechnikov_taps(radius: int) -> list[tuple[int, int, int]]:
    """Integer Epanechnikov cell taps: w = r²+1−(dx²+dy²) where positive
    (the KDE kernel of tiles_sink.kde_heatmap_counts — RATIONAL so every
    weight is an exact integer and weighted sums stay order-free)."""
    r = radius
    return [
        (dx, dy, r * r + 1 - dx * dx - dy * dy)
        for dx in range(-r, r + 1)
        for dy in range(-r, r + 1)
        if r * r + 1 - dx * dx - dy * dy > 0
    ]


def gwr_local(
    points: DataFrame,
    grid_bits: int,
    radius: int = 2,
    x_col: str = "xv",
    y_col: str = "yv",
    out_scale: int = 6,
) -> DataFrame:
    """Geographically weighted regression, the grid flavor (GWR-lite):
    a LOCAL OLS slope/intercept of ``y_col`` on ``x_col`` per raster
    cell, kernel-weighted over the cell's neighborhood — the classic
    local-relationship map (how does price sensitivity vary across the
    city?) of spatial statistics (Brunsdon, Fotheringham & Charlton
    1996), re-expressed for a cluster.

    Exactness contract (cross-engine): per-cell partial sums (n, Σx,
    Σy, Σx², Σxy) accumulate in decimal(38,0) from INTEGER inputs;
    the Epanechnikov kernel weights are exact integers, so the
    neighborhood-weighted sums are exact too; the only floats are the
    closed-form divisions at the very end, in mirrored op order,
    floor-quantized at 10^-out_scale.

    100 TB shape: ONE groupBy(cell) over the fact table (map-side
    partial combine), then the ≤(2r+1)² tap scatter runs over the CELL
    table (orders of magnitude smaller), one more groupBy — the same
    halo-exchange shape as the KDE/stencil rasters; no UDF anywhere.

    → (gx, gy, n_eff, slope, intercept); NULL slope/intercept where the
    weighted covariate is locally constant (den = 0).
    """
    sub = 32 - grid_bits
    xs = F.col("x").cast("bigint") + (1 << 31)
    yd = F.lit((1 << 31) - 1) - F.col("y").cast("bigint")
    xv = F.col(x_col).cast("decimal(38,0)")
    yv = F.col(y_col).cast("decimal(38,0)")
    cells = (
        points.select(
            F.shiftright(xs, sub).alias("gx"),
            F.shiftright(yd, sub).alias("gy"),
            xv.alias("_x"),
            yv.alias("_y"),
        )
        .groupBy("gx", "gy")
        .agg(
            F.count("*").cast("decimal(38,0)").alias("n"),
            F.sum("_x").alias("sx"),
            F.sum("_y").alias("sy"),
            F.sum(F.col("_x") * F.col("_x")).alias("sxx"),
            F.sum(F.col("_x") * F.col("_y")).alias("sxy"),
        )
    )
    taps = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"), F.lit(w).alias("w"))
            for dx, dy, w in _epanechnikov_taps(radius)
        ]
    )
    w = F.col("t.w").cast("decimal(38,0)")
    nb = (
        cells.select("*", F.explode(taps).alias("t"))
        .groupBy(
            (F.col("gx") + F.col("t.dx")).alias("gx"),
            (F.col("gy") + F.col("t.dy")).alias("gy"),
        )
        .agg(
            F.sum(w * F.col("n")).alias("swn"),
            F.sum(w * F.col("sx")).alias("swx"),
            F.sum(w * F.col("sy")).alias("swy"),
            F.sum(w * F.col("sxx")).alias("swxx"),
            F.sum(w * F.col("sxy")).alias("swxy"),
        )
    )
    d = lambda c: F.col(c).cast("double")
    num = d("swn") * d("swxy") - d("swx") * d("swy")
    den = d("swn") * d("swxx") - d("swx") * d("swx")
    slope = num / F.nullif(den, F.lit(0.0))
    intercept = (d("swy") - slope * d("swx")) / d("swn")
    m = float(10 ** out_scale)
    r_ = lambda c: F.floor(c * F.lit(m) + F.lit(0.5)).cast("double") / F.lit(m)
    return nb.select(
        "gx",
        "gy",
        F.col("swn").cast("bigint").alias("n_eff"),
        r_(slope).alias("slope"),
        r_(intercept).alias("intercept"),
    )


def gwr_local_sql(
    pts_rel: str,
    grid_bits: int,
    radius: int = 2,
    out_scale: int = 6,
) -> str:
    """DuckDB twin of gwr_local over ``pts_rel`` (x, y, xv, yv) — same
    decimal accumulation, same tap table, same mirrored float order."""
    step = 1 << (32 - grid_bits)
    taps = ",".join(f"({dx},{dy},{w})" for dx, dy, w in _epanechnikov_taps(radius))
    m = float(10 ** out_scale)
    q = lambda e: f"cast(floor(({e}) * {m!r} + 0.5) as double) / {m!r}"
    return f"""
      with pts as ({pts_rel}),
      cells as (
        select cast(floor((x + 2147483648) / {step}) as bigint) as gx,
               cast(floor((2147483647 - y) / {step}) as bigint) as gy,
               cast(count(*) as decimal(38,0)) as n,
               sum(cast(xv as decimal(38,0))) as sx,
               sum(cast(yv as decimal(38,0))) as sy,
               sum(cast(xv as decimal(38,0)) * cast(xv as decimal(38,0))) as sxx,
               sum(cast(xv as decimal(38,0)) * cast(yv as decimal(38,0))) as sxy
        from pts group by 1, 2),
      taps(dx, dy, w) as (values {taps}),
      nb as (
        select gx + dx as gx, gy + dy as gy,
               sum(cast(w as decimal(38,0)) * n) as swn,
               sum(cast(w as decimal(38,0)) * sx) as swx,
               sum(cast(w as decimal(38,0)) * sy) as swy,
               sum(cast(w as decimal(38,0)) * sxx) as swxx,
               sum(cast(w as decimal(38,0)) * sxy) as swxy
        from cells cross join taps group by 1, 2),
      s as (
        select gx, gy, swn,
               (cast(swn as double) * cast(swxy as double)
                - cast(swx as double) * cast(swy as double))
               / nullif(cast(swn as double) * cast(swxx as double)
                        - cast(swx as double) * cast(swx as double), 0.0) as slope,
               swx, swy
        from nb)
      select gx, gy, cast(swn as bigint) as n_eff,
             {q('slope')} as slope,
             {q('(cast(swy as double) - slope * cast(swx as double)) / cast(swn as double)')} as intercept
      from s
    """


def theil_sen(
    df: DataFrame,
    group_col: str,
    x_col: str = "x",
    y_col: str = "y",
    cap: int = 200,
    out_scale: int = 6,
) -> DataFrame:
    """Per-group Theil–Sen robust trend (Theil 1950 / Sen 1968): slope =
    the MEDIAN of all pairwise slopes (y_j−y_i)/(x_j−x_i), intercept =
    the median residual at that slope — the breakdown-resistant sibling
    of group_linreg (one wild outlier moves OLS arbitrarily; Theil–Sen
    tolerates ~29% contamination).  The standard robust drift detector
    for sensor/telemetry groups.

    Determinism: inputs are INTEGERS; every pairwise slope is one IEEE
    division of exact integers (identical doubles everywhere); the
    median is an order statistic — if the median index lands inside a
    run of equal doubles the selected VALUE is unchanged by tie order,
    and the even-m case averages two doubles (exact same rounding on
    both engines).  Outputs floor-form-quantized.

    Scale shape: groups capped at ``cap`` rows (deterministic first-by
    (x, y) order) so the pairwise explode is bounded at cap²/2 per
    group — the medoid/hausdorff guard; one self-join shuffle + two
    window passes on the PAIR table.  Groups with no valid pair (all x
    equal) are absent from the output (documented).

    → (group, n_pts, n_pairs, slope, intercept).
    """
    from pyspark.sql import Window

    g = F.col(group_col)
    wcap = Window.partitionBy(group_col).orderBy(F.col("_x").asc(), F.col("_y").asc())
    base = (
        df.select(group_col, F.col(x_col).cast("long").alias("_x"), F.col(y_col).cast("long").alias("_y"))
        .withColumn("_rn", F.row_number().over(wcap))
        .filter(F.col("_rn") <= cap)
    )
    npts = base.groupBy(group_col).agg(F.count("*").alias("n_pts"))
    a = base.select(g.alias("_g"), F.col("_x").alias("x1"), F.col("_y").alias("y1"), F.col("_rn").alias("r1"))
    b = base.select(g.alias("_g2"), F.col("_x").alias("x2"), F.col("_y").alias("y2"), F.col("_rn").alias("r2"))
    pairs = (
        a.join(b, (F.col("_g") == F.col("_g2")) & (F.col("r1") < F.col("r2")))
        .filter(F.col("x1") != F.col("x2"))
        .select(
            F.col("_g").alias(group_col),
            ((F.col("y2") - F.col("y1")).cast("double") / (F.col("x2") - F.col("x1")).cast("double")).alias("_s"),
        )
    )
    wm = Window.partitionBy(group_col).orderBy(F.col("_s").asc())
    ranked = pairs.withColumn("_r", F.row_number().over(wm)).withColumn(
        "_m", F.count("*").over(Window.partitionBy(group_col))
    )
    med = (
        ranked.filter(
            (F.col("_r") == F.expr("(_m + 1) div 2")) | (F.col("_r") == F.expr("_m div 2 + 1"))
        )
        .groupBy(group_col)
        .agg(F.avg("_s").alias("_slope"), F.max("_m").alias("n_pairs"))
    )
    res = base.join(med, group_col).select(
        group_col,
        "n_pairs",
        "_slope",
        (F.col("_y").cast("double") - F.col("_slope") * F.col("_x").cast("double")).alias("_e"),
    )
    wr = Window.partitionBy(group_col).orderBy(F.col("_e").asc())
    rres = res.withColumn("_r", F.row_number().over(wr)).withColumn(
        "_m", F.count("*").over(Window.partitionBy(group_col))
    )
    out = (
        rres.filter(
            (F.col("_r") == F.expr("(_m + 1) div 2")) | (F.col("_r") == F.expr("_m div 2 + 1"))
        )
        .groupBy(group_col, "n_pairs", "_slope")
        .agg(F.avg("_e").alias("_icept"))
    )
    m = float(10 ** out_scale)
    q = lambda c: F.floor(c * F.lit(m) + F.lit(0.5)).cast("double") / F.lit(m)
    return out.join(npts, group_col).select(
        group_col,
        F.col("n_pts").cast("long").alias("n_pts"),
        F.col("n_pairs").cast("long").alias("n_pairs"),
        q(F.col("_slope")).alias("slope"),
        q(F.col("_icept")).alias("intercept"),
    )


def theil_sen_sql(
    rel: str,
    group_col: str = "grp",
    cap: int = 200,
    out_scale: int = 6,
) -> str:
    """DuckDB twin of :func:`theil_sen` over ``rel`` (group, x, y) —
    same cap order, same IEEE slope division, same median positions."""
    m = float(10 ** out_scale)
    q = lambda e: f"cast(floor(({e}) * {m!r} + 0.5) as double) / {m!r}"
    g = group_col
    return f"""
      with src as (select {g}, cast(x as bigint) as x, cast(y as bigint) as y from {rel}),
      capd as (select * from (
                 select *, row_number() over (partition by {g} order by x asc, y asc) as rn
                 from src) z where rn <= {cap}),
      np as (select {g}, count(*) as n_pts from capd group by {g}),
      pairs as (
        select a.{g},
               cast(b.y - a.y as double) / cast(b.x - a.x as double) as s
        from capd a join capd b on a.{g} = b.{g} and a.rn < b.rn
        where a.x <> b.x),
      rk as (select {g}, s,
                    row_number() over (partition by {g} order by s asc) as r,
                    count(*) over (partition by {g}) as m
             from pairs),
      med as (select {g}, avg(s) as slope, max(m) as n_pairs
              from rk where r = (m + 1) // 2 or r = m // 2 + 1
              group by {g}),
      res as (select c.{g}, med.n_pairs, med.slope,
                     cast(c.y as double) - med.slope * cast(c.x as double) as e
              from capd c join med on c.{g} = med.{g}),
      rr as (select {g}, n_pairs, slope, e,
                    row_number() over (partition by {g} order by e asc) as r,
                    count(*) over (partition by {g}) as m
             from res),
      ic as (select {g}, n_pairs, slope, avg(e) as icept
             from rr where r = (m + 1) // 2 or r = m // 2 + 1
             group by {g}, n_pairs, slope)
      select ic.{g}, cast(np.n_pts as bigint) as n_pts,
             cast(ic.n_pairs as bigint) as n_pairs,
             {q('ic.slope')} as slope,
             {q('ic.icept')} as intercept
      from ic join np on ic.{g} = np.{g}
    """


def ripley_pair_counts(
    pts: DataFrame,
    radii_imps: tuple[int, ...],
    id_col: str = "id",
    x_col: str = "x",
    y_col: str = "y",
    max_points_per_cell: int = 100_000,
) -> DataFrame:
    """Ripley's K / pair-correlation core: for each radius r in
    ``radii_imps`` (ascending imps), the EXACT count of unordered point
    pairs with 0 < d² ≤ r² — the integer heart of the K-function
    (K̂(r) = A·2·pairs(r)/(n(n−1)) is a driver-side scalar normalization
    over these counts; published form: Ripley 1976).

    Grid-blocked all-pairs-within-r: cell size = the smallest power of
    two ≥ max(radii), ONE side of the self-join replicates into its 3×3
    halo (pair distance ≤ r ≤ cell ⇒ the partner's replica lands in the
    home cell exactly once), ``id1 < id2`` picks each unordered pair on
    exactly one side — no distinct, no double count.  One shuffle
    equi-join on the cell key; candidate work is quadratic only in
    per-cell counts, and a degenerate cell is guarded by
    ``max_points_per_cell`` (the LSH bucket-cap rule — capped cells are
    excluded loudly by contract, not silently exploded).

    Per-radius counts come from ONE conditional aggregation over the
    ≤ max-radius pair set (no per-radius rescan), unpivoted to
    (r_imp, pairs) rows — all integers, bit-identical cross-engine.
    Empty pair sets still emit one row per radius (pairs = 0).
    """
    radii = sorted(int(r) for r in radii_imps)
    assert radii and radii[0] > 0
    step = 1 << max(int(r) - 1 for r in radii).bit_length()
    cx = F.floor((F.col(x_col) + F.lit(2147483648.0)) / F.lit(float(step))).cast("long")
    cy = F.floor((F.lit(2147483647.0) - F.col(y_col)) / F.lit(float(step))).cast("long")
    c = pts.select(
        F.col(id_col).alias("_id"),
        F.col(x_col).cast("long").alias("_x"),
        F.col(y_col).cast("long").alias("_y"),
        cx.alias("_cx"),
        cy.alias("_cy"),
    )
    ncell = Window.partitionBy("_cx", "_cy")
    c = c.withColumn("_n", F.count("*").over(ncell)).filter(
        F.col("_n") <= max_points_per_cell
    )
    halo = F.explode(
        F.array(
            *[
                F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
                for dx in (-1, 0, 1)
                for dy in (-1, 0, 1)
            ]
        )
    ).alias("h")
    rep = c.select("_id", "_x", "_y", "_cx", "_cy", halo).select(
        F.col("_id").alias("_id2"),
        F.col("_x").alias("_x2"),
        F.col("_y").alias("_y2"),
        (F.col("_cx") + F.col("h.dx")).alias("_cx"),
        (F.col("_cy") + F.col("h.dy")).alias("_cy"),
    )
    maxr2 = radii[-1] * radii[-1]
    d2 = (F.col("_x") - F.col("_x2")) * (F.col("_x") - F.col("_x2")) + (
        F.col("_y") - F.col("_y2")
    ) * (F.col("_y") - F.col("_y2"))
    pairs = (
        c.join(rep, ["_cx", "_cy"])
        .filter(F.col("_id") < F.col("_id2"))
        .select(d2.alias("_d2"))
        .filter((F.col("_d2") > 0) & (F.col("_d2") <= F.lit(maxr2)))
    )
    agg = pairs.agg(
        *[
            F.coalesce(
                F.sum(F.when(F.col("_d2") <= F.lit(r * r), 1).otherwise(0)), F.lit(0)
            )
            .cast("long")
            .alias(f"_c{i}")
            for i, r in enumerate(radii)
        ]
    )
    rows = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(r).cast("long").alias("r_imp"),
                    F.col(f"_c{i}").alias("pairs"),
                )
                for i, r in enumerate(radii)
            ]
        )
    ).alias("t")
    return agg.select(rows).select("t.r_imp", "t.pairs")


def ripley_pair_counts_sql(
    pts_rel: str,
    radii_imps: tuple[int, ...],
    id_col: str = "id",
    x_col: str = "x",
    y_col: str = "y",
    max_points_per_cell: int = 100_000,
) -> str:
    """DuckDB twin of ripley_pair_counts — same grid, same halo
    replication, same conditional aggregation (the per-radius scalar
    CTE is referenced once per radius, hence materialized)."""
    radii = sorted(int(r) for r in radii_imps)
    step = 1 << max(int(r) - 1 for r in radii).bit_length()
    maxr2 = radii[-1] * radii[-1]
    halo = ",".join(f"({dx},{dy})" for dx in (-1, 0, 1) for dy in (-1, 0, 1))
    cnt_cols = ",\n               ".join(
        f"coalesce(sum(case when d2 <= {r * r} then 1 else 0 end), 0) as c{i}"
        for i, r in enumerate(radii)
    )
    unpivot = "\n      union all\n      ".join(
        f"select cast({r} as bigint) as r_imp, cast(c{i} as bigint) as pairs from agg"
        for i, r in enumerate(radii)
    )
    return f"""
      with src as ({pts_rel}),
      c as materialized (
        select * from (
          select {id_col} as id, cast({x_col} as bigint) as x,
                 cast({y_col} as bigint) as y,
                 cast(floor(({x_col} + 2147483648.0) / {float(step)!r}) as bigint) as cx,
                 cast(floor((2147483647.0 - {y_col}) / {float(step)!r}) as bigint) as cy,
                 count(*) over (partition by
                   cast(floor(({x_col} + 2147483648.0) / {float(step)!r}) as bigint),
                   cast(floor((2147483647.0 - {y_col}) / {float(step)!r}) as bigint)) as n
          from src) t
        where n <= {max_points_per_cell}),
      rep as (select id as id2, x as x2, y as y2,
                     cx + dx as cx, cy + dy as cy
              from c cross join (values {halo}) h(dx, dy)),
      pr as (select (a.x - b.x2) * (a.x - b.x2)
                  + (a.y - b.y2) * (a.y - b.y2) as d2
             from c a join rep b on a.cx = b.cx and a.cy = b.cy
                                and a.id < b.id2
             where (a.x - b.x2) * (a.x - b.x2)
                 + (a.y - b.y2) * (a.y - b.y2) > 0
               and (a.x - b.x2) * (a.x - b.x2)
                 + (a.y - b.y2) * (a.y - b.y2) <= {maxr2}),
      agg as materialized (
        select {cnt_cols} from pr)
      {unpivot}
    """


def semivariogram(
    pts: DataFrame,
    lags_imps: tuple[int, ...],
    id_col: str = "id",
    x_col: str = "x",
    y_col: str = "y",
    val_col: str = "v",
    max_points_per_cell: int = 100_000,
) -> DataFrame:
    """Empirical semivariogram — the kriging precursor (Matheron 1963):
    per distance-lag bin h, the EXACT integer pair count N(h) and sum
    Σ(zᵢ−zⱼ)² over unordered pairs with lag_{k-1} < d ≤ lag_k (first
    bin starts at 0 exclusive); γ̂(h) = sum_sq / (2·N(h)) is the
    caller's one division.  Values must be integers (quantize upstream
    per the float law).

    Same grid-blocked halo self-join as ripley_pair_counts — cell =
    pow2 ≥ max lag, 3×3 halo on one side, id<id2 exactly-once pairing,
    per-cell cap guard — plus ONE conditional aggregation unpivoted to
    (lag_imp, n_pairs, sum_sq) rows.  All bigint, bit-identical
    cross-engine; empty bins emit zeros.
    """
    lags = sorted(int(r) for r in lags_imps)
    assert lags and lags[0] > 0
    step = 1 << max(int(r) - 1 for r in lags).bit_length()
    cx = F.floor((F.col(x_col) + F.lit(2147483648.0)) / F.lit(float(step))).cast("long")
    cy = F.floor((F.lit(2147483647.0) - F.col(y_col)) / F.lit(float(step))).cast("long")
    c = pts.select(
        F.col(id_col).alias("_id"),
        F.col(x_col).cast("long").alias("_x"),
        F.col(y_col).cast("long").alias("_y"),
        F.col(val_col).cast("long").alias("_v"),
        cx.alias("_cx"),
        cy.alias("_cy"),
    )
    ncell = Window.partitionBy("_cx", "_cy")
    c = c.withColumn("_n", F.count("*").over(ncell)).filter(
        F.col("_n") <= max_points_per_cell
    )
    halo = F.explode(
        F.array(
            *[
                F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
                for dx in (-1, 0, 1)
                for dy in (-1, 0, 1)
            ]
        )
    ).alias("h")
    rep = c.select("_id", "_x", "_y", "_v", "_cx", "_cy", halo).select(
        F.col("_id").alias("_id2"),
        F.col("_x").alias("_x2"),
        F.col("_y").alias("_y2"),
        F.col("_v").alias("_v2"),
        (F.col("_cx") + F.col("h.dx")).alias("_cx"),
        (F.col("_cy") + F.col("h.dy")).alias("_cy"),
    )
    maxr2 = lags[-1] * lags[-1]
    d2 = (F.col("_x") - F.col("_x2")) * (F.col("_x") - F.col("_x2")) + (
        F.col("_y") - F.col("_y2")
    ) * (F.col("_y") - F.col("_y2"))
    dv = F.col("_v") - F.col("_v2")
    pairs = (
        c.join(rep, ["_cx", "_cy"])
        .filter(F.col("_id") < F.col("_id2"))
        .select(d2.alias("_d2"), (dv * dv).alias("_q"))
        .filter((F.col("_d2") > 0) & (F.col("_d2") <= F.lit(maxr2)))
    )
    bounds = [0] + lags
    aggs = []
    for i, r in enumerate(lags):
        lo2, hi2 = bounds[i] * bounds[i], r * r
        inbin = (F.col("_d2") > lo2) & (F.col("_d2") <= hi2)
        aggs.append(
            F.coalesce(F.sum(F.when(inbin, 1).otherwise(0)), F.lit(0))
            .cast("long")
            .alias(f"_n{i}")
        )
        aggs.append(
            F.coalesce(F.sum(F.when(inbin, F.col("_q")).otherwise(0)), F.lit(0))
            .cast("long")
            .alias(f"_s{i}")
        )
    agg = pairs.agg(*aggs)
    rows = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(r).cast("long").alias("lag_imp"),
                    F.col(f"_n{i}").alias("n_pairs"),
                    F.col(f"_s{i}").alias("sum_sq"),
                )
                for i, r in enumerate(lags)
            ]
        )
    ).alias("t")
    return agg.select(rows).select("t.lag_imp", "t.n_pairs", "t.sum_sq")


def semivariogram_sql(
    pts_rel: str,
    lags_imps: tuple[int, ...],
    max_points_per_cell: int = 100_000,
) -> str:
    """DuckDB twin of semivariogram over ``pts_rel`` (id, x, y, v)."""
    lags = sorted(int(r) for r in lags_imps)
    step = 1 << max(int(r) - 1 for r in lags).bit_length()
    maxr2 = lags[-1] * lags[-1]
    halo = ",".join(f"({dx},{dy})" for dx in (-1, 0, 1) for dy in (-1, 0, 1))
    bounds = [0] + lags
    cols = []
    for i, r in enumerate(lags):
        lo2, hi2 = bounds[i] * bounds[i], r * r
        cols.append(
            f"coalesce(sum(case when d2 > {lo2} and d2 <= {hi2} then 1 else 0 end), 0) as n{i}"
        )
        cols.append(
            f"coalesce(sum(case when d2 > {lo2} and d2 <= {hi2} then q else 0 end), 0) as s{i}"
        )
    cnt_cols = ",\n               ".join(cols)
    unpivot = "\n      union all\n      ".join(
        f"select cast({r} as bigint) as lag_imp, cast(n{i} as bigint) as n_pairs, "
        f"cast(s{i} as bigint) as sum_sq from agg"
        for i, r in enumerate(lags)
    )
    return f"""
      with src as ({pts_rel}),
      c as materialized (
        select * from (
          select id, cast(x as bigint) as x, cast(y as bigint) as y,
                 cast(v as bigint) as v,
                 cast(floor((x + 2147483648.0) / {float(step)!r}) as bigint) as cx,
                 cast(floor((2147483647.0 - y) / {float(step)!r}) as bigint) as cy,
                 count(*) over (partition by
                   cast(floor((x + 2147483648.0) / {float(step)!r}) as bigint),
                   cast(floor((2147483647.0 - y) / {float(step)!r}) as bigint)) as n
          from src) t
        where n <= {max_points_per_cell}),
      rep as (select id as id2, x as x2, y as y2, v as v2,
                     cx + dx as cx, cy + dy as cy
              from c cross join (values {halo}) h(dx, dy)),
      pr as (select (a.x - b.x2) * (a.x - b.x2)
                  + (a.y - b.y2) * (a.y - b.y2) as d2,
                    (a.v - b.v2) * (a.v - b.v2) as q
             from c a join rep b on a.cx = b.cx and a.cy = b.cy
                                and a.id < b.id2
             where (a.x - b.x2) * (a.x - b.x2)
                 + (a.y - b.y2) * (a.y - b.y2) > 0
               and (a.x - b.x2) * (a.x - b.x2)
                 + (a.y - b.y2) * (a.y - b.y2) <= {maxr2}),
      agg as materialized (
        select {cnt_cols} from pr)
      {unpivot}
    """
