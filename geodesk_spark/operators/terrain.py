"""Terrain analysis over sparse rasters: Horn slope / aspect / hillshade.

The raster family's derivative layer (reference analog: the MapMaker
raster pipeline, util/MapMaker.java:24-120, has no terrain pass — this
is an engine extension in the zonal/stencil family beside
tiles_sink.sobel_edge_energy): given a sparse integer "elevation"
raster (any z per cell — a density-DEM from grid_counts, a decoded
DEM tile, an aggregated pixel stat), produce per cell

- ``slope_pct``  — 100·|∇z| (Horn 3×3 gradient, the Sobel kernel),
- ``aspect_deg`` — downhill compass direction, [0, 360) clockwise from
  north, −1 on flat cells,
- ``hillshade``  — the standard illumination model
  255·(cos Z·cos S + sin Z·sin S·cos(Az − aspect)) for a sun at
  (azimuth, altitude), clamped at 0.

Determinism (the oracle-parity contract, CLAUDE.md float law):

- gradients are exact INTEGERS from one stencil_filter scatter pass;
- sun constants (cos/sin of zenith and azimuth) are HOST-side Python
  literals injected identically into both engines;
- aspect runs the integer gradients through detmath.det_atan2 (pure
  +/×/÷ — bit-identical on every libm) and an if-branch instead of a
  mod (Spark pmod vs DuckDB % differ on negatives);
- everything else is +/×/÷/sqrt (IEEE-correctly-rounded everywhere) in
  textually mirrored op order, floor-form-quantized at 1e6.

100 TB shape: identical to sobel_edge_energy — one explode(≤8 taps) →
one groupBy(cell) shuffle; the trig ladder is ~40 extra projection
nodes per row inside whole-stage codegen, no UDF, no second shuffle.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

from geodesk_spark.geo import detmath
from geodesk_spark.operators import tiles_sink

# Horn/Sobel taps in stencil scatter form: out(q) = Σ w·z(q − d)
_GX_TAPS = [(1, 1, -1), (1, 0, -2), (1, -1, -1), (-1, 1, 1), (-1, 0, 2), (-1, -1, 1)]
_GY_TAPS = [(1, 1, -1), (0, 1, -2), (-1, 1, -1), (1, -1, 1), (0, -1, 2), (-1, -1, 1)]

_DEG = 180.0 / math.pi


def _sun_constants(azimuth_deg: float, altitude_deg: float) -> tuple[float, float, float]:
    """(cos_zenith, bx, by) with hs = 255·(cosZ + bx·p + by·q)/√(1+p²+q²).

    Derivation: aspect = atan2(q, −p), cos(aspect) = −p/m, sin(aspect) =
    q/m, sin S = m/√(1+m²), so sinZ·sinS·cos(Az − aspect) =
    sinZ·(cosAz·(−p) + sinAz·q)/√(1+p²+q²).  Computed host-side ONCE —
    the same 3 double literals reach Spark and DuckDB.
    """
    zen = math.radians(90.0 - altitude_deg)
    az = math.radians(azimuth_deg)
    return math.cos(zen), -math.sin(zen) * math.cos(az), math.sin(zen) * math.sin(az)


def slope_aspect_hillshade(
    dem: DataFrame,
    cell: float = 1.0,
    azimuth_deg: float = 315.0,
    altitude_deg: float = 45.0,
    x_col: str = "gx",
    y_col: str = "gy",
    val: str = "n",
) -> DataFrame:
    """(gx, gy, slope_pct, aspect_deg, hillshade) per raster cell.

    ``dem`` holds sparse integer cells (x_col, y_col, val); absent
    neighbors read as 0 (sparse-raster convention shared with
    sobel_edge_energy — at the support boundary the gradients are
    boundary gradients, not NULLs).
    """
    c8 = 8.0 * cell
    cosz, bx, by = _sun_constants(azimuth_deg, altitude_deg)
    g = tiles_sink.stencil_filter(
        dem, {"gxn": _GX_TAPS, "gyn": _GY_TAPS}, x_col, y_col, val
    )
    g = g.withColumn("_p", F.col("gxn").cast("double") / F.lit(c8)).withColumn(
        "_q", F.col("gyn").cast("double") / F.lit(c8)
    )
    g = g.withColumn("_m2", F.col("_p") * F.col("_p") + F.col("_q") * F.col("_q"))
    g = detmath.det_atan2_cols(
        g, F.col("gyn").cast("double"), (-F.col("gxn")).cast("double"), "_ar"
    )
    deg = F.col("_ar") * F.lit(_DEG)
    aspect = F.when(
        (F.col("gxn") == 0) & (F.col("gyn") == 0), F.lit(-1.0)
    ).otherwise(
        _quant6(
            F.when(deg <= F.lit(90.0), F.lit(90.0) - deg).otherwise(
                F.lit(450.0) - deg
            )
        )
    )
    slope = _quant6(F.lit(100.0) * F.sqrt(F.col("_m2")))
    hs = (
        F.lit(255.0)
        * (F.lit(cosz) + (F.lit(bx) * F.col("_p") + F.lit(by) * F.col("_q")))
        / F.sqrt(F.lit(1.0) + F.col("_m2"))
    )
    hillshade = _quant6(F.greatest(hs, F.lit(0.0)))
    return g.select(
        x_col,
        y_col,
        slope.alias("slope_pct"),
        aspect.alias("aspect_deg"),
        hillshade.alias("hillshade"),
    )


def _quant6(col):
    return F.floor(col * F.lit(1e6) + F.lit(0.5)).cast("double") / F.lit(1e6)


_TAPS_SQL = ",".join(
    # union of offsets with both kernels' weights, sorted like stencil_filter
    f"({dx},{dy},{wx},{wy})"
    for (dx, dy), (wx, wy) in sorted(
        {
            (d[0], d[1]): (
                next((w for a, b, w in _GX_TAPS if (a, b) == (d[0], d[1])), 0),
                next((w for a, b, w in _GY_TAPS if (a, b) == (d[0], d[1])), 0),
            )
            for d in {(t[0], t[1]) for t in _GX_TAPS + _GY_TAPS}
        }.items()
    )
)


def slope_aspect_hillshade_sql(
    pix_rel: str,
    cell: float = 1.0,
    azimuth_deg: float = 315.0,
    altitude_deg: float = 45.0,
) -> str:
    """DuckDB twin over ``pix_rel`` (gx, gy, n) — same scatter, same
    det_atan2 ladder, same mirrored float op order."""
    c8 = 8.0 * cell
    cosz, bx, by = _sun_constants(azimuth_deg, altitude_deg)
    at2_ctes, at2 = detmath.det_atan2_sql(
        "cast(gyn as double)", "cast(-gxn as double)", "ter", "grad2"
    )
    q6 = lambda e: f"cast(floor(({e}) * 1e6 + 0.5) as double) / 1e6"
    deg = f"(ar * {_DEG!r})"
    aspect = (
        f"case when gxn = 0 and gyn = 0 then -1.0 else "
        f"{q6(f'case when {deg} <= 90.0 then 90.0 - {deg} else 450.0 - {deg} end')} end"
    )
    hs = f"255.0 * ({cosz!r} + ({bx!r} * p + {by!r} * q)) / sqrt(1.0 + m2)"
    return f"""
      with pix as ({pix_rel}),
      taps(dx, dy, wx, wy) as (values {_TAPS_SQL}),
      sc as (select gx + dx as gx, gy + dy as gy, n * wx as vx, n * wy as vy
             from pix cross join taps),
      grad as (select gx, gy, sum(vx) as gxn, sum(vy) as gyn from sc group by 1, 2),
      grad2 as (select *, cast(gxn as double) / {c8!r} as p,
                          cast(gyn as double) / {c8!r} as q from grad),
      {at2_ctes},
      m as (select gx, gy, gxn, gyn, p, q, p * p + q * q as m2, {at2} as ar
            from at2_ter_fin)
      select gx, gy,
             {q6('100.0 * sqrt(m2)')} as slope_pct,
             {aspect} as aspect_deg,
             {q6(f'greatest({hs}, 0.0)')} as hillshade
      from m
    """


def viewshed(
    dem: DataFrame,
    ox: int,
    oy: int,
    observer_height: int,
    radius: int,
    x_col: str = "gx",
    y_col: str = "gy",
    val: str = "n",
) -> DataFrame:
    """Viewshed: which cells within ``radius`` (Chebyshev) of the
    observer at cell (ox, oy) are VISIBLE over the terrain — the
    classic line-of-sight raster analysis, exact and distributed.

    Integer-exact visibility with no trig and no division: ray samples
    between observer and target are taken at the shared parameter
    k/n (n = Chebyshev distance), so the along-ray distance of sample
    k is exactly (k/n)·d_target and the blocking test
    angle_k ≥ angle_target cross-multiplies to the PURE INTEGER
    comparison (z_k − oz)·n ≥ (z_t − oz)·k — bit-identical everywhere.
    Sample cell indices use floor(v + 0.5) on an exact small-integer
    double ratio (the repo's rounding law; integer div would split
    between Spark truncation and DuckDB flooring on negatives).

    Sparse-DEM convention: absent cells read elevation 0 (shared with
    slope_aspect_hillshade / sobel).  A sample at grazing angle BLOCKS
    (≥, the conservative standard).  The observer cell itself and its
    8 neighbors are always visible (no samples strictly between).

    Scale shape: targets×samples explode is bounded by radius per
    target (O(R³) rows per observer, R a small analysis constant), then
    ONE left equi-join against the DEM on the sample cell and ONE
    groupBy(target) — the same two-shuffle budget as the stencil ops.

    → (gx, gy, z, visible).
    """
    oz_row = dem.filter((F.col(x_col) == ox) & (F.col(y_col) == oy)).select(val).collect()
    oz = int(oz_row[0][0] if oz_row else 0) + int(observer_height)
    t = dem.filter(
        (F.abs(F.col(x_col) - ox) <= radius) & (F.abs(F.col(y_col) - oy) <= radius)
    ).select(
        F.col(x_col).alias("tx"), F.col(y_col).alias("ty"), F.col(val).alias("tz")
    )
    n = F.greatest(F.abs(F.col("tx") - ox), F.abs(F.col("ty") - oy))
    t = t.withColumn("_n", n)
    # filter BEFORE the explode: Spark's sequence(1, n-1) infers a
    # DESCENDING step for n <= 1 (yielding bogus k=0/-1 samples and a
    # k*dx/0 division) instead of an empty array
    s = t.filter(F.col("_n") > 1).withColumn(
        "_k", F.explode(F.sequence(F.lit(1), F.col("_n") - 1))
    )
    # sample cell: ox + round(k*dx/n) via floor(+0.5) on an exact ratio
    def samp(o, tc):
        v = (F.col("_k") * (F.col(tc) - o)).cast("double") / F.col("_n").cast("double")
        return F.lit(o) + F.floor(v + F.lit(0.5)).cast("long")

    s = s.withColumn("_sx", samp(ox, "tx")).withColumn("_sy", samp(oy, "ty"))
    d = dem.select(
        F.col(x_col).alias("_sx"), F.col(y_col).alias("_sy"), F.col(val).alias("_sz")
    )
    s = s.join(d, ["_sx", "_sy"], "left").withColumn(
        "_sz", F.coalesce(F.col("_sz"), F.lit(0))
    )
    blocked = (
        s.filter(
            (F.col("_sz") - F.lit(oz)) * F.col("_n")
            >= (F.col("tz") - F.lit(oz)) * F.col("_k")
        )
        .select("tx", "ty")
        .distinct()
        .withColumn("_blocked", F.lit(True))
    )
    out = t.join(blocked, ["tx", "ty"], "left")
    return out.select(
        F.col("tx").alias(x_col),
        F.col("ty").alias(y_col),
        F.col("tz").cast("long").alias("z"),
        F.coalesce(F.col("_blocked"), F.lit(False)).__invert__().alias("visible"),
    )


def viewshed_sql(
    pix_rel: str, ox: int, oy: int, observer_height: int, radius: int
) -> str:
    """DuckDB twin of :func:`viewshed` over ``pix_rel`` (gx, gy, n)."""
    return f"""
      with pix as ({pix_rel}),
      ozc as (select coalesce(max(n), 0) + {observer_height} as oz
              from pix where gx = {ox} and gy = {oy}),
      t as (select gx as tx, gy as ty, n as tz,
                   greatest(abs(gx - {ox}), abs(gy - {oy})) as nn
            from pix
            where abs(gx - {ox}) <= {radius} and abs(gy - {oy}) <= {radius}),
      s as (select *, unnest(generate_series(1, cast(nn - 1 as bigint))) as k
            from t where nn > 1),
      sc as (select *,
               {ox} + cast(floor(cast(k * (tx - {ox}) as double)
                                 / cast(nn as double) + 0.5) as bigint) as sx,
               {oy} + cast(floor(cast(k * (ty - {oy}) as double)
                                 / cast(nn as double) + 0.5) as bigint) as sy
             from s),
      sj as (select sc.*, coalesce(p.n, 0) as sz
             from sc left join pix p on p.gx = sc.sx and p.gy = sc.sy),
      blocked as (select distinct tx, ty from sj, ozc
                  where (sz - oz) * nn >= (tz - oz) * k),
      tt as (select t.tx, t.ty, t.tz from t)
      select tt.tx as gx, tt.ty as gy, cast(tt.tz as bigint) as z,
             b.tx is null as visible
      from tt left join blocked b on b.tx = tt.tx and b.ty = tt.ty
    """


# 8-neighborhood offsets with integer "distance weight" ×5: straight
# moves cost 5, diagonal 7 (7/5 ≈ √2 — the classic integer chamfer
# approximation, exact arithmetic on every engine)
_D8 = [
    (1, 0, 5), (-1, 0, 5), (0, 1, 5), (0, -1, 5),
    (1, 1, 7), (1, -1, 7), (-1, 1, 7), (-1, -1, 7),
]


def cost_distance(
    cost: DataFrame,
    sources: list[tuple[int, int]],
    rounds: int = 12,
    x_col: str = "gx",
    y_col: str = "gy",
    val: str = "n",
) -> DataFrame:
    """Cost-distance spreading (the GIS cost-surface accumulation): the
    minimum accumulated cost from any source cell to every raster cell,
    moving over the 8-neighborhood — wildfire/noise/access spreading
    over a friction surface, re-expressed as bounded-round SSSP over
    the implicit grid graph (graph.sssp_rounds — the delta-frontier
    Bellman-Ford whose round budget makes the ≤r-hop minimum exact and
    race-free).

    Grid edges are built by one tap explode + self-join on the CELL
    table (cells exist only where the surface has support — sparse in,
    sparse out); the edge weight is the integer chamfer form
    w(a→b) = move·(cost_a + cost_b) with straight moves ×5 and
    diagonals ×7 (7/5 ≈ √2) — all integers, so the accumulated minima
    are exact and order-free.  Cell ids pack as (gx+2^20)·2^21 +
    (gy+2^20).

    → (gx, gy, dist) for every cell reached within ``rounds`` hops.
    """
    from geodesk_spark.operators import graph as graph_mod

    pk = lambda x, y: (x + F.lit(1 << 20)) * F.lit(1 << 21) + (y + F.lit(1 << 20))
    c = cost.select(
        F.col(x_col).alias("_x"), F.col(y_col).alias("_y"), F.col(val).alias("_c")
    )
    taps = F.explode(
        F.array(
            *[
                F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"), F.lit(m).alias("m"))
                for dx, dy, m in _D8
            ]
        )
    ).alias("t")
    half = c.select("_x", "_y", "_c", taps).select(
        pk(F.col("_x"), F.col("_y")).alias("src"),
        (F.col("_x") + F.col("t.dx")).alias("_nx"),
        (F.col("_y") + F.col("t.dy")).alias("_ny"),
        "_c",
        F.col("t.m").alias("_m"),
    )
    nb = c.select(pk(F.col("_x"), F.col("_y")).alias("dst"), F.col("_x").alias("_nx"),
                  F.col("_y").alias("_ny"), F.col("_c").alias("_c2"))
    edges = half.join(nb, ["_nx", "_ny"]).select(
        "src", "dst", (F.col("_m") * (F.col("_c") + F.col("_c2"))).alias("w")
    )
    srcs = [((x + (1 << 20)) << 21) + (y + (1 << 20)) for x, y in sources]
    # materialize=True: the lazy join tower references each round's
    # frame twice, doubling the analyzed plan per round — fatal past
    # ~6 rounds (the CLAUDE.md iterative-plan law); the per-round
    # cache/checkpoint path is the scale shape here
    d = graph_mod.sssp_rounds(edges, srcs, rounds=rounds, materialize=True)
    return d.select(
        (F.expr("node div 2097152") - F.lit(1 << 20)).alias(x_col),
        (F.col("node") % F.lit(1 << 21) - F.lit(1 << 20)).alias(y_col),
        F.col("dist"),
    )


def cost_distance_sql(
    pix_rel: str, sources: list[tuple[int, int]], rounds: int = 12
) -> str:
    """DuckDB twin of :func:`cost_distance` over ``pix_rel`` (gx, gy, n)."""
    from geodesk_spark.operators import graph as graph_mod

    taps = ",".join(f"({dx},{dy},{m})" for dx, dy, m in _D8)
    edges = f"""
      with pix as ({pix_rel}),
      taps(dx, dy, m) as (values {taps}),
      h as (select (gx + 1048576) * 2097152 + (gy + 1048576) as src,
                   gx + dx as nx, gy + dy as ny, n as c, m
            from pix cross join taps)
      select h.src, (p.gx + 1048576) * 2097152 + (p.gy + 1048576) as dst,
             h.m * (h.c + p.n) as w
      from h join pix p on p.gx = h.nx and p.gy = h.ny
    """
    srcs = [((x + (1 << 20)) << 21) + (y + (1 << 20)) for x, y in sources]
    inner = graph_mod.sssp_rounds_sql(f"({edges})", srcs, rounds=rounds)
    return f"""
      with d as ({inner})
      select cast(node // 2097152 - 1048576 as bigint) as gx,
             cast(node % 2097152 - 1048576 as bigint) as gy,
             dist
      from d
    """


def d8_flow_direction(
    dem: DataFrame,
    x_col: str = "gx",
    y_col: str = "gy",
    val: str = "n",
) -> DataFrame:
    """D8 flow direction (the hydrology standard): each cell drains to
    its steepest-descent neighbor among the 8, or is a SINK (no lower
    neighbor).  Exact integer steepness: drop/movelen compares by
    cross-multiplication — with move lengths 5 (straight) and 7
    (diagonal, the chamfer pair), drop₁/m₁ > drop₂/m₂ ⟺ the integer
    keys 35·drop/m = {7·drop, 5·drop} compare directly; ties break by
    the fixed direction index (E,W,S,N,SE,NE,SW,NW order below), so
    the result is bit-deterministic.  Absent neighbors read z = 0 (the
    sparse convention) — border cells drain off-support.

    One tap explode + ONE left join on the neighbor cell + one
    groupBy(cell) max — the stencil budget.

    → (gx, gy, dir, to_gx, to_gy, is_sink); dir ∈ 0..7, −1 for sinks.
    """
    c = dem.select(F.col(x_col).alias("_x"), F.col(y_col).alias("_y"), F.col(val).alias("_z"))
    taps = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(i).alias("i"), F.lit(dx).alias("dx"),
                    F.lit(dy).alias("dy"), F.lit(35 // m).alias("kk"),
                )
                for i, (dx, dy, m) in enumerate(_D8)
            ]
        )
    ).alias("t")
    s = c.select("_x", "_y", "_z", taps).select(
        "_x", "_y", "_z",
        F.col("t.i").alias("_i"), F.col("t.kk").alias("_kk"),
        (F.col("_x") + F.col("t.dx")).alias("_nx"),
        (F.col("_y") + F.col("t.dy")).alias("_ny"),
    )
    nz = c.select(F.col("_x").alias("_nx"), F.col("_y").alias("_ny"), F.col("_z").alias("_nz"))
    s = s.join(nz, ["_nx", "_ny"], "left").withColumn("_nz", F.coalesce(F.col("_nz"), F.lit(0)))
    # one packed ordering integer (steepness key ×8 + direction
    # tie-break) — DuckDB's arg_max cannot order by a struct, so both
    # engines rank by the same scalar
    key = ((F.col("_z") - F.col("_nz")) * F.col("_kk")) * F.lit(8) + (F.lit(7) - F.col("_i"))
    best = (
        s.withColumn("_key", key)
        .filter((F.col("_z") - F.col("_nz")) * F.col("_kk") > 0)  # strictly downhill
        .groupBy("_x", "_y")
        .agg(
            F.max(
                F.struct(
                    F.col("_key"),
                    F.col("_nx").alias("bx"), F.col("_ny").alias("by"),
                    F.col("_i").alias("bi"),
                )
            ).alias("_b")
        )
    )
    out = c.join(best, ["_x", "_y"], "left")
    return out.select(
        F.col("_x").alias(x_col),
        F.col("_y").alias(y_col),
        F.coalesce(F.col("_b.bi"), F.lit(-1)).cast("int").alias("dir"),
        F.col("_b.bx").alias("to_gx"),
        F.col("_b.by").alias("to_gy"),
        F.col("_b.bi").isNull().alias("is_sink"),
    )


def flow_accumulation(
    dem: DataFrame,
    rounds: int = 8,
    x_col: str = "gx",
    y_col: str = "gy",
    val: str = "n",
) -> DataFrame:
    """D8 flow accumulation, bounded-round: acc(c) = cells whose flow
    path reaches c within ``rounds`` hops (including itself) — exact,
    because D8 gives every cell ONE outflow, so upstream paths are
    unique and the recursion acc ← 1 + Σ_parents acc counts each
    upstream cell exactly once per hop depth.  The bounded round count
    is the same well-definedness contract as graph.sssp_rounds; rounds
    ≥ the longest flow chain makes it the true accumulation.

    Per round ONE equi-join on the flow edge + a rollup, with
    localCheckpoint lineage truncation (the iterative-plan law).

    → (gx, gy, acc).
    """
    from geodesk_spark.operators.dedup import _release_local_checkpoint

    fd = d8_flow_direction(dem, x_col, y_col, val)
    cells = fd.select(F.col(x_col).alias("_x"), F.col(y_col).alias("_y"))
    edges = fd.filter(~F.col("is_sink")).select(
        F.col(x_col).alias("_sx"), F.col(y_col).alias("_sy"),
        F.col("to_gx").alias("_tx"), F.col("to_gy").alias("_ty"),
    )
    # keep only edges whose target exists (border outflow leaves the map)
    edges = edges.join(
        cells.select(F.col("_x").alias("_tx"), F.col("_y").alias("_ty")), ["_tx", "_ty"]
    ).localCheckpoint(eager=True)
    acc = cells.withColumn("acc", F.lit(1).cast("long")).localCheckpoint(eager=True)
    for _ in range(rounds):
        up = (
            edges.join(
                acc.select(F.col("_x").alias("_sx"), F.col("_y").alias("_sy"), "acc"),
                ["_sx", "_sy"],
            )
            .groupBy(F.col("_tx").alias("_x"), F.col("_ty").alias("_y"))
            .agg(F.sum("acc").alias("_in"))
        )
        nxt = (
            cells.join(up, ["_x", "_y"], "left")
            .withColumn("acc", F.lit(1) + F.coalesce(F.col("_in"), F.lit(0)))
            .select("_x", "_y", "acc")
        ).localCheckpoint(eager=True)
        _release_local_checkpoint(acc)
        acc = nxt
    _release_local_checkpoint(edges)
    return acc.select(
        F.col("_x").alias(x_col), F.col("_y").alias(y_col), F.col("acc").cast("long").alias("acc")
    )


def _d8_edges_sql_parts(pix_rel: str) -> list[str]:
    """Shared CTE prefix (pix → taps → steepest-descent `edges`) for
    the D8-derived oracles — textually identical to what
    flow_accumulation_sql always emitted, factored for watershed."""
    taps = ",".join(
        f"({i},{dx},{dy},{35 // m})" for i, (dx, dy, m) in enumerate(_D8)
    )
    return [
        f"pix as materialized ({pix_rel})",
        f"taps(i, dx, dy, kk) as (values {taps})",
        """s as (select p.gx as x, p.gy as y, p.n as z, t.i, t.kk,
                       p.gx + t.dx as nx, p.gy + t.dy as ny
                from pix p cross join taps t)""",
        """sj as (select s.*, coalesce(q.n, 0) as nz
                 from s left join pix q on q.gx = s.nx and q.gy = s.ny)""",
        """best as materialized (
             select x, y, arg_max(i, (z - nz) * kk * 8 + 7 - i) as bi,
                    arg_max(nx, (z - nz) * kk * 8 + 7 - i) as bx,
                    arg_max(ny, (z - nz) * kk * 8 + 7 - i) as by
             from sj where (z - nz) * kk > 0 group by x, y)""",
        """edges as materialized (
             select b.x as sx, b.y as sy, b.bx as tx, b.by as ty
             from best b join pix p on p.gx = b.bx and p.gy = b.by)""",
    ]


def flow_accumulation_sql(pix_rel: str, rounds: int = 8) -> str:
    """DuckDB twin of d8_flow_direction + flow_accumulation (one query:
    direction derivation inline, accumulation as materialized unrolled
    CTEs — the binder re-expands unmaterialized multi-referenced CTEs
    exponentially, the CLAUDE.md law)."""
    parts = _d8_edges_sql_parts(pix_rel) + [
        "a0 as materialized (select gx as x, gy as y, cast(1 as bigint) as acc from pix)",
    ]
    for k in range(1, rounds + 1):
        parts.append(
            f"""a{k} as materialized (
              select c.x, c.y, cast(1 + coalesce(u.s, 0) as bigint) as acc
              from a0 c left join (
                select e.tx as x, e.ty as y, sum(a.acc) as s
                from edges e join a{k-1} a on a.x = e.sx and a.y = e.sy
                group by e.tx, e.ty) u on u.x = c.x and u.y = c.y)"""
        )
    return (
        "with " + ",\n".join(parts)
        + f"\nselect x as gx, y as gy, acc from a{rounds}"
    )


def watershed_basins(
    dem: DataFrame,
    rounds: int = 6,
    x_col: str = "gx",
    y_col: str = "gy",
    val: str = "n",
) -> DataFrame:
    """Watershed (drainage-basin) labeling: every cell is labeled by the
    TERMINAL cell its D8 flow path reaches — a sink (no lower neighbor)
    or a border cell that drains off-support.  The terminal cell IS the
    basin id, so basins need no separate relabeling pass.

    D8 gives each cell exactly ONE outflow, so the flow graph is a
    functional forest and POINTER DOUBLING applies: with ptr₀(c) = the
    flow target (terminals point to themselves), each round replaces
    ptr ← ptr∘ptr, resolving chains up to 2^rounds hops — ``rounds`` = 6
    covers any flow path ≤ 64 cells, and the fixpoint is stable because
    terminals are self-loops (extra rounds are no-ops).  Same
    bounded-round well-definedness contract as graph.sssp_rounds.

    Per round ONE self equi-join on the pointer key, localCheckpoint
    lineage truncation per the iterative-plan law (the round plan
    references the previous frame twice).  O(log chain) rounds vs the
    O(chain) a hop-at-a-time walk would need — the same exponential
    contraction idea as dedup's star-contraction CC, specialized to
    out-degree-1 graphs where no min-reduction is needed.

    → (gx, gy, bx, by): (bx, by) = basin terminal cell.
    """
    from geodesk_spark.operators.dedup import _release_local_checkpoint

    fd = d8_flow_direction(dem, x_col, y_col, val)
    cells = fd.select(F.col(x_col).alias("_x"), F.col(y_col).alias("_y"))
    edges = fd.filter(~F.col("is_sink")).select(
        F.col(x_col).alias("_x"), F.col(y_col).alias("_y"),
        F.col("to_gx").alias("_tx"), F.col("to_gy").alias("_ty"),
    )
    # off-support targets terminate the path at the border cell itself
    edges = edges.join(
        cells.select(F.col("_x").alias("_tx"), F.col("_y").alias("_ty")), ["_tx", "_ty"]
    )
    ptr = (
        cells.join(edges, ["_x", "_y"], "left")
        .select(
            "_x", "_y",
            F.coalesce(F.col("_tx"), F.col("_x")).alias("_px"),
            F.coalesce(F.col("_ty"), F.col("_y")).alias("_py"),
        )
        .localCheckpoint(eager=True)
    )
    for _ in range(rounds):
        hop = ptr.select(
            F.col("_x").alias("_px"), F.col("_y").alias("_py"),
            F.col("_px").alias("_qx"), F.col("_py").alias("_qy"),
        )
        nxt = (
            ptr.join(hop, ["_px", "_py"])
            .select(
                "_x", "_y",
                F.col("_qx").alias("_px"), F.col("_qy").alias("_py"),
            )
            .localCheckpoint(eager=True)
        )
        _release_local_checkpoint(ptr)
        ptr = nxt
    return ptr.select(
        F.col("_x").alias(x_col), F.col("_y").alias(y_col),
        F.col("_px").alias("bx"), F.col("_py").alias("by"),
    )


def watershed_basins_sql(pix_rel: str, rounds: int = 6) -> str:
    """DuckDB twin of watershed_basins: the shared D8 `edges` prefix,
    then ``rounds`` materialized pointer-doubling CTEs (each level is
    self-joined — referenced twice — hence materialized, the CLAUDE.md
    binder law)."""
    parts = _d8_edges_sql_parts(pix_rel) + [
        """p0 as materialized (
             select c.gx as x, c.gy as y,
                    coalesce(e.tx, c.gx) as px, coalesce(e.ty, c.gy) as py
             from pix c left join edges e on e.sx = c.gx and e.sy = c.gy)""",
    ]
    for k in range(1, rounds + 1):
        parts.append(
            f"""p{k} as materialized (
              select a.x, a.y, b.px, b.py
              from p{k-1} a join p{k-1} b on b.x = a.px and b.y = a.py)"""
        )
    return (
        "with " + ",\n".join(parts)
        + f"\nselect x as gx, y as gy, px as bx, py as by from p{rounds}"
    )
