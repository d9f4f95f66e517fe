"""Hex-grid (H3-style) neighborhood aggregation.

`kring_smooth` is the hex analog of the quad-tile pyramid rollup
(operators/tiling.py): for every populated hex cell, aggregate a value
over the cell plus its ring-≤k neighbors — the standard H3 "kRing
smoothing" used for density heatmaps and hotspot detection.  The hex
kRing is the reason H3 exists: all 6 ring-1 neighbors are equidistant,
so the smoothing window is isotropic (a quad 3×3 window weights
diagonals √2 farther).

Scale shape: the offset table has 3k(k+1)+1 rows (7 at k=1) and is
broadcast; each populated cell explodes to its kRing targets and one
hash aggregation regroups them — cost is |cells| × ring size with a
single shuffle on the target cell id, no point-level data touched
(the rollup already reduced points → cells).

All arithmetic is int64 (unpack axial q,r from the packed cell id, add
the offset, repack), so the DuckDB oracle is bit-exact by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from geodesk_spark.geo.hexgrid import _OFF

_MASK = (1 << 21) - 1


def kring_offsets(k: int = 1) -> list[tuple[int, int]]:
    """Axial (dq, dr) offsets of the hex ring neighborhood of radius k,
    including (0, 0): all cells with hex distance ≤ k."""
    return [
        (dq, dr)
        for dq in range(-k, k + 1)
        for dr in range(-k, k + 1)
        if max(abs(dq), abs(dr), abs(dq + dr)) <= k
    ]


def kring_smooth(
    cells: DataFrame,
    cell_col: str = "hcell",
    val_col: str = "n",
    k: int = 1,
) -> DataFrame:
    """Per-cell kRing aggregation over a (cell, value) rollup.

    Returns one row per POPULATED cell: its own value, the sum of
    values over its kRing (populated members only), and how many kRing
    cells are populated.  Empty halo cells are not emitted — smoothing
    reads from neighbors, it doesn't invent cells.
    """
    spark = cells.sparkSession
    offs = spark.createDataFrame(kring_offsets(k), "dq long, dr long")
    q = F.shiftright(F.col(cell_col), 21) - F.lit(_OFF)
    r = F.col(cell_col).bitwiseAND(F.lit(_MASK)) - F.lit(_OFF)
    # each source cell donates its value to every kRing target
    donated = (
        cells.select(F.col(cell_col), F.col(val_col))
        .crossJoin(F.broadcast(offs))
        .select(
            F.shiftleft(q + F.col("dq") + F.lit(_OFF), 21)
            .bitwiseOR(r + F.col("dr") + F.lit(_OFF))
            .alias("target"),
            F.col(val_col).alias("v"),
        )
        .groupBy("target")
        .agg(F.sum("v").alias("ring_sum"), F.count("*").alias("ring_cells"))
    )
    return (
        cells.join(donated, cells[cell_col] == donated["target"], "inner")
        .select(cell_col, val_col, "ring_sum", "ring_cells")
    )


def polyfill_bbox(
    df: DataFrame,
    size: int,
    minx: str = "minx",
    miny: str = "miny",
    maxx: str = "maxx",
    maxy: str = "maxy",
    out: str = "hcell",
) -> DataFrame:
    """H3-polyfill analog for bboxes: one output row per (input row, hex
    cell whose CENTER lies inside the bbox) — H3's center-in-polygon
    polyfill rule, restricted to the axis-aligned case where the cell
    enumeration is two nested integer ranges (r rows of the hex lattice,
    then the q interval each row admits).

    Pure JVM: ceil/floor bounds + `sequence` + `explode`, no UDF.  Rows
    whose bbox admits no cell center vanish (empty sequence), matching
    generate_series semantics on the oracle side.  At scale this is the
    build side of a hex range join: polyfill the query geometry, then
    equi-join on the cell id against a hex-encoded fact table.
    """
    import math

    D = float(size) * math.sqrt(3.0)  # x stride of a lattice row
    C = 1.5 * float(size)  # y stride between rows
    empty = F.array().cast("array<long>")
    r_lo = F.ceil(F.col(miny).cast("double") / F.lit(C))
    r_hi = F.floor(F.col(maxy).cast("double") / F.lit(C))
    df = df.withColumn(
        "_pr", F.explode(F.when(r_lo <= r_hi, F.sequence(r_lo, r_hi)).otherwise(empty))
    )
    q_lo = F.ceil(
        F.col(minx).cast("double") / F.lit(D) - F.col("_pr").cast("double") * F.lit(0.5)
    )
    q_hi = F.floor(
        F.col(maxx).cast("double") / F.lit(D) - F.col("_pr").cast("double") * F.lit(0.5)
    )
    df = df.withColumn(
        "_pq", F.explode(F.when(q_lo <= q_hi, F.sequence(q_lo, q_hi)).otherwise(empty))
    )
    return df.withColumn(
        out,
        F.shiftleft(F.col("_pq") + F.lit(_OFF), 21).bitwiseOR(F.col("_pr") + F.lit(_OFF)),
    ).drop("_pr", "_pq")


def polyfill_sql(rel: str, size: int, out: str = "hcell") -> str:
    """DuckDB twin of polyfill_bbox over a relation with
    (minx, miny, maxx, maxy): identical double op order, so the cell
    enumeration is bit-exact."""
    import math

    D = repr(float(size) * math.sqrt(3.0))
    C = repr(1.5 * float(size))
    return f"""
      with pfb as (select * from {rel}),
      pfr as (
        select *, unnest(generate_series(
            cast(ceil(miny / {C}) as bigint),
            cast(floor(maxy / {C}) as bigint))) as pr
        from pfb),
      pfq as (
        select *, unnest(generate_series(
            cast(ceil(minx / {D} - pr * 0.5) as bigint),
            cast(floor(maxx / {D} - pr * 0.5) as bigint))) as pq
        from pfr)
      select * exclude (pr, pq),
             ((pq + {_OFF}) << 21) | (pr + {_OFF}) as {out}
      from pfq
    """


def kring_sql(cell_sql_rel: str, k: int = 1, cell_col: str = "hcell", val_col: str = "n") -> str:
    """DuckDB twin of kring_smooth over a relation (name or subquery)
    with columns (cell_col, val_col) — identical int64 unpack/repack."""
    offs = ", ".join(f"({dq}, {dr})" for dq, dr in kring_offsets(k))
    return f"""
      with cells as (select * from {cell_sql_rel}),
      offs(dq, dr) as (values {offs}),
      donated as (
        select ((({cell_col} >> 21) - {_OFF} + dq + {_OFF}) << 21)
               | (({cell_col} & {_MASK}) - {_OFF} + dr + {_OFF}) as target,
               {val_col} as v
        from cells cross join offs),
      ring as (
        select target, cast(sum(v) as bigint) as ring_sum,
               count(*) as ring_cells
        from donated group by target)
      select c.{cell_col}, c.{val_col}, r.ring_sum, r.ring_cells
      from cells c join ring r on r.target = c.{cell_col}
    """


def polyfill_centers(
    df: DataFrame,
    size: int,
    minx: str = "minx",
    miny: str = "miny",
    maxx: str = "maxx",
    maxy: str = "maxy",
    out: str = "hcell",
) -> DataFrame:
    """:func:`polyfill_bbox` + the exact imp-plane CENTER of each emitted
    cell (``cx``, ``cy`` doubles) — the general H3 polyfill in two steps:
    polyfill the geometry's bbox, then keep cells whose center passes the
    point-in-geometry test (H3's center-in-polygon rule).  For convex
    polygons the test is a few half-plane columns; for arbitrary
    polygons feed (cx, cy) to the broadcast PIP join
    (operators/spatial_join.contains_points).

    Center math mirrors geo/hexgrid.hex_center (cx = size·√3·(q + r/2),
    cy = 1.5·size·r) with the same op order as the SQL twin, so the
    doubles are bit-identical across engines."""
    import math

    df = polyfill_bbox(df, size, minx, miny, maxx, maxy, out)
    q = (F.shiftright(F.col(out), 21) - F.lit(_OFF)).cast("double")
    r = (F.col(out).bitwiseAND(F.lit((1 << 21) - 1)) - F.lit(_OFF)).cast("double")
    return df.withColumn(
        "cx", F.lit(float(size) * math.sqrt(3.0)) * (q + r / F.lit(2.0))
    ).withColumn("cy", F.lit(1.5 * float(size)) * r)


def polyfill_centers_sql(rel: str, size: int, out: str = "hcell") -> str:
    """DuckDB twin of :func:`polyfill_centers` (same double op order)."""
    import math

    D = repr(float(size) * math.sqrt(3.0))
    C = repr(1.5 * float(size))
    inner = polyfill_sql(rel, size, out)
    return f"""
      select *,
             {D} * ((({out} >> 21) - {_OFF}) + (({out} & {(1 << 21) - 1}) - {_OFF}) / 2.0) as cx,
             {C} * (({out} & {(1 << 21) - 1}) - {_OFF}) as cy
      from ({inner})
    """
