"""S2-analog polyfill: bbox -> covering cells under the center rule.

The S2 counterpart of operators/hexes.polyfill_bbox (H3's polyfill uses
the same center-in-region rule): a box in mercator-imp space maps to
every level-k cube-face cell whose CENTER lies inside it.  This is the
build side of an S2-bucketed spatial join — polyfill the query regions,
encode the points (geo/s2cell.s2_cell_cols), equi-join on cell id.

Shape, built for the 100 TB case:
  1. forward-sample a (G x G) integer grid over each box (exact integer
     arithmetic; G-1 a power of two so the lerp division is exact) and
     s2-encode the samples — one narrow JVM pass, no UDF;
  2. per (box, face): take the sampled ij envelope, pad by span/4 + 2
     (the quadratic ST transform stretches cell widths by at most ~2x
     across a face, so the true envelope of a connected image cannot
     outrun the sampled envelope by more than the inter-sample cell
     span — validated empirically against brute-force enumeration in
     tests/test_s2cover.py), and explode the candidate rectangle;
  3. compute each candidate's center with the deterministic INVERSE
     transform (geo/s2cell.cell_center_cols -> det_atan2/det_atanh) and
     keep exactly those inside the box.  Centers are integer imps, so
     the keep set is bit-identical across engines — the DuckDB twin
     runs the same three stages and hash-matches.

Candidate work per box is O(cells covered), never O(face cells); the
explode and filter pipeline is all whole-stage-codegen Columns.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from geodesk_spark.geo import s2cell

GRID = 9  # samples per axis; GRID-1 = 8 keeps the grid lerp exact


def _center_udf(level: int):
    """Arrow-vectorized (face, i, j) -> struct(cx, cy) center transform
    (numpy kernel geo/s2cell.cell_center_imps — the same IEEE op
    sequence as the DuckDB twin, so outputs are bit-identical)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("struct<cx: long, cy: long>")
    def centers(face: pd.Series, i: pd.Series, j: pd.Series) -> pd.DataFrame:
        cx, cy = s2cell.cell_center_imps(
            face.to_numpy(), i.to_numpy(), j.to_numpy(), level
        )
        return pd.DataFrame({"cx": cx, "cy": cy})

    return centers


def polyfill_bbox(boxes: DataFrame, level: int, grid: int = GRID) -> DataFrame:
    """Covering cells (center rule) for `boxes` (fid, minx, miny, maxx,
    maxy — integer imps).  Returns (fid, s2_face, s2_i, s2_j, s2_cell).
    One row per (box, covering cell)."""
    assert (grid - 1) & (grid - 2) == 0, "grid-1 must be a power of two"
    g1 = float(grid - 1)
    n = 1 << level
    ab = boxes.withColumn("_a", F.explode(F.sequence(F.lit(0), F.lit(grid - 1))))
    ab = ab.withColumn("_b", F.explode(F.sequence(F.lit(0), F.lit(grid - 1))))
    # exact lerp: (span * a) <= 2^35 exact in double; /8 exact; floor exact
    sx = F.col("minx") + F.floor(
        (F.col("maxx") - F.col("minx")).cast("double") * F.col("_a") / F.lit(g1)
    ).cast("long")
    sy = F.col("miny") + F.floor(
        (F.col("maxy") - F.col("miny")).cast("double") * F.col("_b") / F.lit(g1)
    ).cast("long")
    ab = ab.withColumn("_gx", sx).withColumn("_gy", sy)
    enc = s2cell.s2_cell_cols(ab, "_gx", "_gy", level)
    ranges = enc.groupBy("fid", "s2_face").agg(
        F.min("s2_i").alias("_il"),
        F.max("s2_i").alias("_ih"),
        F.min("s2_j").alias("_jl"),
        F.max("s2_j").alias("_jh"),
        F.min("minx").alias("minx"),
        F.min("miny").alias("miny"),
        F.min("maxx").alias("maxx"),
        F.min("maxy").alias("maxy"),
    )
    pad_i = F.floor((F.col("_ih") - F.col("_il")).cast("double") / F.lit(4.0)).cast(
        "long"
    ) + F.lit(2)
    pad_j = F.floor((F.col("_jh") - F.col("_jl")).cast("double") / F.lit(4.0)).cast(
        "long"
    ) + F.lit(2)
    ranges = (
        ranges.withColumn("_ilo", F.greatest(F.col("_il") - pad_i, F.lit(0).cast("long")))
        .withColumn("_ihi", F.least(F.col("_ih") + pad_i, F.lit(n - 1).cast("long")))
        .withColumn("_jlo", F.greatest(F.col("_jl") - pad_j, F.lit(0).cast("long")))
        .withColumn("_jhi", F.least(F.col("_jh") + pad_j, F.lit(n - 1).cast("long")))
    )
    cand = ranges.withColumn(
        "s2_i", F.explode(F.sequence(F.col("_ilo"), F.col("_ihi")))
    ).withColumn("s2_j", F.explode(F.sequence(F.col("_jlo"), F.col("_jhi"))))
    # Centers via the vectorized Arrow kernel, NOT cell_center_cols: a
    # Filter above the ~60-projection bound-column chain sends Catalyst's
    # predicate pushdown into exponential alias substitution (observed
    # StackOverflow in PushPredicateThroughNonJoin.trimAliases — the
    # same blowup the DuckDB twin dodges with its MATERIALIZED barrier).
    # The numpy kernel runs the identical op sequence, so cx/cy stay
    # bit-identical to the oracle; one Arrow batch pass, no shuffle.
    cand = cand.withColumn(
        "_ctr", _center_udf(level)(F.col("s2_face"), F.col("s2_i"), F.col("s2_j"))
    )
    cand = cand.withColumn("cx", F.col("_ctr.cx")).withColumn(
        "cy", F.col("_ctr.cy")
    )
    keep = cand.filter(
        (F.col("cx") >= F.col("minx"))
        & (F.col("cx") <= F.col("maxx"))
        & (F.col("cy") >= F.col("miny"))
        & (F.col("cy") <= F.col("maxy"))
    )
    keep = s2cell.hilbert_from_ij_cols(keep, "s2_i", "s2_j", level, "_s2hd")
    keep = keep.withColumn(
        "s2_cell",
        F.col("s2_face") * F.lit(1 << (2 * level)).cast("long") + F.col("_s2hd"),
    )
    return keep.select("fid", "s2_face", "s2_i", "s2_j", "s2_cell")


def polyfill_sql(box_rel: str, level: int, grid: int = GRID) -> str:
    """DuckDB twin of polyfill_bbox over `box_rel` (fid, minx, miny,
    maxx, maxy) — same three stages, same op order."""
    assert (grid - 1) & (grid - 2) == 0
    g1 = float(grid - 1)
    n = 1 << level
    s2_ctes, s2_final = s2cell.s2_sql("_gx", "_gy", level)
    cc_ctes, cc_last = s2cell.cell_center_sql("cand2", "s2_face", "s2_i", "s2_j", level)
    hd_ctes, hd_last = s2cell.hilbert_from_ij_sql("kept", "s2_i", "s2_j", level)
    return f"""
      with boxes as (select * from {box_rel}),
      sa as (select *, unnest(generate_series(0, {grid - 1})) as a from boxes),
      sb as (select *, unnest(generate_series(0, {grid - 1})) as b from sa),
      __s2_input__ as (
        select *,
          minx + cast(floor(cast(maxx - minx as double) * a / {g1!r}) as bigint) as _gx,
          miny + cast(floor(cast(maxy - miny as double) * b / {g1!r}) as bigint) as _gy
        from sb),
      {s2_ctes},
      enc as ({s2_final}),
      ranges as (
        select fid, s2_face,
               min(s2_i) as il, max(s2_i) as ih,
               min(s2_j) as jl, max(s2_j) as jh,
               min(minx) as minx, min(miny) as miny,
               min(maxx) as maxx, min(maxy) as maxy
        from enc group by fid, s2_face),
      padded as (
        select *,
          greatest(il - (cast(floor(cast(ih - il as double) / 4.0) as bigint) + 2), 0) as ilo,
          least(ih + (cast(floor(cast(ih - il as double) / 4.0) as bigint) + 2), {n - 1}) as ihi,
          greatest(jl - (cast(floor(cast(jh - jl as double) / 4.0) as bigint) + 2), 0) as jlo,
          least(jh + (cast(floor(cast(jh - jl as double) / 4.0) as bigint) + 2), {n - 1}) as jhi
        from ranges),
      cand1 as (select *, unnest(generate_series(ilo, ihi)) as s2_i from padded),
      cand2 as (select *, unnest(generate_series(jlo, jhi)) as s2_j from cand1),
      {cc_ctes},
      -- MATERIALIZED barrier (CLAUDE.md CTE law): without it DuckDB's
      -- filter pushdown substitutes cx/cy's whole det-kernel expression
      -- chain through every projection below — exponential expansion,
      -- the query never finishes planning even on 2 boxes.
      centers as materialized (
        select fid, minx, miny, maxx, maxy, s2_face, s2_i, s2_j, cx, cy
        from {cc_last}),
      kept as (
        select fid, s2_face, s2_i, s2_j from centers
        where cx between minx and maxx and cy between miny and maxy),
      {hd_ctes}
      select fid, s2_face, s2_i, s2_j,
             cast(s2_face as bigint) * {1 << (2 * level)} + hd as s2_cell
      from {hd_last}
    """
