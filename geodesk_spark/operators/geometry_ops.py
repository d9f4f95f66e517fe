"""Geometry aggregation operators: length() and area() (SURVEY §2.4).

- length (meters): per-segment Euclidean distance scaled at the segment
  mid-latitude (StoredWay.java:189-209 + Mercator.distance).
- area (m²): shoelace area × (meters-per-imp at the centroid Y)², holes
  subtracted (StoredFeature.java:473-479, Mercator.java:256-264).

One vectorized mapInPandas pass over the packed-geometry column.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from geodesk_spark.geo import mercator, pip


def with_length_area(features: DataFrame) -> DataFrame:
    """Adds length_m (lines: polyline length; polygons: shell perimeter)
    and area_m2 (polygons: shell − holes; lines: 0)."""

    def run(batches):
        for pdf in batches:
            n = len(pdf)
            length = np.zeros(n)
            area = np.zeros(n)
            for i in range(n):
                rings = pip.unpack_rings(pdf["geom"].iloc[i])
                shell = rings[0]
                length[i] = mercator.polyline_length_m(shell[:, 0], shell[:, 1])
                if pdf["gkind"].iloc[i] == "polygon":
                    area[i] = mercator.ring_area_m2(shell[:, 0], shell[:, 1])
                    for hole in rings[1:]:
                        area[i] -= mercator.ring_area_m2(hole[:, 0], hole[:, 1])
            out = pdf[["fid", "gkind"]].copy()
            out["length_m"] = length
            out["area_m2"] = area
            yield out

    return features.select("fid", "gkind", "geom").mapInPandas(
        run, schema="fid long, gkind string, length_m double, area_m2 double"
    )


def ring_centroid_cols(ring):
    """Area-weighted centroid of a simple ring, 100% JVM-side.

    ``ring`` is an ``array<struct<x:double,y:double>>`` of an OPEN ring
    (no repeated closing vertex); edges wrap i → (i+1) mod n.  Returns
    ``(area2, cx, cy)`` Columns — twice the signed shoelace area (imp²,
    CCW positive) and the centroid in imp space:

        c_i = x_i·y_j − x_j·y_i          (j = i+1 mod n)
        a2  = Σ c_i                      (left fold, array order)
        cx  = Σ (x_i + x_j)·c_i / (3·a2)
        cy  = Σ (y_i + y_j)·c_i / (3·a2)

    This is the reference's polygon centroid decomposition
    (StoredFeature.java:473-479 computes the same shoelace pass for
    area(); the centroid weights reuse each edge cross term).  One
    ``transform`` + one struct-accumulator ``aggregate`` — higher-order
    functions inside whole-stage codegen, no UDF, no shuffle.  The fold
    is a left fold in array order, so an oracle that sums the same
    terms left-associatively is bit-identical.  Degenerate rings
    (a2 == 0) yield NULL centroids via ANSI x/0 — filter on a2 first.
    """
    from pyspark.sql import functions as F

    n = F.size(ring)

    def term(i):
        p = F.element_at(ring, i + 1)
        q = F.element_at(ring, ((i + 1) % n) + 1)
        c = p.x * q.y - q.x * p.y
        return F.struct(
            c.alias("c"),
            ((p.x + q.x) * c).alias("tx"),
            ((p.y + q.y) * c).alias("ty"),
        )

    terms = F.transform(F.sequence(F.lit(0), n - 1), term)
    zero = F.struct(
        F.lit(0.0).alias("a2"), F.lit(0.0).alias("sx"), F.lit(0.0).alias("sy")
    )
    acc = F.aggregate(
        terms,
        zero,
        lambda a, t: F.struct(
            (a.a2 + t.c).alias("a2"),
            (a.sx + t.tx).alias("sx"),
            (a.sy + t.ty).alias("sy"),
        ),
    )
    a2 = acc.a2
    cx = acc.sx / (F.lit(3.0) * acc.a2)
    cy = acc.sy / (F.lit(3.0) * acc.a2)
    return a2, cx, cy


def resample_along_segments(
    segs: DataFrame, every_m: float, id_col: str = "fid"
) -> DataFrame:
    """Densify: emit a point every ``every_m`` meters along each segment
    (plus the start vertex) — the standard prep for map-matching, heat
    rasters, and distance-weighted sampling of line features.

    Pure JVM: per-segment Mercator length (distance_col, the reference's
    Mercator.java:194-201 mid-latitude scale), point count by floor
    division, ``F.sequence`` + ``explode`` for the fan-out, linear
    interpolation in imp space.  No shuffle at all — the explode is a
    map-side generator, so this scales as a single pass over the segment
    table.  Output: (id, pt_seq, px, py) with pt_seq 0 at the segment
    start; a zero-length segment yields just its start point.
    """
    from pyspark.sql import functions as F

    len_m = mercator.distance_col(
        F.col("x1"), F.col("y1"), F.col("x2"), F.col("y2")
    )
    n = F.when(len_m > 0, F.floor(len_m / F.lit(float(every_m)))).otherwise(
        F.lit(0)
    ).cast("int")
    out = segs.select(
        F.col(id_col),
        F.col("x1").cast("double").alias("_x1"),
        F.col("y1").cast("double").alias("_y1"),
        F.col("x2").cast("double").alias("_x2"),
        F.col("y2").cast("double").alias("_y2"),
        len_m.alias("_len"),
        F.explode(F.sequence(F.lit(0), n)).alias("pt_seq"),
    )
    f = F.when(
        F.col("_len") > 0,
        (F.col("pt_seq").cast("double") * F.lit(float(every_m))) / F.col("_len"),
    ).otherwise(F.lit(0.0))
    return out.select(
        id_col,
        "pt_seq",
        (F.col("_x1") + f * (F.col("_x2") - F.col("_x1"))).alias("px"),
        (F.col("_y1") + f * (F.col("_y2") - F.col("_y1"))).alias("py"),
    )


def simplify_lines_dp(
    verts: DataFrame,
    eps: int,
    line_col: str = "line_id",
    seq_col: str = "seq",
) -> DataFrame:
    """Douglas–Peucker polyline simplification — the simplify step every
    tile renderer runs before coarse-zoom encode (quantize_for_tiles
    elides only coincident grid points; DP removes sub-tolerance
    geometry).

    Split rule, EXACT integer arithmetic: an interval (i0, i1) splits at
    the first vertex j maximizing cross² where cross = dx·(yⱼ−y₀) −
    dy·(xⱼ−x₀), iff cross² > eps²·len² (the perpendicular-distance test
    cleared of its division; a degenerate zero-length chord gives 0 > 0
    = false and simplifies to its endpoints).  Python bigints make the
    comparison exact at any coordinate size; the driver oracle replays
    the same recursion as a DuckDB recursive CTE in hugeint.

    Scale shape: one shuffle (groupBy line) into a per-line Arrow
    kernel — simplification is genuinely per-geometry recursive, the
    documented case for applyInPandas.  Lines partition freely; a
    monster line is a hot key like any other (split it upstream).

    Input (line_col, seq, x, y); output the KEPT rows, same schema.
    """
    eps2 = int(eps) * int(eps)

    def simplify(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(seq_col).reset_index(drop=True)
        xs = [int(v) for v in pdf["x"]]
        ys = [int(v) for v in pdf["y"]]
        n = len(xs)
        if n <= 2:
            return pdf
        keep = {0, n - 1}
        stack = [(0, n - 1)]
        while stack:
            i0, i1 = stack.pop()
            if i1 - i0 < 2:
                continue
            dx = xs[i1] - xs[i0]
            dy = ys[i1] - ys[i0]
            l2 = dx * dx + dy * dy
            jbest, c2best = -1, -1
            for j in range(i0 + 1, i1):
                c = dx * (ys[j] - ys[i0]) - dy * (xs[j] - xs[i0])
                c2 = c * c
                if c2 > c2best:
                    jbest, c2best = j, c2
            if c2best > eps2 * l2:
                keep.add(jbest)
                stack.append((i0, jbest))
                stack.append((jbest, i1))
        return pdf.iloc[sorted(keep)]

    schema = verts.select(line_col, seq_col, "x", "y").schema
    return (
        verts.select(line_col, seq_col, "x", "y")
        .groupBy(line_col)
        .applyInPandas(lambda pdf: simplify(pdf), schema=schema)
    )


def simplify_lines_dp_sql(verts_cte: str, eps: int) -> str:
    """DuckDB twin of :func:`simplify_lines_dp`: the DP recursion as a
    recursive CTE over intervals, argmax by (cross² desc, seq), exact
    hugeint comparisons — structurally independent of the kernel's
    stack loop."""
    eps2 = int(eps) * int(eps)
    return f"""
      with recursive v as ({verts_cte}),
      iv(line_id, i0, i1) as (
        select line_id, min(seq), max(seq) from v group by line_id
        union all
        select t.line_id,
               case when k.k = 0 then t.i0 else t.j end,
               case when k.k = 0 then t.j else t.i1 end
        from (
          select * from (
            select s.line_id, s.i0, s.i1, vm.seq as j,
                   row_number() over (
                     partition by s.line_id, s.i0, s.i1
                     order by cast((v1.x - v0.x) * (vm.y - v0.y)
                                 - (v1.y - v0.y) * (vm.x - v0.x) as hugeint)
                              * ((v1.x - v0.x) * (vm.y - v0.y)
                                 - (v1.y - v0.y) * (vm.x - v0.x)) desc,
                              vm.seq) as rn,
                   cast((v1.x - v0.x) * (vm.y - v0.y)
                      - (v1.y - v0.y) * (vm.x - v0.x) as hugeint)
                   * ((v1.x - v0.x) * (vm.y - v0.y)
                      - (v1.y - v0.y) * (vm.x - v0.x)) as c2,
                   cast({eps2} as hugeint)
                   * ((v1.x - v0.x) * (v1.x - v0.x)
                      + (v1.y - v0.y) * (v1.y - v0.y)) as e2l2
            from iv s
            join v vm on vm.line_id = s.line_id
                     and vm.seq > s.i0 and vm.seq < s.i1
            join v v0 on v0.line_id = s.line_id and v0.seq = s.i0
            join v v1 on v1.line_id = s.line_id and v1.seq = s.i1
          ) c where rn = 1 and c2 > e2l2
        ) t cross join (values (0), (1)) k(k)
      ),
      keep as (
        select line_id, i0 as seq from iv
        union
        select line_id, i1 from iv
      )
      select distinct k.line_id, k.seq, v.x, v.y
      from keep k join v using (line_id, seq)
    """


def union_area_by_group(
    boxes: DataFrame, group_col: str = "g"
) -> DataFrame:
    """Dissolve: EXACT area of the union of axis-aligned boxes per group —
    the ST_Union→area analog for the bbox layer (the reference's Box
    algebra composes pairwise, Box.java:139-171; this is the n-ary union
    measure a rollup actually needs).

    Coordinate compression: within a group, the distinct box x-coords cut
    the axis into intervals (same for y); a compressed grid cell is either
    wholly inside some box or wholly outside, so
    union_area = Σ cell_area over cells covered by ≥1 box.  A group of k
    boxes makes ≤ (2k−1)² cells — quadratic in the GROUP size only, never
    in the table size, which is the right trade at scale (dissolve groups
    are dimension-sized; the fact table never self-joins).

    Plan: two window passes for the interval lists (both reuse the same
    group partitioning), a within-group interval×interval join, and a
    LEFT SEMI join against the boxes on (group, containment) — all
    equi-joins on the group key, AQE-skew-splittable.  Areas in
    decimal(38,0): a world-spanning box is (2^32)² > int64.

    Input (group_col, minx, miny, maxx, maxy) integer imps, boxes closed
    [min, max]; output (group_col, union_area) — summed exactly in
    decimal(38,0), emitted as double (the engine-portable output form;
    the sum itself never rounds).
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    g = group_col
    xs = boxes.select(g, F.explode(F.array("minx", "maxx")).alias("v")).distinct()
    w = Window.partitionBy(g).orderBy("v")
    xi = (
        xs.select(g, F.col("v").alias("x0"), F.lead("v").over(w).alias("x1"))
        .filter(F.col("x1").isNotNull() & (F.col("x1") > F.col("x0")))
    )
    ys = boxes.select(g, F.explode(F.array("miny", "maxy")).alias("v")).distinct()
    yi = (
        ys.select(g, F.col("v").alias("y0"), F.lead("v").over(w.orderBy("v")).alias("y1"))
        .filter(F.col("y1").isNotNull() & (F.col("y1") > F.col("y0")))
    )
    cells = xi.join(yi, g)
    b = boxes.select(
        F.col(g).alias("bg"),
        "minx",
        "miny",
        "maxx",
        "maxy",
    )
    covered = cells.join(
        b,
        (F.col(g) == F.col("bg"))
        & (F.col("x0") >= F.col("minx"))
        & (F.col("x1") <= F.col("maxx"))
        & (F.col("y0") >= F.col("miny"))
        & (F.col("y1") <= F.col("maxy")),
        "left_semi",
    )
    area = (F.col("x1") - F.col("x0")).cast("decimal(19,0)") * (
        F.col("y1") - F.col("y0")
    ).cast("decimal(19,0)")
    return (
        covered.groupBy(g)
        .agg(F.sum(area).alias("union_area"))
        .select(
            g,
            F.col("union_area").cast("decimal(38,0)").cast("double").alias("union_area"),
        )
    )
