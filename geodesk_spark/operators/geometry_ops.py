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
