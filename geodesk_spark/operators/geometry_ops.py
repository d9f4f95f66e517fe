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
