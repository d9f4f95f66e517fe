"""Deterministic OSM-like feature table (FIXTURES.md §3).

Generates way features — polylines ("roads") and polygons
("buildings"/"parks") — scattered around the synthetic cities, with
tags drawn from an OSM-flavoured vocabulary.  Pure function of
(seed, fid) via the same counter-based hashing as the image table, so
generation is distributed and reproducible.

Schema: fid long, ftype string, is_area boolean, tags map<string,string>,
x int, y int (bbox midpoint — StoredFeature.java:87-95), minx/miny/
maxx/maxy int, gkind string ('line'|'polygon'), geom binary (packed
rings, geo/pip.py).
"""

from __future__ import annotations

import numpy as np

from geodesk_spark.geo import mercator, pip
from geodesk_spark.sources.synth import CITIES, _u01

HIGHWAYS = np.array(["residential", "primary", "secondary", "track", "motorway", "service"])
BUILDINGS = np.array(["yes", "house", "commercial", "industrial", "church"])
NAMES = np.array(["Main Street", "Hühnerstraße", "Via Capri", "Park Lane", "River Road"])

SCHEMA_DDL = (
    "fid long, ftype string, is_area boolean, tags map<string,string>, "
    "x int, y int, minx int, miny int, maxx int, maxy int, "
    "gkind string, geom binary"
)


def _feature_for_id(fid: int, seed: int) -> dict:
    ids = np.array([fid], dtype=np.int64)
    city = CITIES[int(_u01(ids, 20, seed)[0] * len(CITIES))]
    clon, clat = city[1], city[2]
    lon0 = clon + (_u01(ids, 21, seed)[0] - 0.5) * 1.2
    lat0 = clat + (_u01(ids, 22, seed)[0] - 0.5) * 1.2
    is_poly = _u01(ids, 23, seed)[0] < 0.5

    n_pts = 4 + int(_u01(ids, 24, seed)[0] * 10)
    t = np.arange(n_pts, dtype=np.float64)
    jitter_lon = np.array([_u01(ids + k, 25, seed)[0] - 0.5 for k in range(n_pts)])
    jitter_lat = np.array([_u01(ids + k, 26, seed)[0] - 0.5 for k in range(n_pts)])

    if is_poly:
        size = 0.002 + _u01(ids, 27, seed)[0] * 0.05
        ang = t * (2 * np.pi / n_pts)
        lons = lon0 + size * np.cos(ang) * (1 + 0.3 * jitter_lon)
        lats = lat0 + size * np.sin(ang) * (1 + 0.3 * jitter_lat)
        xs = mercator.x_from_lon(np.clip(lons, -180, 180)).astype(np.float64)
        ys = mercator.y_from_lat(np.clip(lats, -85, 85)).astype(np.float64)
        ring = np.stack([xs, ys], axis=1)
        ring = np.vstack([ring, ring[:1]])
        rings = [ring]
        gkind = "polygon"
        bkind = BUILDINGS[int(_u01(ids, 28, seed)[0] * len(BUILDINGS))]
        tags = {"building": str(bkind)}
        if _u01(ids, 29, seed)[0] < 0.3:
            tags["name"] = str(NAMES[int(_u01(ids, 30, seed)[0] * len(NAMES))])
    else:
        step = 0.003 + _u01(ids, 27, seed)[0] * 0.02
        lons = lon0 + np.cumsum(step * (0.5 + jitter_lon))
        lats = lat0 + np.cumsum(step * jitter_lat)
        xs = mercator.x_from_lon(np.clip(lons, -180, 180)).astype(np.float64)
        ys = mercator.y_from_lat(np.clip(lats, -85, 85)).astype(np.float64)
        rings = [np.stack([xs, ys], axis=1)]
        gkind = "line"
        hw = HIGHWAYS[int(_u01(ids, 28, seed)[0] * len(HIGHWAYS))]
        tags = {"highway": str(hw)}
        u = _u01(ids, 31, seed)[0]
        if u < 0.6:
            tags["maxspeed"] = str(int(30 + u * 100))
        if _u01(ids, 32, seed)[0] < 0.2:
            tags["surface"] = "paved"

    minx, miny = int(xs.min()), int(ys.min())
    maxx, maxy = int(xs.max()), int(ys.max())
    return dict(
        fid=fid,
        ftype="way",
        is_area=bool(is_poly),
        tags=tags,
        x=(minx + maxx) // 2,
        y=(miny + maxy) // 2,
        minx=minx,
        miny=miny,
        maxx=maxx,
        maxy=maxy,
        gkind=gkind,
        geom=pip.pack_rings(rings),
    )


def features_df(spark, n_rows: int, seed: int = 42, partitions: int | None = None):
    import pandas as pd

    rng = spark.range(0, n_rows, 1, partitions or spark.sparkContext.defaultParallelism)

    def gen(batches):
        for pdf in batches:
            rows = [_feature_for_id(int(i), seed) for i in pdf["id"]]
            yield pd.DataFrame(rows)

    return rng.mapInPandas(gen, schema=SCHEMA_DDL)
