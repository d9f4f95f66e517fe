"""Deterministic synthetic data: the image+caption table and polygon layers.

The input-table shape is mandated by BASELINE.json ``input_hint``:
``(image_id string, bytes binary, w int, h int, fmt string,
caption string, phash long)``.  We extend it with ``lon``/``lat``
(FIXTURES.md §1): a skewed mixture — ~80 % of rows concentrated in a
handful of city hot-cells, ~20 % uniform world — to exercise salting
and adaptive cell splitting.

Everything is a pure function of ``(seed, image_id)`` via a vectorized
splitmix64 counter-based hash, so any executor can regenerate any row
independently — generation is embarrassingly parallel and the table can
be materialized at any scale with ``spark.range(N)`` + ``mapInPandas``
(no driver-side data movement, no shared RNG state).
"""

from __future__ import annotations

import numpy as np

from geodesk_spark import codec
from geodesk_spark.geo import mercator, pip

# (name, lon, lat, weight) — deterministic "cities" for the hot cells.
CITIES = [
    ("tokyo", 139.69, 35.69, 0.18),
    ("delhi", 77.10, 28.70, 0.14),
    ("shanghai", 121.47, 31.23, 0.12),
    ("saopaulo", -46.63, -23.55, 0.10),
    ("cairo", 31.24, 30.04, 0.08),
    ("nyc", -74.01, 40.71, 0.08),
    ("lagos", 3.38, 6.52, 0.05),
    ("paris", 2.35, 48.86, 0.05),
]
UNIFORM_W = 1.0 - sum(c[3] for c in CITIES)  # 0.20
CITY_SIGMA_DEG = 0.35

VOCAB = np.array(
    "a an the photo image picture of with near by street park river bridge "
    "tower market temple museum cat dog tree car boat train sunset skyline "
    "crowd festival snow rain fog night morning".split()
)

SCHEMA_DDL = (
    "image_id string, bytes binary, w int, h int, fmt string, "
    "caption string, phash long, lon double, lat double"
)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    x = (x + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
    x = ((x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)).astype(np.uint64)
    x = ((x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)).astype(np.uint64)
    return x ^ (x >> np.uint64(31))


def _u01(ids: np.ndarray, stream: int, seed: int) -> np.ndarray:
    """Uniform [0,1) per id, independent per stream — counter-based."""
    h = _splitmix64(ids.astype(np.uint64) * np.uint64(1_000_003) + np.uint64(stream * 7919 + seed))
    return (h >> np.uint64(11)).astype(np.float64) / float(1 << 53)


def lonlat_for_ids(ids: np.ndarray, seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    """Skewed deterministic geolocation for a batch of int64 ids."""
    u_sel = _u01(ids, 0, seed)
    # Box-Muller for the city scatter.
    u1 = np.clip(_u01(ids, 1, seed), 1e-12, 1)
    u2 = _u01(ids, 2, seed)
    r = np.sqrt(-2 * np.log(u1)) * CITY_SIGMA_DEG
    g1 = r * np.cos(2 * np.pi * u2)
    g2 = r * np.sin(2 * np.pi * u2)

    lon = _u01(ids, 3, seed) * 360.0 - 180.0  # uniform fallback
    lat = _u01(ids, 4, seed) * 170.0 - 85.0

    acc = 0.0
    for _, clon, clat, wgt in CITIES:
        mask = (u_sel >= acc) & (u_sel < acc + wgt)
        lon = np.where(mask, np.clip(clon + g1, -180.0, 180.0), lon)
        lat = np.where(mask, np.clip(clat + g2, -85.0, 85.0), lat)
        acc += wgt
    return lon, lat


def captions_for_ids(ids: np.ndarray, seed: int = 42) -> np.ndarray:
    """Vectorized: per-word select + conditional concatenation (no Python
    row loop — this runs in the hot generation path at bench scale)."""
    n_words = (_u01(ids, 5, seed) * 5 + 3).astype(np.int64)  # 3..7 words
    cols = []
    for k in range(7):
        idx = (_u01(ids, 10 + k, seed) * len(VOCAB)).astype(np.int64)
        cols.append(VOCAB[idx])
    out = cols[0].astype(object)
    for k in range(1, 7):
        piece = np.where(k < n_words, np.char.add(" ", cols[k].astype("U")), "")
        out = np.char.add(out.astype("U"), piece)
    return out.astype(object)


def batch_for_ids(ids: np.ndarray, seed: int = 42, with_bytes: bool = True) -> dict:
    """Generate all columns for a batch of ids (vectorized where possible;
    the codec loop is per-image by nature, as any real encoder would be)."""
    ids = np.asarray(ids, dtype=np.int64)
    sizes = np.array([32, 64, 128], dtype=np.int32)
    w = sizes[(_u01(ids, 6, seed) * 3).astype(np.int64)]
    h = sizes[(_u01(ids, 7, seed) * 3).astype(np.int64)]
    fmt = np.where(_u01(ids, 8, seed) < 0.5, "png", "jpeg")
    # U20 covers full int64 digits: astype("U12") silently TRUNCATED ids
    # of 13+ digits, colliding image_ids beyond 10^12 rows (r03 review);
    # unchanged output for every id of ≤12 digits (zfill still pads to 12)
    image_id = np.char.add("img", np.char.zfill(ids.astype("U20"), 12)).astype(object)
    lon, lat = lonlat_for_ids(ids, seed)
    caption = captions_for_ids(ids, seed)

    blobs: list = []
    phash = np.zeros(len(ids), dtype=np.int64)
    if with_bytes:
        for i in range(len(ids)):
            px = codec.synth_pixels(image_id[i], int(w[i]), int(h[i]))
            blobs.append(codec.encode(px, str(fmt[i])))
            phash[i] = codec.phash64(px)
    else:
        blobs = [b""] * len(ids)
        phash = _splitmix64(ids.astype(np.uint64)).astype(np.int64)

    return {
        "image_id": image_id,
        "bytes": blobs,
        "w": w,
        "h": h,
        "fmt": fmt,
        "caption": caption,
        "phash": phash,
        "lon": lon,
        "lat": lat,
    }


def images_df(spark, n_rows: int, seed: int = 42, with_bytes: bool = True, partitions: int | None = None):
    """Distributed deterministic image table: spark.range → mapInPandas.

    Scale-ready: at 10^12 rows this is the same code with a bigger range;
    no driver materialization, no shuffle, pure narrow generation.
    """
    import pandas as pd

    rng = spark.range(0, n_rows, 1, partitions or spark.sparkContext.defaultParallelism)

    def gen(batches):
        for pdf in batches:
            cols = batch_for_ids(pdf["id"].to_numpy(), seed=seed, with_bytes=with_bytes)
            yield pd.DataFrame(cols)

    return rng.mapInPandas(gen, schema=SCHEMA_DDL)


# ---------------------------------------------------------------------------
# Polygon layers (FIXTURES.md §2): deterministic shapes in imp coordinates.
# ---------------------------------------------------------------------------

def _circle_ring(lon: float, lat: float, radius_deg: float, n: int = 24, phase: float = 0.0) -> np.ndarray:
    ang = np.linspace(0, 2 * np.pi, n, endpoint=False) + phase
    lons = np.clip(lon + radius_deg * np.cos(ang) / max(np.cos(np.radians(lat)), 0.2), -180, 180)
    lats = np.clip(lat + radius_deg * np.sin(ang), -85, 85)
    xs = mercator.x_from_lon(lons).astype(np.float64)
    ys = mercator.y_from_lat(lats).astype(np.float64)
    ring = np.stack([xs, ys], axis=1)
    return np.vstack([ring, ring[:1]])  # close


def polygon_layer(seed: int = 42) -> list[dict]:
    """City polygons (one per hot cell, some with holes) + a few large
    rectangles that fully cover many z12 tiles — exercises all three
    bands of the tile-classified join (disjoint / interior / boundary,
    AbstractRelateFilter.java:61-72)."""
    polys = []
    for i, (name, lon, lat, _) in enumerate(CITIES):
        rings = [_circle_ring(lon, lat, 0.6 + 0.1 * i, n=28, phase=0.1 * i)]
        if i % 2 == 0:  # punch a hole in every other polygon
            rings.append(_circle_ring(lon, lat, 0.15, n=12, phase=0.3))
        blob = pip.pack_rings(rings)
        xs = np.concatenate([r[:, 0] for r in rings])
        ys = np.concatenate([r[:, 1] for r in rings])
        polys.append(
            dict(
                poly_id=f"city_{name}",
                layer="admin",
                rings=blob,
                minx=int(xs.min()),
                miny=int(ys.min()),
                maxx=int(xs.max()),
                maxy=int(ys.max()),
            )
        )
    # A big mid-latitude band rectangle: covers whole tiles at z12.
    for j, (lo1, la1, lo2, la2, nm) in enumerate(
        [(-30.0, 20.0, 40.0, 55.0, "band_emea"), (60.0, 0.0, 150.0, 45.0, "band_asia")]
    ):
        x1, x2 = float(mercator.x_from_lon(lo1)), float(mercator.x_from_lon(lo2))
        y1, y2 = float(mercator.y_from_lat(la1)), float(mercator.y_from_lat(la2))
        ring = np.array([[x1, y1], [x2, y1], [x2, y2], [x1, y2], [x1, y1]])
        polys.append(
            dict(
                poly_id=nm,
                layer="landuse",
                rings=pip.pack_rings([ring]),
                minx=int(x1),
                miny=int(y1),
                maxx=int(x2),
                maxy=int(y2),
            )
        )
    return polys
