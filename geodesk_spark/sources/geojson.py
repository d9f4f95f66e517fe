"""GeoJSON polygon-layer source + sink.

The reference consumes prepared JTS geometries for its spatial
predicates (feature/Features.java:447-460) and emits GeoJSON-style
coordinates through a precision-7 writer
(util/CoordinateTransformer.java:21-50, util/MapMaker.java).  This
module is the engine's interchange surface: a GeoJSON FeatureCollection
of Polygon/MultiPolygon features loads into the same packed-rings layer
format `operators/spatial_join.prepare_layer` consumes (lon/lat →
int-imp via geo/mercator, holes preserved as extra rings), and a layer
dumps back to GeoJSON with the reference's 7-decimal rounding.

Scale note: polygon layers are the broadcast side of every spatial
join — they are driver-sized by design (≤ thousands of polygons, the
reference's model too).  The 10^12-row fact side never flows through
here.
"""

from __future__ import annotations

import json
import os

import numpy as np

from geodesk_spark.geo import mercator, pip


def _ring_to_imp(coords: list[list[float]]) -> np.ndarray:
    arr = np.asarray(coords, dtype=np.float64)
    xs = mercator.x_from_lon(arr[:, 0]).astype(np.float64)
    ys = mercator.y_from_lat(arr[:, 1]).astype(np.float64)
    ring = np.stack([xs, ys], axis=1)
    if not np.array_equal(ring[0], ring[-1]):  # tolerate unclosed rings
        ring = np.vstack([ring, ring[:1]])
    return ring


def _polygon_entry(poly_id: str, layer: str, ring_sets: list[list]) -> dict:
    """One packed-rings layer entry from [exterior, hole, ...] ring lists."""
    rings = [_ring_to_imp(r) for r in ring_sets]
    xs = np.concatenate([r[:, 0] for r in rings])
    ys = np.concatenate([r[:, 1] for r in rings])
    return dict(
        poly_id=poly_id,
        layer=layer,
        rings=pip.pack_rings(rings),
        minx=int(xs.min()),
        miny=int(ys.min()),
        maxx=int(xs.max()),
        maxy=int(ys.max()),
    )


def load_polygon_layer(
    src: str | dict,
    id_prop: str = "id",
    layer_prop: str | None = "layer",
    default_layer: str = "default",
) -> list[dict]:
    """Parse a GeoJSON FeatureCollection (path or dict) into the packed
    layer format of sources/synth.polygon_layer.

    Polygon → one entry (holes = extra rings, XOR'd by the ray-cast
    kernel exactly like the reference's multi-ring PIP,
    geom/PointInPolygon.java:34-47).  MultiPolygon → one entry per part
    (``<id>#<part>``) so each part keeps its own bbox for banding.
    """
    if isinstance(src, str):
        with open(src) as f:
            obj = json.load(f)
    else:
        obj = src
    if obj.get("type") != "FeatureCollection":
        raise ValueError(f"expected FeatureCollection, got {obj.get('type')!r}")
    out: list[dict] = []
    for i, feat in enumerate(obj.get("features", [])):
        props = feat.get("properties") or {}
        pid = str(props.get(id_prop, f"feature_{i}"))
        layer = str(props.get(layer_prop, default_layer)) if layer_prop else default_layer
        geom = feat.get("geometry") or {}
        gtype = geom.get("type")
        if gtype == "Polygon":
            out.append(_polygon_entry(pid, layer, geom["coordinates"]))
        elif gtype == "MultiPolygon":
            parts = geom["coordinates"]
            for j, part in enumerate(parts):
                part_id = pid if len(parts) == 1 else f"{pid}#{j}"
                out.append(_polygon_entry(part_id, layer, part))
        else:
            raise ValueError(f"unsupported geometry type {gtype!r} (feature {pid})")
    return out


def dump_polygon_layer(polys: list[dict], path: str | None = None) -> dict:
    """Packed layer → GeoJSON FeatureCollection, coordinates rounded to
    7 decimals (CoordinateTransformer.java:21-50 precision).  First ring
    is the exterior, the rest holes."""
    feats = []
    for p in polys:
        rings = pip.unpack_rings(p["rings"])
        coords = []
        for r in rings:
            lon = np.round(mercator.lon_from_x(r[:, 0]), 7)
            lat = np.round(mercator.lat_from_y(r[:, 1]), 7)
            coords.append([[float(a), float(b)] for a, b in zip(lon, lat)])
        feats.append(
            {
                "type": "Feature",
                "properties": {"id": p["poly_id"], "layer": p["layer"]},
                "geometry": {"type": "Polygon", "coordinates": coords},
            }
        )
    fc = {"type": "FeatureCollection", "features": feats}
    if path:
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(fc, f)
        os.replace(tmp, path)  # atomic, like the snapshot commit point
    return fc
