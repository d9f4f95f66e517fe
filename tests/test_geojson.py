"""GeoJSON polygon-layer source/sink: round-trip fidelity and PIP
agreement with the packed synthetic layer."""

import numpy as np

from geodesk_spark.geo import pip
from geodesk_spark.sources import geojson, synth


def test_roundtrip_preserves_pip_results():
    """synth layer → GeoJSON → load: the reloaded layer classifies a
    random point cloud identically (precision-7 GeoJSON coordinates
    re-project to imp within the kernel's tolerance — the same
    divergence budget the reference accepts for its 100-nd round trip,
    MercatorTest.java:245-291)."""
    layer = synth.polygon_layer()
    fc = geojson.dump_polygon_layer(layer)
    back = geojson.load_polygon_layer(fc, id_prop="id")
    assert [p["poly_id"] for p in back] == [p["poly_id"] for p in layer]
    assert [p["layer"] for p in back] == [p["layer"] for p in layer]

    rng = np.random.default_rng(7)
    xs = rng.integers(-(1 << 31), (1 << 31) - 1, 4000).astype(np.float64)
    ys = rng.integers(-(1 << 30), (1 << 30) - 1, 4000).astype(np.float64)
    diff = 0
    for p0, p1 in zip(layer, back):
        r0 = pip.points_in_polygon(xs, ys, pip.unpack_rings(p0["rings"]))
        r1 = pip.points_in_polygon(xs, ys, pip.unpack_rings(p1["rings"]))
        diff += int(np.sum(r0 != r1))
    # re-projection moves ring vertices by <1 imp; only points exactly on
    # an edge can flip — none of 4000 random points should
    assert diff == 0


def test_multipolygon_and_holes():
    fc = {
        "type": "FeatureCollection",
        "features": [
            {
                "type": "Feature",
                "properties": {"id": "mp", "layer": "adm"},
                "geometry": {
                    "type": "MultiPolygon",
                    "coordinates": [
                        # part 0: square with a hole
                        [
                            [[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]],
                            [[4, 4], [6, 4], [6, 6], [4, 6], [4, 4]],
                        ],
                        # part 1: distant square
                        [[[20, 20], [25, 20], [25, 25], [20, 25], [20, 20]]],
                    ],
                },
            }
        ],
    }
    layer = geojson.load_polygon_layer(fc)
    assert [p["poly_id"] for p in layer] == ["mp#0", "mp#1"]

    from geodesk_spark.geo import mercator

    def at(lon, lat):
        return (
            float(mercator.x_from_lon(np.array([lon]))[0]),
            float(mercator.y_from_lat(np.array([lat]))[0]),
        )

    inside = at(2.0, 2.0)
    in_hole = at(5.0, 5.0)
    outside = at(15.0, 15.0)
    xs = np.array([inside[0], in_hole[0], outside[0]])
    ys = np.array([inside[1], in_hole[1], outside[1]])
    got = pip.points_in_polygon(xs, ys, pip.unpack_rings(layer[0]["rings"]))
    assert got.tolist() == [True, False, False]


def test_unclosed_ring_tolerated():
    fc = {
        "type": "FeatureCollection",
        "features": [
            {
                "type": "Feature",
                "properties": {"id": "u"},
                "geometry": {
                    "type": "Polygon",
                    # NOT closed — loader must close it
                    "coordinates": [[[0, 0], [10, 0], [10, 10], [0, 10]]],
                },
            }
        ],
    }
    layer = geojson.load_polygon_layer(fc)
    rings = pip.unpack_rings(layer[0]["rings"])
    assert np.array_equal(rings[0][0], rings[0][-1])


def test_features_to_geojson_strings(spark):
    """Column-level Feature.toGeoJson(): exact precision-7 coordinates,
    valid JSON, LineString for linear ways, closed Polygon for areas."""
    import json

    from pyspark.sql import functions as F

    from geodesk_spark.features import Features
    from geodesk_spark.geo import mercator

    feats = spark.createDataFrame(
        [
            (20, "node", False, {"amenity": "pub"}, 123456789, -98765432),
            (10, "way", False, {"highway": "primary"}, 0, 0),
            (12, "way", True, {"building": "yes"}, 0, 0),
        ],
        "fid long, ftype string, is_area boolean, tags map<string,string>, x int, y int",
    )
    way_nodes = spark.createDataFrame(
        [
            (10, 0, 100_000_000, 50_000_000, None),
            (10, 1, 200_000_000, 60_000_000, None),
            (12, 0, 0, 0, None),
            (12, 1, 10_000_000, 0, None),
            (12, 2, 10_000_000, 10_000_000, None),
        ],
        "way_id long, seq int, x int, y int, node_id long",
    )
    got = {
        (r["ftype"], r["fid"]): r["geojson"]
        for r in Features(feats, way_nodes=way_nodes).to_geojson().collect()
    }
    assert len(got) == 3
    parsed = {k: json.loads(v) for k, v in got.items()}  # all valid JSON

    def p7(x, y):
        import numpy as np

        lon = float(mercator.lon_precision7_from_x(np.array([float(x)]))[0])
        lat = float(mercator.lat_precision7_from_y(np.array([float(y)]))[0])
        return [lon, lat]

    node = parsed[("node", 20)]
    assert node["geometry"]["type"] == "Point"
    assert node["geometry"]["coordinates"] == p7(123456789, -98765432)
    assert node["properties"] == {"amenity": "pub"} and node["id"] == "node/20"

    line = parsed[("way", 10)]["geometry"]
    assert line["type"] == "LineString"
    assert line["coordinates"] == [p7(100_000_000, 50_000_000), p7(200_000_000, 60_000_000)]

    poly = parsed[("way", 12)]["geometry"]
    assert poly["type"] == "Polygon"
    ring = poly["coordinates"][0]
    assert ring[0] == ring[-1] == p7(0, 0) and len(ring) == 4  # closed


def test_features_to_wkt_strings(spark):
    """to_wkt: POINT for nodes, LINESTRING for linear ways, closed
    POLYGON for areas, precision-7 coordinates identical to to_geojson's."""
    import json

    from pyspark.sql import functions as F

    from geodesk_spark.features import Features

    feats = spark.createDataFrame(
        [
            (20, "node", False, {}, 123456789, -98765432),
            (10, "way", False, {}, 0, 0),
            (12, "way", True, {}, 0, 0),
        ],
        "fid long, ftype string, is_area boolean, tags map<string,string>, x int, y int",
    )
    way_nodes = spark.createDataFrame(
        [
            (10, 0, 100_000_000, 50_000_000, None),
            (10, 1, 200_000_000, 60_000_000, None),
            (12, 0, 0, 0, None),
            (12, 1, 10_000_000, 0, None),
            (12, 2, 10_000_000, 10_000_000, None),
        ],
        "way_id long, seq int, x int, y int, node_id long",
    )
    v = Features(feats, way_nodes=way_nodes)
    wkt = {(r["ftype"], r["fid"]): r["wkt"] for r in v.to_wkt().collect()}
    gj = {
        (r["ftype"], r["fid"]): json.loads(r["geojson"])["geometry"]
        for r in v.to_geojson().collect()
    }

    def wkt_coords(s):
        inner = s[s.index("(") :].strip("()")
        return [[float(t) for t in p.split()] for p in inner.split(", ")]

    assert wkt[("node", 20)].startswith("POINT (")
    assert wkt_coords(wkt[("node", 20)]) == [gj[("node", 20)]["coordinates"]]
    assert wkt[("way", 10)].startswith("LINESTRING (")
    assert wkt_coords(wkt[("way", 10)]) == gj[("way", 10)]["coordinates"]
    assert wkt[("way", 12)].startswith("POLYGON ((")
    ring = wkt_coords(wkt[("way", 12)])
    assert ring == gj[("way", 12)]["coordinates"][0] and ring[0] == ring[-1]


def test_empty_vertex_way_fails_loudly(spark):
    """ADVICE r03: a way whose vertex array is EMPTY must raise, not
    silently emit a null geometry string."""
    import pytest as _pytest
    from pyspark.sql import functions as F
    from geodesk_spark.operators import geometry_ops as g

    df = spark.createDataFrame(
        [(1, [], False)],
        "fid long, pts array<struct<x:int,y:int>>, is_area boolean",
    )
    bad = df.select(g.geojson_way_col(F.col("pts"), F.col("is_area")).alias("s"))
    with _pytest.raises(Exception, match="empty vertex array"):
        bad.collect()
    bad_wkt = df.select(g.wkt_way_col(F.col("pts"), F.col("is_area")).alias("s"))
    with _pytest.raises(Exception, match="empty vertex array"):
        bad_wkt.collect()
    # non-empty ways still render
    ok = spark.createDataFrame(
        [(1, [(0, 0), (1000, 0), (1000, 1000)], True)],
        "fid long, pts array<struct<x:int,y:int>>, is_area boolean",
    ).select(g.geojson_way_col(F.col("pts"), F.col("is_area")).alias("s"))
    assert ok.collect()[0]["s"].startswith('{"type":"Polygon"')
