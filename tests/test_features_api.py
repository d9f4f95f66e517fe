"""User-facing Features view (geodesk_spark/features.py) — composition
semantics vs the reference's Features.java:40-215 surface."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from geodesk_spark.features import Features
from geodesk_spark.geo import mercator, pip
from geodesk_spark.operators import spatial_join
from geodesk_spark.sources import synth_features


@pytest.fixture(scope="module")
def feats(spark):
    df = synth_features.features_df(spark, 3000, partitions=8)
    df.cache().count()
    yield df
    df.unpersist()


@pytest.fixture(scope="module")
def world(spark):
    feats = spark.createDataFrame(
        [
            (1, "relation", False, {"type": "route"}, 0, 0),
            (2, "relation", False, {"type": "multipolygon"}, 0, 0),
            (10, "way", False, {"highway": "primary"}, 200, 200),
            (11, "way", False, {"highway": "track"}, 350, 350),
            (12, "way", True, {"building": "yes"}, 900, 900),
            (20, "node", False, {"amenity": "pub"}, 100, 100),
            (21, "node", False, {}, 400, 400),
        ],
        "fid long, ftype string, is_area boolean, tags map<string,string>, x int, y int",
    )
    members = spark.createDataFrame(
        [
            (1, "way", 10, "forward", 0),
            (1, "way", 11, "", 1),
            (1, "node", 20, "stop", 2),
            (2, "way", 12, "outer", 0),
        ],
        "rel_id long, member_type string, member_id long, role string, seq int",
    )
    way_nodes = spark.createDataFrame(
        [
            (10, 0, 100, 100, 20),
            (10, 1, 200, 200, None),
            (11, 0, 300, 300, None),
            (11, 1, 400, 400, 21),
            (12, 0, 900, 900, None),
        ],
        "way_id long, seq int, x int, y int, node_id long",
    )
    return feats, members, way_nodes


def test_select_composition_is_and(feats):
    """view.select(a).select(b) == view.select(a AND b) — matcher AND-ing
    (View.java:55-65, AndMatcher.java:12-47)."""
    v = Features(feats)
    chained = v.select("*[highway]").select("*[surface=paved]").count()
    merged = v.select("*[highway][surface=paved]").count()
    assert chained == merged
    assert chained > 0


def test_type_restriction(feats):
    v = Features(feats)
    assert v.nodes().count() + v.ways().count() + v.relations().count() == v.count()
    got = v.ways("[highway]").df.select("ftype").distinct().collect()
    assert [r["ftype"] for r in got] == ["way"]


def test_selector_union_matches_sum(feats):
    """comma = selector union (MatcherParser.java:461-482)."""
    v = Features(feats)
    u = v.select("w[highway], a[building]").count()
    w = v.select("w[highway]").count()
    a = v.select("a[building]").count()
    # highway lines and building areas are disjoint in the synth world
    assert u == w + a and u > 0


def test_in_bbox_vs_manual(feats):
    v = Features(feats)
    b = (-(1 << 29), -(1 << 28), 1 << 30, 1 << 29)
    got = v.in_bbox(*b).count()
    want = feats.filter(
        (F.col("maxx") >= b[0]) & (F.col("minx") <= b[2])
        & (F.col("maxy") >= b[1]) & (F.col("miny") <= b[3])
    ).count()
    assert got == want and got > 0


def test_antimeridian_bbox(feats):
    """minx > maxx wraps (Box.java:16-19): the two half-boxes partition
    the world in x, so wrapped + complement == all (same y-band)."""
    v = Features(feats)
    yband = (-(1 << 30), 1 << 30)
    wrapped = v.in_bbox(1 << 30, yband[0], -(1 << 30), yband[1]).count()
    # complement interior box: (maxx < minx-side) strictly between
    inner = v.df.filter(
        (F.col("minx") > -(1 << 30)) & (F.col("maxx") < (1 << 30))
        & (F.col("maxy") >= yband[0]) & (F.col("miny") <= yband[1])
    ).count()
    allb = v.in_bbox(-(1 << 31), yband[0], (1 << 31) - 1, yband[1]).count()
    assert wrapped + inner == allb


def test_intersect_views(feats):
    v = Features(feats)
    a = v.select("*[highway]")
    b = v.in_bbox(-(1 << 29), -(1 << 28), 1 << 30, 1 << 29)
    got = a.intersect(b).count()
    want = b.select("*[highway]").count()
    assert got == want


def test_containing_point_brute(feats):
    v = Features(feats)
    lon, lat = 13.40, 52.52
    got = sorted(r["fid"] for r in v.containing_point(lon, lat).df.collect())
    qx = float(mercator.x_from_lon(lon)[()])
    qy = float(mercator.y_from_lat(lat)[()])
    pdf = feats.filter(F.col("is_area")).toPandas()
    want = []
    for _, row in pdf.iterrows():
        if row["minx"] <= qx <= row["maxx"] and row["miny"] <= qy <= row["maxy"]:
            rings = pip.unpack_rings(bytes(row["geom"]))
            if pip.points_in_polygon(np.array([qx]), np.array([qy]), rings)[0]:
                want.append(row["fid"])
    assert got == sorted(want)


def test_max_meters_from(feats):
    v = Features(feats)
    got = v.max_meters_from(200_000, 13.40, 52.52).count()
    want = spatial_join.within_distance(
        feats, 13.40, 52.52, 200_000, keep_cols=["fid"]
    ).count()
    assert got == want


def test_graph_navigation(spark, world):
    f, members, way_nodes = world
    v = Features(f, members=members, way_nodes=way_nodes)
    # members of relation 1, GOQL-filtered
    got = sorted(
        r["fid"] for r in v.relation(1).members_of(goql="w[highway]").df.collect()
    )
    assert got == [10, 11]
    # role filter
    got = [r["fid"] for r in v.relation(1).members_of(role="stop").df.collect()]
    assert got == [20]
    # parents: way 12's parent relation is 2
    got = [r["fid"] for r in v.way(12).parents_of().df.collect()]
    assert got == [2]
    # node parents include BOTH the relation (membership) and the way
    # whose geometry holds the node's exact vertex (StoredNode.java:94-127)
    got = sorted(r["fid"] for r in v.node(20).parents_of().df.collect())
    assert got == [1, 10]
    # node 21 sits at way 11's vertex (400,400) but is in no relation
    got = sorted(r["fid"] for r in v.node(21).parents_of().df.collect())
    assert got == [11]
    # nodes of way 10 (tagged only → node 20)
    got = [r["node_id"] for r in v.way(10).nodes_of(tagged_only=True).df.collect()]
    assert got == [20]


def test_terminals(feats):
    v = Features(feats).select("*[highway]")
    assert not v.is_empty
    first = v.first()
    assert first is not None and "highway" in first["tags"]
    assert v.contains(first["fid"])
    assert Features(feats).select("*[nonexistent_key_xyz]").is_empty


def test_in_box_and_empty_shortcircuit(feats):
    from geodesk_spark.geo.box import Box

    v = Features(feats)
    assert v.in_box(Box()).count() == 0  # empty box → EmptyView
    b = Box(-(1 << 29), -(1 << 28), 1 << 30, 1 << 29)
    assert v.in_box(b).count() == v.in_bbox(b.minx, b.miny, b.maxx, b.maxy).count()
    wrap = Box.of_wsen(170, -40, -160, 30)
    assert v.in_box(wrap).count() == v.in_bbox(wrap.minx, wrap.miny, wrap.maxx, wrap.maxy).count()


def test_to_map(world, tmp_path):
    """Features.to_map — the MapMaker.add(features) flow: every collected
    point feature becomes a tooltipped circle marker on the page."""
    feats, members, way_nodes = world
    v = Features(feats, members, way_nodes).select("n[amenity=pub], w[highway]")
    n = v.count()
    assert n == 3  # 1 pub node + 2 highway ways
    path = v.to_map(str(tmp_path), limit=5000)
    html = open(path).read()
    assert html.count("L.circle([") == n  # x/y rows render as points
    assert html.count(".bindTooltip(") == n
    assert '"node/20"' in html  # typed-id tooltip
    assert "map.fitBounds([" in html
