"""Graph navigation operators over synthesized membership tables."""

import pytest
from pyspark.sql import functions as F

from geodesk_spark.operators import graph


@pytest.fixture(scope="module")
def world(spark):
    feats = spark.createDataFrame(
        [
            (1, "relation", False, {"type": "route"}),
            (2, "relation", False, {"type": "multipolygon"}),
            (10, "way", False, {"highway": "primary"}),
            (11, "way", False, {"highway": "track"}),
            (12, "way", True, {"building": "yes"}),
            (20, "node", False, {"amenity": "pub"}),
            (21, "node", False, {}),
        ],
        "fid long, ftype string, is_area boolean, tags map<string,string>",
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
            (10, 2, 300, 300, None),
            (11, 0, 300, 300, None),  # shares vertex with way 10
            (11, 1, 400, 400, 21),
            (12, 0, 900, 900, None),
        ],
        "way_id long, seq int, x int, y int, node_id long",
    )
    return feats, members, way_nodes


def test_members_of(spark, world):
    feats, members, way_nodes = world
    rel1 = feats.filter(F.col("fid") == 1)
    out = graph.members_of(rel1, members, feats).select("member_id").toPandas()
    assert sorted(out["member_id"]) == [10, 11, 20]
    # GOQL filter on members
    out = graph.members_of(rel1, members, feats, goql="w[highway=primary]").toPandas()
    assert list(out["member_id"]) == [10]
    # role filter
    out = graph.members_of(rel1, members, feats, role="stop").toPandas()
    assert list(out["member_id"]) == [20]


def test_parents_of(spark, world):
    feats, members, way_nodes = world
    w12 = feats.filter(F.col("fid") == 12)
    rels = feats.filter(F.col("ftype") == "relation")
    out = graph.parents_of(w12, members, rels).toPandas()
    assert list(out["fid"]) == [2]


def test_nodes_of(spark, world):
    feats, members, way_nodes = world
    w10 = feats.filter(F.col("fid") == 10)
    out = graph.nodes_of(w10, way_nodes).toPandas()
    assert list(out["seq"]) == [0, 1, 2]
    assert out["node_id"].isna().sum() == 2  # anonymous nodes
    tagged = graph.nodes_of(w10, way_nodes, tagged_only=True).toPandas()
    assert list(tagged["node_id"]) == [20]


def test_connected_to(spark, world):
    feats, members, way_nodes = world
    out = graph.connected_to(way_nodes, 10).toPandas()
    assert list(out["way_id"]) == [11]


def test_as_of_join_edges(spark):
    """Backward as-of: ties take the snapshot at the same instant,
    events before any snapshot get null, latest-≤ wins."""
    from geodesk_spark.operators import relational
    import pyspark.sql.functions as F

    left = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", 7), (2, "2024-01-01 02:00:00", 7),
         (3, "2024-01-01 05:00:00", 7), (4, "2023-12-31 23:00:00", 7),
         (5, "2024-01-01 01:00:00", 8)],
        "event_id long, ts string, user_id long",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    right = spark.createDataFrame(
        [(7, "2024-01-01 00:00:00", 100), (7, "2024-01-01 02:00:00", 200),
         (8, "2024-01-01 02:00:00", 300)],
        "user_id long, rts string, score long",
    ).withColumn("rts", F.col("rts").cast("timestamp"))
    out = {
        r["event_id"]: r["score"]
        for r in relational.as_of_join(left, right, by="user_id").collect()
    }
    assert out[1] == 100      # tie: snapshot at the same instant
    assert out[2] == 200      # tie on the later snapshot
    assert out[3] == 200      # latest ≤ wins
    assert out[4] is None     # before any snapshot
    assert out[5] is None     # user 8's snapshot is after the event
