"""Graph navigation: membersOf / parentsOf / nodesOf / connectedTo.

The reference resolves these via in-tile member tables and reltables
with cross-tile TIP references (StoredRelation.java:168-192,
MemberIterator.java:35-217, StoredNode.java:94-127, WayNodeView.java).
In Spark they are explicit edge tables and ordinary equi-joins — the
foreign-tile pointer machinery disappears into the shuffle (SURVEY §3.3).

Edge tables (FIXTURES.md §4):
- members(rel_id long, member_type string, member_id long, role string, seq int)
- way_nodes(way_id long, seq int, x int, y int, node_id long nullable)
  (null node_id = anonymous geometry node, AnonymousWayNode.java:24-28)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from geodesk_spark.goql import compile_goql


def members_of(relations: DataFrame, members: DataFrame, features: DataFrame,
               goql: str | None = None, role: str | None = None) -> DataFrame:
    """Members of the given relations, optionally filtered by role and a
    GOQL query on the member features (Features.membersOf semantics)."""
    m = members.join(
        relations.select(F.col("fid").alias("rel_id")).distinct(), "rel_id"
    )
    if role is not None:
        m = m.filter(F.col("role") == role)  # RoleMatcher.java:12-28
    out = m.join(features, m.member_id == features.fid)
    if goql:
        out = out.filter(compile_goql(goql))
    return out


def parents_of(feature_ids: DataFrame, members: DataFrame, relations: DataFrame) -> DataFrame:
    """Parent relations of the given features (reverse membership join,
    View.java:119-140)."""
    hits = members.join(
        feature_ids.select(F.col("fid").alias("member_id")).distinct(), "member_id"
    ).select("rel_id").distinct()
    return relations.join(hits, relations.fid == hits.rel_id, "left_semi")


def parent_ways_of(node_features: DataFrame, way_nodes: DataFrame,
                   features: DataFrame) -> DataFrame:
    """Parent WAYS of the given nodes: a way is a parent iff its geometry
    contains the node's exact integer vertex (StoredNode.java:94-127,
    ParentWayFilter:153-165) — an equi-join on packed XY, same key as
    connectedTo (XY.java:26-30).  The node side is typically tiny
    (a view refinement), so it broadcasts."""
    xy = (F.col("y").cast("long") * F.lit(1 << 32) + F.col("x").cast("long")).alias("xy")
    nodes = (
        node_features.filter(F.col("ftype") == "node")
        .select(xy)
        .distinct()
    )
    hit_ways = (
        way_nodes.select("way_id", xy)
        .join(F.broadcast(nodes), "xy")
        .select("way_id")
        .distinct()
    )
    return features.join(hit_ways, features.fid == hit_ways.way_id, "left_semi")


def nodes_of(way_ids: DataFrame, way_nodes: DataFrame, nodes: DataFrame | None = None,
             tagged_only: bool = False) -> DataFrame:
    """A way's nodes in sequence order; anonymous geometry nodes have
    null node_id (WayNodeView.java:22-106)."""
    wn = way_nodes.join(way_ids.select(F.col("fid").alias("way_id")).distinct(), "way_id")
    if tagged_only:
        wn = wn.filter(F.col("node_id").isNotNull())
    if nodes is not None:
        wn = wn.join(nodes, wn.node_id == nodes.fid, "left")
    return wn.orderBy("way_id", "seq")


def connected_to(way_nodes: DataFrame, way_id: int) -> DataFrame:
    """Ways sharing ≥1 vertex with the given way — exact packed-coordinate
    equality (ConnectedFilter.java:21-113, XY packing XY.java:26-30)."""
    xy = (F.col("y").cast("long") * F.lit(1 << 32) + F.col("x").cast("long")).alias("xy")
    target = way_nodes.filter(F.col("way_id") == way_id).select(xy).distinct()
    return (
        way_nodes.select("way_id", xy)
        .join(F.broadcast(target), "xy")
        .filter(F.col("way_id") != way_id)
        .select("way_id")
        .distinct()
    )
