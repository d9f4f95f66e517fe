"""Multipolygon assembly as a distributed operator.

The reference assembles a relation's polygon lazily at read time from
its member ways (feature/store/StoredRelation.java:74-84,
feature/polygon/PolygonBuilder.java:162-250).  Here the same semantics
run as one Spark stage: member-way coordinate runs group by relation id
and an Arrow-batched kernel (geo/rings.py) chains them into closed
rings and nests holes.

Scale shape: way_nodes ⋈ members is an equi-join on way_id (broadcast
the members side when small, shuffle-hash otherwise); the groupBy
rel_id shuffle moves each vertex exactly once; kernel work is O(ways
log ways) per relation and relations are independent — perfectly
parallel.  Skew (a relation with millions of vertices — coastlines) is
the operators/skew.py salting case; the reference handles the same
problem by tile-subdividing geometry.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from geodesk_spark.geo import pip, rings as R

OUT_SCHEMA = (
    "rel_id long, n_parts int, n_rings int, n_vertices int, n_dangling int, "
    "valid boolean, status string, rings binary, minx int, miny int, maxx int, maxy int"
)


def assemble_relation_polygons(
    members: DataFrame, way_nodes: DataFrame, roles: tuple[str, ...] = ("outer", "inner")
) -> DataFrame:
    """members(rel_id, member_id, role) × way_nodes(way_id, seq, x, y) →
    one packed-rings polygon per relation (PolygonBuilder semantics).

    The fix-up tier mirrors the reference: runs that close nothing are
    DANGLING and dropped while the rings that did form are kept
    (RingBuilder.java:246-249); `status` classifies the outcome —
    'valid' (everything closed), 'fixed' (rings formed, some members
    dropped), 'invalid' (no ring formed → PolygonBuilder returns an
    empty geometry, PolygonBuilder.java:208-214).  `valid` stays the
    boolean "a polygon came out".
    """
    m = members
    if "member_type" in members.columns:
        # only WAY members carry ring geometry; node/sub-relation members
        # with an outer/inner role would otherwise join way_nodes by raw
        # id — and OSM node/way/relation id spaces overlap (r03 review)
        m = m.filter(F.col("member_type") == "w")
    m = m.filter(F.col("role").isin(*roles)).select(
        "rel_id", F.col("member_id").alias("way_id")
    )
    verts = way_nodes.join(m, "way_id").select("rel_id", "way_id", "seq", "x", "y")

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        rel_id = int(pdf["rel_id"].iloc[0])
        runs = []
        for _, grp in pdf.sort_values(["way_id", "seq"]).groupby("way_id", sort=False):
            runs.append(grp[["x", "y"]].to_numpy(dtype=np.float64))
        rings, n_dangling = R.try_assemble_rings(runs)
        parts = R.group_rings(rings)
        flat = [r for part in parts for r in part]
        if not flat:
            return pd.DataFrame(
                {
                    "rel_id": [rel_id], "n_parts": [0], "n_rings": [0],
                    "n_vertices": [0], "n_dangling": [n_dangling],
                    "valid": [False], "status": ["invalid"], "rings": [None],
                    "minx": [0], "miny": [0], "maxx": [0], "maxy": [0],
                }
            )
        blob = pip.pack_rings(flat)
        xs = np.concatenate([r[:, 0] for r in flat])
        ys = np.concatenate([r[:, 1] for r in flat])
        return pd.DataFrame(
            {
                "rel_id": [rel_id],
                "n_parts": [len(parts)],
                "n_rings": [len(flat)],
                "n_vertices": [int(sum(len(r) - 1 for r in flat))],
                "n_dangling": [n_dangling],
                "valid": [True],
                "status": ["valid" if n_dangling == 0 else "fixed"],
                "rings": [blob],
                "minx": [int(xs.min())],
                "miny": [int(ys.min())],
                "maxx": [int(xs.max())],
                "maxy": [int(ys.max())],
            }
        )

    return verts.groupBy("rel_id").applyInPandas(kernel, schema=OUT_SCHEMA)


def gather_relation_closure(
    members: DataFrame,
    rel_is_area: DataFrame,
    max_depth: int = 16,
    max_broadcast_edges: int = 1_000_000,
) -> DataFrame:
    """Transitive closure root→gathered-relation for non-area relations
    (StoredRelation.gatherGeometries, StoredRelation.java:96-137): a
    non-area sub-relation is expanded recursively, an area sub-relation
    is a geometry member and is NOT expanded; a visited-set guards
    reference cycles.

    rel→rel membership is a tiny fraction of any OSM-like corpus
    (relations ≪ features; nested relations ≪ relations), so the edge
    set is broadcast-sized BY CONTRACT — when it fits
    ``max_broadcast_edges`` the closure is computed as a driver-side
    BFS over exactly the rows a broadcast join would have shipped
    anyway (the same regime as prepare_layer's driver-side band
    classification), costing 2 small jobs.  Oversized edge sets fall
    back to the distributed iterative frontier join — one broadcast
    join per nesting level, each round's frontier deduped against the
    accumulated closure, which is the reference's
    ``processedRelations`` set.  Returns (root_rel_id, rel_id)
    including the identity row (root, root).
    """
    spark = members.sparkSession
    non_area = rel_is_area.filter(~F.col("is_area")).select("rel_id")
    edges_df = (
        members.filter(F.col("member_type") == "r")
        .select("rel_id", F.col("member_id").alias("sub_rel_id"))
        .join(
            F.broadcast(non_area.withColumnRenamed("rel_id", "sub_rel_id")),
            "sub_rel_id",
        )
    )
    identity = non_area.select(F.col("rel_id").alias("root_rel_id"), F.col("rel_id"))

    n_edges = edges_df.count()
    if n_edges == 0:
        return identity
    if n_edges <= max_broadcast_edges:
        adj: dict[int, list[int]] = {}
        for r in edges_df.collect():
            adj.setdefault(r["rel_id"], []).append(r["sub_rel_id"])
        # roots must be NON-AREA relations only — the distributed path
        # seeds its frontier from the non-area identity rows, so the
        # driver BFS expanding from every parent in adj (area ones
        # included) returned extra rows the two paths disagreed on
        # (r03 review); membership lookup bounded by |adj|
        na_roots = {
            r["rel_id"]
            for r in non_area.filter(F.col("rel_id").isin(list(adj))).collect()
        }
        pairs = []
        for root in adj:
            if root not in na_roots:
                continue
            seen = {root}
            stack = [root]
            while stack:
                for s in adj.get(stack.pop(), ()):
                    if s not in seen:
                        seen.add(s)
                        pairs.append((root, s))
                        stack.append(s)
        if not pairs:
            return identity
        reach = spark.createDataFrame(pairs, "root_rel_id long, rel_id long")
        return identity.unionByName(reach)

    edges = F.broadcast(edges_df)
    closure = identity.cache()
    frontier = closure
    cached = [closure]
    for _ in range(max_depth):
        step = (
            frontier.join(edges, "rel_id")
            .select("root_rel_id", F.col("sub_rel_id").alias("rel_id"))
            .distinct()
        )
        # cycle guard == processedRelations: drop already-gathered rels
        frontier = step.join(closure, ["root_rel_id", "rel_id"], "left_anti").cache()
        cached.append(frontier)
        if frontier.isEmpty():
            break
        closure = closure.unionByName(frontier).cache()
        cached.append(closure)
    out = closure.localCheckpoint(eager=True)
    for df in cached:
        df.unpersist()
    return out


def relation_geometry_collection(
    members: DataFrame,
    rel_is_area: DataFrame,
    way_nodes: DataFrame,
    nodes: DataFrame,
) -> DataFrame:
    """GeometryCollection assembly for NON-AREA relations
    (StoredRelation.toGeometryCollection, StoredRelation.java:74-84 +
    139-166): gather member geometries recursively through non-area
    sub-relations, then type the result — all-LineString →
    'MultiLineString', all-Point → 'MultiPoint', anything else
    (including all-Polygon, per the reference's explicit choice) →
    'GeometryCollection'.

    Inputs: members(rel_id, member_id, member_type∈{n,w,r}, role),
    rel_is_area(rel_id, is_area), way_nodes(way_id, seq, x, y),
    nodes(node_id, x, y).

    Scale shape: the closure is O(depth) broadcastable joins; member
    geometry summaries are two equi-joins (nodes, way_nodes aggregate)
    plus one distributed polygon assembly for area sub-relations; the
    final groupBy root moves one summary row per gathered member — no
    vertex data crosses that shuffle.  A membership that appears twice
    contributes twice (the reference appends per membership; only
    RELATIONS are deduped by the visited set).
    """
    closure = gather_relation_closure(members, rel_is_area)
    area_rels = rel_is_area.filter(F.col("is_area")).select("rel_id")

    gathered_members = closure.join(
        members.withColumnRenamed("rel_id", "g_rel"),
        closure["rel_id"] == F.col("g_rel"),
    ).select("root_rel_id", "member_id", "member_type")

    node_geoms = (
        gathered_members.filter(F.col("member_type") == "n")
        .join(nodes.withColumnRenamed("node_id", "member_id"), "member_id")
        .select(
            "root_rel_id",
            F.lit("Point").alias("gtype"),
            F.lit(1).alias("n_vertices"),
            F.col("x").alias("minx"), F.col("y").alias("miny"),
            F.col("x").alias("maxx"), F.col("y").alias("maxy"),
        )
    )

    way_summary = way_nodes.groupBy("way_id").agg(
        F.count("*").alias("n_vertices"),
        F.min("x").alias("minx"), F.min("y").alias("miny"),
        F.max("x").alias("maxx"), F.max("y").alias("maxy"),
    )
    way_geoms = (
        gathered_members.filter(F.col("member_type") == "w")
        .join(way_summary.withColumnRenamed("way_id", "member_id"), "member_id")
        .select(
            "root_rel_id",
            F.lit("LineString").alias("gtype"),
            "n_vertices", "minx", "miny", "maxx", "maxy",
        )
    )

    # Area sub-relations are geometry members: their polygon is what
    # member.toGeometry() returns (Polygon for one part, MultiPolygon
    # for several — PolygonBuilder.build).
    needed_area = (
        gathered_members.filter(F.col("member_type") == "r")
        .join(
            F.broadcast(area_rels.withColumnRenamed("rel_id", "member_id")),
            "member_id",
        )
    )
    # drop invalid assemblies (no ring formed): the reference's
    # PolygonBuilder returns an EMPTY geometry there, so the member
    # contributes nothing — emitting the kernel's placeholder row would
    # count a phantom 0-vertex Polygon and drag the root bbox to 0
    # (r03 review)
    area_polys = assemble_relation_polygons(
        members.join(
            F.broadcast(needed_area.select(F.col("member_id").alias("rel_id")).distinct()),
            "rel_id",
        ),
        way_nodes,
    ).filter(F.col("valid")).select(
        F.col("rel_id").alias("member_id"),
        F.when(F.col("n_parts") > 1, "MultiPolygon").otherwise("Polygon").alias("gtype"),
        "n_vertices", "minx", "miny", "maxx", "maxy",
    )
    area_geoms = needed_area.join(area_polys, "member_id").select(
        "root_rel_id", "gtype", "n_vertices", "minx", "miny", "maxx", "maxy"
    )

    geoms = node_geoms.unionByName(way_geoms).unionByName(area_geoms)
    agg = (
        geoms.groupBy("root_rel_id")
        .agg(
            F.count("*").alias("n_geoms"),
            F.sum("n_vertices").alias("n_vertices"),
            F.count_distinct("gtype").alias("_ntypes"),
            F.min("gtype").alias("_t0"),
            F.min("minx").alias("minx"), F.min("miny").alias("miny"),
            F.max("maxx").alias("maxx"), F.max("maxy").alias("maxy"),
        )
        .select(
            F.col("root_rel_id").alias("rel_id"),
            F.when((F.col("_ntypes") == 1) & (F.col("_t0") == "LineString"), "MultiLineString")
            .when((F.col("_ntypes") == 1) & (F.col("_t0") == "Point"), "MultiPoint")
            .otherwise("GeometryCollection")
            .alias("geom_type"),
            F.col("n_geoms").cast("int").alias("n_geoms"),
            F.col("n_vertices").cast("int").alias("n_vertices"),
            "minx", "miny", "maxx", "maxy",
        )
    )
    # A non-area relation with no member geometries is an EMPTY
    # GeometryCollection, not an absent row.
    roots = rel_is_area.filter(~F.col("is_area")).select("rel_id")
    return roots.join(agg, "rel_id", "left").select(
        "rel_id",
        F.coalesce("geom_type", F.lit("GeometryCollection")).alias("geom_type"),
        F.coalesce("n_geoms", F.lit(0)).alias("n_geoms"),
        F.coalesce("n_vertices", F.lit(0)).alias("n_vertices"),
        "minx", "miny", "maxx", "maxy",
    )
