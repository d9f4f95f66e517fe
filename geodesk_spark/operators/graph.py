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


def pagerank_integer(
    edges: DataFrame,
    iters: int = 10,
    total_units: int = 1_000_000_000_000,
    damping: tuple[int, int] = (85, 100),
    src: str = "src",
    dst: str = "dst",
    materialize: bool = True,
) -> DataFrame:
    """Iterative PageRank in EXACT integer units — the canonical
    iterative graph algorithm (authority/quality scoring of a link
    graph, the classic web-corpus quality signal).

    Floating-point PageRank is not reproducible across partitionings
    (sum order); instead every node starts with ``total_units`` integer
    units and each iteration sends ``(units · d_num) div (d_den · deg)``
    along each out-edge (exact integral division in BOTH engines — not
    floor(double)), plus the constant teleport ``(total_units ·
    (d_den − d_num)) div d_den``.  Remainders are absorbed (units are a
    fixed-point encoding, not a conserved mass), and dangling nodes
    keep only teleport — both rules applied identically in the chained
    CTE oracle, so 10 iterations are bit-deterministic end to end.

    Scale shape: per iteration ONE shuffle join (ranks ⋈ edges on src;
    deg is folded into the edge list once, up front) + the groupBy(dst)
    rollup with map-side combine.  Ranks cache per round and unpersist
    the previous round (the connected-components pattern); at real
    scale checkpoint every ~5 rounds to cut lineage.
    ``materialize=False`` skips the per-round cache/eval and hands
    Catalyst one lazy ``iters``-deep join plan — right when the graph
    is dimension-sized (blocking micro-jobs cost more than the query),
    wrong at scale (unbounded lineage depth).
    """
    d_num, d_den = damping
    base = (total_units * (d_den - d_num)) // d_den
    deg = edges.groupBy(src).agg(F.count("*").alias("deg"))
    e = edges.join(deg, src).select(
        F.col(src).alias("_src"), F.col(dst).alias("_dst"), "deg"
    )
    nodes = (
        edges.select(F.col(src).alias("node"))
        .union(edges.select(F.col(dst).alias("node")))
        .distinct()
    )
    if materialize:
        # pin the loop-invariant frames — without this every blocking
        # round recomputes the degree rollup and node dedup shuffles
        e = e.cache()
        nodes = nodes.cache()
    ranks = nodes.withColumn("units", F.lit(total_units).cast("long"))
    if materialize:
        ranks = ranks.cache()
    for _ in range(iters):
        contribs = (
            e.join(ranks, e._src == ranks.node)
            .select(
                F.col("_dst").alias("node"),
                F.expr(f"(units * {d_num}) div ({d_den} * deg)").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("c"))
        )
        new_ranks = (
            nodes.join(contribs, "node", "left")
            .select(
                "node",
                (F.lit(base).cast("long") + F.coalesce(F.col("c"), F.lit(0))).alias(
                    "units"
                ),
            )
        )
        if materialize:
            new_ranks = new_ranks.cache()
            new_ranks.count()
            ranks.unpersist()
        ranks = new_ranks
    if materialize:
        # detach the result from its cached lineage, then release ALL the
        # round caches — returning the cached frame itself pinned it in
        # executor storage for the life of the session (r03 review; same
        # pattern as connected_components)
        ranks_out = ranks.localCheckpoint(eager=True)
        ranks.unpersist()
        e.unpersist()
        nodes.unpersist()
        return ranks_out
    return ranks


def pagerank_integer_sql(
    edges_cte: str,
    iters: int = 10,
    total_units: int = 1_000_000_000_000,
    damping: tuple[int, int] = (85, 100),
) -> str:
    """DuckDB twin of :func:`pagerank_integer`: the iteration unrolled
    as chained CTEs (the IVF-Lloyd oracle pattern), `//` = Spark `div`
    on positive operands."""
    d_num, d_den = damping
    base = (total_units * (d_den - d_num)) // d_den
    parts = [
        f"e as ({edges_cte})",
        "deg as (select src, count(*) as deg from e group by src)",
        "nodes as (select distinct node from "
        "(select src as node from e union all select dst from e) u)",
        f"r0 as (select node, cast({total_units} as bigint) as units from nodes)",
    ]
    for i in range(1, iters + 1):
        parts.append(
            f"c{i} as (select e.dst as node, "
            f"sum((r{i-1}.units * {d_num}) // ({d_den} * deg.deg)) as c "
            f"from e join deg on e.src = deg.src "
            f"join r{i-1} on r{i-1}.node = e.src group by e.dst)"
        )
        parts.append(
            f"r{i} as (select n.node, cast({base} + coalesce(c.c, 0) as bigint) as units "
            f"from nodes n left join c{i} c using (node))"
        )
    return (
        "with " + ",\n".join(parts) + f"\nselect node, units from r{iters}"
    )


def triangle_counts(edges: DataFrame, a: str = "a", b: str = "b") -> DataFrame:
    """Per-node triangle counts of an undirected graph — the standard
    clustering/cohesion signal (spam subgraphs, community density).

    Algorithm: degree-ordered orientation.  Each undirected edge points
    from its (degree, id)-smaller endpoint to the larger; every
    triangle then has exactly ONE vertex with both triangle edges
    outgoing, so wedges (s→x, s→y), x<y, closed by edge {x,y} find each
    triangle exactly once — no post-dedup.  The orientation bounds
    out-degrees by O(√m), which bounds the wedge join at O(m^1.5):
    the classic shuffle-efficient shape (a naive edge³ join is
    quadratic on hub nodes).

    Shuffles: degree rollup, two dimension joins to attach degrees
    (broadcast when degree table is small), the wedge self-join on s,
    and the closing semi-join on the canonical edge — all equi-joins
    AQE can skew-split.  Returns (node, n_tri) for nodes in ≥1 triangle.
    """
    und = (
        edges.filter(F.col(a) != F.col(b))
        .select(F.least(a, b).alias("u"), F.greatest(a, b).alias("v"))
        .distinct()
    )
    deg = (
        und.select(F.col("u").alias("n"))
        .union(und.select(F.col("v").alias("n")))
        .groupBy("n")
        .agg(F.count("*").alias("d"))
    )
    e2 = und.join(
        deg.select(F.col("n").alias("u"), F.col("d").alias("du")), "u"
    ).join(deg.select(F.col("n").alias("v"), F.col("d").alias("dv")), "v")
    lower_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = e2.select(
        F.when(lower_first, F.col("u")).otherwise(F.col("v")).alias("s"),
        F.when(lower_first, F.col("v")).otherwise(F.col("u")).alias("t"),
    )
    w1 = oriented.select(F.col("s"), F.col("t").alias("x"))
    w2 = oriented.select(F.col("s"), F.col("t").alias("y"))
    wedges = w1.join(w2, "s").filter(F.col("x") < F.col("y"))
    tri = wedges.join(
        und,
        (F.least("x", "y") == F.col("u")) & (F.greatest("x", "y") == F.col("v")),
        "left_semi",
    )
    return (
        tri.select(F.explode(F.array("s", "x", "y")).alias("node"))
        .groupBy("node")
        .agg(F.count("*").alias("n_tri"))
    )


def sssp_rounds(
    edges: DataFrame,
    sources: list,
    rounds: int = 6,
    src: str = "src",
    dst: str = "dst",
    w: str = "w",
    materialize: bool = True,
) -> DataFrame:
    """Bounded-round single-source shortest paths — Bellman-Ford
    relaxation over positive INTEGER weights (routing distance over a
    road-segment graph is the geodesk-adjacent consumer; the bounded
    round count makes the result well-defined without a convergence
    race: after r rounds dist(v) = min cost over paths of ≤ r hops).

    min over integers is order-free, so the result is bit-deterministic
    across partitionings and engines — the same reason pagerank_integer
    uses integer units.

    Scale shape (textbook Pregel SSSP): per round ONE shuffle join of
    the FRONTIER (only nodes improved last round — the delta, usually a
    tiny fraction) against the edge list, plus a min-merge rollup;
    converged graphs exit early (empty frontier ⇒ the ≤r-hop minimum is
    already the true minimum, identical to running all rounds).
    Unreached nodes are absent (no +inf sentinel rows).

    Returns (node, dist).
    """
    from geodesk_spark.operators.dedup import _release_local_checkpoint

    spark = edges.sparkSession
    e = edges.select(F.col(src).alias("_src"), F.col(dst).alias("_dst"), F.col(w).alias("_w"))
    if materialize:
        e = e.cache()
    dist = spark.createDataFrame([(s, 0) for s in sources], f"node long, dist long").distinct()
    frontier = dist
    for _ in range(rounds):
        cand = (
            frontier.join(e, frontier.node == e._src)
            .select(F.col("_dst").alias("node"), (F.col("dist") + F.col("_w")).alias("dist"))
        )
        merged = (
            dist.unionByName(cand).groupBy("node").agg(F.min("dist").alias("dist"))
        )
        # delta: nodes whose distance improved this round (new nodes or
        # strictly smaller) — the next round relaxes only these
        new_frontier = merged.join(
            dist.select(F.col("node"), F.col("dist").alias("old")), "node", "left"
        ).filter(F.col("old").isNull() | (F.col("dist") < F.col("old"))).select("node", "dist")
        if materialize:
            # localCheckpoint, NOT cache: the round plan references
            # `dist` twice (carry + delta probe), so a cached-but-lazy
            # lineage still DOUBLES the analyzed plan per round —
            # exponential analysis OOM past ~8 rounds (the CLAUDE.md
            # iterative-plan law, re-hit by terrain.cost_distance at
            # rounds=10).  Checkpointing truncates the plan to a scan
            # of the materialized blocks; spent rounds are released
            # explicitly (unpersist can't reach checkpoint blocks).
            merged = merged.localCheckpoint(eager=True)
            new_frontier = new_frontier.localCheckpoint(eager=True)
            if new_frontier.count() == 0:
                _release_local_checkpoint(new_frontier)
                if frontier is not dist:
                    _release_local_checkpoint(frontier)
                _release_local_checkpoint(dist)
                dist = merged
                break
            if frontier is not dist:
                _release_local_checkpoint(frontier)  # previous delta
            _release_local_checkpoint(dist)
        dist, frontier = merged, new_frontier
    if materialize:
        e.unpersist()
        # round budget exhausted without an empty frontier: the last
        # round's delta is not the returned frame — release it (the
        # early-exit branch already does)
        if frontier is not dist:
            _release_local_checkpoint(frontier)
    return dist


def sssp_rounds_sql(edges_cte: str, sources: list, rounds: int = 6) -> str:
    """DuckDB twin of :func:`sssp_rounds`, the FULL (frontier-free)
    relaxation unrolled as chained CTEs — an independent formulation of
    the same ≤r-hop minimum, so it also proves the delta-frontier
    optimization changes nothing."""
    src_rows = " union all ".join(f"select cast({s} as bigint) as node, cast(0 as bigint) as dist" for s in sources)
    # every d_{i-1} is referenced TWICE per round (carry + relax) and e
    # once — without `as materialized` DuckDB's binder re-expands each
    # reference, so the tree doubles per round (exponential past ~6
    # rounds; the CLAUDE.md CTE law, rediscovered via cost_distance)
    parts = [
        f"e as materialized ({edges_cte})",
        f"d0 as materialized (select distinct node, dist from ({src_rows}) s)",
    ]
    for i in range(1, rounds + 1):
        parts.append(
            f"d{i} as materialized (select node, min(dist) as dist from ("
            f"select node, dist from d{i-1} "
            f"union all "
            f"select e.dst as node, d{i-1}.dist + e.w as dist "
            f"from d{i-1} join e on e.src = d{i-1}.node) u group by node)"
        )
    return "with " + ",\n".join(parts) + f"\nselect node, dist from d{rounds}"


def isochrone_bands(
    dist: DataFrame,
    nodes: DataFrame,
    thresholds: list[int],
    node_col: str = "node",
    dist_col: str = "dist",
) -> DataFrame:
    """Isochrone reachability polygons: for each cost threshold t the
    convex hull of every node reachable within dist ≤ t — the
    "where can I get in 10/20/30 minutes" map, the standard consumer of
    a road-network SSSP (bands are CUMULATIVE: the t₂ polygon contains
    the t₁ polygon, so rendering back-to-front needs no erase step).

    Compose: graph.sssp_rounds → join node coordinates → band explode →
    geometry_ops.convex_hull_by_group.  All integer inputs; the hull's
    cross products are exact python ints — bit-deterministic.

    Scale shape: the band explode fans each reached node out ≤
    |thresholds| times (a handful), then ONE hull shuffle grouped by
    band; the SSSP dominates end-to-end cost, as it should.

    → (band, seq, x, y) hull-ordered CCW rings, one row per hull vertex.
    """
    from geodesk_spark.operators.geometry_ops import convex_hull_by_group

    t_arr = F.array(*[F.lit(int(t)).cast("long") for t in sorted(thresholds)])
    j = dist.join(nodes, dist[node_col] == nodes[node_col]).select(
        dist[dist_col].alias("_d"), nodes["x"], nodes["y"]
    )
    bands = j.select(
        F.explode(F.filter(t_arr, lambda t: t >= F.col("_d"))).alias("band"),
        "x",
        "y",
    )
    return convex_hull_by_group(bands, group_col="band")


def label_spread(
    nodes: DataFrame,
    edges: DataFrame,
    rounds: int = 3,
    max_label: int = 1 << 20,
    id_col: str = "id",
    label_col: str = "label",
    a_col: str = "a",
    b_col: str = "b",
) -> DataFrame:
    """Semi-supervised label spreading over a neighbor graph — the
    pseudo-labeling step of a curation pipeline (seed labels flow to
    unlabeled neighbors; Zhu & Ghahramani's label propagation in its
    deterministic hard-vote form): per round, every still-unlabeled
    node adopts the MAJORITY label among its labeled neighbors, ties
    broken toward the smallest label; seeds never change; nodes
    labeled in round t vote from round t+1.

    Exact integers end-to-end: votes are counts, and the winner is
    arg-max of ONE packed ordering integer cnt·(max_label+1) − label
    (same scalar both engines — DuckDB arg_max can't order structs,
    the d8_flow_direction trick).  Labels must be ints in
    [0, max_label].

    Per round ONE equi-join (symmetrized edges × current labels) + one
    groupBy(node, label) + one arg-max rollup, with localCheckpoint
    lineage truncation (the iterative-plan law).  ``rounds`` bounds the
    propagation radius exactly like sssp_rounds.

    → (id, label, seeded) — label NULL if never reached.
    """
    from geodesk_spark.operators.dedup import _release_local_checkpoint

    e = edges.select(F.col(a_col).alias("_a"), F.col(b_col).alias("_b"))
    sym = e.union(e.select(F.col("_b").alias("_a"), F.col("_a").alias("_b"))).filter(
        F.col("_a") != F.col("_b")
    ).distinct().localCheckpoint(eager=True)
    L = max_label + 1
    lab = nodes.select(
        F.col(id_col).alias("_id"),
        F.col(label_col).cast("long").alias("_lab"),
        F.col(label_col).isNotNull().alias("seeded"),
    ).localCheckpoint(eager=True)
    for _ in range(rounds):
        votes = (
            sym.join(
                lab.filter(F.col("_lab").isNotNull()).select(
                    F.col("_id").alias("_a"), F.col("_lab")
                ),
                "_a",
            )
            .groupBy(F.col("_b").alias("_id"), "_lab")
            .agg(F.count("*").alias("_cnt"))
            .groupBy("_id")
            .agg(
                F.max(
                    F.struct(
                        (F.col("_cnt") * F.lit(L) - F.col("_lab")).alias("_key"),
                        F.col("_lab").alias("_win"),
                    )
                ).alias("_m")
            )
            .select("_id", F.col("_m._win").alias("_new"))
        )
        nxt = (
            lab.join(votes, "_id", "left")
            .select(
                "_id",
                F.coalesce(F.col("_lab"), F.col("_new")).alias("_lab"),
                "seeded",
            )
            .localCheckpoint(eager=True)
        )
        _release_local_checkpoint(lab)
        lab = nxt
    _release_local_checkpoint(sym)
    return lab.select(
        F.col("_id").alias(id_col), F.col("_lab").alias(label_col), "seeded"
    )


def label_spread_sql(
    nodes_rel: str,
    edges_rel: str,
    rounds: int = 3,
    max_label: int = 1 << 20,
) -> str:
    """DuckDB twin of label_spread over ``nodes_rel`` (id, label) and
    ``edges_rel`` (a, b) — rounds unrolled as materialized CTEs, the
    same packed arg-max."""
    L = max_label + 1
    parts = [
        f"n0 as materialized (select id, cast(label as bigint) as lab, "
        f"label is not null as seeded from ({nodes_rel}) nsrc)",
        f"""e0 as (select a, b from ({edges_rel}) esrc),
      sym as materialized (
        select distinct a, b from (
          select a, b from e0 union all select b, a from e0) u
        where a <> b)""",
    ]
    for r in range(1, rounds + 1):
        parts.append(
            f"""v{r} as materialized (
          select b as id, arg_max(lab, cnt * {L} - lab) as new
          from (select s.b, l.lab, count(*) as cnt
                from sym s join n{r-1} l on l.id = s.a and l.lab is not null
                group by 1, 2) t
          group by b)"""
        )
        parts.append(
            f"""n{r} as materialized (
          select n.id, coalesce(n.lab, v.new) as lab, n.seeded
          from n{r-1} n left join v{r} v on v.id = n.id)"""
        )
    return (
        "with " + ",\n".join(parts)
        + f"\nselect id, lab as label, seeded from n{rounds}"
    )
