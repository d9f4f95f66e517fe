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


# ------------------------------------------------ interval join / sessionize


def test_interval_join_matches_bruteforce(spark):
    import numpy as np
    from geodesk_spark.operators import relational

    rng = np.random.default_rng(3)
    ivs = []
    for i in range(150):
        s = int(rng.integers(0, 10_000))
        ivs.append((i, s, s + int(rng.integers(0, 900))))
    # boundary shapes: zero-length, bucket-aligned, many-bucket span
    ivs += [(900, 500, 500), (901, 0, 100), (902, 100, 4100)]
    pts = [(j, int(rng.integers(0, 10_000))) for j in range(300)]
    pts += [(990, 500), (991, 100), (992, 4100)]  # exact endpoints
    a = spark.createDataFrame(ivs, "iid long, s long, e long")
    b = spark.createDataFrame(pts, "pid long, t long")
    got = {
        (r["iid"], r["pid"])
        for r in relational.interval_join(a, b, bucket_width=100).collect()
    }
    exp = {(i, p) for i, s, e in ivs for p, t in pts if s <= t <= e}
    assert got == exp
    assert len(exp) > 500


def test_interval_join_exactly_once(spark):
    from geodesk_spark.operators import relational

    a = spark.createDataFrame([(1, 0, 1000)], "iid long, s long, e long")
    b = spark.createDataFrame([(7, 500)], "pid long, t long")
    rows = relational.interval_join(a, b, bucket_width=10).collect()
    assert len(rows) == 1  # interval spans 101 buckets; the pair emits once


def test_session_window_exact_gap_tie_matches_sessionize(spark):
    """Pin the boundary-tie contract between the two sessionizers: two
    events EXACTLY one gap apart must land in ONE session in BOTH the
    gaps-and-islands operator (strict `> gap` new-session test) and
    Spark's native session_window (closed-boundary merge) — the
    stream_session_counts oracle depends on this agreement."""
    from geodesk_spark.operators import relational

    df = spark.createDataFrame(
        [("u", "2024-01-01 00:00:00", 1, 1.0), ("u", "2024-01-01 01:00:00", 2, 1.0)],
        "user_id string, ts string, event_id long, value double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    native = (
        df.groupBy(F.session_window("ts", "1 hour").alias("w"), "user_id")
        .count()
        .collect()
    )
    assert len(native) == 1 and native[0]["count"] == 2
    ours = relational.sessionize(df, gap_us=3_600_000_000).collect()
    assert len(ours) == 1 and ours[0]["n_events"] == 2


def test_sessionize_hand_case(spark):
    from geodesk_spark.operators import relational

    base = "2024-01-01 00:"
    rows = [
        # user 1: events at 00:00, 00:10, 02:00 → sessions {2 events}, {1}
        (1, 1, f"{base}00:00", 1.5),
        (2, 1, f"{base}10:00", 2.5),
        (3, 1, "2024-01-01 02:00:00", 4.0),
        # user 2: single event
        (4, 2, f"{base}05:00", 1.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts string, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = {
        (r["user_id"], r["session_idx"]): r
        for r in relational.sessionize(df, gap_us=3_600_000_000).collect()
    }
    assert out[(1, 1)]["n_events"] == 2 and out[(1, 1)]["sum_value"] == 4.0
    assert out[(1, 2)]["n_events"] == 1 and out[(1, 2)]["sum_value"] == 4.0
    assert out[(2, 1)]["n_events"] == 1
    assert out[(1, 1)]["end_us"] - out[(1, 1)]["start_us"] == 600_000_000


# ---------------------------------------------------------------- pagerank


def test_pagerank_integer_properties(spark):
    from geodesk_spark.operators import graph as graph_mod

    # star: everyone links to 0; 0 links to 1; node 9 dangling target
    edges = [(s, 0) for s in range(1, 8)] + [(0, 1), (3, 9)]
    df = spark.createDataFrame(edges, "src long, dst long")
    lazy = {
        r["node"]: r["units"]
        for r in graph_mod.pagerank_integer(df, iters=10, materialize=False).collect()
    }
    mat = {
        r["node"]: r["units"]
        for r in graph_mod.pagerank_integer(df, iters=10, materialize=True).collect()
    }
    assert lazy == mat  # the scale path and the lazy path agree bit-for-bit
    # the 0<->1 attractor holds nearly all mass (ranks alternate with
    # iteration parity, so only the PAIR ordering is stable)
    top2 = {n for n, _ in sorted(lazy.items(), key=lambda kv: -kv[1])[:2]}
    assert top2 == {0, 1}
    # nodes with no in-edges hold exactly the teleport base
    base = (1_000_000_000_000 * 15) // 100
    for n in (2, 4, 5, 6, 7):
        assert lazy[n] == base
    # node 9: base + floor(0.85 * base / outdeg(3)=2), hand-computed
    assert lazy[9] == base + (base * 85) // (100 * 2)


def test_triangle_counts_hand_graph(spark):
    from geodesk_spark.operators import graph as graph_mod

    # K4 on {0,1,2,3} (4 triangles, each node in 3), plus a pendant 4-5
    # and a separate triangle {6,7,8}; duplicate + reversed edges must
    # not double-count
    edges = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3),
             (1, 0), (2, 0),          # reversed dups
             (4, 5), (6, 7), (7, 8), (8, 6)]
    df = spark.createDataFrame(edges, "a long, b long")
    out = {r["node"]: r["n_tri"] for r in graph_mod.triangle_counts(df).collect()}
    assert out == {0: 3, 1: 3, 2: 3, 3: 3, 6: 1, 7: 1, 8: 1}


def test_sssp_hand_graph(spark):
    """Bounded-round SSSP on a hand graph: a shorter 3-hop path must beat
    a heavy 1-hop edge, unreached nodes stay absent, and the bounded
    round count caps path length."""
    edges = [
        (0, 1, 10),
        (0, 2, 1), (2, 3, 1), (3, 1, 1),   # 3-hop path to 1, cost 3
        (1, 4, 5),
        (7, 8, 1),                          # disconnected from source
    ]
    df = spark.createDataFrame(edges, "src long, dst long, w long")
    got = {r["node"]: r["dist"] for r in graph.sssp_rounds(df, [0], rounds=6).collect()}
    assert got == {0: 0, 1: 3, 2: 1, 3: 2, 4: 8}
    # with rounds=1 only direct edges are relaxed
    got1 = {r["node"]: r["dist"] for r in graph.sssp_rounds(df, [0], rounds=1).collect()}
    assert got1 == {0: 0, 1: 10, 2: 1}


def test_sssp_lazy_matches_materialized(spark):
    """materialize=False (lazy join tower) must agree with the cached
    per-round path, and multi-source takes the min over sources."""
    import numpy as np

    rng = np.random.default_rng(11)
    edges = [
        (int(rng.integers(0, 30)), int(rng.integers(0, 30)), int(rng.integers(1, 9)))
        for _ in range(120)
    ]
    df = spark.createDataFrame(edges, "src long, dst long, w long")
    a = {r["node"]: r["dist"]
         for r in graph.sssp_rounds(df, [0, 5], rounds=5, materialize=True).collect()}
    b = {r["node"]: r["dist"]
         for r in graph.sssp_rounds(df, [0, 5], rounds=5, materialize=False).collect()}
    assert a == b
    # brute: Bellman-Ford in numpy, 5 rounds
    import collections
    dist = {0: 0, 5: 0}
    for _ in range(5):
        nd = dict(dist)
        for s, d, w in edges:
            if s in dist and (d not in nd or dist[s] + w < nd[d]):
                nd[d] = min(nd.get(d, 1 << 60), dist[s] + w)
        dist = nd
    assert a == dist


def test_geofence_transitions_hand_case(spark):
    """enter/exit/switch over a hand timeline, incl. first-event-inside,
    first-event-outside, equal-state runs dropped, ts tie-break."""
    from geodesk_spark.operators import relational

    rows = [
        # user 1: outside, A, A, B, outside, outside, A
        (1, 100, 0, None), (1, 200, 1, "A"), (1, 300, 2, "A"), (1, 400, 3, "B"),
        (1, 500, 4, None), (1, 600, 5, None), (1, 700, 6, "A"),
        # user 2: first event inside
        (2, 100, 7, "C"), (2, 200, 8, None),
        # user 3: never inside
        (3, 100, 9, None),
        # user 4: ts tie broken by event_id
        (4, 100, 10, "A"), (4, 100, 11, None),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts long, event_id long, fence_id string")
    got = [
        (r["user_id"], r["ts"], r["prev_fence"], r["fence"], r["kind"])
        for r in relational.geofence_transitions(df)
        .orderBy("user_id", "ts", "event_id")
        .collect()
    ]
    assert got == [
        (1, 200, None, "A", "enter"),
        (1, 400, "A", "B", "switch"),
        (1, 500, "B", None, "exit"),
        (1, 700, None, "A", "enter"),
        (2, 100, None, "C", "enter"),
        (2, 200, "C", None, "exit"),
        (4, 100, None, "A", "enter"),
        (4, 100, "A", None, "exit"),
    ]


def test_isochrone_bands_cumulative_hulls(spark):
    """Isochrone laws on a planted star graph: cumulative bands (every
    t1-reached node inside the t2 point set), hull vertices subset of
    the band's points, and the outer band's hull contains the inner
    band's points (convexity + cumulativity)."""
    from geodesk_spark.operators import graph as graph_mod

    # star: source 0 at center, spokes at cost 10 (ring A) and 100 (ring B)
    coords = {0: (0, 0)}
    edges = []
    ring_a = [(50, 0), (0, 50), (-50, 0), (0, -50)]
    ring_b = [(900, 900), (-900, 900), (-900, -900), (900, -900)]
    for i, (x, y) in enumerate(ring_a, start=1):
        coords[i] = (x, y)
        edges.append((0, i, 10))
        edges.append((i, 0, 10))
    for i, (x, y) in enumerate(ring_b, start=10):
        coords[i] = (x, y)
        edges.append((0, i, 100))
        edges.append((i, 0, 100))
    e = spark.createDataFrame(edges, "src long, dst long, w long")
    nodes = spark.createDataFrame(
        [(n, x, y) for n, (x, y) in coords.items()], "node long, x long, y long"
    )
    dist = graph_mod.sssp_rounds(e, [0], rounds=3, materialize=False)
    hulls = graph_mod.isochrone_bands(dist, nodes, [20, 200]).collect()
    by_band = {}
    for r in hulls:
        by_band.setdefault(r.band, []).append((r.x, r.y))
    # inner band: center + ring A -> hull is the 4 ring-A points
    assert sorted(by_band[20]) == sorted(ring_a)
    # outer band: cumulative -> hull is ring B (ring A strictly inside)
    assert sorted(by_band[200]) == sorted(ring_b)


def test_label_spread_chain(spark):
    """Label spreading on a planted path + triangle: hop-bounded
    propagation, seed immutability, majority with smallest-label ties,
    unreachable stays NULL."""
    from geodesk_spark.operators import graph as graph_mod

    # path 1-2-3-4-5 seeded at 1; triangle 10-11-12 with two seeds
    # (3 and 5) voting on 12; isolated 99 unseeded
    nodes = spark.createDataFrame(
        [(1, 4), (2, None), (3, None), (4, None), (5, None),
         (10, 3), (11, 5), (12, None), (99, None)],
        "id long, label int",
    )
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (10, 12), (11, 12)],
        "a long, b long",
    )

    def run(rounds):
        return {r.id: r.label
                for r in graph_mod.label_spread(nodes, edges, rounds=rounds).collect()}

    g1 = run(1)
    assert g1[2] == 4 and g1[3] is None          # one hop only
    assert g1[12] == 3                           # tie 3 vs 5 -> smallest
    assert g1[10] == 3 and g1[11] == 5           # seeds immutable
    g3 = run(3)
    assert g3[4] == 4 and g3[5] is None          # 3 hops reach node 4
    assert g3[99] is None                        # isolated never labeled
    # seeded flags
    seeded = {r.id: r.seeded
              for r in graph_mod.label_spread(nodes, edges, rounds=1).collect()}
    assert seeded[1] and not seeded[2]
