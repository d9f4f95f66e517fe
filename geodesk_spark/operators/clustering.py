"""Density clustering: exact distributed DBSCAN over integer point tables.

The missing sibling of the centroid family (ann.kmeans / medoids): cluster
counts unknown, arbitrary shapes, explicit noise — the standard tool for
"find the dense places" over check-ins, POIs, or image geotags.  Single-node
references (scikit-learn, PostGIS ST_ClusterDBSCAN) walk a kd-tree point by
point; the scale-correct re-expression is the cell-blocking join used by the
engine's other eps-radius operators (knn.distance_join, mobility.colocation):

1. bin points to an eps-sized power-of-two grid (one cheap projection),
2. candidate pairs = 3x3 neighbor-cell equi-join (ONE shuffle; the 9-cell
   cover is exact for cell >= eps, so blocking loses nothing),
3. exact int64 distance test dx*dx + dy*dy <= eps*eps (no sqrt, no floats),
4. core points = neighbor count + 1 >= min_pts (DBSCAN counts the point
   itself),
5. clusters = connected components over CORE-CORE edges (reusing
   dedup.connected_components' large/small-star contraction — O(log n)
   rounds over a shrinking edge list),
6. border points attach to their MINIMUM core-neighbor label; everything
   else is noise (-1).

Classic DBSCAN assigns border points to the first-DISCOVERED cluster —
scan-order dependent, unreproducible under parallelism.  Taking the minimum
core label instead makes the output a pure function of the input (the same
determinism choice PostGIS makes), which is what lets a DuckDB oracle
value-hash the result.

Reference parity note: the reference engine has no density clustering
(nearest analog is its tile-subdivision densification, FreeTileSet.java);
this operator is part of the training-data-pipeline surface (geotag
cluster discovery / spatial dedup of near-duplicate capture sites).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from geodesk_spark.operators import dedup

_SHIFT = 1 << 31  # int32 coordinate -> nonnegative bigint


_EPS_MAX = 1 << 30  # |dx| < 2*cell <= 2^31 keeps dx*dx + dy*dy < 2^63


def _cell_bits(eps: int) -> int:
    """Smallest power-of-two cell side >= eps (3x3 cover then exact).
    eps is capped at 2^30: past that the candidate deltas could square
    beyond int64 (and a radius of a quarter world isn't clustering)."""
    if not 0 < int(eps) <= _EPS_MAX:
        raise ValueError(f"eps must be in (0, 2^30], got {eps}")
    return max(int(eps) - 1, 1).bit_length()


def neighbor_pairs(
    points: DataFrame,
    eps: int,
    id_col: str = "id",
    x_col: str = "x",
    y_col: str = "y",
    t_col: str | None = None,
    eps_t: int | None = None,
) -> DataFrame:
    """All ORDERED pairs (id_a, id_b), id_a != id_b, within eps (<=, exact
    int64).  Each pair appears exactly once per direction: the probe side
    explodes to its 9 neighbor cells, the build side keys on its own cell,
    so (a, b) matches only in b's unique home cell.

    With ``t_col``/``eps_t``, a pair must ALSO satisfy |t_a − t_b| ≤
    eps_t (integer time units) — the ST-DBSCAN neighborhood (Birant &
    Kut 2007).  Blocking stays spatial; the time test rides the same
    join (at dense-cell×long-window scale, add a time band to the join
    key the same way the cells band space)."""
    bits = _cell_bits(eps)
    if (t_col is None) != (eps_t is None):
        raise ValueError("t_col and eps_t must be given together")
    tcols = [F.col(t_col).cast("bigint").alias("t")] if t_col else []
    pts = points.select(
        F.col(id_col).alias("id"),
        F.col(x_col).cast("bigint").alias("x"),
        F.col(y_col).cast("bigint").alias("y"),
        *tcols,
    )
    base = pts.select(
        "id",
        "x",
        "y",
        *(["t"] if t_col else []),
        F.shiftright(F.col("x") + _SHIFT, bits).alias("cx"),
        F.shiftright(F.col("y") + _SHIFT, bits).alias("cy"),
    )
    probe = base.select(
        F.col("id").alias("id_a"),
        F.col("x").alias("ax"),
        F.col("y").alias("ay"),
        *([F.col("t").alias("at")] if t_col else []),
        F.explode(
            F.array(
                *[
                    F.struct(
                        (F.col("cx") + dx).alias("cx"), (F.col("cy") + dy).alias("cy")
                    )
                    for dx in (-1, 0, 1)
                    for dy in (-1, 0, 1)
                ]
            )
        ).alias("c"),
    ).select("id_a", "ax", "ay", *(["at"] if t_col else []), "c.cx", "c.cy")
    eps2 = int(eps) * int(eps)
    d2 = (F.col("ax") - F.col("x")) * (F.col("ax") - F.col("x")) + (
        F.col("ay") - F.col("y")
    ) * (F.col("ay") - F.col("y"))
    cond = (F.col("id_a") != F.col("id")) & (d2 <= F.lit(eps2))
    if t_col:
        cond = cond & (
            F.abs(F.col("at") - F.col("t")) <= F.lit(int(eps_t))
        )
    return (
        probe.join(base, ["cx", "cy"])
        .filter(cond)
        .select("id_a", F.col("id").alias("id_b"))
    )


def dbscan(
    points: DataFrame,
    eps: int,
    min_pts: int,
    id_col: str = "id",
    x_col: str = "x",
    y_col: str = "y",
    t_col: str | None = None,
    eps_t: int | None = None,
    max_iter: int = 25,
) -> DataFrame:
    """Exact DBSCAN -> (id, label, is_core); label = the component's
    smallest core id, border = min core-neighbor label, noise = -1.
    ``eps`` and the coordinates are integer units (same frame as the rest
    of the engine); the distance test is <= eps, exact in int64.
    ``t_col``/``eps_t`` switch the neighborhood to ST-DBSCAN's space AND
    time box (see neighbor_pairs); everything downstream is unchanged."""
    pts = points.select(
        F.col(id_col).cast("bigint").alias("id"),
        F.col(x_col).cast("bigint").alias(x_col),
        F.col(y_col).cast("bigint").alias(y_col),
        *([F.col(t_col).cast("bigint").alias(t_col)] if t_col else []),
    )
    pairs = neighbor_pairs(pts, eps, "id", x_col, y_col, t_col, eps_t).cache()
    nbr = pairs.groupBy("id_a").agg(F.count("*").alias("n"))
    core = (
        pts.join(nbr, pts.id == nbr.id_a, "left")
        .filter(F.coalesce(F.col("n"), F.lit(0)) + 1 >= min_pts)
        .select("id")
        .cache()
    )
    # core-core edges; each unordered edge once (CC symmetrizes internally)
    ce = (
        pairs.filter(F.col("id_a") < F.col("id_b"))
        .join(core.withColumnRenamed("id", "id_a"), "id_a")
        .join(core.withColumnRenamed("id", "id_b"), "id_b")
        .select("id_a", "id_b")
    )
    comp = dedup.connected_components(ce, "id_a", "id_b", max_iter=max_iter)
    core_lab = core.join(comp, core.id == comp.doc_id, "left").select(
        "id", F.coalesce("comp_id", "id").alias("label")
    )
    # border: non-core with >= 1 core neighbor -> min core label
    border = (
        pairs.join(core_lab.withColumnRenamed("id", "id_b"), "id_b")
        .join(core.withColumnRenamed("id", "id_a"), "id_a", "left_anti")
        .groupBy("id_a")
        .agg(F.min("label").alias("blabel"))
    )
    out = (
        pts.select("id")
        .join(core_lab.withColumnRenamed("label", "clabel"), "id", "left")
        .join(border.withColumnRenamed("id_a", "id"), "id", "left")
        .select(
            "id",
            F.coalesce("clabel", "blabel", F.lit(-1)).cast("bigint").alias("label"),
            F.col("clabel").isNotNull().cast("int").alias("is_core"),
        )
    )
    out = out.localCheckpoint(eager=True)  # detach from the caches below
    pairs.unpersist()
    core.unpersist()
    dedup._release_local_checkpoint(comp)  # spent: out no longer reads it
    return out


def geo_medoid_per_group(
    points: DataFrame,
    group_col: str = "gid",
    id_col: str = "id",
    x_col: str = "x",
    y_col: str = "y",
    max_group: int = 256,
) -> DataFrame:
    """Per-group GEOGRAPHIC medoid: the member minimizing the sum of
    squared integer distances to its group, ties to the smallest id —
    the canonical-capture-site selection step after spatial dedup (one
    real representative per DBSCAN cluster / staypoint cell), the
    spatial sibling of ann.medoid_per_label.

    Exactness: d² terms are products of decimal(19,0)-cast deltas
    (never bigint overflow — imp deltas square past 2^63) summed as
    decimal(38,0) — exact integers in both engines (hugeint in the
    oracle), so the argmin is bit-deterministic with no float anywhere.

    Scale: the self-join is quadratic IN GROUP SIZE only; groups larger
    than ``max_group`` are capped to a deterministic md5-ranked subset
    used as BOTH candidate and reference set (the medoid_per_label
    precedent) so one mega-cluster can't go quadratic.
    Output: (group, medoid_id, n_members) — n_members pre-cap.
    """
    g = points.select(
        F.col(group_col).alias("g"),
        F.col(id_col).cast("bigint").alias("mid"),
        F.col(x_col).cast("bigint").alias("mx"),
        F.col(y_col).cast("bigint").alias("my"),
    )
    w = Window.partitionBy("g").orderBy(F.md5(F.col("mid").cast("string")), "mid")
    sizes = g.groupBy("g").agg(F.count("*").alias("n_members"))
    capped = (
        g.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= max_group)
        .drop("_rk")
    )
    a = capped
    b = capped.select(
        F.col("g"), F.col("mx").alias("bx"), F.col("my").alias("by")
    )
    dx = (F.col("mx") - F.col("bx")).cast("decimal(19,0)")
    dy = (F.col("my") - F.col("by")).cast("decimal(19,0)")
    sums = (
        a.join(b, "g")
        .groupBy("g", "mid")
        .agg(F.sum(dx * dx + dy * dy).alias("_s"))
    )
    rk = Window.partitionBy("g").orderBy(F.col("_s").asc(), F.col("mid").asc())
    best = (
        sums.withColumn("_r", F.row_number().over(rk))
        .filter(F.col("_r") == 1)
        .select("g", F.col("mid").alias("medoid_id"))
    )
    return best.join(sizes, "g").select(
        F.col("g").alias(group_col), "medoid_id", "n_members"
    )
