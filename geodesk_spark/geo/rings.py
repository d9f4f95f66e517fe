"""Polygon assembly from unordered way segments.

Re-expresses the reference's multipolygon construction
(feature/polygon/PolygonBuilder.java:162-250, RingBuilder.java,
RingAssigner.java): a relation's member ways arrive as coordinate runs
in arbitrary order and direction; rings are built by chaining runs at
exactly-equal integer endpoints, then nested rings are grouped into
(outer, holes…) parts by containment depth.

Pure-numpy driver kernels — the Spark operator
(operators/polygons.assemble_relation_polygons) calls these inside
applyInPandas per relation group, so the work distributes by rel_id.
"""

from __future__ import annotations

import numpy as np

from geodesk_spark.geo import pip


class RingAssemblyError(ValueError):
    """A member run cannot be chained into any closed ring (dangling
    endpoint) — the reference marks such relations invalid/fixable
    (PolygonBuilder.java:58-74)."""


def assemble_rings(runs: list[np.ndarray]) -> list[np.ndarray]:
    """Chain coordinate runs into closed rings by exact endpoint match.

    Each run is an (k,2) array of integer imp coordinates.  A run whose
    first point equals its last is already a ring.  Otherwise runs are
    joined end-to-end, reversing direction as needed — the reference's
    RingBuilder chains segments the same way (candidates matched on
    exact coordinate equality).  Raises RingAssemblyError when a chain
    cannot close.
    """
    rings: list[np.ndarray] = []
    open_runs: list[np.ndarray] = []
    for r in runs:
        arr = np.asarray(r, dtype=np.float64)
        if len(arr) < 2:
            continue
        if np.array_equal(arr[0], arr[-1]):
            if len(arr) >= 4:
                rings.append(arr)
        else:
            open_runs.append(arr)

    # endpoint index: (x, y) -> [(run_idx, at_start)]
    used = [False] * len(open_runs)

    def key(pt) -> tuple:
        return (float(pt[0]), float(pt[1]))

    index: dict[tuple, list[tuple[int, bool]]] = {}
    for i, r in enumerate(open_runs):
        index.setdefault(key(r[0]), []).append((i, True))
        index.setdefault(key(r[-1]), []).append((i, False))

    for i in range(len(open_runs)):
        if used[i]:
            continue
        used[i] = True
        chain = [open_runs[i]]
        start = key(open_runs[i][0])
        cur = key(open_runs[i][-1])
        while cur != start:
            nxt = None
            for j, at_start in index.get(cur, ()):
                if not used[j]:
                    nxt = (j, at_start)
                    break
            if nxt is None:
                raise RingAssemblyError(f"dangling endpoint {cur}")
            j, at_start = nxt
            used[j] = True
            seg = open_runs[j] if at_start else open_runs[j][::-1]
            chain.append(seg[1:])  # drop shared joint vertex
            cur = key(seg[-1])
        ring = np.vstack(chain)
        if not np.array_equal(ring[0], ring[-1]):
            ring = np.vstack([ring, ring[:1]])
        if len(ring) >= 4:
            rings.append(ring)
    return rings


def signed_area(ring: np.ndarray) -> float:
    x, y = ring[:-1, 0], ring[:-1, 1]
    x2, y2 = ring[1:, 0], ring[1:, 1]
    return float(np.sum(x * y2 - x2 * y) / 2.0)


def group_rings(rings: list[np.ndarray]) -> list[list[np.ndarray]]:
    """Nest rings into polygon parts (RingAssigner.java semantics):
    containment depth even → outer ring (one part each); odd → hole,
    assigned to the smallest containing outer.

    contains(i, j) tests ring j's lowest-leftmost VERTEX against ring i
    — a point of j itself, so sibling rings (which may surround the
    same interior region, e.g. a hole and an island inside it) never
    read as mutual containers.  A vertex exactly on ring i's boundary
    is the reference's own documented PIP ambiguity
    (PointInPolygon.java:17-19)."""
    n = len(rings)
    if n == 0:
        return []
    reps = []
    for r in rings:
        closed = r[:-1]
        i = int(np.lexsort((closed[:, 0], closed[:, 1]))[0])
        reps.append((float(closed[i, 0]), float(closed[i, 1])))
    xs = np.array([p[0] for p in reps])
    ys = np.array([p[1] for p in reps])
    contains = np.zeros((n, n), dtype=bool)
    for i, r in enumerate(rings):
        inside = pip.points_in_polygon(xs, ys, [r])
        for j in range(n):
            if i != j and inside[j]:
                contains[i, j] = True
    depth = contains.sum(axis=0)
    areas = [abs(signed_area(r)) for r in rings]
    parts: list[list[np.ndarray]] = []
    outer_part: dict[int, int] = {}
    for i in np.argsort(depth, kind="stable"):
        if depth[i] % 2 == 0:
            outer_part[i] = len(parts)
            parts.append([rings[i]])
        else:
            # smallest containing even-depth ring is the owner
            owners = [
                j for j in range(n) if contains[j, i] and depth[j] % 2 == 0
            ]
            owner = min(owners, key=lambda j: areas[j])
            parts[outer_part[owner]].append(rings[i])
    return parts
