"""Polygon assembly from unordered way segments.

Re-expresses the reference's multipolygon construction
(feature/polygon/PolygonBuilder.java:162-250, RingBuilder.java,
RingAssigner.java): a relation's member ways arrive as coordinate runs
in arbitrary order and direction; rings are built by chaining runs at
exactly-equal integer endpoints, then nested rings are grouped into
(outer, holes…) parts by containment depth.

Fidelity notes:
- Chaining BACKTRACKS at multi-candidate joints (two rings touching at
  a shared vertex give 4 run endpoints at one coordinate): candidates
  that close the current chain back to its start are tried first, and a
  dead end unwinds instead of welding two rings into a figure-eight —
  the reference's RingBuilder.build walks TENTATIVE chains and closes a
  ring exactly when it re-meets its own chain (RingBuilder.java:196-281).
- Runs that cannot chain into any closed ring are DANGLING: the
  reference marks them and keeps the rings that did form
  (Segment.status DANGLING, RingBuilder.java:246-249; PolygonBuilder
  returns an empty geometry only when NO outer ring forms,
  PolygonBuilder.java:208-214).  `try_assemble_rings` mirrors that;
  `assemble_rings` keeps the strict raising behavior for callers that
  demand complete input.

Pure-numpy driver kernels — the Spark operator
(operators/polygons.assemble_relation_polygons) calls these inside
applyInPandas per relation group, so the work distributes by rel_id.
"""

from __future__ import annotations

import numpy as np

from geodesk_spark.geo import pip


class RingAssemblyError(ValueError):
    """A member run cannot be chained into any closed ring (dangling
    endpoint) — the reference marks such segments DANGLING
    (RingBuilder.java:246-249) and builds what it can."""


_BACKTRACK_BUDGET = 100_000  # expansion cap: degenerate inputs stay bounded


def try_assemble_rings(runs: list[np.ndarray]) -> tuple[list[np.ndarray], int]:
    """Chain coordinate runs into closed rings by exact endpoint match.

    Each run is an (k,2) array of integer imp coordinates.  A run whose
    first point equals its last is already a ring.  Open runs are joined
    end-to-end (reversing as needed) with backtracking at ambiguous
    joints.  Returns (rings, n_dangling): runs that close nothing are
    counted, not fatal — RingBuilder.build semantics.
    """
    rings: list[np.ndarray] = []
    open_runs: list[np.ndarray] = []
    n_dangling = 0
    for r in runs:
        arr = np.asarray(r, dtype=np.float64)
        if len(arr) < 2:
            continue
        if np.array_equal(arr[0], arr[-1]):
            if len(arr) >= 4:
                rings.append(arr)
            else:
                n_dangling += 1  # defective: <4-point ring (RingBuilder.java:64)
        else:
            open_runs.append(arr)

    def key(pt) -> tuple:
        return (float(pt[0]), float(pt[1]))

    index: dict[tuple, list[tuple[int, bool]]] = {}
    for i, r in enumerate(open_runs):
        index.setdefault(key(r[0]), []).append((i, True))
        index.setdefault(key(r[-1]), []).append((i, False))

    used = [False] * len(open_runs)
    budget = [_BACKTRACK_BUDGET]

    def far(j: int, forward: bool) -> tuple:
        r = open_runs[j]
        return key(r[-1] if forward else r[0])

    def extend(chain: list[tuple[int, bool]], start: tuple, cur: tuple) -> bool:
        """Iterative backtracking DFS (an explicit frame stack): the
        recursive form hit Python's recursion limit for rings chained
        from ~1000+ member runs — common for coastlines and large admin
        boundaries — crashing the task instead of taking the tolerated-
        dangling path (r03 review).  Candidates that close the chain
        back to start are tried first — at a 4-endpoint joint (two
        touching rings) this picks "my" ring first."""
        if cur == start:
            return True

        def cands_for(c: tuple) -> list[tuple[int, bool]]:
            cs = [(j, fwd) for j, fwd in index.get(c, ()) if not used[j]]
            cs.sort(key=lambda x: far(x[0], x[1]) != start)
            return cs

        stack: list[list] = [[cands_for(cur), 0]]
        while stack:
            frame = stack[-1]
            cands, k = frame
            if k < len(cands) and budget[0] > 0:
                frame[1] = k + 1
                budget[0] -= 1
                j, fwd = cands[k]
                used[j] = True
                chain.append((j, fwd))
                nxt = far(j, fwd)
                if nxt == start:
                    return True
                stack.append([cands_for(nxt), 0])
            else:
                stack.pop()
                if stack:
                    # undo the edge that led INTO the popped frame (the
                    # base frame's incoming edge belongs to the caller)
                    pj, _pf = chain.pop()
                    used[pj] = False
        return False

    for i in range(len(open_runs)):
        if used[i]:
            continue
        used[i] = True
        chain = [(i, True)]
        if extend(chain, key(open_runs[i][0]), key(open_runs[i][-1])):
            parts = [open_runs[j] if fwd else open_runs[j][::-1] for j, fwd in chain]
            ring = np.vstack([parts[0]] + [p[1:] for p in parts[1:]])
            if not np.array_equal(ring[0], ring[-1]):
                ring = np.vstack([ring, ring[:1]])
            if len(ring) >= 4:
                rings.append(ring)
            else:
                n_dangling += 1
        else:
            used[i] = False
            n_dangling += 1
    return rings, n_dangling


def assemble_rings(runs: list[np.ndarray]) -> list[np.ndarray]:
    """Strict variant: raises RingAssemblyError on any dangling run."""
    rings, n_dangling = try_assemble_rings(runs)
    if n_dangling:
        raise RingAssemblyError(f"{n_dangling} run(s) left dangling")
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
            if not owners:
                # mutually-crossing (invalid) rings can read as depth-odd
                # with NO even-depth container: degrade to an own part
                # like the rest of the fixup tier instead of crashing the
                # task on min() of an empty list (r03 review)
                outer_part[i] = len(parts)
                parts.append([rings[i]])
                continue
            owner = min(owners, key=lambda j: areas[j])
            parts[outer_part[owner]].append(rings[i])
    return parts


def holes_overlap(part: list[np.ndarray]) -> bool:
    """True when any two holes of a part have intersecting bboxes —
    the reference's trigger for merging holes through buffer(0)
    (PolygonBuilder.ringsOverlap, PolygonBuilder.java:86-93)."""
    holes = part[1:]
    boxes = [pip.ring_bbox(h) for h in holes]
    for i in range(len(boxes)):
        for j in range(i + 1, len(boxes)):
            a, b = boxes[i], boxes[j]
            if a[0] <= b[2] and a[2] >= b[0] and a[1] <= b[3] and a[3] >= b[1]:
                return True
    return False


def points_in_parts(cx, cy, parts: list[list[np.ndarray]]) -> np.ndarray:
    """Membership against grouped parts with union-of-holes semantics:
    inside = any part where (in outer) and not (in ANY hole).

    For point membership this equals the reference's buffer(0) merge of
    overlapping holes (PolygonBuilder.java:105-126): the union of hole
    regions is exactly "inside at least one hole", where plain XOR
    composition would wrongly re-include the holes' overlap region.
    Falls back to XOR behavior when holes are disjoint (identical
    results there)."""
    cx = np.asarray(cx, dtype=np.float64)
    cy = np.asarray(cy, dtype=np.float64)
    out = np.zeros(len(cx), dtype=bool)
    for part in parts:
        inside = pip.points_in_ring(cx, cy, part[0])
        if len(part) > 1:
            in_hole = np.zeros(len(cx), dtype=bool)
            for h in part[1:]:
                in_hole |= pip.points_in_ring(cx, cy, h)
            inside &= ~in_hole
        out |= inside
    return out
