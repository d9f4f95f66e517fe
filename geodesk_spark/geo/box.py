"""Box algebra — int32 bounding boxes with the reference's exact
semantics (geom/Box.java, geom/Bounds.java).

A Box is (minx, miny, maxx, maxy) in imps.  Key behaviors ported
bit-for-bit:

- empty/null box = all-MAX_VALUE mins, all-MIN_VALUE maxes
  (Box.java:63-70); any box with maxY < minY behaves as empty.
- ANTIMERIDIAN boxes: minX > maxX (with maxY ≥ minY) means the box
  wraps the 180° meridian; contains() switches the x-test to a
  disjunction (Bounds.java:44-50, Box.java:16-19).
- intersection clamps to the empty box when the ranges do not overlap
  (Box.java:205-223); `smaller` compares double areas (Box.java:225-230).
- buffer() uses overflow-trimmed y arithmetic but lets x wrap like
  Java ints (Box.java:284-297, trimmedAdd/Subtract:256-280) — x wraps
  THROUGH the antimeridian by design.

The planner (spatial_join, tiling, Features.in_bbox) consumes these
driver-side; the same tests (ported from BoxTest.java) pin behavior.
"""

from __future__ import annotations

from dataclasses import dataclass

I32_MIN = -(1 << 31)
I32_MAX = (1 << 31) - 1


def _wrap32(v: int) -> int:
    return ((v + (1 << 31)) & 0xFFFFFFFF) - (1 << 31)


def _trimmed_add(x: int, y: int) -> int:
    r = x + y
    if r > I32_MAX:
        return I32_MAX
    if r < I32_MIN:
        return I32_MIN
    return r


def _trimmed_subtract(x: int, y: int) -> int:
    return _trimmed_add(x, -y)


@dataclass(frozen=True)
class Box:
    minx: int = I32_MAX
    miny: int = I32_MAX
    maxx: int = I32_MIN
    maxy: int = I32_MIN

    @staticmethod
    def empty() -> "Box":
        return Box()

    @staticmethod
    def of_world() -> "Box":
        return Box(I32_MIN, I32_MIN, I32_MAX, I32_MAX)

    @staticmethod
    def at_xy(x: int, y: int) -> "Box":
        return Box(x, y, x, y)

    @staticmethod
    def imps_around_xy(d: int, x: int, y: int) -> "Box":
        """Box.java:421-424: x wraps, y trims."""
        return Box(
            _wrap32(x - d), _trimmed_subtract(y, d), _wrap32(x + d), _trimmed_add(y, d)
        )

    @staticmethod
    def of_wsen(west: float, south: float, east: float, north: float) -> "Box":
        from geodesk_spark.geo import mercator

        return Box(
            int(mercator.x_from_lon(west)[()]),
            int(mercator.y_from_lat(south)[()]),
            int(mercator.x_from_lon(east)[()]),
            int(mercator.y_from_lat(north)[()]),
        )

    @staticmethod
    def meters_around(meters: float, lon: float, lat: float) -> "Box":
        from geodesk_spark.geo import mercator

        x = int(mercator.x_from_lon(lon)[()])
        y = int(mercator.y_from_lat(lat)[()])
        d = int(mercator.delta_from_meters(meters, y)[()])
        return Box.imps_around_xy(d, x, y)

    @property
    def is_empty(self) -> bool:
        return self.maxy < self.miny

    @property
    def wraps_antimeridian(self) -> bool:
        return self.minx > self.maxx and not self.is_empty

    def width(self) -> int:
        """Bounds.java:61-64: unsigned-wrapped long width, 0 when empty —
        an antimeridian box's width is the wrapped span; the world is 2^32."""
        if self.maxy < self.miny:
            return 0
        return ((self.maxx - self.minx) & 0xFFFFFFFF) + 1

    def height(self) -> int:
        if self.maxy < self.miny:
            return 0
        return self.maxy - self.miny + 1

    def contains_xy(self, x: int, y: int) -> bool:
        """Bounds.java:44-50 — disjunctive x-test when wrapping."""
        if self.maxx < self.minx:
            return (x >= self.minx or x <= self.maxx) and self.miny <= y <= self.maxy
        return self.minx <= x <= self.maxx and self.miny <= y <= self.maxy

    def contains_box(self, o: "Box") -> bool:
        """Plain-comparison form — NOT wrap-aware, matching the
        reference (Bounds.java:53-57; its docs call antimeridian
        behavior undefined for box-box ops).  Only contains_xy handles
        the wrap (Bounds.java:44-50)."""
        return (
            o.minx >= self.minx
            and o.maxx <= self.maxx
            and o.miny >= self.miny
            and o.maxy <= self.maxy
        )

    def intersects(self, o: "Box") -> bool:
        """Bounds.java:36-42 — plain comparisons; box-box ops are
        wrap-unaware in the reference too (see contains_box note)."""
        return not (
            o.minx > self.maxx
            or o.maxx < self.minx
            or o.miny > self.maxy
            or o.maxy < self.miny
        )

    def intersection(self, o: "Box") -> "Box":
        """Box.java:215-223: empty box when ranges don't overlap."""
        x1 = max(self.minx, o.minx)
        y1 = max(self.miny, o.miny)
        x2 = min(self.maxx, o.maxx)
        y2 = min(self.maxy, o.maxy)
        if x2 < x1 or y2 < y1:
            return Box()
        return Box(x1, y1, x2, y2)

    @staticmethod
    def smaller(a: "Box", b: "Box") -> "Box":
        """Box.java:225-230: compare double areas."""
        area_a = float(a.width()) * a.height()
        area_b = float(b.width()) * b.height()
        return a if area_a < area_b else b

    def expand_to_include_xy(self, x: int, y: int) -> "Box":
        return Box(
            min(self.minx, x), min(self.miny, y), max(self.maxx, x), max(self.maxy, y)
        )

    def expand_to_include(self, o: "Box") -> "Box":
        return Box(
            min(self.minx, o.minx),
            min(self.miny, o.miny),
            max(self.maxx, o.maxx),
            max(self.maxy, o.maxy),
        )

    def buffer(self, b: int) -> "Box":
        """Box.java:284-297: x wraps (Java int overflow), y trims."""
        minx = _wrap32(self.minx - b)
        maxx = _wrap32(self.maxx + b)
        if b >= 0:
            miny = _trimmed_subtract(self.miny, b)
            maxy = _trimmed_add(self.maxy, b)
        else:
            miny = _trimmed_add(self.miny, -b)
            maxy = _trimmed_subtract(self.maxy, -b)
        return Box(minx, miny, maxx, maxy)
