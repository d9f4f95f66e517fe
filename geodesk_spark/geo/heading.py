"""Compass heading (geom/Heading.java:20-60).

The reference's Heading enum maps an azimuth to the 8 compass points
(N, NE, E, SE, S, SW, W, NW), each owning a 45° sector centered on its
axis.  Azimuth here is degrees clockwise from north in imp space:
atan2(dx, dy) — north is +y.  Pure Column arithmetic (JVM, SQL-twin
exact); no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

POINTS = ["N", "NE", "E", "SE", "S", "SW", "W", "NW"]


def azimuth_deg_col(dx: Column, dy: Column) -> Column:
    """Degrees clockwise from north, in [0, 360)."""
    deg = F.degrees(F.atan2(dx.cast("double"), dy.cast("double")))
    return (deg + F.lit(360.0)) % F.lit(360.0)


def heading_col(dx: Column, dy: Column) -> Column:
    """8-point compass name for the (dx, dy) direction; sector index =
    floor((azimuth + 22.5) / 45) mod 8 (Heading.java sector ownership)."""
    idx = F.floor((azimuth_deg_col(dx, dy) + F.lit(22.5)) / F.lit(45.0)).cast("int") % F.lit(8)
    mapping = F.array(*[F.lit(p) for p in POINTS])
    return F.element_at(mapping, idx + 1)


def heading_sql(dx_sql: str, dy_sql: str) -> str:
    """DuckDB twin of heading_col, same op order."""
    az = f"((degrees(atan2(cast({dx_sql} as double), cast({dy_sql} as double))) + 360.0) % 360.0)"
    idx = f"(cast(floor(({az} + 22.5) / 45.0) as int) % 8)"
    arr = "['N','NE','E','SE','S','SW','W','NW']"
    return f"({arr}[{idx} + 1])"
