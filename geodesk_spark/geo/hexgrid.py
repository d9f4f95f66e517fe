"""H3-style hexagonal cell encode over the imp plane.

The build target names "H3/S2 cells" as the index families; geo/tile.py
covers the quad-tile pyramid (GeoDesk's own TIP layout,
feature/store/TileIndexWalker.java), geo/curve.py the Z-order and
Hilbert (S2-style) clustering keys.  This module adds the H3-style
member: a pointy-top hexagonal grid in axial coordinates.  Hexagons
give isotropic neighborhoods (6 equidistant neighbors, no corner-touch
ambiguity) — the reason H3 uses them for geo aggregation joins.

A point maps to its hex via the standard fractional-axial → cube-round
pipeline.  Every rounding step is `floor(v + 0.5)` — NOT round() —
because numpy round is banker's while Spark/DuckDB round is
half-away-from-zero; floor(+0.5) is bit-identical IEEE in all three, so
the numpy kernel, the pure-Column builder, and the DuckDB oracle twin
agree exactly (same op order throughout).

Cell id packs (q, r) into one sort-friendly int64:
``(q + 2^20) << 21 | (r + 2^20)`` — valid for |q|,|r| < 2^20, i.e. any
hex size ≥ ~2.5k imps over the full ±2^31 plane.
"""

from __future__ import annotations

import math

import numpy as np

_C1 = math.sqrt(3.0) / 3.0  # axial q factor
_C3 = 1.0 / 3.0
_C23 = 2.0 / 3.0
_OFF = 1 << 20


def _cube_round(qf: np.ndarray, rf: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    yf = -qf - rf
    rx = np.floor(qf + 0.5)
    ry = np.floor(yf + 0.5)
    rz = np.floor(rf + 0.5)
    dx = np.abs(rx - qf)
    dy = np.abs(ry - yf)
    dz = np.abs(rz - rf)
    b1 = (dx > dy) & (dx > dz)
    b2 = dy > dz
    q = np.where(b1, -ry - rz, rx)
    r = np.where(~b1 & ~b2, -rx - ry, rz)
    return q.astype(np.int64), r.astype(np.int64)


def hex_cell(x: np.ndarray, y: np.ndarray, size: int) -> tuple[np.ndarray, np.ndarray]:
    """Axial (q, r) of the hex containing each imp point; `size` is the
    hex circumradius in imps."""
    xd = np.asarray(x, dtype=np.float64)
    yd = np.asarray(y, dtype=np.float64)
    qf = (xd * _C1 - yd * _C3) / float(size)
    rf = (yd * _C23) / float(size)
    return _cube_round(qf, rf)


def hex_cell_id(x: np.ndarray, y: np.ndarray, size: int) -> np.ndarray:
    q, r = hex_cell(x, y, size)
    return ((q + _OFF) << 21) | (r + _OFF)


def hex_center(q: np.ndarray, r: np.ndarray, size: int) -> tuple[np.ndarray, np.ndarray]:
    """Imp-plane center of hex (q, r) — inverse of hex_cell up to the
    cell boundary."""
    q = np.asarray(q, dtype=np.float64)
    r = np.asarray(r, dtype=np.float64)
    cx = float(size) * math.sqrt(3.0) * (q + r / 2.0)
    cy = float(size) * 1.5 * r
    return cx, cy


def hex_cell_cols(df, x_col: str, y_col: str, size: int, out: str = "hcell"):
    """Add `out` = packed hex cell id — pure Columns (JVM codegen, no
    UDF), same op order as hex_cell.  Built as narrow withColumn
    projections so the conditional cube-round doesn't duplicate
    subtrees."""
    from pyspark.sql import functions as F

    xd = F.col(x_col).cast("double")
    yd = F.col(y_col).cast("double")
    df = df.withColumn("_qf", (xd * F.lit(_C1) - yd * F.lit(_C3)) / F.lit(float(size)))
    df = df.withColumn("_rf", (yd * F.lit(_C23)) / F.lit(float(size)))
    df = df.withColumn("_yf", -F.col("_qf") - F.col("_rf"))
    df = df.withColumn("_rx", F.floor(F.col("_qf") + F.lit(0.5)))
    df = df.withColumn("_ry", F.floor(F.col("_yf") + F.lit(0.5)))
    df = df.withColumn("_rz", F.floor(F.col("_rf") + F.lit(0.5)))
    df = df.withColumn("_dx", F.abs(F.col("_rx").cast("double") - F.col("_qf")))
    df = df.withColumn("_dy", F.abs(F.col("_ry").cast("double") - F.col("_yf")))
    df = df.withColumn("_dz", F.abs(F.col("_rz").cast("double") - F.col("_rf")))
    b1 = (F.col("_dx") > F.col("_dy")) & (F.col("_dx") > F.col("_dz"))
    b2 = F.col("_dy") > F.col("_dz")
    df = df.withColumn(
        "_hq", F.when(b1, -F.col("_ry") - F.col("_rz")).otherwise(F.col("_rx"))
    )
    df = df.withColumn(
        "_hr", F.when(~b1 & ~b2, -F.col("_rx") - F.col("_ry")).otherwise(F.col("_rz"))
    )
    df = df.withColumn(
        out,
        F.shiftleft(F.col("_hq").cast("long") + F.lit(_OFF), 21).bitwiseOR(
            F.col("_hr").cast("long") + F.lit(_OFF)
        ),
    )
    return df.drop("_qf", "_rf", "_yf", "_rx", "_ry", "_rz", "_dx", "_dy", "_dz", "_hq", "_hr")


def hex_sql(x_sql: str, y_sql: str, size: int) -> tuple[str, str]:
    """DuckDB twin: (ctes, final_select) over a `__hex_input__` CTE, same
    op order as hex_cell/hex_cell_cols.  final_select yields
    `* exclude(...) , hcell`."""
    ctes = (
        f"hg0 as (select *, "
        f"((({x_sql}) * {_C1!r}) - (({y_sql}) * {_C3!r})) / {float(size)!r} as qf, "
        f"(({y_sql}) * {_C23!r}) / {float(size)!r} as rf "
        f"from __hex_input__), "
        f"hg1 as (select *, -qf - rf as yf from hg0), "
        f"hg2 as (select *, "
        f"floor(qf + 0.5) as rx, floor(yf + 0.5) as ry, floor(rf + 0.5) as rz "
        f"from hg1), "
        f"hg3 as (select *, "
        f"abs(rx - qf) as dx, abs(ry - yf) as dy, abs(rz - rf) as dz from hg2), "
        f"hg4 as (select *, "
        f"case when dx > dy and dx > dz then -ry - rz else rx end as hq, "
        f"case when not (dx > dy and dx > dz) and not (dy > dz) then -rx - ry "
        f"else rz end as hr from hg3)"
    )
    final = (
        "select * exclude (qf, rf, yf, rx, ry, rz, dx, dy, dz, hq, hr), "
        f"((cast(hq as bigint) + {_OFF}) << 21) | (cast(hr as bigint) + {_OFF}) as hcell "
        "from hg4"
    )
    return ctes, final
