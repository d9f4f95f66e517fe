"""Integer pseudo-Mercator ("imp") projection.

Semantics match the reference's ``geom/Mercator.java`` exactly:

- the world is projected onto a square plane ``MAP_WIDTH`` units wide
  (``Mercator.java:45``: ``4_294_967_294.9999``) so that x/y fit a
  signed int32 and a coordinate pair fits one int64;
- ``x = round(MAP_WIDTH * lon / 360)``          (``Mercator.java:66-73``)
- ``y = round(ln(tan((lat+90)*pi/360)) * MAP_WIDTH/2pi)`` with latitude
  clamped to [MIN_LAT, MAX_LAT]                 (``Mercator.java:94-114``)
- Java ``Math.round`` is ``floor(v + 0.5)`` — NOT half-away-from-zero.
  All kernels here use ``floor(v + 0.5)`` so negative half-way cases
  match the JVM bit-for-bit.

Two implementations are provided for each function:

- a vectorized numpy kernel (used by pandas UDFs and by the slow
  golden-reference checks), and
- a Spark ``Column`` builder using only built-in functions, so the
  projection runs JVM-side inside whole-stage codegen with no Python
  round-trip at all.  Both produce identical int32 results (verified
  by tests against the reference's golden numbers,
  ``geom/MercatorTest.java``).
"""

from __future__ import annotations

import math

import numpy as np

MAP_WIDTH = 4_294_967_294.9999  # Mercator.java:45
EARTH_CIRCUMFERENCE = 40_075_016.68558  # meters at the equator, Mercator.java:51
MIN_LAT = -85.05112878  # Mercator.java:54
MAX_LAT = 85.051128776  # Mercator.java:55

I32_MIN = -(1 << 31)
I32_MAX = (1 << 31) - 1


def _java_round(v: np.ndarray) -> np.ndarray:
    # Java Math.round(double) == floor(v + 0.5) as long.
    return np.floor(v + 0.5).astype(np.int64)


def x_from_lon(lon) -> np.ndarray:
    """lon degrees -> imp x (int32).  Mercator.java:66-73."""
    lon = np.asarray(lon, dtype=np.float64)
    if np.any((lon < -180) | (lon > 180)):
        raise ValueError("Longitude must be in range -180 to 180")
    return _java_round(MAP_WIDTH * lon / 360).astype(np.int32)


def y_from_lat(lat) -> np.ndarray:
    """lat degrees -> imp y (int32), clamped to +/-85.051128…

    Mercator.java:94-114 (clamp), :108-110 (formula).
    """
    lat = np.asarray(lat, dtype=np.float64)
    if np.any((lat < -90) | (lat > 90)):
        raise ValueError("Latitude must be in range -90 to 90")
    lat = np.clip(lat, MIN_LAT, MAX_LAT)
    v = np.log(np.tan((lat + 90) * math.pi / 360)) * (MAP_WIDTH / 2 / math.pi)
    return _java_round(v).astype(np.int32)


def lon_from_x(x) -> np.ndarray:
    """imp x -> lon degrees.  Mercator.java:138-141."""
    return np.asarray(x, dtype=np.float64) * 360 / MAP_WIDTH


def lat_from_y(y) -> np.ndarray:
    """imp y -> lat degrees.  Mercator.java:158-163."""
    y = np.asarray(y, dtype=np.float64)
    return np.arctan(np.exp(y * math.pi * 2 / MAP_WIDTH)) * 360 / math.pi - 90


def lon_precision7_from_x(x) -> np.ndarray:
    """Mercator.java:150-154 — lonFromX rounded to 7 decimals."""
    return _java_round(lon_from_x(x) * 1e7) / 1e7


def lat_precision7_from_y(y) -> np.ndarray:
    """Mercator.java:168-172."""
    return _java_round(lat_from_y(y) * 1e7) / 1e7


# ---------------------------------------------------------------------------
# Deterministic exp — bit-identical across numpy / Spark / DuckDB.
#
# libm exp() differs between engines and BUILDS of the same engine (the
# r01/r03 box_area_m2 driver-hash reds: green against local DuckDB, red
# against the driver's).  Every op below — floor, +, -, *, /, ldexp —
# is exactly specified by IEEE 754, so evaluating the SAME op sequence
# on any engine yields the SAME bits.  Classic fdlibm shape: k = round
# (t/ln2), Cody–Waite-exact r = t - k·ln2, degree-13 Taylor Horner
# (|r| ≤ ln2/2 → remainder r^14/14! < 5e-18), scale by 2^k.
# Accuracy vs true exp ~1-2 ulp; determinism exact.  Domain |t| ≤ 700
# (imp latitudes give |t| ≤ π).
# ---------------------------------------------------------------------------

_LN2_HI = 6.93147180369123816490e-01  # fdlibm split: k*LN2_HI exact, |k| < 2^20
_LN2_LO = 1.90821492927058770002e-10
_INV_LN2 = 1.4426950408889634074
# Horner coefficients for exp(r): 1/13!, 1/12!, …, 1/1!, 1/0!
_EXP_C = [1.0 / math.factorial(i) for i in range(13, -1, -1)]


def det_exp(t) -> np.ndarray:
    """exp(t) via the deterministic kernel above (numpy form)."""
    t = np.asarray(t, dtype=np.float64)
    k = np.floor(t * _INV_LN2 + 0.5)
    r = (t - k * _LN2_HI) - k * _LN2_LO
    p = np.full_like(r, _EXP_C[0])
    for c in _EXP_C[1:]:
        p = p * r + c
    return np.ldexp(p, k.astype(np.int32))


# cosh is EVEN and the imp-latitude domain is |t| ≤ π, so no range
# reduction at all: cosh(t) = Σ t^(2n)/(2n)! evaluated as a degree-13
# Horner polynomial in s = t² (remainder π^28/28! ≈ 2.7e-16; positive
# decreasing terms keep evaluation error ~1 ulp).  Only + and × — a
# ~10× smaller expression tree than exp-based cosh, which matters for
# Spark whole-stage-codegen method-size limits on hot paths.
_COSH_C = [1.0 / math.factorial(2 * i) for i in range(13, -1, -1)]


def det_cosh(t) -> np.ndarray:
    """cosh(t) for |t| ≤ ~3.2, bit-identical across engines (numpy)."""
    t = np.asarray(t, dtype=np.float64)
    s = t * t
    p = np.full_like(s, _COSH_C[0])
    for c in _COSH_C[1:]:
        p = p * s + c
    return p


def det_cosh_col(t_col):
    """Spark Column twin of det_cosh — same op sequence."""
    F = _F()
    s = t_col * t_col
    p = F.lit(_COSH_C[0])
    for c in _COSH_C[1:]:
        p = p * s + F.lit(c)
    return p


def det_exp_col(t_col):
    """Spark Column twin of det_exp — same op sequence, pure codegen
    (floor/shiftleft/fma-free arithmetic; no libm exp)."""
    F = _F()
    k = F.floor(t_col * _INV_LN2 + 0.5)  # long
    kd = k.cast("double")
    r = (t_col - kd * _LN2_HI) - kd * _LN2_LO
    p = F.lit(_EXP_C[0])
    for c in _EXP_C[1:]:
        p = p * r + F.lit(c)
    # p * 2^k == ldexp(p, k): scaling by an exact power of two is exact.
    # Shift by |k| so the unmultiplied branch is still well-defined
    # (vectorized engines may evaluate both CASE arms).
    two_abs = F.call_function(
        "shiftleft", F.lit(1).cast("long"), F.abs(k).cast("int")
    ).cast("double")
    return F.when(k >= 0, p * two_abs).otherwise(p / two_abs)


def det_exp_sql(t: str) -> str:
    """DuckDB SQL twin of det_exp over expression ``t`` (keep ``t`` short
    — it is textually repeated; bind complex exprs to a CTE column
    first).  Identical op order to the numpy/Column forms."""
    k = f"floor(({t}) * {_INV_LN2!r} + 0.5)"
    r = f"((({t}) - {k} * {_LN2_HI!r}) - {k} * {_LN2_LO!r})"
    p = repr(_EXP_C[0])
    for c in _EXP_C[1:]:
        p = f"({p} * {r} + {c!r})"
    two_abs = f"cast((1::bigint << cast(abs({k}) as int)) as double)"
    return f"(case when {k} >= 0 then {p} * {two_abs} else {p} / {two_abs} end)"


def det_cosh_sql(t: str) -> str:
    """DuckDB SQL twin of det_cosh over expression ``t`` (repeated
    textually 2×13 times — bind complex exprs to a CTE column first)."""
    s = f"(({t}) * ({t}))"
    p = repr(_COSH_C[0])
    for c in _COSH_C[1:]:
        p = f"({p} * {s} + {c!r})"
    return p


def scale_sql(y: str) -> str:
    """DuckDB SQL twin of scale() over imp-y expression ``y``."""
    return det_cosh_sql(f"(cast({y} as double) * 2 * pi() / {MAP_WIDTH!r})")


def scale(y) -> np.ndarray:
    """Mercator scale factor at projected latitude y.  Mercator.java:128-131.

    cosh computed with det_cosh so numpy, Spark SQL, and DuckDB all
    produce bit-identical doubles (oracle hash-parity across engine
    builds; deviation from libm cosh ≤ ~2 ulp)."""
    t = np.asarray(y, dtype=np.float64) * 2 * math.pi / MAP_WIDTH
    return det_cosh(t)


def meters_at_y(y) -> np.ndarray:
    """Meters per imp at projected latitude y.  Mercator.java:176-179."""
    return EARTH_CIRCUMFERENCE / MAP_WIDTH / scale(y)


def delta_from_meters(meters, at_y) -> np.ndarray:
    """Meters -> imps at projected latitude at_y.  Mercator.java:241-245."""
    return np.asarray(meters, dtype=np.float64) * MAP_WIDTH / EARTH_CIRCUMFERENCE * scale(at_y)


def distance(x1, y1, x2, y2) -> np.ndarray:
    """Euclidean distance in meters between imp points (short distances).

    Mercator.java:194-201: hypot in imps scaled at the midpoint latitude.
    """
    x1 = np.asarray(x1, dtype=np.float64)
    y1 = np.asarray(y1, dtype=np.float64)
    x2 = np.asarray(x2, dtype=np.float64)
    y2 = np.asarray(y2, dtype=np.float64)
    # sqrt(dx²+dy²), matching Mercator.java:197-198 op-for-op (not hypot).
    d = np.sqrt((x1 - x2) * (x1 - x2) + (y1 - y2) * (y1 - y2))
    return d * EARTH_CIRCUMFERENCE / MAP_WIDTH / scale((y1 + y2) / 2)


def ring_area_m2(xs: np.ndarray, ys: np.ndarray) -> float:
    """Area in m² of a closed ring (imp coords), shoelace × scale² at the
    centroid latitude.  Mercator.java:256-264 (JTS area × meters-at-Y²).
    """
    xs = np.asarray(xs, dtype=np.float64)
    ys = np.asarray(ys, dtype=np.float64)
    a2 = np.sum(xs[:-1] * ys[1:] - xs[1:] * ys[:-1])
    area = abs(a2) / 2.0
    if area == 0:
        return 0.0
    cy = np.mean(ys[:-1])
    s = EARTH_CIRCUMFERENCE / MAP_WIDTH / scale(cy)
    return float(area * s * s)


def polyline_length_m(xs: np.ndarray, ys: np.ndarray) -> float:
    """Length in meters of a polyline (imp coords): per-segment Euclidean
    distance scaled at each segment's mid-latitude.
    StoredWay.java:189-209 + Mercator.distance.
    """
    if len(xs) < 2:
        return 0.0
    return float(np.sum(distance(xs[:-1], ys[:-1], xs[1:], ys[1:])))


def project_rings(rings: list[np.ndarray]) -> list[np.ndarray]:
    """WGS84 lon/lat rings → imp rings, in the reference's geometry
    transform semantics (Mercator.java:303-324: each ordinate replaced
    by the ROUNDED int xFromLon/yFromLat, stored back as double)."""
    out = []
    for r in rings:
        r = np.asarray(r, dtype=np.float64)
        out.append(
            np.stack(
                [x_from_lon(r[:, 0]).astype(np.float64),
                 y_from_lat(r[:, 1]).astype(np.float64)],
                axis=1,
            )
        )
    return out


def unproject_rings(rings: list[np.ndarray]) -> list[np.ndarray]:
    """imp rings → WGS84 lon/lat rings (Mercator.java:332-352:
    lonFromX/latFromY, no rounding)."""
    out = []
    for r in rings:
        r = np.asarray(r, dtype=np.float64)
        out.append(np.stack([lon_from_x(r[:, 0]), lat_from_y(r[:, 1])], axis=1))
    return out


def expand_envelope(
    minx: float, miny: float, maxx: float, maxy: float, meters: float
) -> tuple[float, float, float, float]:
    """Grow an imp envelope by ``meters`` on every side, converted at the
    envelope's mid-latitude (Mercator.java:266-271: env.expandBy(
    deltaFromMeters(meters, (maxY+minY)/2)))."""
    d = float(delta_from_meters(meters, (maxy + miny) / 2)[()])
    return (minx - d, miny - d, maxx + d, maxy + d)


def envelope(lon1: float, lat1: float, lon2: float, lat2: float) -> tuple[int, int, int, int]:
    """(minx, miny, maxx, maxy) imp envelope of two lon/lat corners
    (Mercator.java:273-277 — JTS Envelope normalizes the corner order)."""
    x1, x2 = int(x_from_lon(lon1)[()]), int(x_from_lon(lon2)[()])
    y1, y2 = int(y_from_lat(lat1)[()]), int(y_from_lat(lat2)[()])
    return (min(x1, x2), min(y1, y2), max(x1, x2), max(y1, y2))


# ---------------------------------------------------------------------------
# Spark Column builders — same arithmetic, JVM-side (no Python round-trip).
# ---------------------------------------------------------------------------

def _F():
    from pyspark.sql import functions as F

    return F


def x_from_lon_col(lon_col):
    """Column: lon degrees -> imp x (int).  floor(v+0.5) == Java Math.round."""
    F = _F()
    return F.floor(F.lit(MAP_WIDTH) * lon_col / 360 + 0.5).cast("int")


def y_from_lat_col(lat_col):
    """Column: lat degrees -> imp y (int), with the reference clamp."""
    F = _F()
    lat = F.least(F.greatest(lat_col, F.lit(MIN_LAT)), F.lit(MAX_LAT))
    v = F.log(F.tan((lat + 90) * math.pi / 360)) * (MAP_WIDTH / 2 / math.pi)
    return F.floor(v + 0.5).cast("int")


def lon_from_x_col(x_col):
    return x_col.cast("double") * 360 / MAP_WIDTH


def lat_from_y_col(y_col):
    F = _F()
    return F.atan(F.exp(y_col.cast("double") * (2 * math.pi / MAP_WIDTH))) * (360 / math.pi) - 90


def scale_col(y_col):
    # cosh via det_cosh: bit-identical to scale()/scale_sql().  The t op
    # order ((y·2)·π)/W matches the numpy and SQL twins term for term.
    t = y_col.cast("double") * 2 * math.pi / MAP_WIDTH
    return det_cosh_col(t)


def distance_col(x1, y1, x2, y2):
    """Column: meters between imp points — Mercator.java:194-201."""
    F = _F()
    dx = x1.cast("double") - x2.cast("double")
    dy = y1.cast("double") - y2.cast("double")
    d = F.sqrt(dx * dx + dy * dy)
    return d * EARTH_CIRCUMFERENCE / MAP_WIDTH / scale_col((y1.cast("double") + y2.cast("double")) / 2)


def delta_from_meters_col(meters_col, at_y_col):
    return meters_col * MAP_WIDTH / EARTH_CIRCUMFERENCE * scale_col(at_y_col)


def expand_envelope_cols(minx, miny, maxx, maxy, meters_col):
    """Column twin of expand_envelope: 4 expanded bbox Columns, delta
    taken at each row's own mid-latitude (Mercator.java:266-271)."""
    d = delta_from_meters_col(meters_col, (maxy.cast("double") + miny.cast("double")) / 2)
    return (
        minx.cast("double") - d,
        miny.cast("double") - d,
        maxx.cast("double") + d,
        maxy.cast("double") + d,
    )
