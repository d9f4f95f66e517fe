"""Great-circle (geodesic) distance from mercator imps, libm-free.

The reference's ``distance()`` is PLANAR: Euclidean imps scaled at the
segment mid-latitude (Mercator.java:256-264; geo/mercator.distance) —
exact GeoDesk parity, but it degrades on continent-scale separations
where the local scale factor stops being representative.  This module
adds the true sphere geodesic as an engine extension, built from the
same deterministic kernel set as the S2 transform so the result is
bit-identical on numpy, Spark and DuckDB:

- unit-sphere vectors via the Gudermannian (s2cell.sphere_from_imps:
  det_sincos of longitude imps with exact quadrant reduction,
  det_sinh/det_cosh of the mercator parameter — no atan/exp/sin libm);
- chord length between the two unit vectors (pure +/×/sqrt);
- central angle by the numerically-stable half-chord form
  θ = 2·asin(c/2), with asin(h) = atan2(h, √(1−h²)) on
  detmath.det_atan2 — exact near 0 where acos(dot) loses 8 digits;
- meters = θ · R with R = EARTH_CIRCUMFERENCE / 2π (one host literal).

All Column math is whole-stage-codegen (no UDF); the SQL twin binds
every intermediate to a CTE column in the same op order.
"""

from __future__ import annotations

import math

import numpy as np

from geodesk_spark.geo import detmath, mercator
from geodesk_spark.geo.s2cell import (
    IMP_TO_RAD,
    _COS_C,
    _Q_HALF,
    _Q_STEP,
    _SIN_C,
    _SINH_C,
    _horner_col,
    _horner_sql,
    sphere_from_imps,
)

# meters per radian of central angle (2R = C/π folded into ONE constant
# so the final multiply is a single rounding on every engine)
_M_PER_2RAD = mercator.EARTH_CIRCUMFERENCE / (2.0 * math.pi) * 2.0


def great_circle_m(x1, y1, x2, y2) -> np.ndarray:
    """Geodesic meters between imp points (numpy form)."""
    ax, ay, az = sphere_from_imps(x1, y1)
    bx, by, bz = sphere_from_imps(x2, y2)
    dx, dy, dz = ax - bx, ay - by, az - bz
    h = np.sqrt((dx * dx + dy * dy) + dz * dz) * 0.5
    w = np.sqrt(np.maximum(1.0 - h * h, 0.0))
    return detmath.det_atan2(h, w) * _M_PER_2RAD


def _sphere_cols(df, x_col, y_col, tag: str):
    """Add ``{tag}sx/{tag}sy/{tag}sz`` unit-sphere columns — the
    longitude/Gudermannian ladder of s2cell.s2_cell_cols with
    per-call-unique temp names so two points fit in one frame."""
    from pyspark.sql import functions as F

    t = tag
    xd = x_col.cast("double")
    q = F.floor((xd + F.lit(_Q_HALF)) / F.lit(_Q_STEP)).cast("double")
    df = df.withColumn(t + "r", (xd - q * F.lit(_Q_STEP)) * F.lit(IMP_TO_RAD))
    df = df.withColumn(t + "m", ((q.cast("long") + F.lit(4)) % 4))
    df = df.withColumn(t + "s", F.col(t + "r") * F.col(t + "r"))
    df = df.withColumn(t + "sr", F.col(t + "r") * _horner_col(F.col(t + "s"), _SIN_C))
    df = df.withColumn(t + "cr", _horner_col(F.col(t + "s"), _COS_C))
    m = F.col(t + "m")
    df = df.withColumn(
        t + "sl",
        F.when(m == 0, F.col(t + "sr"))
        .when(m == 1, F.col(t + "cr"))
        .when(m == 2, -F.col(t + "sr"))
        .otherwise(-F.col(t + "cr")),
    )
    df = df.withColumn(
        t + "cl",
        F.when(m == 0, F.col(t + "cr"))
        .when(m == 1, -F.col(t + "sr"))
        .when(m == 2, -F.col(t + "cr"))
        .otherwise(F.col(t + "sr")),
    )
    df = df.withColumn(t + "t", y_col.cast("double") * F.lit(IMP_TO_RAD))
    df = df.withColumn(t + "ts", F.col(t + "t") * F.col(t + "t"))
    df = df.withColumn(t + "ch", mercator.det_cosh_col(F.col(t + "t")))
    df = df.withColumn(
        t + "sh", F.col(t + "t") * _horner_col(F.col(t + "ts"), _SINH_C)
    )
    df = df.withColumn(t + "sx", F.col(t + "cl") / F.col(t + "ch"))
    df = df.withColumn(t + "sy", F.col(t + "sl") / F.col(t + "ch"))
    df = df.withColumn(t + "sz", F.col(t + "sh") / F.col(t + "ch"))
    return df.drop(
        t + "r", t + "m", t + "s", t + "sr", t + "cr", t + "sl", t + "cl",
        t + "t", t + "ts", t + "ch", t + "sh",
    )


def great_circle_cols(df, x1, y1, x2, y2, out: str, tag: str = "_gc"):
    """Add ``out`` = geodesic meters between (x1, y1) and (x2, y2)
    imp Columns — same op order as :func:`great_circle_m`."""
    from pyspark.sql import functions as F

    t = tag
    df = _sphere_cols(df, x1, y1, t + "a")
    df = _sphere_cols(df, x2, y2, t + "b")
    dx = F.col(t + "asx") - F.col(t + "bsx")
    dy = F.col(t + "asy") - F.col(t + "bsy")
    dz = F.col(t + "asz") - F.col(t + "bsz")
    df = df.withColumn(
        t + "h", F.sqrt((dx * dx + dy * dy) + dz * dz) * F.lit(0.5)
    )
    w = F.sqrt(F.greatest(F.lit(1.0) - F.col(t + "h") * F.col(t + "h"), F.lit(0.0)))
    df = detmath.det_atan2_cols(df, F.col(t + "h"), w, t + "th", tag=t + "_at2")
    df = df.withColumn(out, F.col(t + "th") * F.lit(_M_PER_2RAD))
    return df.drop(
        *[t + p + c for p in ("a", "b") for c in ("sx", "sy", "sz")],
        t + "h",
        t + "th",
    )


def _sphere_sql(x_sql: str, y_sql: str, tag: str, src: str) -> tuple[str, str]:
    """(ctes, last_cte): bind {tag}sx/{tag}sy/{tag}sz over ``src``."""
    t = tag
    from geodesk_spark.geo.mercator import det_cosh_sql

    ctes = [
        f"gc{t}0 as (select *, "
        f"floor((cast({x_sql} as double) + {_Q_HALF!r}) / {_Q_STEP!r}) as {t}q, "
        f"cast({y_sql} as double) * {IMP_TO_RAD!r} as {t}t from {src})",
        f"gc{t}1 as (select *, "
        f"(cast({x_sql} as double) - {t}q * {_Q_STEP!r}) * {IMP_TO_RAD!r} as {t}r, "
        f"(cast({t}q as bigint) + 4) % 4 as {t}m, {t}t * {t}t as {t}ts from gc{t}0)",
        f"gc{t}2 as (select *, {t}r * {t}r as {t}s from gc{t}1)",
        f"gc{t}3 as (select *, {t}r * {_horner_sql(f'{t}s', _SIN_C)} as {t}sr, "
        f"{_horner_sql(f'{t}s', _COS_C)} as {t}cr, "
        f"{det_cosh_sql(f'{t}t')} as {t}ch, "
        f"{t}t * {_horner_sql(f'{t}ts', _SINH_C)} as {t}sh from gc{t}2)",
        f"gc{t}4 as (select *, "
        f"case when {t}m = 0 then {t}sr when {t}m = 1 then {t}cr "
        f"when {t}m = 2 then -{t}sr else -{t}cr end as {t}sl, "
        f"case when {t}m = 0 then {t}cr when {t}m = 1 then -{t}sr "
        f"when {t}m = 2 then -{t}cr else {t}sr end as {t}cl from gc{t}3)",
        f"gc{t}5 as (select *, {t}cl / {t}ch as {t}sx, {t}sl / {t}ch as {t}sy, "
        f"{t}sh / {t}ch as {t}sz from gc{t}4)",
    ]
    return ", ".join(ctes), f"gc{t}5"


def great_circle_sql(
    x1: str, y1: str, x2: str, y2: str, tag: str, src: str
) -> tuple[str, str]:
    """(ctes, value_expr) — DuckDB twin of :func:`great_circle_cols`
    over relation ``src``; select the value FROM CTE ``at2_{tag}_fin``
    (the det_atan2 ladder's terminal)."""
    t = tag
    ca, la = _sphere_sql(x1, y1, t + "a", src)
    cb, lb = _sphere_sql(x2, y2, t + "b", la)
    h = (
        f"sqrt((({t}asx - {t}bsx) * ({t}asx - {t}bsx) "
        f"+ ({t}asy - {t}bsy) * ({t}asy - {t}bsy)) "
        f"+ ({t}asz - {t}bsz) * ({t}asz - {t}bsz)) * 0.5"
    )
    hc = f"gc{t}h as (select *, {h} as {t}h from {lb})"
    at2_ctes, at2 = detmath.det_atan2_sql(
        f"{t}h",
        f"sqrt(greatest(1.0 - {t}h * {t}h, 0.0))",
        t,
        f"gc{t}h",
    )
    return ", ".join([ca, cb, hc, at2_ctes]), f"({at2} * {_M_PER_2RAD!r})"


# -- destination point (the FORWARD geodesic problem) -----------------------

_M_PER_RAD = _M_PER_2RAD / 2.0
_Z_CLAMP = math.tanh(math.pi)  # |sin lat| at the mercator y = ±2^31 edge
_IMP_MAX = (1 << 31) - 1


def destination_point(x, y, bearing_deg: float, dist_m) -> tuple[np.ndarray, np.ndarray]:
    """Great-circle DESTINATION (the forward geodesic: start, bearing,
    distance → end) — the navigation complement of great_circle_m,
    libm-free and bit-identical across engines like the rest of the
    det-kernel suite.

    Formulation on unit vectors (avoids every spherical-trig edge
    case): with start P from sphere_from_imps and c = √(Px²+Py²)
    (= cos φ, > 0.08 everywhere on the Mercator range), the local
    frame is east = (−Py, Px, 0)/c, north = (−Pz·Px, −Pz·Py, c·c)/c;
    D = cos δ·P + sin δ·(cos θ·north + sin θ·east).  Bearing sin/cos
    are HOST literals (the _sun_constants discipline); δ = dist/R
    reuses det_sincos_imp's exact quadrant reduction by rescaling to
    imp angle units (distances are capped below half the great circle,
    |δ| < π, by contract).  Back to imps: λ via det_atan2, the
    Mercator y via det_atanh(sin φ) (y = R·atanh·(2³¹/π)), Dz clamped
    to ±tanh(π) (the y = ±2³¹ map edge) and outputs floor(v+0.5)
    integer imps clamped to int32.

    → (x_imp, y_imp) int64 numpy arrays.
    """
    from geodesk_spark.geo.s2cell import det_sincos_imp

    th = math.radians(bearing_deg)
    st, ct = math.sin(th), math.cos(th)
    px, py, pz = sphere_from_imps(x, y)
    c = np.sqrt(px * px + py * py)
    u = np.asarray(dist_m, dtype=np.float64) * (1.0 / _M_PER_RAD) / IMP_TO_RAD
    sd, cd = det_sincos_imp(u)
    dx = cd * px + sd * (ct * (-pz * px / c) + st * (-py / c))
    dy = cd * py + sd * (ct * (-pz * py / c) + st * (px / c))
    dz = cd * pz + sd * (ct * c)
    lam = detmath.det_atan2(dy, dx)
    zc = np.minimum(np.maximum(dz, -_Z_CLAMP), _Z_CLAMP)
    yv = detmath.det_atanh(zc)
    xi = np.floor(lam / IMP_TO_RAD + 0.5)
    yi = np.floor(yv / IMP_TO_RAD + 0.5)
    xi = np.minimum(np.maximum(xi, -_IMP_MAX - 1), _IMP_MAX).astype(np.int64)
    yi = np.minimum(np.maximum(yi, -_IMP_MAX - 1), _IMP_MAX).astype(np.int64)
    return xi, yi


def destination_cols(df, x_col, y_col, dist_col, bearing_deg: float,
                     out_x: str, out_y: str, tag: str = "_dst"):
    """Column twin of :func:`destination_point` (same op order)."""
    from pyspark.sql import functions as F

    t = tag
    th = math.radians(bearing_deg)
    st, ct = math.sin(th), math.cos(th)
    df = _sphere_cols(df, x_col, y_col, t + "p")
    px, py, pz = F.col(t + "psx"), F.col(t + "psy"), F.col(t + "psz")
    df = df.withColumn(t + "c", F.sqrt(px * px + py * py))
    u = dist_col.cast("double") * F.lit((1.0 / _M_PER_RAD) / IMP_TO_RAD)
    # det_sincos_imp ladder over the distance angle
    q = F.floor((u + F.lit(_Q_HALF)) / F.lit(_Q_STEP)).cast("double")
    df = df.withColumn(t + "r", (u - q * F.lit(_Q_STEP)) * F.lit(IMP_TO_RAD))
    df = df.withColumn(t + "m", ((q.cast("long") + F.lit(4)) % 4))
    df = df.withColumn(t + "s", F.col(t + "r") * F.col(t + "r"))
    df = df.withColumn(t + "sr", F.col(t + "r") * _horner_col(F.col(t + "s"), _SIN_C))
    df = df.withColumn(t + "cr", _horner_col(F.col(t + "s"), _COS_C))
    m = F.col(t + "m")
    df = df.withColumn(
        t + "sd",
        F.when(m == 0, F.col(t + "sr")).when(m == 1, F.col(t + "cr"))
        .when(m == 2, -F.col(t + "sr")).otherwise(-F.col(t + "cr")),
    )
    df = df.withColumn(
        t + "cd",
        F.when(m == 0, F.col(t + "cr")).when(m == 1, -F.col(t + "sr"))
        .when(m == 2, -F.col(t + "cr")).otherwise(F.col(t + "sr")),
    )
    cc, sd, cd = F.col(t + "c"), F.col(t + "sd"), F.col(t + "cd")
    df = df.withColumn(
        t + "dx", cd * px + sd * (F.lit(ct) * (-pz * px / cc) + F.lit(st) * (-py / cc))
    )
    df = df.withColumn(
        t + "dy", cd * py + sd * (F.lit(ct) * (-pz * py / cc) + F.lit(st) * (px / cc))
    )
    df = df.withColumn(t + "dz", cd * pz + sd * (F.lit(ct) * cc))
    df = detmath.det_atan2_cols(df, F.col(t + "dy"), F.col(t + "dx"), t + "lam",
                                tag=t + "_at2")
    zc = F.least(F.greatest(F.col(t + "dz"), F.lit(-_Z_CLAMP)), F.lit(_Z_CLAMP))
    df = detmath.det_atanh_cols(df, zc, t + "yv", tag=t + "_ath")
    xi = F.floor(F.col(t + "lam") / F.lit(IMP_TO_RAD) + F.lit(0.5))
    yi = F.floor(F.col(t + "yv") / F.lit(IMP_TO_RAD) + F.lit(0.5))
    clamp = lambda col: F.least(
        F.greatest(col, F.lit(float(-_IMP_MAX - 1))), F.lit(float(_IMP_MAX))
    ).cast("long")
    df = df.withColumn(out_x, clamp(xi)).withColumn(out_y, clamp(yi))
    return df.drop(
        *[t + "p" + c for c in ("sx", "sy", "sz")],
        t + "c", t + "r", t + "m", t + "s", t + "sr", t + "cr", t + "sd",
        t + "cd", t + "dx", t + "dy", t + "dz", t + "lam", t + "yv",
    )


def destination_sql(
    x_sql: str, y_sql: str, dist_sql: str, bearing_deg: float, tag: str, src: str
) -> tuple[str, str, str, str]:
    """DuckDB twin: returns (ctes, final_cte, x_expr, y_expr) — select
    the two exprs FROM the final cte."""
    from geodesk_spark.geo import detmath as dm

    t = tag
    th = math.radians(bearing_deg)
    st, ct = math.sin(th), math.cos(th)
    sph_ctes, sph_last = _sphere_sql(x_sql, y_sql, t + "p", src)
    scale = (1.0 / _M_PER_RAD) / IMP_TO_RAD
    ctes = [
        sph_ctes,
        f"""ds{t}0 as (select *, sqrt({t}psx * {t}psx + {t}psy * {t}psy) as {t}c,
           cast({dist_sql} as double) * {scale!r} as {t}u from {sph_last})""",
        f"""ds{t}1 as (select *, floor(({t}u + {_Q_HALF!r}) / {_Q_STEP!r}) as {t}q
           from ds{t}0)""",
        f"""ds{t}2 as (select *, ({t}u - {t}q * {_Q_STEP!r}) * {IMP_TO_RAD!r} as {t}r,
           (cast({t}q as bigint) + 4) % 4 as {t}m from ds{t}1)""",
        f"ds{t}3 as (select *, {t}r * {t}r as {t}s from ds{t}2)",
        f"""ds{t}4 as (select *, {t}r * {_horner_sql(f'{t}s', _SIN_C)} as {t}sr,
           {_horner_sql(f'{t}s', _COS_C)} as {t}cr from ds{t}3)""",
        f"""ds{t}5 as (select *,
           case when {t}m = 0 then {t}sr when {t}m = 1 then {t}cr
                when {t}m = 2 then -{t}sr else -{t}cr end as {t}sd,
           case when {t}m = 0 then {t}cr when {t}m = 1 then -{t}sr
                when {t}m = 2 then -{t}cr else {t}sr end as {t}cd from ds{t}4)""",
        f"""ds{t}6 as (select *,
           {t}cd * {t}psx + {t}sd * ({ct!r} * (-{t}psz * {t}psx / {t}c)
                                     + {st!r} * (-{t}psy / {t}c)) as {t}dx,
           {t}cd * {t}psy + {t}sd * ({ct!r} * (-{t}psz * {t}psy / {t}c)
                                     + {st!r} * ({t}psx / {t}c)) as {t}dy,
           {t}cd * {t}psz + {t}sd * ({ct!r} * {t}c) as {t}dz from ds{t}5)""",
    ]
    at2_ctes, at2 = dm.det_atan2_sql(f"{t}dy", f"{t}dx", t + "a2", f"ds{t}6")
    ctes.append(at2_ctes)
    zc = f"least(greatest({t}dz, {-_Z_CLAMP!r}), {_Z_CLAMP!r})"
    ath_ctes, ath = dm.det_atanh_sql(zc, t + "ah", f"at2_{t}a2_fin")
    ctes.append(ath_ctes)
    final = f"ds{t}f"
    ctes.append(
        f"""{final} as (select *,
        cast(least(greatest(floor(({at2}) / {IMP_TO_RAD!r} + 0.5),
                            {float(-_IMP_MAX - 1)!r}), {float(_IMP_MAX)!r}) as bigint)
          as {t}xi,
        cast(least(greatest(floor(({ath}) / {IMP_TO_RAD!r} + 0.5),
                            {float(-_IMP_MAX - 1)!r}), {float(_IMP_MAX)!r}) as bigint)
          as {t}yi
        from ln_{t}ah_fin)"""
    )
    return ", ".join(ctes), final, f"{t}xi", f"{t}yi"


# -- great-circle interpolation (slerp route densification) -----------------


def intermediate_points(x1, y1, x2, y2, fracs) -> tuple[np.ndarray, np.ndarray]:
    """Points along the great circle from A to B at fractions ``fracs``
    (numpy; broadcasting over points × one fraction at a time is the
    caller's loop) — classic slerp D = (sin((1−f)θ)·A + sin(fθ)·B)/sin θ
    with θ from the same stable half-chord det_atan2 as great_circle_m;
    a degenerate pair (θ ≈ 0, sin θ < 1e−12) interpolates to A (the
    deterministic branch, mirrored in both engine forms).  Inverse
    projection identical to destination_point.

    → (x_imps[len(fracs), n], y_imps[len(fracs), n]) int64.
    """
    from geodesk_spark.geo.s2cell import det_sincos_imp

    ax, ay, az = sphere_from_imps(x1, y1)
    bx, by, bz = sphere_from_imps(x2, y2)
    dx, dy, dz = ax - bx, ay - by, az - bz
    h = np.sqrt((dx * dx + dy * dy) + dz * dz) * 0.5
    w = np.sqrt(np.maximum(1.0 - h * h, 0.0))
    th = detmath.det_atan2(h, w) * 2.0
    sth = 2.0 * h * w  # sin θ = 2 sin(θ/2) cos(θ/2) — pure ×, no libm
    deg = sth < 1e-12
    sths = np.where(deg, 1.0, sth)
    xs_out, ys_out = [], []
    for f in fracs:
        ua = (1.0 - f) * th / IMP_TO_RAD
        ub = f * th / IMP_TO_RAD
        sa, _ = det_sincos_imp(ua)
        sb, _ = det_sincos_imp(ub)
        px = (sa * ax + sb * bx) / sths
        py = (sa * ay + sb * by) / sths
        pz = (sa * az + sb * bz) / sths
        px = np.where(deg, ax, px)
        py = np.where(deg, ay, py)
        pz = np.where(deg, az, pz)
        lam = detmath.det_atan2(py, px)
        zc = np.minimum(np.maximum(pz, -_Z_CLAMP), _Z_CLAMP)
        yv = detmath.det_atanh(zc)
        xi = np.floor(lam / IMP_TO_RAD + 0.5)
        yi = np.floor(yv / IMP_TO_RAD + 0.5)
        xs_out.append(np.minimum(np.maximum(xi, -_IMP_MAX - 1), _IMP_MAX).astype(np.int64))
        ys_out.append(np.minimum(np.maximum(yi, -_IMP_MAX - 1), _IMP_MAX).astype(np.int64))
    return np.stack(xs_out), np.stack(ys_out)


def intermediate_cols(df, x1, y1, x2, y2, frac: float,
                      out_x: str, out_y: str, tag: str = "_sl"):
    """Column twin of :func:`intermediate_points` for ONE fraction
    (densification explodes fractions query-side and calls per value —
    each call is a pure codegen chain, no UDF)."""
    from pyspark.sql import functions as F

    t = tag
    f_ = float(frac)
    df = _sphere_cols(df, x1, y1, t + "a")
    df = _sphere_cols(df, x2, y2, t + "b")
    axc, ayc, azc = F.col(t + "asx"), F.col(t + "asy"), F.col(t + "asz")
    bxc, byc, bzc = F.col(t + "bsx"), F.col(t + "bsy"), F.col(t + "bsz")
    ddx, ddy, ddz = axc - bxc, ayc - byc, azc - bzc
    df = df.withColumn(t + "h", F.sqrt((ddx * ddx + ddy * ddy) + ddz * ddz) * F.lit(0.5))
    df = df.withColumn(
        t + "w",
        F.sqrt(F.greatest(F.lit(1.0) - F.col(t + "h") * F.col(t + "h"), F.lit(0.0))),
    )
    df = detmath.det_atan2_cols(df, F.col(t + "h"), F.col(t + "w"), t + "th2",
                                tag=t + "_t")
    df = df.withColumn(t + "th", F.col(t + "th2") * F.lit(2.0))
    df = df.withColumn(t + "sth", F.lit(2.0) * F.col(t + "h") * F.col(t + "w"))
    df = df.withColumn(t + "deg", F.col(t + "sth") < F.lit(1e-12))
    df = df.withColumn(
        t + "sths", F.when(F.col(t + "deg"), F.lit(1.0)).otherwise(F.col(t + "sth"))
    )

    def sin_of(u_col, sub: str):
        d = df_holder[0]
        q = F.floor((u_col + F.lit(_Q_HALF)) / F.lit(_Q_STEP)).cast("double")
        d = d.withColumn(sub + "r", (u_col - q * F.lit(_Q_STEP)) * F.lit(IMP_TO_RAD))
        d = d.withColumn(sub + "m", ((q.cast("long") + F.lit(4)) % 4))
        d = d.withColumn(sub + "s", F.col(sub + "r") * F.col(sub + "r"))
        d = d.withColumn(
            sub + "sr", F.col(sub + "r") * _horner_col(F.col(sub + "s"), _SIN_C)
        )
        d = d.withColumn(sub + "cr", _horner_col(F.col(sub + "s"), _COS_C))
        m = F.col(sub + "m")
        d = d.withColumn(
            sub + "v",
            F.when(m == 0, F.col(sub + "sr")).when(m == 1, F.col(sub + "cr"))
            .when(m == 2, -F.col(sub + "sr")).otherwise(-F.col(sub + "cr")),
        )
        df_holder[0] = d.drop(sub + "r", sub + "m", sub + "s", sub + "sr", sub + "cr")

    df_holder = [df]
    sin_of(F.col(t + "th") * F.lit((1.0 - f_) / IMP_TO_RAD), t + "sa")
    sin_of(F.col(t + "th") * F.lit(f_ / IMP_TO_RAD), t + "sb")
    df = df_holder[0]
    sa, sb = F.col(t + "sav"), F.col(t + "sbv")
    px = (sa * axc + sb * bxc) / F.col(t + "sths")
    py = (sa * ayc + sb * byc) / F.col(t + "sths")
    pz = (sa * azc + sb * bzc) / F.col(t + "sths")
    df = df.withColumn(t + "px", F.when(F.col(t + "deg"), axc).otherwise(px))
    df = df.withColumn(t + "py", F.when(F.col(t + "deg"), ayc).otherwise(py))
    df = df.withColumn(t + "pz", F.when(F.col(t + "deg"), azc).otherwise(pz))
    df = detmath.det_atan2_cols(df, F.col(t + "py"), F.col(t + "px"), t + "lam",
                                tag=t + "_a2")
    zc = F.least(F.greatest(F.col(t + "pz"), F.lit(-_Z_CLAMP)), F.lit(_Z_CLAMP))
    df = detmath.det_atanh_cols(df, zc, t + "yv", tag=t + "_ah")
    clamp = lambda col: F.least(
        F.greatest(F.floor(col / F.lit(IMP_TO_RAD) + F.lit(0.5)),
                   F.lit(float(-_IMP_MAX - 1))),
        F.lit(float(_IMP_MAX)),
    ).cast("long")
    df = df.withColumn(out_x, clamp(F.col(t + "lam")))
    df = df.withColumn(out_y, clamp(F.col(t + "yv")))
    return df.drop(
        *[t + p + c for p in ("a", "b") for c in ("sx", "sy", "sz")],
        t + "h", t + "w", t + "th2", t + "th", t + "sth", t + "deg", t + "sths",
        t + "sav", t + "sbv", t + "px", t + "py", t + "pz", t + "lam", t + "yv",
    )


def intermediate_sql(
    x1: str, y1: str, x2: str, y2: str, frac: float, tag: str, src: str
) -> tuple[str, str, str, str]:
    """DuckDB twin for ONE fraction: (ctes, final_cte, x_expr, y_expr)."""
    from geodesk_spark.geo import detmath as dm

    t = tag
    f_ = float(frac)
    ca, la = _sphere_sql(x1, y1, t + "a", src)
    cb, lb = _sphere_sql(x2, y2, t + "b", la)
    ctes = [ca, cb]
    ctes.append(
        f"""sl{t}0 as (select *,
        sqrt((({t}asx - {t}bsx) * ({t}asx - {t}bsx)
            + ({t}asy - {t}bsy) * ({t}asy - {t}bsy))
            + ({t}asz - {t}bsz) * ({t}asz - {t}bsz)) * 0.5 as {t}h from {lb})"""
    )
    ctes.append(
        f"""sl{t}1 as (select *,
        sqrt(greatest(1.0 - {t}h * {t}h, 0.0)) as {t}w from sl{t}0)"""
    )
    a2c, a2e = dm.det_atan2_sql(f"{t}h", f"{t}w", t + "t", f"sl{t}1")
    ctes.append(a2c)
    ctes.append(
        f"""sl{t}2 as (select *, ({a2e}) * 2.0 as {t}th,
        2.0 * {t}h * {t}w as {t}sth from at2_{t}t_fin)"""
    )
    ctes.append(
        f"""sl{t}3 as (select *, {t}sth < 1e-12 as {t}deg,
        case when {t}sth < 1e-12 then 1.0 else {t}sth end as {t}sths from sl{t}2)"""
    )

    def sin_of(u_sql: str, sub: str, prev: str) -> str:
        ctes.append(
            f"""{sub}0 as (select *, floor((({u_sql}) + {_Q_HALF!r}) / {_Q_STEP!r})
            as {sub}q from {prev})"""
        )
        ctes.append(
            f"""{sub}1 as (select *, (({u_sql}) - {sub}q * {_Q_STEP!r})
            * {IMP_TO_RAD!r} as {sub}r,
            (cast({sub}q as bigint) + 4) % 4 as {sub}m from {sub}0)"""
        )
        ctes.append(f"{sub}2 as (select *, {sub}r * {sub}r as {sub}s from {sub}1)")
        ctes.append(
            f"""{sub}3 as (select *,
            {sub}r * {_horner_sql(f'{sub}s', _SIN_C)} as {sub}sr,
            {_horner_sql(f'{sub}s', _COS_C)} as {sub}cr from {sub}2)"""
        )
        ctes.append(
            f"""{sub}4 as (select *,
            case when {sub}m = 0 then {sub}sr when {sub}m = 1 then {sub}cr
                 when {sub}m = 2 then -{sub}sr else -{sub}cr end as {sub}v
            from {sub}3)"""
        )
        return f"{sub}4"

    p1 = sin_of(f"{t}th * {(1.0 - f_) / IMP_TO_RAD!r}", f"sl{t}sa", f"sl{t}3")
    p2 = sin_of(f"{t}th * {f_ / IMP_TO_RAD!r}", f"sl{t}sb", p1)
    ctes.append(
        f"""sl{t}4 as (select *,
        case when {t}deg then {t}asx
             else (sl{t}sav * {t}asx + sl{t}sbv * {t}bsx) / {t}sths end as {t}px,
        case when {t}deg then {t}asy
             else (sl{t}sav * {t}asy + sl{t}sbv * {t}bsy) / {t}sths end as {t}py,
        case when {t}deg then {t}asz
             else (sl{t}sav * {t}asz + sl{t}sbv * {t}bsz) / {t}sths end as {t}pz
        from {p2})"""
    )
    a2c2, a2e2 = dm.det_atan2_sql(f"{t}py", f"{t}px", t + "l", f"sl{t}4")
    ctes.append(a2c2)
    zc = f"least(greatest({t}pz, {-_Z_CLAMP!r}), {_Z_CLAMP!r})"
    ahc, ahe = dm.det_atanh_sql(zc, t + "y", f"at2_{t}l_fin")
    ctes.append(ahc)
    final = f"sl{t}f"
    ctes.append(
        f"""{final} as (select *,
        cast(least(greatest(floor(({a2e2}) / {IMP_TO_RAD!r} + 0.5),
                            {float(-_IMP_MAX - 1)!r}), {float(_IMP_MAX)!r}) as bigint)
          as {t}xi,
        cast(least(greatest(floor(({ahe}) / {IMP_TO_RAD!r} + 0.5),
                            {float(-_IMP_MAX - 1)!r}), {float(_IMP_MAX)!r}) as bigint)
          as {t}yi
        from ln_{t}y_fin)"""
    )
    return ", ".join(ctes), final, f"{t}xi", f"{t}yi"


# -- initial bearing (the INVERSE geodesic azimuth) -------------------------

_DEG = 180.0 / math.pi


def initial_bearing_microdeg(x1, y1, x2, y2) -> np.ndarray:
    """Initial great-circle bearing from A toward B, degrees clockwise
    from north in [0, 360), floor-quantized to integer MICRO-degrees
    (the float-OUTPUT law) — the inverse-geodesic azimuth completing
    the forward pair.

    Unit-vector form (no spherical-trig branch cases): with A's local
    frame east/north derived from A alone (as in destination_point),
    θ = det_atan2(B·east, B·north); the [0, 360) fold is an exact
    if-branch, not a mod (Spark pmod vs DuckDB % differ on negatives).
    Degenerate A≈B yields atan2(0, 0) = 0 → bearing 0 by convention.
    """
    ax, ay, az = sphere_from_imps(x1, y1)
    bx, by, bz = sphere_from_imps(x2, y2)
    c = np.sqrt(ax * ax + ay * ay)
    de = (-ay * bx + ax * by) / c
    dn = (-az * ax * bx - az * ay * by) / c + c * bz
    th = detmath.det_atan2(de, dn) * _DEG
    th = np.where(th < 0.0, th + 360.0, th)
    return np.floor(th * 1e6 + 0.5).astype(np.int64) % 360_000_000


def initial_bearing_cols(df, x1, y1, x2, y2, out: str, tag: str = "_brg"):
    """Column twin of :func:`initial_bearing_microdeg`."""
    from pyspark.sql import functions as F

    t = tag
    df = _sphere_cols(df, x1, y1, t + "a")
    df = _sphere_cols(df, x2, y2, t + "b")
    ax, ay, az = F.col(t + "asx"), F.col(t + "asy"), F.col(t + "asz")
    bx, by, bz = F.col(t + "bsx"), F.col(t + "bsy"), F.col(t + "bsz")
    df = df.withColumn(t + "c", F.sqrt(ax * ax + ay * ay))
    cc = F.col(t + "c")
    df = df.withColumn(t + "de", (-ay * bx + ax * by) / cc)
    df = df.withColumn(t + "dn", (-az * ax * bx - az * ay * by) / cc + cc * bz)
    df = detmath.det_atan2_cols(df, F.col(t + "de"), F.col(t + "dn"), t + "th",
                                tag=t + "_a2")
    deg = F.col(t + "th") * F.lit(_DEG)
    folded = F.when(deg < 0.0, deg + F.lit(360.0)).otherwise(deg)
    df = df.withColumn(
        out,
        (F.floor(folded * F.lit(1e6) + F.lit(0.5)).cast("long") % 360_000_000),
    )
    return df.drop(
        *[t + p + cn for p in ("a", "b") for cn in ("sx", "sy", "sz")],
        t + "c", t + "de", t + "dn", t + "th",
    )


def initial_bearing_sql(
    x1: str, y1: str, x2: str, y2: str, tag: str, src: str
) -> tuple[str, str]:
    """(ctes, value_expr) DuckDB twin; value valid in at2_{tag}b_fin."""
    t = tag
    ca, la = _sphere_sql(x1, y1, t + "a", src)
    cb, lb = _sphere_sql(x2, y2, t + "b", la)
    ctes = [
        ca,
        cb,
        f"""br{t}0 as (select *, sqrt({t}asx * {t}asx + {t}asy * {t}asy) as {t}c
        from {lb})""",
        f"""br{t}1 as (select *,
        (-{t}asy * {t}bsx + {t}asx * {t}bsy) / {t}c as {t}de,
        (-{t}asz * {t}asx * {t}bsx - {t}asz * {t}asy * {t}bsy) / {t}c
          + {t}c * {t}bsz as {t}dn
        from br{t}0)""",
    ]
    a2c, a2e = detmath.det_atan2_sql(f"{t}de", f"{t}dn", t + "b", f"br{t}1")
    ctes.append(a2c)
    deg = f"(({a2e}) * {_DEG!r})"
    folded = f"(case when {deg} < 0.0 then {deg} + 360.0 else {deg} end)"
    val = f"(cast(floor({folded} * 1e6 + 0.5) as bigint) % 360000000)"
    return ", ".join(ctes), val
