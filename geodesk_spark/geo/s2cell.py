"""S2-analog cube-face Hilbert cells over mercator imps.

The build target names "H3/S2 cells" as the per-record spatial encode;
geo/hexgrid.py is the H3 analog and this module is the S2 analog: each
point maps to one of six cube faces, a quadratic (u,v)->(s,t) transform
flattens the face, and a face-local Hilbert curve orders the level-k
leaf cells (the same curve family real S2 ids use, so consecutive cell
ids are edge-adjacent and range scans stay local).  Reference parity
target: the per-feature spatial encode transform of the GOL builder
(compiler/TileCatalog semantics — feature -> cell key before tiling);
the cell scheme itself follows the published S2 geometry model
(cube-face + quadratic ST + Hilbert), re-derived here, not a port.

Determinism contract (the part that makes this oracle-comparable):
the sphere coordinates need sin/cos/tanh/sech of angles derived from
integer imps, and libm transcendentals differ between engine BUILDS
(the box_area_m2 driver reds).  Every transcendental here is therefore
a deterministic kernel in the det_cosh style (geo/mercator.py):

  * longitude theta = x_imp * (pi / 2^31).  Quadrant reduction happens
    in the INTEGER domain (q = floor((x + 2^29) / 2^30), r_imp = x -
    q*2^30, both exact), then ONE multiply by the constant maps r_imp
    to |r| <= pi/4 with a single IEEE rounding; sin/cos of r are
    degree-8 Taylor Horner polynomials in s = r^2 (remainder < 6e-17).
  * latitude comes through the Gudermannian: with t = y_imp * (pi /
    2^31), sin(lat) = tanh(t) = det_sinh(t) / det_cosh(t) and cos(lat)
    = sech(t) = 1 / det_cosh(t) — two pure +/x Horner chains and two
    IEEE-exact divisions, no atan/exp at all.

Everything downstream (face argmax, u,v divisions, the quadratic ST
sqrt, floor to ij, Hilbert rotations) is exactly specified by IEEE 754,
so the numpy kernel, the Column builder, and the DuckDB SQL twin yield
bit-identical cells on every engine build.
"""

from __future__ import annotations

import math

import numpy as np

from geodesk_spark.geo import mercator

# imp -> radians: one multiply by one constant (2*pi / 2^32).
IMP_TO_RAD = math.pi / 2.0**31
_Q_HALF = 536870912.0  # 2^29
_Q_STEP = 1073741824.0  # 2^30

# sin(r) = r * PS(r^2), cos(r) = PC(r^2) on |r| <= pi/4 (s <= 0.617):
# alternating Taylor, degree 8 in s — remainder < 6e-17, ~1 ulp noise,
# and (crucially) the SAME bits everywhere.
_SIN_C = [(-1.0) ** i / math.factorial(2 * i + 1) for i in range(8, -1, -1)]
_COS_C = [(-1.0) ** i / math.factorial(2 * i) for i in range(8, -1, -1)]
# sinh(t) = t * PH(t^2) on |t| <= pi (s <= 9.87): positive Taylor,
# degree 13 in s like mercator._COSH_C (remainder ~3e-17 relative).
_SINH_C = [1.0 / math.factorial(2 * i + 1) for i in range(13, -1, -1)]


def _horner(s: np.ndarray, coeffs) -> np.ndarray:
    p = np.full_like(s, coeffs[0])
    for c in coeffs[1:]:
        p = p * s + c
    return p


def det_sinh(t) -> np.ndarray:
    """sinh(t) for |t| <= ~3.2, bit-identical across engines (numpy)."""
    t = np.asarray(t, dtype=np.float64)
    return t * _horner(t * t, _SINH_C)


def det_sincos_imp(x) -> tuple[np.ndarray, np.ndarray]:
    """(sin, cos) of theta = x_imp * pi/2^31, |x_imp| < 2^31 (numpy).

    Quadrant index and residual are computed in exact integer/dyadic
    arithmetic; only the final r_imp * IMP_TO_RAD rounds.
    """
    x = np.asarray(x, dtype=np.float64)
    q = np.floor((x + _Q_HALF) / _Q_STEP)  # exact: |x + 2^29| <= 2^31
    r = (x - q * _Q_STEP) * IMP_TO_RAD  # |r| <= pi/4, one rounding
    s = r * r
    sinr = r * _horner(s, _SIN_C)
    cosr = _horner(s, _COS_C)
    m = (q.astype(np.int64) + 4) % 4
    sin_t = np.select([m == 0, m == 1, m == 2], [sinr, cosr, -sinr], -cosr)
    cos_t = np.select([m == 0, m == 1, m == 2], [cosr, -sinr, -cosr], sinr)
    return sin_t, cos_t


def sphere_from_imps(x, y) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Unit-sphere (X, Y, Z) from mercator imps, deterministic.

    Gudermannian identities: cos(lat) = sech(t), sin(lat) = tanh(t)
    with t the mercator parameter — no atan/exp/sin of latitude.
    """
    t = np.asarray(y, dtype=np.float64) * IMP_TO_RAD
    ch = mercator.det_cosh(t)
    sh = det_sinh(t)
    sin_l, cos_l = det_sincos_imp(x)
    return cos_l / ch, sin_l / ch, sh / ch


def face_uv(X, Y, Z) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Cube face 0..5 and gnomonic (u, v), S2 face convention
    (0:+X 1:+Y 2:+Z 3:-X 4:-Y 5:-Z; published S2 geometry model)."""
    ax, ay, az = np.abs(X), np.abs(Y), np.abs(Z)
    with np.errstate(divide="ignore", invalid="ignore"):
        # branch order is part of the parity contract: x-major first
        # (>= on both comparisons), then y-major, else z-major.
        x_major = (ax >= ay) & (ax >= az)
        y_major = ~x_major & (ay >= az)
        face = np.select(
            [x_major & (X >= 0), x_major, y_major & (Y >= 0), y_major, Z >= 0],
            [0, 3, 1, 4, 2],
            5,
        ).astype(np.int64)
        u = np.select(
            [face == 0, face == 1, face == 2, face == 3, face == 4],
            [Y / X, -X / Y, -X / Z, Z / X, Z / Y],
            -Y / Z,
        )
        v = np.select(
            [face == 0, face == 1, face == 2, face == 3, face == 4],
            [Z / X, Z / Y, -Y / Z, Y / X, -X / Y],
            -X / Z,
        )
    return face, u, v


def st_from_uv(u) -> np.ndarray:
    """Quadratic uv->st (the published S2 default): equal-area-ish cell
    sizing with only one sqrt — sqrt is IEEE-correctly-rounded on every
    engine, so no determinism cost."""
    u = np.asarray(u, dtype=np.float64)
    return np.where(
        u >= 0,
        0.5 * np.sqrt(np.maximum(1.0 + 3.0 * u, 0.0)),
        1.0 - 0.5 * np.sqrt(np.maximum(1.0 - 3.0 * u, 0.0)),
    )


def _ij(s: np.ndarray, level: int) -> np.ndarray:
    n = 1 << level
    return np.clip(np.floor(s * float(n)).astype(np.int64), 0, n - 1)


def _hilbert_d(i: np.ndarray, j: np.ndarray, level: int) -> np.ndarray:
    """Face-local Hilbert distance (same rotation recurrence as
    geo/curve.hilbert_cell, over cell ij instead of tile col/row)."""
    d = np.zeros_like(i)
    xx, yy = i.copy(), j.copy()
    s = np.int64(1) << (level - 1) if level > 0 else np.int64(0)
    while s > 0:
        rx = ((xx & s) > 0).astype(np.int64)
        ry = ((yy & s) > 0).astype(np.int64)
        d += s * s * ((3 * rx) ^ ry)
        swap = ry == 0
        flip = swap & (rx == 1)
        xx_f = np.where(flip, s - 1 - xx, xx)
        yy_f = np.where(flip, s - 1 - yy, yy)
        xx, yy = np.where(swap, yy_f, xx_f), np.where(swap, xx_f, yy_f)
        s >>= 1
    return d


def uv_from_st(s) -> np.ndarray:
    """Inverse quadratic st->uv (published S2 model): s >= 1/2 ->
    (4s^2-1)/3, else (1-4(1-s)^2)/3.  Pure +/x/÷ — deterministic."""
    s = np.asarray(s, dtype=np.float64)
    return np.where(
        s >= 0.5,
        (4.0 * s * s - 1.0) / 3.0,
        (1.0 - 4.0 * (1.0 - s) * (1.0 - s)) / 3.0,
    )


def xyz_from_face_uv(face, u, v):
    """Unnormalized cube point from (face, u, v) — exact inverse of
    face_uv's per-face division table (S2 face convention)."""
    face = np.asarray(face)
    u = np.asarray(u, dtype=np.float64)
    v = np.asarray(v, dtype=np.float64)
    one = np.ones_like(u)
    X = np.select([face == 0, face == 1, face == 2, face == 3, face == 4], [one, -u, -u, -one, v], v)
    Y = np.select([face == 0, face == 1, face == 2, face == 3, face == 4], [u, one, -v, -v, -one], u)
    Z = np.select([face == 0, face == 1, face == 2, face == 3, face == 4], [v, v, one, -u, -u], -one)
    return X, Y, Z


# sin(lat) clamp: atanh(1) is infinite (the pole is outside the
# mercator map); 1 - 2^-32 caps |t| ~ 11.4, inside det_ln's domain.
_SINLAT_MAX = 1.0 - 2.0**-32
_INV_RAD = 2.0**31 / math.pi  # radians -> imps (one constant, one multiply)
_IMP_MAX = (1 << 31) - 1


def cell_center_imps(face, i, j, level: int):
    """Mercator-imp center of cell (face, i, j) — the deterministic
    INVERSE of s2_cell, built on det_atan2/det_atanh (geo/detmath.py).
    Centers are integer imps (floor(v+0.5) law), so downstream
    comparisons are exact.  Latitudes past the mercator domain (polar
    cells) clamp to the map edge."""
    from geodesk_spark.geo import detmath

    n = float(1 << level)
    s = (np.asarray(i, dtype=np.float64) + 0.5) / n  # exact dyadic
    t = (np.asarray(j, dtype=np.float64) + 0.5) / n
    X, Y, Z = xyz_from_face_uv(face, uv_from_st(s), uv_from_st(t))
    theta = detmath.det_atan2(Y, X)
    cx = np.floor(theta * _INV_RAD + 0.5)
    cx = np.where(cx > _IMP_MAX, cx - 4294967296.0, cx).astype(np.int64)  # theta=pi wraps
    sinlat = Z / np.sqrt(X * X + Y * Y + Z * Z)
    sinlat = np.minimum(np.maximum(sinlat, -_SINLAT_MAX), _SINLAT_MAX)
    tm = detmath.det_atanh(sinlat)
    cy = np.floor(tm * _INV_RAD + 0.5)
    cy = np.minimum(np.maximum(cy, -float(_IMP_MAX) - 1), float(_IMP_MAX)).astype(np.int64)
    return cx, cy


def s2_cell(x, y, level: int):
    """(face, i, j, cell) at `level` for mercator-imp points (numpy).

    cell = face * 4^level + hilbert(i, j): globally unique, and within a
    face consecutive ids are edge-adjacent cells (range locality for
    Z-ordered storage layouts, like the TIP walk order gives the GOL)."""
    X, Y, Z = sphere_from_imps(x, y)
    face, u, v = face_uv(X, Y, Z)
    i = _ij(st_from_uv(u), level)
    j = _ij(st_from_uv(v), level)
    cell = face * (np.int64(1) << (2 * level)) + _hilbert_d(i, j, level)
    return face, i, j, cell


# --- Spark Column builder ----------------------------------------------------


def _horner_col(s_col, coeffs):
    from pyspark.sql import functions as F

    p = F.lit(coeffs[0])
    for c in coeffs[1:]:
        p = p * s_col + F.lit(c)
    return p


def s2_cell_cols(df, x_col: str, y_col: str, level: int, prefix: str = "s2_"):
    """Add `{prefix}face/i/j/cell` columns — pure JVM (no UDF), built as
    narrow projections per step like curve.hilbert_cell_cols so every
    expression stays small for whole-stage codegen."""
    from pyspark.sql import functions as F

    n = 1 << level
    # trig of longitude (integer quadrant reduction, Horner sin/cos)
    xd = F.col(x_col).cast("double")
    q = F.floor((xd + F.lit(_Q_HALF)) / F.lit(_Q_STEP)).cast("double")
    df = df.withColumn("_s2r", (xd - q * F.lit(_Q_STEP)) * F.lit(IMP_TO_RAD))
    df = df.withColumn("_s2m", ((q.cast("long") + F.lit(4)) % 4))
    df = df.withColumn("_s2s", F.col("_s2r") * F.col("_s2r"))
    df = df.withColumn("_sinr", F.col("_s2r") * _horner_col(F.col("_s2s"), _SIN_C))
    df = df.withColumn("_cosr", _horner_col(F.col("_s2s"), _COS_C))
    m = F.col("_s2m")
    df = df.withColumn(
        "_sinl",
        F.when(m == 0, F.col("_sinr"))
        .when(m == 1, F.col("_cosr"))
        .when(m == 2, -F.col("_sinr"))
        .otherwise(-F.col("_cosr")),
    )
    df = df.withColumn(
        "_cosl",
        F.when(m == 0, F.col("_cosr"))
        .when(m == 1, -F.col("_sinr"))
        .when(m == 2, -F.col("_cosr"))
        .otherwise(F.col("_sinr")),
    )
    # latitude through the Gudermannian (det_cosh / det_sinh)
    df = df.withColumn("_s2t", F.col(y_col).cast("double") * F.lit(IMP_TO_RAD))
    df = df.withColumn("_s2ts", F.col("_s2t") * F.col("_s2t"))
    df = df.withColumn("_s2ch", mercator.det_cosh_col(F.col("_s2t")))
    df = df.withColumn("_s2sh", F.col("_s2t") * _horner_col(F.col("_s2ts"), _SINH_C))
    df = df.withColumn("_sx", F.col("_cosl") / F.col("_s2ch"))
    df = df.withColumn("_sy", F.col("_sinl") / F.col("_s2ch"))
    df = df.withColumn("_sz", F.col("_s2sh") / F.col("_s2ch"))
    # face + uv (branch order = parity contract, matches face_uv)
    ax, ay, az = F.abs(F.col("_sx")), F.abs(F.col("_sy")), F.abs(F.col("_sz"))
    x_major = (ax >= ay) & (ax >= az)
    y_major = (~x_major) & (ay >= az)
    df = df.withColumn(
        prefix + "face",
        F.when(x_major & (F.col("_sx") >= 0), F.lit(0))
        .when(x_major, F.lit(3))
        .when(y_major & (F.col("_sy") >= 0), F.lit(1))
        .when(y_major, F.lit(4))
        .when(F.col("_sz") >= 0, F.lit(2))
        .otherwise(F.lit(5))
        .cast("long"),
    )
    fc = F.col(prefix + "face")
    sx, sy, sz = F.col("_sx"), F.col("_sy"), F.col("_sz")
    df = df.withColumn(
        "_s2u",
        F.when(fc == 0, sy / sx)
        .when(fc == 1, -sx / sy)
        .when(fc == 2, -sx / sz)
        .when(fc == 3, sz / sx)
        .when(fc == 4, sz / sy)
        .otherwise(-sy / sz),
    )
    df = df.withColumn(
        "_s2v",
        F.when(fc == 0, sz / sx)
        .when(fc == 1, sz / sy)
        .when(fc == 2, -sy / sz)
        .when(fc == 3, sy / sx)
        .when(fc == 4, -sx / sy)
        .otherwise(-sx / sz),
    )

    def st(col):
        return F.when(
            col >= 0,
            F.lit(0.5) * F.sqrt(F.greatest(F.lit(1.0) + F.lit(3.0) * col, F.lit(0.0))),
        ).otherwise(
            F.lit(1.0)
            - F.lit(0.5) * F.sqrt(F.greatest(F.lit(1.0) - F.lit(3.0) * col, F.lit(0.0)))
        )

    def ij(col):
        b = F.floor(col * F.lit(float(n))).cast("long")
        return F.least(F.greatest(b, F.lit(0).cast("long")), F.lit(n - 1).cast("long"))

    df = df.withColumn(prefix + "i", ij(st(F.col("_s2u"))))
    df = df.withColumn(prefix + "j", ij(st(F.col("_s2v"))))
    # face-local Hilbert (narrow per-level projections)
    df = df.withColumn("_hx", F.col(prefix + "i")).withColumn(
        "_hy", F.col(prefix + "j")
    )
    df = df.withColumn("_hd", F.lit(0).cast("long"))
    s = 1 << (level - 1) if level > 0 else 0
    while s > 0:
        rx = F.when(F.col("_hx").bitwiseAND(F.lit(s)) > 0, F.lit(1)).otherwise(F.lit(0))
        ry = F.when(F.col("_hy").bitwiseAND(F.lit(s)) > 0, F.lit(1)).otherwise(F.lit(0))
        df = df.withColumn("_rx", rx.cast("long")).withColumn("_ry", ry.cast("long"))
        df = df.withColumn(
            "_hd",
            F.col("_hd")
            + F.lit(s * s).cast("long")
            * (F.lit(3) * F.col("_rx")).bitwiseXOR(F.col("_ry")),
        )
        flip = (F.col("_ry") == 0) & (F.col("_rx") == 1)
        swap = F.col("_ry") == 0
        xf = F.when(flip, F.lit(s - 1) - F.col("_hx")).otherwise(F.col("_hx"))
        yf = F.when(flip, F.lit(s - 1) - F.col("_hy")).otherwise(F.col("_hy"))
        df = df.withColumn("_hxf", xf).withColumn("_hyf", yf)
        df = df.withColumn(
            "_hx2", F.when(swap, F.col("_hyf")).otherwise(F.col("_hxf"))
        ).withColumn("_hy2", F.when(swap, F.col("_hxf")).otherwise(F.col("_hyf")))
        df = df.withColumn("_hx", F.col("_hx2")).withColumn("_hy", F.col("_hy2"))
        s >>= 1
    df = df.withColumn(
        prefix + "cell",
        F.col(prefix + "face") * F.lit(1 << (2 * level)).cast("long") + F.col("_hd"),
    )
    return df.drop(
        "_s2r", "_s2m", "_s2s", "_sinr", "_cosr", "_sinl", "_cosl",
        "_s2t", "_s2ts", "_s2ch", "_s2sh", "_sx", "_sy", "_sz",
        "_s2u", "_s2v", "_hx", "_hy", "_hd", "_rx", "_ry",
        "_hxf", "_hyf", "_hx2", "_hy2",
    )


# --- DuckDB SQL twin ---------------------------------------------------------


def _horner_sql(s: str, coeffs) -> str:
    p = repr(coeffs[0])
    for c in coeffs[1:]:
        p = f"({p} * {s} + {c!r})"
    return p


def s2_sql(x_sql: str, y_sql: str, level: int) -> tuple[str, str]:
    """(ctes, final_select) twin of s2_cell over `__s2_input__`, same op
    order step for step.  Each polynomial binds its operand to a CTE
    column first (the Horner text repeats the operand ~2x per degree)."""
    n = 1 << level
    ctes = [
        # longitude quadrant reduction + mercator parameter
        f"s2a as (select *, "
        f"floor((cast({x_sql} as double) + {_Q_HALF!r}) / {_Q_STEP!r}) as s2q, "
        f"cast({y_sql} as double) * {IMP_TO_RAD!r} as s2t "
        f"from __s2_input__)",
        f"s2b as (select *, "
        f"(cast({x_sql} as double) - s2q * {_Q_STEP!r}) * {IMP_TO_RAD!r} as s2r, "
        f"(cast(s2q as bigint) + 4) % 4 as s2m, s2t * s2t as s2ts from s2a)",
        "s2c as (select *, s2r * s2r as s2s from s2b)",
        f"s2d as (select *, s2r * {_horner_sql('s2s', _SIN_C)} as sinr, "
        f"{_horner_sql('s2s', _COS_C)} as cosr, "
        f"{_horner_sql('s2ts', _COSH_SQL_C)} as s2ch, "
        f"s2t * {_horner_sql('s2ts', _SINH_C)} as s2sh from s2c)",
        "s2e as (select *, "
        "case when s2m = 0 then sinr when s2m = 1 then cosr "
        "when s2m = 2 then -sinr else -cosr end as sinl, "
        "case when s2m = 0 then cosr when s2m = 1 then -sinr "
        "when s2m = 2 then -cosr else sinr end as cosl from s2d)",
        "s2f as (select *, cosl / s2ch as sx, sinl / s2ch as sy, "
        "s2sh / s2ch as sz from s2e)",
        # face (branch order identical to face_uv / s2_cell_cols)
        "s2g as (select *, case "
        "when abs(sx) >= abs(sy) and abs(sx) >= abs(sz) and sx >= 0 then 0 "
        "when abs(sx) >= abs(sy) and abs(sx) >= abs(sz) then 3 "
        "when abs(sy) >= abs(sz) and sy >= 0 then 1 "
        "when abs(sy) >= abs(sz) then 4 "
        "when sz >= 0 then 2 else 5 end as s2face from s2f)",
        "s2h as (select *, "
        "case s2face when 0 then sy / sx when 1 then -sx / sy "
        "when 2 then -sx / sz when 3 then sz / sx when 4 then sz / sy "
        "else -sy / sz end as s2u, "
        "case s2face when 0 then sz / sx when 1 then sz / sy "
        "when 2 then -sy / sz when 3 then sy / sx when 4 then -sx / sy "
        "else -sx / sz end as s2v from s2g)",
        f"s2i as (select *, {_st_sql('s2u')} as s2si, "
        f"{_st_sql('s2v')} as s2sj from s2h)",
        # s2ii/s2jj keep the UNROTATED ij (the Hilbert loop mutates
        # hx/hy in place — the Column builder saves them up front too)
        f"s2j as (select *, {_ij_sql('s2si', n)} as hx, "
        f"{_ij_sql('s2sj', n)} as hy, {_ij_sql('s2si', n)} as s2ii, "
        f"{_ij_sql('s2sj', n)} as s2jj, cast(0 as bigint) as hd from s2i)",
    ]
    lvl = "s2j"
    s = 1 << (level - 1) if level > 0 else 0
    k = 0
    while s > 0:
        prev, k = lvl, k + 1
        lvl = f"s2h{k}"
        ctes.append(
            f"{lvl} as (select * exclude (hx, hy, hd, rx, ry), "
            f"hd + {s * s} * xor(3 * rx, ry) as hd, "
            f"case when ry = 0 then (case when rx = 1 then {s - 1} - hy else hy end) "
            f"else hx end as hx, "
            f"case when ry = 0 then (case when rx = 1 then {s - 1} - hx else hx end) "
            f"else hy end as hy "
            f"from (select *, "
            f"case when (hx & {s}) > 0 then 1 else 0 end as rx, "
            f"case when (hy & {s}) > 0 then 1 else 0 end as ry from {prev}))"
        )
        s >>= 1
    final = (
        f"select * exclude (s2q, s2t, s2r, s2m, s2ts, s2s, sinr, cosr, s2ch, "
        f"s2sh, sinl, cosl, sx, sy, sz, s2u, s2v, s2si, s2sj, hx, hy, hd, "
        f"s2ii, s2jj, s2face), "
        f"s2ii as s2_i, s2jj as s2_j, cast(s2face as bigint) as s2_face, "
        f"cast(s2face as bigint) * {1 << (2 * level)} + hd as s2_cell from {lvl}"
    )
    return ", ".join(ctes), final


def _st_sql(u: str) -> str:
    return (
        f"(case when {u} >= 0 then 0.5 * sqrt(greatest(1.0 + 3.0 * {u}, 0.0)) "
        f"else 1.0 - 0.5 * sqrt(greatest(1.0 - 3.0 * {u}, 0.0)) end)"
    )


def _ij_sql(s: str, n: int) -> str:
    return (
        f"least(greatest(cast(floor({s} * {float(n)!r}) as bigint), 0), {n - 1})"
    )


# mercator._COSH_C, re-exported for the SQL twin above so the oracle
# cosh chain is literally the same coefficients.
_COSH_SQL_C = mercator._COSH_C


# --- Inverse (cell -> center imps), Column + SQL forms -----------------------


def hilbert_from_ij_cols(df, i_col: str, j_col: str, level: int, out: str):
    """Add `out` = face-local Hilbert distance of integer columns
    (i_col, j_col) — the candidate-cell id path of the polyfill (same
    rotation recurrence as s2_cell_cols' inline loop).  `out` must not
    collide with the scratch names (_hx/_hy/_hd/...)."""
    assert out not in {"_hx", "_hy", "_hd", "_rx", "_ry", "_hxf", "_hyf", "_hx2", "_hy2"}
    from pyspark.sql import functions as F

    df = df.withColumn("_hx", F.col(i_col).cast("long")).withColumn(
        "_hy", F.col(j_col).cast("long")
    )
    df = df.withColumn("_hd", F.lit(0).cast("long"))
    s = 1 << (level - 1) if level > 0 else 0
    while s > 0:
        rx = F.when(F.col("_hx").bitwiseAND(F.lit(s)) > 0, F.lit(1)).otherwise(F.lit(0))
        ry = F.when(F.col("_hy").bitwiseAND(F.lit(s)) > 0, F.lit(1)).otherwise(F.lit(0))
        df = df.withColumn("_rx", rx.cast("long")).withColumn("_ry", ry.cast("long"))
        df = df.withColumn(
            "_hd",
            F.col("_hd")
            + F.lit(s * s).cast("long")
            * (F.lit(3) * F.col("_rx")).bitwiseXOR(F.col("_ry")),
        )
        flip = (F.col("_ry") == 0) & (F.col("_rx") == 1)
        swap = F.col("_ry") == 0
        xf = F.when(flip, F.lit(s - 1) - F.col("_hx")).otherwise(F.col("_hx"))
        yf = F.when(flip, F.lit(s - 1) - F.col("_hy")).otherwise(F.col("_hy"))
        df = df.withColumn("_hxf", xf).withColumn("_hyf", yf)
        df = df.withColumn(
            "_hx2", F.when(swap, F.col("_hyf")).otherwise(F.col("_hxf"))
        ).withColumn("_hy2", F.when(swap, F.col("_hxf")).otherwise(F.col("_hyf")))
        df = df.withColumn("_hx", F.col("_hx2")).withColumn("_hy", F.col("_hy2"))
        s >>= 1
    df = df.withColumn(out, F.col("_hd"))
    return df.drop("_hx", "_hy", "_hd", "_rx", "_ry", "_hxf", "_hyf", "_hx2", "_hy2")


def hilbert_from_ij_sql(src: str, i_col: str, j_col: str, level: int) -> tuple[str, str]:
    """(ctes, last_cte): Hilbert distance `hd` from integer columns of
    `src` — chained-CTE twin of hilbert_from_ij_cols."""
    ctes = [
        f"hij0 as (select *, cast({i_col} as bigint) as hx, "
        f"cast({j_col} as bigint) as hy, cast(0 as bigint) as hd from {src})"
    ]
    lvl = "hij0"
    s = 1 << (level - 1) if level > 0 else 0
    k = 0
    while s > 0:
        prev, k = lvl, k + 1
        lvl = f"hij{k}"
        ctes.append(
            f"{lvl} as (select * exclude (hx, hy, hd, rx, ry), "
            f"hd + {s * s} * xor(3 * rx, ry) as hd, "
            f"case when ry = 0 then (case when rx = 1 then {s - 1} - hy else hy end) "
            f"else hx end as hx, "
            f"case when ry = 0 then (case when rx = 1 then {s - 1} - hx else hx end) "
            f"else hy end as hy "
            f"from (select *, "
            f"case when (hx & {s}) > 0 then 1 else 0 end as rx, "
            f"case when (hy & {s}) > 0 then 1 else 0 end as ry from {prev}))"
        )
        s >>= 1
    return ", ".join(ctes), lvl


def cell_center_cols(df, face_col: str, i_col: str, j_col: str, level: int,
                     out_x: str = "cx", out_y: str = "cy"):
    """Add integer-imp center columns for cells (face, i, j) — Column
    twin of cell_center_imps (bound-column det_atan2/det_atanh)."""
    from pyspark.sql import functions as F

    from geodesk_spark.geo import detmath

    n = float(1 << level)
    df = df.withColumn("_cs", (F.col(i_col).cast("double") + F.lit(0.5)) / F.lit(n))
    df = df.withColumn("_ct", (F.col(j_col).cast("double") + F.lit(0.5)) / F.lit(n))

    def uv(col):
        return F.when(
            col >= 0.5, (F.lit(4.0) * col * col - F.lit(1.0)) / F.lit(3.0)
        ).otherwise(
            (F.lit(1.0) - F.lit(4.0) * (F.lit(1.0) - col) * (F.lit(1.0) - col))
            / F.lit(3.0)
        )

    df = df.withColumn("_cu", uv(F.col("_cs"))).withColumn("_cv", uv(F.col("_ct")))
    fc = F.col(face_col)
    u, v = F.col("_cu"), F.col("_cv")
    one = F.lit(1.0)
    df = df.withColumn(
        "_px",
        F.when(fc == 0, one).when(fc == 1, -u).when(fc == 2, -u)
        .when(fc == 3, -one).when(fc == 4, v).otherwise(v),
    )
    df = df.withColumn(
        "_py",
        F.when(fc == 0, u).when(fc == 1, one).when(fc == 2, -v)
        .when(fc == 3, -v).when(fc == 4, -one).otherwise(u),
    )
    df = df.withColumn(
        "_pz",
        F.when(fc == 0, v).when(fc == 1, v).when(fc == 2, one)
        .when(fc == 3, -u).when(fc == 4, -u).otherwise(-one),
    )
    df = detmath.det_atan2_cols(df, F.col("_py"), F.col("_px"), "_th")
    cx = F.floor(F.col("_th") * F.lit(_INV_RAD) + F.lit(0.5))
    df = df.withColumn(
        out_x,
        F.when(cx > _IMP_MAX, cx - F.lit(4294967296.0)).otherwise(cx).cast("long"),
    )
    sl = F.col("_pz") / F.sqrt(
        F.col("_px") * F.col("_px")
        + F.col("_py") * F.col("_py")
        + F.col("_pz") * F.col("_pz")
    )
    df = df.withColumn(
        "_sl", F.least(F.greatest(sl, F.lit(-_SINLAT_MAX)), F.lit(_SINLAT_MAX))
    )
    df = detmath.det_atanh_cols(df, F.col("_sl"), "_tm")
    cy = F.floor(F.col("_tm") * F.lit(_INV_RAD) + F.lit(0.5))
    df = df.withColumn(
        out_y,
        F.least(
            F.greatest(cy, F.lit(float(-_IMP_MAX - 1))), F.lit(float(_IMP_MAX))
        ).cast("long"),
    )
    return df.drop("_cs", "_ct", "_cu", "_cv", "_px", "_py", "_pz", "_th", "_sl", "_tm")


def cell_center_sql(src: str, face_col: str, i_col: str, j_col: str,
                    level: int) -> tuple[str, str]:
    """(ctes, last_cte): integer-imp centers `cx`, `cy` for cells of
    `src` — chained-CTE twin of cell_center_imps (det_atan2/det_atanh
    ladders inside)."""
    from geodesk_spark.geo import detmath

    n = float(1 << level)
    uv = lambda c: (
        f"(case when {c} >= 0.5 then (4.0 * {c} * {c} - 1.0) / 3.0 "
        f"else (1.0 - 4.0 * (1.0 - {c}) * (1.0 - {c})) / 3.0 end)"
    )
    ctes = [
        f"cc0 as (select *, (cast({i_col} as double) + 0.5) / {n!r} as c_s, "
        f"(cast({j_col} as double) + 0.5) / {n!r} as c_t from {src})",
        f"cc1 as (select *, {uv('c_s')} as c_u, {uv('c_t')} as c_v from cc0)",
        f"cc2 as (select *, "
        f"case {face_col} when 0 then 1.0 when 1 then -c_u when 2 then -c_u "
        f"when 3 then -1.0 when 4 then c_v else c_v end as px, "
        f"case {face_col} when 0 then c_u when 1 then 1.0 when 2 then -c_v "
        f"when 3 then -c_v when 4 then -1.0 else c_u end as py, "
        f"case {face_col} when 0 then c_v when 1 then c_v when 2 then 1.0 "
        f"when 3 then -c_u when 4 then -c_u else -1.0 end as pz from cc1)",
    ]
    at_ctes, at_expr = detmath.det_atan2_sql("py", "px", "cc", "cc2")
    ctes.append(at_ctes)
    ctes.append(
        f"cc3 as (select *, {at_expr} as c_th, "
        f"least(greatest(pz / sqrt(px * px + py * py + pz * pz), "
        f"{-_SINLAT_MAX!r}), {_SINLAT_MAX!r}) as c_sl from at2_cc_fin)"
    )
    ath_ctes, ath_expr = detmath.det_atanh_sql("c_sl", "cc", "cc3")
    ctes.append(ath_ctes)
    ctes.append(
        f"cc4 as (select *, "
        f"cast(case when floor(c_th * {_INV_RAD!r} + 0.5) > {_IMP_MAX} then "
        f"floor(c_th * {_INV_RAD!r} + 0.5) - 4294967296.0 "
        f"else floor(c_th * {_INV_RAD!r} + 0.5) end as bigint) as cx, "
        f"cast(least(greatest(floor({ath_expr} * {_INV_RAD!r} + 0.5), "
        f"{float(-_IMP_MAX - 1)!r}), {float(_IMP_MAX)!r}) as bigint) as cy "
        f"from ln_cc_fin)"
    )
    return ", ".join(ctes), "cc4"
