"""S2-analog cube-face Hilbert cells (geo/s2cell.py).

Contract: the numpy kernel, the Spark Column builder, and the DuckDB
SQL twin are BIT-identical (the cells are oracle-compared integers),
and the deterministic trig underneath (integer-quadrant sin/cos,
det_sinh, the Gudermannian latitude) is accurate to ~1 ulp of libm.
Cell semantics follow the published S2 geometry model (cube face +
quadratic ST + Hilbert ordering), re-derived — reference parity target
is the per-feature spatial-encode stage of the GOL builder.
"""

import math

import duckdb
import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from geodesk_spark.geo import s2cell as S

I32 = (1 << 31) - 1
LEVEL = 10


def _imp_grid(n: int = 20001) -> np.ndarray:
    """Deterministic imp grid + every quadrant/domain boundary."""
    bounds = np.array(
        [0, 1, -1, 1 << 29, (1 << 29) + 1, (1 << 29) - 1, -(1 << 29),
         1 << 30, -(1 << 30), 3 << 29, -(3 << 29), I32, -I32, -I32 - 1],
        dtype=np.int64,
    )
    return np.concatenate([np.linspace(-I32 - 1, I32, n).astype(np.int64), bounds])


def test_det_sinh_accuracy_and_symmetry():
    t = np.linspace(-math.pi, math.pi, 100001)
    v = S.det_sinh(t)
    nz = t != 0
    assert np.abs(v[nz] / np.sinh(t[nz]) - 1).max() < 1e-15
    assert np.array_equal(v.view(np.int64), (-S.det_sinh(-t)).view(np.int64))


def test_det_sincos_accuracy_vs_libm():
    x = _imp_grid()
    sin_t, cos_t = S.det_sincos_imp(x)
    theta = x.astype(np.float64) * S.IMP_TO_RAD
    assert np.abs(sin_t - np.sin(theta)).max() < 1e-15  # absolute: sin ~ 0 crossings
    assert np.abs(cos_t - np.cos(theta)).max() < 1e-15
    # Pythagorean identity to ~1 ulp
    assert np.abs(sin_t * sin_t + cos_t * cos_t - 1).max() < 1e-15


def test_sphere_unit_norm_and_vs_libm():
    rng = np.random.default_rng(3)
    x = rng.integers(-I32 - 1, I32, 30000)
    y = rng.integers(-I32 - 1, I32, 30000)
    X, Y, Z = S.sphere_from_imps(x, y)
    assert np.abs(X * X + Y * Y + Z * Z - 1).max() < 1e-14
    # truth via libm: lat = gd(t) = atan(sinh(t)), lng = x * c
    t = y.astype(np.float64) * S.IMP_TO_RAD
    lat = np.arctan(np.sinh(t))
    lng = x.astype(np.float64) * S.IMP_TO_RAD
    assert np.abs(X - np.cos(lat) * np.cos(lng)).max() < 1e-14
    assert np.abs(Y - np.cos(lat) * np.sin(lng)).max() < 1e-14
    assert np.abs(Z - np.sin(lat)).max() < 1e-14


def test_cell_anchors_and_ranges():
    # origin: lng=0, lat=0 -> +X face, u=v=0 -> s=t=0.5 -> center cell
    face, i, j, _ = S.s2_cell(np.array([0]), np.array([0]), LEVEL)
    assert face[0] == 0 and i[0] == 512 and j[0] == 512
    # lng=90E on the equator -> +Y face; lng=180 -> -X face
    face, _, _, _ = S.s2_cell(np.array([1 << 30, -I32 - 1]), np.array([0, 0]), LEVEL)
    assert face[0] == 1 and face[1] == 3
    # top of the mercator map (lat ~ +85) -> +Z face; bottom -> -Z
    face, _, _, _ = S.s2_cell(np.array([0, 0]), np.array([I32, -I32 - 1]), LEVEL)
    assert face[0] == 2 and face[1] == 5
    rng = np.random.default_rng(9)
    x = rng.integers(-I32 - 1, I32, 50000)
    y = rng.integers(-I32 - 1, I32, 50000)
    face, i, j, cell = S.s2_cell(x, y, LEVEL)
    n = 1 << LEVEL
    assert face.min() >= 0 and face.max() <= 5
    assert i.min() >= 0 and i.max() < n and j.min() >= 0 and j.max() < n
    assert cell.min() >= 0 and cell.max() < 6 * n * n
    # the id encodes (face, hilbert d) losslessly
    assert np.array_equal(cell >> (2 * LEVEL), face)


def test_hilbert_adjacency():
    """Consecutive Hilbert distances are edge-adjacent cells — the range-
    locality property that makes the id a storage sort key."""
    lvl = 5
    n = 1 << lvl
    ii, jj = np.meshgrid(np.arange(n, dtype=np.int64), np.arange(n, dtype=np.int64))
    i, j = ii.ravel(), jj.ravel()
    d = S._hilbert_d(i, j, lvl)
    order = np.argsort(d)
    assert np.array_equal(np.sort(d), np.arange(n * n))  # a bijection
    step = np.abs(np.diff(i[order])) + np.abs(np.diff(j[order]))
    assert (step == 1).all()


def test_s2_duckdb_bit_identical():
    x = _imp_grid(5001)
    g = np.stack(np.meshgrid(x[::50], x[::50]), axis=-1).reshape(-1, 2)
    pdf = pd.DataFrame({"x": g[:, 0], "y": g[:, 1]})
    face, i, j, cell = S.s2_cell(pdf["x"].to_numpy(), pdf["y"].to_numpy(), LEVEL)
    con = duckdb.connect()
    con.register("__s2_input__", pdf)
    ctes, final = S.s2_sql("x", "y", LEVEL)
    got = con.sql(
        f"with {ctes} select s2_face, s2_i, s2_j, s2_cell from ({final}) t"
    ).df()
    assert np.array_equal(got["s2_face"].to_numpy(), face)
    assert np.array_equal(got["s2_i"].to_numpy(), i)
    assert np.array_equal(got["s2_j"].to_numpy(), j)
    assert np.array_equal(got["s2_cell"].to_numpy(), cell)


def test_s2_spark_bit_identical(spark):
    x = _imp_grid(201)
    g = np.stack(np.meshgrid(x, x[::10]), axis=-1).reshape(-1, 2)
    pdf = pd.DataFrame({"x": g[:, 0], "y": g[:, 1]})
    face, i, j, cell = S.s2_cell(pdf["x"].to_numpy(), pdf["y"].to_numpy(), LEVEL)
    df = S.s2_cell_cols(spark.createDataFrame(pdf), "x", "y", LEVEL)
    got = df.select("s2_face", "s2_i", "s2_j", "s2_cell").toPandas()
    assert np.array_equal(got["s2_face"].to_numpy(), face)
    assert np.array_equal(got["s2_i"].to_numpy(), i)
    assert np.array_equal(got["s2_j"].to_numpy(), j)
    assert np.array_equal(got["s2_cell"].to_numpy(), cell)


def test_s2_hypothesis_bits():
    """Scalar path == array path, and the trig stays on the unit circle,
    for arbitrary imps (hypothesis sweep)."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=300, deadline=None)
    @given(
        st.integers(min_value=-(1 << 31), max_value=(1 << 31) - 1),
        st.integers(min_value=-(1 << 31), max_value=(1 << 31) - 1),
    )
    def inner(x, y):
        f1, i1, j1, c1 = S.s2_cell(np.array([x]), np.array([y]), LEVEL)
        f2, i2, j2, c2 = S.s2_cell(np.array([x, x]), np.array([y, y]), LEVEL)
        assert (f1[0], i1[0], j1[0], c1[0]) == (f2[1], i2[1], j2[1], c2[1])
        s, c = S.det_sincos_imp(np.array([x]))
        assert abs(s[0] * s[0] + c[0] * c[0] - 1) < 1e-15

    inner()
