"""Deterministic exp/cosh (mercator.det_exp*): the three implementations
— numpy kernel, Spark Column, generated DuckDB SQL — must be BIT-identical
on the full imp-latitude domain, and accurate to ~2 ulp of libm.

Why: libm exp() differs between engine BUILDS (the r01/r03 `box_area_m2`
driver-hash reds were green against local DuckDB but red against the
driver's), so every oracle-compared float that passes through the
Mercator scale factor now uses this exactly-specified IEEE op sequence
(fdlibm-style range reduction + degree-13 Horner) on all three engines.
"""

import math

import duckdb
import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from geodesk_spark.geo import mercator as M

I32 = (1 << 31) - 1


def _t_grid() -> np.ndarray:
    # imp-latitude t domain is [-pi, pi]; add exact zeros, tiny values,
    # range-reduction boundaries (odd multiples of ln2/2), and k extremes.
    half_ln2 = 0.5 * math.log(2)
    return np.concatenate(
        [
            np.linspace(-math.pi, math.pi, 100001),
            np.array([0.0, -0.0, 1e-300, -1e-300, 5e-324, -5e-324]),
            np.array([(2 * j + 1) * half_ln2 for j in range(-4, 4)]),
            np.nextafter(np.array([(2 * j + 1) * half_ln2 for j in range(-4, 4)]), np.inf),
            np.nextafter(np.array([(2 * j + 1) * half_ln2 for j in range(-4, 4)]), -np.inf),
        ]
    )


def test_det_exp_accuracy_vs_libm():
    ts = _t_grid()
    rel = np.abs(M.det_exp(ts) / np.exp(ts) - 1)
    assert rel.max() < 1e-15  # ~2 ulp


def test_det_exp_duckdb_bit_identical():
    ts = _t_grid()
    con = duckdb.connect()
    con.register("g", pd.DataFrame({"t": ts}))
    got = con.sql(f"select {M.det_exp_sql('t')} as v from g").df()["v"].to_numpy()
    assert np.array_equal(M.det_exp(ts).view(np.int64), got.view(np.int64))


def test_scale_duckdb_bit_identical():
    ys = np.concatenate(
        [np.linspace(-I32 - 1, I32, 50001), np.array([0.0, -1.0, 1.0, I32, -I32 - 1])]
    )
    con = duckdb.connect()
    con.register("g", pd.DataFrame({"y": ys}))
    got = con.sql(f"select {M.scale_sql('y')} as v from g").df()["v"].to_numpy()
    assert np.array_equal(M.scale(ys).view(np.int64), got.view(np.int64))


def test_scale_accuracy_vs_cosh():
    ys = np.linspace(-I32 - 1, I32, 50001)
    t = ys * 2 * math.pi / M.MAP_WIDTH
    rel = np.abs(M.scale(ys) / np.cosh(t) - 1)
    assert rel.max() < 1e-15


def test_scale_and_distance_spark_bit_identical(spark):
    ys = np.linspace(-I32 - 1, I32, 20001)
    df = spark.createDataFrame(pd.DataFrame({"y": ys}))
    got = df.select(M.scale_col(F.col("y")).alias("v")).toPandas()["v"].to_numpy()
    assert np.array_equal(M.scale(ys).view(np.int64), got.view(np.int64))

    rng = np.random.default_rng(7)
    x1, y1, x2, y2 = (rng.integers(-I32 - 1, I32, 5000).astype(np.float64) for _ in range(4))
    pdf = pd.DataFrame({"x1": x1, "y1": y1, "x2": x2, "y2": y2})
    dcol = (
        spark.createDataFrame(pdf)
        .select(M.distance_col(F.col("x1"), F.col("y1"), F.col("x2"), F.col("y2")).alias("d"))
        .toPandas()["d"]
        .to_numpy()
    )
    assert np.array_equal(M.distance(x1, y1, x2, y2).view(np.int64), dcol.view(np.int64))


def test_dist_sql_duckdb_bit_identical():
    from geodesk_spark.driver_queries.common import _dist_sql

    rng = np.random.default_rng(11)
    x1, y1, x2, y2 = (rng.integers(-I32 - 1, I32, 20000).astype(np.float64) for _ in range(4))
    con = duckdb.connect()
    con.register("g", pd.DataFrame({"x1": x1, "y1": y1, "x2": x2, "y2": y2}))
    got = (
        con.sql(f"select {_dist_sql('x1', 'y1', 'x2', 'y2')} as d from g")
        .df()["d"]
        .to_numpy()
    )
    assert np.array_equal(M.distance(x1, y1, x2, y2).view(np.int64), got.view(np.int64))


def test_det_exp_scalar_identities():
    assert float(M.det_exp(0.0)[()]) == 1.0
    assert float(M.scale(0)[()]) == 1.0
    y80 = M.y_from_lat(80.0)[()]
    assert float(M.scale(y80)[()]) == pytest.approx(float(M.scale(-y80)[()]))


def test_det_cosh_properties():
    """Property sweep: symmetry (exact — s=t² erases the sign), cosh ≥ 1,
    monotone in |t|, and NaN/inf propagation."""
    rng = np.random.default_rng(5)
    t = rng.uniform(-math.pi, math.pi, 200001)
    v = M.det_cosh(t)
    assert np.array_equal(v.view(np.int64), M.det_cosh(-t).view(np.int64))
    assert (v >= 1.0).all()
    ts = np.sort(np.abs(t))
    assert (np.diff(M.det_cosh(ts)) >= 0).all()
    assert np.isnan(M.det_cosh(np.array([np.nan]))[0])


def test_det_exp_hypothesis_bits():
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=300, deadline=None)
    @given(st.floats(min_value=-3.2, max_value=3.2, allow_nan=False))
    def inner(t):
        a = float(M.det_exp(t)[()])
        b = float(M.det_exp(np.array([t]))[0])
        assert np.float64(a).view(np.int64) == np.float64(b).view(np.int64)
        assert abs(a / math.exp(t) - 1) < 1e-14

    inner()
