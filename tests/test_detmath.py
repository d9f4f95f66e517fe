"""Deterministic ln/atanh/atan2 (geo/detmath.py): numpy kernel, Spark
Column builder, and DuckDB SQL twin must be BIT-identical, and accurate
to ~2 ulp of libm — the inverse-direction counterpart of test_det_exp.
"""

import math

import duckdb
import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from geodesk_spark.geo import detmath as D


def _ln_grid() -> np.ndarray:
    # wide dynamic range + ladder boundaries (exact powers of two and
    # their √2 fold points) + values just above/below them
    pows = np.array([2.0**k for k in range(-64, 65, 4)])
    folds = pows * math.sqrt(2.0)
    return np.concatenate(
        [
            np.geomspace(2.0**-64, 2.0**64, 30001),
            pows,
            folds,
            np.nextafter(pows, np.inf),
            np.nextafter(pows, 0),
            np.array([1.0, 2.0, 0.5, math.e, 1e-9, 1e9]),
        ]
    )


def _at_grid() -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(17)
    y = np.concatenate(
        [
            rng.normal(0, 1e3, 20000),
            np.array([0.0, -0.0, 1.0, -1.0, 0.4142135623730951, 1e300, -1e300, 1e-300]),
        ]
    )
    x = np.concatenate(
        [
            rng.normal(0, 1e3, 20000),
            np.array([1.0, 1.0, 0.0, -0.0, 1.0, -1e300, 1e300, -1e-300]),
        ]
    )
    # boundary-octant pairs: |y| == |x|·tan(π/8) territory
    t = np.linspace(-math.pi, math.pi, 1000)
    return np.concatenate([y, np.sin(t)]), np.concatenate([x, np.cos(t)])


def test_det_ln_accuracy_vs_libm():
    xs = _ln_grid()
    rel = np.abs(D.det_ln(xs) - np.log(xs))
    # absolute near ln≈0, relative elsewhere
    scale = np.maximum(np.abs(np.log(xs)), 1.0)
    assert (rel / scale).max() < 5e-16


def test_det_atanh_accuracy():
    z = np.linspace(-0.999, 0.999, 100001)
    err = np.abs(D.det_atanh(z) - np.arctanh(z))
    assert (err / np.maximum(np.abs(np.arctanh(z)), 1.0)).max() < 1e-15


def test_det_atan2_accuracy_vs_libm():
    y, x = _at_grid()
    err = np.abs(D.det_atan2(y, x) - np.arctan2(y, x))
    assert err.max() < 1e-15
    # quadrant anchors
    assert D.det_atan2(np.array([0.0]), np.array([-1.0]))[0] == math.pi
    assert D.det_atan2(np.array([-0.0]), np.array([1.0]))[0] == 0.0
    assert abs(D.det_atan2(np.array([1.0]), np.array([0.0]))[0] - math.pi / 2) < 1e-16


def test_det_ln_duckdb_bit_identical():
    xs = _ln_grid()
    con = duckdb.connect()
    con.register("g", pd.DataFrame({"x": xs}))
    ctes, expr = D.det_ln_sql("x", "a", "g")
    got = con.sql(f"with {ctes} select {expr} as v from ln_a_fin").df()["v"].to_numpy()
    assert np.array_equal(D.det_ln(xs).view(np.int64), got.view(np.int64))


def test_det_atan2_duckdb_bit_identical():
    y, x = _at_grid()
    con = duckdb.connect()
    con.register("g", pd.DataFrame({"y": y, "x": x}))
    ctes, expr = D.det_atan2_sql("y", "x", "a", "g")
    got = con.sql(f"with {ctes} select {expr} as v from at2_a_fin").df()["v"].to_numpy()
    assert np.array_equal(D.det_atan2(y, x).view(np.int64), got.view(np.int64))


def test_det_atanh_duckdb_bit_identical():
    z = np.linspace(-0.9999, 0.9999, 20001)
    con = duckdb.connect()
    con.register("g", pd.DataFrame({"z": z}))
    ctes, expr = D.det_atanh_sql("z", "a", "g")
    got = con.sql(f"with {ctes} select {expr} as v from ln_a_fin").df()["v"].to_numpy()
    assert np.array_equal(D.det_atanh(z).view(np.int64), got.view(np.int64))


def test_det_ln_atan2_spark_bit_identical(spark):
    xs = _ln_grid()[::10]
    df = spark.createDataFrame(pd.DataFrame({"x": xs}))
    got = (
        D.det_ln_cols(df, F.col("x"), "v").select("v").toPandas()["v"].to_numpy()
    )
    assert np.array_equal(D.det_ln(xs).view(np.int64), got.view(np.int64))

    y, x = _at_grid()
    y, x = y[::5], x[::5]
    df2 = spark.createDataFrame(pd.DataFrame({"y": y, "x": x}))
    got2 = (
        D.det_atan2_cols(df2, F.col("y"), F.col("x"), "v")
        .select("v")
        .toPandas()["v"]
        .to_numpy()
    )
    assert np.array_equal(D.det_atan2(y, x).view(np.int64), got2.view(np.int64))

    z = np.linspace(-0.9999, 0.9999, 2001)
    df3 = spark.createDataFrame(pd.DataFrame({"z": z}))
    got3 = (
        D.det_atanh_cols(df3, F.col("z"), "v").select("v").toPandas()["v"].to_numpy()
    )
    assert np.array_equal(D.det_atanh(z).view(np.int64), got3.view(np.int64))


def test_det_math_hypothesis_bits():
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=300, deadline=None)
    @given(st.floats(min_value=1e-18, max_value=1e18))
    def inner_ln(x):
        a = float(D.det_ln(x)[()])
        assert abs(a - math.log(x)) <= 5e-16 * max(abs(math.log(x)), 1.0)

    @settings(max_examples=300, deadline=None)
    @given(
        st.floats(min_value=-1e9, max_value=1e9),
        st.floats(min_value=-1e9, max_value=1e9),
    )
    def inner_at2(y, x):
        a = float(D.det_atan2(y, x)[()])
        # +0.0 mirrors the kernel's signed-zero normalization (see
        # det_atan2 docstring — the zero's sign bit isn't cross-engine
        # stable, so the kernel erases it on every engine identically)
        assert abs(a - math.atan2(y + 0.0, x + 0.0)) < 1e-15

    inner_ln()
    inner_at2()


def test_destination_point_laws(spark):
    """Forward-geodesic laws: round-trip through great_circle_m
    recovers the distance to sub-meter accuracy; bearing 0 moves north
    (y up, x fixed); bearing 90 along the equator moves east by d/R
    radians; antipodal-capped distances stay finite; numpy, Column and
    SQL agree bit-for-bit (the suite's det contract)."""
    import numpy as np

    from geodesk_spark.geo import geodesic, mercator

    xs = np.array([0, 500_000_000, -1_000_000_000, 2_000_000_000], float)
    ys = np.array([0, 300_000_000, -800_000_000, 1_500_000_000], float)
    d = np.array([1000.0, 50_000.0, 500_000.0, 2_000_000.0])
    xi, yi = geodesic.destination_point(xs, ys, 37.0, d)
    back = geodesic.great_circle_m(xs, ys, xi.astype(float), yi.astype(float))
    assert np.all(np.abs(back - d) < 1.0)

    # north: x unchanged (within the 1-imp floor), y strictly up
    xn, yn = geodesic.destination_point(xs[:1], ys[:1], 0.0, d[:1])
    assert abs(int(xn[0])) <= 1 and yn[0] > 0
    # east along the equator: dx = d/R in imp angle units
    xe, ye = geodesic.destination_point(
        np.array([0.0]), np.array([0.0]), 90.0, np.array([111_194.9])
    )
    expect = 111_194.9 / (mercator.EARTH_CIRCUMFERENCE / (2 * np.pi))
    assert abs(xe[0] * (np.pi / 2**31) - expect) < 1e-6
    assert abs(int(ye[0])) <= 1

    # engine parity (Column vs numpy)
    import pandas as pd
    from pyspark.sql import functions as F

    pdf = pd.DataFrame({"id": range(4), "x": xs.astype(np.int64),
                        "y": ys.astype(np.int64), "dist_m": d})
    out = geodesic.destination_cols(
        spark.createDataFrame(pdf), F.col("x"), F.col("y"),
        F.col("dist_m"), 37.0, "dx_imp", "dy_imp",
    ).select("id", "dx_imp", "dy_imp").toPandas().sort_values("id")
    assert list(out.dx_imp) == list(xi) and list(out.dy_imp) == list(yi)


def test_intermediate_points_laws(spark):
    """Slerp laws: the f=0.5 point is equidistant from both ends, the
    f and 1−f points are reflections (d(A, P_f) = d(P_{1−f}, B)),
    fraction distances are proportional, the degenerate pair returns
    the start, and Column output matches numpy bit-for-bit."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    from geodesk_spark.geo import geodesic

    x1 = np.array([0, 500_000_000, -1_000_000_000, 7], float)
    y1 = np.array([0, 300_000_000, -800_000_000, 9], float)
    x2 = np.array([800_000_000, -400_000_000, 1_500_000_000, 7], float)
    y2 = np.array([100_000_000, 900_000_000, -200_000_000, 9], float)
    xi, yi = geodesic.intermediate_points(x1, y1, x2, y2, [0.25, 0.5, 0.75])
    total = geodesic.great_circle_m(x1, y1, x2, y2)
    for k, f in enumerate([0.25, 0.5, 0.75]):
        da = geodesic.great_circle_m(x1, y1, xi[k].astype(float), yi[k].astype(float))
        # proportionality within a meter over continental distances
        assert np.all(np.abs(da[:3] - f * total[:3]) < 1.0), f
    # degenerate pair → start point (within the floor imp)
    assert abs(xi[1][3] - 7) <= 1 and abs(yi[1][3] - 9) <= 1

    pdf = pd.DataFrame({"id": range(4), "x1": x1.astype(np.int64),
                        "y1": y1.astype(np.int64), "x2": x2.astype(np.int64),
                        "y2": y2.astype(np.int64)})
    out = geodesic.intermediate_cols(
        spark.createDataFrame(pdf), F.col("x1"), F.col("y1"),
        F.col("x2"), F.col("y2"), 0.5, "mx", "my",
    ).select("id", "mx", "my").toPandas().sort_values("id")
    assert list(out.mx) == list(xi[1]) and list(out.my) == list(yi[1])


def test_initial_bearing_laws(spark):
    """Inverse-azimuth laws: compass anchors (due north/east from the
    equator), destination→bearing round trip within 0.01°, and Column
    output matches numpy bit-for-bit."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    from geodesk_spark.geo import geodesic

    z = np.array([0.0])
    # due east along the equator, due north up the meridian
    b_e = geodesic.initial_bearing_microdeg(z, z, np.array([1e8]), z)
    b_n = geodesic.initial_bearing_microdeg(z, z, z, np.array([1e8]))
    assert abs(b_e[0] / 1e6 - 90.0) < 1e-3
    assert min(b_n[0] / 1e6, 360 - b_n[0] / 1e6) < 1e-3

    xs = np.array([0, 500_000_000, -1_000_000_000], float)
    ys = np.array([0, 300_000_000, -800_000_000], float)
    d = np.array([200_000.0] * 3)
    for t in [0.0, 37.0, 245.5]:
        xi, yi = geodesic.destination_point(xs, ys, t, d)
        b = geodesic.initial_bearing_microdeg(xs, ys, xi.astype(float), yi.astype(float))
        err = np.abs(b / 1e6 - t)
        assert np.all(np.minimum(err, 360 - err) < 0.01), t

    xi, yi = geodesic.destination_point(xs, ys, 37.0, d)
    exp = geodesic.initial_bearing_microdeg(xs, ys, xi.astype(float), yi.astype(float))
    pdf = pd.DataFrame({"id": range(3), "x1": xs.astype(np.int64),
                        "y1": ys.astype(np.int64), "x2": xi, "y2": yi})
    out = geodesic.initial_bearing_cols(
        spark.createDataFrame(pdf), F.col("x1"), F.col("y1"),
        F.col("x2"), F.col("y2"), "brg",
    ).select("id", "brg").toPandas().sort_values("id")
    assert list(out.brg) == list(exp)
