"""Golden parity with the reference's MercatorTest
(/root/reference/src/test/java/com/geodesk/geom/MercatorTest.java)."""

import numpy as np
import pytest

from geodesk_spark.geo import mercator as M

I32_MIN = -(1 << 31)
I32_MAX = (1 << 31) - 1


def test_projection_extremes():
    # MercatorTest.java:18-31
    assert M.x_from_lon(-180.0)[()] == I32_MIN + 1
    assert M.x_from_lon(180.0)[()] == I32_MAX
    assert M.y_from_lat(-90.0)[()] == I32_MIN
    assert M.y_from_lat(90.0)[()] == I32_MAX
    assert M.y_from_lat(M.MIN_LAT)[()] == I32_MIN
    assert M.y_from_lat(M.MAX_LAT)[()] == I32_MAX


def test_precision7_roundtrip_extremes():
    # MercatorTest.java:38-46
    assert abs(M.lon_precision7_from_x(I32_MIN + 1)[()] - (-180)) < 1e-8
    assert abs(M.lon_precision7_from_x(I32_MAX)[()] - 180) < 1e-8
    min_lat7 = np.floor(M.MIN_LAT * 1e7 + 0.5) / 1e7
    max_lat7 = np.floor(M.MAX_LAT * 1e7 + 0.5) / 1e7
    assert abs(M.lat_precision7_from_y(I32_MIN)[()] - min_lat7) < 1e-8
    assert abs(M.lat_precision7_from_y(I32_MAX)[()] - max_lat7) < 1e-8


def test_out_of_range_raises():
    # Mercator.java:67-70, :96-106
    with pytest.raises(ValueError):
        M.x_from_lon(181.0)
    with pytest.raises(ValueError):
        M.y_from_lat(999999.0)
    with pytest.raises(ValueError):
        M.y_from_lat(-999999.0)


@pytest.mark.parametrize(
    "lon100nd,lat100nd",
    [
        (83704807, 500588692),
        (-1_800_000_000, 0),
        (1_800_000_000, 0),
        (0, -850_500_000),
        (0, 850_500_000),
        (91481598, 487725903),
        (113229885, 481728684),
    ],
)
def test_100nd_roundtrip(lon100nd, lat100nd):
    # MercatorTest.java:243-258 — project then invert at 100-nanodegree precision.
    lon = lon100nd / 1e7
    lat = lat100nd / 1e7
    x = M.x_from_lon(lon)[()]
    y = M.y_from_lat(lat)[()]
    assert int(np.floor(M.lon_from_x(x)[()] * 1e7 + 0.5)) == lon100nd
    assert int(np.floor(M.lat_from_y(y)[()] * 1e7 + 0.5)) == lat100nd


def test_reverse_precision7():
    # MercatorTest.java:225-235
    for lon, lat in [(0, 0), (-180, 80), (180, -80), (0, M.MAX_LAT), (0, M.MIN_LAT), (0, 85), (0, -85)]:
        x = M.x_from_lon(float(lon))[()]
        y = M.y_from_lat(float(lat))[()]
        assert abs(M.lon_precision7_from_x(x)[()] - lon) < 1e-7
        assert abs(M.lat_precision7_from_y(y)[()] - lat) < 1e-7


def test_scale_and_meters():
    # scale(0) == 1 at the equator; cosh symmetry.
    assert M.scale(0)[()] == 1.0
    y80 = M.y_from_lat(80.0)[()]
    assert M.scale(y80)[()] == pytest.approx(M.scale(-y80)[()])
    # deltaFromMeters inverts metersAtY.
    d = M.delta_from_meters(5000.0, y80)[()]
    assert d * M.meters_at_y(y80)[()] == pytest.approx(5000.0)


def test_distance_equator():
    # 1 degree of longitude at the equator ≈ 111.32 km.
    x1 = M.x_from_lon(0.0)[()]
    x2 = M.x_from_lon(1.0)[()]
    d = M.distance(x1, 0, x2, 0)[()]
    assert d == pytest.approx(111_319.5, rel=1e-3)


def test_vectorized_matches_scalar():
    lons = np.linspace(-180, 180, 1001)
    lats = np.linspace(-85, 85, 1001)
    xv = M.x_from_lon(lons)
    yv = M.y_from_lat(lats)
    for i in [0, 1, 500, 999, 1000]:
        assert xv[i] == M.x_from_lon(float(lons[i]))[()]
        assert yv[i] == M.y_from_lat(float(lats[i]))[()]


def test_project_unproject_rings():
    """Geometry transforms (Mercator.java:303-352): project stores the
    ROUNDED int imps as doubles; unproject is the exact inverse map."""
    ring = np.array(
        [[31.24, 30.04], [31.50, 30.04], [31.50, 30.30], [31.24, 30.30], [31.24, 30.04]]
    )
    [projected] = M.project_rings([ring])
    assert projected.dtype == np.float64
    for i in range(len(ring)):
        assert projected[i, 0] == float(M.x_from_lon(ring[i, 0])[()])
        assert projected[i, 1] == float(M.y_from_lat(ring[i, 1])[()])
        assert projected[i, 0] == np.floor(projected[i, 0])  # rounded ints
    [back] = M.unproject_rings([projected])
    # int32 quantization ≈ 0.0839 m/imp; 1e-7 deg ≈ 1.1 cm — round-trip
    # accurate to the 7-decimal output precision
    assert np.allclose(back, ring, atol=1.5e-7)


def test_expand_envelope():
    """Mercator.java:266-271: expandBy(deltaFromMeters(m, midY))."""
    x1, y1 = int(M.x_from_lon(31.0)[()]), int(M.y_from_lat(30.0)[()])
    x2, y2 = int(M.x_from_lon(32.0)[()]), int(M.y_from_lat(31.0)[()])
    minx, miny, maxx, maxy = M.expand_envelope(x1, y1, x2, y2, 1000.0)
    d = float(M.delta_from_meters(1000.0, (y1 + y2) / 2)[()])
    assert (minx, miny, maxx, maxy) == (x1 - d, y1 - d, x2 + d, y2 + d)
    # symmetric for negative latitudes
    ys = int(M.y_from_lat(-30.0)[()])
    out = M.expand_envelope(x1, ys, x2, ys + 100, 500.0)
    assert out[0] < x1 and out[2] > x2


def test_envelope_corner_order():
    """Mercator.envelope normalizes corner order (JTS Envelope ctor)."""
    a = M.envelope(32.0, 31.0, 31.0, 30.0)
    b = M.envelope(31.0, 30.0, 32.0, 31.0)
    assert a == b
    assert a[0] < a[2] and a[1] < a[3]


def test_expand_envelope_cols_match_numpy(spark):
    from pyspark.sql import functions as F

    rows = [(int(M.x_from_lon(l)[()]), int(M.y_from_lat(b)[()]),
             int(M.x_from_lon(l + 1)[()]), int(M.y_from_lat(b + 1)[()]))
            for l, b in [(31.0, 30.0), (-74.0, 40.0), (139.0, -35.0)]]
    df = spark.createDataFrame(rows, "minx int, miny int, maxx int, maxy int")
    e = M.expand_envelope_cols(
        F.col("minx"), F.col("miny"), F.col("maxx"), F.col("maxy"), F.lit(1000.0)
    )
    got = df.select(*[c.alias(f"c{i}") for i, c in enumerate(e)]).collect()
    for (minx, miny, maxx, maxy), r in zip(rows, got):
        want = M.expand_envelope(minx, miny, maxx, maxy, 1000.0)
        assert (r.c0, r.c1, r.c2, r.c3) == want


def test_great_circle_matches_libm_haversine():
    """geodesic.great_circle_m vs a straight libm haversine on random
    points: ≤2e-14 relative (the det kernels are ~1 ulp), plus meridian
    and equator closed forms."""
    import math

    import numpy as np

    from geodesk_spark.geo import geodesic, mercator

    rng = np.random.default_rng(5)
    lon1, lat1 = rng.uniform(-180, 180, 500), rng.uniform(-85, 85, 500)
    lon2, lat2 = rng.uniform(-180, 180, 500), rng.uniform(-85, 85, 500)
    x1, y1 = mercator.x_from_lon(lon1), mercator.y_from_lat(lat1)
    x2, y2 = mercator.x_from_lon(lon2), mercator.y_from_lat(lat2)
    got = geodesic.great_circle_m(x1, y1, x2, y2)
    R = mercator.EARTH_CIRCUMFERENCE / (2 * math.pi)
    # haversine on the imp-quantized coordinates (imps round the input)
    la1 = 2 * np.arctan(np.exp(np.asarray(y1, float) * math.pi / 2**31)) - math.pi / 2
    la2 = 2 * np.arctan(np.exp(np.asarray(y2, float) * math.pi / 2**31)) - math.pi / 2
    dl = (np.asarray(x2, float) - np.asarray(x1, float)) * math.pi / 2**31
    a = np.sin((la2 - la1) / 2) ** 2 + np.cos(la1) * np.cos(la2) * np.sin(dl / 2) ** 2
    ref = 2 * R * np.arcsin(np.minimum(np.sqrt(a), 1.0))
    rel = np.abs(got - ref) / np.maximum(ref, 1.0)
    assert rel.max() < 2e-14

    # quarter meridian: equator -> pole-ish (85°) along one meridian
    xq = mercator.x_from_lon(np.array([10.0, 10.0]))
    yq = mercator.y_from_lat(np.array([0.0, 45.0]))
    d45 = geodesic.great_circle_m(xq[:1], yq[:1], xq[1:], yq[1:])[0]
    assert abs(d45 - R * math.pi / 4) < 50  # imp quantization ~ meters
    # equator arc: 90° of longitude at lat 0 = quarter circumference
    xe = mercator.x_from_lon(np.array([0.0, 90.0]))
    ye = mercator.y_from_lat(np.array([0.0, 0.0]))
    de = geodesic.great_circle_m(xe[:1], ye[:1], xe[1:], ye[1:])[0]
    assert abs(de - mercator.EARTH_CIRCUMFERENCE / 4) < 50
