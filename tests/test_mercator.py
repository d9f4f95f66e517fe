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
