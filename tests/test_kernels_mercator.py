"""Golden-constant parity tests for tile/projection math (FIXTURES.md §5)."""

import numpy as np
import pytest

from robosat_spark.kernels import mercator as M

# First vertex of parking fixture feature 0
# (/root/reference/tests/fixtures/parking/features.geojson)
V0 = (-82.8224934, 34.6787452)


def test_mercator_golden_constant():
    # /root/reference/tests/tools/test_rasterize.py:60 asserts int(x) == -9219757
    x, y = M.lonlat_to_mercator(V0[0], V0[1])
    assert int(x) == -9219757


def test_mercator_roundtrip():
    lon = np.array([-180.0, -82.8224934, 0.0, 13.37, 179.9])
    lat = np.array([-84.9, 34.6787452, 0.0, 52.5, 84.9])
    x, y = M.lonlat_to_mercator(lon, lat)
    lon2, lat2 = M.mercator_to_lonlat(x, y)
    np.testing.assert_allclose(lon2, lon, atol=1e-9)
    np.testing.assert_allclose(lat2, lat, atol=1e-9)


def test_tile_of_parking_vertex():
    # parking fixture tiles.csv contains (70762, 104119, 18) — the tile that
    # rasterizes non-zero for feature 0 (/root/reference/tests/tools/test_rasterize.py:20-49)
    x, y = M.lonlat_to_tile(V0[0], V0[1], 18)
    assert (int(x), int(y)) == (70762, 104119)


def test_tile_bounds_contains_vertex():
    w, s, e, n = M.tile_bounds(70762, 104119, 18)
    assert w <= V0[0] <= e
    assert s <= V0[1] <= n


def test_tile_xy_bounds_monotonic():
    l, b, r, t = M.tile_xy_bounds(70762, 104119, 18)
    assert l < r and b < t
    # tile is ~152.87 m wide at z18
    assert r - l == pytest.approx(2 * M.ORIGIN_SHIFT / 2**18)


def test_pixel_to_location_corners():
    # dy=0 -> south edge, dy=1 -> north edge (robosat/tiles.py:19-42 lerp)
    lon0, lat0 = M.pixel_to_location(70762, 104119, 18, 0.0, 0.0)
    lon1, lat1 = M.pixel_to_location(70762, 104119, 18, 1.0, 1.0)
    w, s, e, n = M.tile_bounds(70762, 104119, 18)
    assert (lon0, lat0) == (pytest.approx(w), pytest.approx(s))
    assert (lon1, lat1) == (pytest.approx(e), pytest.approx(n))


def test_pack_unpack_roundtrip():
    xs = np.array([0, 70762, 2**18 - 1], dtype=np.int64)
    ys = np.array([0, 104119, 2**18 - 1], dtype=np.int64)
    tid = M.pack_tile_id(xs, ys, 18)
    z, x, y = M.unpack_tile_id(tid)
    assert np.all(z == 18) and np.all(x == xs) and np.all(y == ys)


def test_quadkey_known():
    # Bing documented example: tile (3, 5, 3) -> "213"
    assert M.quadkey(3, 5, 3) == "213"


def test_morton_locality():
    a, _ = M.morton_cell(np.array([5]), np.array([5]), 4)
    b, _ = M.morton_cell(np.array([5]), np.array([6]), 4)
    c, _ = M.morton_cell(np.array([15]), np.array([0]), 4)
    assert abs(int(a[0]) - int(b[0])) < abs(int(a[0]) - int(c[0]))


def test_neighbors_eight():
    n = M.neighbors(70762, 104119, 18)
    assert len(n) == 8
    assert (70763, 104119, 18) in n and (70761, 104120, 18) in n


def test_neighbors_clipped_at_origin():
    assert len(M.neighbors(0, 0, 2)) == 3


def test_mollweide_equal_area_sanity():
    # Mollweide equator scale: x(90E, 0) = R * 2*sqrt(2)/pi * (pi/2)
    x, y = M.project_mollweide(90.0, 0.0)
    assert x == pytest.approx(M.R * np.sqrt(2.0), rel=1e-9)
    assert y == pytest.approx(0.0, abs=1e-6)
    # poles map to y = ±R*sqrt(2)
    _, yp = M.project_mollweide(0.0, 90.0)
    assert yp == pytest.approx(M.R * np.sqrt(2.0), rel=1e-9)


def test_epsg3395_vs_spherical():
    # ellipsoidal mercator y differs from spherical by the eccentricity term;
    # at the equator both are 0, x identical
    x1, y1 = M.lonlat_to_mercator(10.0, 0.0)
    x2, y2 = M.project_epsg3395(10.0, 0.0)
    assert x1 == pytest.approx(x2)
    assert y1 == pytest.approx(0.0, abs=1e-9) and y2 == pytest.approx(0.0, abs=1e-9)
    # at 45N ellipsoidal y < spherical y (WGS84 flattening)
    _, ys = M.lonlat_to_mercator(0.0, 45.0)
    _, ye = M.project_epsg3395(0.0, 45.0)
    assert ye < ys
