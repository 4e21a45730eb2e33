"""Lambert conformal conic, polar stereographic, and datum-shifted CRS
support (reference delegates all of these to pyproj/PROJ,
/root/reference/atlite/gis.py:87-101; LCC is CORDEX's native grid,
/root/reference/atlite/datasets/cordex.py)."""

import numpy as np
import pandas as pd
import pytest

from atlite_tpu.gis import crs

NEW_CODES = [3034, 2154, 31370, 27700, 3413, 3031]


def test_lcc_natural_origins():
    # EPSG registry: projection natural origin maps to (FE, FN) exactly
    x, y = crs.transform_points([10.0], [52.0], 4326, 3034)
    np.testing.assert_allclose([x[0], y[0]], [4000000.0, 2800000.0], atol=1e-6)
    x, y = crs.transform_points([3.0], [46.5], 4326, 2154)
    np.testing.assert_allclose([x[0], y[0]], [700000.0, 6600000.0], atol=1e-6)


@pytest.mark.parametrize("code,lon,lat", [
    (3034, [-10.0, 25.0], [35.0, 65.0]),
    (2154, [-4.5, 8.0], [42.0, 51.0]),
    (31370, [2.6, 6.4], [49.5, 51.5]),
    (27700, [-7.0, 1.8], [50.0, 58.6]),
    (3413, [-45.0, 120.0], [65.0, 88.0]),
    (3031, [0.0, -150.0], [-65.0, -89.0]),
])
def test_roundtrip(code, lon, lat):
    lon, lat = np.asarray(lon), np.asarray(lat)
    x, y = crs.transform_points(lon, lat, 4326, code)
    lon2, lat2 = crs.transform_points(x, y, code, 4326)
    # datum-shifted codes round-trip through the first-order Helmert
    # inverse: ~5e-8 deg (~5 mm); pure-projection codes hit f64 round-off
    tol = 1e-7 if code in (31370, 27700) else 1e-10
    np.testing.assert_allclose(lon2, lon, atol=tol)
    np.testing.assert_allclose(lat2, lat, atol=tol)


def _scale_factors(code, lon, lat, d=1e-6):
    """Numerical local scale along meridian (h) and parallel (k)."""
    a, f = crs.ELLIPSOIDS["grs80"]
    e2 = f * (2 - f)
    phi = np.radians(lat)
    sin2 = np.sin(phi) ** 2
    M = a * (1 - e2) / (1 - e2 * sin2) ** 1.5    # meridian radius
    N = a / np.sqrt(1 - e2 * sin2)               # prime-vertical radius
    x0, y0 = crs.transform_points([lon], [lat], 4326, code)
    xdp, ydp = crs.transform_points([lon], [lat + d], 4326, code)
    xdl, ydl = crs.transform_points([lon + d], [lat], 4326, code)
    dd = np.radians(d)
    h = np.hypot(xdp[0] - x0[0], ydp[0] - y0[0]) / (M * dd)
    k = np.hypot(xdl[0] - x0[0], ydl[0] - y0[0]) / (N * np.cos(phi) * dd)
    return h, k


def test_lcc_scale_unity_on_standard_parallels():
    # the defining property of LCC-2SP: k = 1 along both std parallels
    for lat in (35.0, 65.0):
        h, k = _scale_factors(3034, 12.0, lat)
        np.testing.assert_allclose(k, 1.0, rtol=1e-6)
        np.testing.assert_allclose(h, 1.0, rtol=1e-6)


def test_lcc_conformal_between_parallels():
    # conformality: h == k everywhere (and < 1 strictly between parallels)
    for lat in (40.0, 52.0, 60.0):
        h, k = _scale_factors(3034, 5.0, lat)
        np.testing.assert_allclose(h, k, rtol=1e-6)
        assert k < 1.0


def test_osgb_projection_worked_example():
    """OS 'A guide to coordinate systems in Great Britain' worked example
    (OSGB36 datum coordinates, projection step only): lat 52d39'27.2531\",
    lon 1d43'4.5177\" -> E 651409.903, N 313177.270."""
    fwd, inv = crs._make_tmerc(-2.0, 0.9996012717, 400000.0, -100000.0,
                               lat0=49.0, ellps="airy")
    lat = 52 + 39 / 60 + 27.2531 / 3600
    lon = 1 + 43 / 60 + 4.5177 / 3600
    x, y = fwd(np.array([lon]), np.array([lat]))
    np.testing.assert_allclose(x[0], 651409.903, atol=1e-3)
    np.testing.assert_allclose(y[0], 313177.270, atol=1e-3)
    lon2, lat2 = inv(x, y)
    np.testing.assert_allclose([lon2[0], lat2[0]], [lon, lat], atol=1e-9)


def test_osgb_datum_shift_anchor():
    # Greenwich Royal Observatory (WGS84 ~ -0.0014, 51.4779) lies at
    # ~E 538890 N 177330 on the British National Grid; single-Helmert
    # accuracy is the published few-meter level
    x, y = crs.transform_points([-0.0014], [51.4779], 4326, 27700)
    assert abs(x[0] - 538890) < 15 and abs(y[0] - 177330) < 15


def test_polar_stereo_poles_and_axes():
    x, y = crs.transform_points([0.0], [90.0], 4326, 3413)
    np.testing.assert_allclose([x[0], y[0]], [0.0, 0.0], atol=1e-6)
    x, y = crs.transform_points([0.0], [-90.0], 4326, 3031)
    np.testing.assert_allclose([x[0], y[0]], [0.0, 0.0], atol=1e-6)
    # 3413: along lon0=-45 the point lies on the negative y axis
    x, y = crs.transform_points([-45.0], [80.0], 4326, 3413)
    assert abs(x[0]) < 1e-6 and y[0] < 0
    # 3031 (south): along lon=0 northing is positive
    x, y = crs.transform_points([0.0], [-80.0], 4326, 3031)
    assert abs(x[0]) < 1e-6 and y[0] > 0


def test_polar_stereo_scale_at_lat_ts():
    a, f = crs.ELLIPSOIDS["wgs84"]
    e2 = f * (2 - f)
    for code, lat in ((3413, 70.0), (3031, -71.0)):
        d = 1e-6
        x0, y0 = crs.transform_points([10.0], [lat], 4326, code)
        x1, y1 = crs.transform_points([10.0 + d], [lat], 4326, code)
        N = a / np.sqrt(1 - e2 * np.sin(np.radians(lat)) ** 2)
        k = (np.hypot(x1[0] - x0[0], y1[0] - y0[0])
             / (N * np.cos(np.radians(lat)) * np.radians(d)))
        np.testing.assert_allclose(k, 1.0, rtol=1e-6)


def test_proj4_lcc_matches_epsg():
    s = ("+proj=lcc +lat_1=44 +lat_2=49 +lat_0=46.5 +lon_0=3 "
         "+x_0=700000 +y_0=6600000 +ellps=GRS80")
    x1, y1 = crs.transform_points([2.35], [48.85], 4326, s)
    x2, y2 = crs.transform_points([2.35], [48.85], 4326, 2154)
    np.testing.assert_allclose([x1[0], y1[0]], [x2[0], y2[0]], atol=1e-9)


def test_proj4_polar_stereo_matches_epsg():
    s = "+proj=stere +lat_0=90 +lat_ts=70 +lon_0=-45 +x_0=0 +y_0=0 +ellps=WGS84"
    x1, y1 = crs.transform_points([10.0], [75.0], 4326, s)
    x2, y2 = crs.transform_points([10.0], [75.0], 4326, 3413)
    np.testing.assert_allclose([x1[0], y1[0]], [x2[0], y2[0]], atol=1e-9)


def test_epsg_coverage_breadth():
    """>= 10 common EPSG codes resolve through transform_points."""
    codes = [4326, 4258, 3035, 3857, 3034, 2154, 31370, 27700, 3413, 3031,
             32630, 25832]
    for code in codes:
        x, y = crs.transform_points([5.0 if code not in (3031,) else 0.0],
                                    [50.0 if code not in (3413, 3031) else
                                     (80.0 if code == 3413 else -80.0)],
                                    4326, code)
        assert np.isfinite(x).all() and np.isfinite(y).all()


def test_transform_points_xp_jit():
    """The new families lower under jit (device availability path)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def f(x, y):
        return crs.transform_points_xp(x, y, 4326, 3034, jnp)

    x, y = f(jnp.asarray([10.0]), jnp.asarray([52.0]))
    np.testing.assert_allclose(np.asarray(x)[0], 4000000.0, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(y)[0], 2800000.0, rtol=1e-6)


# ---------------------------------------------------------------------------
# rotated pole (CORDEX native grids)
# ---------------------------------------------------------------------------
EURO_CORDEX = {"grid_north_pole_longitude": -162.0,
               "grid_north_pole_latitude": 39.25}


def test_rotated_pole_euro_cordex_anchors():
    # the EURO-CORDEX rotated origin lies at true (pole_lon+180, 90-pole_lat)
    lon, lat = crs.transform_points([0.0], [0.0], EURO_CORDEX, 4326)
    np.testing.assert_allclose([lon[0], lat[0]], [18.0, 50.75], atol=1e-9)
    rlon, rlat = crs.transform_points([18.0], [50.75], 4326, EURO_CORDEX)
    np.testing.assert_allclose([rlon[0], rlat[0]], [0.0, 0.0], atol=1e-9)
    # the true north pole lies 90-pole_lat=50.75 deg up the rotated prime
    # meridian from the origin: rotated (0, pole_lat)
    rlon, rlat = crs.transform_points([0.0], [90.0], 4326, EURO_CORDEX)
    np.testing.assert_allclose(rlon[0], 0.0, atol=1e-9)
    np.testing.assert_allclose(rlat[0], 39.25, atol=1e-9)


def test_rotated_pole_roundtrip_and_isometry():
    rng = np.random.default_rng(3)
    lon = rng.uniform(-25, 45, 50)
    lat = rng.uniform(30, 72, 50)
    rlon, rlat = crs.transform_points(lon, lat, 4326, EURO_CORDEX)
    lon2, lat2 = crs.transform_points(rlon, rlat, EURO_CORDEX, 4326)
    np.testing.assert_allclose(lon2, lon, atol=1e-9)
    np.testing.assert_allclose(lat2, lat, atol=1e-9)

    # a pure rotation preserves angular distances between any two points
    def ang(lo1, la1, lo2, la2):
        lo1, la1, lo2, la2 = map(np.radians, (lo1, la1, lo2, la2))
        return np.arccos(np.clip(
            np.sin(la1) * np.sin(la2)
            + np.cos(la1) * np.cos(la2) * np.cos(lo1 - lo2), -1, 1))

    d_true = ang(lon[:-1], lat[:-1], lon[1:], lat[1:])
    d_rot = ang(rlon[:-1], rlat[:-1], rlon[1:], rlat[1:])
    np.testing.assert_allclose(d_rot, d_true, atol=1e-12)


def test_rotated_pole_proj4_ob_tran():
    s = ("+proj=ob_tran +o_proj=longlat +o_lat_p=39.25 +lon_0=18.0 "
         "+o_lon_p=0")
    lon, lat = crs.transform_points([0.0], [0.0], s, 4326)
    np.testing.assert_allclose([lon[0], lat[0]], [18.0, 50.75], atol=1e-9)


def test_rotated_pole_under_jit():
    import jax
    import jax.numpy as jnp

    @jax.jit
    def f(x, y):
        return crs.transform_points_xp(
            x, y, ("rotpole", -162.0, 39.25, 0.0), 4326, jnp)

    lon, lat = f(jnp.asarray([0.0]), jnp.asarray([0.0]))
    np.testing.assert_allclose(np.asarray(lon)[0], 18.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(lat)[0], 50.75, atol=1e-6)
