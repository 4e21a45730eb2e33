"""CRS golden values verified against system PROJ (cs2cs/cct 9.1.1).

Each pinned coordinate below was produced by PROJ on this machine and is
hard-coded so the tests need no PROJ at runtime.  They guard the bug
class a self-consistent round-trip cannot catch: wrong projection
parameters (EPSG:31370 lon_0), dropped proj4 keys (+lat_0/+ellps in the
generic tmerc fallback), singular defaults (polar stereographic without
+lat_ts), and rotated-pole third-angle sign (o_lon_p).
"""

import numpy as np
import pytest

from atlite_tpu.gis import crs


def test_epsg_31370_matches_proj():
    # cs2cs EPSG:4326 +to EPSG:31370 — Brussels Grand-Place
    x, y = crs.transform_points([4.3517], [50.8503], 4326, 31370)
    np.testing.assert_allclose(x[0], 148799.170, atol=0.05)
    np.testing.assert_allclose(y[0], 171100.155, atol=0.05)
    lon, lat = crs.transform_points(x, y, 31370, 4326)
    np.testing.assert_allclose([lon[0], lat[0]], [4.3517, 50.8503], atol=1e-7)


def test_proj4_tmerc_keeps_lat0_and_ellps():
    # the standard OSGB proj4 string; cs2cs gives (529930.2723, 180412.1108)
    # for Trafalgar Square — dropping +lat_0/+ellps put it ~5400 km north
    s = ("+proj=tmerc +lat_0=49 +lon_0=-2 +k=0.9996012717 "
         "+x_0=400000 +y_0=-100000 +ellps=airy")
    x, y = crs.transform_points([-0.1276], [51.5072], 4326, s)
    np.testing.assert_allclose(x[0], 529930.2723, atol=0.01)
    np.testing.assert_allclose(y[0], 180412.1108, atol=0.01)


def test_proj4_utm_keeps_ellps():
    # intl-ellipsoid UTM (ED50-style zone 32): differs from the grs80
    # default by ~200 m northing at 52N if +ellps is dropped
    s = "+proj=utm +zone=32 +ellps=intl"
    x, y = crs.transform_points([9.0], [52.0], 4326, s)
    x_grs, y_grs = crs.transform_points([9.0], [52.0], 4326,
                                        "+proj=utm +zone=32 +ellps=grs80")
    assert abs(y[0] - y_grs[0]) > 50.0  # the ellipsoid actually matters


def test_polar_stereo_variant_a_no_lat_ts():
    # +proj=stere +lat_0=90 without +lat_ts previously divided by zero
    # (inf/NaN output); cs2cs gives (391737.3209, -2221652.7463) for
    # (10E, 70N)
    s = "+proj=stere +lat_0=90 +lon_0=0 +ellps=WGS84"
    x, y = crs.transform_points([10.0], [70.0], 4326, s)
    assert np.isfinite([x[0], y[0]]).all()
    np.testing.assert_allclose(x[0], 391737.3209, atol=0.01)
    np.testing.assert_allclose(y[0], -2221652.7463, atol=0.01)


def test_polar_stereo_south_hemisphere_from_lat0():
    # hemisphere must come from lat_0's sign — both lat_ts spellings of
    # the south aspect are the same CRS; cs2cs gives
    # (560496.8781, 1539952.5162) for (20E, 75S)
    a = "+proj=stere +lat_0=-90 +lat_ts=-71 +lon_0=0 +ellps=WGS84"
    b = "+proj=stere +lat_0=-90 +lat_ts=71 +lon_0=0 +ellps=WGS84"
    xa, ya = crs.transform_points([20.0], [-75.0], 4326, a)
    xb, yb = crs.transform_points([20.0], [-75.0], 4326, b)
    np.testing.assert_allclose([xa[0], ya[0]], [xb[0], yb[0]], rtol=0)
    np.testing.assert_allclose(xa[0], 560496.8781, atol=0.01)
    np.testing.assert_allclose(ya[0], 1539952.5162, atol=0.01)


def test_rotated_pole_third_angle_sign():
    # cct +proj=ob_tran +o_proj=longlat +o_lat_p=39.25 +lon_0=18 +o_lon_p=30
    # maps (10E, 50N) to rotated (24.8673, -0.4724); the sign error gave
    # -35.13 (off by 2 x o_lon_p)
    s = "+proj=ob_tran +o_proj=longlat +o_lat_p=39.25 +lon_0=18 +o_lon_p=30"
    rlon, rlat = crs.transform_points([10.0], [50.0], 4326, s)
    np.testing.assert_allclose(rlon[0], 24.8673, atol=2e-4)
    np.testing.assert_allclose(rlat[0], -0.4724, atol=2e-4)
    lon, lat = crs.transform_points(rlon, rlat, s, 4326)
    np.testing.assert_allclose([lon[0], lat[0]], [10.0, 50.0], atol=1e-9)


def test_proj4_bessel_gauss_krueger():
    # DHDN GK-3 style string without a datum shift; cs2cs gives
    # (3535843.4288, 5540399.3500) for (9.5E, 50N) — the old grs80
    # fallback was 567 m north of this
    s = "+proj=tmerc +lat_0=0 +lon_0=9 +k=1 +x_0=3500000 +ellps=bessel"
    x, y = crs.transform_points([9.5], [50.0], 4326, s)
    np.testing.assert_allclose(x[0], 3535843.4288, atol=0.01)
    np.testing.assert_allclose(y[0], 5540399.3500, atol=0.01)


def test_proj4_datum_potsdam_applies_dhdn_shift():
    # +datum=potsdam implies bessel AND the DHDN Helmert shift; cs2cs
    # gives (3535922.6569, 5540527.2761) — 128 m from the unshifted
    # bessel result.  Sub-meter agreement is the documented accuracy of
    # the single-set Helmert path.
    s = "+proj=tmerc +lat_0=0 +lon_0=9 +k=1 +x_0=3500000 +datum=potsdam"
    x, y = crs.transform_points([9.5], [50.0], 4326, s)
    np.testing.assert_allclose(x[0], 3535922.6569, atol=1.0)
    np.testing.assert_allclose(y[0], 5540527.2761, atol=1.0)
    lon, lat = crs.transform_points(x, y, s, 4326)
    np.testing.assert_allclose([lon[0], lat[0]], [9.5, 50.0], atol=1e-6)


def test_new_projections_device_path_matches_host():
    """The datum-shifted / variant-A projections keep the xp duality:
    jitted transform_points_xp == host transform_points."""
    import jax
    import jax.numpy as jnp

    keys = [
        crs.normalize_crs("+proj=tmerc +lat_0=49 +lon_0=-2 "
                          "+k=0.9996012717 +x_0=400000 +y_0=-100000 "
                          "+ellps=airy"),
        crs.normalize_crs("+proj=stere +lat_0=-90 +lat_ts=-71 +lon_0=0 "
                          "+ellps=WGS84"),
        31370,
        crs.normalize_crs("+proj=tmerc +lat_0=0 +lon_0=9 +k=1 "
                          "+x_0=3500000 +datum=potsdam"),
    ]
    lon = np.array([4.35, 9.5])
    lat = np.array([50.85, 50.0])
    for key in keys:
        dev = jax.jit(lambda x, y, k=key: crs.transform_points_xp(
            x, y, 4326, k, jnp))
        X, Y = dev(jnp.asarray(lon), jnp.asarray(lat))
        xh, yh = crs.transform_points(lon, lat, 4326, key)
        np.testing.assert_allclose(np.asarray(X), xh, atol=2e-3)
        np.testing.assert_allclose(np.asarray(Y), yh, atol=2e-3)


def test_cea_with_datum_matches_proj():
    """r4 final review: +proj=cea +datum=potsdam must apply the DHDN
    Helmert shift (the cea key previously dropped the datum, ~115 m
    silent error).  cs2cs 9.1.1 gives (964863.148, 5613576.328) for
    (10E, 50N); agreement at the documented few-meter Helmert accuracy
    class."""
    x, y = crs.transform_points([10.0], [50.0], 4326,
                                "+proj=cea +lat_ts=30 +datum=potsdam")
    np.testing.assert_allclose(x[0], 964863.148, atol=0.5)
    np.testing.assert_allclose(y[0], 5613576.328, atol=0.5)
