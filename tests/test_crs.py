"""CRS engine: closed-form projections vs independent goldens.

Published / independently-computed checks (VERDICT round-1 task 7 —
correctness anchors that were NOT derived from this repo's own code):

- EPSG:3035 LAEA pinned to the worked example of IOGP Guidance Note 7-2
  ("Coordinate Conversions and Transformations including Formulas",
  §3.2.2, ETRS89 lat 50N lon 5E -> E 3962799.45, N 2999718.85).
- Transverse Mercator central-meridian northing pinned to k0 times the
  meridian arc computed by direct numerical quadrature of the ellipsoid
  integrand (scipy.integrate.quad — independent of the Krüger series).
- The Krüger-series TM is cross-checked against an independently coded
  classic Snyder series TM (USGS PP 1395 eqs. 8-9..8-17) — two separate
  derivations agreeing to sub-mm.
"""

import numpy as np
import pytest

from atlite_tpu.gis.crs import (
    A, E2,
    laea_forward, laea_inverse,
    tmerc_forward, tmerc_inverse,
    transform_points, transform_points_xp, normalize_crs,
)


# -------------------------------------------------------------- LAEA golden
def test_laea_epsg_guidance_note_worked_example():
    x, y = laea_forward(5.0, 50.0)
    assert abs(float(x) - 3962799.45) < 0.01
    assert abs(float(y) - 2999718.85) < 0.01
    lon, lat = laea_inverse(3962799.45, 2999718.85)
    # the inverse's authalic->geodetic series is good to ~1e-7 deg
    assert abs(float(lon) - 5.0) < 1e-6
    assert abs(float(lat) - 50.0) < 1e-6


# ------------------------------------------------------ TM quadrature golden
def _meridian_arc(lat_deg):
    from scipy.integrate import quad

    f = lambda p: A * (1 - E2) / (1 - E2 * np.sin(p) ** 2) ** 1.5
    return quad(f, 0.0, np.radians(lat_deg), epsabs=1e-9)[0]


@pytest.mark.parametrize("lat", [15.0, 45.0, 60.0, 80.0])
def test_tmerc_central_meridian_arc(lat):
    x, y = tmerc_forward(0.0, lat, lon0=0.0)
    assert abs(float(x) - 500000.0) == 0.0
    assert abs(float(y) - 0.9996 * _meridian_arc(lat)) < 1e-6


# ------------------------------------------- independent Snyder-series TM
def _snyder_tmerc(lon, lat, lon0, k0=0.9996, fe=500000.0, fn=0.0):
    """Classic TM series, USGS PP 1395 eqs. 8-9..8-17 (independent of the
    Krüger/Karney formulation used by the implementation). Good to ~1 mm
    within a UTM zone."""
    e2 = E2
    ep2 = e2 / (1 - e2)
    phi = np.radians(lat)
    lam = np.radians(lon - lon0)
    N = A / np.sqrt(1 - e2 * np.sin(phi) ** 2)
    T = np.tan(phi) ** 2
    C = ep2 * np.cos(phi) ** 2
    Aa = lam * np.cos(phi)
    M = A * (
        (1 - e2 / 4 - 3 * e2**2 / 64 - 5 * e2**3 / 256) * phi
        - (3 * e2 / 8 + 3 * e2**2 / 32 + 45 * e2**3 / 1024) * np.sin(2 * phi)
        + (15 * e2**2 / 256 + 45 * e2**3 / 1024) * np.sin(4 * phi)
        - (35 * e2**3 / 3072) * np.sin(6 * phi)
    )
    x = k0 * N * (
        Aa + (1 - T + C) * Aa**3 / 6
        + (5 - 18 * T + T**2 + 72 * C - 58 * ep2) * Aa**5 / 120
    ) + fe
    y = k0 * (
        M + N * np.tan(phi) * (
            Aa**2 / 2 + (5 - T + 9 * C + 4 * C**2) * Aa**4 / 24
            + (61 - 58 * T + T**2 + 600 * C - 330 * ep2) * Aa**6 / 720
        )
    ) + fn
    return x, y


def test_tmerc_krueger_vs_snyder_cross_check():
    lons = np.linspace(12.2, 17.8, 9)
    lats = np.linspace(-72.0, 72.0, 13)
    LO, LA = np.meshgrid(lons, lats)
    xk, yk = tmerc_forward(LO, LA, lon0=15.0)
    xs, ys = _snyder_tmerc(LO, LA, lon0=15.0)
    assert np.abs(np.asarray(xk) - xs).max() < 1e-3
    assert np.abs(np.asarray(yk) - ys).max() < 1e-3


def test_tmerc_roundtrip_machine_precision():
    lons = np.linspace(9.01, 20.99, 17)
    lats = np.linspace(-84.0, 84.0, 19)
    LO, LA = np.meshgrid(lons, lats)
    x, y = tmerc_forward(LO, LA, lon0=15.0)
    lo2, la2 = tmerc_inverse(np.asarray(x), np.asarray(y), lon0=15.0)
    np.testing.assert_allclose(lo2, LO, atol=1e-11)
    np.testing.assert_allclose(la2, LA, atol=1e-11)


# ------------------------------------------------------------ UTM dispatch
def test_utm_epsg_codes():
    # Berlin in UTM 33N: easting < 500000 (west of 15E), northing ~5.82M
    x, y = transform_points(np.array([13.4]), np.array([52.52]), 4326, 32633)
    assert 391439 < float(x[0]) < 391441
    assert 5820079 < float(y[0]) < 5820081
    lon, lat = transform_points(x, y, 32633, 4326)
    assert abs(float(lon[0]) - 13.4) < 1e-9
    assert abs(float(lat[0]) - 52.52) < 1e-9
    # southern hemisphere: false northing 10,000,000
    xs, ys = transform_points(np.array([13.4]), np.array([-52.52]), 4326, 32733)
    assert float(xs[0]) == pytest.approx(float(x[0]), abs=1e-6)
    assert float(ys[0]) == pytest.approx(1e7 - float(y[0]), abs=1e-6)
    # ETRS89 UTM (EPSG:258xx) matches WGS84 UTM on the shared ellipsoid
    xe, ye = transform_points(np.array([13.4]), np.array([52.52]), 4326, 25833)
    assert float(xe[0]) == pytest.approx(float(x[0]), abs=1e-6)


def test_normalize_proj4_strings():
    # keys carry (lon0, k0, fe, fn, lat0, ellps, datum) — lat_0/ellps
    # must not be silently dropped (test_crs_proj_goldens.py pins the math)
    key = normalize_crs("+proj=utm +zone=33 +datum=WGS84")
    assert key == ("tmerc", 15.0, 0.9996, 500000.0, 0.0, 0.0, "wgs84", None)
    # +datum=WGS84 and +ellps=WGS84 are the same CRS -> identical keys
    # (the same-CRS fast paths in gis/raster.py compare these)
    assert key == normalize_crs("+proj=utm +zone=33 +ellps=WGS84")
    key_s = normalize_crs("+proj=utm +zone=30 +south")
    assert key_s == ("tmerc", -3.0, 0.9996, 500000.0, 10000000.0, 0.0,
                     "grs80", None)
    key_t = normalize_crs("+proj=tmerc +lon_0=9 +k_0=1 +x_0=3500000")
    assert key_t == ("tmerc", 9.0, 1.0, 3500000.0, 0.0, 0.0, "grs80", None)
    # unknown ellipsoids/datums must refuse, not silently default
    with pytest.raises(ValueError, match="ellps"):
        normalize_crs("+proj=tmerc +lon_0=9 +ellps=sphere")
    with pytest.raises(ValueError, match="datum"):
        normalize_crs("+proj=tmerc +lon_0=9 +datum=nzgd49")
    assert normalize_crs("EPSG:4258") == 4258
    # 4258 is geographic lon/lat: identity with 4326 on GRS80/WGS84
    x, y = transform_points(np.array([5.0]), np.array([50.0]), 4326, 4258)
    assert float(x[0]) == 5.0 and float(y[0]) == 50.0


def test_utm_under_jit_device_path():
    import jax
    import jax.numpy as jnp

    @jax.jit
    def go(lon, lat):
        return transform_points_xp(lon, lat, 4326, 32633, jnp)

    x, y = go(jnp.asarray([13.4]), jnp.asarray([52.52]))
    xh, yh = transform_points(np.array([13.4]), np.array([52.52]), 4326, 32633)
    assert abs(float(x[0]) - float(xh[0])) < 1e-6
    assert abs(float(y[0]) - float(yh[0])) < 1e-6


def test_family_less_crs_host_fallback():
    """EPSG:2056 (Swiss LV95, oblique Mercator) has no native closed-form
    family — the HOST path now transforms it through the system PROJ
    (cs2cs batch fallback; reference handles any pyproj CRS,
    gis.py:87-101), while the DEVICE path still refuses (a subprocess
    cannot run under jit)."""
    # Bern is the LV95 projection origin: (2600000, 1200000)
    x, y = transform_points(np.array([7.438632]), np.array([46.951083]),
                            4326, 2056)
    np.testing.assert_allclose(x[0], 2600000.0, atol=0.5)
    np.testing.assert_allclose(y[0], 1200000.0, atol=0.5)
    lon, lat = transform_points(x, y, 2056, 4326)
    np.testing.assert_allclose([lon[0], lat[0]], [7.438632, 46.951083],
                               atol=1e-6)
    # raw proj4 string of the same CRS -> same result
    s = ("+proj=somerc +lat_0=46.9524055555556 +lon_0=7.43958333333333 "
         "+k_0=1 +x_0=2600000 +y_0=1200000 +ellps=bessel "
         "+towgs84=674.374,15.056,405.346,0,0,0,0 +units=m")
    x2, y2 = transform_points(np.array([7.438632]), np.array([46.951083]),
                              4326, s)
    np.testing.assert_allclose([x2[0], y2[0]], [x[0], y[0]], atol=0.01)
    # mixed: family-less source, native destination
    x3, y3 = transform_points(x, y, 2056, 3035)
    assert np.isfinite([x3[0], y3[0]]).all()
    # out-of-domain points come back NaN, not an exception
    ox, oy = transform_points(np.array([7.0, 400.0]),
                              np.array([46.0, 95.0]), 4326, 2056)
    assert np.isfinite(ox[0]) and np.isnan(ox[1]) and np.isnan(oy[1])
    # NaN INPUTS stay NaN (r4 review: the literal text 'nan' parses as a
    # coordinate in cs2cs and came back as bogus finite values)
    ox, oy = transform_points(np.array([7.4, np.nan]),
                              np.array([46.9, np.nan]), 4326, 2056)
    assert np.isfinite(ox[0]) and np.isnan(ox[1]) and np.isnan(oy[1])


def test_unsupported_crs_still_raises():
    import jax.numpy as jnp

    from atlite_tpu.gis.crs import transform_points_xp

    # device path: no native closed form for 2056 -> must refuse
    with pytest.raises(NotImplementedError):
        transform_points_xp(jnp.array([0.0]), jnp.array([0.0]),
                            4326, 2056, jnp)
    # a code the system PROJ does not know either
    with pytest.raises(NotImplementedError):
        transform_points(np.array([0.0]), np.array([0.0]), 4326, 999999)
