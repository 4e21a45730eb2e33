"""Coordinate reference system math — closed form, no PROJ.

The reference delegates every CRS transform to pyproj/PROJ (C library;
/root/reference/atlite/gis.py:87-101).  This framework implements the
projections its pipelines actually use as closed-form numpy/jnp math so they
can run on host or device:

- EPSG:4326  geographic lon/lat (degrees) on GRS80/WGS84,
- EPSG:3035  ETRS89-extended / LAEA Europe (the exclusion-container
  default, gis.py:381-397) — Snyder's ellipsoidal oblique Lambert
  azimuthal equal-area,
- "cea"     equal-area cylindrical on the ellipsoid (used for basin /
  grid-cell areas, convert.py:1145, cutout.py:539-562),
- EPSG:3857 spherical web-mercator (common raster CRS).

All formulas from J.P. Snyder, "Map Projections — A Working Manual",
USGS PP 1395 (1987).
"""

from __future__ import annotations

from contextlib import nullcontext

import numpy as np

# GRS80 ellipsoid (ETRS89); WGS84 differs by <1e-9 in flattening
A = 6378137.0
E2 = 0.006694380022903416
E = np.sqrt(E2)

# EPSG:3035 parameters
LAEA_LAT0 = np.radians(52.0)
LAEA_LON0 = np.radians(10.0)
LAEA_FE = 4321000.0
LAEA_FN = 3210000.0


def _errstate(xp):
    return (np.errstate(invalid="ignore", divide="ignore")
            if xp is np else nullcontext())


def _q(sinphi, xp=np):
    """Authalic q function (Snyder 3-12)."""
    return (1 - E2) * (
        sinphi / (1 - E2 * sinphi**2)
        - (1 / (2 * E)) * xp.log((1 - E * sinphi) / (1 + E * sinphi))
    )


_QP = _q(1.0)


def _authalic_beta(phi, xp=np):
    return xp.arcsin(xp.clip(_q(xp.sin(phi), xp) / _QP, -1, 1))


def laea_forward(lon, lat, xp=np):
    """lon/lat degrees -> EPSG:3035 x/y meters (Snyder 24-4..24-14).

    All projection functions take ``xp`` (numpy or jax.numpy) so the same
    closed-form math runs on host and, elementwise-fused, on device.
    """
    lam = xp.radians(lon)
    phi = xp.radians(lat)
    beta = _authalic_beta(phi, xp)
    beta1 = _authalic_beta(LAEA_LAT0)
    rq = A * np.sqrt(_QP / 2)
    d = A * np.cos(LAEA_LAT0) / (
        np.sqrt(1 - E2 * np.sin(LAEA_LAT0) ** 2) * rq * np.cos(beta1)
    )
    coslam = xp.cos(lam - LAEA_LON0)
    sinlam = xp.sin(lam - LAEA_LON0)
    b = rq * xp.sqrt(
        2 / (1 + np.sin(beta1) * xp.sin(beta) + np.cos(beta1) * xp.cos(beta) * coslam)
    )
    x = b * d * xp.cos(beta) * sinlam + LAEA_FE
    y = (b / d) * (
        np.cos(beta1) * xp.sin(beta) - np.sin(beta1) * xp.cos(beta) * coslam
    ) + LAEA_FN
    return x, y


def laea_inverse(x, y, xp=np):
    """EPSG:3035 x/y meters -> lon/lat degrees (Snyder 24-15..24-21, 3-18)."""
    dtype = float if xp is np else None
    x = xp.asarray(x, dtype=dtype) - LAEA_FE
    y = xp.asarray(y, dtype=dtype) - LAEA_FN
    beta1 = _authalic_beta(LAEA_LAT0)
    rq = A * np.sqrt(_QP / 2)
    d = A * np.cos(LAEA_LAT0) / (
        np.sqrt(1 - E2 * np.sin(LAEA_LAT0) ** 2) * rq * np.cos(beta1)
    )
    rho = xp.sqrt((x / d) ** 2 + (d * y) ** 2)
    ce = 2 * xp.arcsin(xp.clip(rho / (2 * rq), -1, 1))
    with _errstate(xp):
        beta = xp.arcsin(
            xp.clip(
                np.sin(beta1) * xp.cos(ce) + (d * y * xp.sin(ce) * np.cos(beta1)) / rho,
                -1, 1,
            )
        )
        lam = LAEA_LON0 + xp.arctan2(
            x * xp.sin(ce),
            d * rho * np.cos(beta1) * xp.cos(ce) - d**2 * y * np.sin(beta1) * xp.sin(ce),
        )
    beta = xp.where(rho == 0, beta1, beta)
    lam = xp.where(rho == 0, LAEA_LON0, lam)
    # authalic -> geodetic latitude series (Snyder 3-18)
    phi = beta + (
        (E2 / 3 + 31 * E2**2 / 180 + 517 * E2**3 / 5040) * xp.sin(2 * beta)
        + (23 * E2**2 / 360 + 251 * E2**3 / 3780) * xp.sin(4 * beta)
        + (761 * E2**3 / 45360) * xp.sin(6 * beta)
    )
    return xp.degrees(lam), xp.degrees(phi)


def cea_forward(lon, lat, xp=np):
    """Ellipsoidal cylindrical equal-area, std parallel 0 (Snyder 10-1/10-2):
    x = a*lam ; y = a*q/2.  Areas on this plane equal true ellipsoid area."""
    lam = xp.radians(lon)
    phi = xp.radians(lat)
    return A * lam, A * _q(xp.sin(phi), xp) / 2


def cea_inverse(x, y, xp=np):
    beta = xp.arcsin(xp.clip(2 * xp.asarray(y) / (A * _QP), -1, 1))
    phi = beta + (
        (E2 / 3 + 31 * E2**2 / 180 + 517 * E2**3 / 5040) * xp.sin(2 * beta)
        + (23 * E2**2 / 360 + 251 * E2**3 / 3780) * xp.sin(4 * beta)
        + (761 * E2**3 / 45360) * xp.sin(6 * beta)
    )
    return xp.degrees(xp.asarray(x) / A), xp.degrees(phi)


def mercator_forward(lon, lat, xp=np):
    """EPSG:3857 spherical web mercator."""
    r = 6378137.0
    x = r * xp.radians(lon)
    y = r * xp.log(xp.tan(np.pi / 4 + xp.radians(lat) / 2))
    return x, y


def mercator_inverse(x, y, xp=np):
    r = 6378137.0
    lon = xp.degrees(xp.asarray(x) / r)
    lat = xp.degrees(2 * xp.arctan(xp.exp(xp.asarray(y) / r)) - np.pi / 2)
    return lon, lat


# ---------------------------------------------------------------------------
# Transverse Mercator (Krüger n-series, 6th order — Karney, "Transverse
# Mercator with an accuracy of a few nanometers", J. Geod. 85 (2011)).
# Covers every UTM zone: EPSG:326xx/327xx (WGS84 N/S), EPSG:258xx (ETRS89),
# and arbitrary lon0/k0/FE/FN Gauss-Krüger variants — the projections that
# land-use exclusion rasters most commonly ship in (reference delegates
# these to pyproj, gis.py:87-101).
# ---------------------------------------------------------------------------
_F = 1 / 298.257222101  # GRS80 flattening (WGS84: 1/298.257223563, <1e-9 diff)
_N = _F / (2 - _F)

# Krüger series coefficients in n (Karney 2011 eqs. 35-36), order n^6
_TM_ALPHA = (
    _N / 2 - 2 * _N**2 / 3 + 5 * _N**3 / 16 + 41 * _N**4 / 180
    - 127 * _N**5 / 288 + 7891 * _N**6 / 37800,
    13 * _N**2 / 48 - 3 * _N**3 / 5 + 557 * _N**4 / 1440 + 281 * _N**5 / 630
    - 1983433 * _N**6 / 1935360,
    61 * _N**3 / 240 - 103 * _N**4 / 140 + 15061 * _N**5 / 26880
    + 167603 * _N**6 / 181440,
    49561 * _N**4 / 161280 - 179 * _N**5 / 168 + 6601661 * _N**6 / 7257600,
    34729 * _N**5 / 80640 - 3418889 * _N**6 / 1995840,
    212378941 * _N**6 / 319334400,
)
_TM_BETA = (
    _N / 2 - 2 * _N**2 / 3 + 37 * _N**3 / 96 - _N**4 / 360
    - 81 * _N**5 / 512 + 96199 * _N**6 / 604800,
    _N**2 / 48 + _N**3 / 15 - 437 * _N**4 / 1440 + 46 * _N**5 / 105
    - 1118711 * _N**6 / 3870720,
    17 * _N**3 / 480 - 37 * _N**4 / 840 - 209 * _N**5 / 4480
    + 5569 * _N**6 / 90720,
    4397 * _N**4 / 161280 - 11 * _N**5 / 504 - 830251 * _N**6 / 7257600,
    4583 * _N**5 / 161280 - 108847 * _N**6 / 3991680,
    20648693 * _N**6 / 638668800,
)
# rectifying radius A1 (Karney eq. 14)
_TM_A1 = A / (1 + _N) * (1 + _N**2 / 4 + _N**4 / 64 + _N**6 / 256)


def tmerc_forward(lon, lat, lon0, k0=0.9996, fe=500000.0, fn=0.0, xp=np):
    """Ellipsoidal transverse Mercator forward (Karney 2011 eqs. 7-11)."""
    lam = xp.radians(xp.asarray(lon, dtype=float) - lon0)
    phi = xp.radians(xp.asarray(lat, dtype=float))
    # conformal latitude via tau' (Karney eq. 7)
    tau = xp.tan(phi)
    sigma = xp.sinh(E * xp.arctanh(E * tau / xp.sqrt(1 + tau**2)))
    taup = tau * xp.sqrt(1 + sigma**2) - sigma * xp.sqrt(1 + tau**2)
    xi_p = xp.arctan2(taup, xp.cos(lam))
    eta_p = xp.arcsinh(xp.sin(lam) / xp.sqrt(taup**2 + xp.cos(lam) ** 2))
    xi, eta = xi_p, eta_p
    for j, a_j in enumerate(_TM_ALPHA, start=1):
        xi = xi + a_j * xp.sin(2 * j * xi_p) * xp.cosh(2 * j * eta_p)
        eta = eta + a_j * xp.cos(2 * j * xi_p) * xp.sinh(2 * j * eta_p)
    return k0 * _TM_A1 * eta + fe, k0 * _TM_A1 * xi + fn


def tmerc_inverse(x, y, lon0, k0=0.9996, fe=500000.0, fn=0.0, xp=np):
    """Ellipsoidal transverse Mercator inverse (Karney 2011 eqs. 19-22;
    fixed-count Newton iteration on tau so it lowers under jit)."""
    xi = (xp.asarray(y, dtype=float) - fn) / (k0 * _TM_A1)
    eta = (xp.asarray(x, dtype=float) - fe) / (k0 * _TM_A1)
    xi_p, eta_p = xi, eta
    for j, b_j in enumerate(_TM_BETA, start=1):
        xi_p = xi_p - b_j * xp.sin(2 * j * xi) * xp.cosh(2 * j * eta)
        eta_p = eta_p - b_j * xp.cos(2 * j * xi) * xp.sinh(2 * j * eta)
    taup = xp.sin(xi_p) / xp.sqrt(xp.sinh(eta_p) ** 2 + xp.cos(xi_p) ** 2)
    lam = xp.arctan2(xp.sinh(eta_p), xp.cos(xi_p))
    # invert tau'(tau) by Newton (Karney eq. 20-21); 5 iterations reach
    # f64 round-off for |lat| <= 89.9
    tau = taup
    for _ in range(5):
        sigma = xp.sinh(E * xp.arctanh(E * tau / xp.sqrt(1 + tau**2)))
        taup_i = tau * xp.sqrt(1 + sigma**2) - sigma * xp.sqrt(1 + tau**2)
        dtaup = (xp.sqrt((1 + sigma**2) * (1 + tau**2)) - sigma * tau) \
            * (1 - E2) * xp.sqrt(1 + tau**2) / (1 + (1 - E2) * tau**2)
        tau = tau + (taup - taup_i) / dtaup
    phi = xp.arctan(tau)
    return xp.degrees(lam) + lon0, xp.degrees(phi)


def _utm_params(epsg):
    """EPSG UTM code -> (lon0_deg, k0, false_easting, false_northing).

    326xx = WGS84 north, 327xx = WGS84 south, 258xx = ETRS89 north
    (zones 28-38). Zone z central meridian: 6*z - 183."""
    if 32601 <= epsg <= 32660:
        return 6.0 * (epsg - 32600) - 183.0, 0.9996, 500000.0, 0.0
    if 32701 <= epsg <= 32760:
        return 6.0 * (epsg - 32700) - 183.0, 0.9996, 500000.0, 10000000.0
    if 25828 <= epsg <= 25838:
        return 6.0 * (epsg - 25800) - 183.0, 0.9996, 500000.0, 0.0
    return None


def _make_tmerc(lon0, k0, fe, fn):
    def fwd(lon, lat, xp=np):
        return tmerc_forward(lon, lat, lon0, k0, fe, fn, xp)

    def inv(x, y, xp=np):
        return tmerc_inverse(x, y, lon0, k0, fe, fn, xp)

    return fwd, inv


_FORWARD = {4326: None, 4258: None,  # 4258 = ETRS89 geographic ≡ lon/lat
            3035: laea_forward, "cea": cea_forward, 3857: mercator_forward}
_INVERSE = {4326: None, 4258: None,
            3035: laea_inverse, "cea": cea_inverse, 3857: mercator_inverse}


def register_projection(key, forward, inverse):
    """Register a custom projection pair.  ``forward(lon, lat, xp=np)``
    must map EPSG:4326 degrees to projected coordinates and ``inverse``
    back; ``xp`` receives numpy or jax.numpy (the device availability path
    runs these inside jit).  This is the one-function-per-projection
    dispatch that replaces the reference's blanket pyproj dependency."""
    _FORWARD[key] = forward
    _INVERSE[key] = inverse


def _resolve(key):
    """Lazily materialize parameterized projection families (UTM)."""
    if key in _FORWARD:
        return True
    if isinstance(key, int):
        utm = _utm_params(key)
        if utm is not None:
            fwd, inv = _make_tmerc(*utm)
            register_projection(key, fwd, inv)
            return True
    if isinstance(key, tuple) and key and key[0] == "tmerc":
        fwd, inv = _make_tmerc(*key[1:])
        register_projection(key, fwd, inv)
        return True
    return False


def normalize_crs(crs):
    """Accept ints, 'EPSG:xxxx' strings, {'proj': 'cea'} dicts, and
    proj4-style '+proj=utm +zone=NN [+south]' / '+proj=tmerc ...' strings
    (normalized to a ('tmerc', lon0, k0, fe, fn) key)."""
    if crs is None:
        return 4326
    if isinstance(crs, dict):
        if crs.get("proj") == "cea":
            return "cea"
        if crs.get("proj") in ("utm", "tmerc"):
            return _proj_dict_key(crs)
        raise ValueError(f"unsupported proj dict {crs}")
    if isinstance(crs, str):
        s = crs.lower().replace("epsg:", "")
        if s == "cea" or "proj=cea" in s:
            return "cea"
        if "proj=utm" in s or "proj=tmerc" in s:
            return _proj_dict_key(_parse_proj4(s))
        return int(s)
    if hasattr(crs, "to_epsg"):
        return crs.to_epsg()
    return int(crs)


def _parse_proj4(s):
    d = {}
    for tok in s.split():
        tok = tok.lstrip("+")
        if "=" in tok:
            k, v = tok.split("=", 1)
            d[k] = v
        else:
            d[tok] = True
    return d


def _proj_dict_key(d):
    if d.get("proj") == "utm":
        zone = int(d["zone"])
        south = bool(d.get("south", False))
        return ("tmerc", 6.0 * zone - 183.0, 0.9996, 500000.0,
                10000000.0 if south else 0.0)
    return ("tmerc", float(d.get("lon_0", 0.0)), float(d.get("k_0", d.get("k", 1.0))),
            float(d.get("x_0", 0.0)), float(d.get("y_0", 0.0)))


def transform_points(x, y, src, dst):
    """Transform coordinate arrays between supported CRSs (via lon/lat)."""
    src, dst = normalize_crs(src), normalize_crs(dst)
    if src == dst:
        return np.asarray(x, dtype=float), np.asarray(y, dtype=float)
    if not _resolve(src) or not _resolve(dst):
        raise NotImplementedError(f"CRS transform {src} -> {dst} not supported")
    if _INVERSE[src] is not None:
        x, y = _INVERSE[src](x, y)
    if _FORWARD[dst] is not None:
        x, y = _FORWARD[dst](x, y)
    return np.asarray(x, dtype=float), np.asarray(y, dtype=float)


def transform_points_xp(x, y, src, dst, xp):
    """transform_points with an explicit array namespace (jax.numpy for
    on-device CRS math — the projections are elementwise closed forms, so
    they fuse into the surrounding device kernel)."""
    src, dst = normalize_crs(src), normalize_crs(dst)
    if src == dst:
        return x, y
    if not _resolve(src) or not _resolve(dst):
        raise NotImplementedError(f"CRS transform {src} -> {dst} not supported")
    if _INVERSE[src] is not None:
        x, y = _INVERSE[src](x, y, xp)
    if _FORWARD[dst] is not None:
        x, y = _FORWARD[dst](x, y, xp)
    return x, y
