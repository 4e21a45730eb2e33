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


def _q(sinphi):
    """Authalic q function (Snyder 3-12)."""
    return (1 - E2) * (
        sinphi / (1 - E2 * sinphi**2)
        - (1 / (2 * E)) * np.log((1 - E * sinphi) / (1 + E * sinphi))
    )


_QP = _q(1.0)


def _authalic_beta(phi):
    return np.arcsin(np.clip(_q(np.sin(phi)) / _QP, -1, 1))


def laea_forward(lon, lat):
    """lon/lat degrees -> EPSG:3035 x/y meters (Snyder 24-4..24-14)."""
    lam = np.radians(lon)
    phi = np.radians(lat)
    beta = _authalic_beta(phi)
    beta1 = _authalic_beta(LAEA_LAT0)
    rq = A * np.sqrt(_QP / 2)
    d = A * np.cos(LAEA_LAT0) / (
        np.sqrt(1 - E2 * np.sin(LAEA_LAT0) ** 2) * rq * np.cos(beta1)
    )
    coslam = np.cos(lam - LAEA_LON0)
    sinlam = np.sin(lam - LAEA_LON0)
    b = rq * np.sqrt(
        2 / (1 + np.sin(beta1) * np.sin(beta) + np.cos(beta1) * np.cos(beta) * coslam)
    )
    x = b * d * np.cos(beta) * sinlam + LAEA_FE
    y = (b / d) * (
        np.cos(beta1) * np.sin(beta) - np.sin(beta1) * np.cos(beta) * coslam
    ) + LAEA_FN
    return x, y


def laea_inverse(x, y):
    """EPSG:3035 x/y meters -> lon/lat degrees (Snyder 24-15..24-21, 3-18)."""
    x = np.asarray(x, dtype=float) - LAEA_FE
    y = np.asarray(y, dtype=float) - LAEA_FN
    beta1 = _authalic_beta(LAEA_LAT0)
    rq = A * np.sqrt(_QP / 2)
    d = A * np.cos(LAEA_LAT0) / (
        np.sqrt(1 - E2 * np.sin(LAEA_LAT0) ** 2) * rq * np.cos(beta1)
    )
    rho = np.sqrt((x / d) ** 2 + (d * y) ** 2)
    ce = 2 * np.arcsin(np.clip(rho / (2 * rq), -1, 1))
    with np.errstate(invalid="ignore", divide="ignore"):
        beta = np.arcsin(
            np.clip(
                np.cos(ce) * np.sin(beta1) + (d * y * np.sin(ce) * np.cos(beta1)) / rho,
                -1, 1,
            )
        )
        lam = LAEA_LON0 + np.arctan2(
            x * np.sin(ce),
            d * rho * np.cos(beta1) * np.cos(ce) - d**2 * y * np.sin(beta1) * np.sin(ce),
        )
    beta = np.where(rho == 0, beta1, beta)
    lam = np.where(rho == 0, LAEA_LON0, lam)
    # authalic -> geodetic latitude series (Snyder 3-18)
    phi = beta + (
        (E2 / 3 + 31 * E2**2 / 180 + 517 * E2**3 / 5040) * np.sin(2 * beta)
        + (23 * E2**2 / 360 + 251 * E2**3 / 3780) * np.sin(4 * beta)
        + (761 * E2**3 / 45360) * np.sin(6 * beta)
    )
    return np.degrees(lam), np.degrees(phi)


def cea_forward(lon, lat):
    """Ellipsoidal cylindrical equal-area, std parallel 0 (Snyder 10-1/10-2):
    x = a*lam ; y = a*q/2.  Areas on this plane equal true ellipsoid area."""
    lam = np.radians(lon)
    phi = np.radians(lat)
    return A * lam, A * _q(np.sin(phi)) / 2


def cea_inverse(x, y):
    beta = np.arcsin(np.clip(2 * y / (A * _QP), -1, 1))
    phi = beta + (
        (E2 / 3 + 31 * E2**2 / 180 + 517 * E2**3 / 5040) * np.sin(2 * beta)
        + (23 * E2**2 / 360 + 251 * E2**3 / 3780) * np.sin(4 * beta)
        + (761 * E2**3 / 45360) * np.sin(6 * beta)
    )
    return np.degrees(np.asarray(x) / A), np.degrees(phi)


def mercator_forward(lon, lat):
    """EPSG:3857 spherical web mercator."""
    r = 6378137.0
    x = r * np.radians(lon)
    y = r * np.log(np.tan(np.pi / 4 + np.radians(lat) / 2))
    return x, y


def mercator_inverse(x, y):
    r = 6378137.0
    lon = np.degrees(np.asarray(x) / r)
    lat = np.degrees(2 * np.arctan(np.exp(np.asarray(y) / r)) - np.pi / 2)
    return lon, lat


_FORWARD = {4326: None, 3035: laea_forward, "cea": cea_forward, 3857: mercator_forward}
_INVERSE = {4326: None, 3035: laea_inverse, "cea": cea_inverse, 3857: mercator_inverse}


def normalize_crs(crs):
    """Accept ints, 'EPSG:xxxx' strings, {'proj': 'cea'} dicts."""
    if crs is None:
        return 4326
    if isinstance(crs, dict):
        if crs.get("proj") == "cea":
            return "cea"
        raise ValueError(f"unsupported proj dict {crs}")
    if isinstance(crs, str):
        s = crs.lower().replace("epsg:", "")
        if s == "cea" or "proj=cea" in s:
            return "cea"
        return int(s)
    if hasattr(crs, "to_epsg"):
        return crs.to_epsg()
    return int(crs)


def transform_points(x, y, src, dst):
    """Transform coordinate arrays between supported CRSs (via lon/lat)."""
    src, dst = normalize_crs(src), normalize_crs(dst)
    if src == dst:
        return np.asarray(x, dtype=float), np.asarray(y, dtype=float)
    if src not in _INVERSE or dst not in _FORWARD:
        raise NotImplementedError(f"CRS transform {src} -> {dst} not supported")
    if src != 4326:
        x, y = _INVERSE[src](x, y)
    if dst != 4326:
        x, y = _FORWARD[dst](x, y)
    return np.asarray(x, dtype=float), np.asarray(y, dtype=float)
