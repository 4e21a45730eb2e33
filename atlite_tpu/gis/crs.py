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


def transform_points_xp(x, y, src, dst, xp):
    """transform_points with an explicit array namespace (jax.numpy for
    on-device CRS math — the projections are elementwise closed forms, so
    they fuse into the surrounding device kernel)."""
    src, dst = normalize_crs(src), normalize_crs(dst)
    if src == dst:
        return x, y
    if src not in _INVERSE or dst not in _FORWARD:
        raise NotImplementedError(f"CRS transform {src} -> {dst} not supported")
    if src != 4326:
        x, y = _INVERSE[src](x, y, xp)
    if dst != 4326:
        x, y = _FORWARD[dst](x, y, xp)
    return x, y
