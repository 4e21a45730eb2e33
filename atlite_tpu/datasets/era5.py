"""ERA5 adapter (CDS retrieval).

Mirrors the reference module contract (/root/reference/atlite/datasets/
era5.py:45-62): ``crs``, ``features``, ``static_features`` and
``get_data(cutout, feature, ...)``, including the request chunking logic
(era5.py:266-320) and the variable derivations (era5.py:104-256) — wind
speed magnitude from u/v components, shear exponent, azimuth, J->W flux
conversion, albedo from net/downward radiation, geopotential->height, and
the -30 min solar-position merge.

Actual retrieval needs the ``cdsapi`` client and a NetCDF4 reader, neither
of which is part of this framework's minimal dependency set; when they are
missing ``get_data`` raises with instructions.  The derivation functions
are importable and unit-tested independently via array inputs.
"""

from __future__ import annotations

import logging

import numpy as np
import pandas as pd

from atlite_tpu.core.timeutil import solar_ephemeris
from atlite_tpu.physics.solar import solar_position_numpy

logger = logging.getLogger(__name__)

crs = 4326

features = {
    "height": ["height"],
    "wind": ["wnd100m", "wnd_shear_exp", "wnd_azimuth", "roughness"],
    "influx": [
        "influx_toa",
        "influx_direct",
        "influx_diffuse",
        "albedo",
        "solar_altitude",
        "solar_azimuth",
    ],
    "temperature": ["temperature", "soil temperature", "dewpoint temperature"],
    "runoff": ["runoff"],
}

static_features = {"height"}

G0 = 9.80665  # standard gravity, for geopotential -> height (era5.py:65-81)


# ---------------------------------------------------------------------------
# pure derivations (unit-testable without CDS)
# ---------------------------------------------------------------------------
def derive_wind(u100, v100, u10, v10, fsr):
    """Wind variables from raw components (era5.py:104-135)."""
    wnd100m = np.sqrt(u100**2 + v100**2)
    wnd10m = np.sqrt(u10**2 + v10**2)
    shear = np.log(wnd10m / wnd100m) / np.log(10 / 100)
    azimuth = np.arctan2(u100, v100)
    azimuth = np.where(azimuth >= 0, azimuth, azimuth + 2 * np.pi)
    return {
        "wnd100m": wnd100m,
        "wnd_shear_exp": shear,
        "wnd_azimuth": azimuth,
        "roughness": fsr,
    }


def sanitize_wind(ds):
    """Roughness floor (era5.py:138-143)."""
    ds["roughness"] = np.where(ds["roughness"] >= 0.0, ds["roughness"], 2e-4)
    return ds


def derive_influx(ssrd, ssr, tisr, fdir, times, lon, lat):
    """Influx variables from raw radiation accumulations (era5.py:146-190)."""
    with np.errstate(invalid="ignore", divide="ignore"):
        albedo = (ssrd - ssr) / np.where(ssrd != 0, ssrd, np.nan)
    albedo = np.nan_to_num(albedo, nan=0.0)
    influx_diffuse = ssrd - fdir
    out = {
        "influx_toa": tisr / 3600.0,  # J m**-2 (1h accumulation) -> W m**-2
        "influx_direct": fdir / 3600.0,
        "influx_diffuse": influx_diffuse / 3600.0,
        "albedo": albedo,
    }
    # interval-center solar position (era5.py:178-188)
    eph = solar_ephemeris(times, time_shift="-30min")
    sp = solar_position_numpy(eph["declination"], eph["hour_angle0"], lon, lat)
    out["solar_altitude"] = sp["altitude"]
    out["solar_azimuth"] = sp["azimuth"]
    return out


def sanitize_influx(ds):
    """Clip negative fluxes (era5.py:193-199)."""
    for a in ("influx_direct", "influx_diffuse", "influx_toa"):
        ds[a] = np.clip(ds[a], 0.0, None)
    return ds


def sanitize_runoff(ds):
    ds["runoff"] = np.clip(ds["runoff"], 0.0, None)
    return ds


def derive_height(z):
    """Geopotential -> geopotential height (era5.py:65-81)."""
    return z / G0


# ---------------------------------------------------------------------------
# retrieval plumbing
# ---------------------------------------------------------------------------
def _area(grid):
    """[North, West, South, East] request area (era5.py:259-263)."""
    return [grid.y.max(), grid.x.min(), grid.y.min(), grid.x.max()]


def retrieval_times(time_index, static=False, monthly_requests=False):
    """CDS request time chunking per year/month (era5.py:266-320)."""
    time = pd.DatetimeIndex(time_index)
    if static:
        t = time[0]
        return {
            "year": [t.strftime("%Y")],
            "month": [t.strftime("%m")],
            "day": [t.strftime("%d")],
            "time": t.strftime("%H:00"),
        }
    queries = []
    for year in time.year.unique():
        t = time[time.year == year]
        if monthly_requests:
            for month in t.month.unique():
                tm = t[t.month == month]
                queries.append({
                    "year": [str(year)],
                    "month": [tm[0].strftime("%m")],
                    "day": list(tm.strftime("%d").unique()),
                    "time": list(tm.strftime("%H:00").unique()),
                })
        else:
            queries.append({
                "year": [str(year)],
                "month": list(t.strftime("%m").unique()),
                "day": list(t.strftime("%d").unique()),
                "time": list(t.strftime("%H:00").unique()),
            })
    return queries


def get_data(cutout, feature, tmpdir=None, monthly_requests=False,
             concurrent_requests=False, **creation_parameters):
    """Retrieve ERA5 data for one feature via the CDS API."""
    try:
        import cdsapi  # noqa: F401
    except ImportError as exc:
        raise ImportError(
            "ERA5 retrieval requires the 'cdsapi' package (and CDS "
            "credentials). In offline environments use module='synthetic' "
            "or ingest pre-downloaded arrays with Cutout(data=...)."
        ) from exc
    raise NotImplementedError(
        "CDS retrieval needs a NetCDF4/GRIB decoder which is not part of "
        "this build; ingest pre-downloaded arrays with Cutout(data=...)."
    )
