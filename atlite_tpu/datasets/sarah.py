"""SARAH satellite irradiance adapter.

Mirrors /root/reference/atlite/datasets/sarah.py:31-244: influx feature at
native 0.05 deg / 30 min resolution, with

- NaN interpolation along time for the dawn/dusk gaps (sarah.py:91-132),
- pairwise stride-2 averaging 30 min -> 1 h (sarah.py:145-159),
- regridding onto the cutout resolution when it differs (sarah.py:226-227),
- diffuse = SIS - SID (sarah.py:229-231).

The array-processing core is implemented here and unit-tested; reading the
original SARAH NetCDF archives requires an HDF5 reader not in this build —
``get_data`` accepts pre-decoded arrays via the ``sarah_arrays`` creation
parameter: {"sis": (T2,Y,X), "sid": (T2,Y,X), "x":..., "y":..., "time":...}
at 30-min resolution.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from atlite_tpu.core.timeutil import solar_ephemeris
from atlite_tpu.physics.solar import solar_position_numpy

crs = 4326
dx = 0.05
dy = 0.05
dt = "30min"

features = {"influx": ["influx_direct", "influx_diffuse", "solar_altitude",
                       "solar_azimuth"]}
static_features = set()


def interpolate_nan_time(values: np.ndarray) -> np.ndarray:
    """Linear interpolation of NaNs along the leading time axis
    (sarah.py:91-132; fills interior gaps, keeps leading/trailing NaNs
    replaced by nearest valid value)."""
    v = np.asarray(values, dtype=float)
    T = v.shape[0]
    flat = v.reshape(T, -1)
    t = np.arange(T, dtype=float)
    out = flat.copy()
    nan_cols = np.where(np.isnan(flat).any(axis=0))[0]
    for j in nan_cols:
        col = flat[:, j]
        ok = ~np.isnan(col)
        if ok.sum() == 0:
            continue
        out[:, j] = np.interp(t, t[ok], col[ok])
    return out.reshape(v.shape)


def hourly_mean(values: np.ndarray) -> np.ndarray:
    """Pairwise stride-2 mean along time: 30 min -> 1 h (sarah.py:145-159)."""
    v = np.asarray(values, dtype=float)
    n = (v.shape[0] // 2) * 2
    return 0.5 * (v[0:n:2] + v[1:n:2])


def process_sarah(sis, sid, src_x, src_y, src_time, cutout, interpolate=True):
    """Full SARAH processing chain onto the cutout grid (sarah.py:162-243)."""
    from atlite_tpu.dataarray import DataArray
    from atlite_tpu.gis.regrid import regrid

    if interpolate:
        sis = interpolate_nan_time(sis)
        sid = interpolate_nan_time(sid)
    sis = hourly_mean(sis)
    sid = hourly_mean(sid)
    times = pd.DatetimeIndex(src_time)[: 2 * sis.shape[0] : 2]

    grid = cutout.grid_desc
    if abs(grid.dx - dx) > 1e-9 or abs(grid.dy - dy) > 1e-9:
        def _rg(v):
            da = DataArray(v, coords={"time": times, "y": src_y, "x": src_x},
                           dims=("time", "y", "x"))
            return regrid(da, grid.x, grid.y, resampling="average").values
        sis, sid = _rg(sis), _rg(sid)

    influx_diffuse = sis - sid
    eph = solar_ephemeris(grid.time, time_shift="0h")
    sp = solar_position_numpy(eph["declination"], eph["hour_angle0"], grid.x, grid.y)
    tyx = ("time", "y", "x")
    return {
        "influx_direct": (tyx, sid),
        "influx_diffuse": (tyx, influx_diffuse),
        "solar_altitude": (tyx, sp["altitude"]),
        "solar_azimuth": (tyx, sp["azimuth"]),
    }


def get_data(cutout, feature, tmpdir=None, **creation_parameters):
    arrays = creation_parameters.get("sarah_arrays")
    if arrays is None:
        raise ValueError(
            "The sarah module needs pre-decoded arrays: pass "
            "sarah_arrays={'sis', 'sid', 'x', 'y', 'time'} as a creation "
            "parameter (reading the NetCDF archives requires an HDF5 "
            "reader not included in this build)."
        )
    return process_sarah(
        arrays["sis"], arrays["sid"], arrays["x"], arrays["y"], arrays["time"],
        cutout, interpolate=creation_parameters.get("sarah_interpolate", True),
    )
