"""Host-side time math.

JAX has no datetime dtype, and float32 cannot hold Julian dates (~2.45e6)
with useful precision.  All calendar math therefore happens here on the host
in float64 — per-timestep scalar tables are precomputed and shipped to the
device as small (T,) arrays; device kernels only ever broadcast them over
space.  This replaces the reference's per-element datetime handling inside
dask graphs (/root/reference/atlite/pv/solar_position.py:71-95,
/root/reference/atlite/convert.py:405-418).
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def to_datetimeindex(time) -> pd.DatetimeIndex:
    return pd.DatetimeIndex(np.asarray(time))


def julian_day_offset(times: pd.DatetimeIndex) -> np.ndarray:
    """Days since the J2000 epoch (2451545.0 JD), float64."""
    return times.to_julian_date().values - 2451545.0


def solar_ephemeris(time, time_shift="0h") -> dict[str, np.ndarray]:
    """Per-timestep solar ephemeris tables (float64, shape (T,)).

    Implements the Michalsky almanac approximation used by the reference
    (/root/reference/atlite/pv/solar_position.py:86-97), but splits it into a
    host part (everything that depends only on time) and leaves the
    lon/lat-dependent part to the device kernel
    (atlite_tpu.physics.solar.solar_position).

    Returns
    -------
    dict with keys
      ``declination`` : solar declination, rad
      ``hour_angle0`` : hour angle at lon=0, rad, wrapped to (-pi, pi]
                        (device adds radians(lon) and rewraps)
    """
    t = to_datetimeindex(time) + pd.to_timedelta(time_shift)
    n = t.to_julian_date().values - 2451545.0
    # full fractional UT hours (the reference drops seconds,
    # solar_position.py:74-75 — identical on whole-minute reanalysis
    # stamps, strictly more precise otherwise)
    ut_hours = ((t - t.normalize()).total_seconds().values) / 3600.0

    L = 280.460 + 0.9856474 * n  # mean longitude, deg
    g = np.radians(357.528 + 0.9856003 * n)  # mean anomaly, rad
    ecl = np.radians(L + 1.915 * np.sin(g) + 0.020 * np.sin(2 * g))  # ecliptic lon
    ep = np.radians(23.439 - 4e-7 * n)  # obliquity

    ra = np.arctan2(np.cos(ep) * np.sin(ecl), np.cos(ecl))  # right ascension, rad
    # local mean sidereal time at lon=0, deg
    lmst0 = (6.697375 + ut_hours + 0.0657098242 * n) * 15.0
    # hour angle at lon=0, wrapped in float64 on the host so that the (much
    # smaller) residual survives a float32 cast on device
    h0 = (np.radians(lmst0) - ra + np.pi) % (2 * np.pi) - np.pi
    dec = np.arcsin(np.sin(ep) * np.sin(ecl))

    return {"declination": dec, "hour_angle0": h0}


def daily_groups(time, hour_shift=0.0):
    """Group hourly stamps into days after an hour shift.

    Reference semantics: ``T.assign_coords(time=time+hour_shift).resample
    (time='1D').mean()`` (/root/reference/atlite/convert.py:405-418).

    Returns
    -------
    (day_index, group_ids) where ``day_index`` is a DatetimeIndex of unique
    day starts and ``group_ids`` (T,) int32 maps each timestep to its day.
    """
    t = to_datetimeindex(time) + pd.to_timedelta(hour_shift, unit="h")
    days = t.normalize()
    uniq = days.unique()
    ids = uniq.get_indexer(days)
    return uniq, ids.astype(np.int32)


def yearly_groups(time):
    """(year_values, group_ids) for yearly normalisation (convert.py:1062-1082)."""
    t = to_datetimeindex(time)
    years = t.year.values
    uniq = np.unique(years)
    ids = np.searchsorted(uniq, years)
    return uniq, ids.astype(np.int32)
