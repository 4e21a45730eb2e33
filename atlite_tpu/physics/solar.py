"""Solar position — device kernel.

The astronomy (Michalsky 1988 almanac approximation, as in the reference
/root/reference/atlite/pv/solar_position.py:69-121) is split in two:

- per-time float64 ephemeris tables on the host
  (atlite_tpu.core.timeutil.solar_ephemeris), and
- this fused elementwise broadcast over (time, y, x) on the device.

The split keeps Julian-date magnitudes out of float32 while letting the
(T, Y, X) trig run at full VPU rate.  Accuracy vs the reference float64 path
is < 1e-5 rad in float64 mode and < 1e-3 rad in float32 mode.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def solar_position(declination, hour_angle0, lon, lat):
    """Solar altitude/azimuth fields.

    Parameters
    ----------
    declination : (T,) solar declination [rad]
    hour_angle0 : (T,) hour angle at lon=0 [rad], wrapped to (-pi, pi]
    lon : (X,) longitudes [deg]
    lat : (Y,) latitudes [deg]

    Returns
    -------
    dict with ``altitude`` and ``azimuth`` (T, Y, X) [rad].  Azimuth is
    clockwise from North (pi faces South), matching the reference
    (solar_position.py:109-114).
    """
    dec = declination[:, None, None]
    two_pi = 2 * np.pi
    h = (hour_angle0[:, None, None] + jnp.radians(lon)[None, None, :] + np.pi) % two_pi - np.pi
    latr = jnp.radians(lat)[None, :, None]

    sin_dec, cos_dec = jnp.sin(dec), jnp.cos(dec)
    sin_lat, cos_lat = jnp.sin(latr), jnp.cos(latr)
    cos_h = jnp.cos(h)

    # clip against rounding excursions beyond +-1 (solar_position.py:101-105)
    sin_alt = jnp.clip(sin_dec * sin_lat + cos_dec * cos_lat * cos_h, -1.0, 1.0)
    alt = jnp.arcsin(sin_alt)
    # altitude is in [-pi/2, pi/2], so cos >= 0: sqrt instead of cos(arcsin)
    cos_alt = jnp.sqrt(jnp.clip(1.0 - sin_alt**2, 0.0, None))
    cos_az = jnp.clip(
        (sin_dec * cos_lat - cos_dec * sin_lat * cos_h) / cos_alt, -1.0, 1.0)
    az = jnp.arccos(cos_az)
    az = jnp.where(h <= 0, az, two_pi - az)
    # trig-carry (PERF.md round 2): downstream orientation/transposition
    # consumes (sin, cos) pairs directly, skipping arcsin/arccos->sin/cos
    # round-trips.  sin(az) keeps the hemisphere flip's sign:
    # az' = 2pi - az  =>  sin(az') = -sin(az); cos unchanged.
    sin_az = jnp.sqrt(jnp.clip(1.0 - cos_az**2, 0.0, None))
    sin_az = jnp.where(h <= 0, sin_az, -sin_az)
    return {"altitude": alt, "azimuth": az,
            "sin_altitude": sin_alt, "cos_altitude": cos_alt,
            "sin_azimuth": sin_az, "cos_azimuth": cos_az}


def solar_position_trig(solar_position_dict):
    """Ensure a solar-position dict carries the (sin, cos) pairs —
    derives them from the angles when absent (stored-angle fast lane)."""
    sp = dict(solar_position_dict)
    if "sin_altitude" not in sp:
        sp["sin_altitude"] = jnp.sin(sp["altitude"])
        sp["cos_altitude"] = jnp.cos(sp["altitude"])
    if "sin_azimuth" not in sp:
        sp["sin_azimuth"] = jnp.sin(sp["azimuth"])
        sp["cos_azimuth"] = jnp.cos(sp["azimuth"])
    return sp


def solar_position_numpy(declination, hour_angle0, lon, lat):
    """Float64 host (numpy) twin of :func:`solar_position` — used by the
    synthetic dataset generator and as the conformance oracle in tests."""
    dec = np.asarray(declination)[:, None, None]
    two_pi = 2 * np.pi
    h = (np.asarray(hour_angle0)[:, None, None]
         + np.radians(lon)[None, None, :] + np.pi) % two_pi - np.pi
    latr = np.radians(lat)[None, :, None]
    alt = np.arcsin(
        np.clip(np.sin(dec) * np.sin(latr) + np.cos(dec) * np.cos(latr) * np.cos(h),
                -1.0, 1.0)
    )
    az = np.arccos(
        np.clip((np.sin(dec) * np.cos(latr) - np.cos(dec) * np.sin(latr) * np.cos(h))
                / np.cos(alt), -1.0, 1.0)
    )
    az = np.where(h <= 0, az, two_pi - az)
    return {"altitude": alt, "azimuth": az}
