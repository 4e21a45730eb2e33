"""Panel surface orientation and tracking — device kernels.

Behavioral parity with /root/reference/atlite/pv/orientation.py:13-196
(fixed orientation plus four tracking modes), expressed as pure jnp
functions over broadcastable arrays so the whole chain fuses into the PV
pipeline's single XLA computation.

Conventions: ``slope`` is the panel-ground angle; ``azimuth`` is clockwise
from North (pi faces South); all angles in radians on device.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

TRACKING_MODES = (None, "horizontal", "tilted_horizontal", "vertical", "dual")


def get_orientation(name, **params):
    """Return an orientation spec dict from a name or explicit parameters.

    Mirrors the reference factory (orientation.py:13-23): accepts
    'latitude_optimal', 'constant' (with slope/azimuth in DEGREES) or
    'latitude' (slope follows latitude).
    """
    if isinstance(name, dict):
        params = dict(name)
        name = params.pop("name", "constant")
    if name == "latitude_optimal":
        return {"kind": "latitude_optimal"}
    if name == "constant":
        return {
            "kind": "constant",
            "slope": float(params.get("slope", 0.0)),
            "azimuth": float(params.get("azimuth", 0.0)),
        }
    if name == "latitude":
        return {"kind": "latitude", "azimuth": float(params.get("azimuth", 180))}
    raise ValueError(f"unknown orientation {name!r}")


def orientation_fields(spec, lat):
    """Evaluate an orientation spec to (slope, azimuth) broadcastable fields.

    ``lat`` is in degrees, shape (Y,); outputs broadcast as (1, Y, 1) or
    scalars.  latitude_optimal follows the piecewise fit of
    orientation.py:50-67 (0.87*|lat| below 25 deg, 0.76*|lat|+0.31 deg below
    50 deg, else 40 deg; equator-facing azimuth).
    """
    latr = jnp.radians(lat)[None, :, None]
    kind = spec["kind"]
    if kind == "constant":
        return jnp.radians(spec["slope"]), jnp.radians(spec["azimuth"])
    if kind == "latitude":
        return latr, jnp.radians(spec["azimuth"])
    if kind == "latitude_optimal":
        a = jnp.abs(latr)
        slope = jnp.where(
            a <= np.radians(25.0),
            0.87 * a,
            jnp.where(a <= np.radians(50.0), 0.76 * a + np.radians(0.31), np.radians(40.0)),
        )
        azimuth = jnp.where(latr < 0, 0.0, np.pi)
        return slope, azimuth
    raise ValueError(f"unknown orientation kind {kind!r}")


def surface_orientation(solar_position, lat, orientation_spec, tracking=None):
    """cos(incidence), effective slope and panel azimuth for a tracking mode.

    Parity with orientation.py:91-196 including the rotation-angle quadrant
    fixups of the tilted-horizontal tracker and the clip of negative
    cos(incidence) (sun behind panel).
    """
    if tracking not in TRACKING_MODES:
        raise AssertionError(
            "tracking must be None, 'horizontal', 'tilted_horizontal', "
            "'vertical' or 'dual'"
        )
    from atlite_tpu.physics.solar import solar_position_trig

    slope, panel_az = orientation_fields(orientation_spec, lat)
    sp = solar_position_trig(solar_position)
    alt = sp["altitude"]
    az = sp["azimuth"]
    # trig-carry: (sin, cos) pairs arrive precomputed from the solar
    # position kernel / the cutout's derived-field cache — no per-element
    # arcsin/arccos -> sin/cos round-trips (PERF.md round 2, 1.45x on the
    # PV chain)
    sin_alt, cos_alt = sp["sin_altitude"], sp["cos_altitude"]

    if tracking is None:
        # cos(panel_az - az) = cos(panel_az) cos(az) + sin(panel_az) sin(az)
        cos_rel = (jnp.cos(panel_az) * sp["cos_azimuth"]
                   + jnp.sin(panel_az) * sp["sin_azimuth"])
        cosincidence = jnp.sin(slope) * cos_alt * cos_rel \
            + jnp.cos(slope) * sin_alt
        surface_slope, surface_azimuth = slope, panel_az

    elif tracking == "horizontal":
        # single horizontal axis along `panel_az`
        axis_az = panel_az
        rotation = jnp.arctan((cos_alt / sin_alt) * jnp.sin(az - axis_az))
        surface_slope = jnp.abs(rotation)
        surface_azimuth = axis_az + jnp.arcsin(jnp.sin(rotation) / jnp.sin(surface_slope))
        cosincidence = jnp.cos(surface_slope) * sin_alt \
            + jnp.sin(surface_slope) * cos_alt * jnp.cos(az - surface_azimuth)

    elif tracking == "tilted_horizontal":
        axis_tilt = slope
        rotation = jnp.arctan(
            (cos_alt * jnp.sin(az - panel_az))
            / (cos_alt * jnp.cos(az - panel_az) * jnp.sin(axis_tilt)
               + sin_alt * jnp.cos(axis_tilt))
        )
        surface_slope = jnp.arccos(jnp.cos(rotation) * jnp.cos(axis_tilt))
        dazi = az - panel_az
        dazi = jnp.where(dazi > np.pi, dazi - 2 * np.pi, dazi)
        dazi = jnp.where(dazi < -np.pi, dazi + 2 * np.pi, dazi)
        rotation = jnp.where((rotation < 0) & (dazi > 0), rotation + np.pi, rotation)
        rotation = jnp.where((rotation > 0) & (dazi < 0), rotation - np.pi, rotation)
        cosincidence = jnp.cos(rotation) * (
            jnp.sin(axis_tilt) * cos_alt * jnp.cos(az - panel_az)
            + jnp.cos(axis_tilt) * sin_alt
        ) + jnp.sin(rotation) * cos_alt * jnp.sin(az - panel_az)
        surface_azimuth = panel_az

    elif tracking == "vertical":
        cosincidence = jnp.sin(slope) * cos_alt + jnp.cos(slope) * sin_alt
        # the reference's vertical branch never reassigns surface_azimuth
        # (orientation.py:169-174): the returned azimuth stays the STATIC
        # panel azimuth even though the tracker follows the sun
        surface_slope, surface_azimuth = slope, panel_az

    else:  # dual
        cosincidence = jnp.ones_like(alt)
        # the reference keeps the STATIC orientation slope/azimuth for
        # 'dual' (orientation.py:175-178 only sets cosincidence=1) — the
        # Hay-Davies transposition reads them; the 'simple' model
        # special-cases dual with cos(slope)=sin(altitude) downstream
        surface_slope, surface_azimuth = slope, panel_az

    return {
        "cosincidence": jnp.clip(cosincidence, 0.0, None),
        "slope": jnp.asarray(surface_slope),
        "azimuth": jnp.asarray(surface_azimuth),
        "tracking": tracking,
    }
