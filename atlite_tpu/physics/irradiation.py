"""Tilted-plane irradiation — device kernels.

Behavioral parity with /root/reference/atlite/pv/irradiation.py:13-255:
Reindl (1990) clearsky decomposition of global horizontal irradiance into
direct/diffuse, transposition onto a tilted plane via either the 'simple'
trigonometric model or Hay-Davies, ground-reflected irradiation via albedo,
and the low-sun suppression mask.

Everything is a pure jnp elementwise function over (T, Y, X) fields — XLA
fuses the full chain (position -> orientation -> decomposition ->
transposition -> panel model) into one kernel, replacing the reference's
per-step dask graphs.

NaN conventions are inherited deliberately: at night influx_toa == 0 makes
the clearsky index NaN; every NaN path is eventually zeroed by the same
masks the reference applies (fillna(0) + altitude/irradiance suppression,
irradiation.py:247-252), which is what conformance hinges on.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def diffuse_horizontal_fraction(k, sinaltitude, temperature=None, humidity=None,
                                clearsky_model="simple"):
    """Reindl diffuse fraction (irradiation.py:27-73).

    k is the clearsky index influx/influx_toa; branches are blended by
    indicator weights exactly like the reference's boolean-mask arithmetic.
    """
    if clearsky_model == "simple":
        b1 = jnp.minimum(1.0, 1.020 - 0.254 * k + 0.0123 * sinaltitude)
        b2 = jnp.minimum(0.97, jnp.maximum(0.1, 1.400 - 1.749 * k + 0.177 * sinaltitude))
        b3 = jnp.maximum(0.1, 0.486 * k - 0.182 * sinaltitude)
    elif clearsky_model == "enhanced":
        T, rh = temperature, humidity
        b1 = jnp.minimum(1.0, 1.000 - 0.232 * k + 0.0239 * sinaltitude
                         - 0.000682 * T + 0.0195 * rh)
        b2 = jnp.minimum(0.97, jnp.maximum(
            0.1, 1.329 - 1.716 * k + 0.267 * sinaltitude - 0.00357 * T + 0.106 * rh))
        b3 = jnp.maximum(0.1, 0.426 * k - 0.256 * sinaltitude
                         + 0.00349 * T + 0.0734 * rh)
    else:
        raise KeyError("`clearsky model` must be chosen from 'simple' and 'enhanced'")
    return (
        ((k > 0.0) & (k <= 0.3)) * b1
        + ((k > 0.3) & (k < 0.78)) * b2
        + (k >= 0.78) * b3
    )


def _albedo(fields, influx):
    """Ground albedo: direct variable, or outflux/influx (irradiation.py:128-139)."""
    if "albedo" in fields:
        return fields["albedo"]
    if "outflux" in fields:
        a = fields["outflux"] / jnp.where(influx != 0, influx, jnp.nan)
        return jnp.clip(jnp.nan_to_num(a, nan=0.0), None, 1.0)
    raise AssertionError(
        "Need either albedo or outflux as a variable in the dataset. "
        "Check your cutout and dataset module."
    )


def tilted_irradiation(
    fields,
    solar_position,
    surface,
    trigon_model="simple",
    clearsky_model="simple",
    tracking=None,
    altitude_threshold=1.0,
    irradiation="total",
):
    """Irradiation on the tilted plane (irradiation.py:148-255).

    fields: dict of (T,Y,X) arrays with either 'influx' (global horizontal)
    or 'influx_direct'+'influx_diffuse', plus 'influx_toa' and albedo info.
    """
    influx_toa = fields["influx_toa"]
    # trig-carry: prefer the precomputed sin(altitude) (PERF.md round 2)
    if "sin_altitude" in solar_position:
        sinaltitude = solar_position["sin_altitude"]
    else:
        sinaltitude = jnp.sin(solar_position["altitude"])
    cosincidence = surface["cosincidence"]
    surface_slope = surface["slope"]

    if "influx" in fields:
        influx = jnp.clip(fields["influx"], 0.0, influx_toa)
        if clearsky_model is None:
            clearsky_model = (
                "enhanced"
                if "temperature" in fields and "humidity" in fields
                else "simple"
            )
        k = influx / influx_toa
        fraction = diffuse_horizontal_fraction(
            k, sinaltitude,
            temperature=fields.get("temperature"),
            humidity=fields.get("humidity"),
            clearsky_model=clearsky_model,
        )
        diffuse = influx * fraction
        direct = influx - diffuse
    elif "influx_direct" in fields and "influx_diffuse" in fields:
        direct = jnp.clip(fields["influx_direct"], 0.0, influx_toa)
        diffuse = jnp.clip(fields["influx_diffuse"], 0.0, influx_toa - direct)
    else:
        raise AssertionError(
            "Need either influx or influx_direct and influx_diffuse in the "
            "dataset. Check your cutout and dataset module."
        )

    if trigon_model == "simple":
        k_geom = cosincidence / sinaltitude
        if tracking != "dual":
            cos_surface_slope = jnp.cos(surface_slope)
        else:
            cos_surface_slope = sinaltitude
        influx = direct + diffuse
        direct_t = k_geom * direct
        diffuse_t = (1.0 + cos_surface_slope) / 2.0 * diffuse
        ground_t = _albedo(fields, influx) * influx * ((1.0 - cos_surface_slope) / 2.0)
        total_t = (jnp.nan_to_num(direct_t, nan=0.0)
                   + jnp.nan_to_num(diffuse_t, nan=0.0)
                   + jnp.nan_to_num(ground_t, nan=0.0))
    else:
        # Hay-Davies anisotropic diffuse (irradiation.py:76-115)
        influx = direct + diffuse
        f = jnp.nan_to_num(jnp.sqrt(direct / influx), nan=0.0)  # brightening
        A = direct / influx_toa  # anisotropy
        R_b = cosincidence / sinaltitude
        diffuse_t = (
            (1.0 - A) * ((1 + jnp.cos(surface_slope)) / 2.0)
            * (1.0 + f * jnp.sin(surface_slope / 2.0) ** 3)
            + A * R_b
        ) * diffuse
        diffuse_t = jnp.nan_to_num(jnp.clip(diffuse_t, 0.0, None), nan=0.0)
        direct_t = R_b * direct
        ground_t = influx * _albedo(fields, influx) * (1.0 - jnp.cos(surface_slope)) / 2.0
        total_t = direct_t + diffuse_t + ground_t

    result = {
        "total": total_t, "direct": direct_t, "diffuse": diffuse_t, "ground": ground_t,
    }[irradiation]

    # Suppress irradiation at low solar altitude where 1/sin(alt) blows up
    # (irradiation.py:247-252); this also zeroes every night-time NaN path.
    # The comparison runs in sin-space — strictly monotone on [-pi/2, pi/2],
    # so exactly equivalent to `altitude < threshold` without touching the
    # angle (trig-carry).
    cap_alt = sinaltitude < np.sin(np.radians(altitude_threshold))
    return jnp.where(cap_alt | (direct + diffuse <= 0.01), 0.0, result)
