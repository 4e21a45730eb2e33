"""Wind physics — device kernels.

Hub-height extrapolation (logarithmic and power law) and power-curve
evaluation; parity with /root/reference/atlite/wind.py:24-128 and
/root/reference/atlite/convert.py:634-662.

The power curve lookup uses jnp.interp (piecewise-linear gather), which XLA
fuses with the extrapolation into one elementwise kernel over (T, Y, X).
"""

from __future__ import annotations

import re

import jax.numpy as jnp


def closest_wind_height(available_heights, to_height):
    """Pick the dataset wind-speed height closest to the target (wind.py:80-88)."""
    import numpy as np

    heights = np.asarray(sorted(available_heights))
    if heights.size == 0:
        raise AssertionError("Wind speed is not in dataset")
    return int(heights[np.argmin(np.abs(heights - to_height))])


def wind_speed_heights(fields):
    """All heights h for which a 'wnd{h}m' variable exists."""
    return [int(m.group(1)) for v in fields
            if (m := re.fullmatch(r"wnd(\d+)m", v))]


def extrapolate_wind_speed(fields, to_height, from_height=None, method="logarithmic"):
    """Extrapolate wind speed to ``to_height`` (wind.py:24-128).

    fields: dict with 'wnd{h}m' plus 'roughness' (log law) or
    'wnd_shear_exp' (power law).  Fast lane: if 'wnd{to_height}m' exists it
    is returned unchanged (wind.py:76-78).
    """
    to_name = f"wnd{int(to_height):0d}m"
    if to_name in fields:
        return fields[to_name]

    if from_height is None:
        from_height = closest_wind_height(wind_speed_heights(fields), to_height)
    from_name = f"wnd{int(from_height):0d}m"

    if method == "logarithmic":
        if "roughness" not in fields:
            raise RuntimeError(
                "The logarithmic interpolation method requires surface "
                "roughness (roughness); make sure you choose a compatible "
                "dataset like era5"
            )
        roughness = fields["roughness"]
        return fields[from_name] * (
            jnp.log(to_height / roughness) / jnp.log(from_height / roughness)
        )
    if method == "power":
        if "wnd_shear_exp" not in fields:
            raise RuntimeError(
                "The power law interpolation method requires a wind shear "
                "exponent (wnd_shear_exp); make sure you choose a compatible "
                "dataset like era5 and update your cutout"
            )
        return fields[from_name] * (to_height / from_height) ** fields["wnd_shear_exp"]
    raise ValueError(
        f"Interpolation method must be 'logarithmic' or 'power', but is: {method}"
    )


def power_curve(wind_speed, V, POW, P):
    """Evaluate the normalised turbine power curve: interp(V, POW/P)
    (convert.py:648-658).  Outside [V[0], V[-1]] clamps to the end values,
    matching numpy.interp."""
    return jnp.interp(wind_speed, jnp.asarray(V), jnp.asarray(POW) / P)
