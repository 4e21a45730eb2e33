"""Temperature-derived converters — device kernels.

Parity with /root/reference/atlite/convert.py:291-630: ambient/soil/dewpoint
temperature, heat-pump COP, degree-day heat/cooling demand (daily means via
segment reduction), and solar-thermal collector output.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

KELVIN = 273.15

COP_COEFFS = {
    # quadratic COP regressions, Staffell et al. 2012 (convert.py:343-358)
    "air": (6.81, -0.121, 0.000630),
    "soil": (8.77, -0.150, 0.000734),
}


def temperature_celsius(fields):
    """K -> degC (convert.py:292-298)."""
    return fields["temperature"] - KELVIN


def soil_temperature_celsius(fields):
    """K -> degC with sea NaNs zeroed (convert.py:306-316)."""
    return jnp.nan_to_num(fields["soil temperature"] - KELVIN, nan=0.0)


def dewpoint_temperature_celsius(fields):
    """K -> degC (convert.py:324-329)."""
    return fields["dewpoint temperature"] - KELVIN


def coefficient_of_performance(source_T, sink_T, c0, c1, c2):
    """COP = c0 + c1*dT + c2*dT^2 with dT = sink - source (convert.py:338-362)."""
    delta_T = sink_T - source_T
    return c0 + c1 * delta_T + c2 * delta_T**2


def daily_mean(field, group_ids, n_days):
    """Mean over each day along the leading time axis (segment reduction).

    Replaces the reference's ``resample(time='1D').mean()``
    (convert.py:412) with a segment_sum — a single scatter-add the TPU
    executes in one pass over HBM.
    """
    ones = jnp.ones((field.shape[0],), field.dtype)
    counts = jax.ops.segment_sum(ones, group_ids, num_segments=n_days)
    sums = jax.ops.segment_sum(field, group_ids, num_segments=n_days)
    return sums / counts[(...,) + (None,) * (field.ndim - 1)]


def degree_day_demand(daily_T, threshold, a, constant, kind):
    """Degree-day heat/cooling demand from daily-mean temperature [K]
    (convert.py:405-418, 475-488).  ``threshold`` in degC."""
    thr = threshold + KELVIN
    if kind == "heat":
        demand = a * (thr - daily_T)
    else:
        demand = a * (daily_T - thr)
    return constant + jnp.clip(demand, 0.0, None)


def solar_thermal_output(irradiation, temperature, c0, c1, t_store):
    """Solar-thermal collector output (convert.py:550-572).

    eta = c0 - c1*(T_store - T_amb)/G, negative output zeroed.
    ``t_store`` in degC, ``temperature`` in K.
    """
    t_store_K = t_store + KELVIN
    ratio = jnp.nan_to_num(
        (t_store_K - temperature) / jnp.where(irradiation != 0, irradiation, jnp.nan),
        nan=0.0,
    )
    eta = c0 - c1 * ratio
    output = irradiation * eta
    return jnp.where(output > 0.0, output, 0.0)
