"""PV panel electrical models — device kernels.

Parity with /root/reference/atlite/pv/solar_panel_model.py:12-86:
Huld et al. (2010) log-polynomial efficiency model and the Beyer/Bofinger
MPP model, as pure jnp elementwise functions that fuse into the PV chain.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def power_huld(irradiance, t_amb, pc):
    """AC power per unit capacity, Huld model (solar_panel_model.py:12-44)."""
    T_ = (pc["c_temp_amb"] * t_amb + pc["c_temp_irrad"] * irradiance) - pc["r_tmod"]
    G_ = irradiance / pc["r_irradiance"]
    log_G_ = jnp.log(jnp.where(G_ > 0, G_, jnp.nan))
    eff = (
        1
        + pc["k_1"] * log_G_
        + pc["k_2"] * log_G_**2
        + T_ * (pc["k_3"] + pc["k_4"] * log_G_ + pc["k_5"] * log_G_**2)
        + pc["k_6"] * T_**2
    )
    eff = jnp.clip(jnp.nan_to_num(eff, nan=0.0), 0.0, None)
    return G_ * eff * pc.get("inverter_efficiency", 1.0)


def power_bofinger(irradiance, t_amb, pc):
    """AC power per unit capacity, Bofinger model (solar_panel_model.py:47-74)."""
    fraction = (pc["NOCT"] - pc["Tamb"]) / pc["Intc"]
    eta_ref = (
        pc["A"] + pc["B"] * irradiance
        + pc["C"] * jnp.log(jnp.where(irradiance != 0, irradiance, jnp.nan))
    )
    eta = jnp.nan_to_num(
        eta_ref
        * (1.0 + pc["D"] * (fraction * irradiance + (t_amb - pc["Tstd"])))
        / (1.0 + pc["D"] * fraction / pc["ta"] * eta_ref * irradiance),
        nan=0.0,
    )
    capacity = (pc["A"] + pc["B"] * 1000.0 + pc["C"] * np.log(1000.0)) * 1e3
    power = irradiance * eta * (pc.get("inverter_efficiency", 1.0) / capacity)
    return jnp.where(irradiance >= pc["threshold"], power, 0.0)


def solar_panel_power(irradiance, temperature, pc):
    """Dispatch on panel config 'model' (solar_panel_model.py:77-85)."""
    model = pc.get("model", "huld")
    if model == "huld":
        return power_huld(irradiance, temperature, pc)
    if model == "bofinger":
        return power_bofinger(irradiance, temperature, pc)
    raise AssertionError(f"Unknown panel model: {model}")
