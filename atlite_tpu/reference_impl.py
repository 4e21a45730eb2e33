"""Pure-numpy mirror of the hot conversion pipelines.

Two purposes:
1. conformance oracle — float64 numpy implementations of the wind and PV
   chains, written independently of the jnp kernels, that tests compare
   elementwise against the device pipelines,
2. benchmark baseline — a faithful stand-in for the reference's
   numpy-under-dask execution model (the reference itself needs
   xarray/dask/GDAL which are outside this framework's dependency set);
   bench.py times this path to compute ``vs_baseline``.
"""

from __future__ import annotations

import numpy as np


def wind_cf_numpy(fields, V, POW, P, hub_height, method="logarithmic"):
    w = np.asarray(fields["wnd100m"], dtype=float)
    if method == "logarithmic":
        z0 = np.asarray(fields["roughness"], dtype=float)
        hub = w * (np.log(hub_height / z0) / np.log(100.0 / z0))
    else:
        hub = w * (hub_height / 100.0) ** np.asarray(fields["wnd_shear_exp"], float)
    return np.interp(hub, V, np.asarray(POW) / P)


def _latitude_optimal_numpy(lat):
    latr = np.radians(np.asarray(lat, dtype=float))[None, :, None]
    a = np.abs(latr)
    slope = np.where(
        a <= np.radians(25.0), 0.87 * a,
        np.where(a <= np.radians(50.0), 0.76 * a + np.radians(0.31),
                 np.radians(40.0)),
    )
    azimuth = np.where(latr < 0, 0.0, np.pi)
    return slope, azimuth


def surface_orientation_numpy(alt, az, lat, slope_deg, panel_az_deg, tracking):
    """Float64 numpy twin of physics.orientation.surface_orientation for a
    constant orientation, all tracking modes."""
    slope = np.radians(slope_deg)
    panel_az = np.radians(panel_az_deg)
    sin_alt, cos_alt = np.sin(alt), np.cos(alt)
    with np.errstate(divide="ignore", invalid="ignore"):
        if tracking is None:
            cosinc = (np.sin(slope) * cos_alt * np.cos(panel_az - az)
                      + np.cos(slope) * sin_alt)
            out_slope = np.broadcast_to(slope, alt.shape)
        elif tracking == "horizontal":
            rotation = np.arctan((cos_alt / sin_alt) * np.sin(az - panel_az))
            out_slope = np.abs(rotation)
            surf_az = panel_az + np.arcsin(np.sin(rotation) / np.sin(out_slope))
            cosinc = (np.cos(out_slope) * sin_alt
                      + np.sin(out_slope) * cos_alt * np.cos(az - surf_az))
        elif tracking == "tilted_horizontal":
            axis_tilt = slope
            rotation = np.arctan(
                (cos_alt * np.sin(az - panel_az))
                / (cos_alt * np.cos(az - panel_az) * np.sin(axis_tilt)
                   + sin_alt * np.cos(axis_tilt))
            )
            out_slope = np.arccos(np.cos(rotation) * np.cos(axis_tilt))
            dazi = az - panel_az
            dazi = np.where(dazi > np.pi, dazi - 2 * np.pi, dazi)
            dazi = np.where(dazi < -np.pi, dazi + 2 * np.pi, dazi)
            rotation = np.where((rotation < 0) & (dazi > 0), rotation + np.pi,
                                rotation)
            rotation = np.where((rotation > 0) & (dazi < 0), rotation - np.pi,
                                rotation)
            cosinc = np.cos(rotation) * (
                np.sin(axis_tilt) * cos_alt * np.cos(az - panel_az)
                + np.cos(axis_tilt) * sin_alt
            ) + np.sin(rotation) * cos_alt * np.sin(az - panel_az)
        elif tracking == "vertical":
            cosinc = np.sin(slope) * cos_alt + np.cos(slope) * sin_alt
            out_slope = np.broadcast_to(slope, alt.shape)
        elif tracking == "dual":
            # reference orientation.py:175-178 keeps the STATIC slope
            cosinc = np.ones_like(alt)
            out_slope = np.broadcast_to(slope, alt.shape)
        else:
            raise ValueError(tracking)
    return np.clip(cosinc, 0.0, None), out_slope


def tilted_total_hay_davies_numpy(fields, alt, cosinc, slope,
                                  altitude_threshold=1.0):
    """Hay-Davies transposition, float64 (reference irradiation.py:76-145,
    228-236)."""
    toa = np.asarray(fields["influx_toa"], dtype=float)
    direct = np.clip(np.asarray(fields["influx_direct"], dtype=float), 0, toa)
    diffuse = np.clip(np.asarray(fields["influx_diffuse"], dtype=float),
                      0, toa - direct)
    sin_alt = np.sin(alt)
    with np.errstate(divide="ignore", invalid="ignore"):
        influx = direct + diffuse
        f = np.nan_to_num(np.sqrt(direct / influx))
        A = direct / toa
        R_b = cosinc / sin_alt
        diffuse_t = ((1.0 - A) * ((1 + np.cos(slope)) / 2.0)
                     * (1.0 + f * np.sin(slope / 2.0) ** 3) + A * R_b) * diffuse
        diffuse_t = np.nan_to_num(np.clip(diffuse_t, 0.0, None))
        direct_t = R_b * direct
        ground_t = (influx * np.asarray(fields["albedo"], dtype=float)
                    * (1.0 - np.cos(slope)) / 2.0)
        total = direct_t + diffuse_t + ground_t
    cap = (alt < np.radians(altitude_threshold)) | (direct + diffuse <= 0.01)
    return np.where(cap, 0.0, total)


def power_bofinger_numpy(irr, t_amb, pc):
    """Bofinger panel model, float64 (solar_panel_model.py:47-74)."""
    fraction = (pc["NOCT"] - pc["Tamb"]) / pc["Intc"]
    with np.errstate(divide="ignore", invalid="ignore"):
        eta_ref = (pc["A"] + pc["B"] * irr
                   + pc["C"] * np.log(np.where(irr != 0, irr, np.nan)))
        eta = np.nan_to_num(
            eta_ref * (1.0 + pc["D"] * (fraction * irr + (t_amb - pc["Tstd"])))
            / (1.0 + pc["D"] * fraction / pc["ta"] * eta_ref * irr)
        )
    capacity = (pc["A"] + pc["B"] * 1000.0 + pc["C"] * np.log(1000.0)) * 1e3
    power = irr * eta * (pc.get("inverter_efficiency", 1.0) / capacity)
    return np.where(irr >= pc["threshold"], power, 0.0)


def pv_cf_numpy(fields, lat, panel, altitude_threshold=1.0):
    """Fixed latitude-optimal panel, simple trigon model, Huld panel."""
    alt = np.asarray(fields["solar_altitude"], dtype=float)
    az = np.asarray(fields["solar_azimuth"], dtype=float)
    slope, pazim = _latitude_optimal_numpy(lat)

    cosinc = np.clip(
        np.sin(slope) * np.cos(alt) * np.cos(pazim - az)
        + np.cos(slope) * np.sin(alt), 0.0, None,
    )
    toa = np.asarray(fields["influx_toa"], dtype=float)
    direct = np.clip(np.asarray(fields["influx_direct"], dtype=float), 0.0, toa)
    diffuse = np.clip(np.asarray(fields["influx_diffuse"], dtype=float),
                      0.0, toa - direct)

    with np.errstate(divide="ignore", invalid="ignore"):
        k = cosinc / np.sin(alt)
        influx = direct + diffuse
        direct_t = k * direct
        diffuse_t = (1.0 + np.cos(slope)) / 2.0 * diffuse
        ground_t = (np.asarray(fields["albedo"], dtype=float) * influx
                    * (1.0 - np.cos(slope)) / 2.0)
        total = (np.nan_to_num(direct_t) + np.nan_to_num(diffuse_t)
                 + np.nan_to_num(ground_t))
    cap = (alt < np.radians(altitude_threshold)) | (direct + diffuse <= 0.01)
    irr = np.where(cap, 0.0, total)

    # Huld model
    t_amb = np.asarray(fields["temperature"], dtype=float)
    T_ = (panel["c_temp_amb"] * t_amb + panel["c_temp_irrad"] * irr) - panel["r_tmod"]
    G_ = irr / panel["r_irradiance"]
    with np.errstate(divide="ignore", invalid="ignore"):
        logG = np.log(np.where(G_ > 0, G_, np.nan))
        eff = (1 + panel["k_1"] * logG + panel["k_2"] * logG**2
               + T_ * (panel["k_3"] + panel["k_4"] * logG + panel["k_5"] * logG**2)
               + panel["k_6"] * T_**2)
    eff = np.clip(np.nan_to_num(eff), 0.0, None)
    return G_ * eff * panel.get("inverter_efficiency", 1.0)
