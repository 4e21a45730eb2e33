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
