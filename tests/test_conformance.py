"""Device pipelines vs the independent numpy oracle (allclose gates of
BASELINE.md: wind CF and PV CF)."""

import numpy as np
import pytest

from atlite_tpu import reference_impl as ref
from atlite_tpu.resource import get_solarpanelconfig, get_windturbineconfig


def test_wind_cf_allclose(cutout):
    turbine = get_windturbineconfig("Vestas_V112_3MW")
    cf = cutout.wind("Vestas_V112_3MW", aggregate_time=None)
    oracle = ref.wind_cf_numpy(
        {k: np.asarray(v) for k, v in cutout.data.items()},
        turbine["V"], turbine["POW"], turbine["P"], turbine["hub_height"],
    )
    np.testing.assert_allclose(np.asarray(cf.values), oracle, rtol=1e-10,
                               atol=1e-12)


def test_wind_cf_power_method_allclose(cutout):
    turbine = get_windturbineconfig("Vestas_V112_3MW")
    cf = cutout.wind("Vestas_V112_3MW", aggregate_time=None,
                     interpolation_method="power")
    oracle = ref.wind_cf_numpy(
        {k: np.asarray(v) for k, v in cutout.data.items()},
        turbine["V"], turbine["POW"], turbine["P"], turbine["hub_height"],
        method="power",
    )
    np.testing.assert_allclose(np.asarray(cf.values), oracle, rtol=1e-10,
                               atol=1e-12)


@pytest.mark.parametrize("tracking", [None, "horizontal", "tilted_horizontal",
                                      "vertical", "dual"])
def test_surface_orientation_allclose(cutout, tracking):
    import jax.numpy as jnp

    from atlite_tpu.physics.orientation import get_orientation, surface_orientation

    alt = np.asarray(cutout.data["solar_altitude"])
    az = np.asarray(cutout.data["solar_azimuth"])
    spec = get_orientation({"slope": 30.0, "azimuth": 180.0})
    surf = surface_orientation(
        {"altitude": jnp.asarray(alt), "azimuth": jnp.asarray(az)},
        jnp.asarray(cutout.grid_desc.y), spec, tracking,
    )
    cos_ref, slope_ref = ref.surface_orientation_numpy(
        alt, az, cutout.grid_desc.y, 30.0, 180.0, tracking
    )
    got = np.asarray(surf["cosincidence"])
    # NaN patterns (sun at horizon for tracker singularities) must agree
    np.testing.assert_array_equal(np.isnan(got), np.isnan(cos_ref))
    ok = ~np.isnan(cos_ref)
    np.testing.assert_allclose(got[ok], cos_ref[ok], atol=1e-10)
    # the effective surface slope feeds the Hay-Davies transposition —
    # compare it too (dual keeps the STATIC slope, orientation.py:175-178)
    slope_got = np.broadcast_to(np.asarray(surf["slope"]), alt.shape)
    slope_exp = np.broadcast_to(slope_ref, alt.shape)
    oks = ~np.isnan(slope_exp)
    np.testing.assert_allclose(slope_got[oks], slope_exp[oks], atol=1e-10)


def test_hay_davies_allclose(cutout):
    import jax.numpy as jnp

    irr = cutout.irradiation(orientation={"slope": 35.0, "azimuth": 180.0},
                             trigon_model="hay-davies", aggregate_time=None)
    alt = np.asarray(cutout.data["solar_altitude"])
    az = np.asarray(cutout.data["solar_azimuth"])
    cosinc, slope = ref.surface_orientation_numpy(
        alt, az, cutout.grid_desc.y, 35.0, 180.0, None
    )
    oracle = ref.tilted_total_hay_davies_numpy(
        {k: np.asarray(v) for k, v in cutout.data.items()}, alt, cosinc, slope
    )
    np.testing.assert_allclose(np.asarray(irr.values), oracle, rtol=1e-8,
                               atol=1e-10)


def test_bofinger_allclose(cutout):
    from atlite_tpu.resource import get_solarpanelconfig

    pc = get_solarpanelconfig("KANENA")
    cf = cutout.pv(panel="KANENA",
                   orientation={"slope": 35.0, "azimuth": 180.0},
                   aggregate_time=None)
    alt = np.asarray(cutout.data["solar_altitude"])
    az = np.asarray(cutout.data["solar_azimuth"])
    cosinc, slope = ref.surface_orientation_numpy(
        alt, az, cutout.grid_desc.y, 35.0, 180.0, None
    )
    # simple trigon model oracle
    fields = {k: np.asarray(v) for k, v in cutout.data.items()}
    toa = fields["influx_toa"]
    direct = np.clip(fields["influx_direct"], 0, toa)
    diffuse = np.clip(fields["influx_diffuse"], 0, toa - direct)
    with np.errstate(divide="ignore", invalid="ignore"):
        kg = cosinc / np.sin(alt)
        influx = direct + diffuse
        total = (np.nan_to_num(kg * direct)
                 + np.nan_to_num((1 + np.cos(slope)) / 2 * diffuse)
                 + np.nan_to_num(fields["albedo"] * influx
                                 * (1 - np.cos(slope)) / 2))
    cap = (alt < np.radians(1.0)) | (direct + diffuse <= 0.01)
    irr = np.where(cap, 0.0, total)
    oracle = ref.power_bofinger_numpy(irr, fields["temperature"], pc)
    np.testing.assert_allclose(np.asarray(cf.values), oracle, rtol=1e-8,
                               atol=1e-10)


def test_pv_cf_allclose(cutout):
    panel = get_solarpanelconfig("CSi")
    cf = cutout.pv(panel="CSi", orientation="latitude_optimal",
                   aggregate_time=None)
    oracle = ref.pv_cf_numpy(
        {k: np.asarray(v) for k, v in cutout.data.items()},
        cutout.grid_desc.y, panel,
    )
    np.testing.assert_allclose(np.asarray(cf.values), oracle, rtol=1e-8,
                               atol=1e-10)
