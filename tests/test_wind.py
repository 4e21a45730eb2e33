"""Wind physics + pipeline tests (model: reference wind usage in
test/test_preparation_and_conversion.py)."""

import numpy as np
import jax.numpy as jnp
import pytest

from atlite_tpu.physics import wind as W
from atlite_tpu.resource import get_windturbineconfig, windturbine_smooth, windturbines


def test_log_law_extrapolation():
    fields = {
        "wnd100m": jnp.full((2, 3, 4), 8.0),
        "roughness": jnp.full((2, 3, 4), 0.03),
    }
    out = np.asarray(W.extrapolate_wind_speed(fields, 80.0))
    expected = 8.0 * np.log(80 / 0.03) / np.log(100 / 0.03)
    np.testing.assert_allclose(out, expected, rtol=1e-12)


def test_power_law_extrapolation():
    fields = {
        "wnd100m": jnp.full((2, 2, 2), 10.0),
        "wnd_shear_exp": jnp.full((2, 2, 2), 0.14),
    }
    out = np.asarray(W.extrapolate_wind_speed(fields, 50.0, method="power"))
    np.testing.assert_allclose(out, 10.0 * (0.5) ** 0.14, rtol=1e-12)


def test_fast_lane():
    wnd = jnp.ones((1, 1, 1)) * 7
    fields = {"wnd80m": wnd, "roughness": jnp.ones((1, 1, 1))}
    assert W.extrapolate_wind_speed(fields, 80) is wnd


def test_closest_height_selection():
    fields = {"wnd10m": jnp.ones((1, 1, 1)) * 5, "wnd100m": jnp.ones((1, 1, 1)) * 9,
              "roughness": jnp.full((1, 1, 1), 0.1)}
    # to 120 m -> from 100 m
    out = np.asarray(W.extrapolate_wind_speed(fields, 120))
    expected = 9 * np.log(120 / 0.1) / np.log(100 / 0.1)
    np.testing.assert_allclose(out, expected, rtol=1e-12)


def test_missing_inputs_raise():
    with pytest.raises(RuntimeError):
        W.extrapolate_wind_speed({"wnd100m": jnp.ones((1,))}, 80, method="logarithmic")
    with pytest.raises(RuntimeError):
        W.extrapolate_wind_speed({"wnd100m": jnp.ones((1,))}, 80, method="power")
    with pytest.raises(ValueError):
        W.extrapolate_wind_speed(
            {"wnd100m": jnp.ones((1,)), "roughness": jnp.ones((1,))}, 80,
            method="nearest",
        )


def test_power_curve_interp():
    V = np.array([0.0, 5.0, 10.0, 25.0, 25.01])
    POW = np.array([0.0, 0.5, 3.0, 3.0, 0.0])
    out = np.asarray(W.power_curve(jnp.asarray([2.5, 7.5, 30.0]), V, POW, 3.0))
    np.testing.assert_allclose(out, [0.25 / 3, 1.75 / 3, 0.0], rtol=1e-6)


def test_turbine_registry():
    assert "Vestas_V112_3MW" in windturbines
    conf = get_windturbineconfig("Vestas_V112_3MW")
    # measured datasheet curve (reference resources/windturbine/
    # Vestas_V112_3MW.yaml:13-20): peak 3.06 MW at 13 m/s, hub 80 m
    assert conf["P"] == 3.06
    assert conf["hub_height"] == 80.0
    assert list(conf["V"][:5]) == [0.0, 2.0, 3.0, 4.0, 5.0]
    assert conf["POW"][2] == 0.005 and conf["POW"][3] == 0.15
    assert np.all(np.diff(conf["V"]) >= 0)
    assert conf["POW"][-1] == 0  # has cut-out


def test_power_curve_matches_np_interp_at_duplicate_knots():
    """np.interp semantics at duplicated knots (cut-in/cut-out jumps) and
    NaN propagation — the reference applies np.interp directly
    (convert.py:648-658)."""
    V = np.array([0.0, 3.0, 12.0, 25.0, 25.0])
    POW = np.array([0.0, 0.0, 3.0, 3.0, 0.0])
    q = np.array([25.0, 24.999, 25.001, 3.0, 0.0, 30.0, np.nan])
    ours = np.asarray(W.power_curve(jnp.asarray(q), V, POW, 3.0))
    ref = np.interp(q, V, POW) / 3.0
    np.testing.assert_allclose(ours[:-1], ref[:-1], atol=1e-6)
    assert np.isnan(ours[-1])
    assert ours[0] == 0.0  # exactly at cut-out -> post-jump (zero), not rated


def test_turbine_catalog_reference_parity():
    """Every turbine the reference registry exposes resolves here too
    (reference resources/windturbine/*.yaml; registry resource.py:514)."""
    reference_names = [
        "Bonus_B1000_1000kW", "Enercon_E101_3000kW", "Enercon_E126_7500kW",
        "Enercon_E82_3000kW",
        "NREL_ReferenceTurbine_2016CACost_10MW_offshore",
        "NREL_ReferenceTurbine_2016CACost_6MW_offshore",
        "NREL_ReferenceTurbine_2016CACost_8MW_offshore",
        "NREL_ReferenceTurbine_2019ORCost_12MW_offshore",
        "NREL_ReferenceTurbine_2019ORCost_15MW_offshore",
        "NREL_ReferenceTurbine_2020ATB_12MW_offshore",
        "NREL_ReferenceTurbine_2020ATB_15MW_offshore",
        "NREL_ReferenceTurbine_2020ATB_18MW_offshore",
        "NREL_ReferenceTurbine_2020ATB_4MW",
        "NREL_ReferenceTurbine_2020ATB_5.5MW",
        "NREL_ReferenceTurbine_2020ATB_7MW",
        "NREL_ReferenceTurbine_5MW_offshore",
        "Siemens_SWT_107_3600kW", "Siemens_SWT_2300kW", "Suzlon_S82_1.5_MW",
        "Vestas_V112_3MW", "Vestas_V112_3MW_offshore",
        "Vestas_V164_7MW_offshore", "Vestas_V25_200kW", "Vestas_V47_660kW",
        "Vestas_V66_1750kW", "Vestas_V80_2MW_gridstreamer", "Vestas_V90_3MW",
    ]
    for name in reference_names:
        assert name in windturbines, name
        conf = get_windturbineconfig(name)
        assert np.all(np.diff(conf["V"]) >= 0)
        assert conf["POW"].max() == conf["P"] > 0
        assert conf["POW"][-1] == 0  # cut-out present
    # the extension-less eno_126_* files are path-only, like the reference
    from atlite_tpu.resource import WINDTURBINE_DIRECTORY

    for name in ("eno_126_3.5", "eno_126_4", "eno_126_4.8"):
        assert name not in windturbines
        conf = get_windturbineconfig(WINDTURBINE_DIRECTORY / name)
        assert conf["hub_height"] == 117.0


def test_turbine_dict_validation():
    conf = get_windturbineconfig(
        dict(V=[0, 10, 20], POW=[0, 1, 1], P=1, hub_height=100),
        add_cutout_windspeed=True,
    )
    assert conf["POW"][-1] == 0 and conf["V"][-1] == 20
    with pytest.raises(ValueError):
        get_windturbineconfig(dict(V=[0, 10], POW=[0, 1, 1], P=1, hub_height=100))
    with pytest.raises(ValueError):
        get_windturbineconfig(dict(V=[10, 0], POW=[0, 1], P=1, hub_height=100))


def test_smoothing():
    conf = get_windturbineconfig("Vestas_V112_3MW")
    sm = windturbine_smooth(conf)
    assert sm["V"].shape == (72,)
    assert sm["P"] <= conf["P"] + 1e-6
    # smoothed curve should conserve roughly the plateau
    assert sm["POW"].max() > 0.8 * conf["P"]


def test_wind_conversion(cutout):
    cf = cutout.wind("Vestas_V112_3MW", aggregate_time=None)
    vals = np.asarray(cf.values)
    assert cf.dims == ("time", "y", "x")
    assert np.all(vals >= 0) and np.all(vals <= 1.0 + 1e-9)
    assert vals.std() > 0


def test_wind_methods_differ(cutout):
    log = cutout.wind("Vestas_V112_3MW", aggregate_time=None)
    pw = cutout.wind("Vestas_V112_3MW", aggregate_time=None,
                     interpolation_method="power")
    assert not np.allclose(log.values, pw.values)
