"""Device pipelines vs the independent numpy oracle (allclose gates of
BASELINE.md: wind CF and PV CF)."""

import numpy as np

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
