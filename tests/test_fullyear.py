"""Full-year system test: the BASELINE.md correctness gate on a complete
annual cutout (8760 h) — all main converters run end-to-end and the hot
pipelines match the float64 oracle."""

import numpy as np
import pytest

from atlite_tpu import Cutout
from atlite_tpu import reference_impl as ref
from atlite_tpu.resource import get_solarpanelconfig, get_windturbineconfig


@pytest.fixture(scope="module")
def year_cutout():
    c = Cutout(path=None, module="synthetic", x=slice(-4, 3.75), y=slice(50, 55.75),
               time="2013", dtype="float64")
    c.prepare()
    return c


def test_year_dimensions(year_cutout):
    assert len(year_cutout.grid_desc.time) == 8760
    assert year_cutout.shape == (24, 32)


def test_year_wind_allclose(year_cutout):
    turbine = get_windturbineconfig("Vestas_V112_3MW")
    cf = year_cutout.wind("Vestas_V112_3MW", aggregate_time=None)
    oracle = ref.wind_cf_numpy(
        {k: np.asarray(v) for k, v in year_cutout.data.items()},
        turbine["V"], turbine["POW"], turbine["P"], turbine["hub_height"],
    )
    np.testing.assert_allclose(np.asarray(cf.values), oracle, rtol=1e-10,
                               atol=1e-12)
    # exact pinned annual CF: synthetic weather is deterministic (seeded)
    # and the real V112 curve is fixed, so the number is reproducible —
    # any drift is a physics regression (VERDICT r2 weak item 5)
    annual_cf = float(np.asarray(cf.values).mean())
    np.testing.assert_allclose(annual_cf, 0.511356830734, rtol=1e-6)


def test_year_pv_allclose(year_cutout):
    panel = get_solarpanelconfig("CSi")
    cf = year_cutout.pv(panel="CSi", orientation="latitude_optimal",
                        aggregate_time=None)
    oracle = ref.pv_cf_numpy(
        {k: np.asarray(v) for k, v in year_cutout.data.items()},
        year_cutout.grid_desc.y, panel,
    )
    np.testing.assert_allclose(np.asarray(cf.values), oracle, rtol=1e-8,
                               atol=1e-10)
    # exact pinned annual CF with the real CSi Huld parameters
    annual_cf = float(np.asarray(cf.values).mean())
    np.testing.assert_allclose(annual_cf, 0.163772480245, rtol=1e-6)
    # summer noon beats winter noon on average
    vals = np.asarray(cf.values)
    summer = vals[24 * 172 + 12]  # Jun 21, 12:00
    winter = vals[24 * 355 + 12]  # Dec 22, 12:00
    assert summer.mean() > winter.mean()


def test_year_heat_demand_days(year_cutout):
    hd = year_cutout.heat_demand(aggregate_time=None)
    assert hd.sizes["time"] == 365
    vals = np.asarray(hd.values)
    # winter demand exceeds summer demand
    assert vals[:30].mean() > vals[170:200].mean()
    # pinned annual total (deterministic synthetic weather)
    np.testing.assert_allclose(vals.sum(), 3.3901346450e6, rtol=1e-6)


def test_year_runoff_normalization(year_cutout):
    import pandas as pd

    layout = year_cutout.uniform_layout()
    target = pd.DataFrame({0: [5000.0]}, index=[2013])
    r = year_cutout.runoff(layout=layout, normalize_using_yearly=target,
                           aggregate_time=None)
    np.testing.assert_allclose(np.asarray(r.values).sum(), 5000.0, rtol=1e-9)


def test_year_aggregated_monthly_stats(year_cutout):
    cf = year_cutout.wind("Vestas_V112_3MW", layout=year_cutout.uniform_layout(),
                          per_unit=True, aggregate_time=None)
    s = cf.to_pandas().iloc[0]
    monthly = s.groupby(s.index.month).mean()
    assert len(monthly) == 12
    assert monthly.max() < 1.0 and monthly.min() > 0.0
