"""Capacity bookkeeping parity (model: reference
test_preparation_and_conversion.py:60-115)."""

import numpy as np
import pytest
import pandas as pd

from atlite_tpu.gis.geometry import box


def test_layout_from_capacity_list(cutout):
    g = cutout.grid_desc
    caps = pd.DataFrame({
        "x": [g.x[0], g.x[3] + 0.01, g.x[5] - 0.01],
        "y": [g.y[0], g.y[2], g.y[4] + 0.1],
        "Capacity": [1.0, 2.0, 3.0],
    })
    layout = cutout.layout_from_capacity_list(caps)
    assert layout.values.sum() == 6.0
    assert layout.values[0, 0] == 1.0  # snapped to first cell
    assert layout.values[2, 3] == 2.0
    assert layout.values[4, 5] == 3.0  # +0.1 deg < half cell -> same row


def test_capacity_per_region_bookkeeping(cutout):
    """capacity returned per region == sum of the layout within the region
    (reference :98-114)."""
    cf = cutout.pv(panel="CSi", orientation="latitude_optimal",
                   aggregate_time="mean")
    layout = cf  # use the CF field as a layout (same trick as reference)
    # split on a cell EDGE so every cell belongs fully to one region
    g0 = cutout.grid_desc
    mid_y = g0.y[12] - g0.dy / 2
    shapes = pd.Series({
        "lower": box(*cutout.bounds[[0, 1]], cutout.bounds[2], mid_y),
        "upper": box(cutout.bounds[0], mid_y, *cutout.bounds[[2, 3]]),
    })
    production, capacity = cutout.pv(
        panel="CSi", orientation="latitude_optimal", layout=layout,
        shapes=shapes, return_capacity=True, aggregate_time=None,
    )
    lv = np.asarray(layout.values)
    g = cutout.grid_desc
    lower_mask = (g.y[:, None] < mid_y)
    cap_lower = lv[np.broadcast_to(lower_mask, lv.shape)].sum()
    cap_upper = lv.sum() - cap_lower
    np.testing.assert_allclose(capacity.values, [cap_lower, cap_upper],
                               rtol=1e-6)
    assert np.all(np.asarray(production.values) >= 0)


def test_production_zero_at_midnight(cutout):
    production = cutout.pv(panel="CdTe", orientation="latitude_optimal",
                           layout=cutout.uniform_layout(), aggregate_time=None)
    assert float(np.asarray(production.values)[0, 0]) == 0.0  # 00:00 UTC January


def test_merge_refuses_different_coordinates():
    """Same-SHAPE cutouts over different regions must not merge into
    mis-georeferenced data."""
    from atlite_tpu import Cutout

    a = Cutout(path=None, module="synthetic", x=slice(5, 15), y=slice(47, 55),
               time="2013-01-01")
    b = Cutout(path=None, module="synthetic", x=slice(-15, -5), y=slice(47, 55),
               time="2013-01-01")
    assert a.grid_desc.shape == b.grid_desc.shape
    with pytest.raises(ValueError, match="different coordinates"):
        a.merge(b)


def test_isel_time_tolerates_scalar_variable(cutout):
    """A dimension-less variable (dims=()) must not crash the chunked
    streamer's time-slice view."""
    from atlite_tpu import Cutout

    c = Cutout(path=None, data={**cutout.data, "crs_scalar": np.float64(0)},
               grid_desc=cutout.grid_desc, attrs=dict(cutout.attrs),
               var_attrs={**cutout.var_attrs, "crs_scalar": {"dims": ()}})
    sub = c.isel_time(0, 4)
    assert sub.data["crs_scalar"] == 0.0
    assert sub.data["wnd100m"].shape[0] == 4
