"""Cutout creation/geometry tests (model: reference test/test_creation.py)."""

import numpy as np
import pandas as pd
import pytest

from atlite_tpu import Cutout

TIME = "2013-01-01"
BOUNDS = (-4, 56, 1.5, 62)


def test_grid_shape_and_coords(cutout):
    assert cutout.shape == (25, 23)
    assert cutout.grid_desc.x[0] == -4
    assert cutout.grid_desc.x[-1] == 1.5
    assert cutout.grid_desc.y[0] == 56
    assert cutout.grid_desc.y[-1] == 62
    assert cutout.dx == 0.25
    assert cutout.dy == 0.25
    assert len(cutout.grid_desc.time) == 24


def test_extent_bounds_transform(cutout):
    np.testing.assert_allclose(cutout.extent, [-4.125, 1.625, 55.875, 62.125])
    np.testing.assert_allclose(cutout.bounds, [-4.125, 55.875, 1.625, 62.125])
    t = cutout.transform
    assert t.a == 0.25 and t.e == 0.25
    assert t.c == -4.125 and t.f == 55.875
    tr = cutout.transform_r
    assert tr.e == -0.25 and tr.f == 62.125


def test_odd_bounds_snap_to_lattice():
    c = Cutout(path=None, module="synthetic", time=TIME,
               bounds=(-4.1, 56.2, 1.6, 61.8))
    # coordinates stay on the global dx lattice (reference gis.py:63-75)
    assert np.all(np.isclose(np.mod(c.grid_desc.x, 0.25), 0))
    assert c.grid_desc.x[0] >= -4.1 and c.grid_desc.x[-1] <= 1.6


def test_reversed_slices():
    c1 = Cutout(path=None, module="synthetic", time=TIME,
                x=slice(-4, 1.5), y=slice(56, 62))
    c2 = Cutout(path=None, module="synthetic", time=TIME,
                x=slice(1.5, -4), y=slice(62, 56))
    np.testing.assert_array_equal(c1.grid_desc.x, c2.grid_desc.x)
    np.testing.assert_array_equal(c1.grid_desc.y, c2.grid_desc.y)


def test_time_slice():
    c = Cutout(path=None, module="synthetic", bounds=BOUNDS,
               time=slice("2013-01-01", "2013-01-02"))
    assert len(c.grid_desc.time) == 48
    assert pd.Timestamp(c.grid_desc.time[0]) == pd.Timestamp("2013-01-01 00:00")


def test_dt_sampling():
    c = Cutout(path=None, module="synthetic", bounds=BOUNDS, time=TIME, dt="3h")
    assert len(c.grid_desc.time) == 8


def test_available_and_prepared_features(cutout):
    af = cutout.available_features
    assert set(af.index.unique("feature")) == {
        "height", "wind", "influx", "temperature", "runoff"
    }
    assert cutout.prepared
    assert "wnd100m" in cutout.data
    assert "influx_toa" in cutout.data


def test_grid_dataframe(cutout):
    grid = cutout.grid
    assert len(grid) == 25 * 23
    # x fastest, y slowest (reference cell ordering)
    assert grid.x.iloc[0] == -4 and grid.x.iloc[1] == -3.75
    assert grid.y.iloc[0] == 56
    cell = grid.geometry.iloc[0]
    np.testing.assert_allclose(cell.bounds, (-4.125, 55.875, -3.875, 56.125))


def test_sel(cutout):
    sub = cutout.sel(x=slice(-2, 0), y=slice(57, 59))
    assert sub.grid_desc.x[0] >= -2 and sub.grid_desc.x[-1] <= 0
    assert sub.data["wnd100m"].shape[1:] == sub.shape
    np.testing.assert_array_equal(
        sub.data["wnd100m"],
        np.asarray(cutout.data["wnd100m"])[
            :, np.isin(cutout.grid_desc.y, sub.grid_desc.y)
        ][:, :, np.isin(cutout.grid_desc.x, sub.grid_desc.x)],
    )


def test_store_roundtrip(tmp_path, cutout):
    path = tmp_path / "c1.atc"
    cutout.to_file(path)
    c2 = Cutout(path=path)
    assert c2.equals(cutout)
    assert c2.prepared
    # resume semantics: prepare() should be a no-op
    c2.prepare()
    assert c2.equals(cutout)


def test_merge(cutout):
    c_wind = Cutout(path=None, module="synthetic", bounds=BOUNDS, time=TIME,
                    dtype="float64")
    c_wind.prepare(features=["wind"])
    c_influx = Cutout(path=None, module="synthetic", bounds=BOUNDS, time=TIME,
                      dtype="float64")
    c_influx.prepare(features=["influx"])
    merged = c_wind.merge(c_influx)
    assert "wnd100m" in merged.data and "influx_toa" in merged.data


def test_missing_params_raise():
    with pytest.raises(TypeError):
        Cutout(path=None, module="synthetic")


def test_odd_resolution(cutout_coarse):
    """dx != dy and non-0.25 steps (reference conftest.py:98-107)."""
    c = cutout_coarse
    assert c.dx == 0.5 and c.dy == 0.7
    assert np.all(np.isclose(np.diff(c.grid_desc.x), 0.5))
    assert np.all(np.isclose(np.diff(c.grid_desc.y), 0.7))
    # conversion works on odd grids
    cf = c.wind("Vestas_V112_3MW", aggregate_time=None)
    assert cf.values.shape == (24,) + c.shape


def test_weird_resolution_offsets():
    c = Cutout(path=None, module="synthetic", time=TIME,
               bounds=(-4.123, 56.234, 1.433, 61.876), dx=0.23, dy=0.31)
    # lattice anchored at the global origin (reference gis.py:63-75)
    assert np.all(c.grid_desc.x >= -4.123) and np.all(c.grid_desc.x <= 1.433)
    assert len(c.grid_desc.x) > 0 and len(c.grid_desc.y) > 0


def test_prepare_cleans_auto_tmpdir(monkeypatch, tmp_path):
    """prepare() without tmpdir creates one and removes it afterwards
    (reference @maybe_remove_tmpdir) — CDS GRIB chunks must not leak."""
    import tempfile
    from pathlib import Path

    from atlite_tpu import Cutout

    made = []
    real_mkdtemp = tempfile.mkdtemp

    def spy_mkdtemp(*a, **kw):
        d = real_mkdtemp(*a, **kw)
        if kw.get("prefix") == "atlite_tpu_prepare":
            made.append(d)
        return d

    monkeypatch.setattr(tempfile, "mkdtemp", spy_mkdtemp)
    c = Cutout(path=None, module="synthetic", bounds=(-4, 56, -3, 57),
               time="2013-01-01")
    c.prepare(features=["wind"])
    assert made, "prepare() did not create its own tmpdir"
    assert not Path(made[0]).exists(), "prepare() leaked its tmpdir"


def test_end_of_rejects_non_iso_partials():
    """r4 final review: '2011Q1' must not be treated as the whole YEAR
    (pandas slices it to the quarter; over-selecting 9 months silently
    was worse than treating it as an instant)."""
    import pandas as pd

    from atlite_tpu.core.grid import _end_of

    assert _end_of("2011Q1") == pd.Timestamp("2011-01-01")  # an instant
    assert _end_of("2011-01") > pd.Timestamp("2011-01-31 23:00")


def test_open_ended_time_slice():
    """r5 core review: slice(None, end) / slice(start, None) time bounds
    select everything on the open side instead of an empty axis
    (pd.Timestamp(None) is NaT and 'times >= NaT' is all-False)."""
    from atlite_tpu.core.grid import coordinate_range

    _, _, t1 = coordinate_range(slice(-1, 0), slice(50, 51),
                                slice("2013-01-05", None), 1.0, 1.0, "h")
    import pandas as pd

    assert len(t1) > 24
    assert pd.DatetimeIndex(t1)[0] == pd.Timestamp("2013-01-05")
    _, _, t2 = coordinate_range(slice(-1, 0), slice(50, 51),
                                slice(None, "1940-01-02"), 1.0, 1.0, "h")
    assert len(t2) == 48  # 1940-01-01 .. end of 1940-01-02
