"""DataArray-lite unit tests."""

import numpy as np
import pandas as pd
import pytest

from atlite_tpu.dataarray import DataArray


@pytest.fixture
def da():
    return DataArray(
        np.arange(24.0).reshape(2, 3, 4),
        coords={"time": pd.date_range("2013-01-01", periods=2, freq="h"),
                "y": [50.0, 50.5, 51.0], "x": [1.0, 1.5, 2.0, 2.5]},
        dims=("time", "y", "x"), name="t",
    )


def test_basic_props(da):
    assert da.shape == (2, 3, 4)
    assert da.sizes == {"time": 2, "y": 3, "x": 4}
    assert da.get_axis_num("x") == 2


def test_isel_sel(da):
    sub = da.isel(time=0)
    assert sub.dims == ("y", "x")
    s2 = da.sel(x=slice(1.5, 2.0))
    assert s2.shape == (2, 3, 2)
    s3 = da.sel(x=1.6, method="nearest")
    assert s3.shape == (2, 3)
    np.testing.assert_array_equal(s3.values, da.values[:, :, 1])
    s4 = da.sel(y=50.5)
    assert s4.shape == (2, 4)


def test_reductions(da):
    m = da.mean("time")
    assert m.dims == ("y", "x")
    np.testing.assert_allclose(m.values, da.values.mean(axis=0))
    assert np.isclose(da.sum(), da.values.sum())


def test_arith_broadcasting(da):
    other = DataArray(np.array([1.0, 2.0, 3.0]), coords={"y": da.coords["y"]},
                      dims=("y",))
    out = da * other
    assert out.dims == ("time", "y", "x")
    np.testing.assert_allclose(out.values,
                               da.values * np.array([1, 2, 3])[None, :, None])
    out2 = 2.0 - da
    np.testing.assert_allclose(out2.values, 2.0 - da.values)
    out3 = (da + 1.0) / (da + 1.0)
    np.testing.assert_allclose(out3.values, 1.0)


def test_where_clip_fillna(da):
    out = da.where(da > 5)
    assert np.isnan(out.values).sum() == 6
    filled = out.fillna(-1.0)
    assert (filled.values == -1).sum() == 6
    clipped = da.clip(min=3, max=10)
    assert clipped.values.min() == 3 and clipped.values.max() == 10


def test_rolling_mean():
    da = DataArray(np.arange(6.0), coords={"time": range(6)}, dims=("time",))
    rm = da.rolling_mean("time", 3, min_periods=1)
    np.testing.assert_allclose(rm.values, [0, 0.5, 1, 2, 3, 4])


def test_transpose_to_pandas(da):
    t = da.isel(x=0).transpose("y", "time")
    assert t.dims == ("y", "time")
    df = t.to_pandas()
    assert df.shape == (3, 2)
    with pytest.raises(ValueError):
        da.to_pandas()


def test_coord_length_validation():
    with pytest.raises(ValueError):
        DataArray(np.zeros((2, 2)), coords={"a": [1], "b": [1, 2]},
                  dims=("a", "b"))


def test_plot_smoke(da, tmp_path):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    da.isel(time=0).plot()
    plt.savefig(tmp_path / "f.png")
    plt.close("all")
    da.isel(time=0, y=0).plot()
    plt.close("all")

def test_sel_multiple_dims_outer_selection():
    """Array/slice indexers on several dims select OUTER (xarray
    semantics), not jointly-broadcast numpy advanced indexing."""
    da = DataArray(
        np.arange(24.0).reshape(2, 3, 4),
        coords={"time": pd.RangeIndex(2), "y": pd.Index([50.0, 51, 52]),
                "x": pd.Index([1.0, 2, 3, 4])},
        dims=("time", "y", "x"),
    )
    r = da.sel(y=slice(50, 52), x=slice(1, 2))
    assert r.values.shape == (2, 3, 2)
    np.testing.assert_allclose(r.values, da.values[:, :, :2])
    # equal-length selections must NOT take the diagonal
    r2 = da.sel(y=slice(50, 51), x=slice(1, 2))
    np.testing.assert_allclose(r2.values, da.values[:, :2, :2])
    # int + array indexers keep the remaining dims in place
    r3 = da.isel(time=0, x=[1, 2])
    assert r3.values.shape == (3, 2) and tuple(r3.dims) == ("y", "x")
    np.testing.assert_allclose(r3.values, da.values[0][:, [1, 2]])


def test_binop_refuses_misaligned_coords():
    a = DataArray(np.array([1.0, 2, 3]), coords={"x": pd.Index([1, 2, 3])},
                  dims=("x",))
    b = DataArray(np.array([10.0, 20, 30]), coords={"x": pd.Index([3, 2, 1])},
                  dims=("x",))
    with pytest.raises(ValueError, match="align"):
        a + b
    c = DataArray(np.array([10.0, 20, 30]), coords={"x": pd.Index([1, 2, 3])},
                  dims=("x",))
    np.testing.assert_allclose((a + c).values, [11, 22, 33])


def test_sel_string_datetime_labels():
    """r4 review: string/partial-string time labels are the standard
    xarray idiom — slices and scalars must both work."""
    import pandas as pd

    from atlite_tpu.dataarray import DataArray

    times = pd.date_range("2013-01-01", periods=72, freq="h").values
    da = DataArray(np.arange(72.0), coords={"time": times}, dims=("time",))
    s = da.sel(time=slice("2013-01-01", "2013-01-02"))
    assert len(s.values) == 48  # inclusive label slicing, both full days
    s2 = da.sel(time="2013-01-02")
    assert len(np.atleast_1d(s2.values)) == 24
    s3 = da.sel(time=slice("2013-01-02 03:00", None))
    assert len(s3.values) == 72 - 27
    # exact-timestamp scalar still collapses the dim
    s4 = da.sel(time=np.datetime64("2013-01-01T05:00"))
    assert np.ndim(s4.values) == 0 and float(s4.values) == 5.0


def test_sel_datetime_slice_step():
    """r5 advisor: a user-supplied slice.step on a DatetimeIndex slice was
    silently ignored (every element returned)."""
    import pandas as pd

    from atlite_tpu.dataarray import DataArray

    times = pd.date_range("2013-01-01", periods=48, freq="h").values
    da = DataArray(np.arange(48.0), coords={"time": times}, dims=("time",))
    s = da.sel(time=slice("2013-01-01", "2013-01-02", 3))
    assert len(s.values) == 16
    np.testing.assert_array_equal(s.values, np.arange(0.0, 48.0, 3))


def test_sel_numeric_slice_step():
    """r5 review: slice.step applies to numeric-coordinate slices too,
    not only DatetimeIndex ones."""
    from atlite_tpu.dataarray import DataArray

    da = DataArray(np.arange(20.0), coords={"x": np.arange(20) * 0.5},
                   dims=("x",))
    s = da.sel(x=slice(1.0, 8.0, 3))
    np.testing.assert_array_equal(s.values, np.arange(2, 17, 3))


def test_sel_negative_slice_step_loc_semantics():
    """r5 review: slice(8, None, -1) must mean 'from label 8 DOWNWARD'
    (pandas .loc semantics), not 'labels >= 8 reversed'."""
    import pandas as pd

    from atlite_tpu.dataarray import DataArray

    da = DataArray(np.arange(20.0), coords={"x": np.arange(20.0)},
                   dims=("x",))
    s = pd.Series(np.arange(20.0), index=np.arange(20.0))
    for sl in (slice(8.0, None, -1), slice(None, 8.0, -1),
               slice(12.0, 3.0, -2), slice(3.0, 15.0, 4),
               slice(3.0, 12.0, -2)):  # misordered descending -> empty
        np.testing.assert_array_equal(
            da.sel(x=sl).values, s.loc[sl].values, err_msg=str(sl))

    times = pd.date_range("2013-01-01", periods=48, freq="h")
    dat = DataArray(np.arange(48.0), coords={"time": times.values},
                    dims=("time",))
    st = pd.Series(np.arange(48.0), index=times)
    for sl in (slice("2013-01-02", None, -1), slice(None, None, -6),
               slice("2013-01-02 10:00", "2013-01-01 05:00", -3)):
        np.testing.assert_array_equal(
            dat.sel(time=sl).values, st.loc[sl].values, err_msg=str(sl))


def test_where_name_broadcasts_and_eq_elementwise():
    """r5 core review: where()/fillna align by DIM NAME (positional
    combination masked the wrong axis when sizes coincide); ==/!= are
    elementwise like xarray, and DataArrays are unhashable."""
    from atlite_tpu.dataarray import DataArray

    da = DataArray(np.arange(4.0).reshape(2, 2),
                   coords={"time": np.array([0, 1]),
                           "spatial": np.array([10, 20])},
                   dims=("time", "spatial"))
    cond = DataArray(np.array([True, False]),
                     coords={"time": np.array([0, 1])}, dims=("time",))
    out = da.where(cond, 0.0)
    np.testing.assert_array_equal(out.values, [[0.0, 1.0], [0.0, 0.0]])
    # mismatched coords refuse
    bad = DataArray(np.array([True, False]),
                    coords={"time": np.array([5, 6])}, dims=("time",))
    with pytest.raises(ValueError, match="coordinate"):
        da.where(bad, 0.0)
    # elementwise ==
    eq = da == 1.0
    assert isinstance(eq, DataArray)
    np.testing.assert_array_equal(eq.values, [[False, True], [False, False]])
    with pytest.raises(TypeError):
        hash(da)
    # integer fillna is a no-op, not a TypeError
    di = DataArray(np.arange(3), coords={"x": np.arange(3)}, dims=("x",))
    np.testing.assert_array_equal(di.fillna(0).values, np.arange(3))


def test_sel_descending_index_slices():
    """Label slices on a DESCENDING coordinate follow pandas .loc."""
    import pandas as pd

    from atlite_tpu.dataarray import DataArray

    vals = np.arange(10.0)
    coord = np.arange(10.0)[::-1]  # 9..0 descending
    da = DataArray(vals, coords={"x": coord}, dims=("x",))
    s = pd.Series(vals, index=coord)
    for sl in (slice(8.0, 3.0), slice(None, 4.0), slice(7.0, None),
               slice(3.0, 8.0)):  # last: misordered -> empty
        np.testing.assert_array_equal(
            da.sel(x=sl).values, s.loc[sl].values, err_msg=str(sl))


def test_sel_misordered_positive_slice_empty():
    """pandas .loc: slice(8, 3) on an ascending index selects nothing."""
    from atlite_tpu.dataarray import DataArray

    da = DataArray(np.arange(10.0), coords={"x": np.arange(10.0)},
                   dims=("x",))
    assert len(da.sel(x=slice(8.0, 3.0)).values) == 0
