"""Aggregation gateway semantics (model: reference test/test_aggregate_time.py
and the matrix/layout/shapes composition of convert.py:200-276)."""

import numpy as np
import pandas as pd
import pytest
import scipy.sparse as sp

from atlite_tpu import Cutout
from atlite_tpu.aggregate import aggregate_matrix, spdiag, spmm
from atlite_tpu.convert import convert_temperature
from atlite_tpu.dataarray import DataArray


@pytest.fixture(scope="module")
def mock(cutout):
    """Identity-converter view: raw temperature field as (time,y,x)."""
    da = convert_temperature(cutout).load()
    return cutout, da


def _agg(cutout, **kw):
    return cutout.convert_and_aggregate(convert_func=convert_temperature, **kw)


def test_spmm_dense_vs_segment():
    rng = np.random.default_rng(0)
    m = sp.random(7, 40, density=0.3, random_state=0, format="csr")
    x = rng.normal(size=(13, 40))
    dense = x @ m.toarray().T
    out = np.asarray(spmm(m, x))
    np.testing.assert_allclose(out, dense, rtol=1e-10)
    # force the segment path
    import atlite_tpu.aggregate as agg
    old = agg._DENSE_LIMIT
    try:
        agg._DENSE_LIMIT = 0
        out2 = np.asarray(spmm(m, x))
    finally:
        agg._DENSE_LIMIT = old
    np.testing.assert_allclose(out2, dense, rtol=1e-10)


def test_aggregate_matrix_identity(mock):
    cutout, da = mock
    C = cutout.shape[0] * cutout.shape[1]
    eye = sp.identity(C, format="csr")
    out = aggregate_matrix(da, eye, index=pd.RangeIndex(C))
    flat = np.asarray(da.values).reshape(da.sizes["time"], -1)
    np.testing.assert_allclose(np.asarray(out.values), flat.T, rtol=1e-12)


def test_no_args_legacy_sums_time(mock):
    cutout, da = mock
    with pytest.warns(FutureWarning):
        res = _agg(cutout)
    np.testing.assert_allclose(
        np.asarray(res.values), np.asarray(da.values).sum(axis=0), rtol=1e-12
    )
    assert res.dims == ("y", "x")


def test_no_args_aggregate_none_returns_series(mock):
    cutout, da = mock
    res = _agg(cutout, aggregate_time=None)
    assert res.dims == ("time", "y", "x")
    np.testing.assert_allclose(np.asarray(res.values), np.asarray(da.values))


def test_no_args_mean(mock):
    cutout, da = mock
    res = _agg(cutout, aggregate_time="mean")
    np.testing.assert_allclose(
        np.asarray(res.values), np.asarray(da.values).mean(axis=0), rtol=1e-12
    )


def test_deprecated_capacity_factor(mock):
    cutout, da = mock
    with pytest.warns(FutureWarning):
        res = _agg(cutout, capacity_factor=True)
    np.testing.assert_allclose(
        np.asarray(res.values), np.asarray(da.values).mean(axis=0), rtol=1e-12
    )
    with pytest.raises(ValueError):
        _agg(cutout, capacity_factor=True, aggregate_time="mean")


def test_per_unit_requires_aggregation(mock):
    cutout, _ = mock
    with pytest.raises(ValueError):
        _agg(cutout, per_unit=True, aggregate_time=None)


def test_matrix_aggregation(mock):
    cutout, da = mock
    C = cutout.shape[0] * cutout.shape[1]
    rng = np.random.default_rng(1)
    m = sp.random(5, C, density=0.1, random_state=2, format="csr")
    res = _agg(cutout, matrix=m, aggregate_time=None)
    flat = np.asarray(da.values).reshape(da.sizes["time"], -1)
    np.testing.assert_allclose(np.asarray(res.values), (m @ flat.T), rtol=1e-10)
    assert res.dims[1] == "time"


def test_matrix_and_shapes_ambiguous(mock):
    cutout, _ = mock
    from atlite_tpu.gis.geometry import box

    with pytest.raises(ValueError):
        _agg(cutout, matrix=np.ones((1, 10)),
             shapes=[box(-4, 56, 0, 60)], aggregate_time=None)


def test_matrix_wrong_dim(mock):
    cutout, _ = mock
    with pytest.raises(ValueError):
        _agg(cutout, matrix=np.ones((3, 3, 3)), aggregate_time=None)


def test_layout_aggregation(mock):
    cutout, da = mock
    layout = cutout.uniform_layout()
    res = _agg(cutout, layout=layout, aggregate_time=None)
    flat = np.asarray(da.values).reshape(da.sizes["time"], -1)
    np.testing.assert_allclose(
        np.asarray(res.values)[0], flat.sum(axis=1), rtol=1e-10
    )


def test_layout_squared_on_matrix(mock):
    """matrix * spdiag(layout) composition (convert.py:242-249)."""
    cutout, da = mock
    C = cutout.shape[0] * cutout.shape[1]
    layout = np.full(cutout.shape, 2.0)
    m = sp.csr_matrix(np.ones((1, C)))
    res = _agg(cutout, matrix=m, layout=DataArray(
        layout, coords={"y": cutout.grid_desc.y, "x": cutout.grid_desc.x},
        dims=("y", "x")), aggregate_time=None)
    base = _agg(cutout, matrix=m, aggregate_time=None)
    np.testing.assert_allclose(
        np.asarray(res.values), 2.0 * np.asarray(base.values), rtol=1e-10
    )


def test_per_unit_and_capacity(mock):
    cutout, da = mock
    layout = cutout.uniform_layout()
    res, cap = _agg(cutout, layout=layout, per_unit=True, return_capacity=True,
                    aggregate_time=None)
    C = cutout.shape[0] * cutout.shape[1]
    assert cap.values[0] == C
    flat = np.asarray(da.values).reshape(da.sizes["time"], -1)
    np.testing.assert_allclose(
        np.asarray(res.values)[0], flat.mean(axis=1), rtol=1e-10
    )
    assert res.attrs["units"] == "p.u."


def test_shapes_aggregation(mock):
    cutout, da = mock
    from atlite_tpu.gis.geometry import box

    shapes = pd.Series(
        [box(-4.125, 55.875, -2.0, 58.0), box(-2.0, 58.0, 1.625, 62.125)],
        index=["A", "B"],
    )
    res = _agg(cutout, shapes=shapes, aggregate_time=None)
    assert list(res.coords[res.dims[0]]) == ["A", "B"]
    # box-aligned shapes: equivalent to mean-free sums of covered cells
    m = sp.csr_matrix(cutout.indicatormatrix(shapes))
    flat = np.asarray(da.values).reshape(da.sizes["time"], -1)
    np.testing.assert_allclose(np.asarray(res.values), m @ flat.T, rtol=1e-10)


def test_spdiag():
    d = spdiag(np.array([1.0, 2.0, 3.0]))
    np.testing.assert_array_equal(d.toarray(), np.diag([1, 2, 3]))


def test_nan_cell_poisons_only_touching_buses():
    """Reference sparse semantics (r4 review): scipy's csr matmul skips
    structural zeros, so a NaN cell must NaN only buses whose region
    contains it — dense/banded formulations would spread it everywhere.
    Pinned against the scipy oracle for both regimes."""
    import scipy.sparse as sp

    from atlite_tpu.aggregate import spmm, spmm_closure

    rng = np.random.default_rng(0)
    T, C, B = 8, 60, 5
    m = sp.random(B, C, density=0.15, random_state=1, format="csr")
    x = rng.random((T, C))
    x[3, int(m.indices[0])] = np.nan  # a cell some bus definitely touches
    x[5, 40] = np.nan
    oracle = np.asarray((m @ x.T).T)
    assert np.isnan(oracle).any()
    got = np.asarray(spmm(m, x))
    np.testing.assert_allclose(got, oracle, rtol=1e-6, equal_nan=True)
    assert np.isnan(got).any() and not np.isnan(got).all()
    got2 = np.asarray(spmm_closure(m)(x))
    np.testing.assert_allclose(got2, oracle, rtol=1e-6, equal_nan=True)

    # large-matrix banded regime
    rows, cols, vals = [], [], []
    Bb, Yy, Xx = 64, 24, 32
    Cc = Yy * Xx
    for b in range(Bb):
        y0, x0 = int(rng.integers(0, Yy - 4)), int(rng.integers(0, Xx - 4))
        cc = (np.arange(y0, y0 + 4)[:, None] * Xx
              + np.arange(x0, x0 + 4)[None, :]).ravel()
        rows += [b] * len(cc)
        cols += list(cc)
        vals += list(rng.random(len(cc)))
    mb = sp.csr_matrix((vals, (rows, cols)), shape=(Bb, Cc))
    xb = rng.random((T, Cc))
    xb[2, 100] = np.nan
    oracle_b = np.asarray((mb @ xb.T).T)
    from atlite_tpu.ops.bsr_spmm import banded_spmm, to_banded

    got_b = np.asarray(banded_spmm(to_banded(mb), xb))
    np.testing.assert_allclose(got_b, oracle_b, rtol=1e-6, equal_nan=True)
    assert np.array_equal(np.isnan(got_b), np.isnan(oracle_b))
