"""Minimal labeled N-d array used at the public API boundary.

The reference returns ``xarray.DataArray`` everywhere (e.g.
/root/reference/atlite/convert.py:127-150).  xarray is not part of this
framework's dependency set — device compute uses raw JAX arrays — but users
still need dimension names, coordinates and pandas export on results.  This
module provides a deliberately small, dependency-light labeled array:
numpy/JAX values + ``dims`` + ``coords`` + ``attrs``.

It is NOT a general xarray replacement; it supports exactly the surface the
framework's results need: selection, reduction over named dims, arithmetic
with dim-name broadcasting, rolling means over time, and pandas conversion.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def _asindex(v):
    return v if isinstance(v, pd.Index) else pd.Index(np.asarray(v))


class DataArray:
    """Labeled array: ``values`` + ``dims`` + per-dim ``coords`` + ``attrs``."""

    __slots__ = ("values", "dims", "coords", "attrs", "name")

    def __init__(self, values, coords=None, dims=None, attrs=None, name=None):
        values = np.asarray(values) if not hasattr(values, "ndim") else values
        if dims is None:
            if coords is not None and isinstance(coords, (list, tuple)):
                dims = tuple(k for k, _ in coords)
            elif coords is not None and isinstance(coords, dict):
                dims = tuple(coords)
            else:
                dims = tuple(f"dim_{i}" for i in range(values.ndim))
        if isinstance(coords, (list, tuple)):
            coords = dict(coords)
        self.values = values
        self.dims = tuple(dims)
        self.coords = {k: _asindex(v) for k, v in (coords or {}).items()}
        self.attrs = dict(attrs or {})
        self.name = name
        if len(self.dims) != values.ndim:
            raise ValueError(f"dims {self.dims} do not match shape {values.shape}")
        for d in self.dims:
            if d in self.coords and len(self.coords[d]) != self.sizes[d]:
                raise ValueError(f"coord {d} length mismatch")

    # -- basic introspection -------------------------------------------------
    @property
    def shape(self):
        return tuple(self.values.shape)

    @property
    def ndim(self):
        return self.values.ndim

    @property
    def dtype(self):
        return self.values.dtype

    @property
    def sizes(self):
        return dict(zip(self.dims, self.values.shape))

    def get_axis_num(self, dim):
        return self.dims.index(dim)

    def __len__(self):
        return self.values.shape[0]

    def __repr__(self):
        cs = ", ".join(f"{d}: {s}" for d, s in self.sizes.items())
        return f"<atlite_tpu.DataArray {self.name or ''}({cs})>\n{self.values!r}"

    def copy(self, values=None):
        return DataArray(
            self.values.copy() if values is None else values,
            coords=self.coords,
            dims=self.dims,
            attrs=self.attrs,
            name=self.name,
        )

    def load(self):
        """Materialise device values as numpy (analog of dask/xarray .load())."""
        self.values = np.asarray(self.values)
        return self

    def rename(self, name):
        da = self.copy(self.values)
        da.name = name
        return da

    def assign_attrs(self, **attrs):
        self.attrs.update(attrs)
        return self

    # -- selection -----------------------------------------------------------
    def isel(self, **indexers):
        # apply indexers ONE AXIS AT A TIME (xarray outer-selection
        # semantics) — a joint numpy advanced-indexing expression would
        # broadcast multiple array indexers together (diagonal/shape
        # errors) and move fancy-indexed axes to the front
        values = np.asarray(self.values)
        dims = list(self.dims)
        coords = dict(self.coords)
        items = sorted(indexers.items(),
                       key=lambda kv: self.get_axis_num(kv[0]), reverse=True)
        for d, i in items:
            ax = dims.index(d)
            if isinstance(i, slice):
                values = values[(slice(None),) * ax + (i,)]
                if d in coords:
                    coords[d] = coords[d][i]
            elif isinstance(i, (int, np.integer)):
                values = np.take(values, int(i), axis=ax)
                dims.pop(ax)
                coords.pop(d, None)
            else:
                i = np.asarray(i)
                if i.dtype == bool:
                    i = np.flatnonzero(i)
                values = np.take(values, i, axis=ax)
                if d in coords:
                    coords[d] = coords[d][i]
        return DataArray(values, coords=coords, dims=dims, attrs=self.attrs, name=self.name)

    def sel(self, method=None, **indexers):
        isels = {}
        for d, v in indexers.items():
            idx = self.coords[d]
            if isinstance(v, slice):
                if isinstance(idx, pd.DatetimeIndex):
                    # pandas label slicing: handles string endpoints incl.
                    # partial labels ("2013-01" = the whole month), the
                    # xarray idiom every converter result supports; the
                    # step (incl. negative) goes through slice_indexer so
                    # .loc semantics apply exactly
                    sl = idx.slice_indexer(v.start, v.stop, v.step)
                    isels[d] = np.arange(len(idx))[sl]
                    continue
                # pandas .loc label-slice semantics: start is the first
                # label in TRAVERSAL order (index order, reversed for a
                # negative step), bounds inclusive, and a misordered pair
                # selects nothing
                vals = idx.values
                neg = v.step is not None and v.step < 0
                idx_desc = len(vals) > 1 and vals[0] > vals[-1]
                if idx_desc != neg:  # traversal runs high -> low
                    upper, lower = v.start, v.stop
                else:
                    lower, upper = v.start, v.stop
                mask = np.ones(len(idx), dtype=bool)
                if lower is not None:
                    mask &= vals >= lower
                if upper is not None:
                    mask &= vals <= upper
                pos = np.where(mask)[0]
                if neg:
                    pos = pos[::-1]
                if v.step is not None and abs(v.step) != 1:
                    pos = pos[::abs(v.step)]
                isels[d] = pos
            elif np.ndim(v) == 0:
                if method == "nearest":
                    isels[d] = int(idx.get_indexer([v], method="nearest")[0])
                else:
                    loc = idx.get_loc(v)
                    if isinstance(loc, slice):
                        # partial-string datetime scalar ("2013-01-02" on
                        # an hourly index) selects the whole period
                        isels[d] = np.arange(len(idx))[loc]
                    elif np.ndim(loc) > 0:  # boolean mask from get_loc
                        isels[d] = np.flatnonzero(np.asarray(loc))
                    else:
                        isels[d] = int(loc)
            else:
                pos = idx.get_indexer(np.asarray(v), method=method)
                if method is None and (pos < 0).any():
                    missing = np.asarray(v)[pos < 0]
                    raise KeyError(
                        f"labels {missing.tolist()} not found in "
                        f"coordinate {d!r}"
                    )
                isels[d] = pos
        return self.isel(**isels)

    def transpose(self, *dims):
        axes = [self.get_axis_num(d) for d in dims]
        return DataArray(
            np.transpose(np.asarray(self.values), axes),
            coords=self.coords,
            dims=dims,
            attrs=self.attrs,
            name=self.name,
        )

    # -- reductions ----------------------------------------------------------
    def _reduce(self, fn, nanfn, dim, keep_attrs=True, skipna=None, **kw):
        # xarray semantics: skipna defaults to True for float data (the
        # reference's aggregate_time sum/mean therefore SKIP NaN — the
        # load-bearing convention; np.sum would poison whole buses)
        v = np.asarray(self.values)
        if skipna or (skipna is None and np.issubdtype(v.dtype, np.inexact)):
            fn = nanfn
        if dim is None:
            return fn(v, **kw)
        axis = self.get_axis_num(dim)
        import warnings as _warnings

        with np.errstate(invalid="ignore"), _warnings.catch_warnings():
            # all-NaN slices legitimately reduce to NaN (xarray is
            # equally silent about them)
            _warnings.filterwarnings("ignore", r"Mean of empty slice|"
                                     r"All-NaN (slice|axis) encountered",
                                     RuntimeWarning)
            values = fn(v, axis=axis, **kw)
        dims = tuple(d for d in self.dims if d != dim)
        coords = {d: c for d, c in self.coords.items() if d != dim}
        return DataArray(values, coords=coords, dims=dims,
                         attrs=self.attrs if keep_attrs else None, name=self.name)

    def sum(self, dim=None, **kw):
        return self._reduce(np.sum, np.nansum, dim, **kw)

    def mean(self, dim=None, **kw):
        return self._reduce(np.mean, np.nanmean, dim, **kw)

    def min(self, dim=None, **kw):
        return self._reduce(np.min, np.nanmin, dim, **kw)

    def max(self, dim=None, **kw):
        return self._reduce(np.max, np.nanmax, dim, **kw)

    def quantile(self, q):
        return np.quantile(np.asarray(self.values), q)

    # -- elementwise ---------------------------------------------------------
    def clip(self, min=None, max=None):
        return self.copy(np.clip(np.asarray(self.values), min, max))

    def where(self, cond, other=np.nan):
        # name-broadcast DataArray operands like _binop does — combining
        # positionally would mask the wrong axis whenever sizes coincide
        def aligned(x):
            if not isinstance(x, DataArray):
                return x
            for d in x.dims:
                if d not in self.dims:
                    raise ValueError(
                        f"where() operand has dimension {d!r} absent from "
                        f"the array {self.dims}")
                if (d in self.coords and d in x.coords
                        and not np.array_equal(np.asarray(self.coords[d]),
                                               np.asarray(x.coords[d]))):
                    raise ValueError(
                        f"coordinate {d!r} differs between where() "
                        "operands; align with sel()/isel() first")
            return _expand(np.asarray(x.values), x.dims, list(self.dims))

        cond = aligned(cond)
        other = aligned(other)
        return self.copy(np.where(cond, np.asarray(self.values), other))

    def fillna(self, value):
        v = np.asarray(self.values)
        if not np.issubdtype(v.dtype, np.floating) and \
                not np.issubdtype(v.dtype, np.complexfloating):
            return self.copy(v)  # integer/bool data holds no NaN (xarray no-op)
        return self.copy(np.where(np.isnan(v), value, v))

    def rolling_mean(self, dim, window, min_periods=1):
        """Trailing rolling mean, NaN-skipping (xarray
        ``rolling(time=w, min_periods=1).mean()`` semantics, the reference's
        smoothing at convert.py:1050-1052): NaNs inside a window are
        excluded from both the sum and the count rather than poisoning
        every later window through the cumsum."""
        window = int(window)
        if window < 1:
            raise ValueError(f"rolling_mean window must be >= 1, got {window}")
        axis = self.get_axis_num(dim)
        # time LAST: the cumsums then run along contiguous memory (cumsum
        # along a leading axis of an 8760-h field is ~3x slower)
        v = np.ascontiguousarray(
            np.moveaxis(np.asarray(self.values, dtype=float), axis, -1))
        valid = ~np.isnan(v)
        # window sum at step i is csum[i] - csum[i-window] (csum inclusive):
        # slice-shifted in-place subtraction, no Python loop over T and no
        # fancy-index copies — an 8760-h field smooths in O(4 memory passes)
        s = np.cumsum(np.where(valid, v, 0.0), axis=-1)
        c = np.cumsum(valid, axis=-1, dtype=np.int64)
        if window < s.shape[-1]:
            s[..., window:] -= s[..., :-window].copy()
            c[..., window:] -= c[..., :-window].copy()
        with np.errstate(invalid="ignore"):
            out = np.where(c >= max(min_periods, 1), s / np.maximum(c, 1), np.nan)
        return self.copy(np.moveaxis(out, -1, axis))

    # -- arithmetic with dim-name broadcasting --------------------------------
    def _binop(self, other, fn, reflexive=False):
        if isinstance(other, DataArray):
            # refuse silently mis-labeled results: shared dims must carry
            # identical coordinates (xarray would label-align; combining
            # positionally across reordered coords yields wrong numbers)
            for d in self.dims:
                if (d in other.dims and d in self.coords
                        and d in other.coords
                        and not np.array_equal(np.asarray(self.coords[d]),
                                               np.asarray(other.coords[d]))):
                    raise ValueError(
                        f"coordinate {d!r} differs between operands; "
                        f"align with sel()/isel() first")
            dims = list(self.dims) + [d for d in other.dims if d not in self.dims]
            a = _expand(np.asarray(self.values), self.dims, dims)
            b = _expand(np.asarray(other.values), other.dims, dims)
            coords = {**other.coords, **self.coords}
            values = fn(b, a) if reflexive else fn(a, b)
            return DataArray(values, coords=coords, dims=dims, attrs=self.attrs, name=self.name)
        a = np.asarray(self.values)
        values = fn(other, a) if reflexive else fn(a, other)
        return self.copy(values)

    def __add__(self, o):
        return self._binop(o, np.add)

    def __radd__(self, o):
        return self._binop(o, np.add, True)

    def __sub__(self, o):
        return self._binop(o, np.subtract)

    def __rsub__(self, o):
        return self._binop(o, np.subtract, True)

    def __mul__(self, o):
        return self._binop(o, np.multiply)

    def __rmul__(self, o):
        return self._binop(o, np.multiply, True)

    def __truediv__(self, o):
        return self._binop(o, np.divide)

    def __rtruediv__(self, o):
        return self._binop(o, np.divide, True)

    def __pow__(self, o):
        return self._binop(o, np.power)

    def __neg__(self):
        return self.copy(-np.asarray(self.values))

    def __ge__(self, o):
        return self._binop(o, np.greater_equal)

    def __le__(self, o):
        return self._binop(o, np.less_equal)

    def __gt__(self, o):
        return self._binop(o, np.greater)

    def __lt__(self, o):
        return self._binop(o, np.less)

    def __eq__(self, o):
        # elementwise like xarray/numpy (the Python identity fallback
        # silently returned a scalar bool); DataArrays are consequently
        # unhashable, also like xarray
        return self._binop(o, np.equal)

    def __ne__(self, o):
        return self._binop(o, np.not_equal)

    __hash__ = None

    # -- plotting --------------------------------------------------------------
    def plot(self, ax=None, **kwargs):
        """Quick matplotlib plot: pcolormesh for 2-D (e.g. (y, x) fields),
        line plot for 1-D series."""
        import matplotlib.pyplot as plt

        if ax is None:
            ax = plt.gca()
        v = np.asarray(self.values)
        if self.ndim == 2:
            d0, d1 = self.dims
            x = np.asarray(self.coords[d1]) if d1 in self.coords else np.arange(v.shape[1])
            y = np.asarray(self.coords[d0]) if d0 in self.coords else np.arange(v.shape[0])
            m = ax.pcolormesh(x, y, v, **kwargs)
            ax.set_xlabel(d1)
            ax.set_ylabel(d0)
            plt.colorbar(m, ax=ax, label=self.attrs.get("units"))
            return m
        if self.ndim == 1:
            d0 = self.dims[0]
            x = np.asarray(self.coords[d0]) if d0 in self.coords else np.arange(len(v))
            line, = ax.plot(x, v, **kwargs)
            ax.set_xlabel(d0)
            ax.set_ylabel(self.attrs.get("units", self.name or ""))
            return line
        raise ValueError("plot supports only 1-D/2-D arrays; use isel/sel first")

    # -- export ---------------------------------------------------------------
    def to_pandas(self):
        v = np.asarray(self.values)
        if self.ndim == 1:
            return pd.Series(v, index=self.coords.get(self.dims[0]), name=self.name)
        if self.ndim == 2:
            return pd.DataFrame(
                v, index=self.coords.get(self.dims[0]), columns=self.coords.get(self.dims[1])
            )
        raise ValueError("to_pandas supports only 1-D/2-D arrays")

    def to_numpy(self):
        return np.asarray(self.values)


def _expand(values, dims, target_dims):
    """Reshape/transpose ``values`` with ``dims`` to broadcast over target_dims."""
    # align existing dims in target order, then insert singleton axes
    order = [d for d in target_dims if d in dims]
    values = np.transpose(values, [dims.index(d) for d in order])
    shape = [values.shape[order.index(d)] if d in order else 1 for d in target_dims]
    return values.reshape(shape)
