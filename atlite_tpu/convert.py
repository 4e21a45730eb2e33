"""Converters: weather fields -> energy-system time series.

Parity with /root/reference/atlite/convert.py:59-1367.  Every converter is
a fused, jit-compiled device pipeline over the cutout's HBM-resident
(time, y, x) field tensors; ``convert_and_aggregate`` is the single gateway
that composes the optional sparse spatial aggregation (matrix / shapes /
layout), per-unit normalization and temporal aggregation — exactly the
reference's contract (convert.py:59-276), with scipy.sparse bookkeeping on
the host and the contraction itself on device (atlite_tpu.aggregate).
"""

from __future__ import annotations

import logging
import warnings
from functools import partial
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd
import scipy.sparse as sp

from atlite_tpu.aggregate import aggregate_matrix, spdiag
from atlite_tpu.core import timeutil
from atlite_tpu.dataarray import DataArray
from atlite_tpu.physics import csp as csp_kernels
from atlite_tpu.physics import hydro as hydro_kernels
from atlite_tpu.physics import line_rating as lr_kernels
from atlite_tpu.physics import pv as pv_kernels
from atlite_tpu.physics import thermal, wind as wind_kernels
from atlite_tpu.physics.irradiation import tilted_irradiation
from atlite_tpu.physics.orientation import get_orientation, surface_orientation
from atlite_tpu.physics.solar import solar_position
from atlite_tpu.resource import (
    get_cspinstallationconfig,
    get_solarpanelconfig,
    get_windturbineconfig,
    windturbine_smooth,
)

logger = logging.getLogger(__name__)


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------
def maybe_progressbar(result, show_progress=False, **kwargs):
    """Materialize a result, logging wall time when requested (the
    reference wraps ``ds.load()`` in a dask ProgressBar here,
    convert.py:279-288; XLA dispatch is async, so ``load`` is the sync
    point on our side)."""
    if not show_progress:
        return result.load() if hasattr(result, "load") else result
    import time

    t0 = time.perf_counter()
    out = result.load() if hasattr(result, "load") else result
    logger.info("computed %s in %.2fs",
                getattr(result, "name", None) or "result",
                time.perf_counter() - t0)
    return out


def _freeze(d: dict) -> tuple:
    """Hashable static representation of a config dict (numbers/strings).

    numpy scalars (np.float32/np.int64 from pandas/yaml loaders) are
    unwrapped via .item(); anything else non-hashable raises — silently
    dropping an entry surfaced as a KeyError deep inside the jitted
    chain (or a silently-substituted default)."""
    out = []
    for k, v in d.items():
        if isinstance(v, np.generic):
            v = v.item()
        if not isinstance(v, (int, float, str, bool, type(None))):
            raise TypeError(
                f"config entry {k!r} has unsupported type "
                f"{type(v).__name__}; expected a number/string/bool/None")
        out.append((k, v))
    return tuple(sorted(out))


def _thaw(t: tuple) -> dict:
    return dict(t)


def _tyx(cutout, values, name=None, attrs=None):
    g = cutout.grid_desc
    return DataArray(
        values,
        coords={"time": g.time_index, "y": g.y, "x": g.x},
        dims=("time", "y", "x"),
        attrs=attrs, name=name,
    )


def _solar_position_inputs(cutout, fields, time_shift="0h"):
    """Stored solar position if present (getter fast-lane,
    solar_position.py:54-60), else ephemeris tables for on-device compute."""
    if "solar_altitude" in fields and "solar_azimuth" in fields:
        return {"altitude": fields["solar_altitude"],
                "azimuth": fields["solar_azimuth"]}, None
    eph = timeutil.solar_ephemeris(cutout.grid_desc.time, time_shift)
    return None, eph


def _aggregate_time_da(da: DataArray, method):
    if method == "sum":
        return da.sum("time", keep_attrs=True)
    if method == "mean":
        return da.mean("time", keep_attrs=True)
    return da


# ---------------------------------------------------------------------------
# gateway (reference convert.py:59-288)
# ---------------------------------------------------------------------------
def convert_and_aggregate(
    cutout,
    convert_func,
    matrix=None,
    index=None,
    layout=None,
    shapes=None,
    shapes_crs=4326,
    per_unit=False,
    return_capacity=False,
    aggregate_time="legacy",
    capacity_factor=False,
    capacity_factor_timeseries=False,
    show_progress=False,
    dask_kwargs=None,
    **convert_kwds,
):
    """Convert and spatially/temporally aggregate. See the reference
    docstring (convert.py:76-158) — the contract is identical; returns
    DataArray (bus, time) with aggregation or (time, y, x) without."""
    if aggregate_time not in ("sum", "mean", "legacy", None):
        raise ValueError(
            f"aggregate_time must be 'sum', 'mean', 'legacy', or None, "
            f"got {aggregate_time!r}"
        )
    if aggregate_time == "legacy":
        warnings.warn(
            "aggregate_time='legacy' is deprecated and will be removed in a "
            "future release. Pass 'sum', 'mean', or None explicitly.",
            FutureWarning, stacklevel=2,
        )
    if capacity_factor or capacity_factor_timeseries:
        if aggregate_time != "legacy":
            raise ValueError(
                "Cannot use 'aggregate_time' together with deprecated "
                "'capacity_factor' or 'capacity_factor_timeseries'."
            )
        if capacity_factor:
            warnings.warn(
                "capacity_factor is deprecated. Use aggregate_time='mean' instead.",
                FutureWarning, stacklevel=2,
            )
            aggregate_time = "mean"
        if capacity_factor_timeseries:
            warnings.warn(
                "capacity_factor_timeseries is deprecated. "
                "Use aggregate_time=None instead.",
                FutureWarning, stacklevel=2,
            )
            aggregate_time = None

    func_name = convert_func.__name__.replace("convert_", "")
    logger.info(f"Convert and aggregate '{func_name}'.")
    time_chunk = convert_kwds.pop("time_chunk", None)
    stream_pack = convert_kwds.pop("stream_pack", None)
    if stream_pack not in (None, "int16"):
        raise ValueError(
            f"stream_pack must be 'int16' or None, got {stream_pack!r}")
    if getattr(cutout, "_mesh", None) is not None:
        # streamed chunk staging is single-device; on a shard()-ed cutout
        # it would silently drop the mesh decomposition
        if time_chunk:
            raise ValueError(
                "streamed conversion (time_chunk) is single-device and "
                "cannot honor a shard()-ed cutout's mesh; unshard() first, "
                "or use core.comm.from_store for multi-host streaming")
        time_chunk = None  # ignore a stored chunksize: run sharded resident
    elif time_chunk is None:
        # stored chunking (Cutout(..., chunksize_time=N), the analog of
        # the reference's persisted dask chunks) is the streaming default
        time_chunk = (cutout.chunks or {}).get("time")
        if time_chunk and time_chunk >= len(cutout.grid_desc.time):
            time_chunk = None  # single chunk: run unstreamed
    if stream_pack is not None and not time_chunk:
        # validate AFTER time_chunk fully resolves (mesh branch, stored
        # chunksize >= T, no chunking at all): packing only affects the
        # streamed chunk staging, and silently doing nothing would let
        # the user believe the wire is packed
        raise ValueError(
            "stream_pack requires streamed conversion: pass a time_chunk= "
            "smaller than the time axis (sharded cutouts must unshard() "
            "first)")

    no_args = all(v is None for v in [layout, shapes, matrix])
    if no_args:
        if per_unit or return_capacity:
            raise ValueError(
                "One of `matrix`, `shapes` and `layout` must be "
                "given for `per_unit` or `return_capacity`"
            )
        if time_chunk:
            da = _chunked_convert(cutout, convert_func, time_chunk,
                                  stream_pack=stream_pack, **convert_kwds)
        else:
            da = convert_func(cutout, **convert_kwds)
        agg = "sum" if aggregate_time == "legacy" else aggregate_time
        return maybe_progressbar(_aggregate_time_da(da, agg), show_progress)

    # --- compose the aggregation matrix BEFORE converting: the streamed
    # path fuses the spmm into each chunk so only (bus, T_chunk) series
    # cross back over the wire (the full field readback otherwise costs
    # as much as the staging itself)
    if matrix is not None:
        if shapes is not None:
            raise ValueError(
                "Passing matrix and shapes is ambiguous. Pass only one of them."
            )
        if isinstance(matrix, DataArray):
            if index is None and matrix.dims[0] in matrix.coords:
                index = matrix.coords[matrix.dims[0]]
            matrix = matrix.to_numpy()
        if np.ndim(matrix) != 2:
            raise ValueError("Matrix not 2-dimensional.")
        ncells = len(cutout.grid_desc.y) * len(cutout.grid_desc.x)
        if np.shape(matrix)[1] != ncells:
            # a matrix built against a DIFFERENT cutout would otherwise
            # fail deep in the matmul (or worse, broadcast) — the
            # reference validates spatial alignment here
            # (convert.py:225-231); column ORDER cannot be checked
            # without the reference's stacked spatial MultiIndex, which
            # this API does not carry
            raise ValueError(
                f"Matrix spatial dimension ({np.shape(matrix)[1]} columns) "
                f"not aligned with the cutout grid ({ncells} cells)")
        matrix = sp.csr_matrix(matrix)

    if shapes is not None:
        if isinstance(shapes, pd.Series) and index is None:
            index = shapes.index
        matrix = sp.csr_matrix(cutout.indicatormatrix(shapes, shapes_crs))

    if layout is not None:
        lv = _align_layout(layout, cutout)
        if matrix is None:
            matrix = sp.csr_matrix(lv[None, :])
        else:
            matrix = sp.csr_matrix(matrix) @ spdiag(lv)

    assert isinstance(matrix, sp.csr_matrix)
    if index is None:
        index = pd.RangeIndex(matrix.shape[0])
    if not isinstance(index, pd.Index):
        index = pd.Index(index)
    if isinstance(index, pd.MultiIndex):
        # checked AFTER coercion: a list of tuples silently becomes a
        # MultiIndex in pd.Index()
        raise ValueError("index must have a single dimension")

    if time_chunk:
        results = _chunked_convert(cutout, convert_func, time_chunk,
                                   aggregate=(matrix, index),
                                   stream_pack=stream_pack, **convert_kwds)
    else:
        da = convert_func(cutout, **convert_kwds)
        results = aggregate_matrix(da, matrix=matrix, index=index)

    capacity = None
    if per_unit or return_capacity:
        caps = np.asarray(matrix.sum(axis=-1)).ravel()
        capacity = DataArray(caps, coords={results.dims[0]: index},
                             dims=(results.dims[0],), attrs={"units": "MW"})
    if per_unit:
        caps = capacity.values
        scale = np.where(caps != 0, 1.0 / np.where(caps != 0, caps, 1.0), 0.0)
        # reference: (results / capacity.where(capacity != 0)).fillna(0)
        # (convert.py:264-266) — NaN hours and zero-capacity buses both
        # come back as 0.0 in per-unit terms
        scaled = results.values * scale[:, None]
        # only NaN -> 0 (reference fillna(0)); nan_to_num would also
        # silently turn inf into 1.8e308
        results = results.copy(np.where(np.isnan(scaled), 0.0, scaled))
        results.attrs["units"] = "p.u."
    else:
        results.attrs["units"] = "MW"

    if aggregate_time != "legacy":
        results = _aggregate_time_da(results, aggregate_time)

    results = maybe_progressbar(results, show_progress)
    if return_capacity:
        return results, capacity
    return results


def _align_layout(layout, cutout):
    """Flatten a capacity layout onto the cutout's (y, x) cell order.

    A DataArray layout is aligned by its coordinates — transposed to
    (y, x), reindexed onto the cutout grid (missing cells -> 0), matching
    the reference's ``layout.reindex_like(cutout.data).stack(...)``
    (convert.py:242-249); raveling an arbitrarily-ordered array silently
    scrambles per-cell capacities otherwise.  Plain arrays must already be
    (y, x)-shaped in ascending order.
    """
    g = cutout.grid_desc
    if isinstance(layout, DataArray) and {"y", "x"} <= set(layout.coords):
        layout = layout.transpose(
            *[d for d in layout.dims if d not in ("y", "x")], "y", "x")
        if layout.ndim != 2:
            raise ValueError("layout must be 2-dimensional (y, x)")
        iy = pd.Index(layout.coords["y"]).get_indexer(g.y)
        ix = pd.Index(layout.coords["x"]).get_indexer(g.x)
        vals = np.zeros(cutout.shape, dtype=float)
        oky, okx = iy >= 0, ix >= 0
        sub = np.asarray(layout.values)[np.ix_(iy[oky], ix[okx])]
        vals[np.ix_(oky, okx)] = sub
        return vals.ravel()
    lv = np.asarray(layout)
    if lv.shape != cutout.shape:
        raise ValueError(
            f"layout shape {lv.shape} does not match the cutout grid "
            f"{cutout.shape}; pass a DataArray with y/x coords to align"
        )
    return lv.ravel()


def _streaming_vars(cutout, convert_func, convert_kwds):
    """Variables a converter actually reads — the streaming path then
    moves ONLY those bytes host->HBM (e.g. the wind log-law needs 2 of
    the 5 stored wind variables).  Mirrors each kernel's reads including
    its stored-variable fast lanes; returns None (= stage everything)
    for converters without an entry."""
    have = set(cutout.data)
    solar = {"solar_altitude", "solar_azimuth"} & have
    influx = ({"influx"} if "influx" in have else
              {"influx_direct", "influx_diffuse"}) | {"influx_toa"}
    albedo = {"albedo"} if "albedo" in have else {"outflux"} & have

    if convert_func is convert_wind:
        import re

        turbine = convert_kwds["turbine"]
        fast = f"wnd{int(float(turbine['hub_height']))}m"
        if fast in have:
            return {fast}
        # no fast lane: extrapolation picks the closest stored height, so
        # keep every wnd<h>m plus the method's auxiliary field
        speeds = {v for v in have if re.fullmatch(r"wnd\d+m", v)}
        method = convert_kwds.get("interpolation_method", "logarithmic")
        aux = {"roughness"} if method == "logarithmic" else {"wnd_shear_exp"}
        return speeds | aux
    # humidity feeds the ENHANCED Reindl clearsky split; omitting it from
    # the staged sub-cutout silently downgraded the model (pv) or crashed
    # (irradiation with clearsky_model='enhanced') under streaming
    humidity = {"humidity"} & have
    if convert_func in (convert_pv, convert_solar_thermal):
        return influx | albedo | solar | humidity | {"temperature"}
    if convert_func is convert_irradiation:
        return influx | albedo | solar | humidity | ({"temperature"} & have)
    if convert_func is convert_csp:
        # csp reads only the direct beam (+ solar position); influx_toa
        # was staged and never consumed — wasted wire bytes per chunk
        return {"influx_direct"} & have | solar
    if convert_func is convert_temperature:
        return {"temperature"}
    if convert_func is convert_soil_temperature:
        return {"soil temperature"}
    if convert_func is convert_dewpoint_temperature:
        return {"dewpoint temperature"}
    if convert_func is convert_coefficient_of_performance:
        src = convert_kwds.get("source", "air")
        return {"temperature" if src == "air" else "soil temperature"}
    if convert_func in (convert_heat_demand, convert_cooling_demand):
        return {"temperature"}
    if convert_func is convert_runoff:
        extra = {"height"} if convert_kwds.get("weight_with_height", True) else set()
        return {"runoff"} | extra
    return None


def _chunk_bounds(cutout, convert_func, time_chunk, convert_kwds):
    """[t0, t1, ...] chunk boundaries along the hour axis.

    Plain converters cut every ``time_chunk`` hours.  The daily-resample
    demand converters snap boundaries to (hour_shift-) day edges so no
    day group is ever split across chunks — each chunk then resamples its
    whole days independently and the concatenation equals the unchunked
    result (reference day semantics: convert.py:428-443)."""
    T = len(cutout.grid_desc.time)
    if not getattr(convert_func, "_day_aligned", False):
        return list(range(0, T, time_chunk)) + [T]
    _, ids = timeutil.daily_groups(cutout.grid_desc.time,
                                   convert_kwds.get("hour_shift", 0.0))
    ids = np.asarray(ids)
    starts = np.flatnonzero(np.r_[True, np.diff(ids) != 0])
    bounds = [0]
    for s in starts[1:]:
        if int(s) - bounds[-1] >= time_chunk:
            bounds.append(int(s))
    bounds.append(T)
    return bounds


def _chunked_convert(cutout, convert_func, time_chunk, aggregate=None,
                     stream_pack=None, **convert_kwds):
    """Stream the conversion over time chunks.

    For cutouts whose field tensors exceed HBM, each chunk's fields are
    staged to the device, converted, and the result pulled back to host
    memory (the streaming analog of the reference's dask time-chunking,
    cutout.py:143).  The pipeline is double-buffered: a background thread
    performs chunk k+1's fused host->device staging while chunk k
    computes, and chunk k-1's readback overlaps both — so the wire stays
    busy in both directions and peak device memory is two chunks' fields
    plus two results; size ``time_chunk`` accordingly.

    With ``aggregate=(csr_matrix, index)`` the spatial aggregation is
    fused into each chunk (matrix staged once via aggregate.spmm_closure)
    and only the (bus, T_chunk) series crosses back — the full-field
    readback otherwise costs as much wire time as the staging itself.
    Demand converters stream over day-aligned chunks (see _chunk_bounds);
    their concatenated daily output equals the unchunked result.
    """
    T = len(cutout.grid_desc.time)
    if T == 0 or time_chunk <= 0:
        raise ValueError(
            f"time_chunk streaming needs a positive chunk and a non-empty "
            f"time axis (T={T}, time_chunk={time_chunk})"
        )
    needed = _streaming_vars(cutout, convert_func, convert_kwds)
    if needed is not None:
        # statics (e.g. height) are staged once by the parent regardless
        needed = (needed & set(cutout.data)) | {
            n for n in cutout.data
            if tuple(cutout.var_attrs.get(n, {}).get("dims", ("time",)))[0]
            != "time"
        }

    pack16 = None
    if stream_pack is not None:
        if stream_pack != "int16":
            raise ValueError(
                f"stream_pack must be 'int16' or None, got {stream_pack!r}")
        # CF-packed staging: HALF the host->device wire bytes per chunk in
        # exchange for int16 quantization (value ≈ code·scale + offset over
        # each variable's GLOBAL range; log-space for wide-range positive
        # variables).  The streamed full-year path is wire-bound through
        # slow links (PERF.md), so this buys ~2x end-to-end there.
        pack16 = cutout.pack_params(
            list(needed) if needed is not None else list(cutout.data))

    agg_fn, index, bus_name = None, None, None
    if aggregate is not None:
        from atlite_tpu.aggregate import spmm_closure

        matrix, index = aggregate
        agg_fn = spmm_closure(matrix)
        bus_name = getattr(index, "name", None) or "bus"

    bounds = _chunk_bounds(cutout, convert_func, time_chunk, convert_kwds)
    # a shorter TAIL chunk would retrace/recompile every jitted kernel for
    # its odd shape (20-40 s per compile through the relay, minutes in bad
    # intervals): for plain elementwise converters, slide the last window
    # back to a full time_chunk and drop the overlapping prefix from its
    # output — same compiled shape, real data.  Demand converters keep
    # their day-aligned variable chunks (their daily resample must not see
    # repeated hours).
    windows = [[bounds[i], bounds[i + 1], 0] for i in range(len(bounds) - 1)]
    # only converters EXPLICITLY marked elementwise-in-time get the slide:
    # a future time-coupled converter routed through here fails safe (its
    # odd-shaped tail chunk retraces, but computes on the right window)
    if getattr(convert_func, "_time_elementwise", False) \
            and len(windows) > 1:
        t0_l, t1_l, _ = windows[-1]
        if t1_l - t0_l < time_chunk and T >= time_chunk:
            windows[-1] = [T - time_chunk, T, time_chunk - (t1_l - t0_l)]
    from concurrent.futures import ThreadPoolExecutor

    def stage(t0, t1):
        sub = cutout.isel_time(t0, t1, only=needed, pack16=pack16)
        sub.fields()  # fused device_put happens on this (background) thread
        return sub

    pieces, times = [], []
    prev = None
    ex = ThreadPoolExecutor(max_workers=1)
    try:
        fut = ex.submit(stage, windows[0][0], windows[0][1])
        for i in range(len(windows)):
            sub = fut.result()
            if i + 1 < len(windows):
                fut = ex.submit(stage, windows[i + 1][0], windows[i + 1][1])
            da = convert_func(sub, **convert_kwds)  # async XLA dispatch
            drop = windows[i][2]
            if agg_fn is not None:
                Tc = da.sizes["time"]
                out = agg_fn(da.values.reshape(Tc, -1)).T  # (B, Tc), device
                tvals = np.asarray(da.coords["time"].values)
                if drop:  # overlap dropped AFTER the fixed-shape spmm
                    out = out[:, drop:]
                    tvals = tvals[drop:]
                da = DataArray(
                    out, coords={bus_name: index, "time": tvals},
                    dims=(bus_name, "time"), attrs=da.attrs, name=da.name,
                )
            elif drop:
                da = DataArray(
                    da.values[drop:],
                    coords={**{k: v for k, v in da.coords.items()
                               if k != "time"},
                            "time": np.asarray(
                                da.coords["time"].values)[drop:]},
                    dims=da.dims, attrs=da.attrs, name=da.name,
                )
            times.append(np.asarray(da.coords["time"].values))
            if prev is not None:
                # sync the PREVIOUS chunk only now — its readback overlaps
                # the current chunk's staging + compute
                pieces.append(np.asarray(prev.values))
            prev = da
            template = da
        pieces.append(np.asarray(prev.values))
    finally:
        ex.shutdown(wait=True)
    taxis = template.dims.index("time")
    values = np.concatenate(pieces, axis=taxis)
    return DataArray(
        values,
        coords={**template.coords,
                "time": pd.DatetimeIndex(np.concatenate(times))},
        dims=template.dims, attrs=template.attrs, name=template.name,
    )


# ---------------------------------------------------------------------------
# temperature family (convert.py:291-401)
# ---------------------------------------------------------------------------
def convert_temperature(cutout):
    return _tyx(cutout, thermal.temperature_celsius(cutout.fields()))


def temperature(cutout, **params):
    return cutout.convert_and_aggregate(convert_func=convert_temperature, **params)


def convert_soil_temperature(cutout):
    return _tyx(cutout, thermal.soil_temperature_celsius(cutout.fields()))


def soil_temperature(cutout, **params):
    return cutout.convert_and_aggregate(convert_func=convert_soil_temperature, **params)


def convert_dewpoint_temperature(cutout):
    return _tyx(cutout, thermal.dewpoint_temperature_celsius(cutout.fields()))


def dewpoint_temperature(cutout, **params):
    return cutout.convert_and_aggregate(
        convert_func=convert_dewpoint_temperature, **params
    )


def convert_coefficient_of_performance(cutout, source, sink_T, c0, c1, c2):
    if source not in ("air", "soil"):
        raise NotImplementedError("'source' must be one of ['air', 'soil']")
    fields = cutout.fields()
    if source == "air":
        source_T = thermal.temperature_celsius(fields)
    else:
        source_T = thermal.soil_temperature_celsius(fields)
    d0, d1, d2 = thermal.COP_COEFFS[source]
    c0 = d0 if c0 is None else c0
    c1 = d1 if c1 is None else c1
    c2 = d2 if c2 is None else c2
    return _tyx(cutout, thermal.coefficient_of_performance(source_T, sink_T, c0, c1, c2))


def coefficient_of_performance(cutout, source="air", sink_T=55.0, c0=None, c1=None,
                               c2=None, **params):
    """Heat-pump COP from ambient/soil temperature (convert.py:365-401)."""
    return cutout.convert_and_aggregate(
        convert_func=convert_coefficient_of_performance,
        source=source, sink_T=sink_T, c0=c0, c1=c1, c2=c2, **params,
    )


# ---------------------------------------------------------------------------
# heat / cooling demand (convert.py:404-546)
# ---------------------------------------------------------------------------
def _daily_demand(cutout, threshold, a, constant, hour_shift, kind):
    fields = cutout.fields()
    days, ids = timeutil.daily_groups(cutout.grid_desc.time, hour_shift)
    daily_T = thermal.daily_mean(fields["temperature"], jnp.asarray(ids), len(days))
    demand = thermal.degree_day_demand(daily_T, threshold, a, constant, kind)
    g = cutout.grid_desc
    return DataArray(
        demand,
        coords={"time": days, "y": g.y, "x": g.x},
        dims=("time", "y", "x"),
        name=f"{kind}_demand",
    )


def convert_heat_demand(cutout, threshold, a, constant, hour_shift):
    return _daily_demand(cutout, threshold, a, constant, hour_shift, "heat")


def heat_demand(cutout, threshold=15.0, a=1.0, constant=0.0, hour_shift=0.0, **params):
    """Degree-day heat demand from daily-average temperature
    (convert.py:421-471)."""
    return cutout.convert_and_aggregate(
        convert_func=convert_heat_demand, threshold=threshold, a=a,
        constant=constant, hour_shift=hour_shift, **params,
    )


def convert_cooling_demand(cutout, threshold, a, constant, hour_shift):
    return _daily_demand(cutout, threshold, a, constant, hour_shift, "cooling")


def cooling_demand(cutout, threshold=23.0, a=1.0, constant=0.0, hour_shift=0.0,
                   **params):
    """Degree-day cooling demand (convert.py:491-546)."""
    return cutout.convert_and_aggregate(
        convert_func=convert_cooling_demand, threshold=threshold, a=a,
        constant=constant, hour_shift=hour_shift, **params,
    )


# ---------------------------------------------------------------------------
# solar: irradiation / pv / solar thermal (convert.py:549-936)
# ---------------------------------------------------------------------------
def _resolve_solar_position(fields, eph, lon, lat, trig_carry=False):
    """THE stored-vs-ephemeris solar-position dispatch, shared by the pv
    chain and csp (line_rating mirrors it by writing the fields dict);
    a change to the convention (e.g. the -30 min ERA5 shift) must land
    here once, not drift between converters.  Works inside jit."""
    if "solar_altitude" in fields and "solar_azimuth" in fields:
        sp_ = {"altitude": fields["solar_altitude"],
               "azimuth": fields["solar_azimuth"]}
        if trig_carry:
            # the cutout's fields cache derives the (sin, cos) pairs once
            # and every conversion reuses them
            for src, dst in (("solar_altitude_sin", "sin_altitude"),
                             ("solar_altitude_cos", "cos_altitude"),
                             ("solar_azimuth_sin", "sin_azimuth"),
                             ("solar_azimuth_cos", "cos_azimuth")):
                if src in fields:
                    sp_[dst] = fields[src]
        return sp_
    return solar_position(jnp.asarray(eph["declination"]),
                          jnp.asarray(eph["hour_angle0"]),
                          jnp.asarray(lon), jnp.asarray(lat))
@partial(jax.jit, static_argnames=(
    "orient_t", "tracking", "trigon_model", "clearsky_model",
    "altitude_threshold", "irradiation_kind", "panel_t", "solar_thermal_t",
))
def _solar_chain(fields, eph, lon, lat, orient_t, tracking, trigon_model,
                 clearsky_model, altitude_threshold=1.0,
                 irradiation_kind="total", panel_t=None, solar_thermal_t=None):
    """One fused pipeline: solar position -> orientation -> transposition
    [-> panel model | -> collector model].  Everything from here on is a
    single XLA computation on the (T, Y, X) lattice."""
    sp_ = _resolve_solar_position(fields, eph, lon, lat, trig_carry=True)
    surf = surface_orientation(sp_, lat, _thaw(orient_t), tracking)
    irr = tilted_irradiation(
        fields, sp_, surf, trigon_model=trigon_model,
        clearsky_model=clearsky_model, tracking=tracking,
        altitude_threshold=altitude_threshold, irradiation=irradiation_kind,
    )
    if panel_t is not None:
        return pv_kernels.solar_panel_power(irr, fields["temperature"], _thaw(panel_t))
    if solar_thermal_t is not None:
        cfg = _thaw(solar_thermal_t)
        return thermal.solar_thermal_output(
            irr, fields["temperature"], cfg["c0"], cfg["c1"], cfg["t_store"]
        )
    return irr


def _run_solar_chain(cutout, orientation, tracking=None, trigon_model="simple",
                     clearsky_model="simple", irradiation_kind="total",
                     panel=None, solar_thermal_cfg=None):
    if not isinstance(orientation, dict) or "kind" not in orientation:
        orientation = get_orientation(orientation)
    fields = cutout.fields()
    _, eph = _solar_position_inputs(cutout, fields)
    g = cutout.grid_desc
    eph_dev = ({} if eph is None
               else {k: jnp.asarray(v) for k, v in eph.items()})
    out = _solar_chain(
        fields, eph_dev, jnp.asarray(g.x), jnp.asarray(g.y),
        orient_t=_freeze(orientation), tracking=tracking,
        trigon_model=trigon_model, clearsky_model=clearsky_model,
        irradiation_kind=irradiation_kind,
        panel_t=None if panel is None else _freeze(panel),
        solar_thermal_t=(None if solar_thermal_cfg is None
                         else _freeze(solar_thermal_cfg)),
    )
    da = _tyx(cutout, out)
    # reference attrs/name conventions: irradiation carries 'W m**-2'
    # (pv/irradiation.py:253), pv is 'specific generation' in kWh/kWp
    # (pv/solar_panel_model.py:41-43); solar thermal stamps nothing
    # (reference convert_solar_thermal returns bare output)
    if panel is not None:
        da.attrs["units"] = "kWh/kWp"
        da.name = "specific generation"
    elif solar_thermal_cfg is None:
        da.attrs["units"] = "W m**-2"
    return da


def convert_irradiation(cutout, orientation, tracking=None, irradiation="total",
                        trigon_model="simple", clearsky_model="simple"):
    return _run_solar_chain(cutout, orientation, tracking, trigon_model,
                            clearsky_model, irradiation_kind=irradiation)


def irradiation(cutout, orientation, irradiation="total", tracking=None,
                clearsky_model=None, trigon_model="simple", **params):
    """Total/direct/diffuse/ground irradiation on a tilted surface
    (convert.py:770-836)."""
    return cutout.convert_and_aggregate(
        convert_func=convert_irradiation, orientation=orientation,
        tracking=tracking, irradiation=irradiation,
        clearsky_model=clearsky_model, trigon_model=trigon_model, **params,
    )


def convert_pv(cutout, panel, orientation, tracking=None, trigon_model="simple",
               clearsky_model="simple"):
    return _run_solar_chain(cutout, orientation, tracking, trigon_model,
                            clearsky_model, panel=panel)


def pv(cutout, panel, orientation, tracking=None, clearsky_model=None,
       trigon_model="simple", **params):
    """Downward radiation + temperature -> PV generation (convert.py:857-936)."""
    if isinstance(panel, (str, Path)):
        panel = get_solarpanelconfig(panel)
    return cutout.convert_and_aggregate(
        convert_func=convert_pv, panel=panel, orientation=orientation,
        tracking=tracking, clearsky_model=clearsky_model,
        trigon_model=trigon_model, **params,
    )


def convert_solar_thermal(cutout, orientation, trigon_model, clearsky_model,
                          c0, c1, t_store):
    return _run_solar_chain(
        cutout, orientation, None, trigon_model, clearsky_model,
        solar_thermal_cfg={"c0": c0, "c1": c1, "t_store": t_store},
    )


def solar_thermal(cutout, orientation=None, trigon_model="simple",
                  clearsky_model="simple", c0=0.8, c1=3.0, t_store=80.0, **params):
    """Solar-thermal collector generation (convert.py:575-630)."""
    if orientation is None:
        orientation = {"slope": 45.0, "azimuth": 180.0}
    return cutout.convert_and_aggregate(
        convert_func=convert_solar_thermal, orientation=orientation,
        trigon_model=trigon_model, clearsky_model=clearsky_model,
        c0=c0, c1=c1, t_store=t_store, **params,
    )


# ---------------------------------------------------------------------------
# wind (convert.py:633-744)
# ---------------------------------------------------------------------------
@partial(jax.jit, static_argnames=("to_height", "method"))
def _wind_pipeline(fields, V, POW_norm, to_height, method):
    wnd_hub = wind_kernels.extrapolate_wind_speed(fields, to_height, method=method)
    return wind_kernels.power_curve(wnd_hub, V, POW_norm, 1.0)


def convert_wind(cutout, turbine, interpolation_method="logarithmic"):
    V, POW, hub_height, P = (turbine[k] for k in ("V", "POW", "hub_height", "P"))
    # exact collinear-knot removal: identical results, fewer mask-and-sum
    # segments on device (see physics.wind.simplify_power_curve)
    V, POW = wind_kernels.simplify_power_curve(V, POW)
    fields = cutout.fields()
    out = _wind_pipeline(
        fields, jnp.asarray(V), jnp.asarray(POW) / P,
        to_height=float(hub_height), method=interpolation_method,
    )
    return _tyx(cutout, out, name="specific generation",
                attrs={"units": "MWh/MWp"})


def wind(cutout, turbine, smooth=False, add_cutout_windspeed=False,
         interpolation_method="logarithmic", **params):
    """Wind generation: hub-height extrapolation + power curve
    (convert.py:665-744)."""
    turbine = get_windturbineconfig(turbine, add_cutout_windspeed=add_cutout_windspeed)
    if smooth:
        turbine = windturbine_smooth(turbine, params=smooth)
    return cutout.convert_and_aggregate(
        convert_func=convert_wind, turbine=turbine,
        interpolation_method=interpolation_method, **params,
    )


# ---------------------------------------------------------------------------
# CSP (convert.py:939-1024)
# ---------------------------------------------------------------------------
def convert_csp(cutout, installation):
    fields = cutout.fields()
    _, eph = _solar_position_inputs(cutout, fields)
    sp_ = _resolve_solar_position(fields, eph if eph is not None else {},
                                  cutout.grid_desc.x, cutout.grid_desc.y)
    out = csp_kernels.csp_specific_generation(fields, sp_, installation)
    return _tyx(cutout, out, name="specific generation",
                attrs={"units": "kWh/kW_ref"})


def csp(cutout, installation, technology=None, **params):
    """CSP generation from direct radiation (convert.py:974-1024)."""
    if isinstance(installation, (str, Path)):
        installation = get_cspinstallationconfig(installation)
    if technology is not None:
        installation = dict(installation, technology=technology)
    return cutout.convert_and_aggregate(
        convert_func=convert_csp, installation=installation, **params,
    )


# ---------------------------------------------------------------------------
# hydro (convert.py:1027-1149)
# ---------------------------------------------------------------------------
def convert_runoff(cutout, weight_with_height=True):
    fields = cutout.fields()
    runoff_ = fields["runoff"]
    if weight_with_height:
        runoff_ = runoff_ * fields["height"]
    return _tyx(cutout, runoff_)


def runoff(cutout, smooth=None, lower_threshold_quantile=None,
           normalize_using_yearly=None, **params):
    """Runoff series with optional smoothing/threshold/yearly normalisation
    (convert.py:1037-1084)."""
    result = cutout.convert_and_aggregate(convert_func=convert_runoff, **params)
    two = isinstance(result, tuple)
    res = result[0] if two else result

    if smooth:  # False/None/0 all mean "no smoothing" (smooth=False
        # previously slipped past an `is not None` guard into a
        # window-0 rolling mean that crashed on an empty slice)
        if smooth is True:
            smooth = 24 * 7
        res = res.rolling_mean("time", smooth, min_periods=1)

    if lower_threshold_quantile is not None:
        if lower_threshold_quantile is True:
            lower_threshold_quantile = 5e-3
        thr = np.nanquantile(np.asarray(res.values).ravel(), lower_threshold_quantile)
        res = res.copy(np.where(res.values >= thr, res.values, 0.0))

    if normalize_using_yearly is not None:
        # normalize by integer YEAR labels regardless of the stats' index
        # flavor (reference uses a string slice on a datetime index,
        # convert.py:1073-1082)
        nuy = normalize_using_yearly.copy()
        nuy.index = (nuy.index.year if isinstance(nuy.index, pd.DatetimeIndex)
                     else nuy.index.astype(int))
        tindex = pd.DatetimeIndex(res.coords["time"].values)
        counts = pd.Series(tindex.year).value_counts()
        years = counts[counts > 8700].index.intersection(nuy.index)
        if not len(years):  # user-input validation must survive python -O
            raise ValueError(
                "Need at least a full year of data (more is better)")
        lo, hi = int(years.min()), int(years.max())
        sel = (tindex.year >= lo) & (tindex.year <= hi)
        nuy_sum = nuy.loc[(nuy.index >= lo) & (nuy.index <= hi)].sum()
        bus_dim = res.dims[1 - res.get_axis_num("time")]
        if np.ndim(nuy_sum) > 0:
            # align the per-region totals to the result's bus labels —
            # positional pairing would scale regions by each other's
            # totals when the column order differs (reference reindexes
            # by label, convert.py:1080-1082)
            nuy_sum = nuy_sum.reindex(res.coords[bus_dim])
        denom = res.values[:, sel].sum(axis=1) if res.dims[0] != "time" \
            else res.values[sel].sum(axis=0)
        scale = np.asarray(nuy_sum) / denom
        if res.dims[0] == "time":
            res = res.copy(res.values * scale[None, :])
        else:
            res = res.copy(res.values * scale[:, None])

    return (res, result[1]) if two else res


def hydro(cutout, plants, hydrobasins, flowspeed=1, weight_with_height=False,
          show_progress=False, **kwargs):
    """Per-plant inflow from basin-aggregated runoff (convert.py:1087-1149)."""
    basins = hydro_kernels.determine_basins(plants, hydrobasins)
    matrix = sp.csr_matrix(cutout.indicatormatrix(basins.shapes))
    row_sums = np.asarray(matrix.sum(axis=1)).ravel()
    inv = np.nan_to_num(
        np.where(row_sums != 0, 1.0 / np.where(row_sums != 0, row_sums, 1), 0.0),
        nan=0.0, posinf=0.0, neginf=0.0,
    )
    matrix_normalized = spdiag(inv) @ matrix
    runoff_da = cutout.runoff(
        matrix=matrix_normalized, index=basins.shapes.index,
        weight_with_height=weight_with_height, **kwargs,
    )
    # m of water / h  ->  m^3 / h via basin area on an equal-area projection
    # (convert.py:1143-1145)
    areas = hydro_kernels.basin_areas_m2(basins)
    runoff_da = runoff_da.copy(np.asarray(runoff_da.values) * areas[:, None])
    return hydro_kernels.inflow_for_plants(basins, runoff_da, flowspeed)


# ---------------------------------------------------------------------------
# dynamic line rating (convert.py:1152-1367)
# ---------------------------------------------------------------------------
def convert_line_rating(ds, psi, R, D=0.028, Ts=373, epsilon=0.6, alpha=0.6,
                        per_unit=False):
    """Single-line ampacity from a dict of per-cell arrays; mirrors the
    reference signature for the IEEE-738 validation case
    (convert.py:1152-1252).  ``per_unit`` is accepted for signature parity;
    the reference declares but never uses it (convert.py:1153)."""
    del per_unit
    imax = lr_kernels.ampacity(ds, psi, R, D, Ts, epsilon, alpha)
    return imax


def line_rating(cutout, shapes, line_resistance, show_progress=False,
                dask_kwargs=None, _chunk_hours=None, **params):
    """Dynamic line rating for a set of line geometries (convert.py:1255-1367).

    TPU-native: all lines are evaluated in one batched padded-gather kernel
    instead of a delayed-per-line fan-out.
    """
    from atlite_tpu.gis.geometry import parse_geometry

    if not isinstance(shapes, pd.Series):
        shapes = pd.Series(list(shapes)).rename_axis("dim_0")
    I = sp.csr_matrix(cutout.intersectionmatrix(shapes))

    def get_azimuth(shape):
        coords = np.asarray(parse_geometry(shape).coords)
        start, end = coords[0], coords[-1]
        return np.arctan2(start[0] - end[0], start[1] - end[1])

    azimuth = shapes.apply(get_azimuth)
    azimuth = azimuth.where(azimuth >= 0, azimuth + np.pi)

    params.setdefault("D", 0.028)
    params.setdefault("Ts", 373)
    params.setdefault("epsilon", 0.6)
    params.setdefault("alpha", 0.6)
    df = pd.DataFrame({"psi": azimuth, "R": line_resistance}).assign(**params)
    expected = pd.Index(["psi", "R", "D", "Ts", "epsilon", "alpha"])
    if not df.columns.equals(expected):
        # reference convert.py:1352-1354: a misspelled tweak parameter
        # (e.g. Epsilon=) must fail loudly, not become an inert column
        # while the kernel silently uses the default
        raise ValueError(
            f"unexpected line-rating parameters "
            f"{sorted(set(df.columns) - set(expected))}; "
            f"expected {list(expected[2:])}")
    if df.isnull().any().any():  # survives python -O, unlike assert
        raise ValueError("Nan values encountered.")

    # vectorized padded (L, K) gather plan straight from the CSR structure:
    # csr .indices is row-major, so the row-major mask positions line up
    L = len(df)
    counts = np.diff(I.indptr)
    K = max(1, int(counts.max()) if L else 1)
    mask = np.arange(K)[None, :] < counts[:, None]
    cell_idx = np.zeros((L, K), dtype=np.int64)
    cell_idx[mask] = I.indices

    # read stored variables straight from the (mmap'd) host store — the
    # per-chunk host gather below needs host bytes, and staging the WHOLE
    # cutout to HBM via fields() only to read it back doubled the wire
    # traffic and could not scale to the full-year national grids this
    # function streams for (r5 review finding)
    data = cutout.data
    T = cutout.grid_desc.time.shape[0]
    extra = {}
    if "solar_altitude" not in data or "solar_azimuth" not in data:
        # compute solar position on the fly when it is not a stored
        # variable (the reference's SolarPosition(ds) call inside
        # convert_line_rating, convert.py:1243-1247)
        g = cutout.grid_desc
        eph = timeutil.solar_ephemeris(g.time, "0h")
        sp_ = solar_position(
            jnp.asarray(eph["declination"]), jnp.asarray(eph["hour_angle0"]),
            jnp.asarray(g.x), jnp.asarray(g.y),
        )
        extra["solar_altitude"] = np.asarray(sp_["altitude"])
        extra["solar_azimuth"] = np.asarray(sp_["azimuth"])
    need = ["temperature", "wnd100m", "height", "wnd_azimuth", "influx_direct",
            "solar_altitude", "solar_azimuth"]
    srcs = {v: extra[v] if v in extra else np.asarray(data[v]) for v in need}
    flats = {v: a.reshape(T, -1) if a.ndim == 3 else a.reshape(-1)
             for v, a in srcs.items()}
    mask_dev = jnp.asarray(mask)
    static = {v: jnp.asarray(flats[v][cell_idx][:, :, None])
              for v in need if flats[v].ndim == 1}  # (L,K,1)

    # stream the (L, K, T) gather through the device in time chunks so a
    # national grid (thousands of lines x full year) never materializes at
    # once; the host gather rides the mmap'd store, the device kernel is
    # batched over all lines (no per-line fan-out, cf. reference
    # convert.py:1354-1365)
    chunk = _chunk_hours or max(1, min(T, int(48e6 // max(1, L * K))))
    pieces = []
    for t0 in range(0, T, chunk):
        t1 = min(T, t0 + chunk)
        gathered = dict(static)
        for v in need:
            if flats[v].ndim == 2:
                # (Tc, L, K) -> (L, K, Tc); pad the tail chunk to a fixed
                # width so jit sees one shape
                g = np.transpose(flats[v][t0:t1][:, cell_idx], (1, 2, 0))
                if t1 - t0 < chunk:
                    g = np.pad(g, ((0, 0), (0, 0), (0, chunk - (t1 - t0))),
                               mode="edge")
                gathered[v] = jnp.asarray(g)
        out = lr_kernels.batched_line_rating(
            gathered, mask_dev, df["psi"].values, df["R"].values,
            df["D"].values, df["Ts"].values, df["epsilon"].values,
            df["alpha"].values,
        )
        pieces.append(np.asarray(out)[:, : t1 - t0])
    if not pieces:
        out = np.zeros((L, 0))
    else:
        out = np.concatenate(pieces, axis=1) if len(pieces) > 1 else pieces[0]
    return DataArray(
        out,
        coords={"name": df.index, "time": cutout.grid_desc.time_index},
        dims=("name", "time"), attrs={"units": "A"},
    )


# Streaming contracts (consumed by _chunk_bounds / _chunked_convert):
# converters marked _time_elementwise treat every hour independently, so the
# streamer may slide the tail window back to a full chunk and drop the
# overlapping prefix; _day_aligned converters resample whole days and stream
# over day-aligned variable-size chunks instead.  A converter with neither
# marker streams on fixed boundaries with an odd-shaped (retraced) tail —
# slower, never wrong.
for _f in (convert_wind, convert_pv, convert_irradiation, convert_solar_thermal,
           convert_csp, convert_temperature, convert_soil_temperature,
           convert_dewpoint_temperature, convert_coefficient_of_performance,
           convert_runoff):
    _f._time_elementwise = True
for _f in (convert_heat_demand, convert_cooling_demand):
    _f._day_aligned = True
del _f
