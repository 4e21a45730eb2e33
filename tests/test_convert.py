"""Converter semantics: temperature family, COP, heat/cooling demand,
solar thermal, CSP (model: reference test/test_preparation_and_conversion.py)."""

import numpy as np
import pandas as pd
import pytest

from atlite_tpu import Cutout


def test_temperature_is_celsius(cutout):
    out = cutout.temperature(aggregate_time=None)
    np.testing.assert_allclose(
        np.asarray(out.values), np.asarray(cutout.data["temperature"]) - 273.15,
        rtol=1e-12,
    )


def test_soil_temperature_sea_zeroed(cutout):
    out = cutout.soil_temperature(aggregate_time=None)
    vals = np.asarray(out.values)
    raw = np.asarray(cutout.data["soil temperature"])
    assert np.isnan(raw).any()  # synthetic data has sea NaNs
    assert not np.isnan(vals).any()
    np.testing.assert_allclose(vals[~np.isnan(raw)],
                               (raw - 273.15)[~np.isnan(raw)], rtol=1e-12)
    assert (vals[np.isnan(raw)] == 0).all()


def test_dewpoint_below_temperature(cutout):
    t = cutout.temperature(aggregate_time=None)
    d = cutout.dewpoint_temperature(aggregate_time=None)
    assert np.all(np.asarray(d.values) <= np.asarray(t.values) + 1e-9)


def test_cop_defaults_and_quadratic(cutout):
    cop = cutout.coefficient_of_performance(aggregate_time=None)
    T = np.asarray(cutout.data["temperature"]) - 273.15
    dT = 55.0 - T
    expected = 6.81 - 0.121 * dT + 0.000630 * dT**2
    np.testing.assert_allclose(np.asarray(cop.values), expected, rtol=1e-9)

    cop_soil = cutout.coefficient_of_performance(source="soil",
                                                 aggregate_time=None)
    assert not np.allclose(np.asarray(cop_soil.values), np.asarray(cop.values))
    with pytest.raises(NotImplementedError):
        cutout.coefficient_of_performance(source="water", aggregate_time=None)


def test_heat_demand_daily_mean(cutout):
    hd = cutout.heat_demand(threshold=15.0, a=1.0, aggregate_time=None)
    assert hd.sizes["time"] == 1  # one day of data
    T = np.asarray(cutout.data["temperature"])
    expected = np.clip((15.0 + 273.15) - T.mean(axis=0), 0.0, None)
    np.testing.assert_allclose(np.asarray(hd.values)[0], expected, rtol=1e-9)


def test_heat_demand_hour_shift(cutout_week):
    hd0 = cutout_week.heat_demand(aggregate_time=None)
    hd4 = cutout_week.heat_demand(hour_shift=4.0, aggregate_time=None)
    # shifting the day boundary changes daily means and may add a day
    assert hd4.sizes["time"] >= hd0.sizes["time"]
    assert not np.allclose(
        np.asarray(hd0.values)[1], np.asarray(hd4.values)[1]
    )


def test_cooling_demand_complementary(cutout):
    heat = cutout.heat_demand(threshold=15.0, aggregate_time=None)
    cool = cutout.cooling_demand(threshold=15.0, aggregate_time=None)
    # at any cell, at most one of the two is nonzero (same threshold)
    h = np.asarray(heat.values)
    c = np.asarray(cool.values)
    assert np.all((h == 0) | (c == 0))


def test_solar_thermal_nonnegative(cutout):
    st = cutout.solar_thermal(aggregate_time=None)
    vals = np.asarray(st.values)
    assert np.all(vals >= 0)
    assert vals.max() > 0
    # collector with huge losses yields less
    st_lossy = cutout.solar_thermal(c0=0.5, c1=10.0, aggregate_time=None)
    assert np.asarray(st_lossy.values).sum() < vals.sum()


def test_irradiation_hay_davies_close_to_simple(cutout):
    simple = cutout.irradiation(orientation="latitude_optimal",
                                trigon_model="simple", aggregate_time=None)
    hd = cutout.irradiation(orientation="latitude_optimal",
                            trigon_model="hay-davies", aggregate_time=None)
    s, h = np.asarray(simple.values), np.asarray(hd.values)
    assert h.max() > 0
    # transposition models agree within ~30% on aggregate
    assert 0.7 < h.sum() / s.sum() < 1.3


# ------------------------------------------------------------------- CSP
def test_csp_solar_tower(cutout):
    out = cutout.csp("SAM_solar_tower", aggregate_time=None)
    vals = np.asarray(out.values)
    assert np.all(vals >= 0) and np.all(vals <= 1.0 + 1e-9)
    assert vals.max() > 0
    alt = np.asarray(cutout.data["solar_altitude"])
    assert np.all(vals[alt <= 0] == 0)


def test_csp_lossless_upper_bound(cutout):
    """Real installation <= lossless installation
    (reference test_preparation_and_conversion.py:226-253).

    The shipped lossless_installation.yaml carries the reference's literal
    ``technology: None`` (the *string*, not yaml null), so — exactly as in
    the reference's convert_csp (convert.py:943-949) — it is only usable
    with an explicit ``technology=`` override.
    """
    real = cutout.csp("SAM_solar_tower", aggregate_time=None)
    lossless = cutout.csp("lossless_installation", technology="solar tower",
                          aggregate_time=None)
    assert np.all(np.asarray(real.values) <= np.asarray(lossless.values) + 1e-9)
    with pytest.raises(ValueError):
        cutout.csp("lossless_installation", aggregate_time=None)


def test_csp_trough_vs_tower_technology(cutout):
    tower = cutout.csp("SAM_solar_tower", aggregate_time=None)
    as_trough = cutout.csp("SAM_solar_tower", technology="parabolic trough",
                           aggregate_time=None)
    assert not np.allclose(np.asarray(tower.values), np.asarray(as_trough.values))
    with pytest.raises(ValueError):
        cutout.csp("SAM_solar_tower", technology="fresnel", aggregate_time=None)


# ---------------------------------------------------------------- runoff
def test_runoff_nonnegative_and_weighting(cutout):
    r_raw = cutout.runoff(weight_with_height=False, aggregate_time=None)
    assert np.all(np.asarray(r_raw.values) >= 0)
    # default weights by height (which may be negative below sea level —
    # reference convert.py:1028-1034 behaves identically)
    r_w = cutout.runoff(aggregate_time=None)
    assert not np.allclose(np.asarray(r_w.values), np.asarray(r_raw.values))


def test_runoff_smooth_and_threshold(cutout_week):
    layout = cutout_week.uniform_layout()
    r = cutout_week.runoff(layout=layout, aggregate_time=None)
    rs = cutout_week.runoff(layout=layout, smooth=24, aggregate_time=None)
    assert np.asarray(rs.values).std() <= np.asarray(r.values).std() + 1e-12
    rt = cutout_week.runoff(layout=layout, lower_threshold_quantile=0.5,
                            aggregate_time=None)
    vals = np.asarray(rt.values)
    assert (vals == 0).sum() >= vals.size // 2 - 1


def test_runoff_normalize_using_yearly():
    c = Cutout(path=None, module="synthetic", x=slice(-1, 0), y=slice(50, 51),
               time="2013", dtype="float64")
    c.prepare(features=["runoff", "height"])
    layout = c.uniform_layout()
    target = pd.DataFrame({0: [1234.5]}, index=[2013])
    r = c.runoff(layout=layout, normalize_using_yearly=target,
                 aggregate_time=None)
    assert np.isclose(np.asarray(r.values).sum(), 1234.5)


def test_runoff_normalize_using_yearly_datetimeindex():
    """Yearly stats with a DatetimeIndex and label-aligned regions
    (reference convert.py:1073-1082 string-slices a datetime index)."""
    c = Cutout(path=None, module="synthetic", x=slice(-1, 0), y=slice(50, 51),
               time="2013", dtype="float64")
    c.prepare(features=["runoff", "height"])
    layout = c.uniform_layout()
    target = pd.DataFrame({0: [777.0]},
                          index=pd.DatetimeIndex(["2013-01-01"]))
    r = c.runoff(layout=layout, normalize_using_yearly=target,
                 aggregate_time=None)
    assert np.isclose(np.asarray(r.values).sum(), 777.0)

    # two regions, stats columns given in REVERSED order: label alignment
    import scipy.sparse as sp

    m = sp.csr_matrix(np.vstack([layout.values.ravel() * 2,
                                 layout.values.ravel()]))
    target2 = pd.DataFrame({1: [100.0], 0: [300.0]}, index=[2013])
    r2 = c.runoff(matrix=m, index=pd.Index([0, 1], name="bus"),
                  normalize_using_yearly=target2, aggregate_time=None)
    sums = np.asarray(r2.values).sum(axis=1)
    np.testing.assert_allclose(sums, [300.0, 100.0], rtol=1e-9)


def test_layout_dataarray_alignment():
    """A layout DataArray with descending y / transposed dims aligns by
    coordinates (reference layout.reindex_like, convert.py:242-249)."""
    c = Cutout(path=None, module="synthetic", x=slice(-1, 0.5), y=slice(50, 51),
               time="2013-01-01")
    c.prepare()
    from atlite_tpu.dataarray import DataArray as DA

    g = c.grid_desc
    vals = np.arange(len(g.y) * len(g.x), dtype=float).reshape(
        len(g.y), len(g.x))
    asc = DA(vals, coords={"y": g.y, "x": g.x}, dims=("y", "x"))
    desc = DA(vals[::-1].T.copy(),
              coords={"x": g.x, "y": g.y[::-1]}, dims=("x", "y"))
    r_asc, cap_asc = c.wind("Vestas_V112_3MW", layout=asc,
                            return_capacity=True, aggregate_time=None)
    r_desc, cap_desc = c.wind("Vestas_V112_3MW", layout=desc,
                              return_capacity=True, aggregate_time=None)
    np.testing.assert_allclose(np.asarray(cap_desc.values),
                               np.asarray(cap_asc.values))
    np.testing.assert_allclose(np.asarray(r_desc.values),
                               np.asarray(r_asc.values), rtol=1e-6)
    with pytest.raises(ValueError):
        c.wind("Vestas_V112_3MW", layout=vals[:, :-1], aggregate_time=None)


def test_higher_altitude_higher_runoff(cutout):
    """Height weighting boosts mountain runoff (reference
    test_preparation_and_conversion.py:335-357)."""
    h = np.asarray(cutout.data["height"])
    hi = h > np.quantile(h, 0.7)
    lo = h < np.quantile(h, 0.3)
    r = np.asarray(cutout.runoff(aggregate_time=None).values).mean(axis=0)
    rn = np.asarray(
        cutout.runoff(weight_with_height=False, aggregate_time=None).values
    ).mean(axis=0)
    ratio_w = r[hi].mean() / max(r[lo].mean(), 1e-12)
    ratio_n = rn[hi].mean() / max(rn[lo].mean(), 1e-12)
    assert ratio_w > ratio_n  # weighting amplifies altitude contrast


def test_time_chunked_conversion_equals_full(cutout_week):
    full = cutout_week.wind("Vestas_V112_3MW", aggregate_time=None)
    chunked = cutout_week.wind("Vestas_V112_3MW", aggregate_time=None,
                               time_chunk=48)
    np.testing.assert_allclose(np.asarray(chunked.values),
                               np.asarray(full.values), rtol=1e-12)
    # uneven chunk boundary + aggregation path
    layout = cutout_week.uniform_layout()
    full_b = cutout_week.pv(panel="CSi", orientation="latitude_optimal",
                            layout=layout, aggregate_time=None)
    chunk_b = cutout_week.pv(panel="CSi", orientation="latitude_optimal",
                             layout=layout, aggregate_time=None, time_chunk=50)
    np.testing.assert_allclose(np.asarray(chunk_b.values),
                               np.asarray(full_b.values), rtol=1e-10)


def test_stream_pack_int16(cutout_week):
    """CF-packed int16 staging (r4 verdict item 1): the streamed path may
    ship uint16 codes (half the wire bytes) with a quantization error
    bounded by range/65534 per variable; roughness packs in log space so
    the wind log-law stays accurate; NaN cells survive via the 65535
    sentinel."""
    from atlite_tpu import reference_impl as ref
    from atlite_tpu.resource import get_windturbineconfig

    full = np.asarray(
        cutout_week.wind("Vestas_V112_3MW", aggregate_time=None).values)
    packed = np.asarray(
        cutout_week.wind("Vestas_V112_3MW", aggregate_time=None,
                         time_chunk=48, stream_pack="int16").values)
    # quantization tolerance: wind-speed resolution ~ range/65534 (<1e-3
    # m/s) through the power-curve slope; documented in PERF.md
    assert np.abs(packed - full).max() < 2e-3

    # precision loss vs the independent float64 oracle stays in the same
    # band (quantization dominates the device f32 error)
    turbine = get_windturbineconfig("Vestas_V112_3MW")
    oracle = ref.wind_cf_numpy(
        {k: np.asarray(v) for k, v in cutout_week.data.items()},
        turbine["V"], turbine["POW"], turbine["P"], turbine["hub_height"],
    )
    assert np.abs(packed - oracle).max() < 2e-3

    # fused per-chunk aggregation path under packing
    layout = cutout_week.uniform_layout()
    fb = np.asarray(cutout_week.wind("Vestas_V112_3MW", layout=layout,
                                     aggregate_time=None).values)
    pb = np.asarray(cutout_week.wind("Vestas_V112_3MW", layout=layout,
                                     aggregate_time=None, time_chunk=48,
                                     stream_pack="int16").values)
    np.testing.assert_allclose(pb, fb, rtol=3e-3, atol=2e-3 * np.abs(fb).max())

    # NaN sea cells: the sentinel reconstructs NaN, the converter then
    # fills them exactly like the unpacked path (soil temperature NaN->0)
    st_full = np.asarray(
        cutout_week.soil_temperature(aggregate_time=None).values)
    st_pack = np.asarray(
        cutout_week.soil_temperature(aggregate_time=None, time_chunk=48,
                                     stream_pack="int16").values)
    sea = st_full == 0.0
    assert sea.any()
    np.testing.assert_array_equal(st_pack[sea], 0.0)
    assert np.abs(st_pack - st_full).max() < 5e-3  # ~110 K range / 65534

    # bad knob fails loudly
    with pytest.raises(ValueError, match="stream_pack"):
        cutout_week.wind("Vestas_V112_3MW", aggregate_time=None,
                         time_chunk=48, stream_pack="int8")


def test_time_chunked_demand_equals_unchunked(cutout_week):
    """Day-aligned streaming for the daily-resample demand converters
    (VERDICT r2 item 9): chunked == unchunked, including with an
    hour_shift whose day groups straddle chunk edges."""
    for kwargs in ({}, {"hour_shift": 8.0}, {"threshold": 21.0}):
        full = cutout_week.heat_demand(aggregate_time=None, **kwargs)
        for chunk in (24, 30, 49):
            part = cutout_week.heat_demand(aggregate_time=None,
                                           time_chunk=chunk, **kwargs)
            assert (part.coords["time"].values == full.coords["time"].values).all()
            np.testing.assert_allclose(np.asarray(part.values),
                                       np.asarray(full.values), rtol=1e-12)
    fullc = cutout_week.cooling_demand(aggregate_time=None, threshold=-5.0)
    partc = cutout_week.cooling_demand(aggregate_time=None, threshold=-5.0,
                                       time_chunk=30)
    np.testing.assert_allclose(np.asarray(partc.values),
                               np.asarray(fullc.values), rtol=1e-12)


def test_time_chunked_demand_month_boundary():
    """Chunk edges falling inside a month transition keep day groups
    whole (reference month-boundary semantics, convert.py:428-443)."""
    from atlite_tpu import Cutout

    c = Cutout(path=None, module="synthetic", bounds=(-4.0, 56.0, -1.5, 58.0),
               time=slice("2013-01-28", "2013-02-03"), dtype="float64")
    c.prepare(features=["temperature"])
    for hs in (0.0, 8.0):
        full = c.heat_demand(aggregate_time=None, hour_shift=hs)
        part = c.heat_demand(aggregate_time=None, hour_shift=hs, time_chunk=40)
        assert (part.coords["time"].values == full.coords["time"].values).all()
        np.testing.assert_allclose(np.asarray(part.values),
                                   np.asarray(full.values), rtol=1e-12)


def test_streamed_only_needed_vars(cutout_week, monkeypatch):
    """The chunked streamer stages only the variables the converter reads
    (wind log-law with the wnd80m fast lane absent: wnd10m/wnd100m +
    roughness, never azimuth/shear)."""
    from atlite_tpu import convert as cv

    staged = []
    real = cutout_week.isel_time

    def spy(t0, t1, only=None, **kw):
        staged.append(only)
        return real(t0, t1, only=only, **kw)

    monkeypatch.setattr(cutout_week, "isel_time", spy)
    full = cutout_week.wind("Vestas_V112_3MW", aggregate_time=None)
    chunked = cutout_week.wind("Vestas_V112_3MW", aggregate_time=None,
                               time_chunk=48)
    np.testing.assert_allclose(np.asarray(chunked.values),
                               np.asarray(full.values), rtol=1e-6)
    only_sets = [s for s in staged if s is not None]
    assert only_sets, "streamer did not engage the variable filter"
    assert "wnd_azimuth" not in only_sets[-1]
    assert "wnd_shear_exp" not in only_sets[-1]


def test_pv_on_3h_sampled_cutout():
    """3-hourly sampling flows through creation -> prepare -> solar chain
    (reference test_pv_era5_3h_sampling,
    test_preparation_and_conversion.py:519-522)."""
    from atlite_tpu import Cutout

    c = Cutout(path=None, module="synthetic", bounds=(-4.0, 56.0, -1.5, 58.0),
               time="2013-06-21", dt="3h", dtype="float64")
    c.prepare()
    assert len(c.grid_desc.time) == 8
    pv = c.pv(panel="CSi", orientation={"slope": 30.0, "azimuth": 180.0},
              aggregate_time=None)
    vals = np.asarray(pv.values)
    assert vals.shape[0] == 8 and np.isfinite(vals).all()
    assert vals[4].mean() > 0  # midday sample generates


def test_streamed_enhanced_clearsky_keeps_humidity(cutout_week):
    """The streamed sub-cutout must stage humidity (+temperature): the
    enhanced Reindl model silently downgraded to 'simple' (pv) or
    crashed (irradiation) when the staged variables omitted it."""
    from atlite_tpu import Cutout

    cw = cutout_week
    rng = np.random.default_rng(0)
    shape = np.asarray(cw.data["temperature"]).shape
    hum = rng.uniform(0.004, 0.012, size=shape)
    c = Cutout(path=None, data={**cw.data, "humidity": hum},
               grid_desc=cw.grid_desc, attrs=dict(cw.attrs),
               var_attrs={**cw.var_attrs,
                          "humidity": {"dims": ("time", "y", "x")}})
    kw = dict(panel="CSi", orientation="latitude_optimal",
              clearsky_model="enhanced", aggregate_time=None)
    full = c.pv(**kw)
    chunked = c.pv(**kw, time_chunk=48)
    np.testing.assert_allclose(np.asarray(chunked.values),
                               np.asarray(full.values), rtol=1e-10)
    kw2 = dict(orientation="latitude_optimal", clearsky_model="enhanced",
               aggregate_time=None)
    full_i = c.irradiation(**kw2)
    chunk_i = c.irradiation(**kw2, time_chunk=48)
    np.testing.assert_allclose(np.asarray(chunk_i.values),
                               np.asarray(full_i.values), rtol=1e-10)


def test_r4_gateway_review_fixes(cutout):
    """r4 review: per_unit zero-fills NaN like the reference's
    fillna(0) (convert.py:264-266); a matrix with the wrong column count
    is refused up front; runoff(smooth=False) means no smoothing."""
    import scipy.sparse as sp

    # per_unit NaN fill: poison one cell-hour, aggregate per-unit
    data = dict(cutout.data)
    wnd = np.array(cutout.data["wnd100m"], copy=True)
    wnd[0, 0, 0] = np.nan
    data["wnd100m"] = wnd
    from atlite_tpu import Cutout

    c2 = Cutout(path=None, data=data, grid_desc=cutout.grid_desc,
                attrs=dict(cutout.attrs), var_attrs=dict(cutout.var_attrs))
    C = len(cutout.grid_desc.y) * len(cutout.grid_desc.x)
    m = sp.csr_matrix(np.ones((1, C)))
    out = c2.wind("Vestas_V112_3MW", matrix=m, per_unit=True,
                  aggregate_time=None)
    vals = np.asarray(out.values)
    assert np.isfinite(vals).all()  # the NaN hour became 0.0, not NaN
    assert vals[0, 0] == 0.0

    with pytest.raises(ValueError, match="not aligned with the cutout"):
        cutout.wind("Vestas_V112_3MW", matrix=np.ones((2, C + 3)))

    r = cutout.runoff(smooth=False, aggregate_time=None)  # crashed before
    assert np.isfinite(np.asarray(r.values)).all()


def test_chunked_tail_overlap_equality(cutout):
    """The tail chunk now re-runs a full-width window and drops the
    overlap (shape-stable recompile fix) — chunked output must still
    equal unchunked exactly, with and without aggregation."""
    import scipy.sparse as sp

    T = len(cutout.grid_desc.time)
    chunk = T // 2 + 3  # forces a short tail
    full = np.asarray(cutout.wind("Vestas_V112_3MW",
                                  aggregate_time=None).values)
    chunked = np.asarray(cutout.wind("Vestas_V112_3MW", time_chunk=chunk,
                                     aggregate_time=None).values)
    np.testing.assert_allclose(chunked, full, rtol=1e-6)
    C = full.shape[1] * full.shape[2]
    m = sp.random(4, C, density=0.1, random_state=0, format="csr")
    fa = np.asarray(cutout.wind("Vestas_V112_3MW", matrix=m,
                                aggregate_time=None).values)
    ca = np.asarray(cutout.wind("Vestas_V112_3MW", matrix=m,
                                time_chunk=chunk, aggregate_time=None).values)
    np.testing.assert_allclose(ca, fa, rtol=1e-6)


def test_stream_pack_requires_streaming(cutout_week):
    """r5 review: stream_pack on an unchunked conversion must fail loudly
    instead of silently staging raw f32."""
    with pytest.raises(ValueError, match="stream_pack requires"):
        cutout_week.wind("Vestas_V112_3MW", aggregate_time=None,
                         stream_pack="int16")


def test_pack_params_rejects_inf(cutout_week):
    """A variable containing inf cannot be int16-packed (only NaN has a
    sentinel); pack_params must refuse rather than clip silently."""
    import copy

    c = cutout_week
    bad = np.array(c.data["wnd100m"], dtype=np.float64, copy=True)
    bad[0, 0, 0] = np.inf
    c2_data = dict(c.data)
    c2_data["wnd100m"] = bad
    from atlite_tpu.cutout import Cutout

    # drop the prepare()-stamped range so pack_params inspects the data
    va = {k: {kk: vv for kk, vv in v.items()
              if kk not in ("pack_min", "pack_max")}
          for k, v in c.var_attrs.items()}
    c2 = Cutout(None, data=c2_data, grid_desc=c.grid_desc,
                attrs=dict(c.attrs), var_attrs=va)
    with pytest.raises(ValueError, match="non-finite"):
        c2.pack_params(["wnd100m"])


def test_streamed_conversion_rejects_sharded_cutout(cutout_week):
    """r5: time_chunk staging is single-device; silently dropping a
    shard()-ed cutout's mesh would be a wrong-but-finite surprise."""
    import jax

    if len(jax.devices()) < 2:
        pytest.skip("needs >1 device")
    from atlite_tpu.core.mesh import make_mesh

    cutout_week.shard(make_mesh(jax.devices()[:2]))
    try:
        with pytest.raises(ValueError, match="unshard"):
            cutout_week.wind("Vestas_V112_3MW", aggregate_time=None,
                             time_chunk=48)
    finally:
        cutout_week.unshard()


def test_pack_range_persisted_in_store(tmp_path):
    """prepare() stamps each float variable's range into var_attrs (and
    thus the store manifest); pack_params uses it without re-reading the
    array, and the packed stream still reconstructs correctly."""
    c = Cutout(tmp_path / "pr", module="synthetic", x=slice(-4, -2),
               y=slice(56, 58), time="2013-01-01")
    c.prepare(features=["wind"])
    assert "pack_min" in c.var_attrs["wnd100m"]
    re = Cutout(tmp_path / "pr")  # reopen: range comes from the manifest
    lo = re.var_attrs["wnd100m"]["pack_min"]
    hi = re.var_attrs["wnd100m"]["pack_max"]
    arr = np.asarray(re.data["wnd100m"])
    assert lo <= arr.min() and hi >= arr.max()
    params = re.pack_params(["wnd100m"])
    off, scale, lg = params["wnd100m"]
    ref_lo = np.log(lo) if lg else lo
    assert np.isclose(off, ref_lo)
    # scalar attrs survive the netCDF writer too (r5 review finding)
    c.to_netcdf(tmp_path / "pr.nc")
    nc = Cutout(tmp_path / "pr.nc")
    assert np.isclose(nc.var_attrs["wnd100m"]["pack_min"], lo)
    # streamed packed conversion on the reopened store matches unpacked
    full = np.asarray(re.wind("Vestas_V112_3MW", aggregate_time=None).values)
    packed = np.asarray(re.wind("Vestas_V112_3MW", aggregate_time=None,
                                time_chunk=12, stream_pack="int16").values)
    assert np.abs(packed - full).max() < 2e-3


def test_stream_pack_collapsed_chunksize_fails_loudly(tmp_path):
    """r5 review: a stored chunksize >= T collapses streaming to an
    unstreamed run — stream_pack must still raise, not silently stage
    raw f32."""
    c = Cutout(tmp_path / "cc", module="synthetic", x=slice(-4, -2),
               y=slice(56, 58), time="2013-01-01", chunksize_time=10_000)
    c.prepare(features=["wind"])
    with pytest.raises(ValueError, match="stream_pack requires"):
        c.wind("Vestas_V112_3MW", aggregate_time=None, stream_pack="int16")


def test_aggregate_time_skips_nan(cutout):
    """r5 review: the reference's xarray sum/mean skip NaN (skipna=True
    for float data) — one NaN hour must not poison a cell's aggregate."""
    st = cutout.soil_temperature(aggregate_time=None)
    raw = np.asarray(cutout.data["soil temperature"])
    # craft a series with NaNs: use the raw soil field directly
    from atlite_tpu.dataarray import DataArray

    da = DataArray(raw - 273.15, coords=dict(st.coords), dims=st.dims)
    m = np.asarray(da.mean("time").values)
    sea = np.isnan(raw).all(axis=0)
    assert np.isfinite(m[~sea]).all()
    # all-NaN cells stay NaN (nanmean of empty)
    assert np.isnan(m[sea]).all() if sea.any() else True


def test_convert_index_list_of_tuples_rejected(cutout):
    import scipy.sparse as sp

    m = sp.random(2, len(cutout.grid_desc.y) * len(cutout.grid_desc.x),
                  density=0.1, format="csr")
    with pytest.raises(ValueError, match="single dimension"):
        cutout.wind("Vestas_V112_3MW", matrix=m,
                    index=[("DE", 1), ("FR", 2)], aggregate_time=None)
