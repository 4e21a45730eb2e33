"""Dataset adapters: synthetic determinism, era5 derivations, sarah
processing chain, gebco raster ingest."""

import numpy as np
import pandas as pd
import pytest

from atlite_tpu import Cutout
from atlite_tpu.datasets import era5, gebco, sarah, synthetic


def test_synthetic_deterministic():
    kw = dict(module="synthetic", x=slice(-2, 0), y=slice(50, 52),
              time="2013-01-01")
    a = Cutout(path=None, **kw).prepare(features=["wind"])
    b = Cutout(path=None, **kw).prepare(features=["wind"])
    np.testing.assert_array_equal(a.data["wnd100m"], b.data["wnd100m"])
    c = Cutout(path=None, seed=7, **kw).prepare(features=["wind"])
    assert not np.array_equal(a.data["wnd100m"], c.data["wnd100m"])


def test_synthetic_physical_consistency(cutout):
    d = cutout.data
    toa = np.asarray(d["influx_toa"])
    assert np.all(toa >= 0)
    total = np.asarray(d["influx_direct"]) + np.asarray(d["influx_diffuse"])
    assert np.all(total <= toa + 1e-9)
    # shear-exponent consistency (era5.py:124-126 convention)
    shear = np.log(np.asarray(d["wnd10m"]) / np.asarray(d["wnd100m"])) / np.log(0.1)
    np.testing.assert_allclose(shear, np.asarray(d["wnd_shear_exp"]), rtol=1e-9)


# ---------------------------------------------------------------- era5
def test_era5_derive_wind():
    u100, v100 = np.array([3.0]), np.array([4.0])
    u10, v10 = np.array([1.5]), np.array([2.0])
    out = era5.derive_wind(u100, v100, u10, v10, np.array([0.1]))
    np.testing.assert_allclose(out["wnd100m"], 5.0)
    np.testing.assert_allclose(out["wnd_shear_exp"],
                               np.log(2.5 / 5.0) / np.log(0.1))
    az = out["wnd_azimuth"]
    assert 0 <= az[0] < 2 * np.pi
    np.testing.assert_allclose(az, np.arctan2(3, 4))


def test_era5_sanitizers():
    ds = {"roughness": np.array([-1.0, 0.5])}
    out = era5.sanitize_wind(ds)
    np.testing.assert_allclose(out["roughness"], [2e-4, 0.5])
    ds = {"influx_direct": np.array([-5.0, 3.0]),
          "influx_diffuse": np.array([-1.0, 1.0]),
          "influx_toa": np.array([-2.0, 4.0])}
    out = era5.sanitize_influx(ds)
    assert all(np.all(out[k] >= 0) for k in out)


def test_era5_influx_derivation():
    times = pd.date_range("2013-06-01", periods=2, freq="h").values
    ssrd = np.full((2, 1, 1), 3.6e6)
    ssr = np.full((2, 1, 1), 3.0e6)
    tisr = np.full((2, 1, 1), 4.5e6)
    fdir = np.full((2, 1, 1), 2.4e6)
    out = era5.derive_influx(ssrd, ssr, tisr, fdir, times,
                             np.array([0.0]), np.array([50.0]))
    np.testing.assert_allclose(out["influx_toa"], 1250.0)
    np.testing.assert_allclose(out["influx_direct"], 2.4e6 / 3600)
    np.testing.assert_allclose(out["influx_diffuse"], (3.6e6 - 2.4e6) / 3600)
    np.testing.assert_allclose(out["albedo"], (3.6e6 - 3.0e6) / 3.6e6)
    assert out["solar_altitude"].shape == (2, 1, 1)


def test_era5_retrieval_times():
    idx = pd.date_range("2012-12-30", "2013-02-02", freq="h")
    q = era5.retrieval_times(idx)
    assert len(q) == 2  # two years
    qm = era5.retrieval_times(idx, monthly_requests=True)
    assert len(qm) == 3  # dec, jan, feb
    qs = era5.retrieval_times(idx, static=True)
    assert qs["year"] == ["2012"]


def test_era5_height():
    np.testing.assert_allclose(era5.derive_height(np.array([9806.65])), [1000.0])


# ---------------------------------------------------------------- sarah
def test_sarah_interpolate_nan():
    v = np.array([1.0, np.nan, 3.0, np.nan, np.nan, 6.0]).reshape(-1, 1, 1)
    out = sarah.interpolate_nan_time(v)
    np.testing.assert_allclose(out.ravel(), [1, 2, 3, 4, 5, 6])


def test_sarah_hourly_mean():
    v = np.arange(8.0).reshape(-1, 1, 1)
    out = sarah.hourly_mean(v)
    np.testing.assert_allclose(out.ravel(), [0.5, 2.5, 4.5, 6.5])


def test_sarah_full_chain():
    c = Cutout(path=None, module="sarah", x=slice(-1, 0), y=slice(50, 51),
               time="2013-06-01", dx=0.05, dy=0.05)
    g = c.grid_desc
    T2 = len(g.time) * 2
    rng = np.random.default_rng(0)
    src_x, src_y = g.x, g.y
    times30 = pd.date_range("2013-06-01", periods=T2, freq="30min").values
    sis = rng.random((T2, len(src_y), len(src_x))) * 500
    sid = sis * 0.6
    sis[3, 0, 0] = np.nan  # dawn gap
    out = sarah.process_sarah(sis, sid, src_x, src_y, times30, c)
    assert out["influx_direct"][1].shape == (len(g.time), len(src_y), len(src_x))
    assert not np.isnan(out["influx_direct"][1]).any()
    assert np.all(out["influx_diffuse"][1] >= -1e-9)


def test_sarah_get_data_requires_arrays():
    c = Cutout(path=None, module="sarah", x=slice(-1, 0), y=slice(50, 51),
               time="2013-06-01", dx=0.05, dy=0.05)
    with pytest.raises(ValueError):
        sarah.get_data(c, "influx")


# ---------------------------------------------------------------- gebco
def test_gebco_height_ingest(tmp_path):
    from atlite_tpu.core.grid import Affine
    from atlite_tpu.gis.raster import Raster

    c = Cutout(path=None, module="gebco", x=slice(-2, 0), y=slice(50, 52),
               time="2013-01-01")
    # fine elevation raster at 0.05 deg with known constant blocks
    ny, nx = 60, 60
    data = np.ones((ny, nx)) * 100.0
    data[: ny // 2] = 300.0  # top half (north) higher
    r = Raster(data, Affine(0.05, 0, -2.2, 0, -0.05, 52.2), crs=4326,
               nodata=None)
    out = gebco.get_data(c, "height", gebco_raster=r)
    dims, h = out["height"]
    assert dims == ("y", "x")
    assert h.shape == c.shape
    # ascending y: northern rows (end) must be ~300
    assert h[-1].mean() > h[0].mean()
    assert np.isclose(h[0].mean(), 100.0, atol=5)
    assert np.isclose(h[-1].mean(), 300.0, atol=5)


def test_era5_netcdf_cf_packed_decoding(tmp_path):
    """r4 review: classic CDS NetCDF packs fields as int16 with
    scale_factor/add_offset/_FillValue — the era5 offline path must
    mask-and-scale, not hand packed integers to the converters."""
    import numpy as np

    from atlite_tpu.datasets.era5 import _open_raw
    from atlite_tpu.io import netcdf3

    T, NY, NX = 4, 3, 5
    rng = np.random.default_rng(0)
    t2m = rng.random((T, NY, NX)) * 30 + 270
    scale, offset = 0.001, 285.0
    packed = np.round((t2m - offset) / scale).astype(np.int16)
    packed[0, 0, 0] = -32767  # fill
    fn = tmp_path / "p.nc"
    netcdf3.write(
        fn, {"time": T, "latitude": NY, "longitude": NX},
        {
            "time": (("time",), np.arange(T, dtype="f8"),
                     {"units": "hours since 2013-01-01"}),
            "latitude": (("latitude",), np.linspace(52, 50, NY), {}),
            "longitude": (("longitude",), np.linspace(0, 4, NX), {}),
            "t2m": (("time", "latitude", "longitude"), packed,
                    {"scale_factor": scale, "add_offset": offset,
                     "_FillValue": np.int16(-32767)}),
        })
    fields, coords = _open_raw(fn)
    got = fields["t2m"]
    assert np.isnan(got[0, -1, 0])  # fill -> NaN (y flipped ascending)
    m = ~np.isnan(got)
    expect = packed.astype(np.float64) * scale + offset
    np.testing.assert_allclose(got[m], expect[::1, ::-1][m], atol=1e-9)


def test_era5_concat_refuses_mixed_grids(tmp_path):
    """Same-shape files over shifted areas must refuse, not silently land
    on the first file's coordinates."""
    import numpy as np
    import pytest

    from atlite_tpu.datasets.era5 import _concat_time

    c0 = {"x": np.linspace(0, 4, 5), "y": np.linspace(50, 52, 3),
          "time": np.array(["2013-01-01"], dtype="datetime64[ns]")}
    c1 = dict(c0, x=np.linspace(10, 14, 5),
              time=np.array(["2013-01-02"], dtype="datetime64[ns]"))
    f = {"t2m": np.ones((1, 3, 5))}
    with pytest.raises(ValueError, match="different x lattice"):
        _concat_time([(f, c0), (f, c1)])
    with pytest.raises(ValueError, match="different variable sets"):
        _concat_time([(f, c0), ({"ssrd": np.ones((1, 3, 5))}, dict(c0))])
