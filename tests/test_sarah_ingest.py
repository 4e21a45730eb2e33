"""End-to-end SARAH archive ingest: the checked-in SARAH-format NETCDF4
fixtures (written by h5py with real archive conventions — dimension scales,
CF time, packed int16 with _FillValue night gaps) are discovered, decoded
with the in-repo HDF5 reader, processed, and land on the cutout grid.

The oracle decodes the same files with h5py directly — fully independent
of atlite_tpu.io.hdf5 — and reproduces the processing chain in plain
numpy (reference semantics: /root/reference/atlite/datasets/sarah.py).
"""

from pathlib import Path

import numpy as np
import pandas as pd
import pytest

from atlite_tpu import Cutout
from atlite_tpu.datasets import sarah

DATA = Path(__file__).parent / "data" / "sarah"

CUTOUT_KW = dict(
    x=slice(-4.95, -4.21), y=slice(56.05, 56.61),
    time=slice("2013-05-01", "2013-05-02 23:00"),
    dx=0.05, dy=0.05,
)


def h5py_decode(var):
    """Independent decode of the fixture archives (h5py, not our reader)."""
    h5py = pytest.importorskip("h5py")
    arrs, times = [], []
    lon = lat = None
    for p in sorted(DATA.glob(f"{var}in*.nc")):
        with h5py.File(p, "r") as f:
            raw = f[var][...].astype(np.float64)
            fill = f[var].attrs["_FillValue"]
            scale = f[var].attrs["scale_factor"]
            vals = np.where(raw == fill, np.nan, raw * scale)
            arrs.append(vals)
            times.append(f["time"][...])
            lon, lat = f["lon"][...], f["lat"][...]
    t = (np.concatenate(times).astype("datetime64[s]")
         .astype("datetime64[ns]"))
    order = np.argsort(t)
    return np.concatenate(arrs)[order], lon, lat, t[order]


def numpy_oracle():
    """Reference processing chain in plain numpy on the h5py decode."""
    sis, lon, lat, t = h5py_decode("SIS")
    sid, _, _, _ = h5py_decode("SID")

    def interp_nan(v):
        T = v.shape[0]
        out = v.reshape(T, -1).copy()
        tt = np.arange(T, dtype=float)
        for j in range(out.shape[1]):
            col = out[:, j]
            ok = ~np.isnan(col)
            if 0 < ok.sum() < T:
                out[:, j] = np.interp(tt, tt[ok], col[ok])
        return out.reshape(v.shape)

    sis, sid = interp_nan(sis), interp_nan(sid)
    sis = 0.5 * (sis[0::2] + sis[1::2])
    sid = 0.5 * (sid[0::2] + sid[1::2])
    times = pd.DatetimeIndex(t)[::2]
    # crop to the 15x12 cutout lattice (drops the easternmost column)
    return sis[:, :, :15], sid[:, :, :15], lon[:15], lat, times


def test_get_filenames_discovery():
    idx = pd.date_range("2013-05-01", periods=48, freq="h")
    files = sarah.get_filenames(DATA, idx)
    assert list(files.columns) == ["sis", "sid"]
    assert len(files) == 2
    assert files.index[0] == pd.Timestamp("2013-05-01")
    # span filter: a one-day index selects one file pair
    one = sarah.get_filenames(DATA, idx[:24])
    assert len(one) == 1


def test_missing_dir_raises(tmp_path):
    with pytest.raises(FileNotFoundError, match="No files found"):
        sarah.get_filenames(tmp_path, pd.date_range("2013", periods=2, freq="h"))


def test_sarah_archive_prepare_matches_independent_decode():
    c = Cutout(path=None, module="sarah", sarah_dir=str(DATA), **CUTOUT_KW)
    c.prepare()
    sis, sid, lon, lat, times = numpy_oracle()
    assert np.allclose(c.grid_desc.x, lon) and np.allclose(c.grid_desc.y, lat)
    assert (c.grid_desc.time_index == times).all()
    np.testing.assert_allclose(
        np.asarray(c.data["influx_direct"]), sid, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(c.data["influx_diffuse"]), sis - sid, rtol=1e-6, atol=1e-6)
    # diffuse = SIS - SID must be non-negative by fixture construction
    assert (np.asarray(c.data["influx_diffuse"]) >= -1e-9).all()


def test_sarah_interpolate_false_fills_zero():
    c = Cutout(path=None, module="sarah", sarah_dir=str(DATA),
               sarah_interpolate=False, **CUTOUT_KW)
    c.prepare()
    vals = np.asarray(c.data["influx_direct"])
    assert np.isfinite(vals).all()
    # night hours are exactly zero (fillna(0), reference sarah.py:219)
    assert (vals[0] == 0.0).all()  # midnight


def test_sarah_regrid_to_coarser_cutout():
    c = Cutout(path=None, module="sarah", sarah_dir=str(DATA),
               x=slice(-4.9, -4.31), y=slice(56.1, 56.51),
               time=slice("2013-05-01", "2013-05-01 23:00"),
               dx=0.1, dy=0.1)
    c.prepare()
    vals = np.asarray(c.data["influx_direct"])
    assert vals.shape == (24, len(c.grid_desc.y), len(c.grid_desc.x))
    assert np.isfinite(vals).all() and vals.max() > 50.0


def test_sarah_pv_runs_on_archive_cutout():
    # sarah provides direct/diffuse + solar position; synthetic fills
    # influx_toa/albedo and temperature (the reference stacks sarah+era5
    # the same way, test/conftest.py:141-170)
    c = Cutout(path=None, module=["sarah", "synthetic"], sarah_dir=str(DATA),
               **CUTOUT_KW)
    c.prepare(features=["influx", "temperature"])
    # sarah's values survive the synthetic merge (missing-vars-only write)
    sis, sid, *_ = numpy_oracle()
    np.testing.assert_allclose(
        np.asarray(c.data["influx_direct"]), sid, rtol=1e-6, atol=1e-6)
    pv = c.pv(panel="CSi", orientation="latitude_optimal", aggregate_time="mean")
    vals = np.asarray(pv.values)
    assert np.isfinite(vals).all()
    assert 0.0 < float(vals.mean()) < 0.5


def test_stacked_module_priority_survives_overwrite():
    # overwrite=True re-prepares everything, but within ONE prepare()
    # call a later module must still not clobber variables an earlier
    # (higher-priority) module just provided
    c = Cutout(path=None, module=["sarah", "synthetic"], sarah_dir=str(DATA),
               **CUTOUT_KW)
    c.prepare(features=["influx", "temperature"])
    c.prepare(features=["influx", "temperature"], overwrite=True)
    sis, sid, *_ = numpy_oracle()
    np.testing.assert_allclose(
        np.asarray(c.data["influx_direct"]), sid, rtol=1e-6, atol=1e-6)


def test_sarah_misaligned_sid_raises(monkeypatch):
    real_open = sarah.open_archive

    def shifted(paths, var, extent):
        arr, lon, lat, times = real_open(paths, var, extent)
        if var == "SID":
            times = times + np.timedelta64(30, "m")
        return arr, lon, lat, times

    monkeypatch.setattr(sarah, "open_archive", shifted)
    c = Cutout(path=None, module="sarah", sarah_dir=str(DATA), **CUTOUT_KW)
    with pytest.raises(ValueError, match="misaligned time stamps"):
        c.prepare()
