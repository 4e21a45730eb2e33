"""ERA5/ERA5T experiment-version (expver) merging.

Near-present CDS requests span two experiment versions: final ERA5
(expver "0001"/1) and preliminary ERA5T ("0005"/5).  GRIB downloads carry
both as separate message streams; old-layout NetCDF downloads carry an
``expver`` dimension with complementary NaNs.  Both layouts must decode
into one seamless (time, y, x) cube preferring final ERA5 — reference
/root/reference/atlite/datasets/era5.py:84-101, pinned by
/root/reference/test/test_preparation_and_conversion.py:524-555.
"""

import numpy as np
import pandas as pd
import pytest

from atlite_tpu.datasets import era5
from atlite_tpu.io import grib
from atlite_tpu.io.netcdf import write_netcdf

LATS = np.array([50.0, 50.25, 50.5])
LONS = np.array([-1.0, -0.75, -0.5, -0.25])


def _rec(short, t, value, expver=None):
    return {
        "shortName": short,
        "values": np.full((len(LATS), len(LONS)), value),
        "lats": LATS, "lons": LONS,
        "valid_time": np.datetime64(t), "expver": expver,
    }


def test_grib_expver_roundtrip(tmp_path):
    p = tmp_path / "ev.grib"
    p.write_bytes(grib.encode_grib1([_rec("t2m", "2024-05-01T00:00", 280.0,
                                          expver="0005")]))
    recs = grib.read(p)
    assert recs[0]["expver"] == "0005"
    np.testing.assert_allclose(recs[0]["values"], 280.0, rtol=1e-4)
    # records without a local section keep expver=None
    p2 = tmp_path / "plain.grib"
    p2.write_bytes(grib.encode_grib1([_rec("t2m", "2024-05-01T00:00", 280.0)]))
    assert grib.read(p2)[0]["expver"] is None
    # MARS expver is right-justified zero-padded: '1' must round-trip as
    # '0001' (the value the final-ERA5 merge preference matches on), not
    # '1000'
    p3 = tmp_path / "short.grib"
    p3.write_bytes(grib.encode_grib1([_rec("t2m", "2024-05-01T00:00", 280.0,
                                           expver="1")]))
    assert grib.read(p3)[0]["expver"] == "0001"


@pytest.mark.parametrize("order", ["era5_first", "era5t_first"])
def test_grib_dual_stream_prefers_final_era5(order):
    # hour 0: both streams (values differ) -> final ERA5 must win
    # hour 1: only ERA5T -> ERA5T fills the gap
    recs = [
        _rec("t2m", "2024-05-01T00:00", 111.0, expver="0001"),
        _rec("t2m", "2024-05-01T00:00", 999.0, expver="0005"),
        _rec("t2m", "2024-05-01T01:00", 222.0, expver="0005"),
    ]
    if order == "era5t_first":
        recs = recs[::-1]
    data, coords = grib.to_dataset(recs)
    vals = data["t2m"][1]
    assert vals.shape[0] == 2
    np.testing.assert_allclose(vals[0], 111.0, rtol=1e-4)
    np.testing.assert_allclose(vals[1], 222.0, rtol=1e-4)


def _expver_netcdf(path, shorts, T=6, overlap_hour=2):
    """Old-layout CDS NetCDF: (time, expver, latitude, longitude) with
    complementary NaNs; hours < overlap_hour are ERA5-only, the
    overlap_hour exists in both (different values), later hours are
    ERA5T-only."""
    times = pd.date_range("2024-05-01", periods=T, freq="h").values
    dims = {"time": T, "expver": 2, "latitude": len(LATS),
            "longitude": len(LONS)}
    variables = {
        "time": (("time",), times, {}),
        "expver": (("expver",), np.array([1, 5], dtype=np.int32), {}),
        "latitude": (("latitude",), LATS[::-1], {}),  # CDS descending lat
        "longitude": (("longitude",), LONS, {}),
    }
    expected = {}
    for i, s in enumerate(shorts):
        cube = np.full((T, 2, len(LATS), len(LONS)), np.nan)
        base = 200.0 + 10 * i
        for t in range(T):
            if t <= overlap_hour:
                cube[t, 0] = base + t          # final ERA5
            if t >= overlap_hour:
                cube[t, 1] = base + t + 0.5    # ERA5T (differs at overlap)
        variables[s] = (("time", "expver", "latitude", "longitude"), cube, {})
        exp = np.array([base + t if t <= overlap_hour else base + t + 0.5
                        for t in range(T)])
        expected[s] = exp
    write_netcdf(path, dims, variables)
    return expected, times


def test_netcdf_expver_dim_merges_seamlessly(tmp_path):
    p = tmp_path / "era5t.nc"
    expected, times = _expver_netcdf(p, ["t2m"])
    fields, coords = era5._open_raw(p)
    vals = fields["t2m"]
    assert vals.shape == (6, len(LATS), len(LONS))
    assert np.isfinite(vals).all(), "expver merge left NaN holes"
    np.testing.assert_allclose(vals[:, 0, 0], expected["t2m"], rtol=1e-12)


def test_prepare_from_expver_file_has_no_holes(tmp_path):
    from atlite_tpu import Cutout

    p = tmp_path / "era5t_temp.nc"
    _expver_netcdf(p, ["t2m", "stl4", "d2m"])
    c = Cutout(path=None, module="era5", era5_files=str(p),
               x=slice(-1.0, -0.25), y=slice(50.0, 50.5),
               time=slice("2024-05-01", "2024-05-01 05:00"),
               dx=0.25, dy=0.25)
    c.prepare(features=["temperature"])
    for v in ("temperature", "soil temperature", "dewpoint temperature"):
        assert np.isfinite(np.asarray(c.data[v])).all()
    # K -> degC conversion sees the merged (ERA5-preferred) values
    t = c.temperature(aggregate_time=None)
    np.testing.assert_allclose(
        np.asarray(t.values)[:, 0, 0],
        np.array([200.0, 201.0, 202.0, 203.5, 204.5, 205.5]) - 273.15,
        rtol=1e-6)
