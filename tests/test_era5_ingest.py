"""Real-format ERA5 ingest: the GRIB1 sample file -> prepared cutout ->
converters, with the decode validated against an INDEPENDENT struct-level
GRIB1 parser written here (separate from atlite_tpu.io.grib).

Mirrors the reference's CDS pipeline (datasets/era5.py:352-429,520-599):
GRIB decode, convention cleanup (descending latitude, J->W accumulation
conversion, -30 min solar position), variable derivations and sanitizers.
"""

import struct
from pathlib import Path

import numpy as np
import pandas as pd
import pytest

from atlite_tpu import Cutout
from atlite_tpu.io import grib

FIXTURE = Path(__file__).parent / "data" / "era5_sample.grib"

X0, X1, Y0, Y1 = -4.0, 1.5, 56.0, 62.0


# ---------------------------------------------------------------------------
# independent mini GRIB1 parser (spec-derived, no code shared with io.grib)
# ---------------------------------------------------------------------------
def _indep_grib1(buf):
    def sm(b):  # sign-magnitude int
        v = int.from_bytes(b, "big")
        top = 1 << (len(b) * 8 - 1)
        return -(v & (top - 1)) if v & top else v

    def ibm(b):
        w = struct.unpack(">I", b)[0]
        s = -1 if w >> 31 else 1
        return s * (w & 0xFFFFFF) / 2**24 * 16.0 ** (((w >> 24) & 0x7F) - 64)

    recs, pos = [], 0
    while pos < len(buf):
        assert buf[pos:pos + 4] == b"GRIB"
        total = int.from_bytes(buf[pos + 4:pos + 7], "big")
        p = pos + 8
        pds_len = int.from_bytes(buf[p:p + 3], "big")
        pds = buf[p:p + pds_len]
        table2, param = pds[3], pds[8]
        flags = pds[7]
        year = (pds[24] - 1) * 100 + pds[12]
        vt = np.datetime64(
            f"{year:04d}-{pds[13]:02d}-{pds[14]:02d}"
            f"T{pds[15]:02d}:{pds[16]:02d}") + np.timedelta64(pds[18], "h")
        dec = sm(pds[26:28])
        p += pds_len
        gds_len = int.from_bytes(buf[p:p + 3], "big")
        gds = buf[p:p + gds_len]
        ni = int.from_bytes(gds[6:8], "big")
        nj = int.from_bytes(gds[8:10], "big")
        lat1, lon1 = sm(gds[10:13]) / 1e3, sm(gds[13:16]) / 1e3
        lat2, lon2 = sm(gds[17:20]) / 1e3, sm(gds[20:23]) / 1e3
        p += gds_len
        bitmap = None
        if flags & 0x40:
            bms_len = int.from_bytes(buf[p:p + 3], "big")
            unused = buf[p + 3]
            nb = (bms_len - 6) * 8 - unused
            bits = np.unpackbits(
                np.frombuffer(buf[p + 6:p + bms_len], np.uint8))[:nb]
            bitmap = bits.astype(bool)
            p += bms_len
        bds_len = int.from_bytes(buf[p:p + 3], "big")
        e = sm(buf[p + 4:p + 6])
        ref = ibm(buf[p + 6:p + 10])
        nbits = buf[p + 10]
        npts = ni * nj if bitmap is None else int(bitmap[:ni * nj].sum())
        raw = np.unpackbits(np.frombuffer(buf[p + 11:p + bds_len], np.uint8))
        X = raw[:npts * nbits].reshape(npts, nbits) @ (
            1 << np.arange(nbits - 1, -1, -1, dtype=np.int64))
        vals = (ref + X * 2.0 ** e) * 10.0 ** (-dec)
        if bitmap is not None:
            full = np.full(ni * nj, np.nan)
            full[bitmap[:ni * nj]] = vals
            vals = full
        recs.append(dict(param=(table2, param), valid_time=vt,
                         values=vals.reshape(nj, ni),
                         lats=np.linspace(lat1, lat2, nj),
                         lons=np.linspace(lon1, lon2, ni)))
        pos += total
    return recs


def test_decoder_matches_independent_parser():
    buf = FIXTURE.read_bytes()
    ours = grib.read(buf)
    indep = _indep_grib1(buf)
    assert len(ours) == len(indep) == 313
    for a, b in zip(ours, indep):
        assert a["param"] == b["param"]
        assert np.datetime64(a["valid_time"], "m") == np.datetime64(
            b["valid_time"], "m")
        np.testing.assert_allclose(a["values"], b["values"], rtol=0,
                                   atol=1e-12, equal_nan=True)
        np.testing.assert_allclose(a["lats"], b["lats"], atol=1e-9)


@pytest.fixture(scope="module")
def era5_cutout(tmp_path_factory):
    path = tmp_path_factory.mktemp("era5") / "era5"
    c = Cutout(path, module="era5", x=slice(X0, X1), y=slice(Y0, Y1),
               time="2013-01-01", era5_files=str(FIXTURE))
    c.prepare()
    return c


def test_prepare_from_grib_matches_independent_derivation(era5_cutout):
    c = era5_cutout
    assert c.prepared
    raw = {}
    for r in _indep_grib1(FIXTURE.read_bytes()):
        raw.setdefault(r["param"], []).append(r)
    lats0 = next(iter(raw.values()))[0]["lats"]

    def stack(param):
        recs = sorted(raw[param], key=lambda r: r["valid_time"])
        a = np.stack([r["values"] for r in recs])
        return a[:, ::-1, :]  # file is descending lat; cutout ascending

    u100, v100 = stack((228, 246)), stack((228, 247))
    u10, v10 = stack((128, 165)), stack((128, 166))
    fsr = stack((128, 244))
    # wind derivations (reference era5.py:104-135)
    np.testing.assert_allclose(np.asarray(c.data["wnd100m"]),
                               np.hypot(u100, v100), rtol=2e-6)
    az = np.arctan2(u100, v100)
    az = np.where(az >= 0, az, az + 2 * np.pi)
    np.testing.assert_allclose(np.asarray(c.data["wnd_azimuth"]), az,
                               rtol=1e-5, atol=2e-6)
    shear = np.log(np.hypot(u10, v10) / np.hypot(u100, v100)) / np.log(10 / 100)
    np.testing.assert_allclose(np.asarray(c.data["wnd_shear_exp"]), shear,
                               rtol=2e-5, atol=1e-6)
    # roughness sanitize floor (era5.py:138-143): raw fixture has negatives
    assert fsr.min() < 0
    rough = np.asarray(c.data["roughness"])
    assert rough.min() >= 2e-4 - 1e-9
    np.testing.assert_allclose(rough[fsr >= 0], fsr[fsr >= 0], rtol=2e-6,
                               atol=1e-7)

    # influx: J m**-2 -> W m**-2, diffuse = ssrd - fdir, albedo (era5.py:146-190)
    ssrd, ssr = stack((128, 169)), stack((128, 176))
    fdir, tisr = stack((228, 21)), stack((128, 212))
    np.testing.assert_allclose(np.asarray(c.data["influx_toa"]),
                               np.clip(tisr / 3600.0, 0, None), rtol=1e-6,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(c.data["influx_direct"]),
                               np.clip(fdir / 3600.0, 0, None), rtol=1e-6,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(c.data["influx_diffuse"]),
                               np.clip((ssrd - fdir) / 3600.0, 0, None),
                               rtol=1e-5, atol=2e-1)
    with np.errstate(invalid="ignore"):
        albedo = np.nan_to_num((ssrd - ssr) / np.where(ssrd != 0, ssrd, np.nan))
    np.testing.assert_allclose(np.asarray(c.data["albedo"]), albedo,
                               rtol=1e-3, atol=5e-3)

    # temperature: plain renames (era5.py:204-230); NaN sea cells survive
    t2m, stl4 = stack((128, 167)), stack((128, 236))
    np.testing.assert_allclose(np.asarray(c.data["temperature"]), t2m,
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(c.data["soil temperature"]), stl4,
                               rtol=1e-6, equal_nan=True)
    assert np.isnan(np.asarray(c.data["soil temperature"])).any()

    # height = z / g0 (era5.py:65-81), static (y, x)
    z = raw[(128, 129)][0]["values"][::-1, :]
    assert np.asarray(c.data["height"]).shape == z.shape
    np.testing.assert_allclose(np.asarray(c.data["height"]), z / 9.80665,
                               rtol=1e-6)


def test_grib_cutout_runs_converters(era5_cutout):
    c = era5_cutout
    w = c.wind("Vestas_V112_3MW", aggregate_time=None)
    vals = np.asarray(w.values) / 3.06  # per-unit of the V112 peak
    assert vals.shape == (24, 25, 23)
    assert np.all(vals >= 0) and np.all(vals <= 1.0 + 1e-6) and vals.max() > 0
    p = c.pv("CSi", orientation="latitude_optimal", aggregate_time=None)
    pv_vals = np.asarray(p.values)
    assert np.all(np.isfinite(pv_vals)) and pv_vals.max() > 0


def test_prepare_resume_partial_grib(tmp_path):
    c = Cutout(tmp_path / "e2", module="era5", x=slice(X0, X1),
               y=slice(Y0, Y1), time="2013-01-01",
               era5_files=str(FIXTURE))
    c.prepare(features=["wind"])
    c2 = Cutout(tmp_path / "e2")
    feats = set(c2.prepared_features.index.get_level_values("feature"))
    assert feats == {"wind"}
    c2.prepare(features=["runoff"])
    assert "runoff" in c2.data


def test_era5_file_subset_mismatch_raises(tmp_path):
    c = Cutout(tmp_path / "bad", module="era5", x=slice(-30, -20),
               y=slice(Y0, Y1), time="2013-01-01",
               era5_files=str(FIXTURE))
    with pytest.raises(ValueError, match="does not cover"):
        c.prepare(features=["wind"])


def test_open_raw_squeezes_singleton_number_dim(tmp_path):
    """A singleton ensemble 'number' dimension is squeezed; a real one
    is refused (flipping/aligning the wrong axis would corrupt data)."""
    from atlite_tpu.datasets.era5 import _open_raw
    from atlite_tpu.io import netcdf3

    y = np.array([52.0, 51.75, 51.5])  # descending, as CDS delivers
    x = np.array([4.0, 4.25])
    t = np.array([0.0, 1.0])
    vals = np.arange(12, dtype=np.float64).reshape(2, 1, 3, 2)
    p = tmp_path / "n1.nc"
    netcdf3.write(
        p, dims={"time": 2, "number": 1, "latitude": 3, "longitude": 2},
        variables={
            "time": (("time",), t, {"units": "hours since 2013-01-01"}),
            "latitude": (("latitude",), y, {}),
            "longitude": (("longitude",), x, {}),
            "t2m": (("time", "number", "latitude", "longitude"),
                    vals.astype(np.float32), {}),
        })
    fields, coords = _open_raw(p)
    assert fields["t2m"].shape == (2, 3, 2)
    # ascending-y flip applied to the Y axis, not the squeezed one
    np.testing.assert_allclose(fields["t2m"][0, :, 0], [4.0, 2.0, 0.0])

    vals2 = np.zeros((2, 3, 3, 2), dtype=np.float32)
    p2 = tmp_path / "n3.nc"
    netcdf3.write(
        p2, dims={"time": 2, "number": 3, "latitude": 3, "longitude": 2},
        variables={
            "time": (("time",), t, {"units": "hours since 2013-01-01"}),
            "latitude": (("latitude",), y, {}),
            "longitude": (("longitude",), x, {}),
            "t2m": (("time", "number", "latitude", "longitude"), vals2, {}),
        })
    with pytest.raises(ValueError, match="unsupported dimension 'number'"):
        _open_raw(p2)


def test_era5_netcdf4_container_ingest(tmp_path):
    """New-CDS layout end-to-end: an HDF5-container NetCDF written by
    h5py (valid_time coord, descending latitude, CF-packed int16 fields)
    prepares a wind cutout and converts — the closest offline stand-in
    for real new-CDS bytes."""
    h5py = pytest.importorskip("h5py")

    rng = np.random.default_rng(0)
    T, NY, NX = 24, 5, 7
    lat = np.linspace(58.0, 57.0, NY)  # descending, as CDS delivers
    lon = np.linspace(-2.0, -0.5, NX)
    tvals = np.arange(T, dtype="i8")
    fields = {
        "u100": rng.random((T, NY, NX)) * 12 - 4,
        "v100": rng.random((T, NY, NX)) * 12 - 4,
        "u10": rng.random((T, NY, NX)) * 8 - 3,
        "v10": rng.random((T, NY, NX)) * 8 - 3,
        "fsr": rng.random((T, NY, NX)) * 0.5 + 0.01,
    }
    fn = tmp_path / "cds_new.nc"
    with h5py.File(fn, "w") as f:
        t = f.create_dataset("valid_time", data=tvals)
        t.make_scale("valid_time")
        t.attrs["units"] = "hours since 2013-06-01"
        la = f.create_dataset("latitude", data=lat)
        la.make_scale("latitude")
        lo = f.create_dataset("longitude", data=lon)
        lo.make_scale("longitude")
        for name, arr in fields.items():
            scale = float(np.ptp(arr) / 60000.0) or 1e-6
            offset = float(arr.min() + 30000 * scale)
            packed = np.round((arr - offset) / scale).astype("i2")
            d = f.create_dataset(name, data=packed, chunks=(12, NY, NX),
                                 compression="gzip")
            d.attrs["scale_factor"] = scale
            d.attrs["add_offset"] = offset
            d.attrs["_FillValue"] = np.int16(-32767)
            for i, s in enumerate((t, la, lo)):
                d.dims[i].attach_scale(s)
    c = Cutout(tmp_path / "cds_cut", module="era5",
               x=slice(-2.0, -0.5), y=slice(57.0, 58.0),
               time=slice("2013-06-01", "2013-06-01 23:00"),
               era5_files=str(fn))
    c.prepare(features=["wind"])
    wnd = np.asarray(c.data["wnd100m"])
    expect = np.sqrt(fields["u100"] ** 2 + fields["v100"] ** 2)[:, ::-1, :]
    np.testing.assert_allclose(wnd, expect, rtol=2e-3)  # packing precision
    out = c.wind("Vestas_V112_3MW", aggregate_time=None)
    assert np.isfinite(np.asarray(out.values)).all()
