"""Self-contained NetCDF IO: netcdf3 codec vs the scipy oracle, the pure-
Python HDF5 (NETCDF4) reader vs h5py fixtures, Cutout .nc interop and the
legacy-directory migration (reference cutout.py:149-201, utils.py:39-101)."""

import numpy as np
import pandas as pd
import pytest

from atlite_tpu import Cutout
from atlite_tpu.io import netcdf3
from atlite_tpu.io.netcdf import read_netcdf, write_netcdf

h5py = pytest.importorskip("h5py")
from scipy.io import netcdf_file  # noqa: E402


def _sample_vars():
    tvals = np.arange(5, dtype=np.float64) * 3600
    data = np.arange(60, dtype=np.float32).reshape(5, 3, 4)
    dims = {"time": 5, "y": 3, "x": 4}
    variables = {
        "time": (("time",), tvals, {"units": "hours since 1950-01-01"}),
        "y": (("y",), np.array([1.0, 2.0, 3.0]), {}),
        "x": (("x",), np.array([10.0, 11.0, 12.0, 13.0]), {}),
        "temperature": (("time", "y", "x"), data, {"units": "K"}),
        "height": (("y", "x"), np.ones((3, 4)), {}),
    }
    return dims, variables, tvals, data


# ------------------------------------------------------------- netcdf3
@pytest.mark.parametrize("version", [1, 2])
def test_netcdf3_write_scipy_reads(tmp_path, version):
    dims, variables, tvals, data = _sample_vars()
    fn = tmp_path / "t.nc"
    netcdf3.write(fn, dims, variables, attrs={"module": "era5", "n": 3},
                  record_dim="time", version=version)
    f = netcdf_file(fn, "r", mmap=False)
    assert f.module.decode() == "era5"
    assert int(f.n) == 3
    np.testing.assert_array_equal(f.variables["temperature"][:], data)
    np.testing.assert_array_equal(f.variables["time"][:], tvals)
    np.testing.assert_array_equal(f.variables["height"][:], np.ones((3, 4)))
    assert f.variables["temperature"].units.decode() == "K"


def test_netcdf3_scipy_writes_we_read(tmp_path):
    fn = tmp_path / "s.nc"
    g = netcdf_file(fn, "w")
    g.createDimension("time", None)
    g.createDimension("y", 3)
    g.history = b"made by scipy"
    vt = g.createVariable("time", ">f8", ("time",))
    vt[:] = np.arange(7.0)
    vv = g.createVariable("v", ">i2", ("time", "y"))
    vv[:] = np.arange(21, dtype=np.int16).reshape(7, 3)
    vf = g.createVariable("fix", ">f4", ("y",))
    vf[:] = [9, 8, 7]
    vf.units = b"m"
    g.close()
    dims, vars_, attrs = netcdf3.read(fn)
    assert dims == {"time": 7, "y": 3}
    np.testing.assert_array_equal(vars_["v"][1], np.arange(21).reshape(7, 3))
    np.testing.assert_array_equal(vars_["time"][1], np.arange(7.0))
    np.testing.assert_array_equal(vars_["fix"][1], [9, 8, 7])
    assert attrs["history"] == "made by scipy"
    assert vars_["fix"][2]["units"] == "m"


def test_netcdf3_single_record_var_no_padding(tmp_path):
    # the classic format's special case: a single record variable packs
    # records without 4-byte padding
    fn = tmp_path / "r.nc"
    g = netcdf_file(fn, "w")
    g.createDimension("t", None)
    v = g.createVariable("a", ">i2", ("t",))
    v[:] = np.arange(5, dtype=np.int16)
    g.close()
    _, vars_, _ = netcdf3.read(fn)
    np.testing.assert_array_equal(vars_["a"][1], np.arange(5))

    fn2 = tmp_path / "w.nc"
    netcdf3.write(fn2, {"t": 5},
                  {"a": (("t",), np.arange(5, dtype=np.int16), {})},
                  record_dim="t")
    f = netcdf_file(fn2, "r", mmap=False)
    np.testing.assert_array_equal(f.variables["a"][:], np.arange(5))


def test_cf_time_roundtrip(tmp_path):
    fn = tmp_path / "t.nc"
    times = pd.date_range("2013-01-01", periods=30, freq="h").values
    write_netcdf(fn, {"time": 30}, {"time": (("time",), times, {})})
    _, vars_, _ = read_netcdf(fn)
    np.testing.assert_array_equal(vars_["time"][1], times)


# ----------------------------------------------------------------- hdf5
def _h5_cutout_fixture(fn, libver=None, y_desc=False, coord_names=("y", "x")):
    rng = np.random.default_rng(0)
    T, NY, NX = 6, 4, 5
    yvals = np.linspace(56, 59, NY)
    if y_desc:
        yvals = yvals[::-1]
    kw = {"libver": libver} if libver else {}
    with h5py.File(fn, "w", **kw) as f:
        f.attrs["module"] = "synthetic"
        f.attrs["prepared_features"] = ["wind", "influx"]
        t = f.create_dataset("time", data=np.arange(T, dtype="f8"))
        t.make_scale("time")
        t.attrs["units"] = "hours since 2013-01-01"
        y = f.create_dataset(coord_names[0], data=yvals)
        y.make_scale(coord_names[0])
        x = f.create_dataset(coord_names[1], data=np.linspace(-3, 0, NX))
        x.make_scale(coord_names[1])
        wnd = rng.random((T, NY, NX)).astype("f4") * 10 + 2
        d = f.create_dataset("wnd100m", data=wnd, chunks=(3, NY, NX),
                             compression="gzip", shuffle=True)
        d.dims[0].attach_scale(t)
        d.dims[1].attach_scale(y)
        d.dims[2].attach_scale(x)
        d.attrs["module"] = "synthetic"
        d.attrs["feature"] = "wind"
        r = f.create_dataset("roughness", data=np.full((T, NY, NX), 0.1, "f4"))
        r.dims[0].attach_scale(t)
        r.dims[1].attach_scale(y)
        r.dims[2].attach_scale(x)
        r.attrs["module"] = "synthetic"
        r.attrs["feature"] = "wind"
    return wnd, yvals


def test_hdf5_reader_vs_h5py(tmp_path):
    fn = tmp_path / "h.nc"
    rng = np.random.default_rng(1)
    big = rng.random((40, 17, 23)).astype("f8")  # multi-chunk b-tree
    with h5py.File(fn, "w") as f:
        f.attrs["s"] = "hello"
        f.attrs["i"] = np.int64(-7)
        f.attrs["farr"] = np.array([1.5, -2.5, 3.5])
        f.create_dataset("contig", data=np.arange(12, dtype="i4").reshape(3, 4))
        f.create_dataset("chunked", data=big, chunks=(7, 5, 6),
                         compression="gzip", compression_opts=6, shuffle=True)
        f.create_dataset("scalarish", data=np.float32(2.25))
    from atlite_tpu.io import hdf5

    out, attrs, _ = hdf5.read(fn)
    assert attrs["s"] == "hello" and attrs["i"] == -7
    np.testing.assert_array_equal(attrs["farr"], [1.5, -2.5, 3.5])
    np.testing.assert_array_equal(out["contig"][0],
                                  np.arange(12).reshape(3, 4))
    np.testing.assert_array_equal(out["chunked"][0], big)
    assert out["scalarish"][0].reshape(()).item() == 2.25


def test_hdf5_v2_object_headers(tmp_path):
    fn = tmp_path / "h2.nc"
    rng = np.random.default_rng(2)
    a = rng.random((9, 8)).astype("f4")
    with h5py.File(fn, "w", libver="latest") as f:
        f.attrs["k"] = "v2-headers"
        f.create_dataset("a", data=a, chunks=(4, 8), compression="gzip")
    from atlite_tpu.io import hdf5

    out, attrs, _ = hdf5.read(fn)
    assert attrs["k"] == "v2-headers"
    np.testing.assert_array_equal(out["a"][0], a)


def test_hdf5_netcdf4_dimension_scales(tmp_path):
    fn = tmp_path / "c.nc"
    wnd, _ = _h5_cutout_fixture(fn)
    from atlite_tpu.io import hdf5

    dims, variables, attrs = hdf5.read_netcdf4(fn)
    assert dims["time"] == 6 and dims["y"] == 4 and dims["x"] == 5
    assert variables["wnd100m"][0] == ("time", "y", "x")
    np.testing.assert_array_equal(variables["wnd100m"][1], wnd)
    assert attrs["module"] == "synthetic"
    assert list(attrs["prepared_features"]) == ["wind", "influx"]


# ---------------------------------------------------------- hdf5 writer
def test_hdf5_writer_vs_h5py(tmp_path):
    """Our netCDF4 writer's output opens in h5py with compressed chunks,
    attached dimension scales and intact values/attrs (the reference's
    on-disk cutout format, reference data.py:245-261)."""
    from atlite_tpu.io.hdf5_write import write_netcdf4

    rng = np.random.default_rng(0)
    T, NY, NX = 40, 7, 9
    data = rng.random((T, NY, NX)).astype("f4")
    hgt = rng.random((NY, NX))
    fn = tmp_path / "w.nc"
    write_netcdf4(
        fn, {"time": T, "y": NY, "x": NX, "extra": 3},
        {
            "time": (("time",), np.arange(T, dtype="i8"),
                     {"units": "hours since 2013-01-01"}),
            "y": (("y",), np.linspace(50, 56, NY), {}),
            "x": (("x",), np.linspace(-3, 5, NX), {}),
            "wnd100m": (("time", "y", "x"), data,
                        {"module": "era5", "feature": "wind"}),
            "height": (("y", "x"), hgt, {"units": "m"}),
            "scalarv": ((), np.float64(3.5), {}),
        },
        {"module": "era5", "prepared_features": ["wind", "influx"], "n": 3},
        chunks={"wnd100m": (16, NY, NX)},
    )
    with h5py.File(fn, "r") as f:
        d = f["wnd100m"]
        assert d.compression == "gzip" and d.compression_opts == 4
        assert d.chunks == (16, NY, NX)
        np.testing.assert_array_equal(d[:], data)
        np.testing.assert_array_equal(f["height"][:], hgt)
        np.testing.assert_array_equal(f["time"][:], np.arange(T))
        assert f["time"].attrs["units"] == b"hours since 2013-01-01"
        assert [dd[0].name for dd in d.dims] == ["/time", "/y", "/x"]
        assert f.attrs["module"] == b"era5"
        assert list(f.attrs["prepared_features"]) == [b"wind", b"influx"]
        assert f.attrs["n"] == 3
        assert f["scalarv"][()] == 3.5
        assert f["extra"].shape == (3,)  # phony dimension
    # round-trips through our own reader
    from atlite_tpu.io import hdf5

    dims, variables, attrs = hdf5.read_netcdf4(fn)
    assert dims == {"time": T, "y": NY, "x": NX, "extra": 3}
    assert variables["wnd100m"][0] == ("time", "y", "x")
    np.testing.assert_array_equal(variables["wnd100m"][1], data)
    assert variables["wnd100m"][2]["feature"] == "wind"
    assert list(attrs["prepared_features"]) == ["wind", "influx"]


def test_hdf5_writer_multilevel_btree_and_snods(tmp_path):
    """>64 chunks forces a 2-level v1 chunk b-tree; >8 datasets force
    multiple SNODs in the group b-tree; shuffle filter round-trips."""
    from atlite_tpu.io import hdf5
    from atlite_tpu.io.hdf5_write import write_netcdf4

    rng = np.random.default_rng(1)
    T, NY, NX = 300, 5, 6
    dims = {"time": T, "y": NY, "x": NX}
    variables = {
        "time": (("time",), np.arange(T, dtype="f8"), {}),
        "y": (("y",), np.arange(NY, dtype="f8"), {}),
        "x": (("x",), np.arange(NX, dtype="f8"), {}),
    }
    arrays = {}
    for i in range(14):
        a = rng.standard_normal((T, NY, NX)).astype("f4" if i % 2 else "f8")
        arrays[f"var{i:02d}"] = a
        variables[f"var{i:02d}"] = (("time", "y", "x"), a, {})
    fn = tmp_path / "m.nc"
    write_netcdf4(fn, dims, variables, {}, shuffle=True,
                  chunks={n: (2, NY, NX) for n in arrays})
    with h5py.File(fn, "r") as f:
        for n, a in arrays.items():
            np.testing.assert_array_equal(f[n][:], a)
        assert f["var00"].shuffle
    _, v2, _ = hdf5.read_netcdf4(fn)
    for n, a in arrays.items():
        np.testing.assert_array_equal(v2[n][1], a)


def test_hdf5_zstd_filter_roundtrip(tmp_path):
    """HDF5 filter 32015 (zstd, via the libzstd ctypes binding) decodes —
    new-CDS NetCDF4 increasingly ships with it (CONFORMANCE residual
    risk 5); unknown filter ids fail naming the dataset and filter."""
    from atlite_tpu.io import hdf5, zstd
    from atlite_tpu.io.hdf5_write import write_netcdf4

    if not zstd.available():
        pytest.skip("libzstd not present")
    rng = np.random.default_rng(0)
    data = rng.random((20, 6, 7)).astype("f4")
    fn = tmp_path / "z.nc"
    write_netcdf4(fn, {"t": 20, "y": 6, "x": 7},
                  {"t": (("t",), np.arange(20.0), {}),
                   "v": (("t", "y", "x"), data, {})},
                  {}, compression="zstd", shuffle=True, chunks={"v": (8, 6, 7)})
    dims, vars_, _ = hdf5.read_netcdf4(fn)
    np.testing.assert_array_equal(vars_["v"][1], data)
    # zstd round-trip at the binding level
    blob = bytes(rng.integers(0, 10, 5000).astype(np.uint8))
    assert zstd.decompress(zstd.compress(blob, 5), len(blob)) == blob
    # unknown filter id -> clean error naming dataset + filter
    raw = bytearray(fn.read_bytes())
    idx = raw.find((32015).to_bytes(2, "little"))
    raw[idx:idx + 2] = (31900).to_bytes(2, "little")
    with pytest.raises(NotImplementedError, match="dataset 'v'.*31900"):
        hdf5.read_netcdf4(bytes(raw))


def test_hdf5_szip_filter_vs_h5py(tmp_path):
    """HDF5 filter 4 (szip via the libsz ctypes binding) decodes
    libhdf5-written chunks — NN and EC modes, edge chunks, 2-D/3-D;
    older NCEP/NASA NetCDF4 archives ship with it."""
    from atlite_tpu.io import hdf5, szip

    if not szip.available():
        pytest.skip("libsz not present")
    if not h5py.h5z.filter_avail(4):
        pytest.skip("h5py lacks szip (no oracle)")
    rng = np.random.default_rng(0)
    a = (rng.random((64, 64)) * 1000).astype("i4")
    b = rng.random((40, 50)).astype("f4")
    c = rng.random((13, 7, 9)).astype("f8")
    fn = tmp_path / "sz.h5"
    with h5py.File(fn, "w") as f:
        f.create_dataset("a", data=a, chunks=(32, 32), compression="szip")
        f.create_dataset("b", data=b, chunks=(16, 25), compression="szip",
                         compression_opts=("ec", 8))
        f.create_dataset("c", data=c, chunks=(5, 4, 6), compression="szip")
    out, _, _ = hdf5.read(fn)
    np.testing.assert_array_equal(out["a"][0], a)
    np.testing.assert_array_equal(out["b"][0], b)
    np.testing.assert_array_equal(out["c"][0], c)


# --------------------------------------------------------- Cutout interop
def test_cutout_nc_roundtrip_and_convert(tmp_path):
    c = Cutout(path=None, module="synthetic", x=slice(-3, 0), y=slice(56, 59),
               time="2013-01-01")
    c.prepare()
    fn = tmp_path / "cut.nc"
    c.to_netcdf(fn)
    # default format IS the reference's: compressed netCDF4/HDF5 with the
    # reference's default prepare encodings ({"zlib": True, "complevel": 9,
    # "shuffle": True}, reference data.py:139)
    assert fn.read_bytes()[:8] == b"\x89HDF\r\n\x1a\n"
    with h5py.File(fn, "r") as f:
        assert f["wnd100m"].compression == "gzip"
        assert f["wnd100m"].compression_opts == 9
        assert f["wnd100m"].shuffle
    c2 = Cutout(fn)
    assert c2.prepared
    assert c2.shape == c.shape
    np.testing.assert_allclose(np.asarray(c2.data["wnd100m"]),
                               np.asarray(c.data["wnd100m"]), rtol=1e-6)
    w1 = c.wind("Vestas_V112_3MW", aggregate_time=None)
    w2 = c2.wind("Vestas_V112_3MW", aggregate_time=None)
    np.testing.assert_allclose(np.asarray(w2.values), np.asarray(w1.values),
                               rtol=1e-5)
    # byte-stable rewrite
    fn2 = tmp_path / "cut2.nc"
    c2.to_netcdf(fn2)
    c2.to_netcdf(tmp_path / "cut3.nc")
    assert (tmp_path / "cut2.nc").read_bytes() == (tmp_path / "cut3.nc").read_bytes()


def test_cutout_loads_reference_style_netcdf4(tmp_path):
    """A NETCDF4/HDF5 cutout as the reference stack writes it (dimension
    scales, vlen-string prepared_features, per-variable module/feature
    attrs, descending latitude) loads and converts."""
    fn = tmp_path / "ref.nc"
    wnd, yvals = _h5_cutout_fixture(fn, y_desc=True)
    c = Cutout(fn)
    g = c.grid_desc
    assert g.y[0] < g.y[-1]  # normalized ascending
    # y was flipped: row 0 of the stored (descending) array is the TOP
    np.testing.assert_array_equal(np.asarray(c.data["wnd100m"])[:, ::-1, :], wnd)
    feats = set(c.prepared_features.index.get_level_values("feature"))
    assert feats == {"wind"}
    out = c.wind(turbine="Vestas_V112_3MW", aggregate_time=None)
    vals = np.asarray(out.values)
    assert vals.shape == (6, 4, 5)
    assert np.all(np.isfinite(vals)) and vals.max() > 0


def test_cutout_loads_lon_lat_named_coords(tmp_path):
    fn = tmp_path / "ll.nc"
    _h5_cutout_fixture(fn, coord_names=("lat", "lon"))
    c = Cutout(fn)
    assert c.shape == (4, 5)


def test_prepare_writes_nc_cutout(tmp_path):
    fn = tmp_path / "p.nc"
    c = Cutout(fn, module="synthetic", x=slice(-3, 0), y=slice(56, 59),
               time="2013-01-01")
    c.prepare(features=["wind"])
    assert fn.exists()
    c2 = Cutout(fn)
    feats = set(c2.prepared_features.index.get_level_values("feature"))
    assert feats == {"wind"}
    c2.prepare()  # resume: fetch the rest
    assert c2.prepared
    c3 = Cutout(fn)
    assert c3.prepared


def test_cutout_to_netcdf3_format_option(tmp_path):
    """format='NETCDF3_64BIT' still emits CDF-2 for HDF5-less consumers;
    compression makes the default netCDF4 file smaller on smooth data."""
    c = Cutout(path=None, module="synthetic", x=slice(-3, 0), y=slice(56, 59),
               time="2013-01-01")
    c.prepare(features=["wind"])
    fn3 = tmp_path / "c3.nc"
    c.to_netcdf(fn3, format="NETCDF3_64BIT")
    assert fn3.read_bytes()[:3] == b"CDF"
    c3 = Cutout(fn3)
    fn4 = tmp_path / "c4.nc"
    c.to_netcdf(fn4)
    c4 = Cutout(fn4)
    np.testing.assert_allclose(np.asarray(c3.data["wnd100m"]),
                               np.asarray(c4.data["wnd100m"]), rtol=1e-6)
    assert fn4.stat().st_size < fn3.stat().st_size


# -------------------------------------------------------------- migration
def test_migrate_from_cutout_directory(tmp_path):
    from atlite_tpu.utils import migrate_from_cutout_directory

    old = tmp_path / "old-cutout"
    old.mkdir()
    base = Cutout(path=None, module="synthetic", x=slice(-3, 0),
                  y=slice(56, 59), time=slice("2013-01", "2013-02"))
    base.prepare(features=["wind"])
    T = len(base.grid_desc.time)
    jan = base.grid_desc.time_index.month == 1
    # meta.nc: coords + attrs only
    meta = Cutout(
        data={}, grid_desc=base.grid_desc,
        attrs={"module": "synthetic"}, var_attrs={},
    )
    meta.to_netcdf(old / "meta.nc")
    for sel, name in ((jan, "201301.nc"), (~jan, "201302.nc")):
        from atlite_tpu.core.grid import Grid

        part = Cutout(
            data={k: np.asarray(v)[sel] for k, v in base.data.items()},
            grid_desc=Grid(x=base.grid_desc.x, y=base.grid_desc.y,
                           time=base.grid_desc.time[sel], crs=4326),
            attrs={"module": "synthetic"}, var_attrs=base.var_attrs,
        )
        part.to_netcdf(old / name)

    migrated = migrate_from_cutout_directory(old, tmp_path / "new")
    assert (tmp_path / "new.nc").exists()
    assert len(migrated.grid_desc.time) == T
    np.testing.assert_allclose(np.asarray(migrated.data["wnd100m"]),
                               np.asarray(base.data["wnd100m"]), rtol=1e-6)


def test_write_netcdf3_with_scalar_variable(tmp_path):
    """A dimension-less variable (e.g. a CRS/grid-mapping scalar carried
    through from a NETCDF4 cutout) must not break the fixed/record
    variable ordering sort."""
    from atlite_tpu.io import netcdf3

    p = tmp_path / "s.nc"
    netcdf3.write(
        p, dims={"time": 3, "x": 2},
        variables={
            "time": (("time",), np.arange(3, dtype="float64"), {}),
            "crs": ((), np.float64(0.0), {"grid_mapping_name": "latlon"}),
            "v": (("time", "x"), np.ones((3, 2), np.float32), {}),
        },
        record_dim="time",
    )
    dims, variables, _ = netcdf3.read(p)
    assert variables["crs"][1].shape == ()
    np.testing.assert_allclose(variables["v"][1], 1.0)


def test_to_netcdf_roundtrip_keeps_multi_module(tmp_path, cutout):
    """A merged multi-module cutout's module=['a','b'] list survives the
    .nc round-trip (reload keys the datasets registry on it)."""
    from atlite_tpu import Cutout

    c = Cutout(path=None, data=dict(cutout.data),
               grid_desc=cutout.grid_desc,
               attrs={**cutout.attrs, "module": ["sarah", "synthetic"]},
               var_attrs=dict(cutout.var_attrs))
    fn = tmp_path / "mm.nc"
    c.to_netcdf(fn)
    c2 = Cutout(fn)
    assert list(np.atleast_1d(c2.module)) == ["sarah", "synthetic"]


def test_hdf5_writer_zero_length_dim_and_name_collision(tmp_path):
    """r4 review findings: a zero-length dimension must not hang the
    chunk b-tree builder, and a variable whose name collides with a
    dimension (but with different dims) must raise instead of silently
    dropping its data."""
    from atlite_tpu.io import hdf5
    from atlite_tpu.io.hdf5_write import write_netcdf4

    fn = tmp_path / "e.nc"
    write_netcdf4(fn, {"time": 0, "y": 2, "x": 2},
                  {"v": (("time", "y", "x"),
                         np.zeros((0, 2, 2), "f4"), {})}, {})
    dims, variables, _ = hdf5.read_netcdf4(fn)
    assert variables["v"][1].shape == (0, 2, 2)

    with pytest.raises(ValueError, match="collides with dimension"):
        write_netcdf4(tmp_path / "c.nc", {"time": 3, "y": 2, "x": 2},
                      {"time": (("y", "x"), np.ones((2, 2)), {})}, {})


def test_cf_calendar_and_netcdf3_shape_guards(tmp_path):
    """r4 IO-review findings: non-representable CF calendars stay
    UNDECODED (raw numbers kept) instead of silently drifting; netcdf3
    write validates shapes against dims."""
    from atlite_tpu.io.netcdf import decode_cf_time

    with pytest.raises(NotImplementedError, match="calendar"):
        decode_cf_time([0.0, 1.0], "days since 2000-01-01", "360_day")
    fn = tmp_path / "cal.nc"
    netcdf3.write(fn, {"time": 3},
                  {"time": (("time",), np.arange(3.0),
                            {"units": "days since 2000-01-01",
                             "calendar": "360_day"})})
    _, vars_, _ = read_netcdf(fn)
    assert vars_["time"][1].dtype.kind == "f"  # left raw
    assert vars_["time"][2]["units"] == "days since 2000-01-01"

    with pytest.raises(ValueError, match="does not match dims"):
        netcdf3.write(tmp_path / "bad.nc", {"t": 10, "y": 2},
                      {"v": (("t", "y"), np.ones((8, 2)), {})},
                      record_dim="t")


def test_hdf5_netcdf4_square_variable_distinct_dims(tmp_path):
    """r4 IO-review finding: the shape-match fallback must not assign the
    same dimension name to both axes of a square variable."""
    from atlite_tpu.io import hdf5

    with h5py.File(tmp_path / "sq.h5", "w") as f:
        f.create_dataset("a", data=np.ones((4, 4)))  # no dimension scales
    dims, variables, _ = hdf5.read_netcdf4(tmp_path / "sq.h5")
    dn = variables["a"][0]
    assert len(set(dn)) == 2, dn


def test_unpack_cf_masks_both_fill_codes():
    """r4 final review: _FillValue AND missing_value must both become
    NaN (the nested pop masked only one), and untagged-GeoTIFF-style
    nodata=None rasters still produce numeric projected masks."""
    from atlite_tpu.io.netcdf import unpack_cf

    a = np.array([100, -32767, -32766, 200], dtype=np.int16)
    out, attrs = unpack_cf(a, {"_FillValue": np.int16(-32767),
                               "missing_value": np.int16(-32766),
                               "scale_factor": 0.01, "add_offset": 300.0})
    assert np.isnan(out[1]) and np.isnan(out[2])
    np.testing.assert_allclose(out[[0, 3]], [301.0, 302.0])
    assert "missing_value" not in attrs and "_FillValue" not in attrs
