"""GeoTIFF reader/writer roundtrip and decoder paths."""

import numpy as np
import pytest

from atlite_tpu.core.grid import Affine
from atlite_tpu.gis.geotiff import read_geotiff, write_geotiff, _lzw_decode, _packbits_decode
from atlite_tpu.gis.raster import Raster


@pytest.mark.parametrize("dtype", [np.uint8, np.int16, np.uint16, np.int32,
                                   np.float32, np.float64])
@pytest.mark.parametrize("compression", ["deflate", "none"])
def test_roundtrip(tmp_path, dtype, compression):
    rng = np.random.default_rng(0)
    if np.issubdtype(dtype, np.floating):
        data = rng.random((37, 53)).astype(dtype)
    else:
        data = rng.integers(0, 100, (37, 53)).astype(dtype)
    r = Raster(data, Affine(0.01, 0, -4.2, 0, -0.01, 62.2), crs=3035, nodata=255)
    path = tmp_path / "t.tif"
    write_geotiff(r, path, compression=compression)
    r2 = read_geotiff(path)
    np.testing.assert_array_equal(r2.data, data)
    assert r2.crs == 3035
    np.testing.assert_allclose(tuple(r2.transform), tuple(r.transform), atol=1e-12)
    assert r2.nodata == 255


def test_raster_open_dispatches(tmp_path):
    data = np.arange(12, dtype=np.uint8).reshape(3, 4)
    r = Raster(data, Affine(1, 0, 0, 0, -1, 3), crs=4326, nodata=255)
    path = tmp_path / "x.tif"
    write_geotiff(r, path)
    r2 = Raster.open(path)
    np.testing.assert_array_equal(r2.data, data)


def test_exclusion_with_geotiff(tmp_path, cutout):
    """GeoTIFF raster drives an exclusion analysis end-to-end."""
    from atlite_tpu import ExclusionContainer
    from atlite_tpu.gis.exclusion import shape_availability
    from atlite_tpu.gis.geometry import box
    from atlite_tpu.gis.raster import padded_transform_and_shape

    transform, shape = padded_transform_and_shape((-4, 56, 1.5, 61), 0.01)
    rng = np.random.default_rng(0)
    mask = (rng.random(shape) < 0.25).astype(np.uint8)
    path = tmp_path / "excl.tif"
    write_geotiff(Raster(mask, transform, 4326, nodata=255), path)

    excluder = ExclusionContainer(4326, res=0.01)
    excluder.add_raster(path)
    masked, _ = shape_availability([box(-4, 56, 1.5, 61)], excluder,
                                   geometry_crs=4326)
    assert round(masked.sum() / masked.size, 2) == 0.75


def test_packbits_decode():
    # 3 literal bytes, then run of 4 x 0xAA
    encoded = bytes([2, 1, 2, 3, 253, 0xAA])
    assert _packbits_decode(encoded) == bytes([1, 2, 3]) + b"\xaa" * 4


def test_lzw_roundtrip_known():
    # decode a stream produced by a known-good encoder is hard to craft by
    # hand; instead verify CLEAR-code handling on a trivial stream:
    # 9-bit codes: CLEAR(256), 'A'(65), 'B'(66), EOI(257)
    def pack_codes(codes, bits=9):
        buf = 0
        nbits = 0
        out = bytearray()
        for c in codes:
            buf = (buf << bits) | c
            nbits += bits
            while nbits >= 8:
                out.append((buf >> (nbits - 8)) & 0xFF)
                nbits -= 8
        if nbits:
            out.append((buf << (8 - nbits)) & 0xFF)
        return bytes(out)

    data = pack_codes([256, 65, 66, 257])
    assert _lzw_decode(data) == b"AB"


def test_npz_roundtrip_none_nodata_and_tuple_crs(tmp_path):
    from atlite_tpu.gis.crs import normalize_crs

    # nodata=None is a normal state (shape_availability_reprojected
    # builds such Rasters) and must survive save/open
    r = Raster(np.ones((4, 5), np.float32), Affine(0.1, 0, 0, 0, -0.1, 1),
               4326, nodata=None)
    r.save(tmp_path / "a.npz")
    r2 = Raster.open(tmp_path / "a.npz")
    assert r2.nodata is None and r2.crs == 4326

    # parameterized projection keys round-trip exactly
    key = normalize_crs("+proj=utm +zone=33 +ellps=GRS80")
    r = Raster(np.ones((4, 5), np.uint8), Affine(100, 0, 0, 0, -100, 1e6),
               key, nodata=255)
    r.save(tmp_path / "b.npz")
    r2 = Raster.open(tmp_path / "b.npz")
    assert r2.crs == key and r2.nodata == 255.0

    # ints stay ints (registry/table lookups key on int EPSG codes)
    r = Raster(np.ones((2, 2), np.uint8), Affine(100, 0, 0, 0, -100, 0),
               3035, nodata=7)
    r.save(tmp_path / "c.npz")
    assert Raster.open(tmp_path / "c.npz").crs == 3035


def test_write_geotiff_refuses_non_epsg_crs(tmp_path):
    r = Raster(np.ones((3, 3), np.float32), Affine(100, 0, 0, 0, -100, 0),
               "cea", nodata=None)
    with pytest.raises(ValueError, match="EPSG"):
        write_geotiff(r, tmp_path / "x.tif")


def test_read_geotiff_user_defined_crs_raises(tmp_path):
    import struct

    r = Raster(np.ones((3, 3), np.uint8), Affine(0.1, 0, 0, 0, -0.1, 1),
               3035, nodata=255)
    write_geotiff(r, tmp_path / "x.tif")
    blob = (tmp_path / "x.tif").read_bytes()
    # patch the ProjectedCSTypeGeoKey value 3035 -> 32767 (user-defined)
    patched = blob.replace(struct.pack("<H", 3035), struct.pack("<H", 32767))
    (tmp_path / "y.tif").write_bytes(patched)
    with pytest.raises(ValueError, match="user-defined"):
        read_geotiff(tmp_path / "y.tif")


def test_geometry_mask_accepts_geojson_dict():
    from atlite_tpu.gis.raster import geometry_mask

    gj = {"type": "Polygon",
          "coordinates": [[(0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 1.0),
                           (0.0, 0.0)]]}
    m = geometry_mask(gj, (10, 10), Affine(0.1, 0, 0, 0, -0.1, 1),
                      invert=True)
    assert m.all()  # the unit square covers the whole lattice


def test_bigtiff_read_vs_pillow(tmp_path):
    """BigTIFF (magic 43, 8-byte offsets, 20-byte IFD entries) reads —
    GEBCO-scale global rasters ship as BigTIFF; validated against
    Pillow-written files (deflate + uncompressed, u8/u16)."""
    PIL = pytest.importorskip("PIL.Image")

    from atlite_tpu.gis.geotiff import read_geotiff

    rng = np.random.default_rng(0)
    a = rng.integers(0, 200, (45, 37)).astype(np.uint8)
    fn = tmp_path / "big.tif"
    # NB: Pillow honors big_tiff only on its uncompressed writer (the
    # libtiff-compressed path silently emits classic TIFF)
    PIL.fromarray(a).save(fn, format="TIFF", big_tiff=True)
    assert fn.read_bytes()[2:4] in (b"\x2b\x00", b"\x00\x2b")
    np.testing.assert_array_equal(read_geotiff(fn).data, a)
    b = rng.integers(0, 60000, (30, 41)).astype(np.uint16)
    fn2 = tmp_path / "big16.tif"
    PIL.fromarray(b).save(fn2, format="TIFF", big_tiff=True)
    np.testing.assert_array_equal(read_geotiff(fn2).data, b)


def test_fp_predictor3_matches_pillow(tmp_path):
    """TIFF floating-point predictor (3, common on float elevation
    GeoTIFFs): our decode equals Pillow/libtiff's on a spec-crafted
    deflate file."""
    import io as _io
    import struct
    import zlib

    PIL = pytest.importorskip("PIL.Image")
    from atlite_tpu.gis.geotiff import read_geotiff

    h, w = 6, 7
    rng = np.random.default_rng(1)
    a = (rng.random((h, w)) * 1000 - 200).astype("<f4")

    def enc_row(row):
        arr = np.frombuffer(row.astype("<f4").tobytes(),
                            np.uint8).reshape(w, 4)
        streams = arr[:, ::-1].T.reshape(-1)  # MSB-first byte streams
        diff = np.diff(streams.astype(np.int16),
                       prepend=streams[:1].astype(np.int16)) % 256
        diff[0] = streams[0]
        return diff.astype(np.uint8).tobytes()

    comp = zlib.compress(b"".join(enc_row(a[r]) for r in range(h)))

    def tag(t, typ, cnt, vb):
        return struct.pack("<HHI", t, typ, cnt) + vb.ljust(4, b"\0")

    n = 11
    off_data = 8 + 2 + 12 * n + 4
    entries = [
        tag(256, 3, 1, struct.pack("<H", w)),
        tag(257, 3, 1, struct.pack("<H", h)),
        tag(258, 3, 1, struct.pack("<H", 32)),
        tag(259, 3, 1, struct.pack("<H", 8)),
        tag(262, 3, 1, struct.pack("<H", 1)),
        tag(273, 4, 1, struct.pack("<I", off_data)),
        tag(277, 3, 1, struct.pack("<H", 1)),
        tag(278, 3, 1, struct.pack("<H", h)),
        tag(279, 4, 1, struct.pack("<I", len(comp))),
        tag(317, 3, 1, struct.pack("<H", 3)),
        tag(339, 3, 1, struct.pack("<H", 3)),
    ]
    buf = (b"II*\0" + struct.pack("<I", 8) + struct.pack("<H", n)
           + b"".join(entries) + struct.pack("<I", 0) + comp)
    theirs = np.asarray(PIL.open(_io.BytesIO(buf)))
    np.testing.assert_array_equal(theirs, a)  # the fixture is right
    ours = read_geotiff(buf)
    np.testing.assert_array_equal(ours.data, a)
