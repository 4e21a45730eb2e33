"""GRIB codec units: round-trips, IBM floats, bitmaps, hand-built
byte-level goldens for GRIB1 and the GRIB2 complex-packing decoder."""

import struct

import numpy as np
import pytest

from atlite_tpu.io import grib


def _recs(nt=2, nbits=16):
    rng = np.random.default_rng(3)
    lats = np.linspace(60, 50, 11)
    lons = np.linspace(-5, 5, 9)
    out = []
    for name in ("u100", "t2m"):
        for h in range(nt):
            out.append(dict(
                shortName=name,
                values=rng.standard_normal((11, 9)) * 8 + 270,
                lats=lats, lons=lons, nbits=nbits,
                valid_time=np.datetime64("2013-06-01T00")
                + np.timedelta64(h, "h"),
            ))
    return out


@pytest.mark.parametrize("encode,edition", [(grib.encode_grib1, 1),
                                            (grib.encode_grib2, 2)])
def test_roundtrip_quantization_bounded(encode, edition):
    recs = _recs()
    out = grib.read(encode(recs))
    assert len(out) == len(recs)
    for a, b in zip(recs, out):
        assert b["edition"] == edition
        assert b["shortName"] == a["shortName"]
        assert b["valid_time"] == np.datetime64(a["valid_time"], "m")
        span = a["values"].max() - a["values"].min()
        tol = span / (2**16 - 1) * 1.01 + 1e-9
        np.testing.assert_allclose(b["values"], a["values"], atol=tol, rtol=0)
        np.testing.assert_allclose(b["lats"], a["lats"], atol=1e-6)
        np.testing.assert_allclose(b["lons"], a["lons"], atol=1e-6)


@pytest.mark.parametrize("encode", [grib.encode_grib1, grib.encode_grib2])
def test_bitmap_nan_roundtrip(encode):
    rng = np.random.default_rng(4)
    vals = rng.standard_normal((7, 6))
    vals[1:3, 2:5] = np.nan
    rec = dict(shortName="ro", values=vals, lats=np.linspace(55, 50, 7),
               lons=np.linspace(0, 5, 6),
               valid_time=np.datetime64("2013-06-02T03"))
    out = grib.read(encode([rec]))
    np.testing.assert_array_equal(np.isnan(out[0]["values"]), np.isnan(vals))
    span = np.nanmax(vals) - np.nanmin(vals)
    np.testing.assert_allclose(out[0]["values"], vals,
                               atol=span / 65535 * 1.01, equal_nan=True)


def test_ibm_float_codec():
    for x in (0.0, 1.0, -1.0, 273.15, 6.1e-5, -12345.678, 1e8):
        enc = grib._ibm32_encode(x)
        dec = grib._ibm32_decode(enc)
        assert abs(dec - x) <= abs(x) * 2**-20 + 1e-300, (x, dec)


def test_grib1_handbuilt_golden():
    """A GRIB1 message assembled field-by-field with struct (independent
    of the encoder): 2x2 grid of [[1.5, 2.5], [3.5, 4.5]] as t2m.

    ref=1.5, E=-1, D=0, nbits=8 -> X = (v-1.5)*2 = [0, 2, 4, 6]."""
    pds = bytearray(28)
    pds[0:3] = (28).to_bytes(3, "big")
    pds[3] = 128          # table2Version
    pds[4] = 98           # centre ECMWF
    pds[7] = 0x80         # GDS present
    pds[8] = 167          # t2m
    pds[9] = 1
    pds[12:17] = bytes([13, 6, 15, 12, 0])  # 2013-06-15T12:00 (yy=13)
    pds[17] = 1           # time unit: hours
    pds[18] = 1           # P1 = 1 -> valid 13:00
    pds[24] = 21          # century -> (21-1)*100 + 13 = 2013
    gds = bytearray(32)
    gds[0:3] = (32).to_bytes(3, "big")
    gds[4] = 255
    gds[5] = 0
    gds[6:8] = struct.pack(">H", 2)   # ni
    gds[8:10] = struct.pack(">H", 2)  # nj
    gds[10:13] = (50000).to_bytes(3, "big")   # lat1 50.0
    gds[13:16] = (0x800000 | 4000).to_bytes(3, "big")  # lon1 -4.0
    gds[16] = 0x80
    gds[17:20] = (49000).to_bytes(3, "big")   # lat2 49.0
    gds[20:23] = (0x800000 | 3000).to_bytes(3, "big")  # lon2 -3.0
    gds[23:25] = struct.pack(">H", 1000)
    gds[25:27] = struct.pack(">H", 1000)
    # BDS: ref = 1.5 as IBM float: 1.5 = 0.09375*16^(65-64) -> e=65,
    # m = 0.09375 * 2^24 = 1572864
    ibm_ref = struct.pack(">I", (65 << 24) | 1572864)
    data = bytes([0, 2, 4, 6])
    bds = ((11 + 4 + 1).to_bytes(3, "big") + bytes([8])  # 8 unused bits (pad)
           + struct.pack(">H", 0x8001)  # E = -1 sign-magnitude
           + ibm_ref + bytes([8]) + data + b"\x00")
    body = bytes(pds) + bytes(gds) + bds + b"7777"
    msg = b"GRIB" + (8 + len(body)).to_bytes(3, "big") + bytes([1]) + body

    (rec,) = grib.read(msg)
    assert rec["shortName"] == "t2m"
    assert rec["valid_time"] == np.datetime64("2013-06-15T13:00")
    np.testing.assert_allclose(rec["values"], [[1.5, 2.5], [3.5, 4.5]])
    np.testing.assert_allclose(rec["lats"], [50.0, 49.0])
    np.testing.assert_allclose(rec["lons"], [-4.0, -3.0])


def test_grib2_complex_packing_handbuilt():
    """Template 5.2 data assembled by hand: two groups
    [3,4,5,6] (ref 3, width 2) + [11,10,11] (ref 10, width 1)."""
    data = bytes([0x3A,        # refs [3, 10] at 4 bits
                  0x44,        # widths [2, 1] at 3 bits (padded)
                  0x00, 0x00,  # scaled lengths at 8 bits (last overridden)
                  0x1B,        # group 1 values [0,1,2,3] at 2 bits
                  0xA0])       # group 2 values [1,0,1] at 1 bit
    meta = dict(ndata=7, drs_template=2, nbits=4, ngroups=2,
                group_width_ref=0, group_width_bits=3,
                group_len_ref=4, group_len_inc=1, group_len_last=3,
                group_len_bits=8)
    out = grib._decode_complex(data, meta)
    np.testing.assert_array_equal(out, [3, 4, 5, 6, 11, 10, 11])


def test_grib2_spatial_differencing_handbuilt():
    """Template 5.3, order 2: descriptors h1=10, h2=12, gmin=0; packed
    second differences reconstruct [10, 12, 15, 19, 24, 30]."""
    data = bytes([0x00, 0x0A,  # h1 = 10
                  0x00, 0x0C,  # h2 = 12
                  0x00, 0x00,  # gmin = 0
                  0x00,        # group ref [0] at 4 bits
                  0x20,        # group width [1] at 3 bits
                  0x00,        # scaled length
                  0x3C])       # values [0,0,1,1,1,1] at 1 bit
    meta = dict(ndata=6, drs_template=3, nbits=4, ngroups=1,
                group_width_ref=0, group_width_bits=3,
                group_len_ref=6, group_len_inc=1, group_len_last=6,
                group_len_bits=8, spatial_order=2, spatial_desc_bytes=2)
    out = grib._decode_complex(data, meta)
    np.testing.assert_array_equal(out, [10, 12, 15, 19, 24, 30])


def test_mixed_editions_in_one_stream():
    recs = _recs(nt=1)
    blob = grib.encode_grib1(recs[:1]) + grib.encode_grib2(recs[1:2])
    out = grib.read(blob)
    assert [r["edition"] for r in out] == [1, 2]
    assert {r["shortName"] for r in out} == {"u100", "t2m"}


def test_to_dataset_orientation():
    recs = _recs(nt=3)
    data, coords = grib.to_dataset(grib.read(grib.encode_grib1(recs)))
    assert set(data) == {"u100", "t2m"}
    assert data["u100"][1].shape == (3, 11, 9)
    assert coords["y"][0] < coords["y"][-1]  # ascending after flip
    # flipped rows must match: file row 0 is lat 60 -> last y index
    np.testing.assert_allclose(data["u100"][1][0, -1],
                               grib.read(grib.encode_grib1(recs))[0]["values"][0],
                               atol=1e-9)


def test_grib2_template_48_interval_end_labelling(tmp_path):
    """Accumulated/mean products (GRIB2 product template 4.8 — what CDS
    emits for ERA5 fluxes) are labelled by the END of their interval
    (reference interval-end convention, era5.py:174-188)."""
    lats = np.array([50.0, 50.25])
    lons = np.array([-1.0, -0.75, -0.5])
    rec = {
        "shortName": "ssrd",
        "values": np.arange(6.0).reshape(2, 3) * 1000.0,
        "lats": lats, "lons": lons,
        "valid_time": np.datetime64("2024-05-01T13:00"),
        "interval_hours": 1,
    }
    raw = grib.encode_grib2([rec])
    out = grib.read(raw)
    assert len(out) == 1
    r = out[0]
    assert r["shortName"] == "ssrd"
    # labelled at interval END, not the reference (start) time
    assert np.datetime64(r["valid_time"], "m") == np.datetime64("2024-05-01T13:00")
    np.testing.assert_allclose(r["values"], rec["values"], rtol=1e-4, atol=0.1)
    # plain 4.0 records are unaffected
    rec2 = dict(rec, valid_time=np.datetime64("2024-05-01T13:00"))
    rec2.pop("interval_hours")
    r2 = grib.read(grib.encode_grib2([rec2]))[0]
    assert np.datetime64(r2["valid_time"], "m") == np.datetime64("2024-05-01T13:00")


def test_grib2_other_product_template_decodes_common_prefix(tmp_path):
    """Templates sharing the 4.0 octet prefix (4.1 ensemble etc.) must
    still decode — one exotic message must not abort the whole file
    (a CDS download can mix deterministic and ensemble products)."""
    rec = {
        "shortName": "t2m",
        "values": np.ones((2, 3)) * 280.0,
        "lats": np.array([50.0, 50.25]), "lons": np.array([-1.0, -0.75, -0.5]),
        "valid_time": np.datetime64("2024-05-01T13:00"),
    }
    raw = bytearray(grib.encode_grib2([rec]))
    # find section 4 (length 34, number 4) and stamp template 4.1
    idx = raw.find(bytes([0, 0, 0, 34, 4]))
    assert idx > 0
    raw[idx + 7:idx + 9] = (1).to_bytes(2, "big")
    out = grib.read(bytes(raw))
    assert len(out) == 1
    assert out[0]["shortName"] == "t2m"
    np.testing.assert_allclose(out[0]["values"], rec["values"], atol=1e-3)
    # templates that do NOT share the 4.0 octet layout must refuse
    # loudly — "decoding the prefix" would fabricate step/valid_time and
    # poison the shared time axis
    raw2 = bytearray(grib.encode_grib2([rec]))
    idx = raw2.find(bytes([0, 0, 0, 34, 4]))
    raw2[idx + 7:idx + 9] = (20).to_bytes(2, "big")  # 4.20 radar product
    with pytest.raises(NotImplementedError, match="product template"):
        grib.read(bytes(raw2))


# ------------------------------------------------------------ Gaussian grids
def test_gaussian_latitudes_vs_legendre_oracle():
    """Gaussian latitudes = arcsin of the Legendre P_2N roots; pinned
    against numpy's Gauss-Legendre nodes and the published ECMWF first
    latitude of the ERA5 native N320 grid (89.784877 deg)."""
    for N in (8, 16, 160):
        lats = grib.gaussian_latitudes(N)
        nodes, _ = np.polynomial.legendre.leggauss(2 * N)
        oracle = np.degrees(np.arcsin(np.sort(nodes)[::-1]))
        np.testing.assert_allclose(lats, oracle, atol=1e-12)
        assert lats[0] > 0 and lats[0] == -lats[-1]  # symmetric N->S
    np.testing.assert_allclose(grib.gaussian_latitudes(320)[0],
                               89.784877, atol=1e-5)


def _analytic(lat, lon):
    return (280.0 + 10.0 * np.sin(np.radians(lat))
            + 5.0 * np.cos(np.radians(lon)))


def _reduced_fixture(N=8, dense=False):
    glats = grib.gaussian_latitudes(N)
    base = 48 if dense else 16
    pl = np.array([4 * min(i + 1, 2 * N - i) + base for i in range(2 * N)])
    flat = np.concatenate([
        _analytic(glats[r], 360.0 * np.arange(pl[r]) / pl[r])
        for r in range(2 * N)])
    return glats, pl, flat


@pytest.mark.parametrize("encode,edition", [
    (grib.encode_grib1, 1), (grib.encode_grib2, 2)])
def test_reduced_gaussian_roundtrip(encode, edition):
    """A reduced-Gaussian field (GRIB1 grid type 4 with PL list / GRIB2
    template 3.40) decodes onto a regular lattice matching the analytic
    field: exact Gaussian latitudes, per-row periodic interpolation in
    longitude.  ERA5's native grid — the reference gets this from
    eccodes/cfgrib (reference era5.py:352-429)."""
    N = 8
    glats, pl, flat = _reduced_fixture(N, dense=True)
    rec = {"shortName": "t2m", "values": flat, "lats": glats,
           "lons": np.array([0.0, 360.0 * (1 - 1 / pl.max())]),
           "valid_time": np.datetime64("2013-01-01T00:00"),
           "pl": pl, "gauss_n": N, "nbits": 24,
           "param": (0, 0, 0, 103, 2)}
    out = grib.read(encode([rec]))
    assert len(out) == 1
    r = out[0]
    ni = int(pl.max())
    assert r["values"].shape == (2 * N, ni)
    np.testing.assert_allclose(r["lats"], glats, atol=1e-4)
    lons = 360.0 * np.arange(ni) / ni
    np.testing.assert_allclose(r["lons"], lons, atol=1e-6)
    # vs the independent analytic oracle: error bounded by the linear
    # interpolation truncation of cos() on the coarsest (48-point) row
    expect = _analytic(glats[:, None], lons[None, :])
    assert np.abs(r["values"] - expect).max() < 2e-2


def test_reduced_gaussian_coarse_rows_interp_error_bounded():
    """On very coarse polar rows (20 points) the periodic linear interp
    error stays within its second-order truncation bound."""
    N = 8
    glats, pl, flat = _reduced_fixture(N, dense=False)
    rec = {"shortName": "t2m", "values": flat, "lats": glats,
           "lons": np.array([0.0, 360.0 * (1 - 1 / pl.max())]),
           "valid_time": np.datetime64("2013-01-01T00:00"),
           "pl": pl, "gauss_n": N, "nbits": 24}
    r = grib.read(grib.encode_grib1([rec]))[0]
    ni = int(pl.max())
    lons = 360.0 * np.arange(ni) / ni
    expect = _analytic(glats[:, None], lons[None, :])
    # h = 18 deg on the 20-point rows: |err| <= A*(pi*h/360)^2/2 ~ 0.062
    assert np.abs(r["values"] - expect).max() < 0.08


def test_regular_gaussian_grib1_exact_latitudes():
    N = 8
    glats = grib.gaussian_latitudes(N)
    lons = np.linspace(0, 350, 36)
    vals = _analytic(glats[:, None], lons[None, :])
    rec = {"shortName": "t2m", "values": vals, "lats": glats, "lons": lons,
           "valid_time": np.datetime64("2013-01-01T00:00"),
           "gauss_n": N, "nbits": 24}
    r = grib.read(grib.encode_grib1([rec]))[0]
    np.testing.assert_allclose(r["lats"], glats, atol=1e-4)
    np.testing.assert_allclose(r["values"], vals, atol=1e-3)


def test_gaussian_subset_rows():
    """A sub-area Gaussian message (rows not starting at the pole) snaps
    onto the exact Gaussian latitudes of its N-grid."""
    N = 16
    glats = grib.gaussian_latitudes(N)
    sel = glats[5:14]
    lons = np.linspace(0, 350, 36)
    vals = _analytic(sel[:, None], lons[None, :])
    rec = {"shortName": "t2m", "values": vals, "lats": sel, "lons": lons,
           "valid_time": np.datetime64("2013-01-01T00:00"),
           "gauss_n": N, "nbits": 24}
    r = grib.read(grib.encode_grib1([rec]))[0]
    np.testing.assert_allclose(r["lats"], sel, atol=1e-4)
    # off-grid first latitude is refused, not silently mislocated
    bad = dict(rec, lats=sel + 0.4)
    with pytest.raises(ValueError, match="Gaussian grid"):
        grib.read(grib.encode_grib1([bad]))


def test_reduced_gaussian_bitmap_nan():
    """Bitmap (missing points) on a reduced grid: NaNs land on the right
    rows after regularization."""
    N = 8
    glats, pl, flat = _reduced_fixture(N, dense=True)
    flat = flat.copy()
    # void the entire 3rd row -> that regular row must be all-NaN
    r0 = int(pl[:2].sum())
    flat[r0:r0 + pl[2]] = np.nan
    rec = {"shortName": "t2m", "values": flat, "lats": glats,
           "lons": np.array([0.0, 360.0 * (1 - 1 / pl.max())]),
           "valid_time": np.datetime64("2013-01-01T00:00"),
           "pl": pl, "gauss_n": N, "nbits": 24}
    r = grib.read(grib.encode_grib1([rec]))[0]
    assert np.isnan(r["values"][2]).all()
    assert np.isfinite(r["values"][[0, 1, 3]]).all()


def test_grib2_ieee_template_54():
    """DRS template 5.4 (grid_ieee): raw IEEE f32 values, no packing —
    a real CDS packing variant; values survive at f32 precision and
    bitmapped NaNs land correctly."""
    rng = np.random.default_rng(3)
    vals = (rng.random((6, 9)) * 40 - 10).astype(np.float32).astype(float)
    vals[2, 4] = np.nan
    rec = {"shortName": "t2m", "values": vals,
           "lats": np.linspace(60, 55, 6), "lons": np.linspace(-4, 4, 9),
           "valid_time": np.datetime64("2013-01-01T00:00"),
           "param": (0, 0, 0, 103, 2), "ieee": True}
    out = grib.read(grib.encode_grib2([rec]))
    assert len(out) == 1
    got = out[0]["values"]
    assert np.isnan(got[2, 4]) and np.isfinite(np.delete(got.ravel(), 2 * 9 + 4)).all()
    np.testing.assert_allclose(np.nan_to_num(got), np.nan_to_num(vals),
                               rtol=1e-7)


def test_grib2_ccsds_template_542():
    """DRS template 5.42 (CCSDS/AEC via libaec — eccodes' grib_ccsds
    packing for new CDS products): encode/decode round-trip through the
    real codec library, bitmap NaNs intact, quantization bounded."""
    from atlite_tpu.io import aec

    if not aec.available():
        pytest.skip("libaec not present")
    rng = np.random.default_rng(4)
    vals = rng.random((12, 17)) * 40 + 250
    vals[3, 5] = np.nan
    rec = {"shortName": "t2m", "values": vals,
           "lats": np.linspace(60, 49, 12), "lons": np.linspace(-4, 12, 17),
           "valid_time": np.datetime64("2013-01-01T00:00"),
           "param": (0, 0, 0, 103, 2), "ccsds": True, "nbits": 16}
    out = grib.read(grib.encode_grib2([rec]))
    assert len(out) == 1
    got = out[0]["values"]
    assert np.isnan(got[3, 5])
    m = np.isfinite(vals)
    np.testing.assert_allclose(got[m], vals[m], atol=40 / (2**16 - 1) * 1.01)
    # 24-bit (4-byte samples) path
    rec24 = dict(rec, nbits=24, values=np.nan_to_num(vals, nan=260.0))
    got24 = grib.read(grib.encode_grib2([rec24]))[0]["values"]
    np.testing.assert_allclose(got24, rec24["values"], atol=1e-3)


def test_grib2_jp2_template_540():
    """DRS template 5.40 (JPEG2000 via libopenjp2 — eccodes' grib_jpeg):
    Pillow encodes the fixture codestream, the ctypes libopenjp2 binding
    decodes it on the read path, bitmapped NaNs intact, quantization
    bounded — the last refused packing family with an offline independent
    oracle (r4 verdict item 3)."""
    from atlite_tpu.io import jp2

    pytest.importorskip("PIL.Image")  # fixture encoder
    if not jp2.available():
        pytest.skip("libopenjp2 not present")
    rng = np.random.default_rng(7)
    vals = rng.random((14, 19)) * 35 + 250
    vals[4, 6] = np.nan
    rec = {"shortName": "t2m", "values": vals,
           "lats": np.linspace(60, 47, 14), "lons": np.linspace(-4, 14, 19),
           "valid_time": np.datetime64("2013-01-01T00:00"),
           "param": (0, 0, 0, 103, 2), "jp2": True, "nbits": 16}
    msg = grib.encode_grib2([rec])
    out = grib.read(msg)
    assert len(out) == 1
    got = out[0]["values"]
    assert np.isnan(got[4, 6])
    m = np.isfinite(vals)
    np.testing.assert_allclose(got[m], vals[m], atol=35 / 65535 * 1.01)

    # cross-oracle on the very same embedded bytes: Pillow's own openjpeg
    # integration must decode the section-7 codestream to the integers our
    # binding feeds the GRIB reconstruction
    import io as _io

    from PIL import Image as PILImage

    soc = msg.find(b"\xff\x4f\xff\x51")
    eoc = msg.rfind(b"\xff\xd9")
    assert soc != -1 and eoc > soc
    codestream = msg[soc:eoc + 2]
    theirs = np.asarray(PILImage.open(_io.BytesIO(codestream)))
    ours = jp2.decode(codestream)
    np.testing.assert_array_equal(ours, theirs.astype(np.int64))


def test_grib2_jp2_large_bitmapped_field():
    """Bitmapped JPEG2000-packed fields reshape to a near-square image
    (same contract as the PNG path)."""
    from atlite_tpu.io import jp2

    pytest.importorskip("PIL.Image")
    if not jp2.available():
        pytest.skip("libopenjp2 not present")
    rng = np.random.default_rng(8)
    vals = rng.random((120, 150)) * 30 + 270
    vals[0, 1] = np.nan
    rec = {"shortName": "t2m", "values": vals,
           "lats": np.linspace(85, 30, 120), "lons": np.linspace(-30, 40, 150),
           "valid_time": np.datetime64("2013-01-01T00:00"),
           "param": (0, 0, 0, 103, 2), "jp2": True, "nbits": 16}
    got = grib.read(grib.encode_grib2([rec]))[0]["values"]
    assert np.isnan(got[0, 1])
    m = np.isfinite(vals)
    np.testing.assert_allclose(got[m], vals[m], atol=30 / 65535 * 1.01)


def test_png_codec_vs_pillow():
    """The minimal PNG codec under template 5.41 matches Pillow in both
    directions, including hand-crafted scanlines for every filter type."""
    import io as _io
    import struct
    import zlib

    PIL = pytest.importorskip("PIL.Image")
    from atlite_tpu.io import png

    rng = np.random.default_rng(0)
    for shape, dt in [((17, 23, 1), np.uint8), ((17, 23, 1), np.uint16),
                      ((9, 11, 3), np.uint8), ((9, 11, 4), np.uint8)]:
        a = rng.integers(0, np.iinfo(dt).max, shape).astype(dt)
        got = np.asarray(PIL.open(_io.BytesIO(png.encode(a))))
        np.testing.assert_array_equal(
            got if got.ndim == 3 else got[:, :, None], a)
    # hand-craft a grayscale PNG using each filter type on its scanline;
    # our decode must equal Pillow's decode of the same bytes
    h, w = 5, 13
    raw_rows = rng.integers(0, 255, (h, w)).astype(np.uint8)
    recon = raw_rows.astype(np.int32)
    lines = b""
    for r, ftype in enumerate([0, 1, 2, 3, 4]):
        cur = recon[r]
        prev = recon[r - 1] if r else np.zeros(w, np.int32)
        enc = np.empty(w, np.int32)
        for i in range(w):
            a_ = cur[i - 1] if i else 0
            b_ = prev[i]
            c_ = prev[i - 1] if i else 0
            p = a_ + b_ - c_
            pa, pb, pc = abs(p - a_), abs(p - b_), abs(p - c_)
            paeth = a_ if (pa <= pb and pa <= pc) else (b_ if pb <= pc else c_)
            pred = [0, a_, b_, (a_ + b_) // 2, paeth][ftype]
            enc[i] = (cur[i] - pred) & 0xFF
        lines += bytes([ftype]) + enc.astype(np.uint8).tobytes()

    def chunk(t, b):
        return struct.pack(">I", len(b)) + t + b \
            + struct.pack(">I", zlib.crc32(t + b) & 0xFFFFFFFF)

    blob = (b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(lines)) + chunk(b"IEND", b""))
    ours = png.decode(blob)[:, :, 0]
    theirs = np.asarray(PIL.open(_io.BytesIO(blob)))
    np.testing.assert_array_equal(ours, theirs)
    np.testing.assert_array_equal(ours, raw_rows)


@pytest.mark.parametrize("nbits", [8, 16, 24, 32])
def test_grib2_png_template_541(nbits):
    """DRS template 5.41 (PNG packing): round-trip at every channel
    layout (gray8/gray16/RGB/RGBA), bitmapped NaNs intact."""
    rng = np.random.default_rng(5)
    vals = rng.random((11, 13)) * 35 + 250
    vals[2, 3] = np.nan
    rec = {"shortName": "t2m", "values": vals,
           "lats": np.linspace(60, 50, 11), "lons": np.linspace(-4, 8, 13),
           "valid_time": np.datetime64("2013-01-01T00:00"),
           "param": (0, 0, 0, 103, 2), "png": True, "nbits": nbits}
    out = grib.read(grib.encode_grib2([rec]))
    assert len(out) == 1
    got = out[0]["values"]
    assert np.isnan(got[2, 3])
    m = np.isfinite(vals)
    np.testing.assert_allclose(got[m], vals[m],
                               atol=35 / (2**min(nbits, 24) - 1) * 1.01 + 1e-9)


def test_grib2_png_large_bitmapped_field():
    """r4 review finding: bitmapped PNG-packed fields beyond 100k present
    points must round-trip (the encoder reshapes to a near-square image
    instead of one over-wide scanline)."""
    rng = np.random.default_rng(6)
    vals = rng.random((400, 500)) * 30 + 270
    vals[0, 0] = np.nan
    rec = {"shortName": "t2m", "values": vals,
           "lats": np.linspace(85, 30, 400), "lons": np.linspace(-30, 40, 500),
           "valid_time": np.datetime64("2013-01-01T00:00"),
           "param": (0, 0, 0, 103, 2), "png": True, "nbits": 16}
    got = grib.read(grib.encode_grib2([rec]))[0]["values"]
    assert np.isnan(got[0, 0])
    m = np.isfinite(vals)
    np.testing.assert_allclose(got[m], vals[m], atol=30 / 65535 * 1.01)


def test_aec_3byte_flag_roundtrip():
    """r4 review finding: AEC_DATA_3BYTE streams (17-24-bit samples in 3
    bytes) must size and frame correctly."""
    from atlite_tpu.io import aec

    if not aec.available():
        pytest.skip("libaec not present")
    rng = np.random.default_rng(7)
    x = rng.integers(0, 2**20, 3000).astype(np.int64)
    flags = aec.AEC_DATA_MSB | aec.AEC_DATA_PREPROCESS | aec.AEC_DATA_3BYTE
    assert aec.sample_nbytes(20, flags) == 3
    raw = b"".join(int(v).to_bytes(3, "big") for v in x)
    enc = aec.encode(raw, 20, 32, 128, flags)
    dec = aec.decode(enc, 3000, 20, 32, 128, flags)
    assert dec[:len(raw)] == raw


def test_grib_trust_boundary_refusals():
    """r4 IO-review findings: silent-misdecode paths must refuse —
    unknown time units, GRIB1 additional BDS flags, complex packing with
    missing-value management, >32-bit packing widths, empty input, and
    mixed-grid to_dataset."""
    rng = np.random.default_rng(8)
    vals = rng.random((4, 5)) * 10 + 270
    rec = {"shortName": "t2m", "values": vals,
           "lats": np.linspace(52, 50, 4), "lons": np.linspace(0, 4, 5),
           "valid_time": np.datetime64("2013-01-01T03:00"),
           "param": (0, 0, 0, 103, 2), "nbits": 16}
    raw1 = bytearray(grib.encode_grib1([rec]))
    # GRIB1 time unit octet (PDS octet 18, 0-based file offset 8+17)
    raw1[8 + 17] = 77
    with pytest.raises(NotImplementedError, match="time unit"):
        grib.read(bytes(raw1))
    # GRIB1 BDS flag bit 0x10 (additional flag octets)
    raw1 = bytearray(grib.encode_grib1([rec]))
    bds_off = 8 + 28 + 32  # PDS(28) + GDS(32)
    raw1[bds_off + 3] |= 0x10
    with pytest.raises(NotImplementedError, match="additional flag"):
        grib.read(bytes(raw1))
    # GRIB2 time unit (section 4, octet 18 -> s4[17])
    raw2 = bytearray(grib.encode_grib2([rec]))
    idx = raw2.find(bytes([0, 0, 0, 34, 4]))
    raw2[idx + 17] = 9  # reserved unit
    with pytest.raises(NotImplementedError, match="time unit"):
        grib.read(bytes(raw2))
    # complex packing with missing-value management
    from atlite_tpu.io.grib import _decode_complex

    with pytest.raises(NotImplementedError, match="missing-value"):
        _decode_complex(b"\x00" * 64, {"missing_mgmt": 1, "ndata": 4,
                                       "drs_template": 2})
    # >32-bit packing width
    from atlite_tpu.io.grib import _unpack_bits

    with pytest.raises(ValueError, match="packing width"):
        _unpack_bits(b"\x00" * 64, 64, 4)
    # no messages at all
    with pytest.raises(ValueError, match="no GRIB messages"):
        grib.read(b"<html>a CDS error document, not gridded bytes</html>")
    # records on different grids must not share one coordinate set
    rec2 = dict(rec, lats=np.linspace(42, 40, 4),
                valid_time=np.datetime64("2013-01-01T04:00"))
    records = grib.read(grib.encode_grib1([rec]) + grib.encode_grib1([rec2]))
    with pytest.raises(ValueError, match="different grids"):
        grib.to_dataset(records)


# ---------------------------------------------------------------------------
# Second-sourcing the complex-packing decode (r4 verdict item 4): the
# production decoder is checked against (a) a clean-room re-implementation
# that follows the NCEP g2c `comunpack` algorithm structure (per-stream
# reads with stream-local byte padding, group expansion, ghost-value
# substitution then recurrence — a genuinely different control flow from
# io/grib.py's offset-tracking decoder), and (b) exact reconstruction of
# randomized KNOWN integer fields across the whole parameter space
# (orders 0/1/2, zero-width groups, signed descriptors, nonzero width
# reference, length increments > 1, 1/2/4-byte descriptor sizes).
# ---------------------------------------------------------------------------
class _BitWriter:
    def __init__(self):
        self.bits = []

    def put(self, value, nbits):
        v = int(value)
        assert 0 <= v < (1 << nbits) if nbits else v == 0
        self.bits += [(v >> (nbits - 1 - i)) & 1 for i in range(nbits)]

    def pad(self):
        while len(self.bits) % 8:
            self.bits.append(0)

    def bytes(self):
        self.pad()
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            b = 0
            for j in range(8):
                b = (b << 1) | self.bits[i + j]
            out.append(b)
        return bytes(out)


def _sm_encode(v, nbytes):
    """GRIB sign-magnitude integer."""
    sign = 1 << (nbytes * 8 - 1)
    return (abs(int(v)) | (sign if v < 0 else 0)).to_bytes(nbytes, "big")


def _encode_complex(values, group_sizes, order=0, desc_bytes=2,
                    width_ref=0, len_inc=1, rng=None):
    """Test-side encoder for DRS 5.2/5.3 payloads (template 7.2/7.3 octet
    layout): returns (data bytes, meta dict) whose decode must reproduce
    ``values`` exactly."""
    values = np.asarray(values, dtype=np.int64)
    n = len(values)
    assert sum(group_sizes) == n

    if order:
        d = values.astype(np.int64).copy()
        if order == 1:
            d[1:] = values[1:] - values[:-1]
        else:  # order 2: second differences f[i] - 2f[i-1] + f[i-2]
            d[2:] = values[2:] - 2 * values[1:-1] + values[:-2]
        h = [int(values[i]) for i in range(order)]
        gmin = int(d[order:].min()) if n > order else 0
        stored = d.copy()
        stored[:order] = gmin  # ghost slots: decode replaces them
        stored = stored - gmin
    else:
        h, gmin = [], 0
        stored = values.copy()
        assert stored.min() >= 0, "5.2 packs non-negative scaled ints"

    refs, widths, lengths, groups = [], [], [], []
    pos = 0
    for gl in group_sizes:
        grp = stored[pos:pos + gl]
        pos += gl
        ref = int(grp.min())
        spread = int(grp.max()) - ref
        w = 0 if spread == 0 else int(spread).bit_length()
        refs.append(ref)
        widths.append(w)
        lengths.append(gl)
        groups.append(grp - ref)

    nbits = max(max(int(r).bit_length() for r in refs), 1)
    width_bits = max(max((w - width_ref).bit_length() for w in widths), 1)
    assert all(w >= width_ref for w in widths)
    len_ref = min(lengths[:-1] or lengths)
    scaled = [(l - len_ref) // len_inc for l in lengths[:-1]]
    assert all((l - len_ref) % len_inc == 0 for l in lengths[:-1])
    len_bits = max(max((s.bit_length() for s in scaled), default=1), 1)

    out = bytearray()
    if order:
        for v in h:
            out += _sm_encode(v, desc_bytes)
        out += _sm_encode(gmin, desc_bytes)
    bw = _BitWriter()
    for r in refs:
        bw.put(r, nbits)
    bw.pad()
    for w in widths:
        bw.put(w - width_ref, width_bits)
    bw.pad()
    for s in scaled:
        bw.put(s, len_bits)
    bw.put(0, len_bits)  # last group: field present, value ignored
    bw.pad()
    for w, grp in zip(widths, groups):
        for v in grp:
            bw.put(v, w)
    out += bw.bytes()

    meta = dict(ndata=n, drs_template=3 if order else 2, nbits=nbits,
                ngroups=len(group_sizes), group_width_ref=width_ref,
                group_width_bits=width_bits, group_len_ref=len_ref,
                group_len_inc=len_inc, group_len_last=lengths[-1],
                group_len_bits=len_bits)
    if order:
        meta.update(spatial_order=order, spatial_desc_bytes=desc_bytes)
    return bytes(out), meta


def _comunpack_ncep(cpack, meta):
    """Clean-room decode following the NCEP g2c comunpack algorithm
    structure: sequential gbits-style stream reads, per-stream byte
    padding computed from the stream's own bit count, group expansion
    into idif, then ghost substitution + recurrence for template 5.3."""
    def gbits(ofst, nbits, count):
        vals = np.zeros(count, dtype=np.int64)
        for k in range(count):
            for _ in range(nbits):
                vals[k] = (vals[k] << 1) | ((cpack[ofst // 8] >> (7 - ofst % 8)) & 1)
                ofst += 1
        return vals, ofst

    iofst = 0
    idrs_order = meta.get("spatial_order", 0)
    if meta["drs_template"] == 3:
        nbsd = meta["spatial_desc_bytes"]
        ival = []
        for _ in range(idrs_order + 1):
            raw, iofst = gbits(iofst, nbsd * 8, 1)
            msb = 1 << (nbsd * 8 - 1)
            v = int(raw[0])
            ival.append(-(v & (msb - 1)) if v & msb else v)
        h, minsd = ival[:-1], ival[-1]

    ng = meta["ngroups"]
    gref, iofst = gbits(iofst, meta["nbits"], ng)
    if (meta["nbits"] * ng) % 8:
        iofst += 8 - (meta["nbits"] * ng) % 8
    gwidth, iofst = gbits(iofst, meta["group_width_bits"], ng)
    gwidth += meta["group_width_ref"]
    if (meta["group_width_bits"] * ng) % 8:
        iofst += 8 - (meta["group_width_bits"] * ng) % 8
    glen, iofst = gbits(iofst, meta["group_len_bits"], ng)
    glen = meta["group_len_ref"] + glen * meta["group_len_inc"]
    if (meta["group_len_bits"] * ng) % 8:
        iofst += 8 - (meta["group_len_bits"] * ng) % 8
    glen[-1] = meta["group_len_last"]

    idif = np.zeros(meta["ndata"], dtype=np.int64)
    j = 0
    for g in range(ng):
        if gwidth[g]:
            vals, iofst = gbits(iofst, int(gwidth[g]), int(glen[g]))
            idif[j:j + int(glen[g])] = vals + gref[g]
        else:
            idif[j:j + int(glen[g])] = gref[g]
        j += int(glen[g])
    assert j == meta["ndata"]

    if meta["drs_template"] == 3:
        fld = idif + minsd
        for i in range(idrs_order):
            fld[i] = h[i]
        if idrs_order == 1:
            for i in range(1, len(fld)):
                fld[i] = fld[i] + fld[i - 1]
        elif idrs_order == 2:
            for i in range(2, len(fld)):
                fld[i] = fld[i] + 2 * fld[i - 1] - fld[i - 2]
        return fld
    return idif


@pytest.mark.parametrize("order", [0, 1, 2])
def test_complex_packing_differential_randomized(order):
    """Production decoder == clean-room NCEP-structured decoder == the
    exact integers that went in, across randomized fields/groupings."""
    rng = np.random.default_rng(100 + order)
    for case in range(12):
        n = int(rng.integers(order + 1, 200))
        # random partition incl. constant (zero-width) groups
        sizes = []
        left = n
        while left:
            s = int(min(left, rng.integers(1, 40)))
            sizes.append(s)
            left -= s
        len_inc = 2 if case % 4 == 2 else 1
        if len_inc == 2:
            # lengths must satisfy (l - ref) % inc == 0 for all but last
            ref = min(sizes[:-1] or sizes)
            sizes = [s + (s - ref) % 2 for s in sizes]
            n = sum(sizes)
        desc_bytes = [1, 2, 4][case % 3]
        # keep h/gmin within the descriptor byte width (diffs of ±v
        # reach ±2v at order 1, ±4v at order 2)
        vmax = 25 if (order and desc_bytes == 1) else 500
        vals = (rng.integers(-vmax, vmax, n) if order
                else rng.integers(0, 900, n))
        if case % 3 == 0 and len(sizes) > 1:
            # force one constant group -> width 0
            i0 = sizes[0]
            vals[i0:i0 + sizes[1]] = vals[i0]
        data, meta = _encode_complex(vals, sizes, order=order,
                                     desc_bytes=desc_bytes,
                                     len_inc=len_inc)
        got = grib._decode_complex(data, meta)
        np.testing.assert_array_equal(got, vals)
        clean = _comunpack_ncep(data, meta)
        np.testing.assert_array_equal(clean, vals)


def test_spatial_differencing_negative_descriptors_handbuilt():
    """Octet-audited template 7.3 payload with NEGATIVE ghost values and
    minimum (sign-magnitude per GRIB2 regulation 92.1.5 — the most likely
    shared-misreading point).  Field: [-3, -1, 4, 7] with order-1
    differencing: d = [_, 2, 5, 3], gmin = 2, stored-gmin = [0, 0, 3, 1].

    Octets (template 7.3, spatial_desc_bytes=2):
      1-2   0x80 0x03   h1 = -3      (sign bit + magnitude 3)
      3-4   0x00 0x02   gmin = +2
      5     0x00        group ref [0] at nbits=4, padded to a byte
      6     0x40        group width [2] at 3 bits, padded
      7     0x00        scaled group length (last group: value unused)
      8     0x0D        packed [0,0,3,1] at 2 bits = 00 00 11 01
    """
    data = bytes([0x80, 0x03, 0x00, 0x02, 0x00, 0x40, 0x00, 0x0D])
    meta = dict(ndata=4, drs_template=3, nbits=4, ngroups=1,
                group_width_ref=0, group_width_bits=3,
                group_len_ref=4, group_len_inc=1, group_len_last=4,
                group_len_bits=8, spatial_order=1, spatial_desc_bytes=2)
    out = grib._decode_complex(data, meta)
    np.testing.assert_array_equal(out, [-3, -1, 4, 7])
    np.testing.assert_array_equal(_comunpack_ncep(data, meta), [-3, -1, 4, 7])


def test_reduced_to_regular_hand_case_and_analytic_oracle():
    """The reduced->regular periodic linear interpolation against
    implementation-independent oracles: a hand-computed 4->8 point row
    (incl. the wrap segment) and an analytic smooth zonal field whose
    regularized values must match the function itself within the standard
    h^2/8 * max|f''| linear-interpolation bound."""
    # hand case: row [0,10,20,30] at lons 0/90/180/270 -> 8 targets every
    # 45 deg; the last target (315 deg) interpolates the wrap 30 -> 0
    out, lons = grib._reduced_to_regular(
        np.array([0.0, 10.0, 20.0, 30.0]), [4], 0.0, 8)
    np.testing.assert_allclose(out[0], [0, 5, 10, 15, 20, 25, 30, 15])
    np.testing.assert_allclose(lons, np.arange(8) * 45.0)

    # analytic oracle: f(lon) = sin(3*lon) + 0.5*cos(lon) on three rows
    # with different reduced counts
    pl = [96, 128, 64]
    rows = []
    for n in pl:
        lon = np.arange(n) * (360.0 / n)
        rows.append(np.sin(3 * np.radians(lon)) + 0.5 * np.cos(np.radians(lon)))
    flat = np.concatenate(rows)
    ni = 144
    out, lons = grib._reduced_to_regular(flat, pl, 0.0, ni)
    expect = np.sin(3 * np.radians(lons)) + 0.5 * np.cos(np.radians(lons))
    for r, n in enumerate(pl):
        h = 2 * np.pi / n
        bound = h * h / 8 * (9 + 0.5) * 1.01  # max|f''| = 9*1 + 0.5
        assert np.abs(out[r] - expect).max() < bound, (r, n)
