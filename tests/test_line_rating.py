"""IEEE-738 dynamic line rating: golden-value + property tests
(model: reference test/test_dynamic_line_rating.py, which validates against
the IEEE Std 738-2012 chapter 4.6 worked sample and two published conductor
datasheets)."""

import numpy as np
import pandas as pd
import pytest

from atlite_tpu.convert import convert_line_rating


def _ds(**over):
    base = {
        "temperature": 313.0,
        "wnd100m": 0.61,
        "height": 0.0,
        "wnd_azimuth": 0.0,
        "influx_direct": 1027.0,
        "solar_altitude": np.pi / 2,
        "solar_azimuth": np.pi,
    }
    base.update(over)
    return {k: np.asarray(v) for k, v in base.items()}


def test_ieee_sample_case():
    """IEEE Std 738-2012 worked example: 1025 A +-0.5%."""
    i = convert_line_rating(_ds(), psi=90, R=9.39e-5, D=0.02814,
                            Ts=273 + 100, epsilon=0.8, alpha=0.8)
    assert np.isclose(float(i), 1025, rtol=0.005)


def test_oeding_and_oswald_sample_case():
    """Al 240/40 conductor (DIN 48204-4/84): 645 A +-1.5% at 30 degC still air."""
    ds = _ds(temperature=30 + 273, wnd100m=0, influx_direct=0)
    i = convert_line_rating(ds, psi=90, R=0.1188e-3, D=0.0218,
                            Ts=273 + 80, epsilon=0.8, alpha=0.8)
    assert np.isclose(float(i), 645, rtol=0.015)


def test_suedkabel_sample_case():
    """2XS(FL)2Y 1x2500 cable: 2460 A, 1619 MW at 380 kV."""
    ds = _ds(temperature=293, wnd100m=0, influx_direct=0)
    i = float(convert_line_rating(ds, psi=0, R=0.0136e-3, Ts=363))
    s = np.sqrt(3) * i * 380000 / 1e6
    assert np.isclose(i, 2460, rtol=0.02)
    assert np.isclose(s, 1619, rtol=0.02)


def test_right_angle_symmetries():
    kw = dict(R=9.39e-5, D=0.02814, Ts=373, epsilon=0.8, alpha=0.8)
    expected = float(convert_line_rating(_ds(), psi=90, **kw))
    assert np.isclose(float(convert_line_rating(_ds(), psi=270, **kw)),
                      expected, rtol=1e-12)
    ds2 = _ds(wnd_azimuth=np.pi / 2)
    for psi in (0, 180):
        assert np.isclose(float(convert_line_rating(ds2, psi=psi, **kw)),
                          expected, rtol=1e-12)
    ds3 = _ds(wnd_azimuth=np.pi)
    for psi in (90, 270):
        assert np.isclose(float(convert_line_rating(ds3, psi=psi, **kw)),
                          expected, rtol=1e-12)


def test_angle_monotonicity_and_reflection():
    kw = dict(R=9.39e-5, D=0.02814, Ts=373, epsilon=0.8, alpha=0.8)
    Psi = np.arange(0, 370, 10)
    res = pd.Series([float(convert_line_rating(_ds(), psi=p, **kw)) for p in Psi],
                    index=Psi)
    assert (res.iloc[:10].diff().dropna() >= 0).all()
    assert (res.iloc[9:19].diff().dropna() <= 0).all()
    assert np.allclose(res.iloc[:19], res.iloc[:17:-1], atol=1e-8)
    assert np.allclose(res.iloc[:19], res.iloc[18:], atol=1e-8)


def test_line_rating_end_to_end(cutout):
    """Batched per-line rating over the cutout (convert.py:1255-1367)."""
    from atlite_tpu.gis.geometry import LineString

    lines = pd.Series({
        "l1": LineString([(-3.5, 57.0), (0.5, 57.0)]),   # W-E line
        "l2": LineString([(-2.0, 56.5), (-2.0, 61.0)]),  # S-N line
    })
    out = cutout.line_rating(lines, line_resistance=1e-4)
    assert out.dims == ("name", "time")
    vals = np.asarray(out.values)
    assert vals.shape == (2, 24)
    assert np.all(np.isfinite(vals)) and np.all(vals > 0)
    assert out.attrs["units"] == "A"


def test_line_rating_without_stored_solar_position():
    """Solar position is computed on the fly when the cutout lacks the
    stored variables (reference SolarPosition(ds) fallback inside
    convert_line_rating, convert.py:1243-1247)."""
    from atlite_tpu import Cutout
    from atlite_tpu.gis.geometry import LineString

    c = Cutout(path=None, module="synthetic", x=slice(-3, 0), y=slice(56, 59),
               time="2013-06-01")
    c.prepare()
    for v in ("solar_altitude", "solar_azimuth"):
        del c.data[v]
    c._invalidate()
    lines = pd.Series({"l1": LineString([(-2.5, 57.0), (-0.5, 57.0)])})
    out = c.line_rating(lines, line_resistance=1e-4)
    vals = np.asarray(out.values)
    assert np.all(np.isfinite(vals)) and np.all(vals > 0)


def test_line_rating_no_overlap_is_nan(cutout):
    from atlite_tpu.gis.geometry import LineString

    lines = pd.Series({"far": LineString([(100.0, 10.0), (101.0, 10.0)])})
    out = cutout.line_rating(lines, line_resistance=1e-4)
    assert np.isnan(np.asarray(out.values)).all()


def test_line_rating_time_chunked_equals_single(cutout):
    """T-chunk streaming of the (L,K,T) gather (incl. the padded tail
    chunk) is exact vs the one-shot path."""
    from atlite_tpu.gis.geometry import LineString

    lines = pd.Series({
        "l1": LineString([(-3.5, 57.0), (0.5, 57.0)]),
        "l2": LineString([(-2.0, 56.5), (-2.0, 61.0)]),
        "l3": LineString([(-3.0, 58.5), (1.0, 60.5)]),
    })
    full = cutout.line_rating(lines, line_resistance=1e-4)
    chunked = cutout.line_rating(lines, line_resistance=1e-4, _chunk_hours=7)
    np.testing.assert_allclose(np.asarray(chunked.values),
                               np.asarray(full.values), rtol=1e-6)


def test_line_rating_min_skips_nan_cells():
    """One NaN cell (negative thermal balance) must not NaN the whole
    line — the reference's .min('spatial') skips NaN."""
    import jax.numpy as jnp

    from atlite_tpu.physics.line_rating import batched_line_rating

    fields = {
        "temperature": jnp.asarray([[[390.0], [293.0]]]),  # Ta > Ts -> NaN
        "wnd100m": jnp.asarray([[[0.6], [0.6]]]),
        "wnd_azimuth": jnp.asarray([[[0.0], [0.0]]]),
        "influx_direct": jnp.asarray([[[1000.0], [1000.0]]]),
        "solar_altitude": jnp.asarray([[[1.0], [1.0]]]),
        "solar_azimuth": jnp.asarray([[[3.0], [3.0]]]),
        "height": jnp.asarray([[[100.0], [100.0]]]),
    }
    mask = np.array([[True, True]])
    out = np.asarray(batched_line_rating(
        fields, jnp.asarray(mask), np.array([np.pi / 2]), np.array([8.8e-5]),
        np.array([0.028]), np.array([373.0]), np.array([0.8]),
        np.array([0.8])))
    assert np.isfinite(out[0, 0]) and out[0, 0] > 0


def test_line_rating_rejects_unknown_parameters(cutout):
    """r5 review: a misspelled tweak parameter must fail loudly instead
    of becoming an inert DataFrame column (reference convert.py:1352)."""
    from atlite_tpu.gis.geometry import LineString

    line = LineString([(-3.0, 57.0), (0.0, 60.0)])
    with pytest.raises(ValueError, match="Epsilon"):
        cutout.line_rating([line], 1e-5, Epsilon=0.9)
