"""Solar position / orientation / irradiation kernel tests."""

import numpy as np
import jax.numpy as jnp
import pandas as pd
import pytest

from atlite_tpu.core.timeutil import solar_ephemeris
from atlite_tpu.physics.orientation import get_orientation, orientation_fields, surface_orientation
from atlite_tpu.physics.solar import solar_position, solar_position_numpy


def _position(times, lon, lat, shift="0h"):
    eph = solar_ephemeris(times, shift)
    return solar_position_numpy(eph["declination"], eph["hour_angle0"],
                                np.atleast_1d(lon), np.atleast_1d(lat))


def test_device_matches_host_oracle():
    times = pd.date_range("2013-06-01", periods=48, freq="h").values
    lon = np.arange(-10, 11, 2.5)
    lat = np.arange(35, 61, 2.5)
    eph = solar_ephemeris(times, "0h")
    host = solar_position_numpy(eph["declination"], eph["hour_angle0"], lon, lat)
    dev = solar_position(jnp.asarray(eph["declination"]),
                         jnp.asarray(eph["hour_angle0"]),
                         jnp.asarray(lon), jnp.asarray(lat))
    np.testing.assert_allclose(np.asarray(dev["altitude"]), host["altitude"],
                               atol=1e-9)
    np.testing.assert_allclose(np.asarray(dev["azimuth"]), host["azimuth"],
                               atol=1e-9)


def test_solar_noon_altitude_equinox():
    # At the March equinox the sun's noon altitude ~ 90 - |lat|
    times = pd.DatetimeIndex(["2013-03-20 12:00"]).values
    sp = _position(times, 0.0, 50.0)
    alt_deg = np.degrees(sp["altitude"][0, 0, 0])
    assert abs(alt_deg - 40.0) < 1.0


def test_azimuth_south_at_noon():
    times = pd.DatetimeIndex(["2013-06-21 12:00"]).values
    sp = _position(times, 0.0, 50.0)
    az_deg = np.degrees(sp["azimuth"][0, 0, 0])
    assert abs(az_deg - 180.0) < 4.0


def test_sun_below_horizon_at_midnight():
    times = pd.DatetimeIndex(["2013-06-21 00:00"]).values
    sp = _position(times, 0.0, 50.0)
    assert sp["altitude"][0, 0, 0] < 0


def test_declination_range():
    times = pd.date_range("2013-01-01", "2013-12-31", freq="D").values
    eph = solar_ephemeris(times)
    dec_deg = np.degrees(eph["declination"])
    assert dec_deg.min() > -23.6 and dec_deg.min() < -23.2
    assert dec_deg.max() < 23.6 and dec_deg.max() > 23.2


def test_latitude_optimal_slope():
    lat = np.array([0.0, 20.0, 40.0, 60.0])
    spec = get_orientation("latitude_optimal")
    slope, azim = orientation_fields(spec, jnp.asarray(lat))
    slope = np.degrees(np.asarray(slope)).ravel()
    np.testing.assert_allclose(slope[0], 0.0, atol=1e-9)
    np.testing.assert_allclose(slope[1], 0.87 * 20, rtol=1e-6)
    np.testing.assert_allclose(slope[2], 0.76 * 40 + 0.31, rtol=1e-6)
    np.testing.assert_allclose(slope[3], 40.0, rtol=1e-6)
    assert np.all(np.asarray(azim).ravel() == np.pi)  # northern hemisphere -> south


def test_constant_orientation_cosincidence():
    # flat panel: cosincidence == sin(altitude)
    sp = {"altitude": jnp.asarray([[[0.5]]]), "azimuth": jnp.asarray([[[np.pi]]])}
    surf = surface_orientation(sp, jnp.asarray([50.0]),
                               get_orientation({"slope": 0.0, "azimuth": 180.0}))
    np.testing.assert_allclose(np.asarray(surf["cosincidence"]),
                               np.sin(0.5), rtol=1e-9)


def test_tracking_hierarchy(cutout):
    """dual >= vertical/horizontal >= fixed (reference
    test_preparation_and_conversion.py:155-223)."""
    kwargs = dict(panel="CSi", orientation="latitude_optimal", aggregate_time=None)
    fixed = cutout.pv(**kwargs).sum()
    dual = cutout.pv(tracking="dual", **kwargs).sum()
    vert = cutout.pv(tracking="vertical", **kwargs).sum()
    assert dual >= vert >= fixed * 0.999


def test_optimal_tilt_beats_flat(cutout):
    opt = cutout.pv(panel="CSi", orientation="latitude_optimal",
                    aggregate_time=None).sum()
    flat = cutout.pv(panel="CSi", orientation={"slope": 0.0, "azimuth": 0.0},
                     aggregate_time=None).sum()
    assert opt >= flat


def test_irradiation_components_sum(cutout):
    parts = [
        cutout.irradiation(orientation="latitude_optimal", irradiation=k,
                           aggregate_time=None)
        for k in ("direct", "diffuse", "ground")
    ]
    total = cutout.irradiation(orientation="latitude_optimal",
                               irradiation="total", aggregate_time=None)
    np.testing.assert_allclose(
        np.asarray(total.values),
        sum(np.asarray(p.values) for p in parts),
        atol=1e-6,
    )


def test_pv_zero_at_night(cutout):
    cf = cutout.pv(panel="CSi", orientation="latitude_optimal",
                   aggregate_time=None)
    alt = np.asarray(cutout.data["solar_altitude"])
    night = alt < np.radians(0.0)
    assert np.all(np.asarray(cf.values)[night] == 0)


def test_pv_positive_during_day(cutout):
    cf = cutout.pv(panel="CSi", orientation="latitude_optimal",
                   aggregate_time=None)
    # January at 56-62N: low sun, but clearly nonzero at midday
    assert np.asarray(cf.values).max() > 0.01


def test_bofinger_panel(cutout):
    cf = cutout.pv(panel="KANENA", orientation="latitude_optimal",
                   aggregate_time=None)
    vals = np.asarray(cf.values)
    assert np.all(np.isfinite(vals)) and vals.max() > 0
