"""Trig-carry experiment (PERF.md round-2): does carrying (sin, cos)
pairs through orientation->transposition beat carrying angles?

The PV chain's per-element transcendentals today (fixed orientation,
stored solar position): sin(alt), cos(alt), cos(panel_az - az) and the
Huld log(G).  The carried variant precomputes sin/cos of altitude and
azimuth ONCE (as derived fields, amortized across converter calls /
loadable at prepare time) and evaluates the chain with pure arithmetic:
  cos(panel_az - az) = cos(panel_az) cos(az) + sin(panel_az) sin(az)
  low-sun mask:        sin(alt) < sin(threshold)  (monotone on [-pi/2, pi/2])

Timing uses the bench.py pattern: chained lax.scan passes of two lengths
differenced, one scalar readback (axon-relay-safe).

Run on the TPU:  python tools/trig_carry_experiment.py
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from atlite_tpu.physics.irradiation import tilted_irradiation
    from atlite_tpu.physics.orientation import surface_orientation
    from atlite_tpu.physics.pv import power_huld

    T, Y, X = 2184, 96, 128
    rng = np.random.default_rng(0)
    alt = (rng.random((T, Y, X), dtype=np.float32) * 1.6 - 0.25)
    az = rng.random((T, Y, X), dtype=np.float32) * 2 * np.pi
    toa = rng.random((T, Y, X), dtype=np.float32) * 1200
    direct = toa * rng.random((T, Y, X), dtype=np.float32) * 0.7
    diffuse = toa * rng.random((T, Y, X), dtype=np.float32) * 0.3
    albedo = rng.random((T, Y, X), dtype=np.float32) * 0.3
    temp = 270 + rng.random((T, Y, X), dtype=np.float32) * 30
    # keep latitudes off the 25/50-degree breakpoints of the
    # latitude_optimal piecewise slope: at an exact breakpoint the f32
    # (baseline, device radians) and f64 (carried, host) branch tests can
    # disagree — an artifact of the comparison, not of the chain
    lat = (np.linspace(35, 60, Y) + 0.0137).astype(np.float32)

    panel = {"model": "huld", "r_irradiance": 1000.0, "r_tmod": 298.0,
             "c_temp_amb": 1.0, "c_temp_irrad": 0.035,
             "inverter_efficiency": 0.9, "k_1": -0.017162, "k_2": -0.040289,
             "k_3": -0.004681, "k_4": 0.000148, "k_5": 0.000169,
             "k_6": 0.000005}
    orient = {"kind": "latitude_optimal"}

    # ------------------------------------------------ baseline (angles)
    def pv_angles(alt, az, direct, diffuse, toa, albedo, temp, latv):
        sp = {"altitude": alt, "azimuth": az}
        surf = surface_orientation(sp, latv, orient, None)
        fields = {"influx_direct": direct, "influx_diffuse": diffuse,
                  "influx_toa": toa, "albedo": albedo}
        irr = tilted_irradiation(fields, sp, surf, trigon_model="simple")
        return power_huld(irr, temp, panel)

    # ------------------------------------------- carried (sin/cos pairs)
    latr = np.radians(lat)[None, :, None]
    a = np.abs(latr)
    slope = np.where(a <= np.radians(25.0), 0.87 * a,
                     np.where(a <= np.radians(50.0),
                              0.76 * a + np.radians(0.31), np.radians(40.0)))
    panel_az = np.where(latr < 0, 0.0, np.pi)
    sin_slope = jnp.asarray(np.sin(slope), jnp.float32)
    cos_slope = jnp.asarray(np.cos(slope), jnp.float32)
    cos_paz = jnp.asarray(np.cos(panel_az), jnp.float32)
    sin_paz = jnp.asarray(np.sin(panel_az), jnp.float32)
    sin_thresh = float(np.sin(np.radians(1.0)))

    def pv_carried(sin_alt, cos_alt, sin_az, cos_az, direct, diffuse, toa,
                   albedo, temp):
        # cos(panel_az - az) = cos cos + sin sin
        cos_rel = cos_paz * cos_az + sin_paz * sin_az
        cosincidence = jnp.clip(
            sin_slope * cos_alt * cos_rel + cos_slope * sin_alt, 0.0, None)
        direct_c = jnp.clip(direct, 0.0, toa)
        diffuse_c = jnp.clip(diffuse, 0.0, toa - direct_c)
        influx = direct_c + diffuse_c
        k_geom = cosincidence / sin_alt
        direct_t = k_geom * direct_c
        diffuse_t = (1.0 + cos_slope) / 2.0 * diffuse_c
        ground_t = albedo * influx * ((1.0 - cos_slope) / 2.0)
        total = (jnp.nan_to_num(direct_t) + jnp.nan_to_num(diffuse_t)
                 + jnp.nan_to_num(ground_t))
        irr = jnp.where((sin_alt < sin_thresh) | (influx <= 0.01), 0.0, total)
        return power_huld(irr, temp, panel)

    args_a = tuple(jnp.asarray(v) for v in
                   (alt, az, direct, diffuse, toa, albedo, temp)) \
        + (jnp.asarray(lat),)
    sin_alt, cos_alt = np.sin(alt), np.cos(alt)
    sin_az, cos_az = np.sin(az), np.cos(az)
    args_c = tuple(jnp.asarray(v) for v in
                   (sin_alt, cos_alt, sin_az, cos_az, direct, diffuse, toa,
                    albedo, temp))

    # correctness: identical math away from the 1-degree mask boundary
    # (f64-precomputed sin(alt) vs f32 device sin can straddle the
    # threshold differently on boundary elements)
    ref = np.asarray(pv_angles(*args_a[:7], args_a[7]))
    got = np.asarray(pv_carried(*args_c))
    # RELATIVE error away from the mask boundary: near sin(1 deg) the
    # 1/sin(alt) geometric factor amplifies the ~1e-6 difference between
    # the device's f32 sin(alt) and the f64-precomputed carried value
    interior = np.abs(sin_alt - sin_thresh) > 1e-5
    rel = (np.abs(got - ref) / (np.abs(ref) + 1e-3))[interior]
    frac_boundary = np.mean(np.abs(got - ref) > np.abs(ref) * 1e-3 + 1e-3)
    print(f"max rel |carried - angles| (interior) = {np.nanmax(rel):.3e}; "
          f"mismatch fraction = {frac_boundary:.2e}")
    assert np.nanmax(rel) < 1e-3, "carried variant diverges"
    assert frac_boundary < 1e-3

    # timing: chained scans, two lengths, differenced
    def chained(fn, args, n):
        @jax.jit
        def run(*args):
            def body(carry, _):
                out = fn(*((args[0] + carry * 1e-30,) + args[1:]))
                return carry + jnp.sum(out) * 1e-30, None
            out, _ = lax.scan(body, jnp.float32(0.0), None, length=n)
            return out
        return lambda: float(run(*args))

    def measure(fn, args):
        r1, r2 = chained(fn, args, 1), chained(fn, args, 5)
        r1(); r2()  # compile both
        best1 = best2 = np.inf
        for _ in range(3):
            t0 = time.perf_counter(); r1(); best1 = min(best1, time.perf_counter() - t0)
            t0 = time.perf_counter(); r2(); best2 = min(best2, time.perf_counter() - t0)
        return (best2 - best1) / 4

    secs_a = measure(pv_angles, args_a)
    secs_c = measure(pv_carried, args_c)
    cells = T * Y * X
    print(f"angles : {secs_a*1e3:8.3f} ms/step  ({cells/secs_a/1e9:.2f} G cell-hours/s)")
    print(f"carried: {secs_c*1e3:8.3f} ms/step  ({cells/secs_c/1e9:.2f} G cell-hours/s)")
    print(f"speedup: {secs_a/secs_c:.3f}x")


if __name__ == "__main__":
    main()
