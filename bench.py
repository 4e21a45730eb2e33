"""Benchmark: combined wind+PV capacity-factor pipeline throughput.

Metric (BASELINE.md north star): grid-cell-hours/s through the full
convert -> aggregate step (wind CF + PV CF + bus aggregation, one fused
XLA computation) on a synthetic ERA5-like cutout.

vs_baseline: ratio against the numpy single-thread reference
implementation (atlite_tpu.reference_impl) of the same pipeline — the
stand-in for the reference's numpy-under-dask execution, timed on a time
slice and scaled.

Prints ONE JSON line.
"""

from __future__ import annotations

import json
import os
import time
from pathlib import Path

import numpy as np


def build_inputs(T, Y, X, B, seed=3):
    """Bench-shape inputs via the ONE synthetic recipe
    (__graft_entry__._example_inputs) — Europe-at-0.25deg extent, winter
    start, sparser bus matrix, plus the exact power-curve simplification
    the production wind path applies."""
    import __graft_entry__ as ge
    from atlite_tpu.physics.wind import simplify_power_curve

    fields, eph, x, y, V, POWn, matrix = ge._example_inputs(
        T=T, Y=Y, X=X, B=B, seed=seed, extent=(-12.0, 18.0, 35.0, 60.0),
        start="2013-01-01", density=0.05)
    V, POWn = (a.astype(np.float32) for a in simplify_power_curve(V, POWn))
    return fields, eph, x, y, V, POWn, matrix


def numpy_baseline_seconds(fields, lat, V, POWn, matrix, t_sub=48):
    """Time the numpy reference path on a t_sub slice; returns secs/step
    scaled to the full T."""
    from atlite_tpu import reference_impl as ref

    T = fields["wnd100m"].shape[0]
    sub = {k: (v[:t_sub] if np.ndim(v) == 3 else v) for k, v in fields.items()}
    panel = {"c_temp_amb": 1.0, "c_temp_irrad": 0.035, "r_tmod": 298.0,
             "r_irradiance": 1000.0, "k_1": -0.017162, "k_2": -0.040289,
             "k_3": -0.004681, "k_4": 0.000148, "k_5": 0.000169,
             "k_6": 0.000005, "inverter_efficiency": 0.9}
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        wind_cf = ref.wind_cf_numpy(sub, V, POWn, 1.0, 80.0)
        pv_cf = ref.pv_cf_numpy(sub, lat, panel)
        _ = wind_cf.reshape(t_sub, -1) @ matrix.T
        _ = pv_cf.reshape(t_sub, -1) @ matrix.T
        best = min(best, time.perf_counter() - t0)
    return best * (T / t_sub)


def bench_availability():
    """Batched device availability matrix: fine-pixel-shape rate (Mpix/s)."""
    import jax

    from atlite_tpu import Cutout, ExclusionContainer
    from atlite_tpu.core.grid import Affine
    from atlite_tpu.gis.geometry import box
    from atlite_tpu.gis.kernels import availability_matrix_device
    from atlite_tpu.gis.raster import Raster

    cutout = Cutout(path=None, module="synthetic", bounds=(-4, 56, 1.5, 62),
                    time="2013-01-01")
    rng = np.random.default_rng(0)
    landuse = Raster(rng.integers(1, 6, (640, 580)).astype(np.uint8),
                     Affine(0.01, 0, -4.2, 0, -0.01, 62.3), 4326, 255)
    S = 12
    xs = np.linspace(-4, 0.5, 5)
    ys = np.linspace(56, 61, 4)
    shapes = [box(x, y, x + 1.2, y + 1.3) for x in xs[:4] for y in ys[:3]][:S]

    # one excluder, many shape-batch queries (the realistic pattern — the
    # fine exclusion mask is shape-independent and cached on device)
    exc = ExclusionContainer(4326, res=0.01)
    exc.add_raster(landuse, codes=[4, 5])

    def run():
        return availability_matrix_device(cutout, shapes, exc)

    run()  # compile + warm cache
    dt = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        out = run()
        dt = min(dt, time.perf_counter() - t0)
    npix = S * 625 * 575  # fine lattice ~ (625, 575)
    assert np.isfinite(out).all()

    # numeric cross-check ON THE REAL CHIP: the CPU-backend tests pin
    # device==host, but TPU f32 semantics (MXU truncation class of bugs,
    # PERF.md) only show up here — assert parity, report the max diff
    import pandas as pd

    exc_h = ExclusionContainer(4326, res=0.01)
    exc_h.add_raster(landuse, codes=[4, 5])
    host = np.asarray(cutout.availabilitymatrix(
        pd.Series(shapes), exc_h).values)
    dev = np.asarray(out)
    max_diff = float(np.abs(dev - host).max())
    assert max_diff < 2e-2, (
        f"TPU availability diverged from host by {max_diff}"
    )
    return round(npix / dt / 1e6, 1), round(max_diff, 6)


def bench_availability_cold():
    """PERF.md production workload: 12 shapes, 100 m EPSG:3035 exclusion
    raster over the (-4..1.5, 56..62) cutout — 41 Mpix fine lattice,
    cross-CRS downsample.  cold = fresh excluder (host mask build +
    packed-bit upload), warm = excluder fine-mask cached on device.
    The raster origin is deliberately NOT res-aligned so the separable
    nearest-sampling fast path (not the slice path) is what cold
    measures."""
    from atlite_tpu import Cutout, ExclusionContainer
    from atlite_tpu.core.grid import Affine
    from atlite_tpu.gis.crs import transform_points
    from atlite_tpu.gis.geometry import box
    from atlite_tpu.gis.kernels import availability_matrix_device
    from atlite_tpu.gis.raster import Raster

    cutout = Cutout(path=None, module="synthetic", bounds=(-4, 56, 1.5, 62),
                    time="2013-01-01")
    xs, ys = transform_points(np.array([-4.0, -4.0, 1.5, 1.5]),
                              np.array([56.0, 62.0, 56.0, 62.0]), 4326, 3035)
    x0 = xs.min() - 5e3 - 37.0  # misaligned origin on purpose
    y1 = ys.max() + 5e3 + 37.0
    RX = int((xs.max() - xs.min() + 1e4) / 100) + 2
    RY = int((ys.max() - ys.min() + 1e4) / 100) + 2
    rng = np.random.default_rng(0)
    data = rng.integers(1, 6, (RY, RX)).astype(np.uint8)
    raster = Raster(data, Affine(100, 0, x0, 0, -100, y1), 3035, 255)
    gx = np.linspace(-4, 0.5, 5)
    gy = np.linspace(56, 61, 4)
    shapes = [box(x, y, x + 1.2, y + 1.3)
              for x in gx[:4] for y in gy[:3]][:12]

    def new_exc():
        exc = ExclusionContainer(3035, res=100)
        exc.add_raster(raster, codes=[4, 5])
        return exc

    exc = new_exc()
    out = np.asarray(availability_matrix_device(cutout, shapes, exc))
    assert np.isfinite(out).all()
    t0 = time.perf_counter()
    availability_matrix_device(cutout, shapes, exc)  # device-cached mask
    warm = time.perf_counter() - t0
    t0 = time.perf_counter()
    availability_matrix_device(cutout, shapes, new_exc())  # cold excluder
    cold = time.perf_counter() - t0
    return round(cold, 2), round(warm, 2)


def bench_banded_agg():
    """Large-matrix (beyond-dense-limit) aggregation: banded spmm ms/step."""
    import jax
    import jax.numpy as jnp
    import scipy.sparse as sp
    from jax import lax

    from atlite_tpu.ops.bsr_spmm import to_banded, _banded_spmm

    B, Y, X, T = 2048, 192, 256, 336
    C = Y * X
    rng = np.random.default_rng(0)
    rows, cols, vals = [], [], []
    for b in range(B):
        y0 = int(rng.integers(0, Y - 8))
        x0 = int(rng.integers(0, X - 8))
        cc = (np.arange(y0, y0 + 8)[:, None] * X
              + np.arange(x0, x0 + 8)[None, :]).ravel()
        rows += [b] * len(cc)
        cols += list(cc)
        vals += list(rng.random(len(cc)))
    m = sp.csr_matrix((vals, (rows, cols)), shape=(B, C))
    banded = to_banded(m)
    flat = jnp.asarray(rng.random((T, C), dtype=np.float32))
    bands = jnp.asarray(banded["bands"])
    tidx = jnp.asarray(banded["tile_idx"])
    inv = jnp.asarray(np.pad(
        banded["inverse"], (0, banded["nb"] * banded["block_b"] - B),
        constant_values=banded["nb"] * banded["block_b"] - 1))

    def chained(n):
        @jax.jit
        def run(flat, bands, tidx, inv):
            def body(carry, _):
                out = _banded_spmm(flat + carry * 1e-30, bands, tidx, inv,
                                   align=banded["align"],
                                   c_pad=banded["C_pad"])
                return carry + jnp.sum(out) * 1e-30, None
            out, _ = lax.scan(body, jnp.float32(0.0), None, length=n)
            return out
        return run

    r1, r2 = chained(1), chained(4)
    args = (flat, bands, tidx, inv)
    float(r1(*args)); float(r2(*args))

    def t(run):
        best = np.inf
        for _ in range(2):
            t0 = time.perf_counter()
            float(run(*args))
            best = min(best, time.perf_counter() - t0)
        return best

    ms = (t(r2) - t(r1)) / 3 * 1e3
    return round(ms, 2), f"{B}x{C}x{T}"


def bench_streamed(T=8760, Y=48, X=64, B=20, time_chunk=730):
    """Full-year streamed conversion: wind CF + bus aggregation pulled
    chunk-by-chunk from the mmap'd on-disk store through the device
    (convert._chunked_convert's one-deep pipelined readback), vs the same
    conversion with all fields resident in HBM.  Reports wall-clock
    cell-hours/s INCLUDING host->HBM staging — the number BASELINE.md
    actually promises for 'full-year ERA5 cutout -> CF series'.

    Two streamed variants run in the SAME session (r4 verdict item 1):
    raw f32 staging, and CF-packed int16 staging (stream_pack="int16",
    half the wire bytes; quantization tolerance documented in PERF.md).
    The packed number is the headline streamed throughput; the raw run is
    the same-session comparison point for the packing speedup."""
    import shutil
    import tempfile

    import scipy.sparse as sp

    from atlite_tpu import Cutout

    workdir = Path(tempfile.mkdtemp(prefix="bench_stream"))
    try:
        c = Cutout(workdir / "year", module="synthetic",
                   x=slice(-12.0, 18.0), y=slice(35.0, 60.0),
                   dx=30.0 / (X - 1), dy=25.0 / (Y - 1),
                   time=slice("2013-01-01", "2013-12-31"))
        c.prepare(features=["wind"])
        T = len(c.grid_desc.time)
        Y, X = c.shape
        # reopen -> arrays are np.load mmaps of the store
        c = Cutout(workdir / "year")

        # raw host->device link probe FIRST, before any streamer shares
        # the wire (r4 verdict item 9: a concurrent probe raced the
        # streamer and read utilizations up to 1.91): K back-to-back puts
        # of the actual first chunks' staged stacks (the relay link is
        # sensitive to transfer size AND payload compressibility — random
        # blobs understate it for real weather fields), one sync at the
        # end, mirroring the streamer's own double-buffered overlap.
        import jax.numpy as jnp

        K_put = 4
        Tc = min(time_chunk, T)
        wind_vars = ["wnd100m", "wnd10m", "roughness"]
        blobs = []
        for k in range(K_put):
            t0_, t1_ = (k * Tc) % T, min((k * Tc) % T + Tc, T)
            stack = np.stack([np.asarray(c.data[v][t0_:t1_], dtype=np.float32)
                              for v in wind_vars])
            blobs.append(np.ascontiguousarray(stack))
        d = jnp.asarray(blobs[0].ravel()[:1024]); float(d.sum())
        raw_secs = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            ds = [jnp.asarray(b) for b in blobs]
            float(sum(dd[0, 0, 0, 0] + dd[-1, -1, -1, -1] for dd in ds))
            raw_secs = min(raw_secs, time.perf_counter() - t0)
        raw_mbps = K_put * blobs[0].nbytes / 1e6 / raw_secs
        del blobs, ds

        rng = np.random.default_rng(0)
        matrix = sp.csr_matrix(
            (rng.random((B, Y * X)) * (rng.random((B, Y * X)) < 0.05))
            .astype(np.float32))
        kwargs = dict(turbine="Vestas_V112_3MW", matrix=matrix,
                      index=list(range(B)), aggregate_time=None)

        def timed_once(**extra):
            t0 = time.perf_counter()
            out = c.wind(**kwargs, **extra)
            # np result: already synced by the host concatenation
            vals = np.asarray(out.values)
            assert np.isfinite(vals).all()
            return time.perf_counter() - t0, vals

        def timed(**extra):
            best, vals = np.inf, None
            for _ in range(2):
                secs, vals = timed_once(**extra)
                best = min(best, secs)
            return best, vals

        # streamed raw vs CF-packed int16 (half the wire bytes,
        # elementwise device reconstruction): warm both up, then
        # INTERLEAVE the timed repetitions — the relay rate drifts within
        # a session, and consecutive-block timing would bias whichever
        # variant ran during the faster interval
        timed_once(time_chunk=time_chunk)  # warm-up (compile + page cache)
        timed_once(time_chunk=time_chunk, stream_pack="int16")  # pack_params
        stream_secs = packed_secs = np.inf
        stream_vals = packed_vals = None
        for _ in range(2):
            secs, stream_vals = timed_once(time_chunk=time_chunk)
            stream_secs = min(stream_secs, secs)
            secs, packed_vals = timed_once(time_chunk=time_chunk,
                                           stream_pack="int16")
            packed_secs = min(packed_secs, secs)

        # resident: all fields pre-staged to HBM (fields() device cache)
        c.fields()
        timed(time_chunk=0)
        resident_secs, resident_vals = timed(time_chunk=0)

        # on-TPU value equality: the CPU tests pin chunked==full
        # (tests/test_convert.py), but TPU f32 semantics only show here
        sv_maxdiff = float(np.abs(stream_vals - resident_vals).max())
        assert sv_maxdiff < 1e-4, (
            f"streamed diverged from resident by {sv_maxdiff}")
        # packed tolerance: int16 quantization of each var's global range
        # through the wind pipeline + 20-cell bus sums (PERF.md); the CPU
        # tests pin the same bound per cell
        pk_maxdiff = float(np.abs(packed_vals - resident_vals).max())
        denom = max(float(np.abs(resident_vals).max()), 1e-9)
        assert pk_maxdiff / denom < 3e-3, (
            f"packed streaming diverged from resident by {pk_maxdiff} "
            f"(rel {pk_maxdiff / denom})")

        # bytes the streamer actually moves (wind log-law: wnd100m,
        # wnd10m, roughness of the 5 stored wind variables)
        streamed_mb = 3 * T * Y * X * 4 / 1e6
        cell_hours = T * Y * X
        return {
            "streamed_cell_hours_per_s": round(cell_hours / packed_secs, 1),
            "streamed_raw_f32_cell_hours_per_s":
                round(cell_hours / stream_secs, 1),
            "packed_over_raw": round(stream_secs / packed_secs, 2),
            "resident_cell_hours_per_s": round(cell_hours / resident_secs, 1),
            "streamed_over_resident": round(resident_secs / packed_secs, 3),
            "stream_effective_MBps": round(streamed_mb / stream_secs, 1),
            "packed_effective_MBps": round(streamed_mb / 2 / packed_secs, 1),
            "link_raw_MBps": round(raw_mbps, 1),
            "link_utilization": round(streamed_mb / stream_secs / raw_mbps, 2),
            "streamed_vs_resident_maxdiff": round(sv_maxdiff, 8),
            "packed_vs_resident_maxdiff": round(pk_maxdiff, 8),
            "shape": f"{T}x{Y}x{X}", "time_chunk": time_chunk,
        }
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


def _stage(msg):
    import sys
    print(f"[bench {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr,
          flush=True)


RESULT = {
    "metric": "grid-cell-hours/s (wind+PV CF + bus aggregation)",
    "value": None, "unit": "cell-hours/s", "vs_baseline": None,
    "detail": {},
}
_EMITTED = False


def _emit_and_exit(code=0):
    """Print the (possibly partial) JSON line exactly once and exit.

    Installed as the SIGTERM handler so that when the driver's `timeout`
    fires during a relay stall (compiles have been observed to take
    minutes in bad intervals), the stages that DID complete still get
    recorded instead of losing the whole round's benchmark."""
    global _EMITTED
    if not _EMITTED:
        _EMITTED = True
        print(json.dumps(RESULT), flush=True)
    os._exit(code)


def main():
    import signal

    signal.signal(signal.SIGTERM, lambda *_: _emit_and_exit(0))
    t_start = time.monotonic()
    budget = float(os.environ.get("BENCH_BUDGET", 540))

    def time_left():
        return budget - (time.monotonic() - t_start)

    size = os.environ.get("BENCH_SIZE", "default")
    if size == "small":
        T, Y, X, B = 24 * 14, 48, 64, 12
    else:
        T, Y, X, B = 2184, 96, 128, 20  # 3 months x ~Europe at 0.25 deg

    import jax

    fields_np, eph_np, lon, lat, V, POWn, matrix = build_inputs(T, Y, X, B)

    import jax.numpy as jnp
    from jax import lax

    import __graft_entry__ as ge

    step = ge._step_fn()

    # Timing strategy (the axon relay makes block_until_ready unreliable, so
    # everything is measured inside one jit with a single host readback):
    # - the step streams over K REAL time chunks with an inner lax.scan
    #   (production streaming shape; chunks hold different data, so nothing
    #   is loop-invariant),
    # - an outer scan repeats the full pass n times, with the carry
    #   perturbing only the SMALL parameters (power curve, latitudes) —
    #   enough data-dependence to prevent hoisting without adding memory
    #   traffic,
    # - two run lengths are differenced to cancel dispatch/RTT overheads.
    K = 2  # few large chunks: each scan iteration costs ~300us fixed overhead
    Tc = T // K
    T = K * Tc
    scanned = {k: jax.device_put(v[:T].reshape(K, Tc, Y, X))
               for k, v in fields_np.items() if v.ndim == 3}
    static = {k: jax.device_put(v) for k, v in fields_np.items() if v.ndim == 2}
    eph_c = {k: jax.device_put(v[:T].reshape(K, Tc)) for k, v in eph_np.items()}
    args = (scanned, static, eph_c, jax.device_put(lon), jax.device_put(lat),
            jax.device_put(V), jax.device_put(POWn), jax.device_put(matrix))

    def chained(n):
        @jax.jit
        def run(scanned, static, eph_c, lon, lat, V, POWn, matrix):
            def pass_body(carry, _):
                Vp = V + carry * 1e-30
                latp = lat + carry * 1e-30

                def chunk_body(c2, chunk):
                    sc, eph = chunk
                    wb, pb = step({**sc, **static}, eph, lon, latp, Vp,
                                  POWn, matrix)
                    return c2 + jnp.sum(wb) + jnp.sum(pb), None

                out, _ = lax.scan(chunk_body, jnp.float32(0.0),
                                  (scanned, eph_c))
                return carry + out * 1e-30, None

            out, _ = lax.scan(pass_body, jnp.float32(0.0), None, length=n)
            return out
        return run

    # scale repeats so the differenced run holds >=50 ms of device
    # compute — at BENCH_SIZE=small the 1M-cell-hour pass takes ~0.3 ms
    # and a 4-pass difference drowns in relay RTT noise (observed
    # negative estimates)
    cell_hours_est = T * Y * X
    n1 = 1
    n2 = n1 + max(4, int(np.ceil(0.05 * 3e9 / max(cell_hours_est, 1))))
    run1, run2 = chained(n1), chained(n2)

    def timed_once(run):
        t0 = time.perf_counter()
        float(run(*args))  # single host readback forces full sync
        return time.perf_counter() - t0

    _stage("compiling step runs")
    float(run1(*args))
    float(run2(*args))
    _stage("timing step")

    # headline = difference of the two runs' BEST times (robust to relay
    # RTT noise, which can exceed the short run's compute entirely);
    # paired per-repeat estimates are recorded so the noise floor is
    # visible in the JSON instead of silently moving the headline
    def time_block():
        t1s, t2s, samples = [], [], []
        for _ in range(5):
            t1 = timed_once(run1)
            t2 = timed_once(run2)
            t1s.append(t1)
            t2s.append(t2)
            samples.append((t2 - t1) / (n2 - n1))
        secs = (min(t2s) - min(t1s)) / (n2 - n1)
        spread = round(100.0 * (max(samples) - min(samples)) / abs(secs), 1)
        return secs, spread, samples

    # a paired-sample spread beyond 50% marks a degraded relay session
    # (round-3 verdict: a 250% spread produced a headline at the bottom of
    # the documented band) — retry the whole block once and take the run
    # with the tighter spread; if it persists, stamp the JSON so the docs
    # never have to explain the number away
    device_secs, spread_pct, samples = time_block()
    relay_degraded = spread_pct > 50.0
    if relay_degraded and time_left() > 120:
        _stage(f"relay spread {spread_pct}% > 50%: retrying timing block")
        secs2, spread2, samples2 = time_block()
        if spread2 < spread_pct:
            device_secs, spread_pct, samples = secs2, spread2, samples2
        relay_degraded = spread_pct > 50.0
    # NB: stays True when the budget left no room to retry — a degraded
    # session must never record an unflagged headline

    cell_hours = T * Y * X
    throughput = cell_hours / device_secs

    _stage("numpy baseline")
    base_secs = numpy_baseline_seconds(fields_np, lat, V, POWn, matrix)
    vs_baseline = base_secs / device_secs

    RESULT["value"] = round(throughput, 1)
    RESULT["vs_baseline"] = round(vs_baseline, 2)
    RESULT["detail"].update({
        "T": T, "Y": Y, "X": X, "buses": B,
        "device_secs_per_step": round(device_secs, 6),
        "device_secs_samples": [round(x, 6) for x in samples],
        "spread_pct": spread_pct,
        "relay_degraded": relay_degraded,
        "baseline_secs_per_step": round(base_secs, 4),
        "device": str(jax.devices()[0]),
    })

    # secondary stages: each guarded by the remaining budget and its own
    # try/except — a relay stall or failure in one must not lose the rest
    def maybe(stage_name, min_secs, fn):
        if time_left() < min_secs:
            _stage(f"skipping {stage_name} ({time_left():.0f}s left)")
            RESULT["detail"][stage_name + "_skipped"] = "budget"
            return
        _stage(stage_name)
        try:
            fn()
        except Exception as exc:  # record, keep going
            RESULT["detail"][stage_name + "_error"] = repr(exc)[:200]

    def _avail():
        avail, avail_max_diff = bench_availability()
        RESULT["detail"]["availability_Mpix_per_s"] = avail
        RESULT["detail"]["availability_dev_vs_host_maxdiff"] = avail_max_diff

    def _banded():
        banded_ms, banded_shape = bench_banded_agg()
        RESULT["detail"]["banded_agg_ms"] = banded_ms
        RESULT["detail"]["banded_agg_shape"] = banded_shape

    def _avail_cold():
        cold, warm = bench_availability_cold()
        RESULT["detail"]["availability_cold_s"] = cold
        RESULT["detail"]["availability_warm_s"] = warm

    def _streamed():
        if size == "small":
            RESULT["detail"]["streamed_fullyear"] = bench_streamed(
                Y=24, X=32, time_chunk=365)
        else:
            RESULT["detail"]["streamed_fullyear"] = bench_streamed()

    # cold availability runs BEFORE the streamed stage: in slow-wire relay
    # sessions the streamed stage can eat the whole remaining budget and
    # the cold number (an r5 headline improvement) must not be the one
    # that gets dropped
    maybe("availability", 45, _avail)
    maybe("banded_agg", 45, _banded)
    maybe("availability_cold", 60, _avail_cold)
    maybe("streamed_fullyear", 90, _streamed)
    _stage("done")
    _emit_and_exit(0)


if __name__ == "__main__":
    main()
