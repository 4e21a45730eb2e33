"""Continental-scale end-to-end benchmark (r4 verdict item 2).

ONE pipeline at reference-Europe scale, run as one recorded process:

  prepare (synthetic ERA5-like, 240x480 cells x 8760 h, on-disk .atc
  store) -> reopen from store (mmap) -> 2048-region indicator matrix
  (C++ host geometry) -> streamed wind CF + streamed PV CF with the
  banded bus aggregation fused per chunk (CF-packed int16 staging) ->
  land-eligibility availability matrix at 100 m in EPSG:3035 for 40
  shapes over the same extent.

Equality checks run in-process: the first two days of each streamed
series are recomputed resident on-device from a sel() sub-cutout, and
four availability shapes re-run through the independent host path.

Emits ONE JSON line with per-stage seconds, throughputs, and the
equality maxdiffs — the production-scale composition measured end to
end instead of inferred from separately-timed parts (bench.py measures
the parts; this measures the whole).  Runtime is dominated by the
host->device wire through the axon relay (~25-55 MB/s); run nohup'd
with a generous timeout:  timeout 5400 python bench_continental.py

Reference workload shape: /root/reference/test/conftest.py:14-15 scaled
to a full year and a continental extent.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np

SMOKE = bool(os.environ.get("CONTINENTAL_SMOKE"))
if SMOKE:  # structure check at toy scale (tests/test_continental_smoke.py)
    T_HOURS, NY, NX = 14 * 24, 61, 121   # dx 0.25 / dy 25/60: lattice-aligned
    REGIONS_Y, REGIONS_X = 8, 16
    N_AVAIL_SHAPES = 4
    AVAIL_RES_M = 2000.0
    TIME_SLICE = slice("2013-01-01", "2013-01-14")
else:
    # 241x481 = the reference-Europe 0.25-deg-class grid (conftest.py:14-15
    # scaled); dx 0.0625 / dy 25/240 keep the extent on the global lattice
    T_HOURS, NY, NX = 8760, 241, 481
    REGIONS_Y, REGIONS_X = 32, 64      # 2048 regions -> banded aggregation
    N_AVAIL_SHAPES = 40
    AVAIL_RES_M = 100.0
    TIME_SLICE = slice("2013-01-01", "2013-12-31")
EXTENT = (-12.0, 18.0, 35.0, 60.0)     # lon0, lon1, lat0, lat1

RESULT = {
    "metric": "continental end-to-end cell-hours/s (wind+PV, banded 2048-bus)",
    "value": None, "unit": "cell-hours/s", "vs_baseline": None, "detail": {},
}


def _stage(msg):
    print(f"[continental {time.strftime('%H:%M:%S')}] {msg}",
          file=sys.stderr, flush=True)


def main():
    import pandas as pd

    from atlite_tpu import Cutout, ExclusionContainer
    from atlite_tpu.core.grid import Affine
    from atlite_tpu.gis.crs import transform_points
    from atlite_tpu.gis.geometry import box
    from atlite_tpu.gis.kernels import availability_matrix_device
    from atlite_tpu.gis.raster import Raster

    keep = os.environ.get("CONTINENTAL_STORE")  # reuse an existing store
    workdir = keep or tempfile.mkdtemp(prefix="bench_continental")
    os.makedirs(workdir, exist_ok=True)
    t_all = time.perf_counter()
    try:
        x0, x1, y0, y1 = EXTENT
        dx = (x1 - x0) / (NX - 1)
        dy = (y1 - y0) / (NY - 1)

        # ---- stage 1: prepare the full-year store ----------------------
        _stage(f"prepare {NY}x{NX} x {T_HOURS}h")
        t0 = time.perf_counter()
        # half-cell slack on the slice ends: the global-lattice snap can
        # otherwise drop the endpoint column to float rounding
        c = Cutout(os.path.join(workdir, "europe"), module="synthetic",
                   x=slice(x0, x1 + dx / 2), y=slice(y0, y1 + dy / 2),
                   dx=dx, dy=dy, time=TIME_SLICE)
        c.prepare(features=["wind", "influx", "temperature"])
        prepare_s = time.perf_counter() - t0
        T = len(c.grid_desc.time)
        Y, X = c.shape
        assert (T, Y, X) == (T_HOURS, NY, NX), (T, Y, X)
        RESULT["detail"]["prepare_s"] = round(prepare_s, 1)
        store_gb = sum(
            os.path.getsize(os.path.join(workdir, "europe.atc", f))
            for f in os.listdir(os.path.join(workdir, "europe.atc"))) / 1e9
        RESULT["detail"]["store_GB"] = round(store_gb, 2)

        # reopen: arrays become np.load mmaps of the store
        c = Cutout(os.path.join(workdir, "europe"))

        # ---- stage 2: 2048-region indicator matrix (host C++ geometry) -
        _stage("indicator matrix (2048 regions)")
        t0 = time.perf_counter()
        gx = np.linspace(x0, x1, REGIONS_X + 1)
        gy = np.linspace(y0, y1, REGIONS_Y + 1)
        regions = pd.Series({
            f"r{iy}_{ix}": box(gx[ix], gy[iy], gx[ix + 1], gy[iy + 1])
            for iy in range(REGIONS_Y) for ix in range(REGIONS_X)
        })
        import scipy.sparse as sp

        matrix = sp.csr_matrix(c.indicatormatrix(regions))
        matrix_s = time.perf_counter() - t0
        B = matrix.shape[0]
        assert B == REGIONS_Y * REGIONS_X
        RESULT["detail"]["indicatormatrix_s"] = round(matrix_s, 1)
        if not SMOKE:
            assert B * matrix.shape[1] > 32 * 1024 * 1024, \
                "matrix under the dense limit — not exercising the banded path"

        time_chunk = 48 if SMOKE else 730
        kwargs = dict(matrix=matrix, index=regions.index,
                      aggregate_time=None, time_chunk=time_chunk,
                      stream_pack="int16")

        # ---- stage 3: streamed wind CF + banded aggregation ------------
        _stage("wind (streamed int16, banded 2048-bus)")
        t0 = time.perf_counter()
        wind = c.wind("Vestas_V112_3MW", **kwargs)
        wind_vals = np.asarray(wind.values)
        wind_s = time.perf_counter() - t0
        assert wind_vals.shape == (B, T) and np.isfinite(wind_vals).all()
        RESULT["detail"]["wind_s"] = round(wind_s, 1)
        RESULT["detail"]["wind_cell_hours_per_s"] = round(T * Y * X / wind_s, 1)

        # ---- stage 4: streamed PV CF + banded aggregation --------------
        _stage("pv (streamed int16, banded 2048-bus)")
        t0 = time.perf_counter()
        pv = c.pv(panel="CSi", orientation="latitude_optimal", **kwargs)
        pv_vals = np.asarray(pv.values)
        pv_s = time.perf_counter() - t0
        assert pv_vals.shape == (B, T) and np.isfinite(pv_vals).all()
        RESULT["detail"]["pv_s"] = round(pv_s, 1)
        RESULT["detail"]["pv_cell_hours_per_s"] = round(T * Y * X / pv_s, 1)

        # ---- equality: first 48 h recomputed resident ------------------
        _stage("equality: resident 48h slice")
        sub = c.sel(time=slice("2013-01-01", "2013-01-02"))
        w48 = np.asarray(sub.wind("Vestas_V112_3MW", matrix=matrix,
                                  index=regions.index,
                                  aggregate_time=None).values)
        p48 = np.asarray(sub.pv(panel="CSi", orientation="latitude_optimal",
                                matrix=matrix, index=regions.index,
                                aggregate_time=None).values)
        wind_maxdiff = float(np.abs(wind_vals[:, :48] - w48).max())
        pv_diff = np.abs(pv_vals[:, :48] - p48)
        pv_maxdiff = float(pv_diff.max())
        pv_p999 = float(np.quantile(pv_diff, 0.999))
        # int16 packing tolerance through each pipeline, relative to the
        # per-region magnitudes.  The wind chain is smooth -> tight max
        # bound.  The PV chain has the reference's hard low-sun cutoff
        # (altitude < 1 deg OR influx <= 0.01 suppressed,
        # pv/irradiation.py:247-252): quantized influx can flip a dawn
        # cell across the threshold, so the BULK (99.9%) must be at
        # packing precision while isolated flips stay bounded at 2%.
        wtol = 3e-3 * max(np.abs(w48).max(), 1e-9)
        pmax = max(np.abs(p48).max(), 1e-9)
        assert wind_maxdiff < wtol, (wind_maxdiff, wtol)
        assert pv_p999 < 3e-3 * pmax, (pv_p999, pmax)
        assert pv_maxdiff < 2e-2 * pmax, (pv_maxdiff, pmax)
        RESULT["detail"]["wind_vs_resident_maxdiff"] = round(wind_maxdiff, 8)
        RESULT["detail"]["pv_vs_resident_maxdiff"] = round(pv_maxdiff, 8)
        RESULT["detail"]["pv_vs_resident_p999"] = round(pv_p999, 8)

        # ---- stage 5: availability at 100 m, EPSG:3035, 40 shapes ------
        _stage("availability (100 m, EPSG:3035, 40 shapes)")
        ex_, ey_ = transform_points(
            np.array([x0, x0, x1, x1, (x0 + x1) / 2]),
            np.array([y0, y1, y0, y1, y1]), 4326, 3035)
        rx0 = ex_.min() - 5e3 - 37.0   # deliberately res-misaligned
        ry1 = ey_.max() + 5e3 + 37.0
        RX = int((ex_.max() - ex_.min() + 1e4) / AVAIL_RES_M) + 2
        RY = int((ey_.max() - ey_.min() + 1e4) / AVAIL_RES_M) + 2
        _stage(f"  landuse raster {RY}x{RX} ({RY * RX / 1e6:.0f} Mpix)")
        rng = np.random.default_rng(0)
        landuse = Raster(rng.integers(1, 6, (RY, RX)).astype(np.uint8),
                         Affine(AVAIL_RES_M, 0, rx0, 0, -AVAIL_RES_M, ry1),
                         3035, 255)
        sx = np.linspace(x0 + 0.5, x1 - 3.5, 8)
        sy = np.linspace(y0 + 0.5, y1 - 3.5, 5)
        shapes = [box(x, y, x + 3.0, y + 3.0)
                  for y in sy for x in sx][:N_AVAIL_SHAPES]
        exc = ExclusionContainer(3035, res=AVAIL_RES_M)
        exc.add_raster(landuse, codes=[4, 5])
        t0 = time.perf_counter()
        avail = availability_matrix_device(c, shapes, exc)
        avail_s = time.perf_counter() - t0
        assert np.isfinite(avail).all()
        fine_pix = RY * RX
        RESULT["detail"]["availability_s"] = round(avail_s, 1)
        RESULT["detail"]["availability_Mpix"] = round(fine_pix / 1e6, 1)
        RESULT["detail"]["availability_shape_Mpix_per_s"] = round(
            len(shapes) * fine_pix / avail_s / 1e6, 1)

        # equality: 4 shapes through the independent host path
        _stage("equality: availability host cross-check (4 shapes)")
        exc_h = ExclusionContainer(3035, res=AVAIL_RES_M)
        exc_h.add_raster(landuse, codes=[4, 5])
        host = np.asarray(c.availabilitymatrix(
            pd.Series(shapes[:4]), exc_h, backend="host").values)
        avail_maxdiff = float(np.abs(avail[:4] - host).max())
        assert avail_maxdiff < 2e-2, avail_maxdiff
        RESULT["detail"]["availability_dev_vs_host_maxdiff"] = \
            round(avail_maxdiff, 6)

        # ---- headline --------------------------------------------------
        cell_hours = 2 * T * Y * X  # two full converted+aggregated series
        conv_s = wind_s + pv_s
        RESULT["value"] = round(cell_hours / conv_s, 1)
        RESULT["detail"].update({
            "T": T, "Y": Y, "X": X, "buses": B, "smoke": SMOKE,
            "pipeline_total_s": round(time.perf_counter() - t_all, 1),
            "time_chunk": time_chunk, "stream_pack": "int16",
        })
        import jax

        RESULT["detail"]["device"] = str(jax.devices()[0])
        print(json.dumps(RESULT), flush=True)
    finally:
        if not keep:
            shutil.rmtree(workdir, ignore_errors=True)


if __name__ == "__main__":
    main()
