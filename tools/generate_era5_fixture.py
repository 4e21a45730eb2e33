"""Generate the checked-in ERA5 GRIB1 sample file used by
tests/test_era5_ingest.py.

Real ERA5 bytes cannot be downloaded in this environment (no network);
this synthesizes physically-plausible RAW ERA5 variables (wind components,
radiation accumulations in J m**-2, temperatures, runoff, geopotential) on
a 0.25-degree lattice and encodes them exactly as the CDS/MARS archive
ships ERA5: GRIB edition 1, ECMWF parameter tables 128/228, 16-bit simple
packing, descending latitude scan.  The test file decodes it with an
INDEPENDENT struct-level parser to validate atlite_tpu.io.grib.

Run:  python tools/generate_era5_fixture.py
"""

from pathlib import Path

import numpy as np
import pandas as pd

import sys

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from atlite_tpu.io import grib  # noqa: E402

OUT = Path(__file__).resolve().parent.parent / "tests" / "data" / "era5_sample.grib"

X0, X1, Y0, Y1 = -4.0, 1.5, 56.0, 62.0
DX = 0.25


def smooth(rng, shape, amp=1.0):
    f = rng.standard_normal(shape)
    for ax in range(f.ndim):
        for _ in range(3):
            f = (f + np.roll(f, 1, axis=ax) + np.roll(f, -1, axis=ax)) / 3.0
    f /= np.abs(f).max() + 1e-12
    return amp * f


def main():
    rng = np.random.default_rng(20130101)
    lons = np.round(np.arange(X0, X1 + DX / 2, DX), 5)
    lats = np.round(np.arange(Y1, Y0 - DX / 2, -DX), 5)  # descending (ERA5)
    times = pd.date_range("2013-01-01", periods=24, freq="h")
    T, NY, NX = len(times), len(lats), len(lons)

    u10 = smooth(rng, (T, NY, NX), 6.0) + 2.0
    v10 = smooth(rng, (T, NY, NX), 6.0)
    scale = 1.25 + 0.2 * smooth(rng, (T, NY, NX))
    u100, v100 = u10 * scale, v10 * scale
    fsr = np.abs(smooth(rng, (T, NY, NX), 0.8)) + 0.01
    # make a patch of negative roughness to exercise the sanitize floor
    fsr[:, :3, :3] = -0.5

    hours = times.hour.values[:, None, None]
    sun = np.clip(np.sin(np.pi * (hours - 6) / 12.0), 0.0, None)
    ssrd = 3600.0 * (450.0 * sun * (0.4 + 0.4 * np.abs(smooth(rng, (T, NY, NX)))))
    ssr = ssrd * (0.82 + 0.05 * smooth(rng, (T, NY, NX)))
    fdir = ssrd * np.clip(0.55 + 0.3 * smooth(rng, (T, NY, NX)), 0.0, 0.95)
    tisr = 3600.0 * 1361.0 * sun * np.ones((T, NY, NX))

    t2m = 278.0 + smooth(rng, (T, NY, NX), 6.0)
    stl4 = 277.0 + smooth(rng, (T, NY, NX), 3.0)
    stl4[:, -4:, -5:] = np.nan  # sea cells -> bitmap in the GRIB encoding
    d2m = t2m - (2.0 + np.abs(smooth(rng, (T, NY, NX), 4.0)))
    ro = np.clip(smooth(rng, (T, NY, NX), 2e-4), 0, None) + 1e-5
    z = np.abs(smooth(rng, (NY, NX), 5000.0)) + 100.0

    records = []
    for name, field in [("u10", u10), ("v10", v10), ("u100", u100),
                        ("v100", v100), ("fsr", fsr), ("ssr", ssr),
                        ("ssrd", ssrd), ("tisr", tisr), ("fdir", fdir),
                        ("t2m", t2m), ("stl4", stl4), ("d2m", d2m),
                        ("ro", ro)]:
        for i, t in enumerate(times):
            records.append(dict(shortName=name, values=field[i], lats=lats,
                                lons=lons, valid_time=np.datetime64(t),
                                nbits=16))
    records.append(dict(shortName="z", values=z, lats=lats, lons=lons,
                        valid_time=np.datetime64(times[0]), nbits=16))
    OUT.parent.mkdir(parents=True, exist_ok=True)
    OUT.write_bytes(grib.encode_grib1(records))
    print(f"wrote {OUT} ({OUT.stat().st_size/1024:.0f} KiB, "
          f"{len(records)} messages, {T}x{NY}x{NX})")


if __name__ == "__main__":
    main()
