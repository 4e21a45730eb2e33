"""Generate a small SARAH-format NetCDF fixture for tests/test_sarah_ingest.

Writes 2 days x {SIS, SID} NETCDF4 files with h5py using the real SARAH
archive conventions (which our reader must survive, independent of our own
encoder):

- dims (time, lat, lon) as HDF5 dimension scales (netCDF-4 model),
- CF time as 'seconds since 1970-01-01' int64 at 30-min steps,
- SIS/SID packed as int16 with scale_factor + _FillValue; night stamps are
  entirely _FillValue (the dawn/dusk NaN gaps the interpolation handles),
- file names SISin<YYYYMMDD>... / SIDin<YYYYMMDD>... matching the
  reference's `SI.in(\\d{8})` discovery regex
  (/root/reference/atlite/datasets/sarah.py:42-69).

Deterministic; values follow a smooth diurnal shape so the influx is
physically plausible.
"""

from pathlib import Path

import h5py
import numpy as np
import pandas as pd

OUT = Path(__file__).resolve().parent.parent / "tests" / "data" / "sarah"

# on the global -180 + k*0.05 lattice so an 0.05-deg cutout lands exactly
# on these cells (the reference relies on the same alignment)
LON = np.round(-4.95 + 0.05 * np.arange(16), 4)  # 16 pts
LAT = np.round(56.05 + 0.05 * np.arange(12), 4)  # 12 pts
FILL = np.int16(-999)
SCALE = 0.25


def diurnal_field(times, rng):
    """Smooth positive irradiance with a diurnal cycle; NaN at night."""
    hours = (times - times.floor("D")) / pd.Timedelta("1h")
    lon2, lat2 = np.meshgrid(LON, LAT)
    sun = np.sin(np.pi * (hours.values[:, None, None] - 5.0) / 14.0)
    spatial = 1.0 + 0.2 * np.sin(lon2 * 7) * np.cos(lat2 * 5)
    vals = 800.0 * np.clip(sun, 0, None) ** 1.4 * spatial[None]
    vals += rng.normal(0, 3.0, vals.shape)
    vals = np.clip(vals, 0, None)
    vals[sun[:, 0, 0] <= 0] = np.nan  # night: stored as _FillValue
    return vals


def write_sarah_file(path, var, times, values):
    packed = np.where(np.isnan(values), FILL,
                      np.round(values / SCALE)).astype(np.int16)
    with h5py.File(path, "w") as f:
        t = f.create_dataset(
            "time",
            data=((times - pd.Timestamp("1970-01-01")) // pd.Timedelta("1s"))
            .values.astype(np.int64))
        t.attrs["units"] = "seconds since 1970-01-01"
        t.attrs["standard_name"] = "time"
        t.make_scale("time")
        lat = f.create_dataset("lat", data=LAT)
        lat.attrs["units"] = "degrees_north"
        lat.make_scale("lat")
        lon = f.create_dataset("lon", data=LON)
        lon.attrs["units"] = "degrees_east"
        lon.make_scale("lon")
        d = f.create_dataset(var, data=packed, chunks=(8, len(LAT), len(LON)),
                             compression="gzip", shuffle=True)
        d.attrs["scale_factor"] = np.float64(SCALE)
        d.attrs["_FillValue"] = FILL
        d.attrs["units"] = "W m-2"
        d.dims[0].attach_scale(t)
        d.dims[1].attach_scale(lat)
        d.dims[2].attach_scale(lon)


def main():
    OUT.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(7)
    for day in ("20130501", "20130502"):
        times = pd.date_range(day, periods=48, freq="30min")
        sis = diurnal_field(times, rng)
        # SID (direct) is a sub-share of SIS so diffuse = SIS - SID >= 0
        share = 0.4 + 0.3 * rng.random(sis.shape)
        sid = np.where(np.isnan(sis), np.nan, sis * share)
        write_sarah_file(OUT / f"SISin{day}0000004UD1000101UD.nc", "SIS",
                         times, sis)
        write_sarah_file(OUT / f"SIDin{day}0000004UD1000101UD.nc", "SID",
                         times, sid)
    print("wrote", sorted(p.name for p in OUT.glob("*.nc")))


if __name__ == "__main__":
    main()
