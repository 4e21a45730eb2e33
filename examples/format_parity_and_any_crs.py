"""End-to-end example: reference on-disk format parity + any-CRS GIS.

Shows the round-4 interop surface:
- cutouts persist as zlib-compressed netCDF4/HDF5 (the reference stack's
  actual format, reference data.py:139,245-261) and reload losslessly —
  including through h5py, i.e. anything written here opens in the
  reference's xarray/netCDF4 toolchain;
- exclusion analysis in a CRS with no native closed form (EPSG:2056,
  Swiss LV95) runs through the system-PROJ host fallback, matching the
  reference's any-pyproj-CRS behavior (reference gis.py:87-101);
- zstd-compressed NETCDF4 inputs (new-CDS style) decode via the libzstd
  binding.

Run:  python examples/format_parity_and_any_crs.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import pandas as pd

import atlite_tpu
from atlite_tpu import ExclusionContainer
from atlite_tpu.core.grid import Affine
from atlite_tpu.gis.geometry import box
from atlite_tpu.gis.raster import Raster

# ------------------------------------------------- compressed netCDF4 cutout
cutout = atlite_tpu.Cutout(
    path=None, module="synthetic",
    x=slice(6.5, 9.5), y=slice(45.8, 47.5), time="2013-01-01",
)
cutout.prepare(compression={"zlib": True, "complevel": 4, "shuffle": True})
nc = "/tmp/example-swiss-cutout.nc"
cutout.to_netcdf(nc)
print(f"wrote {nc}: {Path(nc).stat().st_size / 1e6:.2f} MB, "
      f"magic={Path(nc).read_bytes()[:4]!r} (HDF5 container)")

reloaded = atlite_tpu.Cutout(nc)
w1 = cutout.wind("Vestas_V112_3MW", aggregate_time=None)
w2 = reloaded.wind("Vestas_V112_3MW", aggregate_time=None)
print("round-trip wind CF maxdiff:",
      float(np.abs(np.asarray(w1.values) - np.asarray(w2.values)).max()))

# ------------------------------------------------- any-CRS availability
# an exclusion raster defined on the Swiss national grid (EPSG:2056 —
# oblique Mercator, outside the native closed-form families: host paths
# go through the installed PROJ via batched cs2cs)
from atlite_tpu.gis.crs import transform_points

px, py = transform_points(np.array([6.5, 9.5]), np.array([45.8, 47.5]),
                          4326, 2056)
rng = np.random.default_rng(0)
RY, RX = 800, 1000
landuse = Raster(
    rng.integers(1, 6, (RY, RX)).astype(np.uint8),
    Affine((px[1] - px[0] + 2e4) / RX, 0, px[0] - 1e4,
           0, -(py[1] - py[0] + 2e4) / RY, py[1] + 1e4),
    crs=2056, nodata=255,
)
excluder = ExclusionContainer(crs=2056, res=300)
excluder.add_raster(landuse, codes=[4, 5])  # exclude classes 4 and 5

regions = pd.Series({
    "west": box(6.6, 45.9, 8.0, 47.4),
    "east": box(8.0, 45.9, 9.4, 47.4),
})
avail = cutout.availabilitymatrix(regions, excluder, backend="host")
share = np.asarray(avail.values).mean(axis=(1, 2))
print("mean availability (EPSG:2056 excluder):",
      dict(zip(regions.index, np.round(share, 3))))

# ------------------------------------------------- zstd NETCDF4 ingest
from atlite_tpu.io import zstd
from atlite_tpu.io.hdf5 import read_netcdf4
from atlite_tpu.io.hdf5_write import write_netcdf4

if zstd.available():
    zfn = "/tmp/example-zstd.nc"
    data = rng.random((24, 8, 9)).astype("f4")
    write_netcdf4(zfn, {"time": 24, "y": 8, "x": 9},
                  {"time": (("time",), np.arange(24, dtype="i8"),
                            {"units": "hours since 2013-01-01"}),
                   "ssrd": (("time", "y", "x"), data, {})},
                  {}, compression="zstd")
    dims, variables, _ = read_netcdf4(zfn)
    assert np.array_equal(variables["ssrd"][1], data)
    print(f"zstd NETCDF4 round-trip OK ({Path(zfn).stat().st_size} bytes)")
else:
    print("libzstd not present; skipping zstd demo")
