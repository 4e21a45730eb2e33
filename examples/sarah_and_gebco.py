"""Creating a cutout from SARAH satellite archives + GEBCO height maps.

Mirrors the reference's "create_cutout_SARAH" and "using_gebco_heightmap"
example notebooks (reference examples/create_cutout_SARAH.ipynb,
using_gebco_heightmap.ipynb; adapters at reference
atlite/datasets/sarah.py and atlite/datasets/gebco.py):

- SARAH: point ``sarah_dir`` at a directory of SIS*/SID* NetCDF archives
  (here the small checked-in test fixtures), stack the module with
  "synthetic" to fill the variables SARAH does not provide
  (influx_toa/albedo/temperature — the reference stacks sarah+era5 the
  same way), prepare, and run PV on satellite irradiance.
- GEBCO: resample a bathymetry/elevation raster onto the cutout grid
  with area-average semantics (reference datasets/gebco.py:30-38).

Run:  python examples/sarah_and_gebco.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import shutil

shutil.rmtree("/tmp/example-sarah.atc", ignore_errors=True)  # start fresh

import numpy as np

import atlite_tpu
from atlite_tpu.core.grid import Affine
from atlite_tpu.datasets import gebco
from atlite_tpu.gis.raster import Raster

SARAH_DIR = Path(__file__).resolve().parent.parent / "tests" / "data" / "sarah"

# ------------------------------------------------------------------ SARAH
cutout = atlite_tpu.Cutout(
    "/tmp/example-sarah", module=["sarah", "synthetic"],
    sarah_dir=str(SARAH_DIR),
    x=slice(-4.95, -4.21), y=slice(56.05, 56.61),
    time=slice("2013-05-01", "2013-05-02 23:00"),
    dx=0.05, dy=0.05,
)
cutout.prepare(features=["influx", "temperature"])
print(cutout)

direct = np.asarray(cutout.data["influx_direct"])
print(f"\nSARAH direct influx: peak {direct.max():.1f} W/m^2, "
      f"day-1 noon field mean {direct[12].mean():.1f} W/m^2")

pv = cutout.pv(panel="CSi", orientation="latitude_optimal",
               aggregate_time="mean")
print(f"two-day mean PV CF on satellite irradiance: "
      f"{float(np.asarray(pv.values).mean()):.4f}")

# ------------------------------------------------------------------ GEBCO
# a synthetic GEBCO-like elevation tile at 0.05 deg (real GEBCO GeoTIFF or
# .npz paths work identically via gebco_path=...)
ny, nx = 60, 60
elev = np.full((ny, nx), 120.0)
elev[: ny // 2] = 420.0  # northern half is high ground
tile = Raster(elev, Affine(0.05, 0, -2.2, 0, -0.05, 52.2), crs=4326,
              nodata=None)

c2 = atlite_tpu.Cutout(path=None, module="gebco", x=slice(-2, 0),
                       y=slice(50, 52), time="2013-01-01")
dims, height = gebco.get_data(c2, "height", gebco_raster=tile)["height"]
print(f"\nGEBCO height on the cutout grid {height.shape}: "
      f"south rows ~{height[0].mean():.0f} m, "
      f"north rows ~{height[-1].mean():.0f} m")
assert height[-1].mean() > height[0].mean()
