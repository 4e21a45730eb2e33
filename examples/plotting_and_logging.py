"""Plotting with the framework + working with log messages.

Mirrors the reference's "plotting_with_atlite" and
"logfiles_and_messages" example notebooks (reference
examples/plotting_with_atlite.ipynb, logfiles_and_messages.ipynb) with
plain matplotlib (no cartopy dependency):

- capacity-factor field map from an unaggregated conversion,
- the cutout's grid-cell outlines over the field,
- eligible-area map via ExclusionContainer.plot_shape_availability,
- routing the package's stdlib logging to a file and tuning levels.

Run:  python examples/plotting_and_logging.py   (writes PNGs to /tmp)
"""

import logging
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import shutil

shutil.rmtree("/tmp/example-plotting.atc", ignore_errors=True)  # start fresh

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

import atlite_tpu
from atlite_tpu.core.grid import Affine
from atlite_tpu.gis.geometry import box
from atlite_tpu.gis.raster import Raster

# ------------------------------------------------------------- logging
# every module logs through stdlib logging (reference logs the same way;
# its notebook demonstrates basicConfig + per-logger levels)
logging.basicConfig(
    filename="/tmp/example-atlite.log", filemode="w", level=logging.INFO,
    format="%(asctime)s %(levelname)s %(name)s: %(message)s",
)
logging.getLogger("atlite_tpu").setLevel(logging.DEBUG)

cutout = atlite_tpu.Cutout(
    "/tmp/example-plotting", module="synthetic",
    x=slice(-10.0, 2.0), y=slice(49.0, 59.0), time="2013-06-01",
)
cutout.prepare(features=["wind", "influx", "temperature"])

# ------------------------------------------- capacity-factor field map
cf = cutout.pv(panel="CSi", orientation="latitude_optimal",
               aggregate_time="mean")  # (y, x) daily-mean field
field = np.asarray(cf.values)

fig, ax = plt.subplots(figsize=(7, 6))
x0, x1 = cutout.extent[0], cutout.extent[1]
y0, y1 = cutout.extent[2], cutout.extent[3]
im = ax.imshow(field, origin="lower", extent=(x0, x1, y0, y1),
               cmap="inferno")
fig.colorbar(im, ax=ax, label="PV capacity factor (mean)")

# grid-cell outlines from cutout.grid (reference plots the same boxes)
for geom in cutout.grid["geometry"][:: max(1, len(cutout.grid) // 400)]:
    gx0, gy0, gx1, gy1 = geom.bounds
    ax.add_patch(plt.Rectangle((gx0, gy0), gx1 - gx0, gy1 - gy0,
                               fill=False, lw=0.2, ec="w", alpha=0.5))
ax.set(xlabel="lon", ylabel="lat", title="Mean PV capacity factor")
fig.savefig("/tmp/example-pv-cf.png", dpi=120)
print("wrote /tmp/example-pv-cf.png")

# ----------------------------------------------- eligible-area plotting
rng = np.random.default_rng(0)
landuse = Raster(rng.integers(1, 6, (500, 600)).astype(np.uint8),
                 Affine(0.02, 0, -10.2, 0, -0.02, 59.2), 4326, 255)
excluder = atlite_tpu.ExclusionContainer(crs=4326, res=0.02)
excluder.add_raster(landuse, codes=[4, 5])

fig, ax = plt.subplots(figsize=(6, 6))
excluder.plot_shape_availability(box(-6.0, 52.0, -2.0, 56.0), ax=ax)
fig.savefig("/tmp/example-availability.png", dpi=120)
print("wrote /tmp/example-availability.png")

# ----------------------------------------------------------- log review
logging.shutdown()
lines = Path("/tmp/example-atlite.log").read_text().splitlines()
print(f"\ncaptured {len(lines)} log lines in /tmp/example-atlite.log; tail:")
for line in lines[-3:]:
    print(" ", line)
