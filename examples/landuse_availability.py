"""Land-eligibility example: exclusion rasters -> availability matrix ->
capacity-weighted wind profile (mirrors the reference's
"landuse-availability" notebook, GDAL-free).

Run:  python examples/landuse_availability.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import pandas as pd

import atlite_tpu
from atlite_tpu.core.grid import Affine
from atlite_tpu.gis.geometry import box
from atlite_tpu.gis.raster import Raster

cutout = atlite_tpu.Cutout(
    "/tmp/example-availability", module="synthetic",
    x=slice(-4, 1.5), y=slice(56, 62), time="2013-01-01",
)
cutout.prepare(features=["wind"])

# a synthetic CORINE-like landuse raster at 0.01 deg with classes 1..5
rng = np.random.default_rng(0)
landuse = Raster(
    rng.integers(1, 6, size=(640, 580)).astype(np.uint8),
    Affine(0.01, 0, -4.2, 0, -0.01, 62.2), crs=4326, nodata=255,
)

excluder = atlite_tpu.ExclusionContainer(crs=4326, res=0.01)
excluder.add_raster(landuse, codes=[4, 5])          # exclude classes 4, 5
excluder.add_geometry([box(-2.0, 58.0, -1.0, 59.0)])  # a protected area

regions = pd.Series({
    "A": box(-4, 56, -1.25, 62),
    "B": box(-1.25, 56, 1.5, 62),
})

A = cutout.availabilitymatrix(regions, excluder)
print("availability mean share per region:",
      {k: round(float(np.asarray(A.values)[i][np.asarray(A.values)[i] > 0].mean()), 3)
       for i, k in enumerate(regions.index)})

# capacity layout: 2 MW/km^2 on eligible land
area_km2 = cutout.area(crs=3035).values / 1e6
cap_per_region = np.asarray(A.values) * area_km2[None] * 2.0  # MW

profiles = []
for i in range(len(regions)):
    layout = cutout.uniform_layout().copy(cap_per_region[i])
    ts = cutout.wind("Vestas_V112_3MW", layout=layout, per_unit=True,
                     aggregate_time=None)
    profiles.append(ts.to_pandas().iloc[0])
print("\ncapacity-weighted wind profiles (p.u.):")
print(pd.DataFrame(dict(zip(regions.index, profiles))).describe().loc[["mean", "max"]])
