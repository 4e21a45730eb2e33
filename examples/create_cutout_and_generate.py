"""End-to-end example: cutout creation -> preparation -> wind/PV series.

Mirrors the reference's "Creating a cutout" + "Historic comparison" example
notebooks with the offline synthetic weather module.  For real reanalysis
data use module="era5" with either CDS credentials (retrieval + built-in
GRIB/NetCDF decode) or pre-downloaded files via era5_files=...; SARAH
archives work the same way with module="sarah", sarah_dir=... .

Run:  python examples/create_cutout_and_generate.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import pandas as pd

import atlite_tpu
from atlite_tpu.gis.geometry import box

cutout = atlite_tpu.Cutout(
    "/tmp/example-western-europe-2013-01",
    module="synthetic",
    x=slice(-13.7, 1.8), y=slice(49.8, 60.3),
    time="2013-01-01",
)
cutout.prepare()
print(cutout)

# per-cell capacity-factor series
cf = cutout.wind("Vestas_V112_3MW", aggregate_time=None)
print("\nwind CF: mean", float(np.asarray(cf.values).mean()))

# aggregate to two regions with per-unit normalisation
regions = pd.Series({
    "north": box(-13.7, 55.0, 1.8, 60.3),
    "south": box(-13.7, 49.8, 1.8, 55.0),
})
wind = cutout.wind("Vestas_V112_3MW", shapes=regions, per_unit=True,
                   aggregate_time=None)
print("\nregional wind CF (p.u.):")
print(wind.to_pandas().T.describe().loc[["mean", "max"]])

pv = cutout.pv(panel="CSi", orientation="latitude_optimal",
               shapes=regions, per_unit=True, aggregate_time=None)
print("\nregional PV CF (p.u.):")
print(pv.to_pandas().T.describe().loc[["mean", "max"]])

# cutouts too large for device memory stream in time chunks; adding
# stream_pack="int16" stages each chunk CF-packed (half the host->device
# wire bytes, quantization <=3e-3 relative — see PERF.md)
wind_streamed = cutout.wind("Vestas_V112_3MW", shapes=regions, per_unit=True,
                            aggregate_time=None, time_chunk=12,
                            stream_pack="int16")
drift = float(np.abs(np.asarray(wind_streamed.values)
                     - np.asarray(wind.values)).max())
print(f"\nstreamed int16-packed wind CF: max deviation {drift:.2e}")
