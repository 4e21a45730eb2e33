"""Hydro inflow, CSP generation and dynamic line rating in one script
(mirrors the remaining reference example notebooks).

Run:  python examples/hydro_csp_dlr.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import pandas as pd

import atlite_tpu
from atlite_tpu.gis.geometry import LineString, box

cutout = atlite_tpu.Cutout(
    "/tmp/example-hydro-csp", module="synthetic",
    x=slice(-4, 1.5), y=slice(56, 62),
    time=slice("2013-01-01", "2013-01-03"),
)
cutout.prepare()

# --- hydro: 3-basin cascade routed to one plant
hydrobasins = pd.DataFrame({
    "HYBAS_ID": [10, 20, 30],
    "NEXT_DOWN": [0, 10, 20],
    "DIST_MAIN": [100.0, 150.0, 230.0],
    "geometry": [
        box(-3.0, 56.5, -1.5, 58.0),
        box(-1.5, 56.5, 0.0, 58.0),
        box(0.0, 56.5, 1.5, 58.0),
    ],
})
plants = pd.DataFrame({"lon": [-2.25], "lat": [57.25]}, index=["dam_A"])
inflow = cutout.hydro(plants, hydrobasins, flowspeed=1)
print("hydro inflow [m^3/h]:")
print(inflow.to_pandas().T.describe().loc[["mean", "max"]])

# --- CSP solar tower
csp = cutout.csp("SAM_solar_tower", aggregate_time=None)
print("\nCSP specific generation: mean",
      round(float(np.asarray(csp.values).mean()), 4),
      "max", round(float(np.asarray(csp.values).max()), 4))

# --- dynamic line rating for two transmission corridors
lines = pd.Series({
    "west-east": LineString([(-3.5, 57.0), (1.0, 57.5)]),
    "south-north": LineString([(-1.5, 56.3), (-1.0, 61.5)]),
})
rating = cutout.line_rating(lines, line_resistance=1e-4)
print("\nline rating [A]:")
print(rating.to_pandas().T.describe().loc[["min", "mean", "max"]])
