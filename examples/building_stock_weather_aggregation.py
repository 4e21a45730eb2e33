"""Building-stock weather aggregation: population-weighted temperature
and heat demand per region.

Mirrors the reference's "building_stock_weather_aggregation" example
notebook (reference examples/building_stock_weather_aggregation.ipynb):
aggregate gridded temperature with a building-stock/population layout so
each region's series reflects where the buildings actually are, then
derive degree-day heat demand per region.

Run:  python examples/building_stock_weather_aggregation.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import shutil

shutil.rmtree("/tmp/example-building-stock.atc", ignore_errors=True)  # start fresh

import numpy as np
import pandas as pd

import atlite_tpu
from atlite_tpu.gis.geometry import box

cutout = atlite_tpu.Cutout(
    "/tmp/example-building-stock", module="synthetic",
    x=slice(5.0, 15.0), y=slice(47.0, 55.0),
    time=slice("2013-01-01", "2013-01-31"),
)
cutout.prepare(features=["temperature", "influx"])

# two "countries", split at 51N
regions = pd.Series({
    "north": box(5.0, 51.0, 15.0, 55.0),
    "south": box(5.0, 47.0, 15.0, 51.0),
})

# a building-stock layout: population clustered around two city centres
Y, X = cutout.shape
lon = np.asarray(cutout.grid_desc.x)[None, :]
lat = np.asarray(cutout.grid_desc.y)[:, None]
pop = (np.exp(-((lon - 13.4) ** 2 + (lat - 52.5) ** 2) / 0.8)     # Berlin
       + np.exp(-((lon - 11.6) ** 2 + (lat - 48.1) ** 2) / 0.8))  # Munich
layout = cutout.uniform_layout() * 0 + pop

# population-weighted mean temperature per region: layout-weighted
# aggregation divided by the per-region layout total (per_unit)
temp = cutout.temperature(shapes=regions, layout=layout, per_unit=True,
                          aggregate_time=None)
print("population-weighted January temperature (degC):")
print(temp.to_pandas().T.describe().loc[["mean", "min", "max"]])

# naive area mean for comparison
temp_area = cutout.temperature(shapes=regions, per_unit=True,
                               aggregate_time=None)
delta = (temp.to_pandas().mean(axis=1) - temp_area.to_pandas().mean(axis=1))
print("\nweighted-minus-area-mean bias per region (degC):")
print(delta.round(3).to_string())

# degree-day heat demand per region, building-stock weighted (MW-scale
# units follow the layout magnitudes; reference convert.py:405-443)
demand = cutout.heat_demand(threshold=15.0, a=1.0, shapes=regions,
                            layout=layout, aggregate_time=None)
daily = demand.to_pandas()
print("\nheat demand (building-stock weighted, daily resample):")
print(daily.describe().T[["mean", "max"]].round(2).to_string())
