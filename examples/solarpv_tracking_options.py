"""Solar PV tracking options: fixed vs 1-axis vs 2-axis trackers.

Mirrors the reference's "solarpv_tracking_options" example notebook
(reference examples/solarpv_tracking_options.ipynb; tracking modes
defined in reference atlite/pv/orientation.py:91-176): generate PV
capacity factors for every tracking mode on the same cutout and verify
the expected hierarchy dual >= single-axis >= fixed.

Run:  python examples/solarpv_tracking_options.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import shutil

shutil.rmtree("/tmp/example-tracking.atc", ignore_errors=True)  # start fresh

import numpy as np

import atlite_tpu

cutout = atlite_tpu.Cutout(
    "/tmp/example-tracking", module="synthetic",
    x=slice(-6.0, 4.0), y=slice(40.0, 48.0), dx=0.5, dy=0.5,
    time=slice("2013-07-01", "2013-07-07"),
)
cutout.prepare(features=["influx", "temperature"])

MODES = {
    "fixed (latitude-optimal tilt)": None,
    "horizontal 1-axis (E-W rotation)": "horizontal",
    "tilted horizontal 1-axis": "tilted_horizontal",
    "vertical 1-axis (azimuth drive)": "vertical",
    "dual 2-axis": "dual",
}

means = {}
for label, tracking in MODES.items():
    cf = cutout.pv(panel="CSi", orientation="latitude_optimal",
                   tracking=tracking, aggregate_time="mean")
    means[label] = float(np.asarray(cf.values).mean())

width = max(len(k) for k in means)
print("mean capacity factor over the July week:")
for label, value in means.items():
    print(f"  {label:<{width}}  {value:.4f}")

# the ordering the reference's notebook demonstrates (and
# test_preparation_and_conversion.py:155-223 pins)
assert means["dual 2-axis"] >= means["vertical 1-axis (azimuth drive)"]
assert means["vertical 1-axis (azimuth drive)"] >= means[
    "fixed (latitude-optimal tilt)"]
print("\ntracking hierarchy dual >= 1-axis >= fixed holds")
