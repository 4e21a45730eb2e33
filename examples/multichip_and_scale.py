"""Scaling features: device mesh sharding, the batched device
land-eligibility engine, and the large-matrix banded aggregation.

Runs on whatever devices are visible:
- one real TPU chip -> 1x1 mesh (the code paths are identical),
- a virtual CPU mesh for multi-chip validation:
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/multichip_and_scale.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import pandas as pd
import scipy.sparse as sp

import jax

import atlite_tpu
from atlite_tpu.core.mesh import make_mesh, sharded_aggregate_banded
from atlite_tpu.gis.geometry import box

# --- cutout sharded over a ("t", "x") mesh --------------------------------
cutout = atlite_tpu.Cutout(
    path=None, module="synthetic",
    x=slice(-8, 7.75), y=slice(48, 55.75), time="2013-06",
)
cutout.prepare()

mesh = make_mesh(jax.devices())
print(f"mesh: {dict(mesh.shape)} over {len(jax.devices())} device(s)")
cutout.shard(mesh)  # fields placed P("t", None, "x"); converters run SPMD

regions = pd.Series({
    f"r{i}": box(-8 + 3 * i, 49, -5.5 + 3 * i, 54) for i in range(5)
}).rename_axis("region")
cf = cutout.pv(
    panel="CSi", orientation="latitude_optimal",
    shapes=regions, per_unit=True, aggregate_time=None,
)
print("sharded PV capacity factors (first hours):")
print(cf.to_pandas().iloc[:, 12:15].round(3))

# --- batched device land-eligibility --------------------------------------
from atlite_tpu import ExclusionContainer
from atlite_tpu.core.grid import Affine
from atlite_tpu.gis.raster import Raster

rng = np.random.default_rng(0)
landuse = Raster(rng.integers(1, 6, (800, 1600)).astype(np.uint8),
                 Affine(0.01, 0, -8.2, 0, -0.01, 56.2), 4326, 255)
excluder = ExclusionContainer(crs=4326, res=0.01)
excluder.add_raster(landuse, codes=[5])  # exclude one land-use class (~20%)

A = cutout.availabilitymatrix(regions, excluder, backend="device")
eligible = np.asarray(A.values.sum(axis=(1, 2)))  # eligible cells per region
print("eligible cell-equivalents per region:", np.round(eligible, 1),
      f"(~{0.8:.0%} of each region's cells: one of five codes excluded)")

# --- large-matrix aggregation: banded spmm over the mesh ------------------
Y, X = cutout.shape
B = 64
rows, cols, vals = [], [], []
for b in range(B):
    y0 = rng.integers(0, Y - 4)
    x0 = rng.integers(0, X - 4)
    cc = (np.arange(y0, y0 + 4)[:, None] * X
          + np.arange(x0, x0 + 4)[None, :]).ravel()
    rows += [b] * len(cc)
    cols += list(cc)
    vals += list(rng.random(len(cc)))
matrix = sp.csr_matrix((vals, (rows, cols)), shape=(B, Y * X))

if X % mesh.shape["x"] == 0:
    agg = sharded_aggregate_banded(mesh, matrix, Y, X, block_b=16, align=64)
    from jax.sharding import NamedSharding
    from atlite_tpu.core.mesh import field_spec

    field = np.asarray(cutout.fields()["temperature"])
    with mesh:
        out = agg(jax.device_put(field, NamedSharding(mesh, field_spec())))
    print("banded sharded aggregation:", np.asarray(out).shape,
          "finite:", np.isfinite(np.asarray(out)).all())
else:
    print("X does not divide the mesh x axis; skipping banded demo")
