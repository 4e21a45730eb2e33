"""atlite_tpu — a TPU-native weather→energy conversion framework.

A from-scratch reimplementation of the capabilities of PyPSA/atlite
(reference: /root/reference/atlite/__init__.py:4-11) designed for
JAX/XLA/Pallas on TPU:

- weather fields live as HBM-resident (time, y, x) tensors,
- physics converters are fused, jit-compiled elementwise pipelines,
- spatial aggregation is a segment-sum sparse contraction (MXU/VPU),
- multi-chip scaling uses jax.sharding meshes with spatial domain
  decomposition (see atlite_tpu.core.mesh).

Public API mirrors the reference's top-level exports
(/root/reference/atlite/__init__.py:28-48).
"""

from atlite_tpu.aggregate import aggregate_matrix
from atlite_tpu.cutout import Cutout
from atlite_tpu.dataarray import DataArray
from atlite_tpu.gis.exclusion import ExclusionContainer
from atlite_tpu.gis.matrix import compute_indicatormatrix, compute_intersectionmatrix
from atlite_tpu.gis.regrid import regrid
from atlite_tpu.resource import (
    cspinstallations,
    get_cspinstallationconfig,
    get_solarpanelconfig,
    get_windturbineconfig,
    solarpanels,
    windturbine_smooth,
    windturbines,
)

__version__ = "0.1.0"

__all__ = [
    "Cutout",
    "DataArray",
    "ExclusionContainer",
    "aggregate_matrix",
    "compute_indicatormatrix",
    "compute_intersectionmatrix",
    "regrid",
    "windturbines",
    "solarpanels",
    "cspinstallations",
    "get_windturbineconfig",
    "get_solarpanelconfig",
    "get_cspinstallationconfig",
    "windturbine_smooth",
]
