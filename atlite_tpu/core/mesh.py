"""Device mesh, sharding rules and the distributed aggregation step.

The reference's only parallelism is a single-node dask threadpool plus a
multiprocessing pool (SURVEY §2.4); it explicitly rechunks the full spatial
plane into every aggregation task (reference aggregate.py:22-23).  This
module implements the opposite, TPU-native decomposition:

- a Mesh over ("t", "x"): time is the data-parallel axis, x the spatial
  domain decomposition (y stays local so the (y, x) plane reshapes cleanly
  to cells),
- field tensors (T, Y, X) shard as P("t", None, "x") — elementwise physics
  needs no communication at all,
- the bus aggregation contracts over cells: each shard computes partial
  bus sums over its local cells and XLA inserts the psum/reduce-scatter
  over ICI (GSPMD); time stays sharded end-to-end.

Multi-host: call jax.distributed.initialize() before make_mesh(); the same
code paths then span hosts with DCN handling only the "t" axis boundaries.
"""

from __future__ import annotations

from functools import partial

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices=None, t_axis=None):
    """Build a ("t", "x") mesh over the given (or all) devices.

    The time axis gets the larger factor by default — physics is
    embarrassingly parallel over time, and only the aggregation contracts
    over x.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if t_axis is None:
        # most balanced factorization n = t * x with t >= x
        t_axis = next(t for t in range(int(np.sqrt(n)), 0, -1) if n % t == 0)
        t_axis = n // t_axis
    x_axis = n // t_axis
    assert t_axis * x_axis == n, f"cannot factor {n} devices into (t={t_axis}, x)"
    arr = np.asarray(devices).reshape(t_axis, x_axis)
    return Mesh(arr, ("t", "x"))


def field_spec():
    """PartitionSpec for (T, Y, X) field tensors."""
    return P("t", None, "x")


def table_spec():
    """PartitionSpec for per-time (T,) ephemeris tables."""
    return P("t")


def shard_fields(mesh, fields, tables=None):
    """Place a dict of (T,Y,X) arrays (and (T,) tables) onto the mesh."""
    fs = NamedSharding(mesh, field_spec())
    ts = NamedSharding(mesh, table_spec())
    out = {k: jax.device_put(v, fs if np.ndim(v) == 3 else ts)
           for k, v in fields.items()}
    if tables is None:
        return out
    tabs = {k: jax.device_put(v, ts) for k, v in tables.items()}
    return out, tabs


def pad_to_multiple(arr, axis, multiple):
    """Zero-pad a dimension up to a multiple (shardable shapes)."""
    size = arr.shape[axis]
    pad = (-size) % multiple
    if pad == 0:
        return arr, size
    widths = [(0, 0)] * arr.ndim
    widths[axis] = (0, pad)
    return np.pad(arr, widths), size


def sharded_aggregate(mesh, matrix_dense):
    """Return a jitted (T,Y,X)->(T,B) bus aggregation for a dense matrix.

    The matrix is replicated; the contraction over cells runs as local
    partial matmuls + an XLA-inserted reduce over the "x" axis; the result
    keeps its time sharding.
    """
    out_spec = NamedSharding(mesh, P("t", None))
    m_sharding = NamedSharding(mesh, P(None, None))

    @partial(jax.jit, out_shardings=out_spec)
    def agg(field_tyx, matrix):
        T = field_tyx.shape[0]
        flat = field_tyx.reshape(T, -1)
        return flat @ matrix.T

    matrix_dev = jax.device_put(matrix_dense, m_sharding)
    return lambda field: agg(field, matrix_dev)
