"""Multi-host (multi-process) execution layer.

The reference has no distributed backend at all — its widest parallelism
is a single-node dask threadpool + a multiprocessing pool (SURVEY §5.8).
This module is the new architectural element: process-spanning meshes over
DCN with the same ("t", "x") decomposition as single-host — time (the
embarrassingly parallel axis) is split across processes so DCN carries no
per-step traffic; the "x" spatial axis (aggregation psum, halo exchange)
stays inside each process's devices (ICI on real pods).

Usage (one call per process, before any other jax use):

    from atlite_tpu.core import comm
    comm.initialize()                      # env-driven, or pass explicitly
    mesh = comm.global_mesh()              # spans all processes
    arr = comm.from_global_numpy(mesh, spec, np_array)
    ...
    result = comm.allgather(out)           # full array on every host

Tested with 2 processes x 4 virtual CPU devices in
tests/test_multihost.py (sharded == single-device allclose).
"""

from __future__ import annotations

import logging
import os
from pathlib import Path

import numpy as np

logger = logging.getLogger(__name__)


def initialize(coordinator_address=None, num_processes=None, process_id=None,
               **kwargs):
    """Idempotent wrapper around jax.distributed.initialize.

    Arguments default to the JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
    JAX_PROCESS_ID environment variables (also set by most cluster
    launchers); a no-op when none are provided (single process) or when
    already initialized."""
    global _initialized
    if _initialized:
        return
    import jax

    # a user may legitimately have called jax.distributed.initialize()
    # directly (mesh.py's docstring suggests it) — honor the promise of
    # idempotence against JAX's own state, not just this module's flag
    if getattr(jax.distributed, "is_initialized", lambda: False)() or \
            getattr(getattr(jax.distributed, "global_state", None),
                    "client", None) is not None:
        _initialized = True
        return
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])
    if coordinator_address is None and num_processes in (None, 1):
        return  # single-process run
    import jax

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes, process_id=process_id, **kwargs,
    )
    _initialized = True
    logger.info("jax.distributed initialized: process %d/%d, %d local / %d "
                "global devices", jax.process_index(), jax.process_count(),
                jax.local_device_count(), jax.device_count())


_initialized = False


def process_count():
    import jax

    return jax.process_count()


def is_primary():
    import jax

    return jax.process_index() == 0


def global_mesh(t_axis=None):
    """("t", "x") mesh over ALL processes' devices.

    The "x" axis is kept within a process (<= local device count) so the
    aggregation psum and halo ppermutes ride ICI; "t" spans processes —
    time shards are independent, so DCN carries no per-step collective
    traffic (the SURVEY §5.8 design)."""
    import jax

    from atlite_tpu.core.mesh import make_mesh

    devices = jax.devices()
    n = len(devices)
    local = jax.local_device_count()
    if t_axis is None:
        # largest x that divides the local device count (and n)
        x_axis = next(x for x in range(local, 0, -1)
                      if local % x == 0 and n % x == 0)
        t_axis = n // x_axis
    return make_mesh(devices, t_axis=t_axis)


def from_global_numpy(mesh, spec, array):
    """Place a (host-replicated) global numpy array onto the mesh: every
    process materializes only its addressable shards.

    NOTE: the input array itself lives fully on every host.  For data
    already persisted in a cutout store use :func:`from_store`, which
    never materializes the global array anywhere."""
    from jax.sharding import NamedSharding

    from atlite_tpu.core.mesh import put_global

    return put_global(np.asarray(array), NamedSharding(mesh, spec))


# total bytes copied out of store mmaps by from_store callbacks in this
# process — observable for the "each host reads only its own time shard"
# IO-scatter guarantee (SURVEY §5.8; asserted by tests/multihost_worker.py)
SHARD_BYTES_READ = 0


def from_store(mesh, spec, store_path, var, dtype=None):
    """Shard a stored cutout variable onto the mesh with per-process IO.

    The variable's ``.npy`` file is opened as a memory map and the
    make_array_from_callback callback slices it per addressable shard —
    so each process faults in ONLY the pages of its own time/space shards
    (~1/n_processes of the file), never a host-replicated global array.
    This is the DCN IO-scatter half of SURVEY §5.8: the store is the
    shared filesystem artifact; the mesh placement decides which bytes
    each host touches.
    """
    import json

    import jax
    from jax.sharding import NamedSharding

    from atlite_tpu.core.store import MANIFEST, var_path

    path = Path(store_path)
    if path.suffix != ".atc" and (path.parent / (path.name + ".atc")).exists():
        path = path.parent / (path.name + ".atc")
    manifest = json.loads((path / MANIFEST).read_text())
    arr = np.load(var_path(path, manifest, var), mmap_mode="r")

    def cb(idx):
        global SHARD_BYTES_READ
        out = np.asarray(arr[idx])
        if dtype is not None:
            out = out.astype(dtype)
        SHARD_BYTES_READ += out.nbytes
        return out

    return jax.make_array_from_callback(arr.shape, NamedSharding(mesh, spec), cb)


def allgather(arr):
    """Fetch a (possibly multi-host sharded) array fully onto every host."""
    import jax

    if jax.process_count() == 1:
        return np.asarray(arr)
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(arr, tiled=True))


def barrier(name="barrier"):
    import jax

    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)
