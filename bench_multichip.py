"""Multi-chip scaling harness: one command on any mesh, real or virtual.

Runs the sharded flagship step (wind+PV CF + bus aggregation over a
("t","x") mesh — time data-parallel x spatial domain decomposition) and
the distributed banded aggregation at 1/2/.../N chips on a FIXED
workload, and emits the BASELINE.md scaling-efficiency rows as one JSON
line.  The moment real multi-chip hardware appears, the measurement is:

    python bench_multichip.py                      # all visible devices

Mechanics validated today on the virtual CPU mesh (tests/test_sharding.py
runs a reduced version):

    env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
      XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python bench_multichip.py --sizes 1,2,4,8 --repeats 2

Timing uses the same relay-proof pattern as bench.py: K chained passes
inside one jit (carry-perturbed small params so nothing hoists), two run
lengths differenced, single host readback sync.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def _chained_step(mesh, step, n):
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.sharding import NamedSharding, PartitionSpec as P

    @jax.jit
    def run(fields, eph, lon, lat, V, POWn, matrix):
        def body(carry, _):
            Vp = V + carry * 1e-30
            wb, pb = step(fields, eph, lon, lat, Vp, POWn, matrix)
            upd = (jnp.sum(wb) + jnp.sum(pb)) * 1e-30
            return carry + upd.astype(carry.dtype), None

        out, _ = lax.scan(body, jnp.float32(0.0), None, length=n)
        return out

    return run


def _step_args_on_mesh(mesh, put, T, Y, X, B):
    """Build and place the step inputs on ``mesh``; ``put(spec, array)``
    is jax.device_put-with-NamedSharding locally or
    comm.from_global_numpy across processes."""
    from jax.sharding import PartitionSpec as P

    import __graft_entry__ as ge
    from atlite_tpu.core.mesh import field_spec, table_spec

    t_size, x_size = mesh.shape["t"], mesh.shape["x"]
    assert T % t_size == 0 and X % x_size == 0, \
        f"workload {T}x{X} not divisible by mesh {t_size}x{x_size}"
    fields, eph, lon, lat, V, POWn, matrix = ge._example_inputs(
        T=T, Y=Y, X=X, B=B, seed=3)
    fields = {k: put(field_spec() if np.ndim(v) == 3 else P(None, "x"), v)
              for k, v in fields.items()}
    eph = {k: put(table_spec(), v) for k, v in eph.items()}
    return (fields, eph, put(P("x"), lon), put(P(), lat), put(P(), V),
            put(P(), POWn), put(P(), matrix))


def bench_step_at_size(n_dev, T, Y, X, B, repeats, mesh=None, put=None):
    """Throughput (cell-hours/s) of the sharded step on n_dev chips (or
    on a caller-provided process-spanning mesh)."""
    import jax
    from jax.sharding import NamedSharding

    import __graft_entry__ as ge
    from atlite_tpu.core.mesh import make_mesh

    if mesh is None:
        mesh = make_mesh(jax.devices()[:n_dev])
        put = lambda spec, a: jax.device_put(a, NamedSharding(mesh, spec))
    args = _step_args_on_mesh(mesh, put, T, Y, X, B)
    step = ge._step_fn()
    n1, n2 = 1, 5
    with mesh:
        r1 = _chained_step(mesh, step, n1)
        r2 = _chained_step(mesh, step, n2)
        float(r1(*args))
        float(r2(*args))

        def timed(run):
            best = np.inf
            for _ in range(repeats):
                t0 = time.perf_counter()
                float(run(*args))
                best = min(best, time.perf_counter() - t0)
            return best

        secs = (timed(r2) - timed(r1)) / (n2 - n1)
    return T * Y * X / secs, secs


def bench_banded_at_size(n_dev, T, Y, X, B, repeats):
    """ms/step of the distributed banded aggregation on n_dev chips."""
    import jax
    import jax.numpy as jnp
    import scipy.sparse as sp
    from jax import lax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from atlite_tpu.core.mesh import field_spec, make_mesh, \
        sharded_aggregate_banded

    devices = jax.devices()[:n_dev]
    mesh = make_mesh(devices)
    rng = np.random.default_rng(0)
    mat = sp.random(B, Y * X, density=0.02, random_state=1, format="csr")
    agg = sharded_aggregate_banded(mesh, mat, Y, X)
    field = rng.random((T, Y, X)).astype(np.float32)
    fspec = NamedSharding(mesh, field_spec())
    fdev = jax.device_put(field, fspec)

    def chained(n):
        @jax.jit
        def run(f):
            def body(carry, _):
                out = agg(f + carry * 1e-30)
                upd = jnp.sum(out) * 1e-30
                return carry + upd.astype(carry.dtype), None

            out, _ = lax.scan(body, jnp.float32(0.0), None, length=n)
            return out

        return run

    n1, n2 = 1, 5
    with mesh:
        r1, r2 = chained(n1), chained(n2)
        float(r1(fdev))
        float(r2(fdev))

        def timed(run):
            best = np.inf
            for _ in range(repeats):
                t0 = time.perf_counter()
                float(run(fdev))
                best = min(best, time.perf_counter() - t0)
            return best

        secs = (timed(r2) - timed(r1)) / (n2 - n1)
    return secs * 1e3


def run_worker(proc_id, nproc, port, args):
    """Multi-process mode: one timing pass over the process-spanning
    global mesh (jax.distributed); process 0 prints the JSON line."""
    import jax

    from atlite_tpu.core import comm

    comm.initialize(coordinator_address=f"localhost:{port}",
                    num_processes=nproc, process_id=proc_id)
    mesh = comm.global_mesh()
    put = lambda spec, a: comm.from_global_numpy(mesh, spec, a)
    thru, secs = bench_step_at_size(None, args.T, args.Y, args.X, args.B,
                                    args.repeats, mesh=mesh, put=put)
    if jax.process_index() == 0:
        print(json.dumps({
            "metric": "multihost-scaling (process-spanning mesh)",
            "workload": {"T": args.T, "Y": args.Y, "X": args.X, "B": args.B},
            "platform": jax.devices()[0].platform,
            "n_processes": nproc,
            "n_devices": jax.device_count(),
            "mesh": dict(mesh.shape),
            "step_cell_hours_per_s": round(thru, 1),
            "step_secs": round(secs, 6),
        }), flush=True)


def launch_processes(nproc, args):
    """Spawn nproc workers over virtual CPU devices (mechanics
    validation; on real multi-host hardware run one
    ``bench_multichip.py --worker i N coordinator:port`` per host)."""
    import os
    import socket
    import subprocess
    import sys
    import tempfile
    from pathlib import Path

    import jax

    n_local = max(1, len(jax.devices()) // nproc)
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    root = Path(__file__).resolve().parent
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={n_local}"
    env["PYTHONPATH"] = str(root) + os.pathsep + env.get("PYTHONPATH", "")
    logs = [tempfile.TemporaryFile(mode="w+", encoding="utf-8")
            for _ in range(nproc)]
    cmd_tail = ["--T", str(args.T), "--Y", str(args.Y), "--X", str(args.X),
                "--B", str(args.B), "--repeats", str(args.repeats)]
    procs = [subprocess.Popen(
        [sys.executable, str(root / "bench_multichip.py"),
         "--worker", f"{i},{nproc},{port}", *cmd_tail],
        stdout=logs[i], stderr=subprocess.STDOUT, env=env, cwd=root)
        for i in range(nproc)]
    try:
        for p in procs:
            p.wait(timeout=900)
        for i, (p, lf) in enumerate(zip(procs, logs)):
            lf.seek(0)
            out = lf.read()
            assert p.returncode == 0, f"worker {i} failed:\n{out}"
            if i == 0:
                for line in out.splitlines():
                    if line.startswith("{"):
                        print(line, flush=True)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
                p.wait()
        for lf in logs:
            lf.close()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default=None,
                    help="comma-separated chip counts (default 1,2,..,N)")
    ap.add_argument("--T", type=int, default=1344)
    ap.add_argument("--Y", type=int, default=64)
    ap.add_argument("--X", type=int, default=128)
    ap.add_argument("--B", type=int, default=20)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--processes", type=int, default=0,
                    help="spawn N jax.distributed processes over the "
                         "visible devices and measure the process-"
                         "spanning mesh")
    ap.add_argument("--worker", default=None,
                    help="internal: i,nproc,port")
    args = ap.parse_args()

    if args.worker:
        i, nproc, port = args.worker.split(",")
        run_worker(int(i), int(nproc), port, args)
        return
    if args.processes:
        launch_processes(args.processes, args)
        return

    import jax

    n_avail = len(jax.devices())
    if args.sizes:
        sizes = [int(s) for s in args.sizes.split(",")]
    else:
        sizes = [s for s in (1, 2, 4, 8, 16, 32, 64) if s <= n_avail]
    sizes = [s for s in sizes if s <= n_avail]

    result = {
        "metric": "multichip-scaling (wind+PV step + banded aggregation)",
        "workload": {"T": args.T, "Y": args.Y, "X": args.X, "B": args.B},
        "platform": jax.devices()[0].platform,
        "n_devices_visible": n_avail,
        "sizes": sizes,
        "step_cell_hours_per_s": {},
        "step_secs": {},
        "step_scaling_efficiency": {},
        "banded_agg_ms": {},
        "banded_scaling_efficiency": {},
    }
    base_thru = base_banded = None
    for s in sizes:
        thru, secs = bench_step_at_size(s, args.T, args.Y, args.X, args.B,
                                        args.repeats)
        banded_ms = bench_banded_at_size(s, args.T, args.Y, args.X,
                                         args.B, args.repeats)
        if base_thru is None:
            base_thru, base_banded = thru, banded_ms
        result["step_cell_hours_per_s"][s] = round(thru, 1)
        result["step_secs"][s] = round(secs, 6)
        result["step_scaling_efficiency"][s] = round(thru / (s * base_thru), 3)
        result["banded_agg_ms"][s] = round(banded_ms, 3)
        result["banded_scaling_efficiency"][s] = round(
            base_banded / (s * banded_ms), 3)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
