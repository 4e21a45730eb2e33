"""Worker process for tests/test_multihost.py: runs the full sharded step
and the distributed banded aggregation on a process-spanning mesh and
checks them against a single-device computation.

Launched as:  python multihost_worker.py <process_id> <num_processes> <port>
with JAX_PLATFORMS=cpu and --xla_force_host_platform_device_count=<k>.
"""

import sys

import numpy as np


def main():
    proc_id, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    import jax

    from atlite_tpu.core import comm

    comm.initialize(coordinator_address=f"localhost:{port}",
                    num_processes=nproc, process_id=proc_id)
    assert jax.process_count() == nproc
    n_global = jax.device_count()
    n_local = jax.local_device_count()
    print(f"proc {proc_id}: {n_local} local / {n_global} global", flush=True)

    from jax.sharding import NamedSharding, PartitionSpec as P

    import __graft_entry__ as ge
    from atlite_tpu.core.mesh import field_spec, sharded_aggregate_banded, table_spec

    mesh = comm.global_mesh()
    assert mesh.shape["t"] % nproc == 0, mesh.shape
    t_size, x_size = mesh.shape["t"], mesh.shape["x"]

    T, Y, X, B = 4 * t_size, 8, 4 * x_size, 3
    fields, eph, lon, lat, V, POWn, matrix = ge._example_inputs(T=T, Y=Y, X=X, B=B)

    step = ge._step_fn()

    # --- single(-local)-device expectation
    dev0 = jax.local_devices()[0]
    put0 = lambda a: jax.device_put(a, dev0)
    with jax.default_device(dev0):
        exp_wind, exp_pv = jax.jit(step)(
            {k: put0(v) for k, v in fields.items()},
            {k: put0(v) for k, v in eph.items()},
            put0(lon), put0(lat), put0(V), put0(POWn), put0(matrix))
        exp_wind = np.asarray(exp_wind)
        exp_pv = np.asarray(exp_pv)

    # --- multi-host sharded execution
    fgl = lambda spec, a: comm.from_global_numpy(mesh, spec, a)
    fields_d = {k: fgl(field_spec() if np.ndim(v) == 3 else P(None, "x"), v)
                for k, v in fields.items()}
    eph_d = {k: fgl(table_spec(), v) for k, v in eph.items()}
    args = (fields_d, eph_d, fgl(P("x"), lon), fgl(P(), lat), fgl(P(), V),
            fgl(P(), POWn), fgl(P(), matrix))
    sharded = jax.jit(step, out_shardings=(NamedSharding(mesh, P("t", None)),) * 2)
    with mesh:
        wind_bus, pv_bus = sharded(*args)
    got_wind = comm.allgather(wind_bus)
    got_pv = comm.allgather(pv_bus)
    np.testing.assert_allclose(got_wind, exp_wind, rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(got_pv, exp_pv, rtol=2e-4, atol=1e-5)
    print(f"proc {proc_id}: STEP OK", flush=True)

    # --- distributed banded aggregation across processes
    import scipy.sparse as sp

    rng = np.random.default_rng(1)
    mat = sp.random(B, Y * X, density=0.15, random_state=2, format="csr")
    field = rng.random((T, Y, X)).astype(np.float32)
    agg = sharded_aggregate_banded(mesh, mat, Y, X, block_b=2, align=4)
    with mesh:
        out = agg(comm.from_global_numpy(mesh, field_spec(), field))
    got = comm.allgather(out)
    np.testing.assert_allclose(got, field.reshape(T, -1) @ mat.toarray().T,
                               rtol=1e-4, atol=1e-5)
    print(f"proc {proc_id}: AGG OK", flush=True)

    # --- IO scatter: per-process time-shard reads from the .atc store
    if len(sys.argv) > 4:
        store_path = sys.argv[4]
        import json
        from pathlib import Path

        var = "wnd100m"
        fn = Path(store_path) / f"{var}.npy"
        full = np.load(fn, mmap_mode="r")
        global_bytes = full.size * full.itemsize
        # process-local share of the global array under the field sharding:
        # "t" spans processes, "x" stays inside -> 1/n_processes
        before = comm.SHARD_BYTES_READ
        arr = comm.from_store(mesh, field_spec(), store_path, var)
        read = comm.SHARD_BYTES_READ - before
        expected = global_bytes // nproc
        assert read == expected, (
            f"proc {proc_id} read {read} bytes from the store, expected "
            f"exactly its 1/{nproc} time shard = {expected}"
        )
        # the sharded array still carries the right global values
        with mesh:
            total = jax.jit(lambda a: a.sum())(arr)
        np.testing.assert_allclose(float(np.asarray(total)),
                                   np.asarray(full, dtype=np.float64).sum(),
                                   rtol=1e-4)
        print(f"proc {proc_id}: STORE OK (read {read}/{global_bytes} bytes)",
              flush=True)

        # --- streamed pipeline END-TO-END (r4 verdict item 5): store
        # scatter -> sharded wind converter -> distributed banded
        # aggregation -> ONE (T, B) result, equal to a single device
        import jax.numpy as jnp

        from atlite_tpu.core.store import read_store
        from atlite_tpu.physics import wind as wind_kernels

        _, raw, _, _ = read_store(store_path)
        Ts, Ys, Xs = np.shape(raw["wnd100m"])
        wind_vars = ["wnd100m", "wnd10m", "roughness"]
        fields_s = {v: comm.from_store(mesh, field_spec(), store_path, v)
                    for v in wind_vars}
        V2 = np.arange(0.0, 26.0, 0.5, dtype=np.float32)
        POW2 = np.clip((V2**3 - 27.0) / (12.0**3 - 27.0), 0, 1).astype(np.float32)
        POW2[V2 >= 25.0] = 0.0
        mat2 = sp.random(5, Ys * Xs, density=0.2, random_state=3, format="csr")
        agg2 = sharded_aggregate_banded(mesh, mat2, Ys, Xs, block_b=2, align=4)

        def wind_cf(fl):
            hub = wind_kernels.extrapolate_wind_speed(fl, 80.0)
            return wind_kernels.power_curve(hub, jnp.asarray(V2),
                                            jnp.asarray(POW2), 1.0)

        with mesh:
            cf_s = jax.jit(wind_cf)(fields_s)
            out2 = agg2(cf_s)
        got2 = comm.allgather(out2)
        with jax.default_device(dev0):
            cf1 = jax.jit(wind_cf)(
                {v: put0(np.asarray(raw[v], dtype=np.float32))
                 for v in wind_vars})
        exp2 = np.asarray(cf1).reshape(Ts, -1) @ mat2.toarray().T
        np.testing.assert_allclose(got2, exp2, rtol=2e-4, atol=1e-5)
        print(f"proc {proc_id}: PIPELINE OK", flush=True)

    comm.barrier("done")
    print(f"proc {proc_id}: MULTIHOST OK", flush=True)


if __name__ == "__main__":
    main()
