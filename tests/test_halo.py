"""Halo exchange + sharded regrid vs serial results."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from atlite_tpu.core.mesh import halo_exchange, make_mesh, sharded_regrid_bilinear

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


def test_halo_exchange_values():
    from jax import shard_map
    from functools import partial

    mesh = make_mesh(jax.devices()[:8], t_axis=1)  # 8-way x
    X = 32
    arr = np.arange(X, dtype=np.float32)[None, None, :].repeat(2, 0)

    @partial(shard_map, mesh=mesh, in_specs=(P(None, None, "x"),),
             out_specs=P(None, None, "x"), check_vma=False)
    def f(block):
        return halo_exchange(block, 2, "x")[..., 2:-2]  # identity

    out = f(jnp.asarray(arr))
    np.testing.assert_array_equal(np.asarray(out), arr)

    @partial(shard_map, mesh=mesh, in_specs=(P(None, None, "x"),),
             out_specs=P(None, None, "x"), check_vma=False)
    def left_neighbor(block):
        padded = halo_exchange(block, 1, "x")
        return padded[..., :-2]  # value of the left neighbor of each column

    out = np.asarray(left_neighbor(jnp.asarray(arr)))[0, 0]
    expected = np.maximum(np.arange(X) - 1, 0)  # edge-replicated at x=0
    np.testing.assert_array_equal(out, expected)


def test_sharded_regrid_matches_serial():
    from atlite_tpu.dataarray import DataArray
    from atlite_tpu.gis.regrid import regrid

    mesh = make_mesh(jax.devices()[:8], t_axis=2)  # (t=2, x=4)
    T, Y, X = 4, 12, 32
    rng = np.random.default_rng(0)
    data = rng.random((T, Y, X)).astype(np.float32)
    src_x = np.arange(X, dtype=float) * 0.25 - 4 + 0.125
    src_y = np.arange(Y, dtype=float) * 0.25 + 50 + 0.125
    dst_x = np.linspace(src_x[0], src_x[-1], 16)
    dst_y = np.linspace(src_y[0], src_y[-1], 7)

    serial = regrid(
        DataArray(data.astype(float), coords={"time": range(T), "y": src_y,
                                              "x": src_x},
                  dims=("time", "y", "x")),
        dst_x, dst_y, resampling="bilinear",
    )

    fn = sharded_regrid_bilinear(mesh, src_x, src_y, dst_x, dst_y)
    with mesh:
        sharded = fn(jax.device_put(
            jnp.asarray(data), NamedSharding(mesh, P("t", None, "x"))
        ))
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(serial.values),
                               rtol=2e-6, atol=1e-6)


def test_halo_exchange_zero_is_noop():
    """r5 review: halo=0 must return the block unchanged (block[..., -0:]
    would otherwise select the whole block and crash the concat)."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P
    from functools import partial

    mesh = make_mesh(jax.devices()[:4], t_axis=1)
    a = np.arange(4 * 8, dtype=np.float32).reshape(4, 8)

    @partial(shard_map, mesh=mesh, in_specs=(P(None, "x"),),
             out_specs=P(None, "x"), check_vma=False)
    def f(block):
        return halo_exchange(block, 0, "x")

    with mesh:
        out = f(jax.device_put(
            a, jax.sharding.NamedSharding(mesh, P(None, "x"))))
    np.testing.assert_array_equal(np.asarray(out), a)
