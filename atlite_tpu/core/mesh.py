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
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def put_global(arr, sharding):
    """device_put that also works when the sharding spans processes
    (multi-host meshes): each process materializes only its addressable
    shards via make_array_from_callback."""
    if jax.process_count() == 1:
        return jax.device_put(arr, sharding)
    arr = np.asarray(arr)
    return jax.make_array_from_callback(arr.shape, sharding,
                                        lambda idx: arr[idx])


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
    """Place a dict of arrays onto the mesh: (T,Y,X) fields on the
    ("t",None,"x") decomposition, (Y,X) statics on (None,"x"), (T,)
    tables on ("t").  Uses put_global so the same call works on
    process-spanning meshes."""
    fs = NamedSharding(mesh, field_spec())
    ss = NamedSharding(mesh, P(None, "x"))
    ts = NamedSharding(mesh, table_spec())

    def pick(v):
        nd = np.ndim(v)
        if nd == 3:
            return fs
        if nd == 2:
            # a (Y, X) static field sharded P('t') would split its Y
            # axis across the TIME mesh axis — wrong placement
            return ss
        return ts

    out = {k: put_global(v, pick(v)) for k, v in fields.items()}
    if tables is None:
        return out
    tabs = {k: put_global(v, ts) for k, v in tables.items()}
    return out, tabs


def halo_exchange(block, halo, axis_name="x"):
    """Exchange ``halo`` columns with ring neighbors along a mesh axis.

    ``block`` is the local shard (..., X_local) inside shard_map; returns
    (..., X_local + 2*halo) with neighbor columns appended (edge-replicated
    at the domain boundary).  This is the distributed analog of the
    reference's serial ``pad_extent`` (gis.py:233-260): stencils (regrid,
    rasterize) read past their shard boundary by the interpolation support.

    Uses ``ppermute`` — XLA lowers it to neighbor ICI transfers.
    """
    if halo == 0:
        return block  # block[..., -0:] would select the WHOLE block
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    right_edge = block[..., -halo:]
    left_edge = block[..., :halo]
    # send right edge to the right neighbor (they receive from their left)
    from_left = jax.lax.ppermute(right_edge, axis_name,
                                 [(i, (i + 1) % n) for i in range(n)])
    from_right = jax.lax.ppermute(left_edge, axis_name,
                                  [(i, (i - 1) % n) for i in range(n)])
    # replicate edges at the global domain boundary instead of wrapping
    from_left = jnp.where(idx == 0, jnp.repeat(block[..., :1], halo, -1), from_left)
    from_right = jnp.where(idx == n - 1, jnp.repeat(block[..., -1:], halo, -1),
                           from_right)
    return jnp.concatenate([from_left, block, from_right], axis=-1)


def sharded_regrid_bilinear(mesh, src_x, src_y, dst_x, dst_y, halo=None):
    """Build a jitted (T, Y, X)->(T, DY, DX) bilinear regrid over the
    ("t", "x") mesh with x domain decomposition + halo exchange.

    src/dst grids must be uniform and ascending; X and DX must divide the
    mesh's x axis.  The y interpolation stays local (y unsharded); the x
    interpolation reads up to ``halo`` columns past the shard boundary,
    provided by :func:`halo_exchange` (ICI neighbor transfer), overlapped
    by XLA with the local compute.

    Both interpolations are SEPARABLE MATRIX CONTRACTIONS (the repo's
    standard regrid formulation): a static (DY, Y) matrix for y and a
    per-shard (dx_local, x_local+2*halo) matrix stacked over shards and
    delivered through the mesh sharding — no dynamic gathers on the
    device path (CLAUDE.md rule; an earlier formulation indexed the
    padded columns with runtime offsets).
    """
    from jax import shard_map

    nx_shards = mesh.shape["x"]
    X, DX = len(src_x), len(dst_x)
    assert X % nx_shards == 0 and DX % nx_shards == 0
    x_local = X // nx_shards
    dx_local = DX // nx_shards

    # fractional source index of every dst column/row (edge-clamped like
    # the serial regrid's mode='edge' padding)
    fx = np.interp(np.asarray(dst_x), np.asarray(src_x), np.arange(X))
    fy = np.interp(np.asarray(dst_y), np.asarray(src_y), np.arange(len(src_y)))
    # the halo each shard actually needs is determined by how far ITS dst
    # columns reach into src-index space — not by the spacing ratio alone:
    # a dst grid offset from the src extent needs columns far outside the
    # local shard, and silently min()-clamping the halo would interpolate
    # edge garbage there (r4 review finding)
    needed = 0
    for i in range(nx_shards):
        fi = fx[i * dx_local:(i + 1) * dx_local]
        if fi.size == 0:
            continue
        needed = max(
            needed,
            int(np.ceil(i * x_local - np.floor(fi.min()))),
            int(np.ceil(fi.max() + 1 - (i + 1) * x_local)),
        )
    needed = max(needed, 0)
    if halo is None:
        halo = needed + 1
    elif halo < needed:
        raise ValueError(
            f"halo={halo} too small: dst columns reach {needed} src "
            "columns past their shard")
    if halo > x_local:
        raise ValueError(
            f"required halo {halo} exceeds the local shard width "
            f"{x_local}: the dst grid is too offset from the src domain "
            "decomposition — regrid unsharded or use fewer x shards")

    Ysrc, DY = len(src_y), len(dst_y)
    # y interpolation matrix (DY, Ysrc), static and replicated
    y0 = np.clip(np.floor(fy).astype(np.int64), 0, Ysrc - 2)
    wy = np.clip(fy - y0, 0.0, 1.0)
    My = np.zeros((DY, Ysrc))
    My[np.arange(DY), y0] = 1.0 - wy
    My[np.arange(DY), y0 + 1] += wy

    # per-shard x interpolation matrices over the halo-padded local
    # columns, stacked (nxs, dx_local, x_local + 2*halo) and sharded over
    # "x" so each device receives exactly its own matrix
    wpad = x_local + 2 * halo
    Mx = np.zeros((nx_shards, dx_local, wpad))
    for i in range(nx_shards):
        rel = fx[i * dx_local:(i + 1) * dx_local] - i * x_local + halo
        x0 = np.clip(np.floor(rel).astype(np.int64), 0, wpad - 2)
        wx = np.clip(rel - x0, 0.0, 1.0)
        Mx[i, np.arange(dx_local), x0] = 1.0 - wx
        Mx[i, np.arange(dx_local), x0 + 1] += wx

    My_d = jnp.asarray(My)
    Mx_d = put_global(Mx, NamedSharding(mesh, P("x")))

    @partial(
        shard_map, mesh=mesh,
        in_specs=(P("t", None, "x"), P("x")),
        out_specs=P("t", None, "x"),
        check_vma=False,
    )
    def _regrid(block, mx_l):
        padded = halo_exchange(block, halo, "x")  # (t, Y, x_local + 2h)
        gy = jnp.einsum("dy,tyx->tdx", My_d.astype(block.dtype), padded,
                        precision=jax.lax.Precision.HIGHEST)
        return jnp.einsum("ox,tdx->tdo", mx_l[0].astype(block.dtype), gy,
                          precision=jax.lax.Precision.HIGHEST)

    regrid = jax.jit(_regrid)
    return lambda field: regrid(field, Mx_d)


def sharded_aggregate_banded(mesh, matrix, Y, X, block_b=128, align=256):
    """Distributed large-matrix bus aggregation: (T, Y, X) -> (T, B).

    The production spmm formulation (ops/bsr_spmm.to_banded: rows sorted
    by column range, dense row-block bands, whole-tile gather + batched
    MXU matmul) composed with the ("t", "x") mesh: the matrix's columns
    are split by x shard, each shard builds its own banded structure over
    its local cells (padded to a common band width so every device runs
    the same program), and shard partials combine with ONE psum over the
    ICI "x" axis.  Time stays sharded end-to-end.  This is the multi-chip
    path for matrices too large to densify (4096 buses x 200k cells and
    beyond).

    NaN semantics match the single-device banded path (and the
    reference): a NaN cell poisons exactly the buses whose rows touch it
    — the kernel contracts a NaN indicator against the band STRUCTURE
    alongside the numeric part (one extra matmul, same tradeoff
    aggregate._dense_spmm makes).
    """
    import scipy.sparse as sp
    from jax import shard_map

    from atlite_tpu.ops.bsr_spmm import banded_width, to_banded

    nxs = mesh.shape["x"]
    B = matrix.shape[0]
    assert X % nxs == 0, f"X={X} must divide the mesh x axis ({nxs})"
    if matrix.shape[1] != Y * X:
        raise ValueError(
            f"matrix has {matrix.shape[1]} columns but the grid has "
            f"{Y}*{X}={Y * X} cells — a mismatched matrix would silently "
            "drop columns")
    xloc = X // nxs
    csc = sp.csc_matrix(matrix)

    shards = []
    for s in range(nxs):
        cols = (np.arange(Y)[:, None] * X
                + s * xloc + np.arange(xloc)[None, :]).ravel()
        shards.append(csc[:, cols])
    # common band width from the cheap probe (no double band materialization)
    W = max(banded_width(m, block_b=block_b, align=align)[1] for m in shards)
    W = max(-(-W // align) * align, align)
    banded = [to_banded(m, block_b=block_b, align=align, force_w=W)
              for m in shards]
    c_pad = max(b["C_pad"] for b in banded)
    nb, bb = banded[0]["nb"], block_b
    B_pad = nb * bb

    bands = np.stack([b["bands"] for b in banded])  # (nxs, nb, bb, W)
    tile_idx = np.stack([b["tile_idx"] for b in banded])
    inverse = np.stack([
        np.pad(b["inverse"], (0, B_pad - B), constant_values=B_pad - 1)
        for b in banded
    ]).astype(np.int32)

    xs = NamedSharding(mesh, P("x"))
    tidx_d = put_global(tile_idx, xs)
    inv_d = put_global(inverse, xs)

    @jax.jit
    @partial(
        shard_map, mesh=mesh,
        in_specs=(P("t", None, "x"), P("x"), P("x"), P("x"), P("x")),
        out_specs=P("t", None),
        check_vma=False,
    )
    def agg(field_block, bands_l, struct_l, tidx_l, inv_l):
        acc = field_block.dtype
        Tl = field_block.shape[0]
        flat = field_block.reshape(Tl, -1)  # local y-major (y, x_local) cells
        nanm = jnp.isnan(flat)
        flat0 = jnp.where(nanm, jnp.zeros((), acc), flat)

        def gather_tiles(f):
            fb = jnp.pad(f.T, ((0, c_pad - f.shape[1]), (0, 0)))
            fb = fb.reshape(-1, align, Tl)
            return fb[jnp.clip(tidx_l[0], 0, fb.shape[0] - 1)] \
                .reshape(nb, W, Tl)

        g = gather_tiles(flat0)
        part = jnp.einsum("nbw,nwt->nbt", bands_l[0], g,
                          preferred_element_type=acc,
                          precision=jax.lax.Precision.HIGHEST)
        gnan = gather_tiles(nanm.astype(acc))
        touched = jnp.einsum("nbw,nwt->nbt", struct_l[0], gnan,
                             preferred_element_type=acc,
                             precision=jax.lax.Precision.HIGHEST)
        out = part.reshape(B_pad, Tl)[inv_l[0]][:B].T
        tch = touched.reshape(B_pad, Tl)[inv_l[0]][:B].T
        out, tch = jax.lax.psum((out, tch), "x")  # (T_local, B)
        return jnp.where(tch > 0, jnp.asarray(jnp.nan, dtype=acc), out)

    # stage bands AT THE FIELD DTYPE: hardcoding f32 silently truncated
    # f64 aggregation weights under x64 (the exact regression to_banded
    # fixed for the single-device path, bsr_spmm.py).  The matrix's own
    # dtype is staged eagerly; a different field dtype restages once —
    # except inside another jit trace, where caching a traced device_put
    # would leak the tracer, so inline constants are used instead.
    def _stage(dt):
        return (put_global(np.asarray(bands, dt), xs),
                put_global((np.asarray(bands) != 0).astype(dt), xs))

    state = {"dt": np.dtype(bands.dtype)}
    state["bands"], state["struct"] = _stage(state["dt"])

    def run(field):
        dt = jnp.result_type(field)
        if dt != state["dt"]:
            import jax.core

            if isinstance(field, jax.core.Tracer):
                return agg(field, jnp.asarray(np.asarray(bands, dt)),
                           jnp.asarray((np.asarray(bands) != 0).astype(dt)),
                           tidx_d, inv_d)
            state["dt"] = dt
            state["bands"], state["struct"] = _stage(dt)
        return agg(field, state["bands"], state["struct"], tidx_d, inv_d)

    return run


def sharded_aggregate(mesh, matrix_dense, shape=None):
    """Return a jitted (T,Y,X)->(T,B) bus aggregation for a dense matrix.

    The contraction is expressed directly over the (y, x) plane —
    ``einsum("tyx,byx->tb")`` — so the cell axis never has to be
    re-materialized: with the field sharded P("t", None, "x") and the
    matrix co-sharded P(None, None, "x") each device contracts its local
    columns and XLA inserts one psum over the "x" axis (ICI); a
    flatten-first formulation would instead force an all-to-all reshard
    of the whole field.  ``matrix_dense`` is (B, Y*X) row-major over
    (y, x) (the reference's stacked ordering) or (B, Y, X).

    NOTE: this sharded contraction spreads a NaN cell to every bus
    (NaN * 0-weight); the single-device aggregate.py paths implement the
    reference's sparse NaN semantics (only touching buses) — sanitize
    NaNs before sharded aggregation if that distinction matters.
    """
    matrix_dense = np.asarray(matrix_dense)
    if matrix_dense.ndim == 2 and shape is not None:
        matrix_dense = matrix_dense.reshape(matrix_dense.shape[0], *shape)
    out_spec = NamedSharding(mesh, P("t", None))
    m_sharding = NamedSharding(mesh, P(None, None, "x")
                               if matrix_dense.ndim == 3 else P(None, None))

    @partial(jax.jit, out_shardings=out_spec)
    def agg(field_tyx, matrix):
        if matrix.ndim == 3:
            return jnp.einsum("tyx,byx->tb", field_tyx, matrix,
                              precision=jax.lax.Precision.HIGHEST)
        T = field_tyx.shape[0]
        flat = field_tyx.reshape(T, -1)
        return jnp.dot(flat, matrix.T,
                       precision=jax.lax.Precision.HIGHEST)

    matrix_dev = put_global(matrix_dense, m_sharding)
    return lambda field: agg(field, matrix_dev)
