"""Sparse spatial aggregation — the hot contraction of the framework.

Reference semantics: (N_bus x N_cell) csr_matrix times the (cell, time)
field (/root/reference/atlite/aggregate.py:16-35), where the reference
rechunks the full spatial plane into every dask task.

TPU-native design: the contraction routes by matrix structure —

- a dense f32 matmul on the MXU below ``_DENSE_LIMIT`` entries,
- the banded formulation (ops/bsr_spmm.to_banded) for large spatially
  local matrices,
- dense matmul streamed over row chunks when no band structure exists.

All paths are jit-compiled; the multi-chip variants (co-sharded einsum /
per-shard bands + psum over ICI) live in atlite_tpu.core.mesh.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from atlite_tpu.dataarray import DataArray

# Below this many matrix entries a dense MXU matmul wins outright (measured:
# dense 3.5 ms vs banded 7.5 ms at 512x49k/25M entries; the banded path's
# tile-gather overhead only pays off once dense stops fitting comfortably —
# at 4096x200k banded is 2x faster than streamed dense and 18x smaller).
_DENSE_LIMIT = 32 * 1024 * 1024


def spdiag(v):
    """Sparse diagonal matrix (reference gis.py:78-84)."""
    v = np.asarray(v).ravel()
    return sp.diags(v).tocsr()


@jax.jit
def _dense_spmm(flat_tc, dense_m, struct=None):
    """Dense-matrix aggregation with the reference's SPARSE NaN
    semantics: scipy's csr matmul skips structural zeros, so a NaN cell
    poisons only the buses whose region contains it — a plain dense
    matmul would spread it to EVERY bus (NaN * 0 = NaN).  Structure is
    taken as value != 0 (explicit stored zeros, which scipy would let
    propagate NaN, are indistinguishable after densification —
    documented divergence).  ``struct`` (the != 0 indicator) may be
    passed pre-staged (spmm_closure does) to skip recomputing it per
    call; dense_m is a traced argument, so the indicator cannot
    constant-fold on its own."""
    # accumulate at (at least) the input precision; on TPU f32 inputs this
    # keeps the MXU accumulator in f32
    acc = jnp.promote_types(flat_tc.dtype, jnp.float32)
    # UNCONDITIONAL formulation, deliberately no lax.cond: a cond
    # materializes its (T, C) operands and breaks producer fusion with
    # the physics pipeline — measured ~25% off the whole step; the
    # indicator matmul against the structure mask is MXU-cheap and the
    # isnan/where fuse into the producer.
    nan_mask = jnp.isnan(flat_tc)
    if struct is None:
        struct = (dense_m != 0).astype(acc)
    # precision=HIGHEST keeps f32 inputs from being truncated to bf16
    # on the MXU (measured ~6e-4 relative error otherwise)
    out = jnp.dot(jnp.where(nan_mask, 0, flat_tc), dense_m.T,
                  preferred_element_type=acc,
                  precision=jax.lax.Precision.HIGHEST)
    touched = jnp.dot(nan_mask.astype(acc), struct.T.astype(acc),
                      preferred_element_type=acc)
    return jnp.where(touched > 0, jnp.asarray(jnp.nan, dtype=out.dtype), out)


def spmm(matrix: sp.spmatrix, flat_tc):
    """Aggregate (T, C) cell series to (T, B) bus series with a host sparse
    matrix.

    Small matrices densify onto the MXU.  Large matrices use the banded
    path (ops/bsr_spmm.to_banded): rows sorted by column range, dense
    row-block bands, whole-tile gather + batched MXU matmul — it exploits
    the spatial locality of region matrices (each region's columns span a
    narrow contiguous range in y-major cell order) without the
    block-sparsity assumption, which measured terribly (BSR blocks are
    <1% full because regions shatter into one strip per y-row).  When the
    matrix has no band structure (W ~ C), fall back to dense matmul in
    row chunks.  Element gathers (jnp.take/segment-sum) are never chosen
    on TPU: measured 100-500x slower than block matmuls (PERF.md).
    """
    # one routing implementation: spmm_closure holds the dense-limit /
    # banded-probe / row-chunk decision tree, so streamed (per-chunk
    # closure) and unstreamed aggregation can never desynchronize.
    # resident=False: a one-shot call must stream row chunks through HBM
    # one at a time, not cache every chunk device-side at once.
    return spmm_closure(matrix, resident=False)(flat_tc)


def spmm_closure(matrix, resident=True):
    """Pre-staged device-side aggregation: returns ``f(flat_tc) -> (T, B)``
    with the matrix (dense / banded / row-chunked dense) resident in HBM
    after the first call.  The chunked streamer applies this per chunk so
    only the tiny (B, T_chunk) bus series ever crosses the wire back —
    without it the full (T_chunk, Y, X) field would be read back each
    chunk, which measured as half the streamed wire traffic (PERF.md).
    Staging is lazy and dtype-follows-input so the closure matches the
    unstreamed ``spmm`` numerics exactly (f64 under x64, f32 on TPU).

    ``resident=False`` (the one-shot ``spmm`` path) keeps the unbanded
    large-matrix fallback streaming: each dense row chunk is staged,
    used, and released instead of caching every chunk in HBM at once —
    a B x C matrix beyond the dense limit would otherwise occupy O(B*C)
    device memory."""
    matrix = sp.csr_matrix(matrix)
    B, C = matrix.shape

    if B * C <= _DENSE_LIMIT:
        state = {}

        def run(flat):
            flat = jnp.asarray(flat)
            if "dense" not in state or state["dt"] != flat.dtype:
                state["dt"] = flat.dtype
                dense = matrix.toarray()
                state["dense"] = jnp.asarray(dense, dtype=flat.dtype)
                acc = jnp.promote_types(flat.dtype, jnp.float32)
                state["struct"] = jnp.asarray(dense != 0, dtype=acc)
            return _dense_spmm(flat, state["dense"], state["struct"])

        return run

    from atlite_tpu.ops.bsr_spmm import banded_spmm, banded_width, to_banded

    nb, W = banded_width(matrix)
    block_b = 128
    if nb * block_b * W <= (B * C) // 2:
        from atlite_tpu.ops.bsr_spmm import stage_banded

        banded = to_banded(matrix, force_w=W or None)
        bstate = {}

        def run_banded(flat):
            # stage the banded structure ONCE (keyed by dtype); the NaN
            # semantics live in ops.bsr_spmm.banded_spmm — one
            # implementation, not two copies to keep in lockstep
            flat = jnp.asarray(flat)
            if "staged" not in bstate or bstate["dt"] != flat.dtype:
                bstate["dt"] = flat.dtype
                bstate["staged"] = stage_banded(banded, flat.dtype)
            return banded_spmm(banded, flat, staged=bstate["staged"])

        return run_banded

    row_chunk = max(1, _DENSE_LIMIT // C)
    state = {}

    def run_chunked(flat):
        flat = jnp.asarray(flat)
        if resident:
            if "blocks" not in state or state["dt"] != flat.dtype:
                state["dt"] = flat.dtype
                state["blocks"] = [
                    jnp.asarray(matrix[b0:b0 + row_chunk].toarray(),
                                dtype=flat.dtype)
                    for b0 in range(0, B, row_chunk)
                ]
            blocks = state["blocks"]
            return jnp.concatenate(
                [_dense_spmm(flat, blk) for blk in blocks], axis=1)
        # streaming: stage one row chunk at a time, peak ~2 chunks alive
        outs = []
        for b0 in range(0, B, row_chunk):
            blk = jnp.asarray(matrix[b0:b0 + row_chunk].toarray(),
                              dtype=flat.dtype)
            outs.append(_dense_spmm(flat, blk))
        return jnp.concatenate(outs, axis=1)

    return run_chunked


def aggregate_matrix(da, matrix, index=None, index_name="bus"):
    """Aggregate a (time, y, x) DataArray to (bus, time) with a sparse
    bus-x-cell matrix (reference aggregate.py:16-35).

    ``matrix`` is any scipy sparse (or dense array-like) with C = Y*X
    columns ordered row-major over (y, x) — the reference's
    ``stack(spatial=("y", "x"))`` ordering.
    """
    matrix = sp.csr_matrix(matrix)
    T = da.sizes["time"]
    v = da.values.reshape(T, -1)  # works for numpy and jax arrays alike
    out = np.asarray(spmm(matrix, v))  # (T, B)
    if index is None:
        import pandas as pd
        index = pd.RangeIndex(matrix.shape[0])
    name = getattr(index, "name", None) or index_name
    return DataArray(
        out.T,
        coords={name: index, "time": da.coords["time"]},
        dims=(name, "time"),
        attrs=da.attrs,
        name=da.name,
    )
