"""Block-sparse spmm — the TPU-native form of the bus aggregation.

The reference's hot contraction is (N_bus x N_cell) csr times the dense
(cell, time) plane (/root/reference/atlite/aggregate.py:16-35).  On TPU,
element gathers are extremely slow and a fully dense matrix blows HBM for
country-scale runs (4000 buses x 200k cells ~ 3 GB).  But region/cell
matrices are spatially local: in y-major cell order every region touches a
narrow band of cells, so a blocked representation is nearly dense inside
few blocks and empty elsewhere.

This module provides:
- ``to_bsr``: host conversion csr -> (block_row, block_col, dense block)
  triplets with (bus_block x cell_block) dense tiles,
- ``bsr_spmm``: jit path — whole-tile gather + one batched MXU matmul +
  segment-sum (no element gathers, no scan: each lax.scan iteration costs
  ~300us of fixed overhead on this backend),
- ``bsr_spmm_scan``: lax.scan variant (lowest memory),
- ``bsr_spmm_pallas``: Pallas kernel with scalar-prefetched block indices
  so the (time-tile, nnz-block) grid DMAs exactly the needed field tile
  per step and accumulates in VMEM.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp


def to_bsr(matrix: sp.spmatrix, block_b=32, block_c=512):
    """Convert a (B, C) sparse matrix to dense nonzero blocks.

    Returns dict with 'row_blk' (K,), 'col_blk' (K,) int32 and 'blocks'
    (K, block_b, block_c) float32, plus padded sizes.  Blocks are sorted by
    row then column so the kernels revisit each output row block in one
    contiguous run.
    """
    B, C = matrix.shape
    nb = -(-B // block_b)
    nc = -(-C // block_c)
    coo = matrix.tocoo()
    rb = coo.row // block_b
    cb = coo.col // block_c
    keys = rb.astype(np.int64) * nc + cb
    uniq, inv = np.unique(keys, return_inverse=True)
    K = len(uniq)
    blocks = np.zeros((K, block_b, block_c), dtype=coo.data.dtype)
    blocks[inv, coo.row % block_b, coo.col % block_c] = coo.data
    row_blk = (uniq // nc).astype(np.int32)
    col_blk = (uniq % nc).astype(np.int32)
    order = np.lexsort((col_blk, row_blk))
    return {
        "row_blk": row_blk[order],
        "col_blk": col_blk[order],
        "blocks": blocks[order],
        "B": B, "C": C, "B_pad": nb * block_b, "C_pad": nc * block_c,
        "block_b": block_b, "block_c": block_c,
    }


@partial(jax.jit, static_argnames=("b_pad",))
def _bsr_scan(flat_ct, row_blk, col_blk, blocks, b_pad):
    """out[b, t] = sum over nonzero blocks of block @ flat[colblock].

    flat_ct: (C_pad, T).  Returns (B_pad, T).
    """
    T = flat_ct.shape[1]
    bb = blocks.shape[1]
    bc = blocks.shape[2]
    out = jnp.zeros((b_pad, T), dtype=flat_ct.dtype)

    def body(out, xs):
        rb, cb, blk = xs
        zero = jnp.zeros((), dtype=rb.dtype)
        tile = jax.lax.dynamic_slice(flat_ct, (cb * bc, zero), (bc, T))
        part = jnp.dot(blk, tile, preferred_element_type=flat_ct.dtype,
                       precision=jax.lax.Precision.HIGHEST)
        cur = jax.lax.dynamic_slice(out, (rb * bb, zero), (bb, T))
        return jax.lax.dynamic_update_slice(out, cur + part, (rb * bb, zero)), None

    out, _ = jax.lax.scan(body, out, (row_blk, col_blk, blocks))
    return out


@partial(jax.jit, static_argnames=("nb", "bc"))
def _bsr_batched(flat_tc, row_blk, col_blk, blocks, nb, bc):
    """Scanless BSR: tile-gather + batched MXU matmul + segment-sum.

    3x faster than the lax.scan formulation on TPU (each scan iteration
    carries ~300us of fixed overhead on this backend); the tile gather
    moves whole (bc, T) blocks, not elements, so it stays bandwidth-shaped.
    """
    T = flat_tc.shape[0]
    flat_blocks = jnp.pad(
        flat_tc.T, ((0, (-flat_tc.shape[1]) % bc), (0, 0))
    ).reshape(-1, bc, T)
    gathered = flat_blocks[col_blk]  # (K, bc, T)
    part = jnp.einsum("kbc,kct->kbt", blocks, gathered,
                      preferred_element_type=flat_tc.dtype,
                      precision=jax.lax.Precision.HIGHEST)
    out = jax.ops.segment_sum(part, row_blk, num_segments=nb)
    return out.reshape(-1, T)


def bsr_spmm(bsr, flat_tc):
    """Aggregate (T, C) -> (T, B) with a BSR matrix (see to_bsr)."""
    flat_tc = jnp.asarray(flat_tc)
    nb = bsr["B_pad"] // bsr["block_b"]
    out = _bsr_batched(
        flat_tc, jnp.asarray(bsr["row_blk"]), jnp.asarray(bsr["col_blk"]),
        jnp.asarray(bsr["blocks"], dtype=flat_tc.dtype), nb, bsr["block_c"],
    )
    return out[: bsr["B"]].T


def bsr_spmm_scan(bsr, flat_tc):
    """lax.scan variant (lowest memory; slower per the scan overhead)."""
    T, C = flat_tc.shape
    flat_ct = jnp.pad(jnp.asarray(flat_tc).T, ((0, bsr["C_pad"] - C), (0, 0)))
    out = _bsr_scan(
        flat_ct,
        jnp.asarray(bsr["row_blk"]), jnp.asarray(bsr["col_blk"]),
        jnp.asarray(bsr["blocks"], dtype=flat_ct.dtype), bsr["B_pad"],
    )
    return out[: bsr["B"]].T


# ---------------------------------------------------------------------------
# Banded formulation — the production large-matrix path
# ---------------------------------------------------------------------------
def _band_layout(csr, block_b, align):
    """Shared banding geometry: per-row column ranges, the row sort, and
    per-block aligned [start, end) windows.  ONE implementation so the
    cheap width probe (banded_width) and the band builder (to_banded)
    can never disagree on the banding rule."""
    B = csr.shape[0]
    nb = -(-B // block_b)
    c0 = np.zeros(B, dtype=np.int64)
    c1 = np.ones(B, dtype=np.int64)
    for r in range(B):
        cols = csr.indices[csr.indptr[r]:csr.indptr[r + 1]]
        if len(cols):
            c0[r], c1[r] = cols.min(), cols.max() + 1
    order = np.argsort(c0, kind="stable")
    starts = np.zeros(nb, dtype=np.int64)
    ends = np.zeros(nb, dtype=np.int64)
    for b in range(nb):
        rows = order[b * block_b:(b + 1) * block_b]
        starts[b] = (c0[rows].min() // align) * align
        ends[b] = -(-c1[rows].max() // align) * align
    return nb, order, starts, ends


def banded_width(matrix: sp.spmatrix, block_b=128, align=512):
    """(nb, W) of the banded representation WITHOUT materializing bands —
    cheap O(nnz) pass so callers can route dense-vs-banded before paying
    the O(nb*block_b*W) band allocation (which is ~B*C for unbanded
    matrices — crash-scale at country size)."""
    nb, _, starts, ends = _band_layout(matrix.tocsr(), block_b, align)
    return nb, int((ends - starts).max())


def to_banded(matrix: sp.spmatrix, block_b=128, align=512, force_w=None):
    """Convert a (B, C) sparse matrix to sorted dense row-block bands.

    Region/cell matrices are spatially local, but in y-major flat cell
    order each region shatters into one thin strip per y-row — so BSR
    blocks are ~0.3% full and block-sparse tiling loses to dense matmul
    outright (measured: every BSR variant 600-1300 ms where dense takes
    ~2 ms at 512x49k).  What IS exploitable is that each region's nonzero
    COLUMNS span a narrow contiguous range.  Sort rows by range start,
    group into ``block_b`` row blocks, and store each block's columns
    densely over the block's union range, padded to a common width W
    aligned to ``align``:

    - 'bands' (nb, block_b, W) dense band blocks (matrix dtype),
    - 'tile_idx' (nb, W/align) int32 aligned field-tile indices,
    - 'order'/'inverse' row permutations.

    The contraction is then a whole-tile gather + one batched MXU matmul
    (see banded_spmm) with B*W*T*2 flops instead of dense's B*C*T*2.
    """
    B, C = matrix.shape
    csr = matrix.tocsr()
    B_pad = -(-B // block_b) * block_b
    nb, order, starts, ends = _band_layout(csr, block_b, align)
    inverse = np.argsort(order)
    W = int((ends - starts).max())
    if force_w is not None:
        # common band width across shards (sharded aggregation); gathers
        # past C_pad clamp to the last tile and meet zero band entries
        assert force_w % align == 0 and force_w >= W
        W = force_w
    n_tiles = W // align

    # keep the matrix's own dtype: hardcoding f32 silently truncated
    # aggregation weights under x64 (spmm_closure promises dense-path
    # numerics; cf. to_bsr which keeps coo.data.dtype)
    bands = np.zeros((nb, block_b, W), dtype=csr.dtype)
    coo = csr.tocoo()
    rpos = inverse[coo.row]  # position in sorted order
    blk = rpos // block_b
    bands[blk, rpos % block_b, coo.col - starts[blk]] = coo.data

    C_pad = -(-max(C, int(ends.max())) // align) * align
    tile_idx = (starts[:, None] // align
                + np.arange(n_tiles)[None, :]).astype(np.int32)
    return {
        "bands": bands, "tile_idx": tile_idx,
        "order": order, "inverse": inverse,
        "B": B, "C": C, "C_pad": int(C_pad), "W": W,
        "block_b": block_b, "align": align, "nb": nb,
    }


@partial(jax.jit, static_argnames=("align", "c_pad"))
def _banded_spmm(flat_tc, bands, tile_idx, inverse, align, c_pad):
    T = flat_tc.shape[0]
    nb, bb, W = bands.shape
    fb = jnp.pad(flat_tc.T, ((0, c_pad - flat_tc.shape[1]), (0, 0)))
    fb = fb.reshape(-1, align, T)  # (C_pad/align, align, T)
    g = fb[tile_idx]  # (nb, W/align, align, T) — whole-tile gather
    g = g.reshape(nb, W, T)
    out = jnp.einsum("nbw,nwt->nbt", bands, g,
                     preferred_element_type=flat_tc.dtype,
                     precision=jax.lax.Precision.HIGHEST)
    out = out.reshape(nb * bb, T)
    return out[inverse]  # back to caller row order


def stage_banded(banded, dtype):
    """Upload a banded structure's device arrays once (keyed by dtype by
    the caller); returns the (bands, tile_idx, inverse) triple
    banded_spmm consumes."""
    bands = jnp.asarray(banded["bands"], dtype=dtype)
    tidx = jnp.asarray(banded["tile_idx"])
    inv = jnp.asarray(
        np.pad(banded["inverse"],
               (0, banded["nb"] * banded["block_b"] - banded["B"]),
               constant_values=banded["nb"] * banded["block_b"] - 1)
    )
    return bands, tidx, inv


def banded_spmm(banded, flat_tc, staged=None):
    """Aggregate (T, C) -> (T, B) with a banded matrix (see to_banded).

    Reference sparse NaN semantics: a NaN cell must poison only buses
    whose rows hold an entry there (scipy csr skips structural zeros) —
    the dense band blocks would otherwise spread it across the whole
    128-row block.  The indicator pass runs only when a NaN is present
    (lax.cond; unlike the fused dense path the banded operands are
    materialized either way, so the cond costs no fusion).

    ``staged`` takes a pre-uploaded stage_banded() triple — THE single
    implementation of these semantics, reused by aggregate.spmm_closure's
    resident branch."""
    flat_tc = jnp.asarray(flat_tc)
    if staged is None:
        staged = stage_banded(banded, flat_tc.dtype)
    bands, tidx, inv = staged
    kw = dict(align=banded["align"], c_pad=banded["C_pad"])
    nan_mask = jnp.isnan(flat_tc)

    def with_nans(_):
        out = _banded_spmm(jnp.where(nan_mask, 0, flat_tc), bands, tidx,
                           inv, **kw)
        touched = _banded_spmm(nan_mask.astype(flat_tc.dtype),
                               (bands != 0).astype(flat_tc.dtype), tidx,
                               inv, **kw)
        return jnp.where(touched > 0,
                         jnp.asarray(jnp.nan, dtype=out.dtype), out)

    out = jax.lax.cond(
        jnp.any(nan_mask), with_nans,
        lambda _: _banded_spmm(flat_tc, bands, tidx, inv, **kw), None)
    return out[: banded["B"]].T


# ---------------------------------------------------------------------------
# Pallas kernel
# ---------------------------------------------------------------------------
def bsr_spmm_pallas(bsr, flat_tc, time_tile=256):
    """Pallas BSR spmm: grid over (nnz blocks x time tiles) with
    scalar-prefetched block coordinates driving the BlockSpec index maps.

    The field tile (block_c, time_tile) and the matrix block stream through
    VMEM (double-buffered by the Pallas pipeline); the output row block is
    revisited across the k-grid and accumulated in place.
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    T, C = flat_tc.shape
    bb, bc = bsr["block_b"], bsr["block_c"]
    K = len(bsr["row_blk"])
    nt = -(-T // time_tile)
    T_pad = nt * time_tile
    flat_ct = jnp.pad(jnp.asarray(flat_tc).T,
                      ((0, bsr["C_pad"] - C), (0, T_pad - T)))
    row_blk = jnp.asarray(bsr["row_blk"])
    col_blk = jnp.asarray(bsr["col_blk"])
    blocks = jnp.asarray(bsr["blocks"], dtype=flat_ct.dtype)

    def kernel(row_ref, col_ref, blk_ref, field_ref, out_ref):
        # grid = (nt, K): k iterates fastest, so runs of equal rows[k]
        # revisit the same output block consecutively and accumulate in
        # VMEM; zero it when a new row block begins.
        k = pl.program_id(1)
        is_first = k == 0
        prev_same = jnp.logical_and(
            k > 0, row_ref[jnp.maximum(k - 1, 0)] == row_ref[k]
        )

        @pl.when(jnp.logical_or(is_first, jnp.logical_not(prev_same)))
        def _():
            out_ref[...] = jnp.zeros_like(out_ref)

        out_ref[...] += jnp.dot(blk_ref[...], field_ref[...],
                                preferred_element_type=out_ref.dtype,
                                precision=jax.lax.Precision.HIGHEST)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # row_blk, col_blk
        grid=(nt, K),
        in_specs=[
            pl.BlockSpec((None, bb, bc), lambda t, k, rows, cols: (k, 0, 0)),
            pl.BlockSpec((bc, time_tile), lambda t, k, rows, cols: (cols[k], t)),
        ],
        out_specs=pl.BlockSpec((bb, time_tile),
                               lambda t, k, rows, cols: (rows[k], t)),
    )

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bsr["B_pad"], T_pad), flat_ct.dtype),
    )(row_blk, col_blk, blocks, flat_ct)
    # pallas_call does NOT zero its output buffer and the kernel only
    # writes row blocks that own at least one nonzero matrix block: a
    # fully-empty bus row block would otherwise return uninitialized
    # memory.  Mask with the (static) covered-rows indicator — where, not
    # multiply, since uninitialized bytes can be NaN.
    covered = np.zeros(bsr["B_pad"] // bb, dtype=bool)
    covered[np.asarray(bsr["row_blk"])] = True
    if not covered.all():
        rows_ok = jnp.asarray(np.repeat(covered, bb))
        out = jnp.where(rows_ok[:, None], out, jnp.zeros((), out.dtype))
    return out[: bsr["B"], :T].T
