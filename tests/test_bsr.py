"""Block-sparse aggregation (BSR spmm) — scan and Pallas paths."""

import jax.experimental.pallas as pl
import numpy as np
import pytest
import scipy.sparse as sp

from atlite_tpu.ops import bsr_spmm as bs


@pytest.fixture(scope="module")
def case():
    rng = np.random.default_rng(0)
    B, C, T = 37, 3000, 100
    m = sp.random(B, C, density=0.02, random_state=1, format="csr")
    flat = rng.random((T, C)).astype(np.float32)
    expected = flat @ m.toarray().T.astype(np.float32)
    return m, flat, expected


def test_to_bsr_reconstructs(case):
    m, _, _ = case
    bsr = bs.to_bsr(m, block_b=8, block_c=256)
    dense = np.zeros((bsr["B_pad"], bsr["C_pad"]), dtype=np.float32)
    for rb, cb, blk in zip(bsr["row_blk"], bsr["col_blk"], bsr["blocks"]):
        dense[rb * 8:(rb + 1) * 8, cb * 256:(cb + 1) * 256] += blk
    np.testing.assert_allclose(dense[: m.shape[0], : m.shape[1]],
                               m.toarray(), atol=1e-7)


def test_bsr_scan_matches_dense(case):
    m, flat, expected = case
    bsr = bs.to_bsr(m, block_b=8, block_c=512)
    out = np.asarray(bs.bsr_spmm(bsr, flat))
    np.testing.assert_allclose(out, expected, rtol=1e-4, atol=1e-4)


def test_bsr_pallas_interpret_matches_dense(case, monkeypatch):
    m, flat, expected = case
    orig = pl.pallas_call

    def interp(*a, **k):
        k.setdefault("interpret", True)
        return orig(*a, **k)

    monkeypatch.setattr(bs.pl if hasattr(bs, "pl") else pl, "pallas_call", interp)
    monkeypatch.setattr(pl, "pallas_call", interp)
    bsr = bs.to_bsr(m, block_b=8, block_c=512)
    out = np.asarray(bs.bsr_spmm_pallas(bsr, flat, time_tile=64))
    np.testing.assert_allclose(out, expected, rtol=1e-4, atol=1e-4)


def test_banded_matches_dense(case):
    m, flat, expected = case
    banded = bs.to_banded(m, block_b=16, align=256)
    out = np.asarray(bs.banded_spmm(banded, flat))
    np.testing.assert_allclose(out, expected, rtol=1e-4, atol=1e-4)


def test_banded_spatially_local():
    """Geographically-sorted region matrix: narrow bands, exact result."""
    rng = np.random.default_rng(3)
    B, Y, X, T = 40, 32, 48, 17
    C = Y * X
    rows, cols, vals = [], [], []
    for b in range(B):
        y0 = rng.integers(0, Y - 5)
        x0 = rng.integers(0, X - 5)
        cc = (np.arange(y0, y0 + 5)[:, None] * X
              + np.arange(x0, x0 + 5)[None, :]).ravel()
        rows += [b] * len(cc)
        cols += list(cc)
        vals += list(rng.random(len(cc)))
    m = sp.csr_matrix((vals, (rows, cols)), shape=(B, C))
    flat = rng.random((T, C)).astype(np.float32)
    banded = bs.to_banded(m, block_b=8, align=128)
    assert banded["W"] < C  # locality was actually exploited
    out = np.asarray(bs.banded_spmm(banded, flat))
    np.testing.assert_allclose(out, flat @ m.toarray().T.astype(np.float32),
                               rtol=1e-4, atol=1e-4)


def test_banded_empty_rows_and_order():
    m = sp.lil_matrix((5, 1000))
    m[0, 900] = 3.0  # out-of-order band starts exercise the sort
    m[2, 5] = 2.0
    m = m.tocsr()
    flat = np.ones((10, 1000), dtype=np.float32)
    banded = bs.to_banded(m, block_b=2, align=128)
    out = np.asarray(bs.banded_spmm(banded, flat))
    assert out.shape == (10, 5)
    np.testing.assert_allclose(out[:, 0], 3.0)
    np.testing.assert_allclose(out[:, 1], 0.0)
    np.testing.assert_allclose(out[:, 2], 2.0)
    np.testing.assert_allclose(out[:, 3:], 0.0)


def test_spmm_large_routes_banded():
    """aggregate.spmm takes the banded path above the dense limit."""
    from atlite_tpu import aggregate

    from atlite_tpu.ops.bsr_spmm import banded_width

    rng = np.random.default_rng(4)
    B, C, T = 256, 200_000, 7
    rows = np.repeat(np.arange(B), 50)
    # clip (not wrap) so every row's columns stay a narrow local range —
    # a %C wrap would give two rows full-width bands and defeat the routing
    cols = np.minimum(np.arange(B)[:, None] * 700
                      + rng.integers(0, 3000, (B, 50)), C - 1).ravel()
    m = sp.csr_matrix((np.ones(B * 50), (rows, cols)), shape=(B, C))
    assert B * C > aggregate._DENSE_LIMIT
    nb, W = banded_width(m)
    assert nb * 128 * W <= (B * C) // 2  # really takes the banded path
    flat = rng.random((T, C)).astype(np.float32)
    out = np.asarray(aggregate.spmm(m, flat))
    np.testing.assert_allclose(out, flat @ m.toarray().T.astype(np.float32),
                               rtol=1e-4, atol=1e-4)


def test_spmm_unbanded_routes_dense_chunks():
    """A large matrix with no band structure takes the streamed-dense
    fallback (and COO input is accepted)."""
    from atlite_tpu import aggregate

    rng = np.random.default_rng(5)
    B, C, T = 90, 400_000, 3
    rows = np.repeat(np.arange(B), 20)
    cols = rng.integers(0, C, B * 20)  # full-width rows
    m = sp.coo_matrix(
        (np.ones(B * 20, dtype=np.float32), (rows, cols)), shape=(B, C))
    assert B * C > aggregate._DENSE_LIMIT
    flat = rng.random((T, C)).astype(np.float32)
    out = np.asarray(aggregate.spmm(m, flat))
    np.testing.assert_allclose(out, flat @ m.toarray().T.astype(np.float32),
                               rtol=1e-4, atol=1e-4)


def test_bsr_empty_rows():
    # regions with no cells must yield zero rows
    m = sp.csr_matrix((3, 1000))
    m[1, 5] = 2.0
    flat = np.ones((10, 1000), dtype=np.float32)
    bsr = bs.to_bsr(m.tocsr())
    out = np.asarray(bs.bsr_spmm(bsr, flat))
    assert out.shape == (10, 3)
    np.testing.assert_allclose(out[:, 0], 0)
    np.testing.assert_allclose(out[:, 1], 2.0)


def test_bsr_pallas_empty_row_block_is_zero():
    """r5 review: a bus row block with no nonzero matrix blocks must
    return zeros — pallas_call leaves unvisited output blocks
    uninitialized, so the wrapper masks uncovered rows."""
    import scipy.sparse as sp

    from atlite_tpu.ops.bsr_spmm import bsr_spmm_pallas, to_bsr

    B, C, T, bb = 8, 32, 6, 4
    rng = np.random.default_rng(3)
    # rows 4..7 (= the second 4-row block) entirely empty
    m = sp.csr_matrix(
        (rng.random(16), (np.repeat(np.arange(4), 4),
                          rng.choice(C, 16, replace=False))), shape=(B, C))
    bsr = to_bsr(m, block_b=bb, block_c=8)
    flat = rng.random((T, C)).astype(np.float32)
    import jax.numpy as jnp

    orig = pl.pallas_call

    def interp(*a, **k):
        k.setdefault("interpret", True)
        return orig(*a, **k)

    import unittest.mock as _mock

    with _mock.patch.object(pl, "pallas_call", interp):
        out = np.asarray(bsr_spmm_pallas(bsr, jnp.asarray(flat),
                                         time_tile=8))
    expected = flat @ m.toarray().T
    np.testing.assert_allclose(out, expected, rtol=1e-5, atol=1e-6)
    assert np.all(out[:, 4:] == 0.0)
