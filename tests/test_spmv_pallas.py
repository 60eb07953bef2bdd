"""Pallas SpMV engine vs the XLA oracle (interpret mode on CPU).

TPU counterpart of the reference's hardware-unit testbenches
(tests/test_pe_cluster.cpp, tests/test_shuffle.cpp): the kernel is driven
directly against an independent implementation, including the adversarial
conflict fixture (all columns collide mod 128).
"""
import numpy as np
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow  # interpret-mode engine tests (see pytest.ini)

from graphlily_tpu import (ArithmeticSemiring, LogicalSemiring, TropicalSemiring,
                           MaskType, EngineConfig)
from graphlily_tpu.io import (uniform_csr, dense_csr, conflict_csr, rmat_csr,
                              pack_csr_chunks)
from graphlily_tpu.ops import coo_from_csr, spmv_coo
from graphlily_tpu.ops.spmv_pallas import PallasSpMV

SEMIRINGS = [ArithmeticSemiring, LogicalSemiring, TropicalSemiring]


def run_both(csr, semiring, mask_type, rng, config=None):
    config = config or EngineConfig(interpret=True)
    lay = pack_csr_chunks(csr, config, pad_val=semiring.zero)
    eng = PallasSpMV(lay, semiring, config, mask_type)
    x = rng.random(lay.num_cols).astype(np.float32) + 0.5
    x[rng.random(lay.num_cols) < 0.3] = semiring.zero
    mask = (rng.random(lay.num_rows) < 0.5).astype(np.float32)
    y = np.asarray(eng(jnp.asarray(x), jnp.asarray(mask)))
    # oracle on the same padded matrix
    padded = csr.copy()
    from graphlily_tpu.io import util_round_csr_matrix_dim
    util_round_csr_matrix_dim(padded, 1024, 1024)
    coo = coo_from_csr(padded)
    want = np.asarray(spmv_coo(coo, jnp.asarray(x), semiring,
                               jnp.asarray(mask), mask_type))
    return y, want


@pytest.mark.parametrize("semiring", SEMIRINGS, ids=lambda s: s.name)
@pytest.mark.parametrize("mask_type",
                         [MaskType.NO_MASK, MaskType.WRITE_TO_ZERO,
                          MaskType.WRITE_TO_ONE], ids=lambda m: m.name)
def test_pallas_spmv_semirings_masks(semiring, mask_type, rng):
    csr = uniform_csr(1500, 1500, 4, seed=21)
    y, want = run_both(csr, semiring, mask_type, rng)
    np.testing.assert_allclose(y, want, rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("maker,kw", [
    (dense_csr, dict(num_rows=256, num_cols=256)),
    (conflict_csr, dict(num_rows=1024, num_cols=2048)),
    (rmat_csr, dict(num_rows=3000, nnz=40000, seed=5)),
    (uniform_csr, dict(num_rows=900, num_cols=2100, degree=3, seed=6)),
])
def test_pallas_spmv_shapes(maker, kw, rng):
    csr = maker(**kw)
    y, want = run_both(csr, ArithmeticSemiring, MaskType.NO_MASK, rng)
    np.testing.assert_allclose(y, want, rtol=2e-3, atol=2e-3)


def test_pallas_spmv_empty_windows(rng):
    """Rows beyond 1024 empty -> filler chunks must still zero those windows."""
    csr = uniform_csr(100, 3000, 4, seed=9)  # only first 100 rows have nnz
    from graphlily_tpu.io import util_round_csr_matrix_dim
    util_round_csr_matrix_dim(csr, 4096, 1024)  # 4 window groups, 3 empty
    y, want = run_both(csr, ArithmeticSemiring, MaskType.NO_MASK, rng)
    np.testing.assert_allclose(y, want, rtol=2e-3, atol=2e-3)
    assert (y[1024:] == 0).all()


def test_pallas_spmv_tropical_empty_rows(rng):
    """Empty rows must produce the tropical zero (INF), not garbage."""
    csr = uniform_csr(64, 1024, 3, seed=10)
    y, want = run_both(csr, TropicalSemiring, MaskType.NO_MASK, rng)
    np.testing.assert_allclose(y, want, rtol=2e-3)
    from graphlily_tpu import FLOAT_INF
    assert (y[64:] == FLOAT_INF).all()


def test_pallas_spmv_tropical_conflict(rng):
    """Adversarial for the segmented-scan min reduce: every column collides
    mod 128, so row runs pack densely and span chunk boundaries (split runs
    must still min-combine correctly through the output window)."""
    csr = conflict_csr(num_rows=1024, num_cols=2048)
    y, want = run_both(csr, TropicalSemiring, MaskType.NO_MASK, rng)
    np.testing.assert_allclose(y, want, rtol=2e-3)


def test_pallas_spmv_tropical_hub_rows(rng):
    """One hub row with >128 nnz in a single col tile: its lane run fills
    whole chunks (run length == 128, the scan's worst case) and spans
    several; plus singleton rows around it."""
    rows = np.concatenate([np.zeros(700, np.int64),
                           np.arange(1, 300, dtype=np.int64)])
    rng2 = np.random.default_rng(3)
    cols = np.concatenate([rng2.integers(0, 1024, 700),
                           rng2.integers(0, 1024, 299)])
    vals = rng2.random(999).astype(np.float32)
    order = np.lexsort((cols, rows))
    rows, cols, vals = rows[order], cols[order], vals[order]
    indptr = np.zeros(1025, np.int64)
    np.add.at(indptr, rows + 1, 1)
    from graphlily_tpu.io.matrix import CSRMatrix
    csr = CSRMatrix(1024, 1024, vals, cols.astype(np.uint32),
                    np.cumsum(indptr).astype(np.uint32))
    y, want = run_both(csr, TropicalSemiring, MaskType.NO_MASK, rng)
    np.testing.assert_allclose(y, want, rtol=2e-3)


def test_pallas_spmv_resident_kernel(rng):
    """Force the resident (VMEM-whole, CB-batched) kernel variant in
    interpret mode and check it against the streamed one."""
    csr = uniform_csr(1200, 1100, 4, seed=33)
    cfg_res = EngineConfig(interpret=True, resident_kernel=True)
    y, want = run_both(csr, ArithmeticSemiring, MaskType.NO_MASK, rng,
                       config=cfg_res)
    np.testing.assert_allclose(y, want, rtol=2e-3, atol=2e-3)
    y2, want2 = run_both(csr, TropicalSemiring, MaskType.NO_MASK, rng,
                         config=EngineConfig(interpret=True,
                                             resident_kernel=True))
    np.testing.assert_allclose(y2, want2, rtol=2e-3, atol=2e-3)
