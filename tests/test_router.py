"""Router SpMV engine vs the XLA oracle (interpret mode on CPU).

Counterpart of the chunked-kernel tests in test_spmv_pallas.py for the
scalable gather->scatter->reduce engine (ops/router_pallas.py), including
multi-region outputs (rows > 16384), the adversarial mod-128 conflict
fixture, and hub pages that span many regions (range-heavy schedules).
"""
import numpy as np
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow  # interpret-mode engine tests (see pytest.ini)

from graphlily_tpu import (ArithmeticSemiring, LogicalSemiring, MaskType,
                           EngineConfig)
from graphlily_tpu.io import (uniform_csr, dense_csr, conflict_csr, rmat_csr,
                              util_round_csr_matrix_dim)
from graphlily_tpu.io.router_format import pack_router
from graphlily_tpu.ops import coo_from_csr, spmv_coo
from graphlily_tpu.ops.router_pallas import RouterSpMV


def run_both(csr, semiring, mask_type, rng, config=None):
    config = config or EngineConfig(interpret=True)
    lay = pack_router(csr, config)
    eng = RouterSpMV(lay, semiring, config, mask_type)
    x = rng.random(lay.num_cols).astype(np.float32) + 0.5
    x[rng.random(lay.num_cols) < 0.3] = 0.0
    mask = (rng.random(lay.num_rows) < 0.5).astype(np.float32)
    y = np.asarray(eng(jnp.asarray(x), jnp.asarray(mask)))
    padded = csr.copy()
    util_round_csr_matrix_dim(padded, 1024, 1024)
    coo = coo_from_csr(padded)
    want = np.asarray(spmv_coo(coo, jnp.asarray(x), semiring,
                               jnp.asarray(mask), mask_type))
    return y, want, lay


@pytest.mark.parametrize("semiring", [ArithmeticSemiring, LogicalSemiring],
                         ids=lambda s: s.name)
@pytest.mark.parametrize("mask_type",
                         [MaskType.NO_MASK, MaskType.WRITE_TO_ZERO,
                          MaskType.WRITE_TO_ONE], ids=lambda m: m.name)
def test_router_semirings_masks(semiring, mask_type, rng):
    csr = uniform_csr(1500, 1500, 4, seed=21)
    y, want, _ = run_both(csr, semiring, mask_type, rng)
    np.testing.assert_allclose(y, want, rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("maker,kw", [
    (dense_csr, dict(num_rows=256, num_cols=256)),
    (conflict_csr, dict(num_rows=1024, num_cols=2048)),
    (rmat_csr, dict(num_rows=3000, nnz=40000, seed=5)),
    (uniform_csr, dict(num_rows=900, num_cols=2100, degree=3, seed=6)),
])
def test_router_shapes(maker, kw, rng):
    csr = maker(**kw)
    y, want, _ = run_both(csr, ArithmeticSemiring, MaskType.NO_MASK, rng)
    np.testing.assert_allclose(y, want, rtol=2e-3, atol=2e-3)


def test_router_multi_region(rng):
    """rows > 16384 -> multiple radix regions; hub page spans them all."""
    csr = uniform_csr(20000, 20000, 3, seed=11)
    y, want, lay = run_both(csr, ArithmeticSemiring, MaskType.NO_MASK, rng)
    assert lay.num_regions == 2
    np.testing.assert_allclose(y, want, rtol=2e-3, atol=2e-3)


def test_router_hub_page(rng):
    """One 128-col page receives edges from rows all over a 40K-row space:
    every A-chunk of that page spans both regions repeatedly (range-heavy,
    many accumulator switches and splits)."""
    rng2 = np.random.default_rng(4)
    n = 40000
    rows = rng2.integers(0, n, 6000)
    cols = rng2.integers(0, 128, 6000)      # all in page 0
    vals = rng2.random(6000).astype(np.float32)
    order = np.lexsort((cols, rows))
    rows, cols, vals = rows[order], cols[order], vals[order]
    # dedupe (row, col) pairs so the oracle scatter matches
    key = rows * 128 + cols
    keep = np.ones(len(key), bool)
    keep[1:] = key[1:] != key[:-1]
    rows, cols, vals = rows[keep], cols[keep], vals[keep]
    indptr = np.zeros(n + 1, np.int64)
    np.add.at(indptr, rows + 1, 1)
    from graphlily_tpu.io.matrix import CSRMatrix
    csr = CSRMatrix(n, n, vals, cols.astype(np.uint32),
                    np.cumsum(indptr).astype(np.uint32))
    y, want, lay = run_both(csr, ArithmeticSemiring, MaskType.NO_MASK, rng)
    assert lay.num_regions == 3
    np.testing.assert_allclose(y, want, rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("region_rows", [1024, 4096, 16384])
def test_router_region_sizes(region_rows, rng):
    """Explicit radix region heights (the perf tuning knob): same results."""
    csr = rmat_csr(num_rows=20000, nnz=120000, seed=9)
    config = EngineConfig(interpret=True)
    lay = pack_router(csr, config, region_rows=region_rows)
    assert lay.region_rows == region_rows
    eng = RouterSpMV(lay, ArithmeticSemiring, config)
    x = rng.random(lay.num_cols).astype(np.float32)
    y = np.asarray(eng(jnp.asarray(x)))
    padded = csr.copy()
    util_round_csr_matrix_dim(padded, 1024, 1024)
    want = np.asarray(spmv_coo(coo_from_csr(padded), jnp.asarray(x),
                               ArithmeticSemiring))
    np.testing.assert_allclose(y, want, rtol=2e-3, atol=2e-3)


def test_router_fill_quality():
    """The point of the router: fill depends only on nnz-per-128-col-page
    (ceil waste of each page's final chunk), NOT on (row-window x col-tile)
    density like the chunked layout. degree 4 -> 512 els/page -> ~0.5 fill
    even though the chunked layout would be <10%; degree 24 -> ~3K els/page
    -> >0.85 (benchmark graphs have 8K+ els/page -> ~0.99)."""
    csr = uniform_csr(50000, 50000, 4, seed=3)
    lay = pack_router(csr, EngineConfig(interpret=True))
    assert lay.fill_a > 0.45, lay.fill_a
    csr2 = uniform_csr(50000, 50000, 24, seed=3)
    lay2 = pack_router(csr2, EngineConfig(interpret=True))
    assert lay2.fill_a > 0.85, lay2.fill_a
    assert lay2.fill_stream > 0.55, lay2.fill_stream


@pytest.mark.parametrize("fused", [True, False], ids=["fused", "split"])
def test_router_predicated_sparse_frontier(fused, rng):
    """SpMSpV predication on the roll router: masking inactive-tile deposit
    descriptors (_predicate_rg) must not change results — accumulators are
    zeroed at flush, so skipped ranges drain true zeros."""
    config = EngineConfig(interpret=True)
    csr = rmat_csr(num_rows=2000, nnz=20000, seed=15)
    lay = pack_router(csr, config)
    eng = RouterSpMV(lay, ArithmeticSemiring, config)
    eng.fused = fused
    nct = lay.num_cols // 1024
    for sparsity in (0.5, 0.99):
        x = np.zeros(lay.num_cols, np.float32)
        nnz_vec = max(1, int(round(lay.num_cols * (1 - sparsity))))
        idx = rng.choice(lay.num_cols, size=nnz_vec, replace=False)
        x[idx] = rng.random(nnz_vec).astype(np.float32) + 0.5
        act = jnp.asarray(np.any(x.reshape(nct, -1) != 0, axis=1))
        y = np.asarray(eng(jnp.asarray(x), tiles_active=act))
        padded = csr.copy()
        util_round_csr_matrix_dim(padded, 1024, 1024)
        want = np.asarray(spmv_coo(coo_from_csr(padded), jnp.asarray(x),
                                   ArithmeticSemiring, None,
                                   MaskType.NO_MASK))
        np.testing.assert_allclose(y, want, rtol=2e-3, atol=2e-3)


def test_router_predicated_page_granular(rng):
    """Page-granular (128-col) predication — the roll flavor's natural unit
    (each A-chunk holds one page; _chunk_activity recovers the page from the
    chunk-constant a_sub plane) — must agree with tile-granular predication
    and with the dense run bit-for-bit: finer masking only skips work whose
    contribution is exactly zero."""
    config = EngineConfig(interpret=True)
    csr = rmat_csr(num_rows=2000, nnz=20000, seed=16)
    lay = pack_router(csr, config)
    eng = RouterSpMV(lay, ArithmeticSemiring, config)
    nct = lay.num_cols // 1024
    for sparsity in (0.9, 0.999):
        x = np.zeros(lay.num_cols, np.float32)
        nnz_vec = max(1, int(round(lay.num_cols * (1 - sparsity))))
        idx = rng.choice(lay.num_cols, size=nnz_vec, replace=False)
        x[idx] = rng.random(nnz_vec).astype(np.float32) + 0.5
        pages = jnp.asarray(np.any(x.reshape(nct * 8, -1) != 0, axis=1))
        tiles = jnp.asarray(np.any(x.reshape(nct, -1) != 0, axis=1))
        y_page = np.asarray(eng(jnp.asarray(x), tiles_active=pages))
        y_tile = np.asarray(eng(jnp.asarray(x), tiles_active=tiles))
        y_dense = np.asarray(eng(jnp.asarray(x)))
        np.testing.assert_array_equal(y_page, y_dense)
        np.testing.assert_array_equal(y_tile, y_dense)
