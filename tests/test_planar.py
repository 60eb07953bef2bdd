"""Planar-deposit router engine vs a float64 host oracle (interpret mode).

Counterpart of test_router.py for the bucket-binned plane-deposit engine
(io/planar_format.py + PlanarSpMV): fused and split modes, both supported
semirings, the per-tile column re-layout (x-shuffle), and deposit splitting
at accumulator boundaries.
"""
import numpy as np
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow  # interpret-mode engine tests (see pytest.ini)

from graphlily_tpu import (ArithmeticSemiring, LogicalSemiring, MaskType,
                           EngineConfig)
from graphlily_tpu.io import rmat_csr, uniform_csr, util_round_csr_matrix_dim
from graphlily_tpu.io.planar_format import pack_planar
from graphlily_tpu.ops.router_pallas import PlanarSpMV

CFG = EngineConfig(interpret=True)


def oracle(csr, x, logical=False):
    work = csr.copy()
    util_round_csr_matrix_dim(work, 1024, 1024)
    y = np.zeros(work.num_rows, np.float64)
    rr = work.row_ids().astype(np.int64)
    cc = work.adj_indices[:work.nnz].astype(np.int64)
    vv = work.adj_data[:work.nnz].astype(np.float64)
    if logical:
        np.logical_or.at(y, rr, (vv != 0) & (x[cc] != 0))
        return y.astype(np.float64)
    np.add.at(y, rr, vv * x[cc])
    return y


@pytest.mark.parametrize("fused", [True, False], ids=["fused", "split"])
@pytest.mark.parametrize("semiring", [ArithmeticSemiring, LogicalSemiring],
                         ids=lambda s: s.name)
def test_planar_semirings(semiring, fused, rng):
    csr = rmat_csr(num_rows=9000, nnz=60000, seed=3)
    lay = pack_planar(csr, CFG)
    eng = PlanarSpMV(lay, semiring, CFG)
    eng.fused = fused
    x = rng.random(lay.num_cols).astype(np.float32)
    x[rng.random(lay.num_cols) < 0.3] = 0.0
    y = np.asarray(eng(jnp.asarray(x)))
    if semiring is LogicalSemiring:
        np.testing.assert_array_equal(
            y, oracle(csr, x, logical=True))
    else:
        want = oracle(csr, x)
        np.testing.assert_allclose(y, want, rtol=2e-3, atol=2e-3)


def test_planar_masks(rng):
    from graphlily_tpu.semiring import apply_mask
    csr = rmat_csr(num_rows=6000, nnz=40000, seed=4)
    lay = pack_planar(csr, CFG)
    x = rng.random(lay.num_cols).astype(np.float32)
    mask = (rng.random(lay.num_rows) < 0.5).astype(np.float32)
    want = oracle(csr, x).astype(np.float32)
    for mt in (MaskType.WRITE_TO_ZERO, MaskType.WRITE_TO_ONE):
        eng = PlanarSpMV(lay, ArithmeticSemiring, CFG, mt)
        y = np.asarray(eng(jnp.asarray(x), jnp.asarray(mask)))
        wm = np.asarray(apply_mask(jnp.asarray(want), jnp.asarray(mask), mt,
                                   ArithmeticSemiring.zero))
        np.testing.assert_allclose(y, wm, rtol=2e-3, atol=2e-3)


def test_planar_region_sizes(rng):
    """Small regions force many accumulators, cross-boundary deposit splits,
    and multi-region hub tiles."""
    csr = rmat_csr(num_rows=20000, nnz=80000, seed=7)
    for rrows in (1024, 4096):
        lay = pack_planar(csr, CFG, region_rows=rrows)
        assert lay.region_rows == rrows
        eng = PlanarSpMV(lay, ArithmeticSemiring, CFG)
        x = rng.random(lay.num_cols).astype(np.float32)
        y = np.asarray(eng(jnp.asarray(x)))
        np.testing.assert_allclose(y, oracle(csr, x), rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("fused", [True, False], ids=["fused", "split"])
def test_planar_predicated_sparse_frontier(fused, rng):
    """SpMSpV predication: with tiles_active masking inactive-tile deposits
    (ops/router_pallas._predicate_rg), the result must still match the
    oracle exactly — skipped deposits contribute zero because x is zero on
    inactive tiles and accumulators are zeroed at flush."""
    csr = rmat_csr(num_rows=4000, nnz=24000, seed=5)
    lay = pack_planar(csr, CFG)
    eng = PlanarSpMV(lay, ArithmeticSemiring, CFG)
    eng.fused = fused
    nct = lay.num_cols // 1024
    for sparsity in (0.5, 0.999):
        x = np.zeros(lay.num_cols, np.float32)
        nnz_vec = max(1, int(round(lay.num_cols * (1 - sparsity))))
        idx = rng.choice(lay.num_cols, size=nnz_vec, replace=False)
        x[idx] = rng.random(nnz_vec).astype(np.float32) + 0.5
        act = jnp.asarray(np.any(x.reshape(nct, -1) != 0, axis=1))
        y = np.asarray(eng(jnp.asarray(x), tiles_active=act))
        np.testing.assert_allclose(y, oracle(csr, x), rtol=2e-3, atol=2e-3)


def test_planar_looped_kernel(rng):
    """Block-unrolled descriptor-loop kernel (ops/router_pallas,
    _make_planar_kernel_looped) matches the fully-unrolled kernel's
    results — it is the fused-mode default for rstep > 48 where full
    unroll hits the Mosaic compile blowup (split mode always fully
    unrolls: measured 19 ns vs 148 ns per deposit)."""
    csr = rmat_csr(num_rows=1500, nnz=6000, seed=11)
    lay = pack_planar(csr, CFG)
    eng = PlanarSpMV(lay, ArithmeticSemiring, CFG)
    eng._looped = True
    eng.fused = True
    x = rng.random(lay.num_cols).astype(np.float32)
    y = np.asarray(eng(jnp.asarray(x)))
    np.testing.assert_allclose(y, oracle(csr, x), rtol=2e-3, atol=2e-3)


def test_planar_predicated_all_inactive(rng):
    """An all-zero frontier must produce an all-zero result (every deposit
    masked; flushes drain zeros)."""
    csr = rmat_csr(num_rows=5000, nnz=30000, seed=6)
    lay = pack_planar(csr, CFG)
    eng = PlanarSpMV(lay, ArithmeticSemiring, CFG)
    nct = lay.num_cols // 1024
    x = jnp.zeros(lay.num_cols, jnp.float32)
    y = np.asarray(eng(x, tiles_active=jnp.zeros(nct, bool)))
    np.testing.assert_array_equal(y, 0.0)


def test_planar_fill_balanced():
    """The per-tile column re-layout keeps chunk fill high even though RMAT
    hub columns concentrate whole physical buckets (snake re-layout measured
    28% -> ~78% on the benchmark stand-ins)."""
    csr = rmat_csr(num_rows=20000, nnz=200000, seed=8)
    lay = pack_planar(csr, CFG)
    assert lay.fill_a > 0.6, lay.fill_a
    csr2 = uniform_csr(20000, 20000, 10, seed=9)
    lay2 = pack_planar(csr2, CFG)
    assert lay2.fill_a > 0.8, lay2.fill_a


# ---- deal="free" (v4: chained phase-A gather + quota-dealt sublanes) -------

@pytest.mark.parametrize("fused", [True, False], ids=["fused", "split"])
@pytest.mark.parametrize("semiring", [ArithmeticSemiring, LogicalSemiring],
                         ids=lambda s: s.name)
def test_planar_free_deal_semirings(semiring, fused, rng):
    csr = rmat_csr(num_rows=9000, nnz=60000, seed=3)
    lay = pack_planar(csr, CFG, deal="free")
    assert lay.a_sub is not None and lay.xperm.shape[0] == 0
    eng = PlanarSpMV(lay, semiring, CFG)
    eng.fused = fused
    x = rng.random(lay.num_cols).astype(np.float32)
    if semiring is LogicalSemiring:
        x = (x < 0.3).astype(np.float32)
    y = np.asarray(eng(jnp.asarray(x)))
    want = oracle(csr, x, logical=semiring is LogicalSemiring)
    np.testing.assert_allclose(y[:csr.num_rows], want[:csr.num_rows],
                               rtol=2e-3, atol=2e-3)


def test_planar_free_deal_hub_columns(rng):
    """Hub columns (the motivation for the free deal: a bucket-bound hub
    pins its elements to one sublane, collapsing flush fill to ~0.5) spread
    across sublanes and still reduce exactly."""
    n = 4096
    csr = rmat_csr(num_rows=n, nnz=30000, seed=11)
    work = csr.copy()
    util_round_csr_matrix_dim(work, 1024, 1024)
    # graft two mega-columns: every row points at cols 7 and 1300
    rows = np.arange(0, n, 2, dtype=np.int64)
    import graphlily_tpu.io.matrix as m
    coo_r = np.concatenate([work.row_ids(), rows, rows])
    coo_c = np.concatenate([work.adj_indices[:work.nnz],
                            np.full(len(rows), 7), np.full(len(rows), 1300)])
    coo_v = np.concatenate([work.adj_data[:work.nnz],
                            rng.random(len(rows)).astype(np.float32),
                            rng.random(len(rows)).astype(np.float32)])
    hub = m.csr_from_coo(coo_r, coo_c, coo_v, work.num_rows, work.num_cols)
    lay = pack_planar(hub, CFG, deal="free")
    nf = int((lay.rg[..., 1] < 0).sum())
    assert hub.nnz / (nf * 1024) > 0.7, "free deal should keep flushes full"
    eng = PlanarSpMV(lay, ArithmeticSemiring, CFG)
    x = rng.random(lay.num_cols).astype(np.float32)
    y = np.asarray(eng(jnp.asarray(x)))
    np.testing.assert_allclose(y, oracle(hub, x), rtol=2e-3, atol=2e-3)


def test_planar_free_deal_predicated(rng):
    csr = rmat_csr(num_rows=5000, nnz=40000, seed=5)
    lay = pack_planar(csr, CFG, deal="free")
    eng = PlanarSpMV(lay, ArithmeticSemiring, CFG)
    nct = lay.num_cols // 1024
    act = (rng.random(nct) < 0.3)
    x = rng.random(lay.num_cols).astype(np.float32)
    x = x * np.repeat(act, 1024).astype(np.float32)
    y = np.asarray(eng(jnp.asarray(x),
                       tiles_active=jnp.asarray(act.astype(np.int32))))
    np.testing.assert_allclose(y[:csr.num_rows], oracle(csr, x)[:csr.num_rows],
                               rtol=2e-3, atol=2e-3)
