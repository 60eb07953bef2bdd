"""Exact per-flush SpMSpV predication (_flush_index / _predicate_exact).

The window criterion (_steps_sm_na over _flush_minw) keeps every flush
whose live window holds ANY frontier-active chunk — first-cycle flushes
have window [0, t], so one active early page keeps every later first
flush, and each kept step pays its full phase-C batch. The exact criterion
masks a flush (w2 -> 0, code -> -1) unless a LIVE deposit targeted its
accumulator slot since the slot's previous flush. Correctness argument
(counterpart of the reference's active-column bursts,
hw/kernel_spmspv_impl.h:55-124): dead deposits never write (their
in-kernel masks are empty), flushes zero their slot, accumulators start
zeroed — a masked flush would have drained exactly zero.
"""
import numpy as np
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow  # interpret-mode engine tests (see pytest.ini)

from graphlily_tpu import ArithmeticSemiring, MaskType, EngineConfig
from graphlily_tpu.io import rmat_csr, util_round_csr_matrix_dim, csr2csc
from graphlily_tpu.io.router_format import pack_router
from graphlily_tpu.io.planar_format import pack_planar
from graphlily_tpu.ops import coo_from_csr, spmv_coo
from graphlily_tpu.ops.router_pallas import (
    RouterSpMV, PlanarSpMV, _flush_index, _predicate_exact, _chunk_activity,
    _steps_sm_na)


@pytest.fixture
def rng():
    return np.random.default_rng(77)


def _bruteforce_live_flushes(rg, dstep, live_dep):
    """Walk the descriptor stream in kernel order; a flush is live iff a
    live deposit wrote its slot since the slot's previous flush."""
    nsteps, rstep, _ = rg.shape
    slot_dirty = {}
    live = []
    for t in range(nsteps):
        for j in range(rstep):
            w2 = int(rg[t, j, 1])
            if j < dstep and w2 > 0 and live_dep[t, j]:
                slot_dirty[w2 & 0xFFF] = True
            elif w2 < 0:
                s = w2 & 0xFFF
                live.append(bool(slot_dirty.get(s, False)))
                slot_dirty[s] = False
    return np.asarray(live)


def test_flush_index_matches_bruteforce(rng):
    config = EngineConfig(interpret=True)
    csr = rmat_csr(num_rows=2000, nnz=20000, seed=21)
    lay = pack_router(csr, config)
    fidx = _flush_index(lay.rg, lay.dstep, lay.f)
    assert fidx is not None
    rg = np.asarray(lay.rg)
    w2 = rg[..., 1]
    for trial in range(3):
        act_d = rng.random(w2.shape) < (0.02, 0.2, 0.9)[trial]
        live_dep = (w2 > 0) & act_d
        want = _bruteforce_live_flushes(rg, lay.dstep, live_dep)
        da = np.take(live_dep.reshape(-1).astype(np.int64),
                     fidx["dep_flat"])
        cs0 = np.concatenate([[0], np.cumsum(da)])
        got = (cs0[fidx["fl_end"]] - cs0[fidx["fl_start"]]) > 0
        np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("fused", [True, False])
def test_roll_exact_flush_predication_matches_dense(fused, rng):
    config = EngineConfig(interpret=True)
    csr = rmat_csr(num_rows=2000, nnz=20000, seed=22)
    lay = pack_router(csr, config)
    eng = RouterSpMV(lay, ArithmeticSemiring, config)
    eng.fused = fused
    fidx = eng.flush_index_device()
    assert fidx is not None
    nct = lay.num_cols // 1024
    for sparsity in (0.5, 0.99, 0.999):
        x = np.zeros(lay.num_cols, np.float32)
        nnz_vec = max(1, int(round(lay.num_cols * (1 - sparsity))))
        idx = rng.choice(lay.num_cols, size=nnz_vec, replace=False)
        x[idx] = rng.random(nnz_vec).astype(np.float32) + 0.5
        # page-granular activity (the roll flavor's natural unit)
        act = jnp.asarray(np.any(x.reshape(nct * 8, -1) != 0, axis=1))
        dense = np.asarray(eng(jnp.asarray(x)))
        y = np.asarray(eng(jnp.asarray(x), tiles_active=act, fidx=fidx))
        np.testing.assert_array_equal(y, dense)


@pytest.mark.parametrize("deal", ["free", "bucket"])
def test_planar_exact_flush_predication_matches_dense(deal, rng):
    config = EngineConfig(interpret=True)
    csr = rmat_csr(num_rows=4000, nnz=12000, seed=23)
    lay = pack_planar(csr, config, deal=deal)
    eng = PlanarSpMV(lay, ArithmeticSemiring, config)
    # planar auto-selects the window path (flush_index_device() is None:
    # tile-granular activity makes the exact prologue a net loss, see the
    # engine docstring) — the exact path stays correct and is exercised
    # here by passing fidx explicitly
    assert eng.flush_index_device() is None
    fidx = {k: jnp.asarray(v)
            for k, v in _flush_index(lay.rg, lay.dstep, lay.f).items()}
    nct = lay.num_cols // 1024
    for sparsity in (0.9, 0.999):
        x = np.zeros(lay.num_cols, np.float32)
        nnz_vec = max(1, int(round(lay.num_cols * (1 - sparsity))))
        idx = rng.choice(lay.num_cols, size=nnz_vec, replace=False)
        x[idx] = rng.random(nnz_vec).astype(np.float32) + 0.5
        act = jnp.asarray(np.any(x.reshape(nct, -1) != 0, axis=1))
        dense = np.asarray(eng(jnp.asarray(x)))
        y = np.asarray(eng(jnp.asarray(x), tiles_active=act, fidx=fidx))
        np.testing.assert_array_equal(y, dense)


def test_exact_step_compaction_is_tighter(rng):
    """The exact keep-set must (a) be a subset of the window keep-set and
    (b) still cover every live deposit's step."""
    config = EngineConfig(interpret=True)
    csr = rmat_csr(num_rows=2000, nnz=20000, seed=24)
    lay = pack_router(csr, config)
    eng = RouterSpMV(lay, ArithmeticSemiring, config)
    fidx = eng.flush_index_device()
    nct = lay.num_cols // 1024
    x = np.zeros(lay.num_cols, np.float32)
    idx = rng.choice(lay.num_cols, size=3, replace=False)
    x[idx] = 1.0
    act = jnp.asarray(np.any(x.reshape(nct * 8, -1) != 0, axis=1))
    a = eng.arrays
    act_chunk = eng._act_chunk(a, act)
    _, _, _, na_w = (None, None) + _steps_sm_na(act_chunk, eng._minw)
    _, _, sm_e, na_e = _predicate_exact(a.rg, act_chunk, "roll", fidx)
    assert int(na_e[0]) <= int(na_w[0])
    assert int(na_e[0]) > 0
    # zero frontier -> zero kept steps
    act0 = jnp.zeros_like(act)
    ac0 = eng._act_chunk(a, act0)
    _, _, _, na0 = _predicate_exact(a.rg, ac0, "roll", fidx)
    assert int(na0[0]) == 0


def test_spmspv_module_exact_state_matches_oracle(rng):
    """Module-level plumbing: device_state() carries the flush index and
    apply_dense routes it through the exact path."""
    from graphlily_tpu.module import SpMVModule, SpMSpVModule
    config = EngineConfig(interpret=True, engine="router")
    csr = rmat_csr(num_rows=2000, nnz=20000, seed=25)
    work = csr.copy()
    util_round_csr_matrix_dim(work, 1024, 1024)
    spmv = SpMVModule(config)
    spmv.set_semiring(ArithmeticSemiring)
    spmv.set_mask_type(MaskType.NO_MASK)
    spmv.load_and_format_matrix(work)
    mod = SpMSpVModule(config)
    mod.set_semiring(ArithmeticSemiring)
    mod.set_mask_type(MaskType.NO_MASK)
    mod.load_and_format_matrix(csr2csc(work), reuse_from=spmv)
    st = mod.device_state()
    assert isinstance(st, dict) and "fidx" in st
    n = work.num_cols
    x = np.zeros(n, np.float32)
    idx = rng.choice(n, size=5, replace=False)
    x[idx] = rng.random(5).astype(np.float32) + 0.5
    y, nnz = mod.apply_dense(jnp.asarray(x), state=st)
    want = np.asarray(spmv_coo(coo_from_csr(work), jnp.asarray(x),
                               ArithmeticSemiring, None, MaskType.NO_MASK))
    np.testing.assert_allclose(np.asarray(y), want, rtol=2e-3, atol=2e-3)
    assert int(nnz) == int((want != 0).sum())
