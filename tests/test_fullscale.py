"""Big-scale CPU regression: a ~100K-vertex, multi-region, multi-tile
planar layout through the module + app layers in interpret mode.

The class of bug this exists to catch kept surfacing only on the TPU at
full scale (round 2/3: xperm sub-tile padding, prewarm deal-key mismatch,
flush-slot skew) because the unit fixtures top out ~4K vertices — a single
region, a handful of col tiles. This mirrors the reference's sw_emu module
run on real googleplus (tests/test_module_spmv_spmspv.cpp:144-178) at a
size that still finishes in interpret mode: ~98K rows (6 regions at the
chooser's rr=16384), 96 column tiles, ~800K nnz, degree-sorted, deal="free".
"""
import numpy as np
import jax.numpy as jnp
import pytest

from graphlily_tpu import (ArithmeticSemiring, LogicalSemiring, MaskType,
                           EngineConfig)
from graphlily_tpu.io import rmat_csr, csr2csc
from graphlily_tpu.module import SpMVModule, SpMSpVModule
from graphlily_tpu.ops import sparse_from_entries

CFG = EngineConfig(interpret=True, sort_rows_by_degree=True,
                   engine="router")   # force the scalable planar engine
                                      # (auto picks chunked at ~1M nnz)
N = 98_000
NNZ = 800_000   # epg < 200 so the router flavor resolves to planar


@pytest.fixture(scope="module")
def big_graph():
    return rmat_csr(N, NNZ, seed=11)


@pytest.mark.slow
def test_fullscale_planar_spmv_module(big_graph, rng):
    """Multi-region planar SpMV through SpMVModule (engine auto-select must
    pick the planar flavor at this sparsity) vs the f64 oracle."""
    from graphlily_tpu.module.spmv_module import resolve_router_flavor
    mod = SpMVModule(CFG)
    mod.set_semiring(ArithmeticSemiring)
    mod.set_mask_type(MaskType.NO_MASK)
    mod.load_and_format_matrix(big_graph)
    n = mod.get_num_rows()
    lay = mod._pallas.layout
    assert lay.num_regions >= 6, "fixture must span many regions"
    assert lay.num_col_tiles >= 64, "fixture must span many col tiles"
    x = rng.random(n).astype(np.float32)
    x[rng.random(n) < 0.5] = 0.0
    mod.send_vector_host_to_device(x)
    mod.run()
    got = mod.send_results_device_to_host()
    want = mod.compute_reference_results(x, None)
    scale = np.maximum(np.abs(want), 1e-3)
    assert float(np.max(np.abs(got - want) / scale)) < 3e-2


@pytest.mark.slow
def test_fullscale_bfs_app(big_graph):
    """BFS pull_push at ~100K vertices: the fused while_loop over the
    planar + shared-engine SpMSpV path vs the host oracle (the reference's
    googleplus sw_emu app check)."""
    from graphlily_tpu.apps import BFS
    g = big_graph.copy()
    g.adj_data = np.ones_like(g.adj_data)
    app = BFS(CFG)
    app.load_and_format_matrix(g)
    got = app.pull_push(3, 4, threshold=0.01)
    want = app.compute_reference_results(3, 4)
    np.testing.assert_allclose(np.asarray(got)[:len(want)], want, atol=1e-5)


@pytest.mark.slow
def test_fullscale_spmspv_shared_engine(big_graph, rng):
    """SpMSpV at ~100K vertices through the engine-sharing path
    (reuse_from halves app HBM — apps/sssp.py): page-predicated planar
    product on a sparse frontier vs the active-columns oracle."""
    mod_v = SpMVModule(CFG)
    mod_v.set_semiring(ArithmeticSemiring)
    mod_v.set_mask_type(MaskType.NO_MASK)
    mod_v.load_and_format_matrix(big_graph)

    csc = csr2csc(mod_v.csr_matrix_)   # twin of the RELABELED matrix
    mod = SpMSpVModule(CFG)
    mod.set_semiring(ArithmeticSemiring)
    mod.set_mask_type(MaskType.NO_MASK)
    mod.load_and_format_matrix(csc, reuse_from=mod_v)
    n = mod.num_cols_
    nnz_vec = 500
    idx = np.sort(rng.choice(n, size=nnz_vec, replace=False))
    vals = (rng.random(nnz_vec) + 0.5).astype(np.float32)
    sv = sparse_from_entries(idx, vals, mod.capacity, dtype=CFG.jdtype)
    out_sv, _dense = mod.apply(sv, state=mod.device_state())
    out_nnz = out_sv.nnz
    got = np.zeros(n, np.float32)
    gi = np.asarray(out_sv.indices)[:int(out_nnz)]
    gv = np.asarray(out_sv.values)[:int(out_nnz)]
    got[gi] = gv
    # f64 active-columns oracle on the same (relabeled) matrix
    work = mod_v.csr_matrix_
    rr = work.row_ids().astype(np.int64)
    cc = work.adj_indices[:work.nnz].astype(np.int64)
    vv = work.adj_data[:work.nnz].astype(np.float64)
    xd = np.zeros(work.num_cols)
    xd[idx] = vals
    want = np.zeros(work.num_rows)
    np.add.at(want, rr, vv * xd[cc])
    scale = np.maximum(np.abs(want), 1e-3)
    assert float(np.max(np.abs(got - want[:n]) / scale)) < 3e-2
