"""Scalable tropical SpMV engine vs a float64 min-plus oracle (interpret).

Covers the full pipeline of ops/tropical_pallas.py (exact int32 bit
encoding -> planar scatter -> window split -> scan/max reduce): multi-region
graphs with drains, accumulator splits, hub rows (rmat skew), empty rows
(tropical zero), INF entries in x, and masks. Counterpart of the
reference's MIN_ADD SpMV tests (tests/test_module_spmv_spmspv.cpp)."""
import numpy as np
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow  # interpret-mode engine tests (see pytest.ini)

from graphlily_tpu import EngineConfig, TropicalSemiring, MaskType
from graphlily_tpu.io import rmat_csr, uniform_csr, util_round_csr_matrix_dim
from graphlily_tpu.io.tropical_format import pack_tropical
from graphlily_tpu.ops.tropical_pallas import TropicalSpMV
from graphlily_tpu.semiring import FLOAT_INF

CFG = EngineConfig(interpret=True)


def oracle(csr, x):
    work = csr.copy()
    util_round_csr_matrix_dim(work, 1024, 1024)
    y = np.full(work.num_rows, float(FLOAT_INF))
    rr = work.row_ids().astype(np.int64)
    cc = work.adj_indices[:work.nnz].astype(np.int64)
    vv = work.adj_data[:work.nnz].astype(np.float64)
    p = np.minimum(vv + x[cc].astype(np.float64), float(FLOAT_INF))
    np.minimum.at(y, rr, p)
    return y.astype(np.float32)


def run(csr, x, region_rows=None, kb=4, **kw):
    # kb=4 keeps the unrolled split/reduce kernel bodies small: interpret-
    # mode cost is TRACE time (~proportional to rstep2 + f2), not run time
    lay = pack_tropical(csr, CFG, region_rows=region_rows, kb=kb)
    eng = TropicalSpMV(lay, TropicalSemiring, CFG)
    return np.asarray(eng(jnp.asarray(x), **kw)), lay


def rand_x(rng, n, inf_frac=0.3):
    x = (rng.random(n) * 100).astype(np.float32)
    x[rng.random(n) < inf_frac] = float(FLOAT_INF)
    return x


def test_tropical_small_exact(rng):
    csr = rmat_csr(num_rows=3000, nnz=20000, seed=3)
    x = rand_x(rng, 3072)
    y, lay = run(csr, x, kb=16)   # default kb: the production geometry
    # the bit encoding is EXACT: results match the f64 oracle bit-for-bit
    np.testing.assert_array_equal(y, oracle(csr, x))


def test_tropical_multi_region_drains(rng):
    # rows >> region_rows: many regions, region-boundary drains, splits
    csr = rmat_csr(num_rows=12000, nnz=60000, seed=7)
    x = rand_x(rng, 12288)
    y, lay = run(csr, x, region_rows=2048)
    assert lay.planar.num_regions > 1 and lay.region_digits == 16
    np.testing.assert_array_equal(y, oracle(csr, x))


def test_tropical_hub_rows(rng):
    # one hub row with thousands of entries: long same-row runs must merge
    # through the scan across deposit boundaries
    rng2 = np.random.default_rng(11)
    rows = np.concatenate([np.zeros(5000, np.int64),
                           rng2.integers(0, 6000, 20000)])
    cols = rng2.integers(0, 6000, 25000)
    vals = (rng2.random(25000) * 10).astype(np.float32)
    from graphlily_tpu.io.matrix import csr_from_coo
    csr = csr_from_coo(rows, cols, vals, 6000, 6000)
    x = rand_x(rng, 6144, inf_frac=0.1)
    y, _ = run(csr, x, region_rows=2048)
    np.testing.assert_array_equal(y, oracle(csr, x))


def test_tropical_empty_rows_give_inf(rng):
    csr = uniform_csr(4000, 4000, 3, seed=5)
    csr.adj_data[:] = np.abs(csr.adj_data)
    # knock out some rows entirely
    work = csr.copy()
    x = rand_x(rng, 4096, inf_frac=0.0)
    y, _ = run(work, x)
    want = oracle(work, x)
    np.testing.assert_array_equal(y, want)
    deg = np.diff(work.adj_indptr[:work.num_rows + 1])
    if (deg == 0).any():
        assert (y[:work.num_rows][deg == 0] == float(FLOAT_INF)).all()


def test_tropical_mask(rng):
    from graphlily_tpu.semiring import apply_mask
    csr = rmat_csr(num_rows=5000, nnz=30000, seed=13)
    x = rand_x(rng, 5120)
    lay = pack_tropical(csr, CFG, kb=4)
    eng = TropicalSpMV(lay, TropicalSemiring, CFG)
    mask = (rng.random(lay.num_rows) < 0.5).astype(np.float32)
    y = np.asarray(eng(jnp.asarray(x), mask=jnp.asarray(mask),
                       mask_type=MaskType.WRITE_TO_ZERO))
    want = np.asarray(apply_mask(jnp.asarray(oracle(csr, x)),
                                 jnp.asarray(mask),
                                 MaskType.WRITE_TO_ZERO,
                                 TropicalSemiring.zero))
    np.testing.assert_array_equal(y, want)


def test_tropical_out_3d(rng):
    csr = rmat_csr(num_rows=3000, nnz=15000, seed=17)
    x = rand_x(rng, 3072)
    y3, _ = run(csr, x, out_3d=True)
    assert y3.shape == (3, 8, 128)
    np.testing.assert_array_equal(y3.reshape(-1)[:3072], oracle(csr, x))


def test_tropical_tiles_active_predication(rng):
    """SpMSpV predication: inactive-tile deposits are masked; with x = INF
    outside the active tiles (tropical zero), results stay exact."""
    csr = rmat_csr(num_rows=4000, nnz=24000, seed=19)
    lay = pack_tropical(csr, CFG, kb=4)
    eng = TropicalSpMV(lay, TropicalSemiring, CFG)
    nct = lay.num_col_tiles
    x = np.full(nct * 1024, float(FLOAT_INF), np.float32)
    # activate a couple of columns inside tile 1 only
    x[1024 + 7] = 3.0
    x[1024 + 500] = 0.0
    act = np.zeros(nct, bool)
    act[1] = True
    y = np.asarray(eng(jnp.asarray(x), tiles_active=jnp.asarray(act)))
    np.testing.assert_array_equal(y, oracle(csr, x))


def test_tropical_layout_cache_roundtrip(rng, tmp_path):
    """Nested-dataclass cache entry: store, exact hit, value refill."""
    from graphlily_tpu.io.layout_cache import pack_cached
    csr = rmat_csr(num_rows=3000, nnz=18000, seed=23)
    x = rand_x(rng, 3072)
    lay1 = pack_cached("tropical", csr, CFG, cache_dir=str(tmp_path), kb=4)
    lay2 = pack_cached("tropical", csr, CFG, cache_dir=str(tmp_path), kb=4)
    y1 = np.asarray(TropicalSpMV(lay1, TropicalSemiring, CFG)(jnp.asarray(x)))
    y2 = np.asarray(TropicalSpMV(lay2, TropicalSemiring, CFG)(jnp.asarray(x)))
    np.testing.assert_array_equal(y1, y2)
    np.testing.assert_array_equal(y1, oracle(csr, x))
    # same structure, new values -> refill path
    csr2 = csr.copy()
    csr2.adj_data[:csr2.nnz] = (np.arange(csr2.nnz) % 17).astype(np.float32)
    lay3 = pack_cached("tropical", csr2, CFG, cache_dir=str(tmp_path), kb=4)
    y3 = np.asarray(TropicalSpMV(lay3, TropicalSemiring, CFG)(jnp.asarray(x)))
    np.testing.assert_array_equal(y3, oracle(csr2, x))


def test_sssp_app_on_tropical_engine():
    """SSSP fused loops (pull + pull_push switch) running the scalable
    tropical engine for the pull SpMV (engine knob forces it; push stays on
    the chunked SpMSpV at this scale, as in production mixed selection)."""
    from graphlily_tpu.apps import SSSP
    from graphlily_tpu.io import uniform_csr
    from graphlily_tpu.ops.tropical_pallas import TropicalSpMV as TEng
    cfg = EngineConfig(interpret=True, engine="router")
    app = SSSP(cfg)
    app.load_and_format_matrix(uniform_csr(1200, 1200, 10, seed=42))
    assert isinstance(app.SpMV_._pallas, TEng)
    want = app.compute_reference_results(0, 5)
    np.testing.assert_allclose(app.pull(0, 5), want, atol=1e-4)
    np.testing.assert_allclose(app.pull_push(0, 5, threshold=0.1), want,
                               atol=1e-4)


def test_tropical_module_selection():
    """SpMVModule picks the tropical engine when the chunked layout is
    infeasible or the router knob is set; results match the module oracle."""
    from graphlily_tpu.module import SpMVModule
    from graphlily_tpu.ops.tropical_pallas import TropicalSpMV as TEng
    rng2 = np.random.default_rng(29)
    csr = rmat_csr(num_rows=3000, nnz=18000, seed=31)
    cfg = EngineConfig(interpret=True, engine="router")
    m = SpMVModule(cfg)
    m.set_semiring(TropicalSemiring)
    m.set_mask_type(MaskType.NO_MASK)
    m.load_and_format_matrix(csr)
    assert isinstance(m._pallas, TEng)
    x = (rng2.random(m.get_num_cols()) * 50).astype(np.float32)
    m.send_vector_host_to_device(x)
    m.run()
    got = m.send_results_device_to_host()
    want = m.compute_reference_results(x)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_tropical_split_triples_exact(rng):
    """Triples split format (derive_split_triples): bit-equal to the planes
    path AND to the f64 oracle on a skewed graph with drains + splits."""
    csr = rmat_csr(num_rows=12000, nnz=60000, seed=37)
    x = rand_x(rng, 12288)
    yp, _ = run(csr, x, region_rows=2048)
    lay = pack_tropical(csr, CFG, region_rows=2048, kb=4,
                        split_format="triples")
    assert lay.triples2 is not None and lay.xsort2 is not None
    assert lay.planes2.size == 0      # planes dropped from the layout
    assert lay.xsort2.shape == (lay.nsteps2, lay.kb, 8, 128)
    assert lay.triples2.shape[0] == lay.nsteps2
    eng = TropicalSpMV(lay, TropicalSemiring, CFG)
    assert eng.split_triples
    yt = np.asarray(eng(jnp.asarray(x)))
    np.testing.assert_array_equal(yt, yp)
    np.testing.assert_array_equal(yt, oracle(csr, x))


def test_tropical_split_triples_hub(rng):
    """Hub rows force multi-cycle deposits (splits): both pieces of a split
    deposit must decode to the right (a0, d0, n) runs."""
    rng2 = np.random.default_rng(41)
    rows = np.concatenate([np.zeros(5000, np.int64),
                           rng2.integers(0, 6000, 20000)])
    cols = rng2.integers(0, 6000, 25000)
    vals = (rng2.random(25000) * 10).astype(np.float32)
    from graphlily_tpu.io.matrix import csr_from_coo
    csr = csr_from_coo(rows, cols, vals, 6000, 6000)
    x = rand_x(rng, 6144, inf_frac=0.1)
    lay = pack_tropical(csr, CFG, region_rows=2048, kb=4,
                        split_format="triples")
    y = np.asarray(TropicalSpMV(lay, TropicalSemiring, CFG)(jnp.asarray(x)))
    np.testing.assert_array_equal(y, oracle(csr, x))


def test_tropical_split_triples_cache(rng, tmp_path):
    """The split format keys the cache: a triples config and a planes config
    must not share an entry; the triples entry roundtrips with its arrays."""
    from graphlily_tpu.io.layout_cache import pack_cached
    csr = rmat_csr(num_rows=3000, nnz=18000, seed=43)
    x = rand_x(rng, 3072)
    cfg_t = EngineConfig(interpret=True, tropical_split_format="triples")
    lay_t = pack_cached("tropical", csr, cfg_t, cache_dir=str(tmp_path),
                        kb=4)
    lay_p = pack_cached("tropical", csr, CFG, cache_dir=str(tmp_path), kb=4)
    assert lay_t.triples2 is not None and lay_p.triples2 is None
    lay_t2 = pack_cached("tropical", csr, cfg_t, cache_dir=str(tmp_path),
                         kb=4)   # cache hit preserves the triples arrays
    assert lay_t2.triples2 is not None
    np.testing.assert_array_equal(lay_t2.triples2, lay_t.triples2)
    y_t = np.asarray(TropicalSpMV(lay_t2, TropicalSemiring, CFG)(
        jnp.asarray(x)))
    y_p = np.asarray(TropicalSpMV(lay_p, TropicalSemiring, CFG)(
        jnp.asarray(x)))
    np.testing.assert_array_equal(y_t, y_p)
    np.testing.assert_array_equal(y_t, oracle(csr, x))


def test_tropical_split_looped_bitwise(rng):
    """The block-looped split kernel (rstep2 > 448 auto, here forced) is
    bit-equal to the fully-unrolled one — same layout, same arrays."""
    csr = rmat_csr(num_rows=12000, nnz=60000, seed=47)
    x = rand_x(rng, 12288)
    lay = pack_tropical(csr, CFG, region_rows=2048, kb=4)
    eng_u = TropicalSpMV(lay, TropicalSemiring, CFG)
    eng_l = TropicalSpMV(lay, TropicalSemiring, CFG)
    assert not eng_u._static_split.get("looped")
    eng_l._static_split["looped"] = True
    yu = np.asarray(eng_u(jnp.asarray(x)))
    yl = np.asarray(eng_l(jnp.asarray(x)))
    np.testing.assert_array_equal(yu, yl)
    np.testing.assert_array_equal(yu, oracle(csr, x))


def test_tropical_split_triples_looped_bitwise(rng):
    """The block-looped TRIPLES split kernel (dynamic-ordinal word decode,
    ADVICE r4: the triples format targets exactly the graphs whose rstep2
    crashes the fully-unrolled compile) is bit-equal to the unrolled one."""
    csr = rmat_csr(num_rows=12000, nnz=60000, seed=48)
    x = rand_x(rng, 12288)
    lay = pack_tropical(csr, CFG, region_rows=2048, kb=4,
                        split_format="triples")
    eng_u = TropicalSpMV(lay, TropicalSemiring, CFG)
    eng_l = TropicalSpMV(lay, TropicalSemiring, CFG)
    assert eng_u.split_triples and not eng_u._static_split.get("looped")
    eng_l._static_split["looped"] = True
    yu = np.asarray(eng_u(jnp.asarray(x)))
    yl = np.asarray(eng_l(jnp.asarray(x)))
    np.testing.assert_array_equal(yu, yl)
    np.testing.assert_array_equal(yu, oracle(csr, x))


def test_resolve_tropical_split_format():
    """The a-priori auto rule (nnz only) that keys the layout cache AND
    picks the packed format — both sides must share it (ADVICE r4)."""
    from graphlily_tpu.io.tropical_format import (
        resolve_tropical_split_format, AUTO_TRIPLES_PLANES_BYTES,
        PLANES2_BYTES_PER_NNZ)
    thr = int(AUTO_TRIPLES_PLANES_BYTES / PLANES2_BYTES_PER_NNZ)
    assert resolve_tropical_split_format(thr - 1, None, "auto") == "planes"
    assert resolve_tropical_split_format(thr + 1, None, "auto") == "triples"
    assert resolve_tropical_split_format(10**9, None, "planes") == "planes"
    assert resolve_tropical_split_format(1, None, "triples") == "triples"
    import pytest as _pytest
    with _pytest.raises(ValueError):
        resolve_tropical_split_format(1, None, "bogus")
