"""Module middleware tests — counterpart of tests/test_module_spmv_spmspv.cpp
and tests/test_module_apply.cpp: modules vs their own CPU oracles, plus the
buffer-binding machinery (CopyBufferBindBuffer analog)."""
import numpy as np
import jax.numpy as jnp
import pytest

from graphlily_tpu import (ArithmeticSemiring, LogicalSemiring,
                           TropicalSemiring, MaskType, EngineConfig)
from graphlily_tpu.io import uniform_csr, csr2csc
from graphlily_tpu.module import (SpMVModule, SpMSpVModule, eWiseAddModule,
                                  AssignVectorDenseModule,
                                  AssignVectorSparseModule, DeviceBuffer)
from graphlily_tpu.ops import sparse_from_entries, sparse_to_dense

SEMIRINGS = [ArithmeticSemiring, LogicalSemiring, TropicalSemiring]
CFG = EngineConfig(interpret=True)


@pytest.mark.parametrize("semiring", SEMIRINGS, ids=lambda s: s.name)
@pytest.mark.parametrize("mask_type",
                         [MaskType.NO_MASK, MaskType.WRITE_TO_ZERO],
                         ids=lambda m: m.name)
@pytest.mark.parametrize("engine", ["xla", "pallas"])
def test_spmv_module(semiring, mask_type, engine, rng):
    cfg = EngineConfig(engine=engine, interpret=True)
    csr = uniform_csr(500, 500, 5, seed=31)
    mod = SpMVModule(cfg)
    mod.set_semiring(semiring)
    mod.set_mask_type(mask_type)
    mod.load_and_format_matrix(csr)
    n = mod.get_num_rows()
    x = rng.random(n).astype(np.float32)
    x[rng.random(n) < 0.4] = semiring.zero
    mask = (rng.random(n) < 0.5).astype(np.float32)
    mod.send_vector_host_to_device(x[:500])  # short vector -> zero-padded
    mod.send_mask_host_to_device(mask)
    mod.run()
    got = mod.send_results_device_to_host()
    xfull = x.copy()
    xfull[500:] = semiring.zero
    want = mod.compute_reference_results(xfull, mask)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("semiring", SEMIRINGS, ids=lambda s: s.name)
@pytest.mark.parametrize("mask_type",
                         [MaskType.NO_MASK, MaskType.WRITE_TO_ONE],
                         ids=lambda m: m.name)
def test_spmspv_module(semiring, mask_type, rng):
    csr = uniform_csr(300, 300, 4, seed=32)
    csc = csr2csc(csr)
    mod = SpMSpVModule(CFG)
    mod.set_semiring(semiring)
    mod.set_mask_type(mask_type)
    mod.load_and_format_matrix(csc)
    idx = np.sort(rng.choice(300, size=40, replace=False))
    vals = rng.random(40).astype(np.float32) + 0.5
    mod.send_vector_host_to_device((idx, vals))
    mask = rng.random(300).astype(np.float32)
    mask[rng.random(300) < 0.5] = semiring.zero
    mod.send_mask_host_to_device(mask)
    mod.run()
    sv = mod.send_results_device_to_host()
    got = np.asarray(sparse_to_dense(sv, 300, semiring.zero))
    want = mod.compute_reference_results((idx, vals), mask)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
    assert mod.get_results_nnz() == int((want != semiring.zero).sum())


def test_buffer_binding_chain(rng):
    """The reference's CopyBufferBindBuffer test
    (tests/test_module_apply.cpp:209-261): one module's output buffer bound as
    another's input."""
    x = rng.random(64).astype(np.float32)
    ew1 = eWiseAddModule(CFG)
    ew2 = eWiseAddModule(CFG)
    ew1.send_in_host_to_device(x)
    ew2.bind_in_buf(ew1.out_buf)       # chain: ew2 reads ew1's output
    ew1.run(64, 1.0)
    ew2.run(64, 2.0)
    np.testing.assert_allclose(ew2.send_out_device_to_host(), x + 3.0,
                               rtol=1e-6)
    # copy_buffer_device_to_device
    b = DeviceBuffer()
    ew1.copy_buffer_device_to_device(ew1.out_buf, b)
    np.testing.assert_allclose(np.asarray(b.value), x + 1.0, rtol=1e-6)


def test_assign_sparse_module_modes(rng):
    inout = rng.random(50).astype(np.float32) * 10
    sv = sparse_from_entries([1, 5, 9], [2.0, 20.0, 1.0], capacity=8)
    # no-new-frontier mode requires val
    m1 = AssignVectorSparseModule(generate_new_frontier=False, config=CFG)
    m1.send_mask_host_to_device(sv)
    m1.send_inout_host_to_device(inout)
    with pytest.raises(AssertionError):
        m1.run()          # missing val
    m1.run(3.5)
    got = m1.send_inout_device_to_host()
    want = inout.copy()
    want[[1, 5, 9]] = 3.5
    np.testing.assert_array_equal(got, want)
    # new-frontier mode rejects val
    m2 = AssignVectorSparseModule(generate_new_frontier=True, config=CFG)
    m2.send_mask_host_to_device(sv)
    m2.send_inout_host_to_device(inout)
    with pytest.raises(AssertionError):
        m2.run(1.0)
    m2.run()
    got2 = m2.send_inout_device_to_host()
    nf = m2.new_frontier_buf.value
    want2 = inout.copy()
    nf_idx, nf_val = AssignVectorSparseModule.compute_reference_results_new_frontier(
        [1, 5, 9], [2.0, 20.0, 1.0], want2)
    np.testing.assert_allclose(got2, want2)
    assert int(nf.nnz) == len(nf_idx)
    np.testing.assert_array_equal(np.asarray(nf.indices[:int(nf.nnz)]), nf_idx)


def test_resolve_router_flavor_thresholds():
    """Pin the epg=200 roll-vs-planar boundary (VERDICT r4 weak #6): a
    dense-ish graph must pick roll, a hypersparse one planar, and the
    decision must match the documented run-length formula on both sides."""
    from graphlily_tpu.module.spmv_module import resolve_router_flavor
    from graphlily_tpu.io import rmat_csr, uniform_csr
    from graphlily_tpu.io.router_format import choose_region_rows

    def epg(csr):
        nrows = ((csr.num_rows + 1023) // 1024) * 1024
        ncols = ((csr.num_cols + 1023) // 1024) * 1024
        r = choose_region_rows(nrows, ncols, csr.nnz)
        return csr.nnz * r / max((ncols // 128) * nrows, 1)

    dense = uniform_csr(num_rows=2048, num_cols=2048, degree=64, seed=1)
    assert epg(dense) >= 200
    assert resolve_router_flavor(dense) == "roll"

    sparse = uniform_csr(num_rows=65536, num_cols=65536, degree=2,
                         seed=2)
    assert epg(sparse) < 200
    assert resolve_router_flavor(sparse) == "planar"


def test_spmv_auto_engine_ladder():
    """Pin the auto capability ladder (nnz<2M + <=700K rows + <=2GB est ->
    chunked; else router flavor; tropical beyond-chunked -> the scalable
    tropical engine). A silent flip of any cap flips an isinstance here."""
    from graphlily_tpu.ops.spmv_pallas import PallasSpMV
    from graphlily_tpu.ops.router_pallas import PlanarSpMV, RouterSpMV
    from graphlily_tpu.ops.tropical_pallas import TropicalSpMV
    from graphlily_tpu.io import rmat_csr, uniform_csr

    small = rmat_csr(num_rows=20000, nnz=150000, seed=9)
    m = SpMVModule(CFG)
    m.set_semiring(ArithmeticSemiring)
    m.set_mask_type(MaskType.NO_MASK)
    m.load_and_format_matrix(small)
    assert isinstance(m._pallas, PallasSpMV)          # under every cap

    m2 = SpMVModule(CFG)
    m2.set_semiring(TropicalSemiring)
    m2.set_mask_type(MaskType.NO_MASK)
    m2.load_and_format_matrix(small)
    assert isinstance(m2._pallas, PallasSpMV)         # tropical + feasible

    big_rows = uniform_csr(num_rows=701_000, num_cols=701_000,
                           degree=1, seed=3)     # rows > 700K cap
    m3 = SpMVModule(CFG)
    m3.set_semiring(ArithmeticSemiring)
    m3.set_mask_type(MaskType.NO_MASK)
    m3.load_and_format_matrix(big_rows)
    assert isinstance(m3._pallas, (PlanarSpMV, RouterSpMV))

    m4 = SpMVModule(CFG)
    m4.set_semiring(TropicalSemiring)
    m4.set_mask_type(MaskType.NO_MASK)
    m4.load_and_format_matrix(big_rows)
    assert isinstance(m4._pallas, TropicalSpMV)       # beyond-chunked min


def test_planar_fused_vmem_threshold():
    """Pin the 17.5 MB fused-VMEM auto-select (VERDICT r4 weak #6): the
    same layout must flip fused -> split when its accumulator footprint
    crosses the cap (statics only — no kernel compile happens in init)."""
    import dataclasses
    from graphlily_tpu.io.planar_format import pack_planar
    from graphlily_tpu.ops.router_pallas import PlanarSpMV
    from graphlily_tpu.io import rmat_csr

    csr = rmat_csr(num_rows=8000, nnz=60000, seed=11)
    lay = pack_planar(csr.copy(), CFG, deal=CFG.planar_deal)
    eng = PlanarSpMV(lay, ArithmeticSemiring, CFG)
    assert eng.fused, "small layout must auto-select fused"
    big = dataclasses.replace(lay, num_slots=5000)    # ~20/40 MB of banks
    eng2 = PlanarSpMV(big, ArithmeticSemiring, CFG)
    assert not eng2.fused, "past 17.5 MB the split path must be selected"
