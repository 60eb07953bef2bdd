"""PERM-C planar layout + prefix-difference reduce (io/permc_format.py,
ops/router_pallas.py permc/triples paths).

Counterpart of the reference's SpMV module tests
(tests/test_module_spmv_spmspv.cpp) for the PERM-C engine flavor: oracle
parity across semirings and both execution modes, layout invariants (the
cap-1/contiguity discipline the prefix-difference reduce relies on), and
python/C++ packer bit-identity.
"""
import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

from graphlily_tpu import (ArithmeticSemiring, LogicalSemiring, MaskType,
                           EngineConfig)
from graphlily_tpu.io import rmat_csr
from graphlily_tpu.io.permc_format import pack_permc
from graphlily_tpu.ops.router_pallas import PlanarSpMV

CFG = EngineConfig(interpret=True)


@pytest.fixture(scope="module")
def graph():
    return rmat_csr(4096, 60000, seed=3)


@pytest.fixture(scope="module")
def layout(graph):
    return pack_permc(graph, CFG, native=False)


def _oracle(csr, x, logical=False):
    rr = csr.row_ids().astype(np.int64)
    cc = csr.adj_indices[:csr.nnz].astype(np.int64)
    vv = csr.adj_data[:csr.nnz].astype(np.float64)
    if logical:
        w = np.zeros(csr.num_rows, bool)
        np.logical_or.at(w, rr, (vv != 0) & (x[cc] != 0))
        return w.astype(np.float64)
    want = np.zeros(csr.num_rows)
    np.add.at(want, rr, vv * x[cc].astype(np.float64))
    return want


def test_permc_layout_invariants(graph, layout):
    lay = layout
    assert lay.triples is not None and lay.c_end is not None
    assert lay.planes.shape[1] == 0 and lay.c_lo.shape[0] == 0
    # every element lands exactly once: value stream mass is conserved
    assert np.isclose(lay.a_vals[lay.a_vals != 0].sum(dtype=np.float64),
                      graph.adj_data[:graph.nnz].sum(dtype=np.float64),
                      rtol=1e-6)
    # cap-1: within a flush ordinal's (sublane), run lanes must not overlap
    # -> end >= beg+1 wherever a run exists, and hi within rh
    rh = lay.region_rows // 128
    used = lay.c_end.astype(np.int32) != 0
    assert (lay.c_end.astype(np.int32)[used]
            > lay.c_beg.astype(np.int32)[used] - 1).all()
    assert (lay.c_hi.astype(np.int32) < rh).all()


@pytest.mark.parametrize("fused", [False, True])
@pytest.mark.parametrize("sem", [ArithmeticSemiring, LogicalSemiring])
def test_permc_spmv_vs_oracle(graph, layout, sem, fused, rng):
    eng = PlanarSpMV(layout, sem, CFG)
    eng.fused = fused
    x = rng.random(layout.num_cols).astype(np.float32)
    if sem is LogicalSemiring:
        x = (x > 0.5).astype(np.float32)
    y = np.asarray(eng(jnp.asarray(x)))[:graph.num_rows]
    want = _oracle(graph, x, logical=sem is LogicalSemiring)
    scale = np.maximum(np.abs(want), 1e-3)
    assert float(np.max(np.abs(y - want) / scale)) < 3e-2


def test_permc_spmspv_predication(graph, layout, rng):
    """tiles_active predication (the SpMSpV path) must match the dense
    product on a frontier that zeroes inactive tiles."""
    eng = PlanarSpMV(layout, ArithmeticSemiring, CFG)
    eng.fused = False
    nct = layout.num_col_tiles
    act = rng.random(nct) < 0.3
    x = rng.random(layout.num_cols).astype(np.float32)
    x[~np.repeat(act, 1024)[:layout.num_cols]] = 0.0
    y = np.asarray(eng(jnp.asarray(x),
                       tiles_active=jnp.asarray(act)))[:graph.num_rows]
    want = _oracle(graph, x)
    scale = np.maximum(np.abs(want), 1e-3)
    assert float(np.max(np.abs(y - want) / scale)) < 3e-2


def test_permc_native_bit_identity(graph):
    from graphlily_tpu.native import lib
    if lib() is None:
        pytest.skip("native library unavailable")
    lp = pack_permc(graph, CFG, native=False)
    ln = pack_permc(graph, CFG, native=True)
    for f in dataclasses.fields(lp):
        a, b = getattr(lp, f.name), getattr(ln, f.name)
        if isinstance(a, np.ndarray):
            assert b is not None and a.shape == b.shape and (a == b).all(), \
                f.name
        else:
            assert a == b, f.name


def test_permc_module_roundtrip(rng):
    """deal="permc" through SpMVModule (config.planar_deal routing)."""
    from graphlily_tpu.module import SpMVModule
    cfg = EngineConfig(interpret=True, engine="router",
                       planar_deal="permc", sort_rows_by_degree=True)
    # sparse enough that resolve_router_flavor picks planar (epg < 200)
    csr = rmat_csr(32768, 90000, seed=7)
    mod = SpMVModule(cfg)
    mod.set_semiring(ArithmeticSemiring)
    mod.set_mask_type(MaskType.NO_MASK)
    mod.load_and_format_matrix(csr)
    assert getattr(mod._pallas, "permc", False), \
        "planar_deal='permc' must select the permc layout"
    x = rng.random(mod.get_num_rows()).astype(np.float32)
    mod.send_vector_host_to_device(x)
    mod.run()
    got = mod.send_results_device_to_host()
    want = mod.compute_reference_results(x, None)
    scale = np.maximum(np.abs(want), 1e-3)
    assert float(np.max(np.abs(got - want) / scale)) < 3e-2
