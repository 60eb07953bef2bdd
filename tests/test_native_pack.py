"""Native C++ packers vs the numpy reference packers — bit-exact equality.

The native planar packer (native/planar_packer.cpp) replicates
io/planar_format.pack_planar's schedule build; any divergence (sort
stability, cursor simulation, descriptor ordinals) silently produces wrong
SpMV results, so every layout array is compared exactly. Counterpart of the
reference's formatter tests (tests/test_data_formatter.cpp).
"""
import dataclasses

import numpy as np
import pytest

from graphlily_tpu.io import rmat_csr, uniform_csr, dense_csr
from graphlily_tpu.io.matrix import csr_from_coo
from graphlily_tpu.io.planar_format import pack_planar
from graphlily_tpu import native


pytestmark = pytest.mark.skipif(native.lib() is None,
                                reason="native library unavailable")


def assert_layouts_equal(a, b):
    for fld in dataclasses.fields(a):
        va, vb = getattr(a, fld.name), getattr(b, fld.name)
        if isinstance(va, np.ndarray):
            assert va.dtype == vb.dtype and va.shape == vb.shape, fld.name
            np.testing.assert_array_equal(va, vb, err_msg=fld.name)
        else:
            assert va == vb, f"{fld.name}: {va} != {vb}"


CASES = [
    ("rmat-small", lambda: rmat_csr(num_rows=3000, nnz=20000, seed=7)),
    ("rmat-wide", lambda: rmat_csr(num_rows=2000, nnz=50000, seed=11)),
    ("uniform", lambda: uniform_csr(4000, 4000, 12, seed=3)),
    ("dense-blk", lambda: dense_csr(192, 192)),
    ("hypersparse", lambda: uniform_csr(9000, 9000, 1, seed=5)),
    # multi-region: rows > region_rows forces region splits + drains
    ("multi-region", lambda: rmat_csr(num_rows=40000, nnz=120000, seed=13)),
]


@pytest.mark.parametrize("name,make", CASES, ids=[c[0] for c in CASES])
def test_planar_native_matches_numpy(name, make):
    csr = make()
    nat = pack_planar(csr, native=True)
    ref = pack_planar(csr, native=False)
    assert_layouts_equal(nat, ref)


def test_planar_native_small_region_rows():
    # force splits/flush ordinals with a tiny region height + small cb
    csr = rmat_csr(num_rows=5000, nnz=60000, seed=17)
    nat = pack_planar(csr, region_rows=1024, cb=8, native=True)
    ref = pack_planar(csr, region_rows=1024, cb=8, native=False)
    assert_layouts_equal(nat, ref)


@pytest.mark.parametrize("name,make", CASES, ids=[c[0] for c in CASES])
def test_planar_native_free_deal_matches_numpy(name, make):
    csr = make()
    nat = pack_planar(csr, native=True, deal="free")
    ref = pack_planar(csr, native=False, deal="free")
    assert nat.a_sub is not None
    assert_layouts_equal(nat, ref)


def test_planar_native_free_deal_small_region_rows():
    csr = rmat_csr(num_rows=5000, nnz=60000, seed=17)
    nat = pack_planar(csr, region_rows=1024, cb=8, native=True, deal="free")
    ref = pack_planar(csr, region_rows=1024, cb=8, native=False, deal="free")
    assert_layouts_equal(nat, ref)


@pytest.mark.parametrize("name,make", CASES, ids=[c[0] for c in CASES])
def test_router_native_matches_numpy(name, make):
    from graphlily_tpu.io.router_format import pack_router
    csr = make()
    nat = pack_router(csr, native=True)
    ref = pack_router(csr, native=False)
    assert_layouts_equal(nat, ref)


def test_router_native_small_region_rows():
    from graphlily_tpu.io.router_format import pack_router
    csr = rmat_csr(num_rows=5000, nnz=60000, seed=17)
    nat = pack_router(csr, region_rows=1024, cb=8, native=True)
    ref = pack_router(csr, region_rows=1024, cb=8, native=False)
    assert_layouts_equal(nat, ref)


def test_planar_native_unsorted_columns():
    # non-canonical CSR (unsorted column indices within rows): the native
    # counting sort must re-sort segments to match numpy's stable key sort
    rng = np.random.default_rng(23)
    rows = rng.integers(0, 2000, 30000).astype(np.int64)
    cols = rng.integers(0, 2500, 30000).astype(np.int64)
    vals = rng.random(30000).astype(np.float32)
    csr = csr_from_coo(rows, cols, vals, 2000, 2500)
    # shuffle within rows to break column order
    indptr = csr.adj_indptr
    for r in range(csr.num_rows):
        lo, hi = int(indptr[r]), int(indptr[r + 1])
        if hi - lo > 1:
            perm = rng.permutation(hi - lo)
            csr.adj_indices[lo:hi] = csr.adj_indices[lo:hi][perm]
            csr.adj_data[lo:hi] = csr.adj_data[lo:hi][perm]
    nat = pack_planar(csr, native=True)
    ref = pack_planar(csr, native=False)
    assert_layouts_equal(nat, ref)


@pytest.mark.parametrize("name,make", CASES, ids=[c[0] for c in CASES])
def test_tropical_split_native_matches_numpy(name, make):
    # native/tropical_split.cpp vs io/tropical_format.build_split_schedule:
    # the split + window-reduce schedules must agree array-for-array
    from graphlily_tpu.io.formatter import util_round_csr_matrix_dim
    from graphlily_tpu.io.tropical_format import (build_split_schedule,
                                                  choose_tropical_region_rows)
    from graphlily_tpu.semiring import FLOAT_INF
    csr = make()
    csr.adj_data[:csr.nnz] = np.abs(csr.adj_data[:csr.nnz])
    work = csr.copy()
    util_round_csr_matrix_dim(work, 1024, 1024)
    rr = choose_tropical_region_rows(work.num_rows)
    lay = pack_planar(work, region_rows=rr, hi_pad=-1,
                      pad_val=float(FLOAT_INF))
    ref = build_split_schedule(lay, kb=16, native=False)
    nat = build_split_schedule(lay, kb=16, native=True)
    assert set(ref) == set(nat)
    for k, va in ref.items():
        vb = nat[k]
        if isinstance(va, np.ndarray):
            assert va.dtype == vb.dtype and va.shape == vb.shape, k
            np.testing.assert_array_equal(va, vb, err_msg=k)
        else:
            assert va == vb, f"{k}: {va} != {vb}"


def test_tropical_split_native_small_kb_and_regions():
    # small kb + small regions: many drains, splits, multi-step chunks
    from graphlily_tpu.io.formatter import util_round_csr_matrix_dim
    from graphlily_tpu.io.tropical_format import build_split_schedule
    from graphlily_tpu.semiring import FLOAT_INF
    csr = rmat_csr(num_rows=5000, nnz=60000, seed=17)
    csr.adj_data[:csr.nnz] = np.abs(csr.adj_data[:csr.nnz])
    work = csr.copy()
    util_round_csr_matrix_dim(work, 1024, 1024)
    lay = pack_planar(work, region_rows=1024, cb=8, hi_pad=-1,
                      pad_val=float(FLOAT_INF))
    ref = build_split_schedule(lay, kb=3, native=False)
    nat = build_split_schedule(lay, kb=3, native=True)
    for k, va in ref.items():
        vb = nat[k]
        if isinstance(va, np.ndarray):
            np.testing.assert_array_equal(va, vb, err_msg=k)
        else:
            assert va == vb, f"{k}: {va} != {vb}"
