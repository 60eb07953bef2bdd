"""Layout disk cache: roundtrip identity, value-refill correctness, and
el_slot (structure/value split) invariants for all three packers."""
import dataclasses

import numpy as np
import pytest

from graphlily_tpu import EngineConfig, FLOAT_INF
from graphlily_tpu.io import rmat_csr
from graphlily_tpu.io.formatter import pack_csr_chunks
from graphlily_tpu.io.router_format import pack_router
from graphlily_tpu.io.planar_format import pack_planar
from graphlily_tpu.io.layout_cache import (pack_cached, structure_key,
                                           value_key)

CONFIG = EngineConfig()


def _csr(seed=3):
    return rmat_csr(num_rows=3000, nnz=30000, seed=seed)


def _assert_layout_equal(a, b):
    for f in dataclasses.fields(a):
        va, vb = getattr(a, f.name), getattr(b, f.name)
        if isinstance(va, np.ndarray):
            assert np.array_equal(va, vb), f.name
        else:
            assert va == vb, f.name


PACKERS = [
    ("chunked", lambda c: pack_csr_chunks(c, CONFIG, pad_val=0.0), {}),
    ("chunked", lambda c: pack_csr_chunks(c, CONFIG, pad_val=float(FLOAT_INF)),
     {"pad_val": float(FLOAT_INF)}),
    ("chunked", lambda c: pack_csr_chunks(c, CONFIG, chunk_order="col"),
     {"chunk_order": "col"}),
    ("router", lambda c: pack_router(c, CONFIG), {}),
    ("planar", lambda c: pack_planar(c, CONFIG), {}),
]


@pytest.mark.parametrize("kind,direct,params", PACKERS)
def test_el_slot_reconstructs_values(kind, direct, params):
    csr = _csr()
    lay = direct(csr)
    vals = lay.vals if hasattr(lay, "vals") else lay.a_vals
    got = vals.reshape(-1)[lay.el_slot]
    np.testing.assert_array_equal(
        got.astype(np.float32), csr.adj_data[:csr.nnz].astype(np.float32))
    # el_slot covers distinct slots (no element overwrites another)
    assert len(np.unique(lay.el_slot)) == csr.nnz


@pytest.mark.parametrize("kind,direct,params", PACKERS)
def test_cache_roundtrip_and_value_refill(tmp_path, kind, direct, params):
    csr = _csr()
    d = str(tmp_path)
    lay0 = pack_cached(kind, csr, CONFIG, cache_dir=d, **params)
    _assert_layout_equal(lay0, direct(csr))
    # exact hit
    lay1 = pack_cached(kind, csr, CONFIG, cache_dir=d, **params)
    _assert_layout_equal(lay0, lay1)
    # same structure, new values -> refilled layout == direct pack
    csr2 = csr.copy()
    csr2.adj_data = (csr2.adj_data * 1.7 + 0.25).astype(csr2.adj_data.dtype)
    lay2 = pack_cached(kind, csr2, CONFIG, cache_dir=d, **params)
    _assert_layout_equal(lay2, direct(csr2))


def test_structure_key_separates_graphs_and_params():
    a, b = _csr(seed=3), _csr(seed=4)
    assert structure_key("planar", a, {}) != structure_key("planar", b, {})
    assert structure_key("planar", a, {}) != structure_key("router", a, {})
    assert (structure_key("chunked", a, {"pad_val": 0.0})
            != structure_key("chunked", a, {"pad_val": float(FLOAT_INF)}))
    c = a.copy()
    c.adj_data = c.adj_data + 1.0
    assert structure_key("planar", a, {}) == structure_key("planar", c, {})
    assert value_key(a) != value_key(c)


def test_corrupt_entry_repacks(tmp_path):
    csr = _csr()
    d = str(tmp_path)
    lay0 = pack_cached("planar", csr, CONFIG, cache_dir=d)
    path = list(tmp_path.glob("planar_*.npz"))[0]
    path.write_bytes(b"not an npz")
    lay1 = pack_cached("planar", csr, CONFIG, cache_dir=d)
    _assert_layout_equal(lay0, lay1)
