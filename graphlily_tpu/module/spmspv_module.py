"""SpMSpV module.

Counterpart of the reference's SpMSpVModule (graphlily/module/spmspv_module.h):
CSC-formatted matrix, sparse frontier vector in/out with an nnz header
(on-device scalar here), dense mask, masked semiring SpMSpV.

Engine: the dense-frontier emulation (ops/reference.py spmspv_coo). On TPU,
true input-sparsity exploitation (dynamic burst reads,
hw/kernel_spmspv_impl.h:100-120) is hostile to XLA's static shapes; the
adaptive push/pull apps compensate exactly as the reference does — by
switching on frontier density (app/bfs.h:190).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import EngineConfig, DEFAULT_CONFIG
from ..semiring import MaskType, OpType, FLOAT_INF
from ..io.matrix import CSCMatrix
from ..ops.reference import coo_from_csc, spmspv_coo
from ..ops.vector import SparseVector, sparse_from_entries
from .base import BaseModule, DeviceBuffer


class SpMSpVModule(BaseModule):
    def __init__(self, config: EngineConfig = DEFAULT_CONFIG,
                 out_buf_len: int | None = None):
        super().__init__(config)
        del out_buf_len  # parity arg (spmspv_module.h ctor)
        self.csc_matrix_: Optional[CSCMatrix] = None
        self.vector_buf = DeviceBuffer()   # SparseVector
        self.mask_buf = DeviceBuffer()     # dense
        self.results_buf = DeviceBuffer()  # SparseVector
        self._coo = None
        self.num_rows_ = 0
        self.num_cols_ = 0

    def load_and_format_matrix(self, csc_matrix: CSCMatrix,
                               reuse_from=None) -> None:
        """`reuse_from`: an SpMVModule already formatted with the SAME
        matrix this CSC is the twin of (the apps build both from one CSR).
        The dense-frontier SpMSpV path packs csc2csr(csr2csc(A)) == A into
        the IDENTICAL router/planar/tropical layout the SpMV module holds,
        so without sharing every app keeps two device copies of the same
        multi-GB streams (hollywood apps OOMed HBM on exactly this).
        Sharing is skipped for the chunked engine (SpMSpV wants the
        chunk_order="col" layout for step predication) and for the XLA
        fallback."""
        assert self.semiring_ is not None, "set_semiring before formatting"
        self.csc_matrix_ = csc_matrix.copy()
        self.num_rows_ = csc_matrix.num_rows
        self.num_cols_ = csc_matrix.num_cols
        engine = self.config.resolve_engine()
        self._pallas = None
        self._coo = None
        if reuse_from is not None and reuse_from._pallas is not None:
            from ..ops.router_pallas import PlanarSpMV, RouterSpMV
            from ..ops.tropical_pallas import TropicalSpMV
            if isinstance(reuse_from._pallas,
                          (PlanarSpMV, RouterSpMV, TropicalSpMV)):
                self._pallas = reuse_from._pallas
                return
        if (engine in ("pallas", "auto", "router")
                and csc_matrix.num_rows % 1024 == 0
                and csc_matrix.num_cols % 1024 == 0):
            # dense-frontier path: pack the CSR twin into the chunked layout
            # and run the same pallas SpMV kernel; the sparse frontier is
            # scattered to a dense vector (semiring-zero fill annihilates
            # inactive columns, so semantics match the active-columns oracle).
            # Same capability ladder as SpMVModule: chunked when feasible,
            # router for big arithmetic/logical, COO fallback otherwise.
            from ..io.matrix import csc2csr
            from ..io.formatter import (pack_csr_chunks,
                                        estimate_chunk_layout_gb)
            from ..ops.spmv_pallas import PallasSpMV
            csr_twin = csc2csr(csc_matrix)
            tropical = self.semiring_.op == OpType.ADDMIN
            feasible = (estimate_chunk_layout_gb(csr_twin) <= 2.0
                        and csr_twin.num_rows <= 700_000)
            use_chunked = engine == "pallas" or feasible
            if tropical and not use_chunked:
                # scalable tropical push: pass-1 deposits predicated by the
                # frontier's tile footprint (ops/tropical_pallas.py)
                from ..io.layout_cache import pack_cached
                from ..ops.tropical_pallas import TropicalSpMV
                lay = pack_cached("tropical", csr_twin, self.config,
                                  cache_dir=self.config.layout_cache)
                self._pallas = TropicalSpMV(lay, self.semiring_, self.config,
                                            MaskType.NO_MASK)
            elif use_chunked:
                # chunk_order="col": groups each grid step's chunks by col
                # tile so the predicated kernel can skip steps whose tiles
                # hold no frontier entries (work-proportional push)
                from ..io.layout_cache import pack_cached
                lay = pack_cached("chunked", csr_twin, self.config,
                                  cache_dir=self.config.layout_cache,
                                  pad_val=float(self.semiring_.zero),
                                  chunk_order="col")
                self._pallas = PallasSpMV(lay, self.semiring_, self.config,
                                          MaskType.NO_MASK)
            else:
                from .spmv_module import resolve_router_flavor
                from ..io.layout_cache import pack_cached
                if resolve_router_flavor(csr_twin) == "roll":
                    from ..ops.router_pallas import RouterSpMV
                    lay = pack_cached("router", csr_twin, self.config,
                                      cache_dir=self.config.layout_cache)
                    self._pallas = RouterSpMV(lay, self.semiring_,
                                              self.config, MaskType.NO_MASK)
                else:
                    from ..ops.router_pallas import PlanarSpMV
                    lay = pack_cached("planar", csr_twin, self.config,
                                      cache_dir=self.config.layout_cache,
                                      deal=self.config.planar_deal)
                    self._pallas = PlanarSpMV(lay, self.semiring_,
                                              self.config, MaskType.NO_MASK)
        else:
            self._coo = coo_from_csc(csc_matrix, dtype=self.config.jdtype)

    def send_matrix_host_to_device(self) -> None:
        return None

    def get_num_rows(self) -> int:
        return self.num_rows_

    def get_num_cols(self) -> int:
        return self.num_cols_

    def get_nnz(self) -> int:
        return self.csc_matrix_.nnz if self.csc_matrix_ is not None else 0

    @property
    def capacity(self) -> int:
        return self.config.frontier_capacity or self.num_rows_

    # ---- vectors ---------------------------------------------------------
    def send_vector_host_to_device(self, sv) -> None:
        """Accepts a SparseVector or (indices, values) host pair."""
        if isinstance(sv, SparseVector):
            self.vector_buf.value = sv
        else:
            idx, vals = sv
            self.vector_buf.value = sparse_from_entries(
                idx, vals, self.capacity, dtype=self.config.jdtype)

    def send_mask_host_to_device(self, mask) -> None:
        self.mask_buf.value = jnp.asarray(
            np.asarray(mask, dtype=self.config.dtype))

    def send_mask_device_to_host(self) -> np.ndarray:
        return np.asarray(self.mask_buf.value)

    def send_results_device_to_host(self) -> SparseVector:
        return self.results_buf.value

    def get_results_nnz(self) -> int:
        """Reference: the 1-element D2D readback of results[0].index
        (spmspv_module.h:239-242). Host-sync version; fused app loops keep
        this scalar on device instead."""
        return int(self.results_buf.value.nnz)

    def bind_vector_buf(self, buf: DeviceBuffer) -> None:
        self.vector_buf = buf

    def bind_mask_buf(self, buf: DeviceBuffer) -> None:
        self.mask_buf = buf

    # ---- execution -------------------------------------------------------
    def device_state(self):
        if self._pallas is None:
            return self._coo
        touch = getattr(self._pallas.layout, "step_touch", None)
        if self._predicated():
            return {"arrays": self._pallas.arrays,
                    "touch": jnp.asarray(touch)}
        from ..ops.router_pallas import PlanarSpMV, RouterSpMV
        if isinstance(self._pallas, (PlanarSpMV, RouterSpMV)):
            # exact flush-predication index rides WITH the arrays as a jit
            # argument (a products-scale index is ~MBs — far past the
            # remote compiler's closure-constant payload limit)
            return {"arrays": self._pallas.arrays,
                    "fidx": self._pallas.flush_index_device()}
        return self._pallas.arrays

    def _predicated(self) -> bool:
        return (self._pallas is not None
                and getattr(self._pallas, "resident", False)
                and getattr(self._pallas.layout, "step_touch", None)
                is not None)

    def _run_engine(self, x, state, out_3d: bool = False):
        """One dense-frontier product through the engine; work-proportional
        in every pallas flavor (counterpart of the reference's active-column
        bursts, hw/kernel_spmspv_impl.h:55-124):
          * chunked resident: only grid steps whose col tiles intersect the
            active frontier execute (step-compacted predicated kernel);
          * router/planar: deposit descriptors of chunks whose col tile is
            frontier-inactive are masked out per call (_predicate_rg), so
            the dominant per-deposit roll/gather work scales with the
            frontier's tile footprint."""
        zero = self.semiring_.zero
        if x.ndim == 1 and self._pallas is not None:
            # engines run on the tile-padded column space; a frontier
            # densified at the user's num_cols_ (not a multiple of 1024)
            # must be padded with semiring zeros (caught by the ~100K-vertex
            # fullscale regression — unit fixtures are all 1024-aligned)
            ncp = self._pallas.layout.num_col_tiles * 1024
            if x.shape[0] < ncp:
                x = jnp.pad(x, (0, ncp - x.shape[0]),
                            constant_values=zero)
        if self._predicated():
            st = state if state is not None else self.device_state()
            arrays, touch = st["arrays"], st["touch"]
            nct = self._pallas.layout.num_col_tiles
            nsteps = touch.shape[0]
            act = jnp.any(x.reshape(nct, -1)
                          != jnp.asarray(zero, x.dtype), axis=1)
            step_active = (touch @ act.astype(touch.dtype)) > 0
            sm = jnp.nonzero(step_active, size=nsteps,
                             fill_value=0)[0].astype(jnp.int32)
            na = jnp.sum(step_active).astype(jnp.int32).reshape(1)
            return self._pallas.call_predicated(x, sm, na, arrays=arrays,
                                                out_3d=out_3d)
        from ..ops.router_pallas import PlanarSpMV, RouterSpMV
        from ..ops.tropical_pallas import TropicalSpMV
        if isinstance(self._pallas, (PlanarSpMV, RouterSpMV, TropicalSpMV)):
            nct = self._pallas.layout.num_col_tiles
            # roll engines predicate at 128-col PAGE granularity (each roll
            # A-chunk is page-local) — 8x finer than the col tile; planar/
            # tropical reduce the page activity back to tiles internally
            unit = nct * 8 if isinstance(self._pallas, RouterSpMV) else nct
            act = jnp.any(x.reshape(unit, -1)
                          != jnp.asarray(zero, x.dtype), axis=1)
            if isinstance(self._pallas, TropicalSpMV):
                return self._pallas(x, None, MaskType.NO_MASK, arrays=state,
                                    tiles_active=act, out_3d=out_3d)
            # router/planar state is the device_state dict (arrays + exact
            # flush-predication index); raw-arrays callers keep working on
            # the window path
            arrays, fidx = state, None
            if isinstance(state, dict):
                arrays, fidx = state["arrays"], state.get("fidx")
            elif state is None:
                fidx = self._pallas.flush_index_device()
            return self._pallas(x, None, MaskType.NO_MASK, arrays=arrays,
                                tiles_active=act, fidx=fidx, out_3d=out_3d)
        return self._pallas(x, None, MaskType.NO_MASK, arrays=state,
                            out_3d=out_3d)

    def apply_dense(self, x, mask=None, state=None, out_3d: bool = False):
        """Dense-frontier flavor for fused app loops: takes/returns dense
        vectors (inactive = semiring zero), skipping the per-iteration
        sparse<->dense conversions (XLA scatter/nonzero are ~0.1 G elem/s on
        this hardware). Returns (y_dense, nnz) with nnz an on-device scalar —
        the reference's get_results_nnz readback (spmspv_module.h:239-242)
        without the host sync. With `out_3d` (pallas engines only) x/y/mask
        ride as (n/1024, 8, 128) tiles so fused loops skip the 1D<->tiled
        relayout each iteration."""
        from ..semiring import apply_mask_sparse_style
        zero = self.semiring_.zero
        if self._pallas is not None:
            y = self._run_engine(x, state, out_3d=out_3d)
        else:
            assert not out_3d, "3D carries need a pallas engine"
            from ..ops.vector import dense_to_sparse
            sv = dense_to_sparse(x, zero, self.capacity)
            _, y = spmspv_coo(state if state is not None else self._coo,
                              sv, self.semiring_, None, MaskType.NO_MASK,
                              capacity=self.capacity)
        if mask is not None and self.mask_type_ != MaskType.NO_MASK:
            y = apply_mask_sparse_style(y, mask, self.mask_type_, zero)
        if (self.config.simulate_ufixed
                and self.semiring_.op == OpType.MULADD):
            from ..semiring import ufixed_quantize
            y = ufixed_quantize(y)   # before the nnz count: sub-grid values
            # round to 0 and drop out of the frontier, as on the bitstream
        nnz = jnp.sum(y != jnp.asarray(zero, y.dtype)).astype(jnp.int32)
        return y, nnz

    def apply(self, sv: SparseVector, mask: jax.Array | None = None,
              state=None) -> tuple[SparseVector, jax.Array]:
        if self._pallas is not None:
            from ..ops.vector import sparse_to_dense, dense_to_sparse
            from ..semiring import apply_mask_sparse_style
            zero = self.semiring_.zero
            x = sparse_to_dense(sv, self.num_cols_, zero)
            y = self._run_engine(x, state)
            if mask is not None and self.mask_type_ != MaskType.NO_MASK:
                y = apply_mask_sparse_style(y, mask, self.mask_type_, zero)
            if (self.config.simulate_ufixed
                    and self.semiring_.op == OpType.MULADD):
                from ..semiring import ufixed_quantize
                y = ufixed_quantize(y)
            return dense_to_sparse(y, zero, self.capacity), y
        coo = state if state is not None else self._coo
        return spmspv_coo(coo, sv, self.semiring_, mask,
                          self.mask_type_, capacity=self.capacity)

    def run(self) -> None:
        mask = self.mask_buf.value if self.mask_type_ != MaskType.NO_MASK else None
        sv_out, _dense = self.apply(self.vector_buf.value, mask)
        self.results_buf.value = sv_out

    # ---- CPU oracle ------------------------------------------------------
    def compute_reference_results(self, sparse_vector, mask=None) -> np.ndarray:
        """Dense float oracle; reference: spmspv_module.h:446-520.
        `sparse_vector` is (indices, values) host arrays or a SparseVector."""
        if isinstance(sparse_vector, SparseVector):
            n = int(sparse_vector.nnz)
            idx = np.asarray(sparse_vector.indices[:n])
            val = np.asarray(sparse_vector.values[:n], np.float64)
        else:
            idx = np.asarray(sparse_vector[0])
            val = np.asarray(sparse_vector[1], np.float64)
        csc = self.csc_matrix_
        y = np.full(self.num_rows_, self.semiring_.zero, np.float64)
        for vecv, c in zip(val, idx):
            lo, hi = csc.adj_indptr[c], csc.adj_indptr[c + 1]
            rr = csc.adj_indices[lo:hi].astype(np.int64)
            mm = csc.adj_data[lo:hi].astype(np.float64)
            if self.semiring_.op == OpType.MULADD:
                np.add.at(y, rr, mm * vecv)
            elif self.semiring_.op == OpType.ANDOR:
                c2 = np.logical_and(mm != 0, vecv != 0).astype(np.float64)
                y[rr] = np.logical_or(y[rr] != 0, c2 != 0).astype(np.float64)
            else:
                incr = np.minimum(mm + vecv, float(FLOAT_INF))
                np.minimum.at(y, rr, incr)
        if mask is not None and self.mask_type_ != MaskType.NO_MASK:
            m = np.asarray(mask, np.float64)
            zero = self.semiring_.zero
            if self.mask_type_ == MaskType.WRITE_TO_ONE:
                y[m == zero] = zero
            else:
                y[m != zero] = zero
        return y
