"""SpMV module.

Counterpart of the reference's SpMVModule (graphlily/module/spmv_module.h):
owns the formatted matrix, the vector/mask/results buffers, a `run()` that
executes one masked semiring SpMV on device, and a float CPU oracle.

Engine selection: "pallas" uses the chunked dual-gather kernel
(ops/spmv_pallas.py), "xla" the gather+segment fallback (ops/reference.py).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import EngineConfig, DEFAULT_CONFIG
from ..semiring import Semiring, MaskType, OpType, FLOAT_INF
from ..io.matrix import CSRMatrix
from ..io.formatter import pack_csr_chunks, util_round_csr_matrix_dim
from ..ops.reference import coo_from_csr, spmv_coo
from ..ops.spmv_pallas import PallasSpMV
from .base import BaseModule, DeviceBuffer


def resolve_router_flavor(csr) -> str:
    """Pick the router variant by run length: the roll router's range
    deposits win while (page x region) runs stay long (~one roll moves
    hundreds of elements); the planar router's bucket-binned plane deposits
    win on hypersparse graphs where page-level runs collapse to a handful
    of elements (measured on TPU: googleplus 6.7 ms roll vs 11.0 ms planar;
    pokec-class graphs invert the ordering and blow up the roll kernel's
    unrolled descriptor slots)."""
    from ..io.router_format import choose_region_rows
    import numpy as np
    nrows = ((csr.num_rows + 1023) // 1024) * 1024
    ncols = ((csr.num_cols + 1023) // 1024) * 1024
    r = choose_region_rows(nrows, ncols, csr.nnz)
    epg = csr.nnz * r / max((ncols // 128) * nrows, 1)
    return "roll" if epg >= 200 else "planar"


class SpMVModule(BaseModule):
    def __init__(self, config: EngineConfig = DEFAULT_CONFIG,
                 num_channels: int | None = None,
                 out_buf_len: int | None = None,
                 vec_buf_len: int | None = None):
        """`num_channels`/`out_buf_len`/`vec_buf_len` accepted for reference
        API parity (module/spmv_module.h:95-102); geometry actually comes from
        `config` (config.py maps the knobs)."""
        super().__init__(config)
        del num_channels, out_buf_len, vec_buf_len
        self.csr_matrix_: Optional[CSRMatrix] = None
        self.vector_buf = DeviceBuffer()
        self.mask_buf = DeviceBuffer()
        self.results_buf = DeviceBuffer()
        self._pallas: Optional[PallasSpMV] = None
        self._coo = None
        self.num_rows_ = 0
        self.num_cols_ = 0

    # ---- matrix ----------------------------------------------------------
    def load_and_format_matrix(self, csr_matrix: CSRMatrix,
                               skip_empty_rows: bool | None = None) -> None:
        """Format for the selected engine. `skip_empty_rows` is accepted for
        parity (the chunked layout has no end-of-row markers; empty rows cost
        nothing by construction).

        Engine resolution ("auto"): the chunked pallas kernel when its layout
        is feasible (memory scales with nonempty window x tile groups — the
        estimate must stay under ~2 GB and the kernel's own caps must hold),
        else the router engine (arithmetic/logical only; rows <= ~3.2M). The
        multi-level selection mirrors the reference's channel-size guard
        (module/spmv_module.h:385-388) as a capability ladder instead of an
        error."""
        assert self.semiring_ is not None, "set_semiring before formatting"
        self.csr_matrix_ = csr_matrix.copy()
        engine = self.config.resolve_engine()
        self._pallas = None
        self._coo = None
        tropical = self.semiring_.op == OpType.ADDMIN
        if engine == "router" and tropical:
            # min has no MXU form, so tropical rides its own scalable
            # engine: planar scatter of the exact int32 bit encoding +
            # window split + segmented max-scan reduce (ops/tropical_pallas)
            engine = "tropical"
        if engine == "auto" or engine == "pallas":
            use_chunked = engine == "pallas"
            if engine == "auto":
                from ..io.formatter import estimate_chunk_layout_gb
                # router wins on benchmark-scale arithmetic/logical graphs
                # (higher fill + fused reduce: 6.7 vs 8.3 ms on the
                # googleplus stand-in) and is the only full-scale option
                # for the 1M+-vertex graphs; the chunked kernel keeps
                # tropical-at-feasible-scale and small inputs (format cost,
                # interpret speed) — bigger tropical goes to the scalable
                # tropical engine
                feasible = (estimate_chunk_layout_gb(csr_matrix) <= 2.0
                            and csr_matrix.num_rows <= 700_000)
                use_chunked = ((tropical and feasible)
                               or (csr_matrix.nnz < 2_000_000 and feasible))
                if tropical and not use_chunked:
                    engine = "tropical"
            if use_chunked:
                from ..io.layout_cache import pack_cached
                lay = pack_cached("chunked", csr_matrix, self.config,
                                  cache_dir=self.config.layout_cache,
                                  pad_val=float(self.semiring_.zero))
                self._pallas = PallasSpMV(lay, self.semiring_, self.config,
                                          self.mask_type_)
                self.num_rows_, self.num_cols_ = lay.num_rows, lay.num_cols
                return
            if engine != "tropical":
                engine = "router"
        if engine == "tropical":
            from ..io.layout_cache import pack_cached
            from ..ops.tropical_pallas import TropicalSpMV
            lay = pack_cached("tropical", csr_matrix, self.config,
                              cache_dir=self.config.layout_cache)
            self._pallas = TropicalSpMV(lay, self.semiring_, self.config,
                                        self.mask_type_)
            self.num_rows_, self.num_cols_ = lay.num_rows, lay.num_cols
            return
        if engine == "router":
            engine = resolve_router_flavor(csr_matrix)
        if engine == "roll":
            from ..io.layout_cache import pack_cached
            from ..ops.router_pallas import RouterSpMV
            lay = pack_cached("router", csr_matrix, self.config,
                              cache_dir=self.config.layout_cache)
            self._pallas = RouterSpMV(lay, self.semiring_, self.config,
                                      self.mask_type_)
            self.num_rows_, self.num_cols_ = lay.num_rows, lay.num_cols
        elif engine == "planar":
            from ..io.layout_cache import pack_cached
            from ..ops.router_pallas import PlanarSpMV
            lay = pack_cached("planar", csr_matrix, self.config,
                              cache_dir=self.config.layout_cache,
                              deal=self.config.planar_deal)
            self._pallas = PlanarSpMV(lay, self.semiring_, self.config,
                                      self.mask_type_)
            self.num_rows_, self.num_cols_ = lay.num_rows, lay.num_cols
        else:
            work = csr_matrix.copy()
            util_round_csr_matrix_dim(work, 1024, 1024)
            self._coo = coo_from_csr(work, dtype=self.config.jdtype)
            self.num_rows_, self.num_cols_ = work.num_rows, work.num_cols

    def send_matrix_host_to_device(self) -> None:
        """Parity no-op: formatting already produced device arrays."""
        return None

    def get_num_rows(self) -> int:
        return self.num_rows_

    def get_num_cols(self) -> int:
        return self.num_cols_

    def get_nnz(self) -> int:
        return self.csr_matrix_.nnz if self.csr_matrix_ is not None else 0

    # ---- vectors ---------------------------------------------------------
    def _to_dense_device(self, v) -> jax.Array:
        v = np.asarray(v, dtype=self.config.dtype)
        if len(v) < self.num_rows_:
            pad = np.zeros(self.num_rows_ - len(v), v.dtype)
            v = np.concatenate([v, pad])
        return jnp.asarray(v)

    def send_vector_host_to_device(self, vector) -> None:
        assert len(vector) <= self.num_cols_
        v = np.asarray(vector, dtype=self.config.dtype)
        if len(v) < self.num_cols_:
            fill = np.full(self.num_cols_ - len(v),
                           self.semiring_.zero if self.semiring_ else 0,
                           v.dtype)
            v = np.concatenate([v, fill])
        self.vector_buf.value = jnp.asarray(v)

    def send_mask_host_to_device(self, mask) -> None:
        self.mask_buf.value = self._to_dense_device(mask)

    def send_vector_device_to_host(self) -> np.ndarray:
        return np.asarray(self.vector_buf.value)

    def send_mask_device_to_host(self) -> np.ndarray:
        return np.asarray(self.mask_buf.value)

    def send_results_device_to_host(self) -> np.ndarray:
        return np.asarray(self.results_buf.value)

    def bind_vector_buf(self, buf: DeviceBuffer) -> None:
        self.vector_buf = buf

    def bind_mask_buf(self, buf: DeviceBuffer) -> None:
        self.mask_buf = buf

    # ---- execution -------------------------------------------------------
    def device_state(self):
        """Matrix arrays as a pytree — pass this through jit boundaries and
        hand it back via `apply(..., state=)` so large operands are arguments,
        not HLO constants."""
        return self._pallas.arrays if self._pallas is not None else self._coo

    def apply(self, x: jax.Array, mask: jax.Array | None = None,
              state=None, out_3d: bool = False) -> jax.Array:
        """Functional core: y = mask(A (x) x). Jittable. With `out_3d`
        (pallas engines only) x/y ride as (n/1024, 8, 128) tiles so fused
        loops skip the 1D<->tiled relayout each iteration."""
        if self._pallas is not None:
            y = self._pallas(x, mask, self.mask_type_, arrays=state,
                             out_3d=out_3d)
        else:
            assert not out_3d, "3D carries need a pallas engine"
            coo = state if state is not None else self._coo
            y = spmv_coo(coo, x, self.semiring_, mask, self.mask_type_)
        if self.config.simulate_ufixed and self.semiring_.op == OpType.MULADD:
            # bit-parity experiment mode: saturate/round to the reference's
            # ap_ufixed<32,8,AP_RND,AP_SAT> grid (graphlily/global.h:63)
            from ..semiring import ufixed_quantize
            y = ufixed_quantize(y)
        return y

    def run(self) -> None:
        mask = self.mask_buf.value if self.mask_type_ != MaskType.NO_MASK else None
        self.results_buf.value = self.apply(self.vector_buf.value, mask)

    # ---- CPU oracle ------------------------------------------------------
    def compute_reference_results(self, vector, mask=None) -> np.ndarray:
        """Float CPU oracle; reference: module/spmv_module.h:488-532."""
        csr = self.csr_matrix_
        nnz = csr.nnz
        rows = csr.row_ids()
        cols = csr.adj_indices[:nnz].astype(np.int64)
        vals = csr.adj_data[:nnz].astype(np.float64)
        x = np.asarray(vector, np.float64)
        y = np.full(self.num_rows_, self.semiring_.zero, np.float64)
        contrib_x = x[cols]
        if self.semiring_.op == OpType.MULADD:
            np.add.at(y, rows, vals * contrib_x)
        elif self.semiring_.op == OpType.ANDOR:
            c = np.logical_and(vals != 0, contrib_x != 0).astype(np.float64)
            np.add.at(y, rows, c)
            y = (y != 0).astype(np.float64)
        else:
            c = np.minimum(vals + contrib_x, float(FLOAT_INF))
            np.minimum.at(y, rows, c)
        if mask is not None and self.mask_type_ != MaskType.NO_MASK:
            m = np.asarray(mask)
            if self.mask_type_ == MaskType.WRITE_TO_ZERO:
                y[m[: self.num_rows_] != 0] = 0
            else:
                y[m[: self.num_rows_] == 0] = 0
        return y
