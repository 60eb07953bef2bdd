"""Engine configuration.

One dataclass replaces the reference's three config mechanisms — compile-time
constants in global.h:56-64, synthesizer-injected buffer sizes
(graphlily/synthesizer/overlay_synthesizer.h:35-48), and module-constructor
mirrors (graphlily/module/spmv_module.h:95-102) — eliminating the
host/device-disagreement bug class called out in SURVEY.md §5.6.

The mapping from reference knobs:
  * NUM_HBM_CHANNEL x PACK_SIZE (parallel PEs)  -> pallas grid + vreg lanes (implicit)
  * SPMV_OUT_BUF_LEN (URAM out tile)            -> row_window * out windows in VMEM
  * VEC_BUF_LEN (URAM vector slice)             -> col_tile (x slice in VMEM)
  * SPMV_ROW_INTERLEAVE_FACTOR                  -> n/a (no PE latency to hide)
  * val_t = ap_ufixed<32,8>                     -> dtype (float32 default)
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


@dataclasses.dataclass(frozen=True)
class EngineConfig:
    # --- layout geometry (SpMV pallas engine) ---
    row_window: int = 128        # rows per one-hot accumulate window (fixed by kernel)
    col_tile: int = 1024         # x elements resident per chunk gather (dg reach)
    chunk_sublanes: int = 8      # sublanes per chunk (ax0 dynamic-gather table limit)
    lanes: int = 128             # TPU lane count (fixed)

    # --- numerics ---
    dtype: str = "float32"       # value dtype
    idx_dtype: str = "int32"
    mxu_precision: str = "highest"   # "highest" (f32-accurate) | "default" (bf16 MXU)
    simulate_ufixed: bool = False    # bit-parity experiment mode: round +
                                     # saturate arithmetic module results to
                                     # the reference's ap_ufixed<32,8,AP_RND,
                                     # AP_SAT> grid (graphlily/global.h:63;
                                     # see semiring.ufixed_quantize)

    # --- engine selection ---
    engine: str = "auto"         # "auto" | "xla" | "pallas" | "router"
                                 # auto: chunked pallas kernel when its layout
                                 # is feasible, else the router engine
                                 # (tropical always uses the chunked kernel)
    planar_deal: str = "free"    # planar layout deal: "free" (chained
                                 # phase-A gather, quota-dealt sublanes —
                                 # flush fill ~0.98) | "bucket" (v3: snake
                                 # col buckets + xperm pre-pass)
    tropical_split_format: str = "auto"  # split-pass deposit format:
                                 # "planes" (1 KB int8 gather plane/piece) |
                                 # "triples" (per-chunk digit sort plane +
                                 # 32 B packed run words/piece, ~32x smaller
                                 # deposit stream — the orkut-scale SSSP
                                 # footprint lever) | "auto" (triples iff
                                 # nnz >= ~67M, an a-priori rule shared
                                 # with the layout-cache key — see
                                 # io/tropical_format.resolve_tropical_
                                 # split_format; TPU-validated bit-exact
                                 # r5, measured 37 B/nnz all-in on full
                                 # ogbn_products)
    interpret: Optional[bool] = None  # pallas interpret mode; None = auto (CPU->True)
    resident_kernel: Optional[bool] = None  # None = auto by VMEM footprint
    reduce_mode: str = "mxu"     # resident-kernel row reduce: "mxu" | "vpu"
                                 # (vpu measured 2x slower on v5e: compare
                                 #  volume exceeds the MXU dot latency)

    # --- formatter behavior ---
    sort_rows_by_degree: bool = False  # SELL-sigma style row reordering
    skip_empty_rows: bool = True       # parity knob (reference csr2cpsr flag)
    layout_cache: Optional[str] = None  # layout disk-cache dir; None checks
                                        # $GLT_LAYOUT_CACHE (io/layout_cache)

    # --- sparse-vector (SpMSpV) static capacity ---
    # results/frontier buffers get a static capacity = num_rows (worst case) unless set
    frontier_capacity: Optional[int] = None

    @property
    def jdtype(self):
        return jnp.dtype(self.dtype)

    @property
    def jidx(self):
        return jnp.dtype(self.idx_dtype)

    @property
    def chunk_size(self) -> int:
        return self.chunk_sublanes * self.lanes

    def resolve_interpret(self) -> bool:
        if self.interpret is not None:
            return self.interpret
        return not _on_tpu()

    def resolve_engine(self) -> str:
        return self.engine   # "auto" resolves per-module (capability ladder)


DEFAULT_CONFIG = EngineConfig()
