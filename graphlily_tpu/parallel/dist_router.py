"""Distributed PLANAR-router SpMV over a 2D device mesh.

Round-2's multi-chip layer wrapped only the chunked kernel — exactly the
engine that cannot handle the 1M+-vertex graphs, so a second chip's HBM
never helped where it mattered. This module shards the planar router (the
engine carrying pokec/products/orkut at full scale):

  * the matrix is block-sharded (R x C blocks); each block is packed by the
    single-chip planar packer, then PADDED to the mesh-common static
    geometry (nsteps / dstep / f / dmax / accumulator slots) so ONE compiled
    kernel serves every shard under shard_map;
  * x is sharded over 'cols' (each device xperms + gathers only its local
    tile slice), partial y is psum'd over 'cols', y emerges sharded over
    'rows' — the same SUMMA dataflow as DistSpMV (dist_spmv.py);
  * per-shard compute is the UNCHANGED single-chip PlanarSpMV (fused or
    split auto-selected on the padded geometry).

Padding is pure numpy restriding: deposits stay in slots [0, dstep_c),
flushes move to [dstep_c, dstep_c + f_c), inactive descriptor words are 0
and inactive flush ordinals carry c_code = -1 — the kernels already treat
both as no-ops. `ShardedPlanarLayout.shard_balance` reports the max/avg
packed-chunk stretch the padding pays on skewed graphs (SURVEY §7 "load
imbalance").
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import EngineConfig, DEFAULT_CONFIG
from ..semiring import Semiring, MaskType, OpType, apply_mask
from ..io.matrix import CSRMatrix
from ..io.formatter import util_round_csr_matrix_dim
from ..io.planar_format import (pack_planar, PlanarSpMVLayout,
                                choose_planar_region_rows)
from ..ops.router_pallas import PlanarSpMV, PlanarArrays, S, L, _rg_flat

from .dist_spmv import _csr_from_sorted_coo


@dataclasses.dataclass
class ShardedPlanarLayout:
    """Planar stream arrays with leading (R, C) mesh dims + the mesh-common
    padded geometry (a PlanarSpMVLayout carrying shard (0,0)'s arrays, used
    to derive the kernel's static dims)."""

    arrays: dict                  # field -> np.ndarray with leading (R, C)
    proto: PlanarSpMVLayout       # padded shard (0,0): common static dims
    num_rows: int                 # global padded
    num_cols: int
    nnz: int
    rows_shards: int
    col_shards: int
    local_rows: int
    local_cols: int
    chunk_counts: Optional[np.ndarray] = None   # (R, C) pre-pad nsteps*cb

    @property
    def shard_balance(self) -> float:
        if self.chunk_counts is None or self.chunk_counts.size == 0:
            return 1.0
        avg = float(self.chunk_counts.mean())
        return float(self.chunk_counts.max()) / max(avg, 1e-9)


def _pad_planar(l: PlanarSpMVLayout, nsteps: int, dstep: int, f: int,
                dmax: int, num_slots: int, pad_val: float
                ) -> PlanarSpMVLayout:
    """Restride one shard's layout to the mesh-common geometry."""
    cb = l.cb
    rstep = dstep + f

    rg = np.zeros((nsteps, rstep, 2), np.int32)
    rg[:l.nsteps, :l.dstep] = l.rg[:, :l.dstep]
    rg[:l.nsteps, dstep:dstep + l.f] = l.rg[:, l.dstep:l.rstep]

    planes = np.zeros((nsteps, dmax, S, L), np.int8)
    planes[:l.nsteps, :l.dmax] = l.planes

    c_code = np.full((nsteps, f), -1, np.int32)
    c_code[:l.nsteps, :l.f] = l.c_code.reshape(l.nsteps, l.f)
    c_hi = np.zeros((nsteps, f, S, L), np.int8)
    c_hi[:l.nsteps, :l.f] = l.c_hi.reshape(l.nsteps, l.f, S, L)
    c_lo = np.zeros((nsteps, f, S, L), np.int8)
    c_lo[:l.nsteps, :l.f] = l.c_lo.reshape(l.nsteps, l.f, S, L)

    ncap = nsteps * cb
    a_r = np.zeros((ncap, S, L), np.int8)
    a_r[:l.a_r.shape[0]] = l.a_r
    a_vals = np.full((ncap, S, L), pad_val, np.float32)
    a_vals[:l.a_vals.shape[0]] = l.a_vals
    a_page = np.zeros(ncap, np.int32)
    a_page[:l.a_page.shape[0]] = l.a_page
    a_sub = None
    if getattr(l, "a_sub", None) is not None:
        a_sub = np.zeros((ncap, S, L), np.int8)
        a_sub[:l.a_sub.shape[0]] = l.a_sub

    return PlanarSpMVLayout(
        a_r=a_r, xperm=l.xperm, a_vals=a_vals, a_page=a_page, rg=rg,
        planes=planes, c_code=c_code.reshape(-1), c_hi=c_hi.reshape(-1, S, L),
        c_lo=c_lo.reshape(-1, S, L),
        num_rows=l.num_rows, num_cols=l.num_cols, nnz=l.nnz,
        num_col_tiles=l.num_col_tiles, num_regions=l.num_regions,
        region_rows=l.region_rows, cb=cb, rstep=rstep, f=f, dmax=dmax,
        nsteps=nsteps, dstep=dstep, num_slots=num_slots,
        fill_a=l.fill_a, fill_stream=l.fill_stream, el_slot=None,
        a_sub=a_sub)


def pack_planar_sharded(csr: CSRMatrix, rows_shards: int, col_shards: int,
                        config: EngineConfig = DEFAULT_CONFIG,
                        region_rows: int | None = None,
                        cb: int = 16, pad_val: float = 0.0
                        ) -> ShardedPlanarLayout:
    """Split CSR into (R x C) blocks, planar-pack each, pad all to the
    mesh-common geometry. `cb` and `region_rows` are forced common (the
    kernel is compiled once for the mesh)."""
    work = csr.copy()
    util_round_csr_matrix_dim(work, rows_shards * 1024, col_shards * 1024)
    nrows, ncols = work.num_rows, work.num_cols
    rb, cbk = nrows // rows_shards, ncols // col_shards
    if region_rows is None:
        region_rows = choose_planar_region_rows(rb, cbk,
                                                max(work.nnz
                                                    // (rows_shards
                                                        * col_shards), 1))

    nnz = work.nnz
    rows = work.row_ids()
    cols = work.adj_indices[:nnz].astype(np.int64)
    vals = work.adj_data[:nnz]

    layouts = []
    for i in range(rows_shards):
        row_l = []
        sel_i = (rows >= i * rb) & (rows < (i + 1) * rb)
        for j in range(col_shards):
            sel = sel_i & (cols >= j * cbk) & (cols < (j + 1) * cbk)
            sub = _csr_from_sorted_coo(rows[sel] - i * rb,
                                       cols[sel] - j * cbk,
                                       vals[sel], rb, cbk)
            row_l.append(pack_planar(sub, config, pad_val=pad_val, cb=cb,
                                     region_rows=region_rows,
                                     deal=config.planar_deal))
        layouts.append(row_l)

    flat = [l for rl in layouts for l in rl]
    nsteps_c = max(l.nsteps for l in flat)
    dstep_c = max(l.dstep for l in flat)
    f_c = max(l.f for l in flat)
    dmax_c = max(l.dmax for l in flat)
    slots_c = max(l.num_slots for l in flat)
    padded = [[_pad_planar(l, nsteps_c, dstep_c, f_c, dmax_c, slots_c,
                           pad_val) for l in rl] for rl in layouts]

    arrays = {}
    proto0 = padded[0][0]
    for fld in PlanarArrays.FIELDS:
        # shape each field exactly as PlanarSpMV ships it single-chip
        def shaped(l):
            if fld == "a_page":
                return l.a_page.reshape(l.nsteps, 1, l.cb)
            if fld == "a_r":
                return l.a_r.reshape(l.nsteps, l.cb * S, L)
            if fld == "a_vals":
                return l.a_vals.reshape(l.nsteps, l.cb * S, L)
            if fld == "xperm":
                return l.xperm
            if fld == "rg":
                return _rg_flat(l.rg)
            if fld == "planes":
                return l.planes
            if fld == "c_code":
                return l.c_code.reshape(l.nsteps, 1, l.f)
            if fld == "c_hi":
                return l.c_hi.reshape(l.nsteps, l.f * S, L)
            if fld == "c_lo":
                return l.c_lo.reshape(l.nsteps, l.f * S, L)
            if fld == "a_sub":
                return (l.a_sub.reshape(l.nsteps, l.cb * S, L)
                        if l.a_sub is not None else None)
            raise KeyError(fld)
        if fld == "a_sub" and proto0.a_sub is None:
            arrays[fld] = None
            continue
        if fld == "c_beg":
            # permc-only pytree slot (PlanarArrays.FIELDS grew it in r4);
            # sharded packs are always plane-format free/bucket deals
            arrays[fld] = None
            continue
        arrays[fld] = np.stack([np.stack([shaped(l) for l in rl])
                                for rl in padded])

    return ShardedPlanarLayout(
        arrays=arrays, proto=proto0,
        num_rows=nrows, num_cols=ncols, nnz=nnz,
        rows_shards=rows_shards, col_shards=col_shards,
        local_rows=rb, local_cols=cbk,
        chunk_counts=np.array([[l.nsteps * l.cb for l in rl]
                               for rl in layouts], np.int64))


@dataclasses.dataclass
class ShardedTropicalLayout:
    """Tropical (ADDMIN) streams with leading (R, C) mesh dims; `proto` is
    shard (0,0) padded to the mesh-common static geometry (planar pass-1
    dims AND split/reduce pass dims)."""

    arrays: dict
    proto: "object"               # TropicalSpMVLayout (padded shard (0,0))
    num_rows: int
    num_cols: int
    nnz: int
    rows_shards: int
    col_shards: int
    local_rows: int
    local_cols: int
    chunk_counts: Optional[np.ndarray] = None

    @property
    def shard_balance(self) -> float:
        if self.chunk_counts is None or self.chunk_counts.size == 0:
            return 1.0
        avg = float(self.chunk_counts.mean())
        return float(self.chunk_counts.max()) / max(avg, 1e-9)


def _pad_tropical(tl, nsteps, dstep, f, dmax, num_slots,
                  nsteps2, dstep2, f2, dmax2, num_slots2, pad_val):
    """Restride one shard's TropicalSpMVLayout to the mesh-common geometry.

    Pass 1 (planar scatter) pads via _pad_planar. The split/reduce pass
    schedules pad the same way the planar ones do: deposits keep slots
    [0, dstep2), flushes move to [dstep2_c, dstep2_c + f2_old), zero rg2
    words and c_win = -1 are no-ops in the kernels
    (ops/tropical_pallas.py: deposit guard w2 > 0, flush guard w2 < 0,
    reduce guard c >= 0). in_order indexes the pass-1 flush stream as
    step * f + q, so padding pass-1's f re-strides every index."""
    from ..io.tropical_format import TropicalSpMVLayout
    p_old = tl.planar
    p = _pad_planar(p_old, nsteps, dstep, f, dmax, num_slots, pad_val)
    kb = tl.kb
    rstep2 = dstep2 + f2

    io_old = tl.in_order.astype(np.int64)
    io_new = (io_old // p_old.f) * f + (io_old % p_old.f)
    in_order = np.zeros(nsteps2 * kb, np.int32)
    in_order[:len(io_new)] = io_new.astype(np.int32)

    rg2 = np.zeros((nsteps2, rstep2, 2), np.int32)
    rg2[:tl.nsteps2, :tl.dstep2] = tl.rg2[:, :tl.dstep2]
    rg2[:tl.nsteps2, dstep2:dstep2 + tl.f2] = tl.rg2[:, tl.dstep2:]
    planes2 = np.zeros((nsteps2, dmax2, S, L), np.int8)
    planes2[:tl.nsteps2, :tl.dmax2] = tl.planes2

    c_win = np.full((nsteps2, f2), -1, np.int32)
    c_win[:tl.nsteps2, :tl.f2] = tl.c_win.reshape(tl.nsteps2, tl.f2)

    def pad_plane(a):
        out = np.zeros((nsteps2, f2, S, L), np.int8)
        out[:tl.nsteps2, :tl.f2] = a.reshape(tl.nsteps2, tl.f2, S, L)
        return out.reshape(nsteps2 * f2, S, L)

    return TropicalSpMVLayout(
        planar=p, in_order=in_order, rg2=rg2, planes2=planes2,
        c_win=c_win.reshape(-1), sort2=pad_plane(tl.sort2),
        rowids=pad_plane(tl.rowids), inv2=pad_plane(tl.inv2),
        num_rows=tl.num_rows, num_cols=tl.num_cols, nnz=tl.nnz,
        num_windows=tl.num_windows, region_digits=tl.region_digits,
        kb=kb, rstep2=rstep2, f2=f2, dmax2=dmax2, nsteps2=nsteps2,
        fill2=tl.fill2, dstep2=dstep2, num_slots2=num_slots2)


def pack_tropical_sharded(csr: CSRMatrix, rows_shards: int, col_shards: int,
                          config: EngineConfig = DEFAULT_CONFIG,
                          region_rows: int | None = None,
                          cb: int = 16, kb: int = 16
                          ) -> ShardedTropicalLayout:
    """Split CSR into (R x C) blocks, tropical-pack each (planar pass-1 with
    the FLOAT_INF annihilator + split/reduce schedules), pad all to the
    mesh-common geometry. Lifts round-3's ADDMIN exclusion: multi-chip SSSP
    can now ride the only engine that scales past ~700K rows/shard."""
    from ..io.tropical_format import (TropicalSpMVLayout,
                                      build_split_schedule,
                                      choose_tropical_region_rows)
    from ..semiring import FLOAT_INF
    work = csr.copy()
    util_round_csr_matrix_dim(work, rows_shards * 1024, col_shards * 1024)
    nrows, ncols = work.num_rows, work.num_cols
    rb, cbk = nrows // rows_shards, ncols // col_shards
    if region_rows is None:
        region_rows = choose_tropical_region_rows(rb)

    nnz = work.nnz
    rows = work.row_ids()
    cols = work.adj_indices[:nnz].astype(np.int64)
    vals = np.clip(work.adj_data[:nnz], 0.0, float(FLOAT_INF))

    tls = []
    for i in range(rows_shards):
        row_l = []
        sel_i = (rows >= i * rb) & (rows < (i + 1) * rb)
        for j in range(col_shards):
            sel = sel_i & (cols >= j * cbk) & (cols < (j + 1) * cbk)
            if not sel.any():
                # empty block: seed one FLOAT_INF element at (0,0) — the
                # tropical annihilator (min(INF + x, INF) = the identity),
                # so the shard contributes nothing while the split-schedule
                # builder gets a non-empty layout
                sub = _csr_from_sorted_coo(
                    np.zeros(1, np.int64), np.zeros(1, np.int64),
                    np.full(1, float(FLOAT_INF), np.float32), rb, cbk)
            else:
                sub = _csr_from_sorted_coo(rows[sel] - i * rb,
                                           cols[sel] - j * cbk,
                                           vals[sel], rb, cbk)
            lay = pack_planar(sub, config, pad_val=float(FLOAT_INF),
                              hi_pad=-1, cb=cb, region_rows=region_rows,
                              deal=config.planar_deal)
            parts = build_split_schedule(lay, kb=kb)
            row_l.append(TropicalSpMVLayout(
                planar=lay, num_rows=lay.num_rows, num_cols=lay.num_cols,
                nnz=lay.nnz, **parts))
        tls.append(row_l)

    flat = [t for rl in tls for t in rl]
    pc = dict(nsteps=max(t.planar.nsteps for t in flat),
              dstep=max(t.planar.dstep for t in flat),
              f=max(t.planar.f for t in flat),
              dmax=max(t.planar.dmax for t in flat),
              num_slots=max(t.planar.num_slots for t in flat))
    sc = dict(nsteps2=max(t.nsteps2 for t in flat),
              dstep2=max(t.dstep2 for t in flat),
              f2=max(t.f2 for t in flat),
              dmax2=max(t.dmax2 for t in flat),
              num_slots2=max(t.num_slots2 for t in flat))
    padded = [[_pad_tropical(t, pad_val=float(FLOAT_INF), **pc, **sc)
               for t in rl] for rl in tls]

    from ..ops.tropical_pallas import TropicalArrays
    proto0 = padded[0][0]
    arrays = {}
    for fld in TropicalArrays.FIELDS:
        def shaped(t):
            p = t.planar
            if fld == "a_page":
                return p.a_page.reshape(p.nsteps, 1, p.cb)
            if fld == "a_r":
                return p.a_r.reshape(p.nsteps, p.cb * S, L)
            if fld == "a_vals":
                return p.a_vals.reshape(p.nsteps, p.cb * S, L)
            if fld == "xperm":
                return p.xperm
            if fld == "rg":
                return _rg_flat(p.rg)
            if fld == "planes":
                return p.planes
            if fld == "in_order":
                return t.in_order.reshape(t.nsteps2, t.kb)
            if fld == "rg2":
                return _rg_flat(t.rg2)
            if fld == "planes2":
                return t.planes2
            if fld == "c_win":
                return t.c_win.reshape(t.nsteps2, 1, t.f2)
            if fld == "sort2":
                return t.sort2.reshape(t.nsteps2, t.f2 * S, L)
            if fld == "rowids":
                return t.rowids.reshape(t.nsteps2, t.f2 * S, L)
            if fld == "inv2":
                return t.inv2.reshape(t.nsteps2, t.f2 * S, L)
            if fld == "a_sub":
                return (p.a_sub.reshape(p.nsteps, p.cb * S, L)
                        if p.a_sub is not None else None)
            if fld == "qblk2":
                # sharded packs keep the rectangular window stream (no
                # compact_window_stream pass): identity block map
                return np.arange(t.nsteps2, dtype=np.int32)
            if fld in ("xsort2", "triples2"):
                return getattr(t, fld)
            raise KeyError(fld)
        if fld == "a_sub" and proto0.planar.a_sub is None:
            arrays[fld] = None
            continue
        if fld in ("xsort2", "triples2"):
            # shards are packed with the planes split format (the triples
            # arrays aren't mesh-padded yet — single-chip only for now)
            arrays[fld] = None
            continue
        arrays[fld] = np.stack([np.stack([shaped(t) for t in rl])
                                for rl in padded])

    return ShardedTropicalLayout(
        arrays=arrays, proto=proto0,
        num_rows=nrows, num_cols=ncols, nnz=nnz,
        rows_shards=rows_shards, col_shards=col_shards,
        local_rows=rb, local_cols=cbk,
        chunk_counts=np.array([[t.planar.nsteps * t.planar.cb for t in rl]
                               for rl in tls], np.int64))


class DistTropicalSpMV:
    """y[r] = min over shards/nnz of (A[r,c] + x[c]) — the scalable tropical
    engine sharded over a 2D mesh. Per-shard compute is the single-chip
    TropicalSpMV on the padded common geometry; cross-shard combine is a
    pmin over 'cols'. Same call surface as DistSpMV, so dist_sssp_pull
    works unchanged."""

    def __init__(self, layout: ShardedTropicalLayout, semiring: Semiring,
                 mesh: Mesh, config: EngineConfig = DEFAULT_CONFIG,
                 mask_type: MaskType = MaskType.NO_MASK):
        if semiring.op != OpType.ADDMIN:
            raise ValueError("DistTropicalSpMV is the ADDMIN engine")
        from ..ops.tropical_pallas import TropicalSpMV, TropicalArrays
        self.layout = layout
        self.semiring = semiring
        self.mesh = mesh
        self.config = config
        self.mask_type = mask_type
        self.num_rows = layout.num_rows
        self.num_cols = layout.num_cols
        self._eng = TropicalSpMV(layout.proto, semiring, config)

        spec = P("rows", "cols")
        put = lambda a: jax.device_put(jnp.asarray(a),
                                       NamedSharding(mesh, spec))
        arr = layout.arrays
        self.arrays = TropicalArrays(
            *[put(arr[f]) if arr.get(f) is not None else None
              for f in TropicalArrays.FIELDS])
        self._fields = [f for f in TropicalArrays.FIELDS
                        if arr.get(f) is not None]
        present = [arr.get(f) is not None for f in TropicalArrays.FIELDS]

        eng = self._eng
        local_rows = layout.local_rows

        def local_fn(x_local, *streams):
            it = iter(streams)
            vals = [next(it)[0, 0] if has else None for has in present]
            sh = TropicalArrays(*vals)
            x3 = x_local.reshape(-1, S, L)
            y = eng(x3, arrays=sh)[:local_rows]
            return jax.lax.pmin(y, "cols")

        self._sharded_fn = jax.shard_map(
            local_fn, mesh=mesh,
            in_specs=(P("cols"),) + tuple([spec] * len(self._fields)),
            out_specs=P("rows"),
            check_vma=False,
        )

    def __call__(self, x: jax.Array,
                 mask: jax.Array | None = None) -> jax.Array:
        y = self._sharded_fn(x, *(getattr(self.arrays, f)
                                  for f in self._fields))
        if mask is not None and self.mask_type != MaskType.NO_MASK:
            y = apply_mask(y, mask, self.mask_type, self.semiring.zero)
        return y

    def reshard_for_input(self, y: jax.Array) -> jax.Array:
        """Row-sharded result -> col-sharded input (ICI all-to-all)."""
        return jax.lax.with_sharding_constraint(
            y, NamedSharding(self.mesh, P("cols")))


class DistPlanarSpMV:
    """y = mask(A (x) x) with the planar router sharded over a 2D mesh.

    Per-shard compute is the single-chip PlanarSpMV compiled on the padded
    common geometry; cross-shard combine is a psum over 'cols'. Callable
    inside jitted app loops (arrays are traced shard_map inputs)."""

    def __init__(self, layout: ShardedPlanarLayout, semiring: Semiring,
                 mesh: Mesh, config: EngineConfig = DEFAULT_CONFIG,
                 mask_type: MaskType = MaskType.NO_MASK):
        if semiring.op == OpType.ADDMIN:
            raise ValueError("planar router is MULADD/ANDOR; tropical rides "
                             "DistSpMV's chunked path or single-chip")
        self.layout = layout
        self.semiring = semiring
        self.mesh = mesh
        self.config = config
        self.mask_type = mask_type
        self.num_rows = layout.num_rows
        self.num_cols = layout.num_cols

        # single-chip engine on the padded prototype: supplies the compiled
        # kernels' static dims + the fused/split auto-select
        self._eng = PlanarSpMV(layout.proto, semiring, config)

        spec = P("rows", "cols")
        vdt = (jnp.bfloat16 if config.mxu_precision == "default"
               else jnp.dtype(config.dtype))
        put = lambda a, dt=None: jax.device_put(
            jnp.asarray(a if dt is None else a.astype(dt)),
            NamedSharding(mesh, spec))
        arr = layout.arrays
        has_sub = arr.get("a_sub") is not None
        self.arrays = PlanarArrays(
            put(arr["a_page"]), put(arr["a_r"]), put(arr["xperm"]),
            put(arr["a_vals"], vdt), put(arr["rg"]), put(arr["planes"]),
            put(arr["c_code"]), put(arr["c_hi"]), put(arr["c_lo"]),
            put(arr["a_sub"]) if has_sub else None)

        eng = self._eng
        local_rows = layout.local_rows
        op = semiring.op
        # optional pytree slots (a_sub for deal="free", c_beg for permc)
        # ride only when present; local_fn re-inserts the Nones positionally
        self._fields = [f for f in PlanarArrays.FIELDS
                        if getattr(self.arrays, f) is not None]
        present = [getattr(self.arrays, f) is not None
                   for f in PlanarArrays.FIELDS]

        def local_fn(x_local, *streams):
            it = iter(streams)
            vals = [next(it)[0, 0] if has else None for has in present]
            sh = PlanarArrays(*vals)
            x3 = x_local.reshape(-1, S, L)
            y = eng(x3, arrays=sh)[:local_rows]
            return jax.lax.psum(y, "cols")

        self._sharded_fn = jax.shard_map(
            local_fn, mesh=mesh,
            in_specs=(P("cols"),) + tuple([spec] * len(self._fields)),
            out_specs=P("rows"),
            check_vma=False,
        )

    def __call__(self, x: jax.Array,
                 mask: jax.Array | None = None) -> jax.Array:
        y = self._sharded_fn(x, *(getattr(self.arrays, f)
                                  for f in self._fields))
        if self.semiring.op == OpType.ANDOR:
            y = jnp.where(y != 0, jnp.ones_like(y), jnp.zeros_like(y))
        if mask is not None and self.mask_type != MaskType.NO_MASK:
            y = apply_mask(y, mask, self.mask_type, self.semiring.zero)
        return y

    def reshard_for_input(self, y: jax.Array) -> jax.Array:
        """Row-sharded result -> col-sharded input (ICI all-to-all)."""
        return jax.lax.with_sharding_constraint(
            y, NamedSharding(self.mesh, P("cols")))
