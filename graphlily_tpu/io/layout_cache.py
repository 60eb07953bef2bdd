"""Layout disk cache + structure/value pack split.

Packing the router/planar layouts is host-bound: the schedule simulation and
the nnz-scale sorts take 1.5-17 minutes per benchmark graph on this 1-vCPU
host (orkut full scale measured 1049 s), and the apps re-pack the SAME
structure up to three times per bench run (SpMV, PageRank, BFS). The
reference re-formats per run too, but its formatter is seconds of C++
(graphlily/io/data_formatter.h); the TPU layouts precompute far more (every
runtime index + the deposit/flush schedules), so persistence is the right
tool. Two mechanisms:

  * disk cache: layouts persist as .npz (uncompressed zip64), keyed by a
    BLAKE2b hash of (packer kind + PACK_VERSION + packer params + matrix
    STRUCTURE: dims/indptr/indices). An exact value-hash match loads as-is.
  * structure/value split: every layout carries `el_slot`, the
    original-order nnz -> value-stream flat slot permutation. A structure
    hit with different values (PageRank's outdegree-normalized matrix vs
    BFS's unit weights on the same adjacency) refills the value stream with
    ONE O(nnz) scatter instead of re-simulating schedules.

Enable by passing `cache_dir`, or globally via $GLT_LAYOUT_CACHE.
"""
from __future__ import annotations

import dataclasses
import hashlib
import json
import os
import tempfile
from typing import Optional

import numpy as np

# bump when any packer's layout semantics change: stale cache entries from
# an older code version must miss, not deserialize into wrong schedules.
# KIND_VERSIONS bumps one packer without invalidating the others' (slow to
# rebuild) cached layouts.
PACK_VERSION = 5
KIND_VERSIONS = {"router": 3, "planar": 3, "tropical": 5}  # phase-ordered
# streams with K-rotated accumulator slots (planar v2 nests inside tropical);
# tropical v4: staggered residual drains (f2 ~= balanced flush load);
# tropical v5: compact window stream (qblk2 block map, rg2 q = block offset)


def _config_key_fields(kind: str, config, csr=None) -> dict:
    """Config fields that shape the packed layout (must key the cache —
    params alone miss them: the chunked packer reads its geometry off the
    config, and all packers take the value dtype from it)."""
    if config is None:
        return {}
    d = {"dtype": str(config.dtype)}
    if kind == "chunked":
        d.update(row_window=config.row_window, col_tile=config.col_tile,
                 chunk_sublanes=config.chunk_sublanes, lanes=config.lanes,
                 skip_empty_rows=config.skip_empty_rows)
    elif kind == "tropical":
        # the split deposit format changes the packed arrays (planes2 vs
        # xsort2/triples2) — configs differing here must not share entries.
        # "auto" is RESOLVED before keying (the same a-priori rule the
        # packer uses), so an auto config shares the concrete format's
        # entry instead of storing a bit-identical multi-GB duplicate.
        # Only keyed when non-planes so existing cache entries stay live.
        from .tropical_format import resolve_tropical_split_format
        fmt = resolve_tropical_split_format(
            csr.nnz if csr is not None else 0, config)
        if fmt != "planes":
            d.update(split_format=fmt)
    return d


def _packers():
    from .formatter import pack_csr_chunks, ChunkedSpMVLayout
    from .router_format import pack_router, RouterSpMVLayout
    from .planar_format import pack_planar, PlanarSpMVLayout
    from .tropical_format import pack_tropical, TropicalSpMVLayout
    return {
        "chunked": (pack_csr_chunks, ChunkedSpMVLayout),
        "router": (pack_router, RouterSpMVLayout),
        "planar": (pack_planar, PlanarSpMVLayout),
        "tropical": (pack_tropical, TropicalSpMVLayout),
    }


def resolve_cache_dir(cache_dir: Optional[str] = None) -> Optional[str]:
    d = cache_dir if cache_dir is not None else os.environ.get(
        "GLT_LAYOUT_CACHE")
    return d or None


def _hash_update_array(h, a: np.ndarray) -> None:
    a = np.ascontiguousarray(a)
    h.update(str(a.dtype).encode())
    h.update(str(a.shape).encode())
    h.update(memoryview(a).cast("B"))


def structure_key(kind: str, csr, params: dict) -> str:
    h = hashlib.blake2b(digest_size=16)
    kv = KIND_VERSIONS.get(kind, 1)
    h.update(f"{kind}|v{PACK_VERSION}.{kv}|{csr.num_rows}x{csr.num_cols}"
             f"|{csr.nnz}|{json.dumps(params, sort_keys=True)}".encode())
    _hash_update_array(h, csr.adj_indptr)
    _hash_update_array(h, csr.adj_indices[:csr.nnz])
    return h.hexdigest()


def value_key(csr) -> str:
    h = hashlib.blake2b(digest_size=16)
    _hash_update_array(h, csr.adj_data[:csr.nnz])
    return h.hexdigest()


def _collect_fields(layout, prefix: str, arrays: dict, meta: dict) -> None:
    """Flatten a (possibly nested) layout dataclass: arrays keyed by dotted
    path, scalars into meta, nested layouts recursed (TropicalSpMVLayout
    wraps a PlanarSpMVLayout)."""
    for f in dataclasses.fields(layout):
        v = getattr(layout, f.name)
        key = prefix + f.name
        if isinstance(v, np.ndarray):
            arrays[key] = v
        elif dataclasses.is_dataclass(v) and not isinstance(v, type):
            meta.setdefault("nested", {})[key] = type(v).__name__
            _collect_fields(v, key + ".", arrays, meta)
        elif v is None:
            meta.setdefault("none_fields", []).append(key)
        else:
            meta[key] = v


def save_layout(path: str, layout, vkey: str, pad_val: float) -> None:
    arrays, meta = {}, {"value_key": vkey, "pad_val": pad_val,
                        "cls": type(layout).__name__}
    _collect_fields(layout, "", arrays, meta)
    # atomic publish: a parallel/interrupted writer must never leave a
    # truncated npz that future runs deserialize
    d = os.path.dirname(path) or "."
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".npz.tmp")
    try:
        with os.fdopen(fd, "wb") as fh:
            np.savez(fh, __meta__=np.frombuffer(
                json.dumps(meta).encode(), dtype=np.uint8), **arrays)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def _layout_classes():
    return {cls.__name__: cls for _, cls in _packers().values()}


def _build_fields(cls, prefix: str, z, meta):
    kw = {}
    nested = meta.get("nested", {})
    for f in dataclasses.fields(cls):
        key = prefix + f.name
        if key in nested:
            kw[f.name] = _build_fields(_layout_classes()[nested[key]],
                                       key + ".", z, meta)
        elif key in z.files:
            kw[f.name] = z[key]
        elif key in meta:
            kw[f.name] = meta[key]
        # else: None default
    return cls(**kw)


def load_layout(path: str, cls):
    with np.load(path) as z:
        meta = json.loads(bytes(z["__meta__"]).decode())
        layout = _build_fields(cls, "", z, meta)
    return layout, meta


def _refill_values(layout, csr, pad_val: float) -> None:
    """Structure hit, value miss: rewrite the value stream in place."""
    data = csr.adj_data[:csr.nnz]
    if hasattr(layout, "planar"):       # tropical: planar pass-1 carries the
        from ..semiring import FLOAT_INF  # raw values, pad INF, domain [0,INF]
        layout = layout.planar
        pad_val = float(FLOAT_INF)
        data = np.clip(data, 0.0, float(FLOAT_INF))
    vals = layout.vals if hasattr(layout, "vals") else layout.a_vals
    flat = vals.reshape(-1)
    flat[:] = pad_val
    flat[layout.el_slot] = data.astype(vals.dtype)


def _gc_stale(d: str, kind: str, ver: str, log=None) -> None:
    """Delete this kind's version-prefixed entries from OTHER versions —
    unreachable after a bump, and big enough (GBs/graph) to fill the disk."""
    try:
        for fn in os.listdir(d):
            if (fn.startswith(f"{kind}_v") and fn.endswith(".npz")
                    and not fn.startswith(f"{kind}_{ver}_")):
                os.unlink(os.path.join(d, fn))
                if log:
                    log(f"layout cache: dropped stale {fn}")
    except OSError:
        pass


def pack_cached(kind: str, csr, config=None, cache_dir: Optional[str] = None,
                log=None, **params):
    """Pack `csr` with the `kind` packer, through the disk cache when a
    cache dir is configured. Returns the layout (el_slot populated)."""
    packer, cls = _packers()[kind]
    if cache_dir is None and config is not None:
        cache_dir = getattr(config, "layout_cache", None)
    d = resolve_cache_dir(cache_dir)
    kwargs = dict(params)
    if config is not None:
        kwargs["config"] = config
    if d is None:
        return packer(csr, **kwargs)
    skey = structure_key(kind, csr, dict(params,
                                         **_config_key_fields(kind, config, csr)))
    vkey = value_key(csr)
    # version-prefixed filenames let a GC drop entries stranded by a
    # version bump (a multi-GB layout per graph per kind; stale entries
    # once filled the disk). Entries under the old unversioned naming are
    # still read as a fallback.
    ver = f"v{PACK_VERSION}.{KIND_VERSIONS.get(kind, 1)}"
    path = os.path.join(d, f"{kind}_{ver}_{skey}.npz")
    _gc_stale(d, kind, ver, log)
    if not os.path.exists(path):
        legacy = os.path.join(d, f"{kind}_{skey}.npz")
        if os.path.exists(legacy):
            path = legacy
    pad_val = float(params.get("pad_val", 0.0))
    if os.path.exists(path):
        try:
            layout, meta = load_layout(path, cls)
        except Exception as e:  # corrupt entry: repack
            if log:
                log(f"layout cache: unreadable entry {path} ({e}); repacking")
            layout = None
        if layout is not None:
            if meta.get("value_key") != vkey:
                _refill_values(layout, csr, pad_val)
                if log:
                    log(f"layout cache: structure hit + value refill ({kind})")
            elif log:
                log(f"layout cache: hit ({kind})")
            return layout
    layout = packer(csr, **kwargs)
    try:
        save_layout(path, layout, vkey, pad_val)
        if log:
            log(f"layout cache: stored {path} "
                f"({os.path.getsize(path) / 1e9:.2f} GB)")
    except Exception as e:  # cache is best-effort (disk full etc.)
        if log:
            log(f"layout cache: store failed ({e})")
    return layout
