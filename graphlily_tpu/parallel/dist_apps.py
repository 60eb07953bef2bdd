"""Fused distributed app loops over a 2D device mesh.

Multi-chip extension beyond the single-FPGA reference: the WHOLE iteration
loop — masked semiring SpMV (per-shard pallas kernel + psum/pmin over the
'cols' axis), distance stamping, and the rows->cols reshard (ICI all-to-all
placed by XLA) — runs as ONE jitted `lax.fori_loop` program, mirroring the
single-chip fused apps (apps/bfs.py, apps/sssp.py) shard-for-shard.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..semiring import MaskType
from .dist_spmv import DistSpMV


def dist_bfs_pull(eng: DistSpMV, source: int, num_iterations: int):
    """Distributed BFS pull: eng must be a LogicalSemiring DistSpMV with
    WRITE_TO_ZERO masking (the visited-vertex drop, app/bfs.h:117-124).
    Returns the distance vector (levels, 1-based at the source)."""
    assert eng.num_rows == eng.num_cols, (
        "iterating apps need square padding: round the matrix to "
        "lcm(rows_shards, col_shards)*1024 on both dims before pack_sharded")
    n = eng.num_rows

    @jax.jit
    def loop(frontier, distance, iters):
        def body(i, st):
            fr, dist = st
            y = eng(fr, dist)                       # masked, row-sharded
            val = (i + 1).astype(dist.dtype)        # level stamp = iter + 1
            dist = jnp.where(y != 0, val, dist)
            return eng.reshard_for_input(y), dist
        _, dist = jax.lax.fori_loop(1, iters + 1, body,
                                    (frontier, distance))
        return dist

    f0 = np.zeros(eng.num_cols, np.float32)
    f0[source] = 1
    d0 = np.zeros(n, np.float32)
    d0[source] = 1
    return np.asarray(loop(jnp.asarray(f0), jnp.asarray(d0),
                           jnp.asarray(num_iterations)))


def dist_sssp_pull(eng: DistSpMV, source: int, num_iterations: int):
    """Distributed SSSP pull: eng must be a TropicalSemiring DistSpMV
    (cross-shard combine = pmin over 'cols'). The matrix must carry the
    zero-weight self edges (add_self_edges_for_sssp) so relaxation is
    monotone, exactly as the single-chip app (apps/sssp.py)."""
    assert eng.num_rows == eng.num_cols, (
        "iterating apps need square padding (see dist_bfs_pull)")
    inf = jnp.asarray(eng.semiring.zero, jnp.float32)

    @jax.jit
    def loop(distance, iters):
        def body(_i, d):
            y = eng(d)
            return eng.reshard_for_input(y)
        return jax.lax.fori_loop(0, iters, body, distance)

    d0 = np.full(eng.num_cols, float(inf), np.float32)
    d0[source] = 0.0
    return np.asarray(loop(jnp.asarray(d0), jnp.asarray(num_iterations)))
