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


def dist_bfs_pull_push(eng_pull: DistSpMV, source: int,
                       num_iterations: int, threshold: float = 0.05,
                       eng_push: DistSpMV | None = None):
    """Distributed adaptive-direction BFS with the reference's exact
    iteration semantics (app/bfs.h:160-219 — do-while push while the
    frontier is sparse, then pull). Push computes the SAME A (x) frontier
    product (the reference's SpMSpV consumes A in CSC storage, not A^T —
    module/spmspv_module.py packs csc2csr(csr2csc(A)) == A); `eng_push`
    optionally supplies a frontier-predicated engine for that product and
    defaults to `eng_pull` (dense-frontier equivalence, apps/bfs.py
    push_step). The density check is an on-device global sum XLA reduces
    across shards; the rows->cols reshard between iterations is the ICI
    all-to-all."""
    if eng_push is None:
        eng_push = eng_pull
    assert eng_pull.num_rows == eng_pull.num_cols, (
        "iterating apps need square padding (see dist_bfs_pull)")
    n = eng_pull.num_rows

    @jax.jit
    def loop(frontier, distance, iters, thr):
        def step(direction_eng, i, fr, dist):
            y = direction_eng(fr, dist)
            val = (i + 1).astype(dist.dtype)
            dist = jnp.where(y != 0, val, dist)
            return direction_eng.reshard_for_input(y), dist

        # phase 1: push (do-while, bfs.h:179-190)
        def push_cond(carry):
            it, _fr, nnz, _dist = carry
            sparse = nnz.astype(jnp.float32) / n < thr
            return jnp.logical_or(it == 0,
                                  jnp.logical_and(it + 1 < iters, sparse))

        def push_body(carry):
            it, fr, _nnz, dist = carry
            fr, dist = step(eng_push, it + 1, fr, dist)
            return (it + 1, fr, (fr != 0).sum().astype(jnp.int32), dist)

        it, fr, _nnz, dist = jax.lax.while_loop(
            push_cond, push_body,
            (jnp.asarray(0, jnp.int32), frontier,
             jnp.asarray(1, jnp.int32), distance))

        # phase 2: pull for the remaining iterations (frontier already dense)
        def pull_body(carry):
            it2, fr2, dist2 = carry
            fr2, dist2 = step(eng_pull, it2 + 1, fr2, dist2)
            return (it2 + 1, fr2, dist2)

        _, _, dist = jax.lax.while_loop(
            lambda c: c[0] < iters, pull_body, (it, fr, dist))
        return dist

    f0 = np.zeros(eng_pull.num_cols, np.float32)
    f0[source] = 1
    d0 = np.zeros(n, np.float32)
    d0[source] = 1
    return np.asarray(loop(jnp.asarray(f0), jnp.asarray(d0),
                           jnp.asarray(num_iterations),
                           jnp.asarray(threshold, jnp.float32)))


def dist_sssp_pull_push(eng_pull, source: int, num_iterations: int,
                        threshold: float = 0.05, eng_push=None):
    """Distributed adaptive-direction SSSP (the tropical twin of
    dist_bfs_pull_push; single-chip counterpart apps/sssp.py
    pull_push_fused / reference app/sssp.h:222-236): do-while push while
    the improved-vertex frontier is sparse, then pull. The push step
    relaxes distances where candidates improve them; improved entries form
    the next frontier (inactive = tropical INF). Works with any
    TropicalSemiring dist engine sharing the DistSpMV call surface
    (DistSpMV chunked or DistTropicalSpMV)."""
    if eng_push is None:
        eng_push = eng_pull
    assert eng_pull.num_rows == eng_pull.num_cols, (
        "iterating apps need square padding (see dist_bfs_pull)")
    n = eng_pull.num_rows
    inf = jnp.asarray(eng_pull.semiring.zero, jnp.float32)

    @jax.jit
    def loop(frontier, distance, iters, thr):
        def push_cond(carry):
            it, _fr, nnz, _d = carry
            sparse = nnz.astype(jnp.float32) / n < thr
            return jnp.logical_or(it == 0,
                                  jnp.logical_and(it + 1 < iters, sparse))

        def push_body(carry):
            it, fr, _nnz, dist = carry
            y = eng_push(fr)
            improved = y < dist
            dist = jnp.where(improved, y, dist)
            fr = eng_push.reshard_for_input(jnp.where(improved, y, inf))
            nnz = jnp.sum(improved).astype(jnp.int32)
            return (it + 1, fr, nnz, dist)

        it, _fr, _nnz, dist = jax.lax.while_loop(
            push_cond, push_body,
            (jnp.asarray(0, jnp.int32), frontier,
             jnp.asarray(1, jnp.int32), distance))

        def pull_body(carry):
            it2, d = carry
            y = eng_pull(eng_pull.reshard_for_input(d))
            return (it2 + 1, y)

        _, dist = jax.lax.while_loop(lambda c: c[0] < iters, pull_body,
                                     (it, dist))
        return dist

    f0 = np.full(eng_pull.num_cols, float(inf), np.float32)
    f0[source] = 0.0
    d0 = np.full(n, float(inf), np.float32)
    d0[source] = 0.0
    return np.asarray(loop(jnp.asarray(f0), jnp.asarray(d0),
                           jnp.asarray(num_iterations),
                           jnp.asarray(threshold, jnp.float32)))


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
