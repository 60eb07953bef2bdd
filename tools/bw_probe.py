"""HBM streaming bandwidth probe through pallas grids.

Measures GB/s for: pure copy at several per-step block sizes, with/without a
resident (non-streamed) VMEM input, and with an SMEM per-step stream.
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def probe(nsteps, rows, resident_mb=0, smem_slots=0, label=""):
    x = jnp.ones((nsteps, rows, 128), jnp.float32)
    args = [x]
    in_specs = [pl.BlockSpec((1, rows, 128), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)]
    if resident_mb:
        nres = int(resident_mb * 1e6 / (8 * 128 * 4))
        args.append(jnp.ones((nres, 8, 128), jnp.float32))
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
    if smem_slots:
        args.append(jnp.ones((nsteps, smem_slots, 2), jnp.int32))
        in_specs.append(pl.BlockSpec((1, smem_slots, 2), lambda i: (i, 0, 0),
                                     memory_space=pltpu.SMEM))

    def kernel(*refs):
        x_ref = refs[0]
        o_ref = refs[-1]
        o_ref[...] = x_ref[...]

    fn = pl.pallas_call(
        kernel, grid=(nsteps,), in_specs=in_specs,
        out_specs=pl.BlockSpec((1, rows, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nsteps, rows, 128), jnp.float32))

    iters = 20

    @jax.jit
    def loop():
        def body(_i, acc):
            return acc + fn(*args)[0, 0, 0] * 0.0
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    np.asarray(loop())
    t0 = time.perf_counter()
    np.asarray(loop())
    dt = (time.perf_counter() - t0) / iters
    nbytes = nsteps * rows * 128 * 4 * 2  # read + write
    print(f"{label:42s}: {dt*1e3:7.3f} ms  {nbytes/dt/1e9:7.1f} GB/s",
          flush=True)


def main():
    kb = 8 * 128 * 4 // 1024  # 4KB per (8,128) block
    for rows, steps in [(8, 17160), (64, 2145), (256, 536), (1024, 134)]:
        probe(steps, rows, label=f"copy block={rows*128*4//1024}KB x{steps}")
    probe(2145, 64, resident_mb=3.4, label="copy 32KB blocks + 3.4MB resident")
    probe(2145, 64, smem_slots=66, label="copy 32KB blocks + SMEM 66x2 stream")
    probe(2145, 64, resident_mb=3.4, smem_slots=66,
          label="copy 32KB blocks + resident + SMEM")


if __name__ == "__main__":
    main()
