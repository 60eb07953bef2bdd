"""Pure HBM->VMEM streaming ceiling probe (device-looped, carry-dependent).
The grid kernel reads a (1,H,8,128) int8 block per step and writes one
(8,128) f32 row derived from the block's LAST sublane group (so the DMA
cannot be narrowed), accumulated into a carry so nothing is hoisted."""
import sys; sys.path.insert(0, ".")
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NSTEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
H = int(sys.argv[2]) if len(sys.argv) > 2 else 256
REPS = int(sys.argv[3]) if len(sys.argv) > 3 else 8

def kernel(b_ref, o_ref):
    # touch first and last slice of the block (DMA must fetch it all)
    o_ref[0] = (b_ref[0, 0].astype(jnp.float32)
                + b_ref[0, H - 1].astype(jnp.float32))

def stream_once(blocks):
    fn = pl.pallas_call(
        kernel,
        grid=(NSTEPS,),
        in_specs=[pl.BlockSpec((1, H, 8, 128), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NSTEPS, 8, 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64*1024*1024),
    )
    return fn(blocks)

@jax.jit
def run(blocks, reps):
    def body(i, carry):
        # carry-dependent: perturb one element so the stream can't be CSE'd
        b2 = blocks.at[0, 0, 0, 0].add(carry.astype(jnp.int8))
        out = stream_once(b2)
        return (out[0, 0, 0] + out[-1, 0, 0]).astype(jnp.float32) * 0 + 1
    return jax.lax.fori_loop(0, reps, body, jnp.float32(0))

blocks = jnp.zeros((NSTEPS, H, 8, 128), jnp.int8)
nbytes = blocks.size
print(f"stream {nbytes/1e6:.0f} MB/rep, block {H}KB x {NSTEPS}, reps={REPS}")
float(run(blocks, 1))  # compile+warm
floor = []
for _ in range(6):
    t0 = time.perf_counter(); float(run(blocks, 1)); floor.append(time.perf_counter() - t0)
fl = min(floor)
t0 = time.perf_counter(); float(run(blocks, REPS)); dt = time.perf_counter() - t0
per = (dt - fl) / (REPS - 1)
print(f"1-rep min {fl*1e3:.2f} ms; per-rep {per*1e3:.2f} ms -> {nbytes/per/1e9:.1f} GB/s")
