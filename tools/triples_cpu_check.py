#!/usr/bin/env python
"""CPU interpret-mode check of the triples scatter vs the plane scatter
(bitwise). Distinguishes a host-side triples-conversion bug from a Mosaic
lowering bug in tools/triples_probe.py."""
import sys

import numpy as np

sys.path.insert(0, ".")
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from graphlily_tpu import EngineConfig
from graphlily_tpu.io import rmat_csr
from graphlily_tpu.io.planar_format import pack_planar
from graphlily_tpu.ops.router_pallas import (_planar_scatter_call, S, L,
                                              _rg_flat)
from graphlily_tpu.semiring import OpType

from importlib.machinery import SourceFileLoader
tp = SourceFileLoader("tp", "tools/triples_probe.py")
# can't import the probe module directly (it parses argv); inline instead
sys.argv = ["x"]
import tools.triples_probe as probe  # noqa: E402


def main():
    config = EngineConfig(interpret=True)
    csr = rmat_csr(4096, 60000, seed=3)
    lay = pack_planar(csr, config, deal="free", native=False)
    print(f"nsteps={lay.nsteps} cb={lay.cb} dstep={lay.dstep} f={lay.f}",
          flush=True)
    tw = probe.planes_to_triples(lay)
    nct = lay.num_col_tiles
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((nct, S, L), np.float32))
    page = jnp.asarray(lay.a_page.reshape(lay.nsteps, 1, lay.cb))
    r = jnp.asarray(lay.a_r.reshape(lay.nsteps, lay.cb * S, L))
    sub = jnp.asarray(lay.a_sub.reshape(lay.nsteps, lay.cb * S, L))
    vals = jnp.asarray(lay.a_vals.reshape(lay.nsteps, lay.cb * S, L))
    rg = jnp.asarray(_rg_flat(lay.rg))
    out_old = np.asarray(_planar_scatter_call(
        page, r, vals, rg, jnp.asarray(lay.planes), x, sub,
        op=OpType.MULADD, cb=lay.cb, rstep=lay.rstep, f=lay.f,
        dmax=lay.dmax, nreg=lay.num_slots, nct=nct, nsteps=lay.nsteps,
        interpret=True, dtype="float32", dstep=lay.dstep, banks2=False))
    out_new = np.asarray(probe.triples_scatter(
        page, r, sub, vals, rg, jnp.asarray(tw), x,
        op=OpType.MULADD, cb=lay.cb, rstep=lay.rstep, f=lay.f,
        TP=tw.shape[1], nreg=lay.num_slots, nct=nct, nsteps=lay.nsteps,
        dstep=lay.dstep, banks2=False, interpret=True))
    # only real flush ordinals are written; padding slots are
    # uninitialized in both kernels (nan != nan)
    msk = (lay.c_code.reshape(lay.nsteps, lay.f) >= 0)[:, :, None, None]
    ok = np.where(msk, out_old == out_new, True)
    if ok.all():
        print("CPU interpret: BITWISE EQUAL", flush=True)
    else:
        bad = np.nonzero(~ok)
        print(f"CPU interpret MISMATCH at {len(bad[0])}: "
              f"{[b[:5] for b in bad]}")
        i = tuple(b[0] for b in bad)
        print("old", out_old[i], "new", out_new[i])
        sys.exit(1)


if __name__ == "__main__":
    main()
