"""Print planar/router layout stream statistics for the reduce-wall cost
model: deposit/flush counts, per-step occupancy, plane fill, stream bytes."""
import sys; sys.path.insert(0, ".")
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
from graphlily_tpu.io import iccad_standin, util_round_csr_matrix_dim
from graphlily_tpu.io.formatter import util_normalize_csr_matrix_by_outdegree
from graphlily_tpu.io.planar_format import pack_planar
from graphlily_tpu.io.router_format import pack_router

name = sys.argv[1] if len(sys.argv) > 1 else "pokec"
kind = sys.argv[2] if len(sys.argv) > 2 else "planar"
g = iccad_standin(name, scale=1.0, seed=1)
util_round_csr_matrix_dim(g, 1024, 1024)
print(f"{name}: rows={g.num_rows} cols={g.num_cols} nnz={g.nnz}")
lay = (pack_planar if kind == "planar" else pack_router)(g)
rg = lay.rg
w2 = rg[..., 1]
ndep = int((w2 > 0).sum()); nfl = int((w2 < 0).sum())
dep_per_step = (w2[:, :lay.dstep] > 0).sum(axis=1)
fl_per_step = (w2[:, lay.dstep:] < 0).sum(axis=1)
print(f"kind={kind} regions={lay.num_regions} region_rows={lay.region_rows} "
      f"cb={lay.cb} nsteps={lay.nsteps} dstep={lay.dstep} f={lay.f} "
      f"num_slots={lay.num_slots}")
print(f"deposits: total={ndep} per_step avg={dep_per_step.mean():.1f} "
      f"max={dep_per_step.max()} per_chunk={ndep/max(lay.nsteps*lay.cb,1):.2f}")
print(f"flushes:  total={nfl} per_step avg={fl_per_step.mean():.1f} max={fl_per_step.max()}")
print(f"fill_a={lay.fill_a:.3f} fill_stream={lay.fill_stream:.3f} "
      f"flush_fill(nnz/(nf*1024))={g.nnz/max(nfl*1024,1):.3f}")
# CG-4 activity: fused reduce runs groups of 4 flush ordinals when ANY active
code = lay.c_code.reshape(lay.nsteps, lay.f)
act = code >= 0
cg = act.reshape(lay.nsteps, -1, min(4, lay.f) if lay.f >= 4 else 1)
grp_any = cg.any(axis=2)
print(f"reduce CG4: executed_bodies={int(grp_any.sum()) * cg.shape[2]} "
      f"active_bodies={int(act.sum())} ratio={grp_any.sum()*cg.shape[2]/max(act.sum(),1):.2f}")
if kind == "planar":
    pb = lay.planes.nbytes
else:
    pb = 0
sb = dict(vals=lay.a_vals.nbytes, lanes=lay.a_r.nbytes, planes=pb,
          rg=lay.rg.nbytes, hi=lay.c_hi.nbytes, lo=lay.c_lo.nbytes)
tot = sum(sb.values())
print("stream MB:", {k: round(v/1e6, 1) for k, v in sb.items()}, "total", round(tot/1e6, 1))
print(f"bytes/nnz={tot/g.nnz:.2f}")
