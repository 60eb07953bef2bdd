import sys; sys.path.insert(0, ".")
"""Per-array HBM footprint of the tropical (SSSP) engine at a given scale.

Usage: python tools/tropical_footprint.py <graph> [scale]

Packs the tropical layout (through the disk cache) exactly as SSSP's
engine-shared module stack would, prints every device array's true HBM
bytes (post r5 flat-rg/compact-stream shapes tile ~1:1) plus the three
inter-pass temps (g1 / gm / g2), and the predicted peak vs the 15.75 GB
v5e budget. This is the number bench.feasible_sssp_scale's B/nnz constant
is calibrated against — crash-driven feasibility is retired (VERDICT r4
weak #5)."""
import numpy as np

from graphlily_tpu import EngineConfig
from graphlily_tpu.io import iccad_standin, ICCAD_GRAPHS
from graphlily_tpu.io.formatter import (util_round_csr_matrix_dim,
                                        add_self_edges_for_sssp)
from graphlily_tpu.io.layout_cache import pack_cached
from graphlily_tpu.ops.tropical_pallas import TropicalSpMV, TropicalArrays
from graphlily_tpu.semiring import TropicalSemiring

S, L = 8, 128
HBM_BUDGET_GB = 15.75


def report(layout):
    eng = TropicalSpMV.__new__(TropicalSpMV)
    rows = {}
    p = layout.planar
    nblocks2 = int(layout.nblocks2) if layout.qblk2 is not None \
        else layout.nsteps2
    rows["a_page"] = p.a_page.nbytes
    rows["a_r"] = p.a_r.nbytes
    rows["a_sub"] = p.a_sub.nbytes if p.a_sub is not None else 0
    rows["a_vals(f32)"] = p.a_vals.nbytes
    rows["rg (flat)"] = p.rg.nbytes
    p1t = getattr(p, "triples", None)
    rows["planes1" + ("->triples" if p1t is not None else "")] = (
        p1t.nbytes if p1t is not None else p.planes.nbytes)
    rows["xperm"] = p.xperm.nbytes
    rows["in_order"] = layout.in_order.nbytes
    rows["rg2 (flat)"] = layout.rg2.nbytes
    if layout.triples2 is not None:
        rows["xsort2+triples2"] = (layout.xsort2.nbytes
                                   + layout.triples2.nbytes)
    else:
        rows["planes2"] = layout.planes2.nbytes
    rows["c_win"] = layout.c_win.nbytes
    rows["sort2+rowids+inv2"] = (layout.sort2.nbytes + layout.rowids.nbytes
                                 + layout.inv2.nbytes)
    rows["qblk2"] = layout.qblk2.nbytes if layout.qblk2 is not None else 0
    args = sum(rows.values())
    # inter-pass temps (peak-resident within one SpMV program)
    g1 = p.nsteps * p.f * S * L * 4
    gm = layout.nsteps2 * layout.kb * S * L * 4
    g2 = nblocks2 * layout.f2 * S * L * 4
    out = layout.num_windows * L * 4
    return rows, args, dict(g1=g1, gm=gm, g2=g2, out=out)


def main():
    name = sys.argv[1]
    scale = float(sys.argv[2]) if len(sys.argv) > 2 else 1.0
    cfg = EngineConfig(sort_rows_by_degree=True, mxu_precision="default",
                       tropical_split_format="auto",
                       layout_cache=".layout_cache")
    print(f"generating {name} scale {scale} ...", flush=True)
    g = iccad_standin(name, scale=scale, seed=1)
    g.adj_data = np.ones_like(g.adj_data)
    g = add_self_edges_for_sssp(g)
    util_round_csr_matrix_dim(g, 1024, 1024)
    print(f"nnz={g.nnz} rows={g.num_rows}; packing ...", flush=True)
    lay = pack_cached("tropical", g, cfg, log=print)
    rows, args, temps = report(lay)
    for k, v in rows.items():
        print(f"  {k:>22}: {v/1e9:7.3f} GB")
    tt = sum(temps.values())
    print(f"  {'ARGS total':>22}: {args/1e9:7.3f} GB "
          f"({args/g.nnz:.1f} B/nnz)")
    for k, v in temps.items():
        print(f"  {'temp ' + k:>22}: {v/1e9:7.3f} GB")
    peak = args + tt
    print(f"  {'PREDICTED PEAK':>22}: {peak/1e9:7.3f} GB "
          f"({peak/g.nnz:.1f} B/nnz) vs budget {HBM_BUDGET_GB} GB "
          f"-> {'FITS' if peak/1e9 <= HBM_BUDGET_GB else 'OVER'}")
    print(f"  fill2={lay.fill2:.3f} nblocks2={lay.nblocks2} "
          f"nsteps2={lay.nsteps2} f2={lay.f2} "
          f"split={'triples' if lay.triples2 is not None else 'planes'}")


if __name__ == "__main__":
    main()
