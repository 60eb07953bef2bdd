"""Targeted full-scale SSSP measurement (round-4 flush-stagger payoff).

The r4 EDF flush staggering cut the tropical engine's all-in footprint to
~98.4 B/nnz (io/tropical_format._schedule_flushes), which makes hollywood
(112.75M edges) and ogbn_products (123.7M) fit FULL scale in the 14 GB
budget and lifts orkut 0.25 -> 0.5. This tool measures ONLY the SSSP
pull_push row per graph (bench.bench_apps(only_sssp=True) — same
device_output + probe-fetch + min-of-reps protocol as the canonical apps
bench) and merges the result into BENCH_DETAILS.json, leaving the current
PageRank/BFS fields untouched.

Usage: python tools/sssp_full.py [--force] hollywood ogbn_products orkut
(--force re-measures rows already at the target scale, e.g. after an
engine-generation change)
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench
from graphlily_tpu import EngineConfig
from graphlily_tpu.io import ICCAD_GRAPHS


def main():
    argv = sys.argv[1:]
    force = "--force" in argv
    names = [a for a in argv if a != "--force"]         or ["hollywood", "ogbn_products", "orkut"]
    config = EngineConfig(mxu_precision="default", sort_rows_by_degree=True,
                          layout_cache=".layout_cache")
    for name in names:
        t0 = time.perf_counter()
        sc, g = bench.feasible_sssp_scale(name, config)
        if sc is None:
            bench.log(f"{name}: no feasible SSSP scale")
            continue
        bench.log(f"== {name} SSSP scale {sc} (nnz={g.nnz}, "
                  f"est {g.nnz * 50e-9:.1f} GB) ==")
        key = f"{name}_s1.0"
        with open("BENCH_DETAILS.json") as f:
            details = json.load(f)
        row = details.get(key, {})
        prev = {"sssp_pull_push_ms": row.get("sssp_pull_push_ms"),
                "sssp_scale": row.get("sssp_scale")}
        if (not force and row.get("sssp_scale") == sc
                and row.get("sssp_pull_push_ms") is not None):
            bench.log(f"{name}: row already at scale {sc} "
                      f"({row['sssp_pull_push_ms']:.1f} ms); skipping")
            continue
        res = bench.bench_apps(g, config, ICCAD_GRAPHS[name]["iters"],
                               with_sssp=True, sssp_csr=g, sssp_scale=sc,
                               only_sssp=True)
        # merge-on-success only: a failed full-scale attempt must not
        # clobber the valid smaller-scale measurement already in the row
        with open("BENCH_DETAILS.json") as f:
            details = json.load(f)
        row = details.setdefault(key, {})
        if "sssp_pull_push_ms" in res:
            row.update(res)
            bench.log(f"{name}: SSSP scale {sc}: "
                      f"{res['sssp_pull_push_ms']:.1f} ms "
                      f"(total {time.perf_counter() - t0:.0f}s incl. "
                      "gen+pack+compile)")
        else:
            row["sssp_full_error"] = res.get("sssp_error", "unknown")
            row.update({k: v for k, v in prev.items() if v is not None})
            bench.log(f"{name}: FAILED: {row['sssp_full_error']}")
        with open("BENCH_DETAILS.json", "w") as f:
            json.dump(details, f, indent=2)


if __name__ == "__main__":
    main()
