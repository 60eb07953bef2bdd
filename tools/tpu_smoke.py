import sys; sys.path.insert(0, ".")
import numpy as np
from graphlily_tpu import EngineConfig
from graphlily_tpu.apps import BFS, SSSP, PageRank
from graphlily_tpu.io import rmat_csr
cfg = EngineConfig(sort_rows_by_degree=True, mxu_precision="default", engine="router")
g = rmat_csr(4096, 80000, seed=5)
bfs = BFS(cfg); bfs.load_and_format_matrix(g)
assert bfs.SpMSpV_._pallas is bfs.SpMV_._pallas, "BFS not sharing"
d = bfs.pull_push(7, 6, threshold=0.01)
ref = bfs.compute_reference_results(7, 6)
assert np.allclose(d, ref, atol=1e-3), "BFS mismatch"
print("BFS ok, visited", int((np.asarray(d) > 0).sum()))
ss = SSSP(cfg); ss.load_and_format_matrix(g)
assert ss.SpMSpV_._pallas is ss.SpMV_._pallas, "SSSP not sharing"
d = ss.pull_push(7, 6, threshold=0.01)
ref = ss.compute_reference_results(7, 6)
assert np.allclose(d, ref, atol=1e-3), "SSSP mismatch"
print("SSSP ok, reached", int(np.isfinite(np.asarray(d)).sum()))
pr = PageRank(cfg); pr.load_and_format_matrix(g, damping=0.9)
got = pr.pull(0.9, 10)
want = pr.compute_reference_results(0.9, 10)
err = np.max(np.abs(np.asarray(got) - want))
assert err < 1e-3, f"PageRank err {err}"
print("PageRank ok, maxerr", float(err))
print("VERIFY_PASS")
