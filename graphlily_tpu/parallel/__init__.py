from .mesh import make_mesh
from .dist_spmv import DistSpMV, ShardedSpMVLayout, pack_sharded
