from .module_collection import ModuleCollection
from .bfs import BFS
from .sssp import SSSP
from .pagerank import PageRank
