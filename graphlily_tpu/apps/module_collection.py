"""App base: module registry.

Counterpart of graphlily/app/module_collection.h — the reference programs one
xclbin and fans out per-module queues/kernels; here modules are self-contained,
so the collection is a registry plus shared config.
"""
from __future__ import annotations

from ..config import EngineConfig, DEFAULT_CONFIG


class ModuleCollection:
    def __init__(self, config: EngineConfig = DEFAULT_CONFIG):
        self.config = config
        self.modules_ = []

    def add_module(self, module) -> None:
        self.modules_.append(module)

    # API-parity no-ops (xclbin program / queue setup in the reference,
    # app/module_collection.h:69-114):
    def set_up_runtime(self, *_a, **_k) -> None:
        return None
