"""Test configuration: run everything on a virtual 8-device CPU mesh.

The TPU test strategy mirrors the reference's sw_emu flow (SURVEY.md section 4):
the same kernels run on the CPU backend (pallas interpret mode), so tests are
fast and deterministic; real-TPU execution is exercised by bench.py.
"""
import os

# Must be set before jax import. Force-override: the environment pre-sets
# JAX_PLATFORMS=axon (the tunneled TPU), which would route every test op
# through the ~26ms/call remote tunnel.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np
import pytest

# The sandbox's sitecustomize registers the axon TPU backend at interpreter
# start and overrides jax_platforms; override it back after import.
import jax

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", jax.devices()
assert len(jax.devices()) == 8, "expected 8 virtual CPU devices for mesh tests"


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(12345)


@pytest.fixture(scope="module", autouse=True)
def _clear_jax_caches_between_modules():
    """XLA:CPU's LLVM JIT segfaults after accumulating many large compiled
    programs in one process (observed: test_router + test_planar then the
    SSSP fused-loop compile in test_tropical dies in backend_compile; each
    file passes in isolation). Dropping compiled programs between modules
    keeps the process under the crash threshold."""
    yield
    import jax
    jax.clear_caches()
