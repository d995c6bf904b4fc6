"""Test configuration: run everything on CPU with 8 virtual devices.

Multi-device semantics without a real multi-chip TPU: JAX's forced host
platform device count gives us 8 CPU devices, so Mesh/shard_map code paths
compile and execute with the same SPMD semantics they'd have over ICI.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

# The suite is XLA-compile dominated (e.g. the pairs-binning parity test is
# ~98 s of compile for <1 s of compute). A persistent compilation cache
# makes warm runs ~10x faster; the cache key includes the HLO, so stale
# hits are impossible.
import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/rustexp_tpu_xla_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)

import pytest  # noqa: E402

REFERENCE = "/root/reference"


@pytest.fixture(scope="session")
def reference_root():
    if not os.path.isdir(REFERENCE):
        pytest.skip("reference repo not available")
    return REFERENCE
