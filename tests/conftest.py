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

# The env var is NOT sufficient: the terminal's sitecustomize calls
# jax.config.update("jax_platforms", "axon,cpu") at interpreter start,
# which overrides JAX_PLATFORMS=cpu and silently puts "CPU" tests on the
# remote TPU (collapsing the 8-device mesh to 1). Pin the config AFTER
# that runs, and fail loudly if the pin didn't take.
jax.config.update("jax_platforms", "cpu")

# Cache dir keyed by the host's CPU feature set: XLA:CPU AOT artifacts
# embed machine features, and loading a cache populated on a different
# host both warns ("machine type doesn't match") and can change fp
# codegen — observed as 3-pixel diffs in an otherwise bit-exact test
# after the terminal was re-provisioned onto different hardware. The
# keying lives in core.platform (shared with the CLI's explicit-CPU
# cache); importing it is safe — the package is import-time device-free
# (pinned by tests/test_aux.py::test_package_import_initializes_no_backend).
from rustexp_tpu.core.platform import cpu_cache_dir  # noqa: E402

jax.config.update("jax_compilation_cache_dir", cpu_cache_dir())
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)

assert jax.default_backend() == "cpu", (
    f"tests must run on CPU, got {jax.default_backend()}")
assert len(jax.devices()) == 8, (
    f"expected 8 virtual CPU devices, got {len(jax.devices())}")

import pytest  # noqa: E402

REFERENCE = "/root/reference"


@pytest.fixture(scope="session")
def reference_root():
    if not os.path.isdir(REFERENCE):
        pytest.skip("reference repo not available")
    return REFERENCE
