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

import pytest  # noqa: E402

REFERENCE = "/root/reference"


@pytest.fixture(scope="session")
def reference_root():
    if not os.path.isdir(REFERENCE):
        pytest.skip("reference repo not available")
    return REFERENCE
