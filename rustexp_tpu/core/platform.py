"""Backend/platform selection helpers shared by the entry points."""

from __future__ import annotations

import os


def honor_jax_platforms_env() -> None:
    """Re-apply JAX_PLATFORMS after jax import, past any sitecustomize pin.

    Some hosts force-set ``jax.config.jax_platforms`` at interpreter start
    (observed: a sitecustomize pinning "axon,cpu"), which silently
    overrides the JAX_PLATFORMS environment variable — a user asking for
    CPU lands on the remote TPU, or hangs when its tunnel is down. Every
    user-facing entry point (cli, viewer, bench) calls this right after
    argument parsing; tests do the equivalent in tests/conftest.py.
    """
    p = os.environ.get("JAX_PLATFORMS")
    if p:
        import jax

        jax.config.update("jax_platforms", p)
