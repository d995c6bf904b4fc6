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
    enable_cpu_compile_cache()


def probe_backend(timeout_s: int = 180) -> str | None:
    """Backend liveness probe in a subprocess with a hard timeout.

    The axon (remote-TPU tunnel) backend HANGS indefinitely inside device
    initialization when the tunnel relay is down (observed: the relay
    process dies and every tunnel port refuses connections; a bare
    ``jax.devices()`` then never returns). A hung entry point is worse
    than a failed one — probe first, fail loudly and fast. Returns the
    default backend name, or None when init hung/failed.

    The probe re-pins platforms from the env inside the subprocess: the
    host's sitecustomize force-sets jax_platforms="axon,cpu" at
    interpreter start, so a plain env var would still probe (and hang
    on) the dead tunnel even when the caller asked for CPU.
    """
    import subprocess
    import sys

    code = ("import os, jax\n"
            "p = os.environ.get('JAX_PLATFORMS')\n"
            "if p: jax.config.update('jax_platforms', p)\n"
            "print(jax.default_backend())")
    try:
        out = subprocess.run(
            [sys.executable, "-c", code],
            timeout=timeout_s, capture_output=True, text=True)
        backend = (out.stdout.strip().splitlines()[-1]
                   if out.stdout.strip() else None)
        return backend if out.returncode == 0 else None
    except subprocess.TimeoutExpired:
        return None


def require_live_backend(timeout_s: int = 180) -> str:
    """Probe the backend and exit with a clear message if it is hung.

    Only probes when the resolved platform list could reach the remote
    TPU (i.e. the user did NOT pin JAX_PLATFORMS=cpu) — an explicit CPU
    pin cannot hang, and skipping the probe keeps CPU startup instant.
    """
    import jax

    p = (os.environ.get("JAX_PLATFORMS", "")
         or (jax.config.jax_platforms or ""))
    plats = p.strip().lower()
    if plats == "cpu":
        return "cpu"
    if not plats or set(plats.split(",")) <= {"cpu", "gpu", "cuda", "tpu"}:
        # No exotic platform plugin configured — local backend init
        # cannot hang on a dead tunnel, so skip the subprocess probe
        # (it costs a full jax import on every CLI launch).
        return plats or "default"
    backend = probe_backend(timeout_s)
    if backend is None:
        raise SystemExit(
            "jax backend initialization hung or failed (remote-TPU tunnel "
            "down?). Re-run with JAX_PLATFORMS=cpu for CPU execution, or "
            "restore the TPU tunnel.")
    return backend


def cpu_cache_dir() -> str:
    """Persistent XLA:CPU cache dir keyed by the host's CPU feature set.

    XLA:CPU AOT artifacts embed machine features; loading a cache
    populated on different hardware warns and can change fp codegen
    (observed after a terminal re-provision). Same keying as
    tests/conftest.py.
    """
    import hashlib
    import platform as _plat

    try:
        with open("/proc/cpuinfo") as f:
            flags = "".join(line for line in f if line.startswith("flags"))
    except OSError:
        flags = ""
    key = hashlib.sha1((_plat.machine() + flags).encode()).hexdigest()[:10]
    return os.path.expanduser(f"~/.cache/rustexp_tpu_xla_cache_{key}")


def enable_cpu_compile_cache() -> None:
    """Turn on the persistent compilation cache — explicit-CPU runs ONLY.

    On CPU the cache is safe and makes warm entry-point runs ~10x faster
    (the CLI's scan compiles dominate a 1-core host). It must stay OFF
    for the axon remote-TPU platform: cache WRITES succeed there but the
    first cache HIT hangs the process indefinitely (see bench.py). The
    platform is decided from config/env alone — calling
    jax.default_backend() here would INITIALIZE backends, and on a host
    whose remote-TPU tunnel is down that init hangs before the entry
    point ever reaches its own compute.
    """
    import jax

    plats = jax.config.jax_platforms or os.environ.get("JAX_PLATFORMS", "")
    if plats.strip().lower() != "cpu":
        return
    jax.config.update("jax_compilation_cache_dir", cpu_cache_dir())
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
