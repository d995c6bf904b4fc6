#!/usr/bin/env python
"""Benchmark entry point — prints ONE JSON line with the headline metric.

Headline: shaded-rasterization throughput in Mpix/s over the reference's
12-scene benchmark suite (rasterizer.rs:1781-1884: 512x512, Fill, shader 5
CMRefl, envmap Grace, tick 0; best-of-N timing). `vs_baseline` is the speedup
of the suite total vs the reference CPU's stored 27,286 us total
(BASELINE.md). Falls back to earlier-milestone metrics while later stages are
still under construction.
"""

from __future__ import annotations

import json
import sys
import time


# NOTE: do NOT enable the persistent XLA compile cache here. Measured on
# the axon (remote-TPU tunnel) platform: cache WRITES succeed but the
# first cache HIT hangs the process indefinitely (deserialization never
# completes), while the same config works on CPU (tests/conftest.py).
# The 12-scene suite therefore pays ~7 min of cold compiles per process.


def _best_seconds(fn, runs=20, warmup=2):
    for _ in range(warmup):
        fn()
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def bench_rasterizer():
    from rustexp_tpu.app.benchmark import run_suite

    return run_suite(runs=20)


def bench_sine():
    import jax
    import jax.numpy as jnp
    from rustexp_tpu.sims.sine import sine_frame

    w = h = 512
    wi = jnp.arange(w, dtype=jnp.float32)
    hi = jnp.arange(h, dtype=jnp.float32)
    best = _best_seconds(lambda: jax.block_until_ready(sine_frame(wi, hi, 0.5)))
    mpix_s = (w * h) / best / 1e6
    return {
        "metric": "sine_fill_Mpix_per_s",
        "value": round(mpix_s, 1),
        "unit": "Mpix/s",
        "vs_baseline": None,
    }


def main():
    # Probe in a subprocess with a hard timeout — the axon backend hangs
    # forever inside device init when the tunnel relay is down. Importing
    # rustexp_tpu here is safe: the package is import-time device-free.
    # The tunnel FLAPS (observed: relay dies and is restarted minutes to
    # hours later), so retry within a bounded window before giving up —
    # a round-end bench that lands in a brief outage should still record
    # real numbers. A live backend answers the first probe in seconds.
    from rustexp_tpu.core.platform import probe_backend

    deadline = time.monotonic() + 600
    backend = probe_backend(timeout_s=150)
    while backend is None and time.monotonic() < deadline:
        print("# backend probe failed; retrying (tunnel flap?)",
              file=sys.stderr)
        time.sleep(60)
        backend = probe_backend(timeout_s=150)
    if backend is None:
        print(json.dumps({
            "metric": "backend_unavailable",
            "value": 0,
            "unit": "error",
            "vs_baseline": None,
            "error": "jax backend init hung/failed (TPU tunnel down?) — "
                     "no measurement taken; see BENCH history for real "
                     "numbers from this tree",
        }))
        sys.exit(1)
    print(f"# backend: {backend}", file=sys.stderr)
    from rustexp_tpu.core.platform import honor_jax_platforms_env

    honor_jax_platforms_env()

    try:
        result = bench_rasterizer()
    except Exception as e:  # raster suite not ready yet — fall back
        print(f"# rasterizer bench unavailable ({type(e).__name__}: {e}), "
              f"falling back to sine fill", file=sys.stderr)
        result = bench_sine()

    # Secondary headline metrics (BASELINE.json north stars), folded into
    # the same JSON line so every round's numbers are driver-recorded.
    from rustexp_tpu.app.benchmark import bench_gol, bench_nbody

    try:
        gol = bench_gol()
        result["gol_cell_updates_per_s"] = gol["value"]
        result["gol_gens_per_s"] = gol["gens_per_s"]
    except Exception as e:
        print(f"# gol bench failed: {type(e).__name__}: {e}", file=sys.stderr)
    try:
        nb = bench_nbody(backend="bh")
        result["nbody_bh_steps_per_s_131k"] = nb["value"]
    except Exception as e:
        print(f"# nbody bh bench failed: {type(e).__name__}: {e}",
              file=sys.stderr)
    try:
        nb = bench_nbody(backend="pallas", steps_per_dispatch=32)
        result["nbody_brute_steps_per_s_131k"] = nb["value"]
    except Exception as e:
        print(f"# nbody brute bench failed: {type(e).__name__}: {e}",
              file=sys.stderr)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
