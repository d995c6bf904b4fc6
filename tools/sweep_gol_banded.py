"""Sweep band/k for the banded SWAR GoL kernel on real hardware.

The banded path (ops/gol_bits.multi_step_swar_banded) pays 2h/band
redundant halo compute per band (h = ceil(k/32)*32 whole-word rows, and
the packed block's word-rows round up to 8 sublanes); larger bands
shrink the fraction but grow the per-band VMEM block (x ~8 adder
copies). This sweep measures us/gen for each feasible (n, band, k);
gol_bits.pick_plan's cost model was fit to its output. Compile failures
(VMEM overflow) are caught and reported as such.

Run on the TPU: python tools/sweep_gol_banded.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from rustexp_tpu.ops import gol_bits


def bench(n: int, band: int, k: int, runs: int = 3, total_gens: int = 16384):
    """us/gen with the ~25 ms tunnel RTT amortized: chain D banded
    dispatches inside ONE jit (the banded path caps k at the band size,
    so a single dispatch can't amortize the RTT the way the
    whole-grid SWAR path's k=65536 does)."""
    rng = np.random.default_rng(0)
    grid = jnp.asarray(rng.integers(0, 2, (n, n)).astype(np.int32))
    d = max(1, total_gens // k)

    @jax.jit
    def run(g):
        g = jax.lax.fori_loop(
            0, d, lambda _, x: gol_bits.multi_step_swar_banded(x, k,
                                                               band=band), g)
        return jnp.sum(g, dtype=jnp.int32)

    np.asarray(run(grid))  # compile + warm
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        np.asarray(run(grid))
        best = min(best, (time.perf_counter() - t0) / (k * d))
    return best


def main():
    print(f"backend: {jax.default_backend()}")
    for n in (4096, 8192):
        for band in (512, 1024, 2048):
            if n % band:
                continue
            for k in (64, 128, 256):
                # whole-word halos + sublane padding, matching gol_bits
                h = -(-k // 32) * 32
                if h > band:
                    continue
                words = gol_bits._pad8(band // 32 + 2 * (h // 32)) * n
                blk_mb = words * 4 / 2**20
                try:
                    us = bench(n, band, k) * 1e6
                except Exception as e:  # VMEM overflow at compile
                    print(f"n={n} band={band:5d} k={k:4d} h={h:4d} "
                          f"blk={blk_mb:5.2f}MB  FAIL {type(e).__name__}: "
                          f"{str(e)[:80]}")
                    continue
                rate = n * n / (us * 1e-6)
                print(f"n={n} band={band:5d} k={k:4d} h={h:4d} "
                      f"blk={blk_mb:5.2f}MB  {us:8.2f} us/gen  "
                      f"{rate:.3g} cells/s  halo={2*h/band:.0%}")


if __name__ == "__main__":
    main()
