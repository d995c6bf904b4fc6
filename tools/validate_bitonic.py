"""Validate + bench the Pallas bitonic Morton sort on real hardware.

Run on the TPU once per hardware generation before flipping
ops/nbody_bh.USE_BITONIC_SORT:

    python tools/validate_bitonic.py

Measures (N=131,072, the BH north-star config):
  1. old path: jnp.argsort(code) + 5 permutation gathers;
  2. new path: sort_bitonic.sort_kv carrying the 5 payloads;
  3. bit-equality of the two (stable-order contract);
  4. end-to-end step_bh steps/s with the flag off vs on.

Timing forces a device->host copy per sample (np.asarray) — see
.claude/skills/verify: block_until_ready is a no-op through the tunnel.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from rustexp_tpu.ops import nbody_bh
from rustexp_tpu.ops.sort_bitonic import sort_kv
from rustexp_tpu.sims.nbody import stable_orbits


def timeit(fn, *a, iters=30):
    out = fn(*a)
    jax.tree.map(np.asarray, out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*a)
    jax.tree.map(np.asarray, out)
    return (time.perf_counter() - t0) / iters


def main():
    print("backend:", jax.default_backend(), flush=True)
    n = 131072
    px, py, vx, vy, m = stable_orbits(jax.random.PRNGKey(0), n)

    old = jax.jit(lambda *a: nbody_bh.morton_sort(*a, use_bitonic=False))
    new = jax.jit(lambda *a: nbody_bh.morton_sort(*a, use_bitonic=True))
    t_old = timeit(old, px, py, m, vx, vy)
    print(f"argsort + 5 gathers: {t_old * 1e3:.2f} ms", flush=True)
    t_new = timeit(new, px, py, m, vx, vy)
    print(f"bitonic carry:       {t_new * 1e3:.2f} ms "
          f"({t_old / t_new:.2f}x)", flush=True)

    for x, y in zip(old(px, py, m, vx, vy), new(px, py, m, vx, vy)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    print("bit-exact vs stable argsort", flush=True)

    for flag in (False, True):
        nbody_bh.USE_BITONIC_SORT = flag
        step = jax.jit(lambda *a: nbody_bh.step_bh(*a, 256, 27, 0.01))
        t = timeit(step, px, py, vx, vy, m, iters=40)
        print(f"step_bh bitonic={flag}: {t * 1e3:.2f} ms "
              f"({1.0 / t:.0f} steps/s)", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
