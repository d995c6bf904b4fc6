"""Premise check for the plane-shifted single-sort queue build (round 5).

The moving-camera queue rebuild sorts T*m_y*m_x pair keys (~1 ms at
killeroo's 132k). Every enumeration plane (dy, dx) maps a triangle to
tile base_tile + (dy*ntx + dx) — a constant shift — so ONE sort of T keys
by (base_tile, span_class, tri) can replace it, with every tile's segment
reassembled from contiguous runs of the single sorted array.

This measures the raw XLA sort cost at both sizes on the live chip.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np


def bench(fn, *args, iters=512):
    f = jax.jit(fn)
    np.asarray(f(*args))
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        for _ in range(iters):
            pass
        # chain iters sorts in one dispatch to amortize tunnel RTT
    # use a scan-based chain instead
    @jax.jit
    def chained(x):
        def body(c, _):
            c = fn(c)
            return c, ()
        out, _ = jax.lax.scan(body, x, None, length=iters)
        return jnp.sum(out, dtype=jnp.int32) if out.dtype == jnp.int32 \
            else jnp.sum(out)
    np.asarray(chained(*args))
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(chained(*args))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    rng = np.random.default_rng(0)
    for n in (33 * 1024, 45 * 1024, 132 * 1024, 180 * 1024):
        keys = jnp.asarray(rng.integers(0, 1 << 24, n).astype(np.int32))

        def srt(x):
            # re-randomize cheaply so the chain can't fold: xor with a
            # rotation of itself keeps it data-dependent
            return jnp.sort(x ^ jnp.roll(x, 1))

        t = bench(srt, keys)
        print(f"sort  n={n:>7}: {t * 1e6:8.1f} us")

    # cumsum [T, 128] i32 along T (the counting-sort rank alternative)
    for T in (33 * 1024, 45 * 1024):
        a = jnp.asarray(rng.integers(0, 2, (T, 128)).astype(np.int32))

        def cs(x):
            return (jnp.cumsum(x, axis=0) ^ 1)

        t = bench(cs, a, iters=128)
        print(f"cumsum [T={T},128]: {t * 1e6:8.1f} us")

    # searchsorted: 513 queries over 33k sorted keys (bounds computation)
    sk = jnp.sort(jnp.asarray(rng.integers(0, 1 << 24, 33 * 1024)
                              .astype(np.int32)))
    q = jnp.asarray((np.arange(513) * 64).astype(np.int32))

    def ss(x):
        return jnp.searchsorted(sk, q + x[0]).astype(np.int32)

    t = bench(ss, q, iters=512)
    print(f"searchsorted 513q/33k: {t * 1e6:8.1f} us")


if __name__ == "__main__":
    main()
