#!/usr/bin/env python
"""Prototype: banked in-register cubemap gather for the deferred shade kernel.

out[y, x] = table[idx[y, x]] for a 24576-entry f32 table via Mosaic
tpu.dynamic_gather: the table is pre-banked as [192, 128]; each 128-entry
bank is broadcast to the pixel block and looked up with a lane gather
(jnp.take_along_axis axis=-1), accumulated under an equality mask. A
dynamic fori_loop over [hi_min, hi_max] skips banks no pixel in the block
references (spatially coherent indices -> few banks per block).
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H, W = 512, 512
E = 24576
BANKS = E // 128


def kernel(tab_ref, idx_ref, out_ref, *, bh, bw, rng_skip):
    idx = idx_ref[:]
    hi = idx >> 7
    lo = idx & 127
    acc = jnp.zeros((bh, bw), jnp.float32)

    def body(b, acc):
        rowq = jnp.broadcast_to(tab_ref[b].reshape(1, 128), (bh, bw))
        g = jnp.take_along_axis(rowq, lo, axis=-1)
        return acc + jnp.where(hi == b, g, 0.0)

    if rng_skip:
        acc = jax.lax.fori_loop(jnp.min(hi), jnp.max(hi) + 1, body, acc)
    else:
        acc = jax.lax.fori_loop(0, BANKS, body, acc)
    out_ref[:] = acc


def run(name, bh, bw, coherent, rng_skip):
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.standard_normal(E), jnp.float32)
    if coherent:
        base = np.linspace(0, E - 1, H)[:, None]
        jit_ = rng.integers(-200, 200, (H, W))
        idx_np = np.clip(base + jit_, 0, E - 1).astype(np.int32)
    else:
        idx_np = rng.integers(0, E, (H, W)).astype(np.int32)
    idx = jnp.asarray(idx_np)
    tab2 = table.reshape(BANKS, 128)

    try:
        fn = pl.pallas_call(
            functools.partial(kernel, bh=bh, bw=bw, rng_skip=rng_skip),
            out_shape=jax.ShapeDtypeStruct((H, W), jnp.float32),
            grid=(H // bh, W // bw),
            in_specs=[
                pl.BlockSpec((BANKS, 128), lambda i, j: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bh, bw), lambda i, j: (i, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((bh, bw), lambda i, j: (i, j),
                                   memory_space=pltpu.VMEM),
        )
        out = np.asarray(jax.jit(fn)(tab2, idx))
        ref = np.asarray(table)[idx_np]
        ok = np.allclose(out, ref)

        @jax.jit
        def loop(t, ix):
            def body(c, k):
                o = fn(t, ix + (k >> 30))
                return c + jnp.sum(o), None
            c, _ = jax.lax.scan(body, jnp.float32(0),
                                jnp.arange(64, dtype=jnp.int32))
            return c

        np.asarray(loop(tab2, idx))
        t0 = time.perf_counter()
        np.asarray(loop(tab2, idx))
        dt = (time.perf_counter() - t0) / 64
        print(f"{name:<52} correct={ok}  {dt*1e6:8.1f} us", flush=True)
    except Exception as e:
        msg = str(e).split("\n")[0][:180]
        print(f"{name:<52} FAIL {type(e).__name__}: {msg}", flush=True)


np.asarray(jnp.zeros(8))
run("scan-all bh=8 bw=128 random", 8, 128, False, False)
run("scan-all bh=64 bw=128 random", 64, 128, False, False)
run("scan-all bh=64 bw=256 random", 64, 256, False, False)
run("scan-range bh=8 bw=128 coherent", 8, 128, True, True)
run("scan-range bh=64 bw=128 coherent", 64, 128, True, True)
run("scan-range bh=8 bw=128 random", 8, 128, False, True)
