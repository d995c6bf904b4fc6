#!/usr/bin/env python
"""Can Mosaic lower a vectorized VMEM table gather on this TPU (v5e)?

Tries several formulations of out[y, x] = table[idx[y, x]]:
  A. jnp.take(table_1d, idx)                (lax.gather 1-D)
  B. table_2d[idx // 128, idx % 128] via take_along_axis along sublanes
  C. jnp.take_along_axis(table_row, idx, axis=-1) within 128-entry rows
Each is wrapped in a minimal pallas_call; failures print the Mosaic error.
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
E = 24576  # table entries (6 faces * 64 * 64)


def run(name, kernel, table_shape, idx_max, extra=None):
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.standard_normal(table_shape), jnp.float32)
    idx = jnp.asarray(rng.integers(0, idx_max, (H, W)), jnp.int32)
    try:
        fn = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((H, W), jnp.float32),
            grid=(H // 8,),
            in_specs=[
                pl.BlockSpec(table_shape, lambda i: tuple(0 for _ in table_shape),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((8, W), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
        )
        jfn = jax.jit(fn)
        out = np.asarray(jfn(table, idx))
        ref = np.asarray(table).reshape(-1)[np.asarray(idx)]
        ok = np.allclose(out, ref)
        # quick timing: 64 reps in scan
        @jax.jit
        def loop(t, ix):
            def body(c, k):
                o = fn(t, ix + (k >> 30))
                return c + jnp.sum(o), None
            c, _ = jax.lax.scan(body, jnp.float32(0),
                                jnp.arange(64, dtype=jnp.int32))
            return c
        np.asarray(loop(table, idx))
        t0 = time.perf_counter()
        np.asarray(loop(table, idx))
        dt = (time.perf_counter() - t0) / 64
        print(f"{name}: OK correct={ok}  {dt*1e6:.1f} us")
    except Exception as e:
        msg = str(e).split("\n")[0][:200]
        print(f"{name}: FAIL {type(e).__name__}: {msg}")


# A: 1-D table, jnp.take
def kA(table_ref, idx_ref, out_ref):
    out_ref[:] = jnp.take(table_ref[:], idx_ref[:], axis=0)


run("A take(table[E], idx)", kA, (E,), E)


# B: 2-D table [E//128, 128]: row = idx>>7 (sublane gather), col = idx&127
def kB(table_ref, idx_ref, out_ref):
    idx = idx_ref[:]
    tab = table_ref[:]  # [E//128, 128]
    rows = jnp.take(tab, idx >> 7, axis=0)  # [8, 512, 128]?? per-element row
    cols = idx & 127
    out_ref[:] = jnp.take_along_axis(rows, cols[..., None], axis=-1)[..., 0]


run("B row-take + col take_along_axis", kB, (E // 128, 128), E)


# C: small table within one 128-lane row
def kC(table_ref, idx_ref, out_ref):
    tab = table_ref[:]  # [1, 128]
    idx = idx_ref[:]
    out_ref[:] = jnp.take_along_axis(
        jnp.broadcast_to(tab, idx.shape[:1] + (128,)), idx, axis=-1)


run("C take_along_axis 128-entry row", kC, (1, 128), 128)


# D: dynamic_gather via take_along_axis along sublanes (axis 0 of [E/128,128])
def kD(table_ref, idx_ref, out_ref):
    tab = table_ref[:]  # [8, 128] -- one vreg table
    idx = idx_ref[:] & 7
    out = jnp.take_along_axis(jnp.broadcast_to(tab[None], (8,) + tab.shape),
                              idx[:, :128, None] % 8, axis=1)
    out_ref[:] = jnp.broadcast_to(out[..., 0], (8, W))


run("D sublane gather vreg table", kD, (8, 128), 8)
