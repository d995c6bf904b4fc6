#!/usr/bin/env python
"""Micro-costs of the banked gather: dynamic bank load vs static unroll,
raw lane-gather throughput, masked accumulate cost."""

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


def mk(kern, bh, bw, nbanks=BANKS):
    return pl.pallas_call(
        functools.partial(kern, bh=bh, bw=bw),
        out_shape=jax.ShapeDtypeStruct((H, W), jnp.float32),
        grid=(H // bh, W // bw),
        in_specs=[
            pl.BlockSpec((nbanks, 128), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bh, bw), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bh, bw), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
    )


def timeit(name, fn, *args):
    try:
        out = np.asarray(jax.jit(fn)(*args))

        @jax.jit
        def loop(a):
            def body(c, k):
                o = fn(*jax.tree_util.tree_map(
                    lambda x: x + (k >> 30).astype(x.dtype), list(a)))
                return c + jnp.sum(o.astype(jnp.float32)), None
            c, _ = jax.lax.scan(body, jnp.float32(0),
                                jnp.arange(64, dtype=jnp.int32))
            return c

        np.asarray(loop(args))
        t0 = time.perf_counter()
        np.asarray(loop(args))
        dt = (time.perf_counter() - t0) / 64
        print(f"{name:<56} {dt*1e6:8.1f} us", flush=True)
        return out
    except Exception as e:
        msg = str(e).split("\n")[0][:160]
        print(f"{name:<56} FAIL {type(e).__name__}: {msg}", flush=True)


rng = np.random.default_rng(0)
table = jnp.asarray(rng.standard_normal(E), jnp.float32)
tab2 = table.reshape(BANKS, 128)
idx_np = rng.integers(0, E, (H, W)).astype(np.int32)
idx = jnp.asarray(idx_np)
np.asarray(jnp.zeros(8))


# 1. raw gather throughput: same bank every iteration, no mask
def k_raw(tab_ref, idx_ref, out_ref, *, bh, bw):
    lo = idx_ref[:] & 127
    rowq = jnp.broadcast_to(tab_ref[0].reshape(1, 128), (bh, bw))
    acc = jnp.zeros((bh, bw), jnp.float32)

    def body(b, acc):
        return acc + jnp.take_along_axis(rowq, lo, axis=-1)

    out_ref[:] = jax.lax.fori_loop(0, BANKS, body, acc)


timeit("raw take_along_axis x192, fixed bank, 64x128", mk(k_raw, 64, 128),
       tab2, idx)


# 2. + mask/select, still fixed bank
def k_mask(tab_ref, idx_ref, out_ref, *, bh, bw):
    idxv = idx_ref[:]
    hi = idxv >> 7
    lo = idxv & 127
    rowq = jnp.broadcast_to(tab_ref[0].reshape(1, 128), (bh, bw))
    acc = jnp.zeros((bh, bw), jnp.float32)

    def body(b, acc):
        g = jnp.take_along_axis(rowq, lo, axis=-1)
        return acc + jnp.where(hi == b, g, 0.0)

    out_ref[:] = jax.lax.fori_loop(0, BANKS, body, acc)


timeit("+ mask select x192, fixed bank, 64x128", mk(k_mask, 64, 128),
       tab2, idx)


# 3. dynamic bank load each iteration (the full thing)
def k_dyn(tab_ref, idx_ref, out_ref, *, bh, bw):
    idxv = idx_ref[:]
    hi = idxv >> 7
    lo = idxv & 127
    acc = jnp.zeros((bh, bw), jnp.float32)

    def body(b, acc):
        rowq = jnp.broadcast_to(tab_ref[b].reshape(1, 128), (bh, bw))
        g = jnp.take_along_axis(rowq, lo, axis=-1)
        return acc + jnp.where(hi == b, g, 0.0)

    out_ref[:] = jax.lax.fori_loop(0, BANKS, body, acc)


timeit("+ dynamic bank load x192, 64x128", mk(k_dyn, 64, 128), tab2, idx)


# 4. static unroll of all 192 banks
def k_static(tab_ref, idx_ref, out_ref, *, bh, bw):
    idxv = idx_ref[:]
    hi = idxv >> 7
    lo = idxv & 127
    acc = jnp.zeros((bh, bw), jnp.float32)
    for b in range(BANKS):
        rowq = jnp.broadcast_to(tab_ref[b].reshape(1, 128), (bh, bw))
        g = jnp.take_along_axis(rowq, lo, axis=-1)
        acc = acc + jnp.where(hi == b, g, 0.0)
    out_ref[:] = acc


timeit("static unroll 192 banks, 64x128", mk(k_static, 64, 128), tab2, idx)


# 5. sublane-gather form: table vreg [8,128], gather along sublanes
def k_sub(tab_ref, idx_ref, out_ref, *, bh, bw):
    idxv = idx_ref[:]
    hi = (idxv >> 10) % 24        # which vreg-group of 1024
    sub = (idxv >> 7) & 7         # sublane within group
    lo = idxv & 127
    acc = jnp.zeros((bh, bw), jnp.float32)
    for g8 in range(BANKS // 8):
        blk = tab_ref[g8 * 8:(g8 + 1) * 8]  # [8,128] one vreg
        # lane-gather each of 8 sublanes? costs 8 gathers - no. Instead:
        # sublane-gather: rows[i,j] = blk[sub[i,j], j] needs idx shape==operand
        # shape; bh=8 blocks only.
        rows = jnp.take_along_axis(blk, sub[:8, :128], axis=0)
        g = jnp.take_along_axis(rows, lo[:8, :128], axis=-1)
        acc = acc.at[:8, :128].add(jnp.where(hi[:8, :128] == g8, g, 0.0))
    out_ref[:] = acc


# only checks compile/speed shape, correctness approximate (8x128 region)
timeit("sublane+lane compose per 1024-group, 8x128", mk(k_sub, 8, 128),
       tab2, idx)
