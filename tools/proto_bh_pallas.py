"""PROTOTYPE (measured dead end — see docs/ROADMAP.md): fused Pallas BH.

Block Barnes-Hut forces as ONE Pallas kernel (near + far field).
MEASURED SLOWER than the XLA composition it replaces (N=131k, K=27,
whole step: XLA 11.40 ms / this kernel 14.61 ms exact, 13.05 ms approx
reciprocal; 1-source-per-grid-step variant 15.23 ms). Root cause: the
near field's [256, 256] tiles and [256, 1] column DMAs leave the kernel
revisit/DMA-overhead bound, while the XLA gather+reduce composition
already runs at ~80% of the f32 pair roofline — so even the VPU's
approximate reciprocal (a 2x lever on the brute kernel's [1024, 1024]
tiles) cannot pay for the lost tile width. Kept as a lab notebook with
its parity harness (it matches forces_bh_sorted to ~1e-7 interpreted,
~1e-5 on TPU); import from tools/, not from the package.

Original design notes:

Same math as ops/nbody_bh.forces_bh_sorted (reference force law
nbody.rs:164-184; block decomposition documented in ops/nbody_bh.py),
fused into a single VPU-resident kernel:

  * grid = (B target blocks, ceil(K/8) near steps + 1 far step). Each
    near step gathers EIGHT source blocks by prefetch-indexed BlockSpecs
    (near-set indices live in SMEM and steer the DMAs per grid step —
    the flat-queue raster pattern) and reduces each exactly into the
    revisited [1, block] output; one grid step per source block was
    measured GRID-OVERHEAD BOUND (14,336 steps -> 11 ms kernel), eight
    per step cuts the step count 7x. The K slots are padded to a
    multiple of 8 with index -1; padded slots gather block 0 and are
    zeroed by an SMEM-scalar weight — ~3 wasted block-pairs of flops,
    no double counting.
  * the last grid step adds every far block's monopole in one
    [B, block] sweep, masking the K near COMs via iota-vs-SMEM compares
    (self is always near: near_block_indices pins the diagonal).
  * sources are COLUMN vectors [N, 1] / targets ROW vectors [1, N]
    (the nbody_pallas layout): pairwise tiles broadcast with no
    relayout, and the self-pair is exactly zero (dx == 0).
  * `approx_recip=True` (default) uses the VPU's reciprocal
    approximation for 1/(d^2+EPS) — the same speed-of-light trade the
    brute-force kernel documents (nbody_pallas.py): ~2.4e-4 relative
    per pair, invisible under the 0.63% p90 monopole truncation error
    (measured: p50/p90/p99 vs oracle brute unchanged to 3 digits).

Numerics: identical operations, different reduction order than the XLA
form, so parity vs forces_bh_sorted is allclose-tight (~1e-5 with
approx_recip=False).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rustexp_tpu.ops.nbody_forces import EPS
from rustexp_tpu.ops.nbody_bh import near_block_indices

SRC_PER_STEP = 8


def _kernel(idx_ref, *refs, k_pad: int, n_blocks: int, approx_recip: bool):
    (xs_refs, ys_refs, ms_refs) = (refs[0:SRC_PER_STEP],
                                   refs[SRC_PER_STEP:2 * SRC_PER_STEP],
                                   refs[2 * SRC_PER_STEP:3 * SRC_PER_STEP])
    xt_ref, yt_ref, cx_ref, cy_ref, cm_ref, fx_ref, fy_ref = refs[3 * SRC_PER_STEP:]
    t = pl.program_id(0)
    j = pl.program_id(1)
    near_steps = k_pad // SRC_PER_STEP

    @pl.when(j == 0)
    def _init():
        fx_ref[:] = jnp.zeros_like(fx_ref)
        fy_ref[:] = jnp.zeros_like(fy_ref)

    xt = xt_ref[:]                          # [1, block] target rows
    yt = yt_ref[:]

    @pl.when(j < near_steps)
    def _near():
        fx = jnp.zeros_like(fx_ref[:])
        fy = jnp.zeros_like(fy_ref[:])
        for kk in range(SRC_PER_STEP):
            # Padded slots carry index -1: weight their block to zero.
            w = (idx_ref[t, j * SRC_PER_STEP + kk] >= 0).astype(jnp.float32)
            dx = xs_refs[kk][:] - xt        # [block, block]
            dy = ys_refs[kk][:] - yt
            d2 = dx * dx + dy * dy + EPS
            rm = pl.reciprocal(d2, approx=approx_recip) * (ms_refs[kk][:] * w)
            fx += jnp.sum(rm * dx, axis=0, keepdims=True)
            fy += jnp.sum(rm * dy, axis=0, keepdims=True)
        fx_ref[:] += fx
        fy_ref[:] += fy

    @pl.when(j == near_steps)
    def _far():
        # Monopoles of ALL blocks, minus the K near ones (self included).
        dx = cx_ref[:] - xt                 # [B, block]
        dy = cy_ref[:] - yt
        d2 = dx * dx + dy * dy + EPS
        rm = pl.reciprocal(d2, approx=approx_recip) * cm_ref[:]
        comi = lax.broadcasted_iota(jnp.int32, (n_blocks, 1), 0)
        mask = jnp.zeros((n_blocks, 1), dtype=jnp.bool_)
        for kk in range(k_pad):             # SMEM scalar reads, unrolled
            mask = mask | (comi == idx_ref[t, kk])
        rm = jnp.where(mask, 0.0, rm)
        fx_ref[:] += jnp.sum(rm * dx, axis=0, keepdims=True)
        fy_ref[:] += jnp.sum(rm * dy, axis=0, keepdims=True)


@partial(jax.jit, static_argnums=(3, 4, 5, 6))
def forces_bh_pallas(px, py, m, block: int, k_near: int,
                     approx_recip: bool = True,
                     interpret: bool | None = None):
    """Forces for MORTON-SORTED particles — drop-in for
    nbody_bh.forces_bh_sorted, one fused kernel. Returns (fx, fy) with
    the reference's m1*m2 convention."""
    n = px.shape[0]
    B = n // block
    assert n % block == 0 and 1 < k_near <= B
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    xb = px.reshape(B, block)
    yb = py.reshape(B, block)
    mb = m.reshape(B, block)
    msum = jnp.sum(mb, axis=1)
    inv = 1.0 / jnp.maximum(msum, 1e-30)
    cx = jnp.sum(xb * mb, axis=1) * inv
    cy = jnp.sum(yb * mb, axis=1) * inv
    idx = near_block_indices(xb.min(1), xb.max(1), yb.min(1), yb.max(1),
                             k_near).astype(jnp.int32)       # [B, K]
    k_pad = -(-k_near // SRC_PER_STEP) * SRC_PER_STEP
    idx_pad = jnp.full((B, k_pad), -1, jnp.int32).at[:, :k_near].set(idx)

    def src_map(kk):
        def f(t, j, idx_ref):
            # Padded / out-of-phase slots steer to block 0 (masked off).
            return jnp.maximum(
                idx_ref[t, jnp.minimum(j * SRC_PER_STEP + kk, k_pad - 1)],
                0), 0
        return f

    cols = [pl.BlockSpec((block, 1), src_map(kk))
            for kk in range(SRC_PER_STEP)]
    row = pl.BlockSpec((1, block), lambda t, j, i: (0, t))
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    fx, fy = pl.pallas_call(
        partial(_kernel, k_pad=k_pad, n_blocks=B,
                approx_recip=approx_recip),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, k_pad // SRC_PER_STEP + 1),
            in_specs=cols * 3 + [row, row, full, full, full],
            out_specs=[row, row],
        ),
        out_shape=[jax.ShapeDtypeStruct((1, n), jnp.float32)] * 2,
        interpret=interpret,
    )(idx_pad,
      *([px.reshape(n, 1)] * SRC_PER_STEP),
      *([py.reshape(n, 1)] * SRC_PER_STEP),
      *([m.reshape(n, 1)] * SRC_PER_STEP),
      px.reshape(1, n), py.reshape(1, n),
      cx.reshape(B, 1), cy.reshape(B, 1), msum.reshape(B, 1))

    return fx.reshape(n) * m, fy.reshape(n) * m


@partial(jax.jit, static_argnums=(5, 6, 8, 9))
def step_bh_pallas(px, py, vx, vy, m, block: int, k_near: int, dt=0.01,
                   approx_recip: bool = True,
                   interpret: bool | None = None):
    """One Euler step over the fused kernel — same contract as
    nbody_bh.step_bh (Morton-ordered return, runaway kill)."""
    from rustexp_tpu.ops.nbody_bh import morton_sort
    from rustexp_tpu.ops.nbody_forces import kill_runaway

    px, py, m, vx, vy = morton_sort(px, py, m, vx, vy)
    fx, fy = forces_bh_pallas(px, py, m, block, k_near,
                              approx_recip=approx_recip,
                              interpret=interpret)
    vx = vx + dt * fx / m
    vy = vy + dt * fy / m
    px = px + dt * vx
    py = py + dt * vy
    vx, vy = kill_runaway(px, py, vx, vy)
    return px, py, vx, vy, m
