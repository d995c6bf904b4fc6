"""Morton-block tree-code: the production Barnes-Hut substitute.

The reference's Barnes-Hut quadtree (nbody.rs:186-480) adapts to density by
subdividing; the uniform-grid tree-code (nbody_treecode.py) does not, and
collapses on centrally-dense distributions like the stable-orbit scene. This
variant gets density adaptivity the TPU way:

  1. sort particles by Morton (Z-order) code — spatial locality becomes
     array locality, and EQUAL-COUNT blocks of the sorted array are small
     where the distribution is dense (exactly what the quadtree's leaves do);
  2. near-field: exact pair forces against the +-`near` neighboring blocks,
     expressed as block-level array ROLLS (no gathers, no windows to
     overflow);
  3. far-field: monopole (center of mass) forces from every other block —
     one dense [N, B] sweep, with the near window masked out.

Force law and Euler integration match the reference exactly
(nbody.rs:150-184); the approximation error is validated against the
brute-force oracle (the reference's theta==0 fallback pattern,
nbody.rs:197-200). `block`/`near` play theta's accuracy-speed role. The
step returns particles in Morton order — identity is irrelevant to the
physics and the renderer, and it saves the inverse permutation.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .nbody_forces import EPS


def _morton16(ix, iy):
    """Interleave two <=15-bit ints into a (positive) int32 Z-order code."""

    def spread(v):
        v = (v | (v << 8)) & 0x00FF00FF
        v = (v | (v << 4)) & 0x0F0F0F0F
        v = (v | (v << 2)) & 0x33333333
        v = (v | (v << 1)) & 0x55555555
        return v

    return spread(ix) | (spread(iy) << 1)


def morton_sort(px, py, m, vx=None, vy=None, bits: int = 15):
    """Sort the particle set by Z-order code; returns permuted arrays."""
    x1, x2 = jnp.min(px), jnp.max(px)
    y1, y2 = jnp.min(py), jnp.max(py)
    scale = (1 << bits) - 1
    ix = jnp.clip(((px - x1) / jnp.maximum(x2 - x1, 1e-12) * scale), 0, scale)
    iy = jnp.clip(((py - y1) / jnp.maximum(y2 - y1, 1e-12) * scale), 0, scale)
    code = _morton16(ix.astype(jnp.int32), iy.astype(jnp.int32))
    order = jnp.argsort(code)
    out = [px[order], py[order], m[order]]
    if vx is not None:
        out += [vx[order], vy[order]]
    return out


@partial(jax.jit, static_argnums=(3, 4))
def morton_forces_sorted(px, py, m, block: int = 256, near: int = 4):
    """Forces for MORTON-SORTED particles. N must be a multiple of block.

    Near field (exact): source blocks b-near..b+near via rolls. Far field
    (monopole): all blocks outside the near window. Wrapped roll offsets at
    the array ends are masked out of the near field and consistently picked
    up by the far field.
    """
    n = px.shape[0]
    B = n // block
    assert n % block == 0 and B > 2 * near

    xb = px.reshape(B, block)
    yb = py.reshape(B, block)
    mb = m.reshape(B, block)

    # Block aggregates (quadtree-node center of mass, nbody.rs:300-320)
    msum = jnp.sum(mb, axis=1)
    inv_msum = 1.0 / jnp.maximum(msum, 1e-30)
    cx = jnp.sum(xb * mb, axis=1) * inv_msum
    cy = jnp.sum(yb * mb, axis=1) * inv_msum

    # --- near field: exact pairs against rolled source blocks ---
    fx = jnp.zeros_like(xb)
    fy = jnp.zeros_like(yb)
    bidx = jnp.arange(B, dtype=jnp.int32)
    for off in range(-near, near + 1):
        xs = jnp.roll(xb, -off, axis=0)   # source block b+off
        ys = jnp.roll(yb, -off, axis=0)
        ms = jnp.roll(mb, -off, axis=0)
        valid = ((bidx + off) >= 0) & ((bidx + off) < B)  # no wraparound
        dx = xs[:, None, :] - xb[:, :, None]              # [B, tgt, src]
        dy = ys[:, None, :] - yb[:, :, None]
        r = ms[:, None, :] / (dx * dx + dy * dy + EPS)
        w = valid[:, None, None].astype(jnp.float32)
        fx += jnp.sum(r * dx, axis=2) * w[:, :, 0]
        fy += jnp.sum(r * dy, axis=2) * w[:, :, 0]

    # --- far field: monopoles of all blocks outside the near window ---
    dxf = cx[None, :] - px[:, None]                       # [N, B]
    dyf = cy[None, :] - py[:, None]
    rf = msum[None, :] / (dxf * dxf + dyf * dyf + EPS)
    tgt_block = jnp.arange(n, dtype=jnp.int32) // block
    in_near = jnp.abs(bidx[None, :] - tgt_block[:, None]) <= near
    rf = jnp.where(in_near, 0.0, rf)
    fx = fx.reshape(n) + jnp.sum(rf * dxf, axis=1)
    fy = fy.reshape(n) + jnp.sum(rf * dyf, axis=1)

    return fx * m, fy * m


@partial(jax.jit, static_argnums=(5, 6))
def step_morton(px, py, vx, vy, m, block: int = 256, near: int = 4,
                dt: float = 0.01):
    """One Euler step (nbody.rs:150-161): sort, approximate forces, integrate.

    Returns the particle set in Morton order (identity-free, like the
    reference's per-step tree rebuild rebuilds structure from scratch).
    """
    px, py, m, vx, vy = morton_sort(px, py, m, vx, vy)
    fx, fy = morton_forces_sorted(px, py, m, block, near)
    vx = vx + dt * fx / m
    vy = vy + dt * fy / m
    px = px + dt * vx
    py = py + dt * vy
    return px, py, vx, vy, m
