"""Brute-force N-body as a Pallas TPU kernel (the hot benchmark path).

Math identical to nbody_forces (reference nbody.rs:164-184):
f_vec(i<-j) = m_i m_j (p_j - p_i) / (d^2 + EPS), explicit Euler.

TPU mapping (VPU-resident — thin matmuls would waste the MXU at 1/128
utilization, and bf16 MXU passes destroy close-pair displacements):

  * sources live as COLUMN vectors [S, 1] (host passes [N, 1] copies), so
    dx = xs_col - xt_row broadcasts into the pairwise [S, T] tile with no
    relayout and no matmul;
  * per-pair force rm*dx is formed before any reduction — the self-pair is
    exactly zero (dx == 0, matching the reference's i != j skip
    algebraically), and no 1/EPS-scale terms ever pollute an accumulator;
  * each source chunk reduces immediately into the revisited [1, T] output
    block (no [S, T] accumulator), keeping VMEM free for large tiles — the
    grid-step count, not the VPU, was the bottleneck at small tiles.

Grid = (target_tiles, source_chunks), output blocks revisited along the
source axis; ~10 VPU ops per particle pair.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .nbody_forces import EPS

T_TILE = 1024  # targets per grid step (lanes; measured best: 59.4
# ms/force at 131k vs 78 ms at 512 — fewer grid steps, same VPU work)


def _kernel(xs_ref, ys_ref, ms_ref, xt_ref, yt_ref, fx_ref, fy_ref,
            *, approx_recip):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        fx_ref[:] = jnp.zeros_like(fx_ref)
        fy_ref[:] = jnp.zeros_like(fy_ref)

    xs = xs_ref[:]          # [S, 1] source columns
    ys = ys_ref[:]
    ms = ms_ref[:]
    xt = xt_ref[:]          # [1, T] target rows
    yt = yt_ref[:]

    dx = xs - xt            # [S, T]
    dy = ys - yt
    d2 = dx * dx + dy * dy + EPS
    rm = pl.reciprocal(d2, approx=approx_recip) * ms
    # Reduce over the source chunk immediately (one extra add per pair)
    # instead of holding an [S, T] accumulator: frees VMEM for bigger tiles
    # and keeps the output block as the only revisited state.
    fx_ref[:] += jnp.sum(rm * dx, axis=0, keepdims=True)
    fy_ref[:] += jnp.sum(rm * dy, axis=0, keepdims=True)


@partial(jax.jit, static_argnums=(3, 4, 5))
def forces_pallas(px, py, m, src_chunk: int = 1024,
                  approx_recip: bool = False, interpret: bool | None = None):
    """All-pairs forces. N must be a multiple of max(T_TILE, src_chunk).

    Returns (fx, fy) — full reference-law forces including the m_i factor.
    """
    n = px.shape[0]
    assert n % T_TILE == 0 and n % src_chunk == 0
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    xs = px.reshape(n, 1)
    ys = py.reshape(n, 1)
    ms = m.reshape(n, 1)
    xt = px.reshape(1, n)
    yt = py.reshape(1, n)

    grid = (n // T_TILE, n // src_chunk)
    src = lambda i, j: (j, 0)
    tgt = lambda i, j: (0, i)

    fx, fy = pl.pallas_call(
        partial(_kernel, approx_recip=approx_recip),
        grid=grid,
        in_specs=[
            pl.BlockSpec((src_chunk, 1), src, memory_space=pltpu.VMEM),
            pl.BlockSpec((src_chunk, 1), src, memory_space=pltpu.VMEM),
            pl.BlockSpec((src_chunk, 1), src, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T_TILE), tgt, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T_TILE), tgt, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, T_TILE), tgt, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T_TILE), tgt, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, n), jnp.float32),
            jax.ShapeDtypeStruct((1, n), jnp.float32),
        ),
        interpret=interpret,
    )(xs, ys, ms, xt, yt)

    return fx.reshape(n) * m, fy.reshape(n) * m


@partial(jax.jit, static_argnums=(5, 6))
def step_brute_pallas(px, py, vx, vy, m, src_chunk: int = 1024,
                      approx_recip: bool = False, dt: float = 0.01):
    """Euler step on the Pallas force kernel (nbody.rs:150-161 semantics)."""
    fx, fy = forces_pallas(px, py, m, src_chunk, approx_recip)
    vx = vx + dt * fx / m
    vy = vy + dt * fy / m
    px = px + dt * vx
    py = py + dt * vy
    return px, py, vx, vy
