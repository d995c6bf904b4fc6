"""Grid tree-code: the TPU-native Barnes-Hut substitute.

The reference's Barnes-Hut (nbody.rs:186-480) builds a pointer-recursive
quadtree per step and traverses it per particle with an s/d < theta far-field
cutoff — both hostile to XLA (dynamic shapes, recursion, scattered memory).

This kernel keeps the same physics contract (approximate far-field via
aggregated mass, exact near-field, identical force law and integrator) with
a TPU-shaped algorithm:

  1. bin particles into a C x C uniform grid over the AABB (the quadtree's
     deepest regular level);
  2. sort particles by cell id — after the sort, any 3-cell row segment of
     the grid is one contiguous window of the particle array;
  3. near-field: exact pair interactions against the 3x3 neighbor cells,
     read as three contiguous sorted windows of static width W (masked);
  4. far-field: monopole (center-of-mass) interactions against all other
     cells — one dense [chunk, C*C] VPU sweep.

Accuracy is validated against the brute-force oracle (exactly the
cross-check the reference's theta==0 fallback implies, nbody.rs:197-200);
the cell resolution C plays the role of theta. Like the reference's tree
(rebuilt per step), all binning state is recomputed inside the jitted step.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from .nbody_forces import EPS


@partial(jax.jit, static_argnums=(3, 4, 5))
def treecode_forces(px, py, m, cells: int = 64, window: int = 512,
                    chunk: int = 1024):
    """Approximate all-pairs forces. Returns (fx, fy, overflow).

    `overflow` is the number of near-field windows wider than `window`
    (0 means the result is exact-near-field; callers can re-tune W).
    N must be a multiple of `chunk` (pad with zero-mass particles).
    """
    n = px.shape[0]
    C = cells
    assert n % chunk == 0

    # --- 1. AABB + binning (reference AABB scan nbody.rs:387-398) ---
    x1, x2 = jnp.min(px), jnp.max(px)
    y1, y2 = jnp.min(py), jnp.max(py)
    ex = jnp.maximum(x2 - x1, 1e-6)
    ey = jnp.maximum(y2 - y1, 1e-6)
    cx = jnp.clip(((px - x1) / ex * C).astype(jnp.int32), 0, C - 1)
    cy = jnp.clip(((py - y1) / ey * C).astype(jnp.int32), 0, C - 1)
    cid = cy * C + cx

    # --- 2. sort by cell ---
    order = jnp.argsort(cid)
    ps_x, ps_y, ps_m = px[order], py[order], m[order]
    cid_s = cid[order]

    ncells = C * C
    ones = jnp.ones_like(cid)
    counts = jax.ops.segment_sum(ones, cid, num_segments=ncells)
    starts = jnp.cumsum(counts) - counts
    ends = starts + counts

    # --- cell monopoles ---
    mass_c = jax.ops.segment_sum(m, cid, num_segments=ncells)
    comx = jax.ops.segment_sum(m * px, cid, num_segments=ncells) / jnp.maximum(mass_c, 1e-30)
    comy = jax.ops.segment_sum(m * py, cid, num_segments=ncells) / jnp.maximum(mass_c, 1e-30)
    ccx = jnp.arange(ncells, dtype=jnp.int32) % C
    ccy = jnp.arange(ncells, dtype=jnp.int32) // C

    w = window

    def chunk_forces(args):
        qx, qy, qm, qcx, qcy, qidx = args  # [B] target particles (original order)
        B = qx.shape[0]

        # --- 4. far-field: monopoles of all cells outside the 3x3 hood ---
        dx = comx[None, :] - qx[:, None]            # [B, ncells]
        dy = comy[None, :] - qy[:, None]
        d2 = dx * dx + dy * dy + EPS
        f = (qm[:, None] * mass_c[None, :]) / d2
        near = (jnp.abs(ccx[None, :] - qcx[:, None]) <= 1) & (
            jnp.abs(ccy[None, :] - qcy[:, None]) <= 1
        )
        f = jnp.where(near, 0.0, f)
        fx = jnp.sum(f * dx, axis=1)
        fy = jnp.sum(f * dy, axis=1)

        # --- 3. near-field: three contiguous sorted windows (rows dy=-1,0,1) ---
        overflow = jnp.int32(0)
        for drow in (-1, 0, 1):
            row = qcy + drow
            valid_row = (row >= 0) & (row < C)
            row_c = jnp.clip(row, 0, C - 1)
            lo = starts[row_c * C + jnp.maximum(qcx - 1, 0)]
            hi = ends[row_c * C + jnp.minimum(qcx + 1, C - 1)]
            overflow += jnp.sum((hi - lo) > w)
            idx = lo[:, None] + jnp.arange(w)[None, :]          # [B, w]
            ok = (idx < hi[:, None]) & valid_row[:, None]
            idx_c = jnp.clip(idx, 0, n - 1)
            sx = ps_x[idx_c]
            sy = ps_y[idx_c]
            sm = ps_m[idx_c]
            sidx = order[idx_c]
            ddx = sx - qx[:, None]
            ddy = sy - qy[:, None]
            dd2 = ddx * ddx + ddy * ddy + EPS
            ff = (qm[:, None] * sm) / dd2
            ff = jnp.where(ok & (sidx != qidx[:, None]), ff, 0.0)
            fx = fx + jnp.sum(ff * ddx, axis=1)
            fy = fy + jnp.sum(ff * ddy, axis=1)

        return fx, fy, overflow

    nchunks = n // chunk
    args = (
        px.reshape(nchunks, chunk),
        py.reshape(nchunks, chunk),
        m.reshape(nchunks, chunk),
        cx.reshape(nchunks, chunk),
        cy.reshape(nchunks, chunk),
        jnp.arange(n, dtype=jnp.int32).reshape(nchunks, chunk),
    )

    def body(carry, a):
        fx, fy, ov = chunk_forces(a)
        return carry + ov, (fx, fy)

    total_ov, (fx, fy) = lax.scan(body, jnp.int32(0), args)
    return fx.reshape(n), fy.reshape(n), total_ov


@partial(jax.jit, static_argnums=(5, 6, 7))
def step_treecode(px, py, vx, vy, m, cells: int = 64, window: int = 512,
                  chunk: int = 1024, dt: float = 0.01):
    """One Euler step with grid tree-code forces + runaway-velocity kill.

    Mirrors nb_step_barnes_hut's update loop (nbody.rs:440-472).
    """
    from .nbody_forces import kill_runaway

    fx, fy, ov = treecode_forces(px, py, m, cells, window, chunk)
    vx = vx + dt * fx / m
    vy = vy + dt * fy / m
    px = px + dt * vx
    py = py + dt * vy
    # kill applies after the position update (nbody.rs:457-471)
    vx, vy = kill_runaway(px, py, vx, vy)
    return px, py, vx, vy, ov
