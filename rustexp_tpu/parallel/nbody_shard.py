"""Multi-chip N-body: target-sharded particles, all-gathered sources.

The reference fans contiguous particle slices out to threads sharing the
tree via Arc (nbody.rs:424-478). The TPU-native equivalent shards the
target-particle axis over the device mesh and all-gathers the (much smaller)
source data over ICI — the same communication shape as sequence-parallel
attention's KV gather.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..ops.nbody_forces import EPS


def make_step(mesh: Mesh, axis="p"):
    """Jitted brute-force Euler step over particle arrays sharded on `axis`.

    Signature of the returned fn: (px, py, vx, vy, m, dt) — dt is a TRACED
    (replicated) argument, so the reference's interactive X/x dt-doubling
    keys (RustNBodyExperiment.hs:89-90) never trigger a recompile.
    Returns (px, py, vx, vy, m) — mass passes through unchanged so the
    output is directly reusable as the next step's input, same contract
    as make_step_bh (ADVICE r3: the --devices loop fed a 4-tuple back
    into the 6-arg step and crashed on frame 2).

    Particle count must divide the mesh size. `axis` may be a tuple like
    ("dcn", "ici") for multi-host meshes: the source all-gather is then
    hierarchical (XLA gathers the ICI ring first, one DCN exchange per
    host after), targets never move.
    """

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis), P()),
        out_specs=(P(axis), P(axis), P(axis), P(axis), P(axis)),
    )
    def step(px, py, vx, vy, m, dt):
        # gather all sources over ICI; targets stay local
        sx = lax.all_gather(px, axis, tiled=True)
        sy = lax.all_gather(py, axis, tiled=True)
        sm = lax.all_gather(m, axis, tiled=True)
        # global index of local targets for the i != j skip
        shard = lax.axis_index(axis)
        nloc = px.shape[0]
        gidx = shard * nloc + jnp.arange(nloc)
        dx = sx[None, :] - px[:, None]
        dy = sy[None, :] - py[:, None]
        d2 = dx * dx + dy * dy + EPS
        f = (m[:, None] * sm[None, :]) / d2
        f = jnp.where(gidx[:, None] == jnp.arange(sx.shape[0])[None, :], 0.0, f)
        fx = jnp.sum(f * dx, axis=1)
        fy = jnp.sum(f * dy, axis=1)
        vx = vx + dt * fx / m
        vy = vy + dt * fy / m
        return px + dt * vx, py + dt * vy, vx, vy, m

    return jax.jit(step)


def make_step_bh(mesh: Mesh, axis="p", block: int = 256,
                 k_near: int | None = None):
    """Multi-chip block Barnes-Hut — the PRODUCTION approximate step.

    VERDICT r2 #3b: the sharded N-body previously covered brute force
    only; this shards ops/nbody_bh.step_bh (the analog of the reference's
    default Barnes-Hut path, nbody.rs:186-480, fanned out per particle
    slice at nbody.rs:424-478).

    Decomposition per step, per device:
      1. all-gather the (Morton-unsorted) particle shards — one 2.6 MB
         exchange at N=131k over ICI;
      2. REPLICATED global Morton sort + per-block aggregates + K-nearest
         AABB selection (identical on every device; O(N log N) —
         negligible beside the force sweeps, and replicating it avoids a
         distributed sort);
      3. LOCAL force evaluation for this device's contiguous slice of
         target blocks only (exact K-near pairs + [n_loc, B] monopole far
         field — the O(N·B + N·K·block) bulk, split 1/D);
      4. local Euler update + runaway kill (nbody.rs:451-471).

    Returns (px, py, vx, vy, m) sharded on `axis`, globally Morton-sorted
    (the concatenation of local slices IS the sorted order, so the result
    matches single-device step_bh exactly).

    Signature of the returned fn: (px, py, vx, vy, m, dt) — dt traced.
    """
    from ..ops.nbody_bh import morton_sort, near_block_indices, theta_to_k
    from ..ops.nbody_forces import EPS, kill_runaway
    from .gol_shard import axis_size

    n_dev = axis_size(mesh, axis)
    if k_near is None:
        # Derive from the reference's default theta so the calibrated
        # K(theta) (cross-calibrated vs the reference quadtree; see
        # ops/nbody_bh.theta_to_k) can't silently go stale here again.
        # n_blocks is unknown until trace time; pass a large cap — it is
        # clamped to the real block count inside step once B is known
        # (ADVICE r3: an unclamped fori_loop bound past B would silently
        # double-count the last near block via clamped traced indexing).
        k_near = theta_to_k(0.85, 1 << 30)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis), P()),
        out_specs=(P(axis), P(axis), P(axis), P(axis), P(axis)),
        # the Morton sort's Pallas path carries no varying-mesh-axes
        # info on its outputs (same as gol_shard's kernels)
        check_rep=False,
    )
    def step(pxs, pys, vxs, vys, ms, dt):
        # 1. gather the full particle set
        px = lax.all_gather(pxs, axis, tiled=True)
        py = lax.all_gather(pys, axis, tiled=True)
        vx = lax.all_gather(vxs, axis, tiled=True)
        vy = lax.all_gather(vys, axis, tiled=True)
        m = lax.all_gather(ms, axis, tiled=True)
        n = px.shape[0]
        B = n // block
        nb_loc = B // n_dev
        assert n % block == 0 and B % n_dev == 0
        kn = min(k_near, B)  # shapes are static at trace time

        # 2. replicated sort + aggregates (identical on every device);
        # the sort's Pallas path needs interpret mode off-TPU, keyed by
        # the MESH platform (see gol_shard's note on sitecustomize)
        px, py, m, vx, vy = morton_sort(
            px, py, m, vx, vy,
            interpret=mesh.devices.flat[0].platform != "tpu")
        xb = px.reshape(B, block)
        yb = py.reshape(B, block)
        mb = m.reshape(B, block)
        msum = jnp.sum(mb, axis=1)
        inv = 1.0 / jnp.maximum(msum, 1e-30)
        cx = jnp.sum(xb * mb, axis=1) * inv
        cy = jnp.sum(yb * mb, axis=1) * inv
        idx = near_block_indices(xb.min(1), xb.max(1), yb.min(1), yb.max(1),
                                 kn)                         # [B, K]

        # 3. local target slice: contiguous blocks [b0, b0 + nb_loc)
        dev = lax.axis_index(axis)
        b0 = dev * nb_loc
        xt = lax.dynamic_slice_in_dim(xb, b0, nb_loc, 0)     # [nb, block]
        yt = lax.dynamic_slice_in_dim(yb, b0, nb_loc, 0)
        idx_loc = lax.dynamic_slice_in_dim(idx, b0, nb_loc, 0)

        def body(k, acc):
            fx, fy = acc
            src = idx_loc[:, k]
            xs_ = xb[src]
            ys_ = yb[src]
            mss = mb[src]
            dx = xs_[:, None, :] - xt[:, :, None]            # [nb, tgt, src]
            dy = ys_[:, None, :] - yt[:, :, None]
            r = mss[:, None, :] / (dx * dx + dy * dy + EPS)
            return fx + jnp.sum(r * dx, axis=2), fy + jnp.sum(r * dy, axis=2)

        fx, fy = lax.fori_loop(0, kn, body,
                               (jnp.zeros_like(xt), jnp.zeros_like(yt)))

        nearmask = jnp.zeros((nb_loc, B), bool).at[
            jnp.arange(nb_loc, dtype=jnp.int32)[:, None], idx_loc].set(True)
        n_loc = nb_loc * block
        pxl = xt.reshape(n_loc)
        pyl = yt.reshape(n_loc)
        dxf = cx[None, :] - pxl[:, None]                     # [n_loc, B]
        dyf = cy[None, :] - pyl[:, None]
        rf = msum[None, :] / (dxf * dxf + dyf * dyf + EPS)
        rf = jnp.where(jnp.repeat(nearmask, block, axis=0), 0.0, rf)
        ml = lax.dynamic_slice_in_dim(m, b0 * block, n_loc, 0)
        fxl = (fx.reshape(n_loc) + jnp.sum(rf * dxf, axis=1)) * ml
        fyl = (fy.reshape(n_loc) + jnp.sum(rf * dyf, axis=1)) * ml

        # 4. Euler + runaway kill on the local slice (nbody.rs:150-161,460-471)
        vxl = lax.dynamic_slice_in_dim(vx, b0 * block, n_loc, 0) + dt * fxl / ml
        vyl = lax.dynamic_slice_in_dim(vy, b0 * block, n_loc, 0) + dt * fyl / ml
        pxl = pxl + dt * vxl
        pyl = pyl + dt * vyl
        vxl, vyl = kill_runaway(pxl, pyl, vxl, vyl)
        return pxl, pyl, vxl, vyl, ml

    return jax.jit(step)


def shard_particles(arrs, mesh: Mesh, axis="p"):
    s = NamedSharding(mesh, P(axis))
    return tuple(jax.device_put(a, s) for a in arrs)
