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

    Particle count must divide the mesh size. `axis` may be a tuple like
    ("dcn", "ici") for multi-host meshes: the source all-gather is then
    hierarchical (XLA gathers the ICI ring first, one DCN exchange per
    host after), targets never move.
    """

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis), P()),
        out_specs=(P(axis), P(axis), P(axis), P(axis)),
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
        return px + dt * vx, py + dt * vy, vx, vy

    return jax.jit(step)


def shard_particles(arrs, mesh: Mesh, axis="p"):
    s = NamedSharding(mesh, P(axis))
    return tuple(jax.device_put(a, s) for a in arrs)
