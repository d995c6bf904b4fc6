"""Multi-chip Game of Life: row-sharded grid + halo exchange over ICI.

The reference's multi-threaded path splits interior rows into horizontal
strips with a separate serial border pass (gol.rs:115-167, 42-85). The
TPU-native equivalent shards the row axis over a device mesh; each step
exchanges one halo row with each ring neighbor via `lax.ppermute` (the
torus wrap falls out of the ring permutation), then applies the stencil
locally — identical math, no special border pass.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map


def axis_size(mesh: Mesh, axis) -> int:
    """Total devices along a named axis or a tuple of axes.

    Multi-host meshes name their axes ("dcn", "ici") and shard the long
    grid/particle/band dimension over BOTH: JAX collectives accept the
    tuple as one combined (row-major linearized) axis, so consecutive
    shards are ICI neighbors and only the host-boundary ring edges cross
    DCN — one inter-host hop per exchange, by construction.
    """
    if isinstance(axis, str):
        return mesh.shape[axis]
    out = 1
    for a in axis:
        out *= mesh.shape[a]
    return out


def make_multi_step(mesh: Mesh, axis="rows", k: int = 1):
    """Build a jitted k-generation step over a row-sharded [N, N] grid.

    `axis` may be one mesh axis name or a tuple like ("dcn", "ici") for
    multi-host: the halo ppermute then rides ICI everywhere except the
    two ring edges that fall on host boundaries.
    """

    n_dev = axis_size(mesh, axis)
    fwd = [(i, (i + 1) % n_dev) for i in range(n_dev)]
    bwd = [(i, (i - 1) % n_dev) for i in range(n_dev)]

    def one_step(g):
        # halo_lo = last row of previous shard; halo_hi = first row of next
        halo_lo = lax.ppermute(g[-1:, :], axis, fwd)
        halo_hi = lax.ppermute(g[:1, :], axis, bwd)
        p = jnp.concatenate([halo_lo, g, halo_hi], axis=0)  # [r+2, N]
        r = g.shape[0]
        nb = jnp.zeros_like(g)
        for dy in (0, 1, 2):
            rows = p[dy : dy + r, :]
            for dx in (-1, 0, 1):
                if dy == 1 and dx == 0:
                    continue
                nb = nb + jnp.roll(rows, dx, axis=1)
        return ((nb == 3) | ((g == 1) & (nb == 2))).astype(g.dtype)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(axis, None),),
        out_specs=P(axis, None),
    )
    def step_k(local):
        return lax.fori_loop(0, k, lambda i, g: one_step(g), local)

    return jax.jit(step_k)


def shard_grid(grid, mesh: Mesh, axis="rows"):
    return jax.device_put(grid, NamedSharding(mesh, P(axis, None)))
