"""Binned Pallas tile rasterizer — the production G-buffer producer.

TPU-native equivalent of the reference's parallel Fill path
(rasterizer.rs:2074-2198): the screen is split into VPU-shaped tiles, each
triangle is binned to the tiles its AABB overlaps, and a Pallas grid walks
one tile per program, folding its bin into an in-VMEM z/tri-id/barycentric
accumulator. Tile exclusivity makes every pixel owned by exactly one
program — the same argument the reference uses to avoid locking — so there
is no depth-scatter conflict at all.

Differences from the reference, by TPU design:
  * Binning is a dense coverage matrix + stable argsort compaction (static
    shapes), not dynamic Vec pushes (rasterizer.rs:2104-2163).
  * Edge functions are evaluated directly at all tile pixels as int32 vector
    ops (VPU lanes), not incrementally stepped per scanline
    (rasterizer.rs:1637-1684). Same integers, same results.
  * Triangles are processed 8 per step, one per sublane, with a
    submission-order-preserving merge — no scalar loads in the inner loop.
  * Equal-z resolution: strict less-than keeps the earlier triangle — the
    per-tile bin preserves submission order, so output is deterministic and
    bit-identical to the XLA oracle (raster_xla.py) and the reference's
    serial path.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .ieee import lerp_2mad, lerp_3w, seal, seal_zero, strict_default
from .raster_setup import TriSetup
from .raster_xla import GBuffer

# VPU-shaped tile: 8-sublane multiple x 128 lanes
TILE_H = 32
TILE_W = 128

# Triangles processed per kernel step (sublane-vectorized)
GROUP = 8

# Channel layout of the packed per-tile triangle data. The third edge is
# recovered inside the kernel from the exact integer identity
# e0 + e1 + e2 = C0 + C1 + C2 =: S (the A and B gradients sum to zero),
# so its gradients are never stored or multiplied.
# int channels: A0 A1 B0 B1 C0 C1 S min_x min_y max_x max_y tri_id
_I_CH = 12
# float channels: bias0 bias1 bias2 z0 z10 z20 inv_a2
_F_CH = 7


class BinnedTris(NamedTuple):
    setup_i: jnp.ndarray   # i32 [nT, cap, _I_CH] per-tile triangle data
    setup_f: jnp.ndarray   # f32 [nT, cap, _F_CH + extra]
    ids: jnp.ndarray       # i32 [nT, cap] original triangle index per slot
    counts: jnp.ndarray    # i32 [nT] triangles in each bin (clamped to cap)
    overflow: jnp.ndarray  # bool [] any bin exceeded capacity (those tris drop)


def bin_triangles(
    setup: TriSetup, h: int, w: int, cap: int,
    tile_h: int = TILE_H, tile_w: int = TILE_W,
    extra_f: jnp.ndarray | None = None,
) -> BinnedTris:
    """Coverage-matrix binning with stable compaction.

    Reference analog: the serial AABB->tile push loop rasterizer.rs:2115-2163.
    Stability of the argsort preserves triangle submission order per bin,
    which the depth-test tie rule depends on.
    """
    nty, ntx = pl.cdiv(h, tile_h), pl.cdiv(w, tile_w)
    n_tiles = nty * ntx

    tx = jnp.arange(ntx, dtype=jnp.int32)
    ty = jnp.arange(nty, dtype=jnp.int32)
    # Tile index ranges overlapped by each (clipped, half-open) pixel AABB
    tx_lo = setup.min_x // tile_w
    tx_hi = (setup.max_x - 1) // tile_w
    ty_lo = setup.min_y // tile_h
    ty_hi = (setup.max_y - 1) // tile_h

    cov_x = (tx[None, :] >= tx_lo[:, None]) & (tx[None, :] <= tx_hi[:, None])
    cov_y = (ty[None, :] >= ty_lo[:, None]) & (ty[None, :] <= ty_hi[:, None])
    cov = cov_y[:, :, None] & cov_x[:, None, :] & setup.valid[:, None, None]
    cov = cov.reshape(-1, n_tiles)  # [T, nT]

    full_counts = cov.sum(axis=0).astype(jnp.int32)
    counts = jnp.minimum(full_counts, cap)
    overflow = jnp.any(full_counts > cap)

    # Stable compaction: covered triangle ids first, in submission order
    order = jnp.argsort(~cov, axis=0, stable=True)[:cap]  # [<=cap, nT]
    ids = order.T.astype(jnp.int32)  # [nT, k<=cap]
    k = ids.shape[1]
    slot_ok = jnp.arange(k, dtype=jnp.int32)[None, :] < counts[:, None]

    # Pack channels FIRST (cheap T-domain stacks), then gather whole rows
    # with a single indexed read per array. One gather of [nT*cap] rows is
    # ~20x cheaper than 21 per-channel gathers — gather cost on TPU is per
    # index, not per byte.
    T = setup.A.shape[0]
    packed_i = jnp.concatenate(
        [setup.A[:, :2], setup.B[:, :2], setup.C[:, :2],
         jnp.sum(setup.C, axis=1, keepdims=True),
         setup.min_x[:, None], setup.min_y[:, None],
         setup.max_x[:, None], setup.max_y[:, None],
         jnp.arange(T, dtype=jnp.int32)[:, None]],
        axis=1,
    )  # [T, 12]
    f_parts = [setup.bias, setup.z0[:, None], setup.z10[:, None],
               setup.z20[:, None], setup.inv_a2[:, None]]
    if extra_f is not None:
        f_parts.append(extra_f)
    packed_f = jnp.concatenate(f_parts, axis=1)  # [T, 7 + extra]

    setup_i = packed_i[ids.reshape(-1)].reshape(ids.shape[0], k, _I_CH)
    setup_f = packed_f[ids.reshape(-1)].reshape(ids.shape[0], k, -1)
    # Padding slots get an empty AABB so they can never touch a pixel
    empty = ~slot_ok[..., None]
    setup_i = jnp.where(
        jnp.broadcast_to(empty, setup_i.shape)
        & (jnp.arange(_I_CH)[None, None, :] >= 9)
        & (jnp.arange(_I_CH)[None, None, :] <= 10),
        0, setup_i,
    )
    if k < cap:  # argsort returned fewer rows than capacity (T < cap)
        pad = cap - k
        setup_i = jnp.pad(setup_i, ((0, 0), (0, pad), (0, 0)))
        setup_f = jnp.pad(setup_f, ((0, 0), (0, pad), (0, 0)))
        ids = jnp.pad(ids, ((0, 0), (0, pad)))
    return BinnedTris(setup_i, setup_f, ids, counts, overflow)


def _tile_kernel(counts_ref, si_ref, sf_ref,
                 z_ref, tid_ref, b0_ref, b1_ref, b2_ref,
                 *, tile_h: int, tile_w: int, ntx: int, chunk_size: int,
                 group: int = GROUP, strict: bool = True):
    ti = pl.program_id(0)
    tj = pl.program_id(1)
    tk = pl.program_id(2)
    count = counts_ref[ti * ntx + tj]

    shape3 = (1, tile_h, tile_w)
    xs = tj * tile_w + jax.lax.broadcasted_iota(jnp.int32, shape3, 2)
    ys = ti * tile_h + jax.lax.broadcasted_iota(jnp.int32, shape3, 1)
    xf = xs << 4
    yf = ys << 4

    # Depth clear to 1.0 (rasterizer.rs:1954), empty visibility. The output
    # blocks stay resident while the k grid dimension streams bin chunks.
    @pl.when(tk == 0)
    def _init():
        z_ref[:] = jnp.ones((tile_h, tile_w), jnp.float32)
        tid_ref[:] = jnp.full((tile_h, tile_w), -1, jnp.int32)
        b0_ref[:] = jnp.zeros((tile_h, tile_w), jnp.float32)
        b1_ref[:] = jnp.zeros((tile_h, tile_w), jnp.float32)
        b2_ref[:] = jnp.zeros((tile_h, tile_w), jnp.float32)

    remaining = count - tk * chunk_size
    n_groups = jnp.clip(pl.cdiv(remaining, group), 0, chunk_size // group)

    def chunk(c, _):
        base = pl.multiple_of(c * group, group)
        si = si_ref[0, pl.ds(base, group), :]  # i32 [G, _I_CH]
        sf = sf_ref[0, pl.ds(base, group), :]  # f32 [G, _F_CH]

        # Per-triangle constants pre-broadcast to [G, th, 1]: every later op
        # against [*, th, tw] values then only broadcasts along lanes (or
        # dim 0); a simultaneous sublane+lane broadcast does not lower.
        def ci(ch):
            return jnp.broadcast_to(si[:, ch].reshape(group, 1, 1),
                                    (group, tile_h, 1))

        def cf(ch):
            return jnp.broadcast_to(sf[:, ch].reshape(group, 1, 1),
                                    (group, tile_h, 1))

        # Edge functions for all GROUP triangles over the whole tile
        e0 = ci(0) * xf + ci(2) * yf + ci(4)
        e1 = ci(1) * xf + ci(3) * yf + ci(5)
        e2 = ci(6) - e0 - e1  # exact: gradients sum to zero
        inside = (e0 | e1 | e2) >= 0
        in_box = ((xs >= ci(7)) & (ys >= ci(8))
                  & (xs < ci(9)) & (ys < ci(10)))  # padding slots: max=0
        inv_a2 = cf(6)
        # Integer de-bias, then ONE f32 rounding at the product — the
        # reference's (e - e_add - 1) as f32 * inv_tri_a2 semantics
        # (rasterizer.rs:1695-1697). cf(0..2) hold f32-encoded {1, 2}.
        b0 = (e0 - cf(0).astype(jnp.int32)).astype(jnp.float32) * inv_a2
        b1 = (e1 - cf(1).astype(jnp.int32)).astype(jnp.float32) * inv_a2
        b2 = (e2 - cf(2).astype(jnp.int32)).astype(jnp.float32) * inv_a2
        # Per-op f32 z (rasterizer.rs:1704-1708) when `strict` (interpret /
        # CPU, where the oracle parity chain runs); the seal key follows the
        # kernel's [G, th, 1] broadcast pattern so only lanes broadcast.
        zz = (inv_a2 * 0.0).astype(jnp.int32) if strict else None
        zi = lerp_2mad(cf(3), cf(4), cf(5), b2, b0, zz)
        zm = jnp.where(inside & in_box, zi, jnp.float32(jnp.inf))  # [G, th, tw]

        # Submission-order-preserving merge: strict less-than keeps earlier.
        # The winner's BIN SLOT (a true scalar, so it splats cleanly) is
        # recorded; slots map back to triangle ids outside the kernel.
        slot0 = tk * chunk_size + base
        for g in range(group):
            upd = zm[g] < z_ref[:]
            z_ref[:] = jnp.where(upd, zm[g], z_ref[:])
            tid_ref[:] = jnp.where(upd, slot0 + g, tid_ref[:])
            b0_ref[:] = jnp.where(upd, b0[g], b0_ref[:])
            b1_ref[:] = jnp.where(upd, b1[g], b1_ref[:])
            b2_ref[:] = jnp.where(upd, b2[g], b2_ref[:])
        return 0

    jax.lax.fori_loop(0, n_groups, chunk, 0)


@functools.partial(jax.jit, static_argnames=("h", "w", "cap", "tile_h", "tile_w",
                                             "chunk", "group", "interpret"))
def raster_gbuffer_pallas(
    setup: TriSetup, h: int, w: int, cap: int | None = None,
    tile_h: int = TILE_H, tile_w: int = TILE_W, chunk: int = 512,
    group: int = GROUP, interpret: bool | None = None,
) -> GBuffer:
    """Rasterize to a G-buffer with the binned tile kernel.

    Requires h % tile_h == 0 and w % tile_w == 0 (framebuffers here are
    MXU/VPU-friendly sizes; use the XLA oracle otherwise). ``cap`` is the
    static per-tile bin capacity; ``chunk`` the slice of a bin streamed into
    VMEM per grid step.

    Returns (GBuffer, overflow): `overflow` is a traced bool scalar that is
    True when any bin exceeded `cap` (those triangles were dropped) — callers
    must surface it or re-bin with a larger cap; never ignore it silently.
    """
    if h % tile_h or w % tile_w:
        raise ValueError(f"frame {h}x{w} not divisible by tile {tile_h}x{tile_w}")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    T = setup.A.shape[0]
    if cap is None:
        cap = min(_round_up(T, 512), 32768)
    cap = min(cap, _round_up(T, group))
    chunk = min(chunk, _round_up(cap, group))
    cap = _round_up(cap, chunk)
    nty, ntx = h // tile_h, w // tile_w
    n_k = cap // chunk

    bins = bin_triangles(setup, h, w, cap, tile_h, tile_w)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nty, ntx, n_k),
        in_specs=[
            pl.BlockSpec((1, chunk, _I_CH),
                         lambda i, j, k, *_: (i * ntx + j, k, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk, _F_CH),
                         lambda i, j, k, *_: (i * ntx + j, k, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_h, tile_w), lambda i, j, k, *_: (i, j),
                         memory_space=pltpu.VMEM)
        ] * 5,
    )
    out_shape = [
        jax.ShapeDtypeStruct((h, w), jnp.float32),
        jax.ShapeDtypeStruct((h, w), jnp.int32),
        jax.ShapeDtypeStruct((h, w), jnp.float32),
        jax.ShapeDtypeStruct((h, w), jnp.float32),
        jax.ShapeDtypeStruct((h, w), jnp.float32),
    ]
    kernel = functools.partial(_tile_kernel, tile_h=tile_h, tile_w=tile_w,
                               ntx=ntx, chunk_size=chunk, group=group,
                               strict=strict_default())
    z, slot, b0, b1, b2 = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(bins.counts, bins.setup_i, bins.setup_f)
    # Map winning bin slots back to original triangle ids (flat single-index
    # gather — multi-dim advanced indexing hits XLA:TPU's slow gather path)
    ys = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    tile_idx = (ys // tile_h) * ntx + xs // tile_w
    flat = (tile_idx * cap + jnp.maximum(slot, 0)).reshape(-1)
    gathered = bins.ids.reshape(-1)[flat].reshape(h, w)
    tid = jnp.where(slot >= 0, gathered, -1).astype(jnp.int32)
    return GBuffer(z=z, tid=tid, b=jnp.stack([b0, b1, b2], axis=-1)), bins.overflow


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


# ---------------------------------------------------------------------------
# Attribute-interpolating variant: the zero-gather production path
# ---------------------------------------------------------------------------
#
# Per-pixel gathers (triangle id -> vertex attributes) are catastrophically
# slow on TPU (~100 ns/index on the scalar core). This kernel therefore
# interpolates vertex attributes *during* rasterization — like the reference
# does inside its inner loop (rasterizer.rs:1713-1744) — so the output is a
# stack of screen-space attribute planes and shading needs no gathers at all.
#
# Two interpolation forms, matching the reference exactly:
#   * "2MAD":   q0 + q10*b2 + q20*b0          (colors, 1/w; rasterizer.rs:1656-1663)
#   * "3W":     qb1*b1 + qb2*b2 + qb0*b0      (world pos, normals; rasterizer.rs:1725-1733)
# Both are linear in the barycentrics; each channel costs 2-3 MADs per
# candidate and one merge per group. The final perspective divide by the
# interpolated 1/w happens outside the kernel (pure elementwise XLA).


def attr_channels_2mad(iw0, iw1, iw2, a0, a1, a2):
    """Per-triangle (q0, q10, q20) triples for 2MAD channels: a/w form.

    Products sealed so (a*iw - q0) rounds per-op like the reference's
    per-triangle c10/c20 precompute (oracle.cpp:1242-1243)."""
    zz = seal_zero(iw0)
    q0 = seal(a0 * iw0[:, None], zz)
    return jnp.concatenate(
        [q0, seal(a1 * iw1[:, None], zz) - q0,
         seal(a2 * iw2[:, None], zz) - q0], axis=1
    )


def attr_channels_3w(iw0, iw1, iw2, a0, a1, a2):
    """Per-triangle (qb1, qb2, qb0) triples for 3-weight channels."""
    return jnp.concatenate(
        [a0 * iw0[:, None], a1 * iw1[:, None], a2 * iw2[:, None]], axis=1
    )


def _attr_tile_kernel(counts_ref, si_ref, sf_ref, *out_refs,
                      tile_h: int, tile_w: int, ntx: int, chunk_size: int,
                      n2: int, n3: int, group: int = GROUP,
                      strict: bool = True):
    z_ref, slot_ref = out_refs[0], out_refs[1]
    lin_refs = out_refs[2:]
    ti = pl.program_id(0)
    tj = pl.program_id(1)
    tk = pl.program_id(2)
    count = counts_ref[ti * ntx + tj]

    shape3 = (1, tile_h, tile_w)
    xs = tj * tile_w + jax.lax.broadcasted_iota(jnp.int32, shape3, 2)
    ys = ti * tile_h + jax.lax.broadcasted_iota(jnp.int32, shape3, 1)
    xf = xs << 4
    yf = ys << 4

    @pl.when(tk == 0)
    def _init():
        z_ref[:] = jnp.ones((tile_h, tile_w), jnp.float32)
        slot_ref[:] = jnp.full((tile_h, tile_w), -1, jnp.int32)
        for r in lin_refs:
            r[:] = jnp.zeros((tile_h, tile_w), jnp.float32)

    remaining = count - tk * chunk_size
    n_groups = jnp.clip(pl.cdiv(remaining, group), 0, chunk_size // group)

    def chunk(c, _):
        base = pl.multiple_of(c * group, group)
        si = si_ref[0, pl.ds(base, group), :]
        sf = sf_ref[0, pl.ds(base, group), :]

        def ci(ch):
            return jnp.broadcast_to(si[:, ch].reshape(group, 1, 1),
                                    (group, tile_h, 1))

        def cf(ch):
            return jnp.broadcast_to(sf[:, ch].reshape(group, 1, 1),
                                    (group, tile_h, 1))

        e0 = ci(0) * xf + ci(2) * yf + ci(4)
        e1 = ci(1) * xf + ci(3) * yf + ci(5)
        e2 = ci(6) - e0 - e1  # exact: gradients sum to zero
        inside = (e0 | e1 | e2) >= 0
        in_box = ((xs >= ci(7)) & (ys >= ci(8))
                  & (xs < ci(9)) & (ys < ci(10)))
        inv_a2 = cf(6)
        # Integer de-bias, then ONE f32 rounding at the product — the
        # reference's (e - e_add - 1) as f32 * inv_tri_a2 semantics
        # (rasterizer.rs:1695-1697). cf(0..2) hold f32-encoded {1, 2}.
        b0 = (e0 - cf(0).astype(jnp.int32)).astype(jnp.float32) * inv_a2
        b1 = (e1 - cf(1).astype(jnp.int32)).astype(jnp.float32) * inv_a2
        b2 = (e2 - cf(2).astype(jnp.int32)).astype(jnp.float32) * inv_a2
        zz = (inv_a2 * 0.0).astype(jnp.int32) if strict else None
        zi = lerp_2mad(cf(3), cf(4), cf(5), b2, b0, zz)
        zm = jnp.where(inside & in_box, zi, jnp.float32(jnp.inf))

        # Interpolated linear parts for every attribute channel, [G, th, tw],
        # per-op f32 like the reference's fragment chains
        # (rasterizer.rs:1713-1733)
        lins = []
        off = 7
        for a in range(n2):
            lins.append(lerp_2mad(cf(off + a), cf(off + n2 + a),
                                  cf(off + 2 * n2 + a), b2, b0, zz))
        off = 7 + 3 * n2
        for a in range(n3):
            lins.append(lerp_3w(cf(off + a), cf(off + n3 + a),
                                cf(off + 2 * n3 + a), b1, b2, b0, zz))

        slot0 = tk * chunk_size + base
        for g in range(group):
            upd = zm[g] < z_ref[:]
            z_ref[:] = jnp.where(upd, zm[g], z_ref[:])
            slot_ref[:] = jnp.where(upd, slot0 + g, slot_ref[:])
            for r, lin in zip(lin_refs, lins):
                r[:] = jnp.where(upd, lin[g], r[:])
        return 0

    jax.lax.fori_loop(0, n_groups, chunk, 0)


@functools.partial(jax.jit, static_argnames=("n2", "n3", "h", "w", "cap",
                                             "tile_h", "tile_w", "chunk",
                                             "group", "spans", "interpret"))
def raster_attrs_pallas(
    setup: TriSetup, extra_f: jnp.ndarray, n2: int, n3: int,
    h: int, w: int, cap: int | None = None,
    tile_h: int = TILE_H, tile_w: int = TILE_W, chunk: int = 512,
    group: int = GROUP, spans: tuple | None = None,
    interpret: bool | None = None,
):
    """Rasterize + interpolate attributes in one kernel.

    extra_f: f32 [T, 3*(n2+n3)] channel triples laid out as
    [n2 x q0][n2 x q10][n2 x q20][n3 x qb1][n3 x qb2][n3 x qb0].
    Returns (z [h,w], mask bool [h,w], lin: tuple of n2+n3 f32 [h,w] planes,
    overflow bool scalar) where `lin` still needs the perspective divide by
    the interpolated-1/w channel (the first plane). `overflow` fires when a
    bin exceeded `cap` or a triangle's tile span exceeded `spans` — in either
    case triangles were dropped and callers must re-bin, never ignore it.
    """
    if h % tile_h or w % tile_w:
        raise ValueError(f"frame {h}x{w} not divisible by tile {tile_h}x{tile_w}")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    assert extra_f.shape[1] == 3 * (n2 + n3)

    T = setup.A.shape[0]
    if cap is None:
        cap = min(_round_up(T, 512), 32768)
    cap = min(cap, _round_up(T, group))
    chunk = min(chunk, _round_up(cap, group))
    cap = _round_up(cap, chunk)
    nty, ntx = h // tile_h, w // tile_w
    n_k = cap // chunk

    if spans is not None:
        bins = bin_pairs(setup, h, w, cap, spans[0], spans[1],
                         tile_h, tile_w, extra_f=extra_f)
    else:
        bins = bin_triangles(setup, h, w, cap, tile_h, tile_w, extra_f=extra_f)
    f_ch = 7 + 3 * (n2 + n3)

    n_planes = n2 + n3
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nty, ntx, n_k),
        in_specs=[
            pl.BlockSpec((1, chunk, _I_CH),
                         lambda i, j, k, *_: (i * ntx + j, k, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk, f_ch),
                         lambda i, j, k, *_: (i * ntx + j, k, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_h, tile_w), lambda i, j, k, *_: (i, j),
                         memory_space=pltpu.VMEM)
        ] * (2 + n_planes),
    )
    out_shape = (
        [jax.ShapeDtypeStruct((h, w), jnp.float32),
         jax.ShapeDtypeStruct((h, w), jnp.int32)]
        + [jax.ShapeDtypeStruct((h, w), jnp.float32)] * n_planes
    )
    kernel = functools.partial(
        _attr_tile_kernel, tile_h=tile_h, tile_w=tile_w, ntx=ntx,
        chunk_size=chunk, n2=n2, n3=n3, group=group, strict=strict_default(),
    )
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(bins.counts, bins.setup_i, bins.setup_f)
    z, slot = outs[0], outs[1]
    return z, slot >= 0, tuple(outs[2:]), bins.overflow


def max_bin_count(setup: TriSetup, h: int, w: int,
                  tile_h: int = TILE_H, tile_w: int = TILE_W) -> jnp.ndarray:
    """Cheap per-frame bound on bin occupancy, for adaptive-cap callers."""
    nty, ntx = pl.cdiv(h, tile_h), pl.cdiv(w, tile_w)
    tx_lo = setup.min_x // tile_w
    tx_hi = (setup.max_x - 1) // tile_w
    ty_lo = setup.min_y // tile_h
    ty_hi = (setup.max_y - 1) // tile_h
    tx = jnp.arange(ntx, dtype=jnp.int32)
    ty = jnp.arange(nty, dtype=jnp.int32)
    cov_x = (tx[None, :] >= tx_lo[:, None]) & (tx[None, :] <= tx_hi[:, None])
    cov_y = (ty[None, :] >= ty_lo[:, None]) & (ty[None, :] <= ty_hi[:, None])
    cov = cov_y[:, :, None] & cov_x[:, None, :] & setup.valid[:, None, None]
    return cov.reshape(-1, nty * ntx).sum(axis=0).max()


# ---------------------------------------------------------------------------
# Pairs-sort binning: replaces the [T, nT] column argsort with one flat sort
# ---------------------------------------------------------------------------
#
# Each front-facing triangle's pixel AABB covers a small rectangle of tiles
# (span_x x span_y, almost always <= 2x2 at 32x128 tiles). Enumerate up to
# m_x*m_y (tile, triangle) pairs per triangle, sort the flat pair keys
# tile*T + t once (order within a tile stays submission order — the depth
# tie rule depends on it), then slice each tile's contiguous segment via
# searchsorted. ~15x fewer sorted elements than the dense coverage argsort.
#
# Correctness: a triangle spanning more than m_x*m_y tiles cannot be fully
# binned — bin_pairs reports `overflow` and callers must use bin_triangles
# (always correct) or a larger m. suggest_spans() bounds the spans for a
# scene with one cheap device round-trip.


def bin_pairs(
    setup: TriSetup, h: int, w: int, cap: int, m_x: int, m_y: int,
    tile_h: int = TILE_H, tile_w: int = TILE_W,
    extra_f: jnp.ndarray | None = None,
) -> BinnedTris:
    nty, ntx = pl.cdiv(h, tile_h), pl.cdiv(w, tile_w)
    n_tiles = nty * ntx
    T = setup.A.shape[0]

    tx_lo = setup.min_x // tile_w
    tx_hi = (setup.max_x - 1) // tile_w
    ty_lo = setup.min_y // tile_h
    ty_hi = (setup.max_y - 1) // tile_h
    span_x = tx_hi - tx_lo + 1
    span_y = ty_hi - ty_lo + 1

    dx = jnp.arange(m_x, dtype=jnp.int32)
    dy = jnp.arange(m_y, dtype=jnp.int32)
    # [T, m_y, m_x] candidate tiles
    t_ty = ty_lo[:, None, None] + dy[None, :, None]
    t_tx = tx_lo[:, None, None] + dx[None, None, :]
    ok = (
        setup.valid[:, None, None]
        & (dy[None, :, None] < span_y[:, None, None])
        & (dx[None, None, :] < span_x[:, None, None])
    )
    tile_id = t_ty * ntx + t_tx
    tri_id = jnp.broadcast_to(
        jnp.arange(T, dtype=jnp.int32)[:, None, None], tile_id.shape
    )
    big = jnp.int32(n_tiles * T)
    key = jnp.where(ok, tile_id * T + tri_id, big).reshape(-1)
    skey = jnp.sort(key)

    # Segment boundaries per tile
    bounds = jnp.searchsorted(
        skey, jnp.arange(n_tiles + 1, dtype=jnp.int32) * T
    ).astype(jnp.int32)
    full_counts = bounds[1:] - bounds[:-1]
    counts = jnp.minimum(full_counts, cap)
    overflow = (
        jnp.any(full_counts > cap)
        | jnp.any(setup.valid & ((span_x > m_x) | (span_y > m_y)))
    )

    # Gather each tile's slots from its sorted segment
    slots = jnp.arange(cap, dtype=jnp.int32)
    pos = jnp.minimum(bounds[:-1, None] + slots[None, :], skey.shape[0] - 1)
    slot_ok = slots[None, :] < counts[:, None]
    ids = jnp.where(slot_ok, skey[pos.reshape(-1)].reshape(n_tiles, cap) % T, 0)

    packed_i = jnp.concatenate(
        [setup.A[:, :2], setup.B[:, :2], setup.C[:, :2],
         jnp.sum(setup.C, axis=1, keepdims=True),
         setup.min_x[:, None], setup.min_y[:, None],
         setup.max_x[:, None], setup.max_y[:, None],
         jnp.arange(T, dtype=jnp.int32)[:, None]],
        axis=1,
    )
    f_parts = [setup.bias, setup.z0[:, None], setup.z10[:, None],
               setup.z20[:, None], setup.inv_a2[:, None]]
    if extra_f is not None:
        f_parts.append(extra_f)
    packed_f = jnp.concatenate(f_parts, axis=1)

    flat_ids = ids.reshape(-1)
    setup_i = packed_i[flat_ids].reshape(n_tiles, cap, _I_CH)
    setup_f = packed_f[flat_ids].reshape(n_tiles, cap, -1)
    empty = ~slot_ok[..., None]
    setup_i = jnp.where(
        jnp.broadcast_to(empty, setup_i.shape)
        & (jnp.arange(_I_CH)[None, None, :] >= 9)
        & (jnp.arange(_I_CH)[None, None, :] <= 10),
        0, setup_i,
    )
    return BinnedTris(setup_i, setup_f, ids, counts, overflow)


def max_spans(setup: TriSetup, h: int, w: int,
              tile_h: int = TILE_H, tile_w: int = TILE_W):
    """(max span_x, max span_y) over front-facing triangles, for bin_pairs."""
    span_x = (setup.max_x - 1) // tile_w - setup.min_x // tile_w + 1
    span_y = (setup.max_y - 1) // tile_h - setup.min_y // tile_h + 1
    one = jnp.int32(1)
    return (jnp.max(jnp.where(setup.valid, span_x, one)),
            jnp.max(jnp.where(setup.valid, span_y, one)))
