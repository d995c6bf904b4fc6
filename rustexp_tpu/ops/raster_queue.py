"""Flat-queue tile rasterizer — round-2 production G-buffer producer.

Replaces the [n_tiles, cap] bin layout of ops/raster_pallas.py. Measured
facts that force this design (see docs/ROADMAP.md round-2 notes):

  * The [nT, cap] bins stream nT*cap rows into VMEM every frame regardless
    of real occupancy — a ~620 us DMA floor at killeroo (16 MB/frame).
    The flat queue streams only ~#pairs rows (~2 MB): floor gone.
  * Per-triangle constants fetched as vector broadcasts cost ~75 cycles per
    triangle ([G,th,1] relayouts dominate the kernel). Reading them as SMEM
    scalars makes them free vector-scalar operands: the kernel drops from
    ~1.53 ms to ~0.75 ms on killeroo, and the triangle-group axis vanishes.
  * 8-row tiles only become profitable once bin DMA is proportional to real
    pairs; then each candidate evaluates [8,128] = one vreg per op.

Layout: the screen is tiled 8x128 (nty x ntx tiles). Each tile owns a
contiguous, chunk-aligned segment of the queue; a 1-D Pallas grid walks
chunks, with per-chunk scalars (tile ty/tx, first-chunk flag, pair count,
global tile row) prefetched into SMEM driving the output-block index map.
Slot order within a tile is either ascending triangle id (= submission
order, so the strict-less depth test alone reproduces the reference's
first-wins tie rule, rasterizer.rs:1704-1708) or the round-5 plane order
(one small sort instead of the big pair-key sort; the kernels' (z, tri)
lexicographic tie-break restores the same winner independent of
presentation order). See build_queue's `order`.

The queue STRUCTURE (which triangle lands in which slot) depends only on
AABB/tile geometry, so callers may cache it across frames and re-gather the
per-frame geometry rows cheaply; `check_queue_valid` reports whether a new
frame's setup still fits the cached structure (camera moved too far ->
rebuild). This is the bins-amortization strategy of VERDICT round 1.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .ieee import lerp_2mad, lerp_3w, strict_default
from .raster_setup import TriSetup

TILE_H = 16
TILE_W = 128
CHUNK = 128
# TILE_H=16 (was 8): the pair kernel is SMEM-SCALAR-READ bound (~1 ns x
# ~38 channel reads per pair, not vector-issue bound), so halving the pair
# count beats halving the per-pair vector footprint. Measured r3 (v5e,
# 512^2, sustained): KillerooP 1106 -> 962 us, HeadP 1648 -> 1407,
# KillerooV 840 -> 750; tile_h=32 regresses back to par (vector work
# catches up). 8-row-granular facts (row-block shade compaction, ROW_MARGIN)
# are tile_h-independent.
ROW_MARGIN = 2  # rows of camera-drift headroom baked into Queue.rows/ylim.
# Margin rows are shaded every frame (up to 2*margin extra rows per tile:
# margin 8 cost HeadP ~340 us, margin 4 ~170); 2 still absorbs 2 px of
# drift before a rebuild — interactive orbits move <1 px/frame in y
SHADE_W = 64  # FINE compacted-shade block width (px). The deferred shade
# pass gathers only OCCUPIED blocks; narrower blocks skip uncovered
# x-spans inside occupied rows (silhouette scenes: TorusKnotP 75% of the
# frame occupied at 128-px blocks vs 64% at 64-px) at the cost of 2x the
# gather/scatter indices. Measured on v5e (2026-08-19, sustained
# fixed-eye, tools/proto_subshade.py): TorusKnotP 1662 -> 1167 us,
# KillerooP 1698 -> 1593 at 64 px; 32 px is flat-to-worse (index
# overhead catches up). Must divide TILE_W. NOT unconditional: scenes
# whose geometry spans full tile widths (CornellBox interior: fixed-eye
# 1414 -> 1651 us at 64 px, zero pixels saved) and per-frame-rebuild
# paths (the finer occupancy costs 4 extra [T, nT] reductions + a 2x
# argsort in build_queue — full r5 bench: moving suite +7.3% when forced
# to 64) want TILE_W blocks — callers pick per scene via choose_shade_w.

# Route the pair-key sort (~1 ms of the ~2.4 ms in-graph rebuild at
# killeroo — the moving-camera frame's largest build line item) through
# the Pallas bitonic network (ops/sort_bitonic.py) instead of XLA's sort.
# Key-only: the network's carried index makes it stable, and build_queue
# only consumes the sorted keys. Bit-identical to jnp.sort by
# construction (tests/test_raster.py::test_queue_build_bitonic_parity).
# MEASURED DEAD END on hardware (v5e, 2026-08-18): moving-camera
# KillerooP (full per-frame in-graph rebuild) 2,648 -> 3,882 us/frame
# with the network on. Key-ONLY sorts of ~32k pairs are where XLA's
# sort is already strong; the bitonic win in nbody_bh comes from
# carrying 5 payload columns through the network instead of paying 5
# permutation gathers — the queue build has no payloads. Keep OFF.
USE_BITONIC_SORT = False


def _sort_keys(flat, big, use_bitonic: bool | None = None):
    """Ascending sort of int32 pair keys; `big` is the invalid sentinel
    (strictly greater than every valid key) already present in `flat`."""
    if use_bitonic is None:
        use_bitonic = USE_BITONIC_SORT
    n = flat.shape[0]
    if use_bitonic:
        from .sort_bitonic import sort_kv

        pow2 = 1 << (n - 1).bit_length()
        if pow2 >= 256:
            padded = jnp.full((pow2,), big, flat.dtype).at[:n].set(flat)
            skey, _ = sort_kv(padded, [])
            # Keep the original length: every pad entry equals `big` and
            # sorts to the tail, so the prefix is exactly sort(flat).
            return skey[:n]
    return jnp.sort(flat)

# int channels per pair row:
#   A0 A1 B0 B1 C0 C1 S min_x min_y max_x max_y tri
# `tri` (the triangle id) exists for the depth-race tie-break: plane-ordered
# queues (see build_queue order="plane") present a tile's pairs out of
# submission order, and the reference's first-wins z-tie rule
# (rasterizer.rs:1704-1708, strict-less against ascending submission)
# is equivalent to lexicographic min over (z, triangle id).
_I_CH = 12
_F_CH = 7  # bias0 bias1 bias2 z0 z10 z20 inv_a2  (+ 3*(n2+n3) attr channels)


@jax.tree_util.register_static
class StaticInt(int):
    """An int pytree node with NO leaves — the value is aux (structure) data.

    Queue.shade_w must survive jit as a PYTHON int (it is a reshape
    dimension in the shade paths); a plain int field would flatten to a
    traced leaf. As structure data, two queues built at different shade
    granularities are different pytree structures — a queue can never be
    rendered at the wrong granularity, it recompiles instead.
    """


def choose_shade_w(occ_fine: int, occ_tile: int, *,
                   fine_w: int = SHADE_W, tile_w: int = TILE_W,
                   rebuild_per_frame: bool = False,
                   per_pixel: bool = True) -> int:
    """Pick the compacted-shade block granularity for one scene config.

    `occ_fine` / `occ_tile` are the occupied-block counts queue_stats
    reports at fine_w / tile_w granularity. Finer blocks shade fewer
    pixels but double the gather/scatter index count and (when the queue
    is rebuilt per frame) add four [T, nT] extent reductions + a 2x
    argsort to every build. Thresholds calibrated by a SAME-SESSION
    per-scene A/B on v5e 512^2 (2026-08-19, tools/ab_shadew.py; the
    estimated-savings column is this function's input):

        scene        est.save  fixed d64  moving d64
        KillerooP      17.4%     -3.5%      +1.8%
        HeadP          21.7%    -18.4%      -2.1%
        HandP          14.1%     -4.9%      +4.5%
        TorusKnotP     14.7%    -21.9%     -11.7%
        CornellBoxP    13.1%    +16.4%     +25.6%

      * cached queue (fixed eye): >13.5% estimated savings -> fine.
        Classifies all five measured scenes correctly; the estimate is
        an AABB superset, so the margin to CornellBox (13.1%, the only
        fine-loser) is thin but the geometry is deterministic.
      * per-frame rebuild (moving): >14.5% -> fine. Only KillerooP is
        misclassified (fine at +1.8% = +41 us/frame) — every alternative
        single-feature rule measured worse (a triangle-count penalty
        would also flip HeadP's -2.1% win).
      * per-vertex shading (V modes): the rows list is never consumed —
        always tile_w (the fine build work would be pure waste).
    """
    if not per_pixel:
        return tile_w
    px_fine = occ_fine * fine_w
    px_tile = max(occ_tile * tile_w, 1)
    savings = 1.0 - px_fine / px_tile
    return fine_w if savings > (0.145 if rebuild_per_frame else 0.135) \
        else tile_w


class Queue(NamedTuple):
    """Camera-coherent raster work queue (a pytree; cacheable across frames)."""

    ids: jnp.ndarray        # i32 [S, chunk] triangle id per slot, -1 = empty
    scal: jnp.ndarray       # i32 [S, 5] per-chunk (ty, tx, first, count,
    #                         global_ty) — global_ty == ty except for
    #                         cyclic-interleaved band queues (row_stride>1)
    ranges: jnp.ndarray     # i32 [T, 4] binned tile ranges (ty0, ty1, tx0, tx1)
    built_valid: jnp.ndarray  # bool [T] triangle was front-facing at build
    overflow: jnp.ndarray   # bool [] structure truncated (spans/S/rows exceeded)
    rows: jnp.ndarray       # i32 [Rc] occupied flat SHADE-BLOCK ids (one id
    #                         per shade_w-wide pixel span: (y * w + x0) /
    #                         shade_w); h*(w//shade_w) = pad. Deferred shading
    #                         runs on these blocks only — anything not listed
    #                         has no coverage
    ylim: jnp.ndarray       # i32 [T, 2] per-triangle y-extent (with margin)
    #                         the rows list was built from; check_queue_valid
    #                         requires the frame's AABBs to stay inside it
    xlim: jnp.ndarray       # i32 [T, 2] per-triangle x-extent (with margin),
    #                         same contract as ylim: within-tile x drift can
    #                         cover shade blocks the built rows list skips
    #                         (full-range when shade_w == tile_w: tile
    #                         containment already bounds x there)
    shade_w: StaticInt      # STATIC block width the rows list was built at
    #                         (pytree structure data, not a leaf) — the shade
    #                         paths reshape output planes by it


def tile_ranges(setup: TriSetup, tile_h: int = TILE_H, tile_w: int = TILE_W):
    """Inclusive tile index ranges covered by each (clipped) pixel AABB."""
    ty0 = setup.min_y // tile_h
    ty1 = (setup.max_y - 1) // tile_h
    tx0 = setup.min_x // tile_w
    tx1 = (setup.max_x - 1) // tile_w
    return ty0, ty1, tx0, tx1


def _plane_run_table(m_y: int, m_x: int):
    """Static run enumeration for the plane-ordered build.

    A run (dy, dx, cls) is the subset of a base-tile group with span class
    `cls` = (sy-1)*m_x + (sx-1) that plane (dy, dx) re-binned to the tile
    shifted by (dy, dx); it exists iff dy < sy and dx < sx. R =
    [m_y(m_y+1)/2]*[m_x(m_x+1)/2] runs per tile.
    """
    runs = [(dy, dx, (sy - 1) * m_x + (sx - 1))
            for dy in range(m_y) for dx in range(m_x)
            for sy in range(dy + 1, m_y + 1) for sx in range(dx + 1, m_x + 1)]
    return runs


def build_queue(
    setup: TriSetup, h: int, w: int, *,
    s_cap: int, m_y: int, m_x: int, t_cap: int | None = None,
    chunk: int = CHUNK, tile_h: int = TILE_H, tile_w: int = TILE_W,
    order: str = "auto", row_stride: int = 1, row_offset=0,
    shade_w: int = SHADE_W,
) -> Queue:
    """Construct the flat queue from a frame's triangle setup.

    `shade_w` (round 5) is the compacted-shade block granularity the
    `rows` list is built at — either the fine SHADE_W or tile_w (which
    skips the x-extent build work entirely). The queue CARRIES it as
    static pytree structure (Queue.shade_w), so the render paths always
    shade at the granularity the rows were built at; pick it per scene
    with choose_shade_w.

    `row_stride` / `row_offset` (round 5) build a CYCLIC-interleaved band:
    this queue covers only the global tile rows g with g % row_stride ==
    row_offset, mapped to local tile row g // row_stride — the sharded
    rasterizer's load-balance interleave (the reference's analog is its
    sort-tiles-by-bin-size schedule, rasterizer.rs:2165-2167). `setup`
    must then be the UNSHIFTED global-frame setup and `h` the GLOBAL
    frame height; edge functions and AABB channels stay global (the
    kernel evaluates at global pixel coordinates via the per-chunk global
    tile row scalar), so no translation trick is needed and band output
    rows are bit-identical to the same rows of a whole-frame render.
    `ranges`/`ylim` stay in GLOBAL tile/pixel coordinates, which makes
    check_queue_valid interleave-agnostic: a triangle staying inside its
    built global tile range covers a subset of the strided rows it was
    binned to.

    Static config (s_cap = chunk rows, m_y/m_x = max tile spans enumerated)
    comes from `suggest_queue`. Reference analog: the per-tile Vec push
    binning loop rasterizer.rs:2115-2163, re-shaped as static-shape XLA ops.

    `order` picks the slot order within each tile's segment and the sort
    that produces it ("auto" = plane for dense meshes, tri for tiny or
    huge-span ones):

      * "plane" (round 5): every enumeration plane (dy, dx) maps
        triangle i to tile base_tile(i) + (dy*ntx + dx) — a CONSTANT shift
        of the same base key — so ONE ascending sort of T keys
        (base_tile, span_class, tri) replaces the T*m_y*m_x pair-key sort,
        and each tile's segment is reassembled from <=R contiguous runs of
        the single sorted array. The pair-key sort was the moving-camera
        frame's largest build line item (killeroo, v5e, m=3x3: 219k keys
        sort in 547 us; the single 24k-key sort is ~100 us). Slots are
        NOT in ascending triangle order, so kernels MUST run the (z, tri)
        depth tie-break (tie=True) to reproduce the reference's first-wins
        tie rule.
      * "tri": the round-2 layout — ascending triangle id within each tile
        (the reference's submission order), from a full pair-key sort.
        Valid with or without the tie-break.
      * "direct" (round 5): tiny meshes (T <= 64, auto) — identical layout
        to "tri" but with counts and slot ids read straight off the
        coverage matrix (cumsum ranks + a rank-match contraction): no key
        construction, no sort, no searchsorted, no slot gather. Valid with
        or without the tie-break.
    """
    nty_g, ntx = h // tile_h, w // tile_w   # GLOBAL tile grid
    if nty_g % row_stride:
        raise ValueError(
            f"{nty_g} tile rows not divisible by row_stride={row_stride}")
    nty = nty_g // row_stride               # LOCAL tile rows this queue owns
    n_tiles = nty * ntx                     # local tiles
    n_tiles_g = nty_g * ntx
    T = setup.valid.shape[0]
    row_offset = jnp.asarray(row_offset, jnp.int32)  # may be an axis index

    ty0, ty1, tx0, tx1 = tile_ranges(setup, tile_h, tile_w)
    span_y = ty1 - ty0 + 1
    span_x = tx1 - tx0 + 1

    if order == "auto":
        # Thresholds are same-session v5e A/Bs of the full moving frame
        # (tools/profile_plane.py, 2026-08-19). Small meshes skip
        # keys/sort/gather entirely — slot ids fall straight out of the
        # coverage matrix ("direct": cube 1794 -> 1637 us, CornellBox
        # 1891 -> 1862) as long as the [T, s_cap, chunk] rank-match stays
        # small (TorusKnot at 53M: 2134 us, WORSE than either sort).
        # Above that, plane's single T-key sort + gather-free run tables
        # beat the pair-key sort from ~2k triangles up (TorusKnot −4.5%,
        # Hand −8.3%, Killeroo −17%, Head −31%) unless huge per-triangle
        # spans explode the run table R = O(m_y^2 m_x^2) (the pre-round-5
        # 8192 cutoff dated from the gather-based run reconstruction).
        R_est = (m_y * (m_y + 1) // 2) * (m_x * (m_x + 1) // 2)
        if T <= 64 or (T <= 2048 and T * s_cap * chunk <= 2 ** 25):
            order = "direct"
        else:
            order = "plane" if (T >= 2048 and R_est <= 512) else "tri"
    if order == "plane" and n_tiles_g * (m_y * m_x) * (T + 1) >= 2 ** 31:
        order = "tri"  # key space must fit int32; fall back to the big sort

    # Local-tile coverage; tile rows compare at their GLOBAL indices.
    # Used by the rows list below and by the "direct" order's counts/slots.
    ty_ar = jnp.arange(nty, dtype=jnp.int32) * row_stride + row_offset
    tx_ar = jnp.arange(ntx, dtype=jnp.int32)
    cov_y = (ty_ar[None, :] >= ty0[:, None]) & (ty_ar[None, :] <= ty1[:, None])
    cov_x = (tx_ar[None, :] >= tx0[:, None]) & (tx_ar[None, :] <= tx1[:, None])
    cov = (cov_y[:, :, None] & cov_x[:, None, :]
           & setup.valid[:, None, None]).reshape(T, n_tiles)

    if order == "direct":
        # --- tiny-mesh build: no keys, no sort, no gathers ------------------
        # With T <= chunk, a tile's whole segment is its covering triangles
        # in ascending id order — exactly the "tri" layout — and the
        # exclusive rank of each triangle within each tile's segment is a
        # cumsum down the (m-span-clipped, to match the pair enumeration)
        # coverage matrix. Slot ids then come from a [T, S, chunk]
        # rank-match one-hot contraction (f32 exact: ids < 2^24). Measured
        # motive: the legacy chain cost the 12-triangle cube ~250 us/frame
        # of marginal in-graph rebuild (tools/profile_plane.py, v5e
        # 2026-08-19) — launch floor, not compute.
        win_y = cov_y & (ty_ar[None, :] - ty0[:, None] < m_y)
        win_x = cov_x & (tx_ar[None, :] - tx0[:, None] < m_x)
        cov_m = (win_y[:, :, None] & win_x[:, None, :]
                 & setup.valid[:, None, None]).reshape(T, n_tiles)
        cov_mi = cov_m.astype(jnp.int32)
        rank = jnp.cumsum(cov_mi, axis=0) - cov_mi     # exclusive [T, nT]
        counts = jnp.sum(cov_mi, axis=0)
    elif order == "plane":
        # --- single-sort plane-shifted build -------------------------------
        # Group keys stay GLOBAL under the interleave (the sort and
        # histogram cover the whole frame); only the run table below picks
        # the local tiles' source groups, so an interleaved plane build
        # sorts once per device but reconstructs only its own rows.
        C = m_y * m_x
        sy = jnp.clip(span_y, 1, m_y)
        sx = jnp.clip(span_x, 1, m_x)
        cls = (sy - 1) * m_x + (sx - 1)
        base = ty0 * ntx + tx0
        group = base * C + cls                       # [T] in [0, n_tiles_g*C)
        tri = jnp.arange(T, dtype=jnp.int32)
        big = jnp.int32(n_tiles_g * C * T)
        skey = _sort_keys(jnp.where(setup.valid, group * T + tri, big), big)
        stri = skey % T                              # sorted tri ids
        # Group lengths WITHOUT searchsorted (measured ~0.27 us/query on
        # v5e — 1153 queries would cost more than the sort it supports):
        # the (base, class) histogram factorizes over y and x, so one
        # [nty_g*m_y, T] @ [T, ntx*m_x] one-hot matmul counts every group
        # exactly (f32 is exact for integer counts < 2^24).
        uy = ((ty0[:, None] == jnp.arange(nty_g, dtype=jnp.int32)[None, :])
              & setup.valid[:, None])
        usy = sy[:, None] == jnp.arange(1, m_y + 1, dtype=jnp.int32)[None, :]
        ux = tx0[:, None] == jnp.arange(ntx, dtype=jnp.int32)[None, :]
        usx = sx[:, None] == jnp.arange(1, m_x + 1, dtype=jnp.int32)[None, :]
        U = (uy[:, :, None] & usy[:, None, :]).reshape(T, nty_g * m_y)
        V = (ux[:, :, None] & usx[:, None, :]).reshape(T, ntx * m_x)
        cnt_yx = jnp.einsum("ta,tb->ab", U.astype(jnp.float32),
                            V.astype(jnp.float32))      # [nty_g*m_y, ntx*m_x]
        glen = (cnt_yx.reshape(nty_g, m_y, ntx, m_x)
                .transpose(0, 2, 1, 3).reshape(-1).astype(jnp.int32))
        gbounds = jnp.concatenate([
            jnp.zeros((1,), jnp.int32), jnp.cumsum(glen)])  # [n_tiles_g*C+1]

        # Per-tile run tables [n_tiles, R] WITHOUT gathers: for a fixed
        # run (dy, dx, cls) the source group of tile (t_y, t_x) is the
        # group of tile (t_y-dy, t_x-dx) at class cls — a constant 2-D
        # SHIFT of the [nty_g, ntx, C] group-fact image. The two [nT, R]
        # gathers this replaces measured 67 us/frame on the KillerooP
        # moving rebuild (tools/profile_plane.py, v5e 2026-08-19); the
        # shift form is m_y*m_x pad+slice ops on [nty_g, ntx, ...] blocks.
        # Pad value 0 reproduces the gather form's src_ok masking exactly
        # (run_len 0, run_start gbounds[0] = 0 at out-of-range sources).
        # Run order is _plane_run_table's (dy, dx, sy, sx) flattening —
        # the slot-order contract the run-membership matvec depends on.
        g3 = glen.reshape(nty_g, ntx, C)
        gb3 = gbounds[:-1].reshape(nty_g, ntx, C)
        off = row_offset  # traced under shard_map; dynamic_slice below

        def _shifted(img, dy, dx, cls_list):
            # img[t_y - dy, t_x - dx, cls_list] over this queue's local
            # tiles (t_y = off + row_stride*j), zeros out of range.
            pad = jnp.pad(img[:, :, jnp.asarray(cls_list)],
                          ((dy, row_stride), (dx, 0), (0, 0)))
            win = jax.lax.dynamic_slice(
                pad, (off, jnp.int32(0), jnp.int32(0)),
                (nty_g, ntx, len(cls_list)))
            return win[::row_stride][:nty]          # [nty, ntx, len(cls)]

        rl_parts, rs_parts = [], []
        for dy in range(m_y):
            for dx in range(m_x):
                cls_list = [(sy - 1) * m_x + (sx - 1)
                            for sy in range(dy + 1, m_y + 1)
                            for sx in range(dx + 1, m_x + 1)]
                rl_parts.append(_shifted(g3, dy, dx, cls_list))
                rs_parts.append(_shifted(gb3, dy, dx, cls_list))
        R = sum(p.shape[-1] for p in rl_parts)
        run_len = jnp.concatenate(rl_parts, axis=-1).reshape(n_tiles, R)
        run_start = jnp.concatenate(rs_parts, axis=-1).reshape(n_tiles, R)
        counts = jnp.sum(run_len, axis=1).astype(jnp.int32)
    else:
        # --- legacy full pair-key sort -------------------------------------
        # Pair enumeration per (triangle, dy, dx); tiles beyond the static
        # m_y/m_x spans are not enumerated (overflow flag below).
        dy = jnp.arange(m_y, dtype=jnp.int32)
        dx = jnp.arange(m_x, dtype=jnp.int32)
        t_ty = ty0[:, None, None] + dy[None, :, None]
        t_tx = tx0[:, None, None] + dx[None, None, :]
        ok = (
            setup.valid[:, None, None]
            & (dy[None, :, None] < span_y[:, None, None])
            & (dx[None, None, :] < span_x[:, None, None])
            # Interleave: only pairs landing on this queue's global rows
            # (t_ty % 1 == 0 always holds, so stride 1 costs nothing)
            & (t_ty % row_stride == row_offset)
        )
        tile_id = (t_ty // row_stride) * ntx + t_tx   # LOCAL tile id

        # Pair keys sorted by (tile, tri): ascending triangle id within a
        # tile (the reference's submission order). Build-cost notes
        # (measured on v5e, killeroo, sustained in-graph): the sort of
        # ~T*m_y*m_x keys is ~1 ms; a cumsum-rank + per-pair SCATTER
        # alternative is 5+ ms — TPU scatters cost ~25 ns/index, so
        # anything per-pair must stay a sort/gather, and per-tile facts
        # below use dense masked reductions over the [T, n_tiles] coverage
        # matrix instead of scatter-min/max (which cost another ~4 ms).
        tri_id = jnp.broadcast_to(
            jnp.arange(T, dtype=jnp.int32)[:, None, None], tile_id.shape)
        big = jnp.int32(n_tiles * T)
        skey = _sort_keys(
            jnp.where(ok, tile_id * T + tri_id, big).reshape(-1), big)

        bounds = jnp.searchsorted(
            skey, jnp.arange(n_tiles + 1, dtype=jnp.int32) * T
        ).astype(jnp.int32)
        counts = bounds[1:] - bounds[:-1]  # [nT]

    # Chunk-aligned segment layout. Only tiles with pairs get chunks; the
    # slot plane of never-visited tiles stays -1 via input/output aliasing
    # of a prefilled buffer (z/attr planes are garbage there and must only
    # be consumed under the slot>=0 mask).
    cpt = pl.cdiv(counts, chunk)                  # chunks per tile
    starts = jnp.cumsum(cpt) - cpt                # first chunk index per tile
    total_chunks = jnp.sum(cpt)

    cs = jnp.arange(s_cap, dtype=jnp.int32)
    lo = starts
    hi = starts + cpt
    in_tile = (cs[None, :] >= lo[:, None]) & (cs[None, :] < hi[:, None])
    tile_of = jnp.argmax(in_tile, axis=0).astype(jnp.int32)
    chunk_live = jnp.any(in_tile, axis=0)
    k_of = cs - starts[tile_of]
    first = (chunk_live & (k_of == 0)) | ~chunk_live
    cnt = jnp.clip(counts[tile_of] - k_of * chunk, 0, chunk)
    cnt = jnp.where(chunk_live, cnt, 0)
    # Pad chunks beyond the live total are routed to a dummy tile row
    # (ty = nty) that the caller slices off: Pallas does NOT refetch output
    # blocks on revisit, so a pad chunk aimed at a real tile would write an
    # uninitialized buffer over finished pixels.
    ty = jnp.where(chunk_live, tile_of // ntx, nty)
    tx = jnp.where(chunk_live, tile_of % ntx, 0)
    # Column 4 is the GLOBAL tile row: the kernel evaluates edge functions
    # at global pixel coordinates while the output block index map stays
    # local (col 0) — what makes cyclic-interleaved band output rows
    # bit-identical to the same rows of a whole-frame render. For the pad
    # row (ty = nty) gty is out of range but cnt = 0: nothing evaluates.
    gty = ty * row_stride + row_offset
    scal = jnp.stack(
        [ty, tx, first.astype(jnp.int32), cnt, gty], axis=1)  # [S, 5]

    slot_ok = jnp.arange(chunk, dtype=jnp.int32)[None, :] < cnt[:, None]
    if order == "direct":
        # Slot (s, j) holds the triangle whose within-tile rank equals the
        # slot's global rank — a rank-match one-hot contracted against the
        # triangle ids (counts <= T <= chunk, so k_of is always 0 for live
        # chunks; kept general for uniformity with the other orders).
        cov_sel = jnp.take(cov_m, tile_of, axis=1)       # [T, S]
        rank_sel = jnp.take(rank, tile_of, axis=1)       # [T, S]
        rr = k_of[:, None] * chunk + jnp.arange(
            chunk, dtype=jnp.int32)[None, :]             # [S, chunk]
        match = (cov_sel[:, :, None]
                 & (rank_sel[:, :, None] == rr[None, :, :]))
        ids = jnp.einsum(
            "tsj,t->sj", match.astype(jnp.float32),
            jnp.arange(T, dtype=jnp.float32)).astype(jnp.int32)
        ids = jnp.where(slot_ok, ids, -1)
    elif order == "plane":
        # Slot -> source pair: rank k within the tile's segment falls in
        # run r iff exclusive-cum[r] <= k < inclusive-cum[r]; empty runs
        # admit no rank, so exactly one run matches any k < counts[tile].
        # GATHER-FREE form (first cut used 3 take_along_axis selects and
        # lost its sort savings to them): the one-hot run membership
        # matrix contracts against b = run_start - exclusive_cum in a
        # batched matvec — pure VPU compare/FMA work, exact in f32
        # (positions < 2^24).
        kk = k_of[:, None] * chunk + jnp.arange(
            chunk, dtype=jnp.int32)[None, :]             # [S, chunk]
        rlen_t = run_len[tile_of]                        # [S, R]
        rinc_t = jnp.cumsum(rlen_t, axis=1)
        rexc_t = rinc_t - rlen_t
        onehot = ((rexc_t[:, None, :] <= kk[:, :, None])
                  & (kk[:, :, None] < rinc_t[:, None, :]))
        b = (run_start[tile_of] - rexc_t).astype(jnp.float32)
        pos = jnp.einsum("skr,sr->sk", onehot.astype(jnp.float32),
                         b).astype(jnp.int32) + kk
        src = stri[jnp.clip(pos, 0, T - 1).reshape(-1)]
        ids = jnp.where(slot_ok, src.reshape(s_cap, chunk), -1)
    else:
        # Slot -> source pair (gather from the sorted key array)
        pos = (bounds[tile_of] + k_of * chunk)[:, None] + jnp.arange(
            chunk, dtype=jnp.int32)[None, :]                   # [S, chunk]
        src = skey[jnp.clip(pos, 0, skey.shape[0] - 1).reshape(-1)]
        ids = jnp.where(slot_ok, src.reshape(s_cap, chunk) % T,
                        -1).astype(jnp.int32)

    overflow = (
        (total_chunks > s_cap)
        | jnp.any(setup.valid & ((span_y > m_y) | (span_x > m_x)))
    )

    # Occupied SHADE-BLOCK list for the compacted deferred-shade pass: a
    # shade block is one shade_w-wide pixel span of one row. Its occupancy
    # is bounded by the y- AND x-extent of the pair AABBs landing in its
    # tile — pixels outside can have no coverage. Row granularity beats
    # tile granularity by the silhouette factor (measured ~25-35% fewer
    # shaded pixels); sub-tile_w x granularity (SHADE_W) adds another
    # 10-30% on silhouette-heavy scenes (header comment).
    #
    # Extents are expanded by ROW_MARGIN so the cached rows list survives
    # small camera drift; check_queue_valid then requires every frame's
    # triangle AABB to stay inside its built (expanded) extents — the
    # tile-range check alone would let geometry drift onto blocks the
    # shade pass skips, leaving background holes with stale never firing.
    nsx = w // shade_w            # shade blocks per pixel row
    spt = tile_w // shade_w       # shade blocks per tile column
    n_rb = (nty * tile_h) * nsx   # shade blocks of the LOCAL output frame
    if t_cap is None or t_cap > n_rb:
        t_cap = n_rb
    ymin_tri = jnp.maximum(setup.min_y - ROW_MARGIN, 0)
    ymax_tri = jnp.minimum(setup.max_y + ROW_MARGIN, h)
    # per-tile extents over its pairs: dense masked reductions over the
    # coverage matrix ([T, nT] vector min/max, ~0.1 ms) — scatter-min/max
    # over the pair enumeration cost ~4 ms at ~25 ns/scatter-index.
    # NOTE: cov covers the triangle's FULL tile range while the queue
    # enumerates only m_y x m_x of it; the extents of beyond-span tiles
    # are a superset, which only ever ADDS blocks to the shade list (and
    # span overflow already sets the rebuild flag).
    ymin_t = jnp.min(jnp.where(cov, ymin_tri[:, None], h), axis=0)
    ymax_t = jnp.max(jnp.where(cov, ymax_tri[:, None], 0), axis=0)
    rbid = jnp.arange(n_rb, dtype=jnp.int32)
    rb_tile = (rbid // nsx // tile_h) * ntx + (rbid % nsx) // spt
    # Shade-block ids are LOCAL (they index the local output planes); the
    # occupancy test runs at the block's GLOBAL pixel row, since the
    # per-tile extents above are global-frame AABB facts. x is
    # interleave-invariant: local block x == global x.
    rb_ly = rbid // nsx
    rb_y = (rb_ly // tile_h * row_stride + row_offset) * tile_h \
        + rb_ly % tile_h
    occ_rb = ((counts[rb_tile] > 0)
              & (rb_y >= ymin_t[rb_tile]) & (rb_y < ymax_t[rb_tile]))
    if shade_w == tile_w:
        # A block's x-span IS its tile column, so tile containment already
        # bounds x: skip the four extra [T, nT] reductions and the x
        # occupancy terms. This is the entire extra per-frame rebuild cost
        # of the finer granularity (moving suite +7.3% when forced fine,
        # v5e 2026-08-19) — per-frame-rebuild callers choose tile_w unless
        # the finer rows list saves >25% of shaded pixels (choose_shade_w).
        xmin_tri = jnp.zeros_like(ymin_tri)
        xmax_tri = jnp.full_like(ymax_tri, w)
    else:
        xmin_tri = jnp.maximum(setup.min_x - ROW_MARGIN, 0)
        xmax_tri = jnp.minimum(setup.max_x + ROW_MARGIN, w)
        xmin_t = jnp.min(jnp.where(cov, xmin_tri[:, None], w), axis=0)
        xmax_t = jnp.max(jnp.where(cov, xmax_tri[:, None], 0), axis=0)
        rb_x0 = (rbid % nsx) * shade_w
        occ_rb = (occ_rb
                  & (rb_x0 < xmax_t[rb_tile])
                  & (rb_x0 + shade_w > xmin_t[rb_tile]))
    occ_n = jnp.sum(occ_rb.astype(jnp.int32))
    order = jnp.argsort(jnp.where(occ_rb, rbid, rbid + n_rb))[:t_cap]
    rows = jnp.where(jnp.arange(t_cap, dtype=jnp.int32) < occ_n,
                     order, n_rb)
    overflow = overflow | (occ_n > t_cap)

    ranges = jnp.stack([ty0, ty1, tx0, tx1], axis=1)
    ylim = jnp.stack([ymin_tri, ymax_tri], axis=1)
    xlim = jnp.stack([xmin_tri, xmax_tri], axis=1)
    return Queue(ids=ids, scal=scal, ranges=ranges,
                 built_valid=setup.valid, overflow=overflow, rows=rows,
                 ylim=ylim, xlim=xlim, shade_w=StaticInt(shade_w))


def check_queue_valid(queue: Queue, setup: TriSetup,
                      tile_h: int = TILE_H, tile_w: int = TILE_W):
    """Is the cached structure still a superset of this frame's coverage?

    True = safe to reuse (extra stale pairs are harmless: their edge tests
    exclude all pixels they no longer cover). False = triangles moved out of
    their binned tiles or flipped front-facing -> rebuild.
    """
    ty0, ty1, tx0, tx1 = tile_ranges(setup, tile_h, tile_w)
    r = queue.ranges
    inside = ((ty0 >= r[:, 0]) & (ty1 <= r[:, 1])
              & (tx0 >= r[:, 2]) & (tx1 <= r[:, 3])
              # y/x-extent within the built rows list's (expanded)
              # bounds — tile containment alone is not enough:
              # within-tile drift can cover shade blocks the compacted
              # shade pass would skip
              & (setup.min_y >= queue.ylim[:, 0])
              & (setup.max_y <= queue.ylim[:, 1])
              & (setup.min_x >= queue.xlim[:, 0])
              & (setup.max_x <= queue.xlim[:, 1]))
    ok = jnp.all(jnp.where(setup.valid,
                           inside & queue.built_valid, True))
    return ok & ~queue.overflow


def pack_table(setup, extra_f):
    """Planar channel table [T, CH] for the per-frame pair gather.

    `setup` is a TriSetupP (planar 1-D fields); `extra_f` is a list of [T]
    f32 attribute channels in kernel order (base*n2, d10*n2, d20*n2, then
    the 3w triples). Int channels are bitcast to f32 so ONE row gather
    fetches everything; gather_rows bitcasts them back. Channel layout:
    i[0..11] = A0 A1 B0 B1 C0 C1 S min_x min_y max_x max_y tri, then
    f[0..6] = bias0 bias1 bias2 z0 z10 z20 inv_a2, then extras.
    """
    S = setup.C0 + setup.C1 + setup.C2
    tri = jnp.arange(setup.C0.shape[0], dtype=jnp.int32)
    ichans = [setup.A0, setup.A1, setup.B0, setup.B1, setup.C0, setup.C1,
              S, setup.min_x, setup.min_y, setup.max_x, setup.max_y, tri]
    fchans = [setup.bias0, setup.bias1, setup.bias2, setup.z0, setup.z10,
              setup.z20, setup.inv_a2, *extra_f]
    chans = [jax.lax.bitcast_convert_type(c, jnp.float32) for c in ichans]
    chans += fchans
    tab = jnp.stack(chans, axis=0).T  # [T, CH]
    # Row T is the EMPTY-SLOT sentinel: all-zero channels give a degenerate
    # AABB (max_x = max_y = 0), so the kernel's in_box test admits no pixel.
    # Empty queue slots gather this row — cheaper than masking the gathered
    # [S, CH, chunk] array afterwards (a masking pass measured ~600 us/frame
    # at head's 49.5k slots).
    return jnp.concatenate([tab, jnp.zeros((1, tab.shape[1]), jnp.float32)])


def gather_rows(queue: Queue, tabT, return_flat: bool = False):
    """Per-frame geometry refresh: ONE row gather per queue slot.

    Returns channel-major SMEM-ready arrays (rows_i [S, 11, chunk] i32,
    rows_f [S, F, chunk] f32) — minor dim = chunk = 128 lanes, so nothing
    pads (the old [S, chunk, CH] layout padded CH to 128 lanes and cost
    ~716 us/frame at killeroo; this path is ~100 us).

    With return_flat=True also returns rows_flat [S*chunk + 1, CH] f32 —
    the pre-transpose slot-indexed table (int channels bitcast), with one
    extra all-zero sentinel row at index S*chunk for empty-slot gathers.
    The deferred shade pass re-fetches a WINNING pair's channels with a
    single rows_flat[slot] gather.
    """
    s_cap, chunk = queue.ids.shape
    sentinel = tabT.shape[0] - 1  # all-zero row; empty AABB excludes pixels
    ids = queue.ids.reshape(-1)
    flat = jnp.where(ids < 0, sentinel, ids)
    rows = tabT[flat]                       # [S*chunk, CH]
    rowsT = rows.T.reshape(tabT.shape[1], s_cap, chunk)
    rows_i = jax.lax.bitcast_convert_type(rowsT[:_I_CH], jnp.int32)
    rows_f = rowsT[_I_CH:]
    # [S, CH, chunk]: Mosaic requires the 2nd-minor block dim to equal
    # the array dim (CH) when it isn't a multiple of 8.
    out = (rows_i.swapaxes(0, 1), rows_f.swapaxes(0, 1))
    if return_flat:
        zero = jnp.zeros((1, tabT.shape[1]), jnp.float32)
        return out + (jnp.concatenate([rows, zero], axis=0),)
    return out


def _queue_kernel(scal_ref, rows_i_ref, rows_f_ref, *out_refs,
                  chunk: int, n2: int, n3: int, interleave: int,
                  tile_h: int, tile_w: int, strict: bool = True,
                  tri_ref=None):
    """One chunk per grid step; per-pair constants are SMEM scalars.

    `tri_ref` (VMEM scratch plane, i32 [tile_h, tile_w]) enables the
    (z, triangle-id) lexicographic depth tie-break required by
    plane-ordered queues: the reference's strict-less race over ascending
    submission order makes the FIRST triangle win z ties
    (rasterizer.rs:1704-1708), which equals min (z, tri) regardless of the
    order pairs are presented in.
    """
    z_ref, slot_ref = out_refs[0], out_refs[1]
    lin_refs = out_refs[2:]
    c = pl.program_id(0)
    tx = scal_ref[c, 1]
    first = scal_ref[c, 2]
    cnt = scal_ref[c, 3]
    gty = scal_ref[c, 4]   # GLOBAL tile row (== col 0 unless interleaved)

    shape2 = (tile_h, tile_w)
    xs = tx * tile_w + jax.lax.broadcasted_iota(jnp.int32, shape2, 1)
    ys = gty * tile_h + jax.lax.broadcasted_iota(jnp.int32, shape2, 0)
    xf = xs << 4
    yf = ys << 4

    @pl.when(first == 1)
    def _init():
        z_ref[:] = jnp.ones(shape2, jnp.float32)
        slot_ref[:] = jnp.full(shape2, -1, jnp.int32)
        if tri_ref is not None:
            tri_ref[:] = jnp.full(shape2, jnp.int32(0x7FFFFFFF))
        for r in lin_refs:
            r[:] = jnp.zeros(shape2, jnp.float32)

    def one(p, slot_base):
        A0 = rows_i_ref[0, 0, p]
        A1 = rows_i_ref[0, 1, p]
        B0 = rows_i_ref[0, 2, p]
        B1 = rows_i_ref[0, 3, p]
        C0 = rows_i_ref[0, 4, p]
        C1 = rows_i_ref[0, 5, p]
        S = rows_i_ref[0, 6, p]
        mnx = rows_i_ref[0, 7, p]
        mny = rows_i_ref[0, 8, p]
        mxx = rows_i_ref[0, 9, p]
        mxy = rows_i_ref[0, 10, p]

        # Same integer edge math as the XLA oracle (28.4 fixed point,
        # third edge from e0+e1+e2 = S, sign-OR inside test).
        e0 = A0 * xf + B0 * yf + C0
        e1 = A1 * xf + B1 * yf + C1
        e2 = S - e0 - e1
        inside = (e0 | e1 | e2) >= 0
        in_box = (xs >= mnx) & (ys >= mny) & (xs < mxx) & (ys < mxy)
        inv_a2 = rows_f_ref[0, 6, p]
        # Integer de-bias, then ONE f32 rounding at the product
        # (rasterizer.rs:1695-1697); f channels 0..2 hold f32-encoded {1,2}.
        b0 = (e0 - rows_f_ref[0, 0, p].astype(jnp.int32)).astype(
            jnp.float32) * inv_a2
        b1 = (e1 - rows_f_ref[0, 1, p].astype(jnp.int32)).astype(
            jnp.float32) * inv_a2
        b2 = (e2 - rows_f_ref[0, 2, p].astype(jnp.int32)).astype(
            jnp.float32) * inv_a2
        # Per-op f32 interpolation (rasterizer.rs:1704-1733) when `strict`
        # (interpret/CPU, where the oracle parity chain runs); the seal key
        # is a scalar, which broadcasts like the other SMEM constants.
        zz = (inv_a2 * 0.0).astype(jnp.int32) if strict else None
        zi = lerp_2mad(rows_f_ref[0, 3, p], rows_f_ref[0, 4, p],
                       rows_f_ref[0, 5, p], b2, b0, zz)
        zm = jnp.where(inside & in_box, zi, jnp.float32(jnp.inf))

        lins = []
        off = _F_CH
        for a in range(n2):
            lins.append(lerp_2mad(rows_f_ref[0, off + a, p],
                                  rows_f_ref[0, off + n2 + a, p],
                                  rows_f_ref[0, off + 2 * n2 + a, p],
                                  b2, b0, zz))
        off = _F_CH + 3 * n2
        for a in range(n3):
            lins.append(lerp_3w(rows_f_ref[0, off + a, p],
                                rows_f_ref[0, off + n3 + a, p],
                                rows_f_ref[0, off + 2 * n3 + a, p],
                                b1, b2, b0, zz))

        if tri_ref is not None:
            tri = rows_i_ref[0, 11, p]
            cur = tri_ref[:]
            upd = (zm < z_ref[:]) | ((zm == z_ref[:]) & (tri < cur))
            tri_ref[:] = jnp.where(upd, tri, cur)
        else:
            upd = zm < z_ref[:]
        z_ref[:] = jnp.where(upd, zm, z_ref[:])
        slot_ref[:] = jnp.where(upd, slot_base + p, slot_ref[:])
        for r, lin in zip(lin_refs, lins):
            r[:] = jnp.where(upd, lin, r[:])

    n_iters = jnp.clip(pl.cdiv(cnt, interleave), 0, chunk // interleave)

    def body(i, _):
        for k in range(interleave):
            one(i * interleave + k, c * chunk)
        return 0

    jax.lax.fori_loop(0, n_iters, body, 0)


def _queue_kernel_zslot(scal_ref, rows_i_ref, rows_f_ref, z_ref, slot_ref,
                        *, chunk: int, interleave: int, tile_h: int,
                        tile_w: int, strict: bool = True, tri_ref=None):
    """Defer-lin variant: per pair, only the depth race runs in-kernel.

    Attribute planes are NOT interpolated here — the winning pair's slot id
    is enough for the deferred shade pass to re-evaluate them (bit-equal:
    same integer edge values, same float formula, evaluated once per pixel
    instead of select+stored once per PAIR). Cuts the per-pair vector-op
    count roughly in half for per-pixel scenes (ROADMAP lever #1).
    """
    c = pl.program_id(0)
    tx = scal_ref[c, 1]
    first = scal_ref[c, 2]
    cnt = scal_ref[c, 3]
    gty = scal_ref[c, 4]   # GLOBAL tile row (== col 0 unless interleaved)

    shape2 = (tile_h, tile_w)
    xs = tx * tile_w + jax.lax.broadcasted_iota(jnp.int32, shape2, 1)
    ys = gty * tile_h + jax.lax.broadcasted_iota(jnp.int32, shape2, 0)
    xf = xs << 4
    yf = ys << 4

    @pl.when(first == 1)
    def _init():
        z_ref[:] = jnp.ones(shape2, jnp.float32)
        slot_ref[:] = jnp.full(shape2, -1, jnp.int32)
        if tri_ref is not None:
            tri_ref[:] = jnp.full(shape2, jnp.int32(0x7FFFFFFF))

    def one(p, slot_base):
        A0 = rows_i_ref[0, 0, p]
        A1 = rows_i_ref[0, 1, p]
        B0 = rows_i_ref[0, 2, p]
        B1 = rows_i_ref[0, 3, p]
        C0 = rows_i_ref[0, 4, p]
        C1 = rows_i_ref[0, 5, p]
        S = rows_i_ref[0, 6, p]
        mnx = rows_i_ref[0, 7, p]
        mny = rows_i_ref[0, 8, p]
        mxx = rows_i_ref[0, 9, p]
        mxy = rows_i_ref[0, 10, p]

        e0 = A0 * xf + B0 * yf + C0
        e1 = A1 * xf + B1 * yf + C1
        e2 = S - e0 - e1
        inside = (e0 | e1 | e2) >= 0
        in_box = (xs >= mnx) & (ys >= mny) & (xs < mxx) & (ys < mxy)
        inv_a2 = rows_f_ref[0, 6, p]
        b0 = (e0 - rows_f_ref[0, 0, p].astype(jnp.int32)).astype(
            jnp.float32) * inv_a2
        b2 = (e2 - rows_f_ref[0, 2, p].astype(jnp.int32)).astype(
            jnp.float32) * inv_a2
        zz = (inv_a2 * 0.0).astype(jnp.int32) if strict else None
        zi = lerp_2mad(rows_f_ref[0, 3, p], rows_f_ref[0, 4, p],
                       rows_f_ref[0, 5, p], b2, b0, zz)
        zm = jnp.where(inside & in_box, zi, jnp.float32(jnp.inf))

        if tri_ref is not None:
            tri = rows_i_ref[0, 11, p]
            cur = tri_ref[:]
            upd = (zm < z_ref[:]) | ((zm == z_ref[:]) & (tri < cur))
            tri_ref[:] = jnp.where(upd, tri, cur)
        else:
            upd = zm < z_ref[:]
        z_ref[:] = jnp.where(upd, zm, z_ref[:])
        slot_ref[:] = jnp.where(upd, slot_base + p, slot_ref[:])

    n_iters = jnp.clip(pl.cdiv(cnt, interleave), 0, chunk // interleave)

    def body(i, _):
        for k in range(interleave):
            one(i * interleave + k, c * chunk)
        return 0

    jax.lax.fori_loop(0, n_iters, body, 0)


@functools.partial(jax.jit, static_argnames=(
    "h", "w", "chunk", "tile_h", "tile_w", "interleave", "interpret", "tie"))
def raster_zslot_queue(
    queue: Queue, setup, extra_f, h: int, w: int, *, chunk: int = CHUNK,
    tile_h: int = TILE_H, tile_w: int = TILE_W, interleave: int = 1,
    interpret: bool | None = None, tie: bool = True,
):
    """Depth-race-only rasterization through the flat queue.

    Returns (z, slot, rows_flat, stale): `slot` is the winning queue slot
    per pixel (-1 = background), `rows_flat` [S*chunk + 1, CH] the
    slot-indexed channel table (sentinel zero row last) for the deferred
    shade pass to re-evaluate the winner's attribute planes.

    `tie=True` (required for plane-ordered queues, harmless for
    tri-ordered ones) races on lexicographic (z, triangle id) instead of
    z alone — the order-independent form of the reference's first-wins
    z-tie rule.
    """
    if h % tile_h or w % tile_w:
        raise ValueError(f"frame {h}x{w} not divisible by {tile_h}x{tile_w}")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    tabT = pack_table(setup, list(extra_f))
    rows_i, rows_f, rows_flat = gather_rows(queue, tabT, return_flat=True)
    s_cap = queue.ids.shape[0]
    f_ch = rows_f.shape[1]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(s_cap,),
        in_specs=[
            pl.BlockSpec((1, _I_CH, chunk), lambda c, scal: (c, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, f_ch, chunk), lambda c, scal: (c, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=[
            pl.BlockSpec((tile_h, tile_w),
                         lambda c, scal: (scal[c, 0], scal[c, 1]),
                         memory_space=pltpu.VMEM)
        ] * 2,
        scratch_shapes=(
            [pltpu.VMEM((tile_h, tile_w), jnp.int32)] if tie else []),
    )
    hp = h + tile_h  # pad tile row for pad-chunk writes
    out_shape = [jax.ShapeDtypeStruct((hp, w), jnp.float32),
                 jax.ShapeDtypeStruct((hp, w), jnp.int32)]
    kernel = functools.partial(
        _queue_kernel_zslot, chunk=chunk, interleave=interleave,
        tile_h=tile_h, tile_w=tile_w, strict=strict_default())

    def kernel_entry(scal_ref, ri_ref, rf_ref, slot_init_ref, z_ref, s_ref,
                     *scratch):
        del slot_init_ref
        kernel(scal_ref, ri_ref, rf_ref, z_ref, s_ref,
               tri_ref=scratch[0] if tie else None)

    slot_init = jnp.full((hp, w), -1, jnp.int32)
    z, slot = pl.pallas_call(
        kernel_entry,
        grid_spec=grid_spec,
        out_shape=out_shape,
        input_output_aliases={3: 1},
        interpret=interpret,
    )(queue.scal, rows_i, rows_f, slot_init)
    stale = ~check_queue_valid(queue, setup, tile_h, tile_w)
    return z[:h], slot[:h], rows_flat, stale


@functools.partial(jax.jit, static_argnames=(
    "n2", "n3", "h", "w", "chunk", "tile_h", "tile_w", "interleave",
    "interpret", "tie"))
def raster_attrs_queue(
    queue: Queue, setup, extra_f, n2: int, n3: int,
    h: int, w: int, *, chunk: int = CHUNK, tile_h: int = TILE_H,
    tile_w: int = TILE_W, interleave: int = 1, interpret: bool | None = None,
    tie: bool = True,
):
    """Rasterize + interpolate attribute planes through the flat queue.

    `setup` is a TriSetupP; `extra_f` a list/tuple of 3*(n2+n3) planar [T]
    attribute channels. Returns (z, mask, lins tuple, stale) — `stale` is
    True when the cached queue no longer covers this frame's geometry (or
    overflowed at build): the caller must rebuild the queue and re-render.

    `tie=True` (required for plane-ordered queues) races on lexicographic
    (z, triangle id); see raster_zslot_queue.
    """
    if h % tile_h or w % tile_w:
        raise ValueError(f"frame {h}x{w} not divisible by {tile_h}x{tile_w}")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    assert len(extra_f) == 3 * (n2 + n3)

    tabT = pack_table(setup, extra_f)
    rows_i, rows_f = gather_rows(queue, tabT)
    s_cap = queue.ids.shape[0]
    f_ch = _F_CH + 3 * (n2 + n3)
    n_planes = n2 + n3

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(s_cap,),
        in_specs=[
            pl.BlockSpec((1, _I_CH, chunk), lambda c, scal: (c, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, f_ch, chunk), lambda c, scal: (c, 0, 0),
                         memory_space=pltpu.SMEM),
            # slot-plane init (-1): aliased to the slot output; never read
            # inside the kernel, never fetched (ANY = stays in HBM), so
            # never-visited tiles read back as empty.
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=[
            pl.BlockSpec((tile_h, tile_w),
                         lambda c, scal: (scal[c, 0], scal[c, 1]),
                         memory_space=pltpu.VMEM)
        ] * (2 + n_planes),
        scratch_shapes=(
            [pltpu.VMEM((tile_h, tile_w), jnp.int32)] if tie else []),
    )
    # One extra tile row receives pad-chunk writes; sliced off below.
    hp = h + tile_h
    out_shape = (
        [jax.ShapeDtypeStruct((hp, w), jnp.float32),
         jax.ShapeDtypeStruct((hp, w), jnp.int32)]
        + [jax.ShapeDtypeStruct((hp, w), jnp.float32)] * n_planes
    )
    kernel = functools.partial(
        _queue_kernel, chunk=chunk, n2=n2, n3=n3, interleave=interleave,
        tile_h=tile_h, tile_w=tile_w, strict=strict_default())

    def kernel_entry(scal_ref, ri_ref, rf_ref, slot_init_ref, *rest):
        del slot_init_ref
        if tie:
            *outs, tri_scratch = rest
            kernel(scal_ref, ri_ref, rf_ref, *outs, tri_ref=tri_scratch)
        else:
            kernel(scal_ref, ri_ref, rf_ref, *rest)

    slot_init = jnp.full((hp, w), -1, jnp.int32)
    outs = pl.pallas_call(
        kernel_entry,
        grid_spec=grid_spec,
        out_shape=out_shape,
        input_output_aliases={3: 1},  # slot_init (incl. prefetch arg) -> slot
        interpret=interpret,
    )(queue.scal, rows_i, rows_f, slot_init)
    z, slot = outs[0][:h], outs[1][:h]
    stale = ~check_queue_valid(queue, setup, tile_h, tile_w)
    return z, slot >= 0, tuple(o[:h] for o in outs[2:]), stale


def suggest_queue_config(setup_stats, margin: float = 1.3,
                         tile_margin: float = 1.15, chunk: int = CHUNK):
    """Static (s_cap, m_y, m_x, t_cap) from measured queue stats.

    The +1 span headroom and chunk margin absorb camera drift so cached
    structures can be rebuilt at nearby viewpoints without recompiling.
    t_cap (occupied-row-block capacity for the compacted shade) gets a
    smaller margin — its cost scales the per-pixel cubemap gathers directly.

    Caps are QUANTIZED (s_cap to 16 chunks, t_cap to 64 row-blocks) so
    nearby viewpoints produce the same static shapes: an unquantized cap
    changed with nearly every camera step, which made every interactive
    rebuild a fresh XLA compile (measured: 14 s/rebuild through the
    remote-TPU tunnel; quantized, rebuilds reuse the compiled build).

    Accepts queue_stats' 5-tuple (the tile_w-granular count is for
    choose_shade_w, not for capping) or the legacy 4-tuple; t_cap is
    sized from element [3] — pass the occupancy count matching the
    granularity the queue will be BUILT at.
    """
    total_chunks, sy, sx, occ_rows = setup_stats[:4]
    s_cap = max(16, -(-int(int(total_chunks) * margin + 4) // 16) * 16)
    t_cap = max(64, -(-int(int(occ_rows) * tile_margin + 8) // 64) * 64)
    return s_cap, int(sy) + 1, int(sx) + 1, t_cap


def queue_stats(setup: TriSetup, h: int, w: int,
                chunk: int = CHUNK, tile_h: int = TILE_H,
                tile_w: int = TILE_W, row_stride: int = 1,
                row_offset: int = 0):
    """(chunk count, max span_y, max span_x, occupied SHADE_W blocks,
    occupied tile_w blocks) for suggest_queue_config / choose_shade_w.

    The last two are the occupied compacted-shade block counts at the
    FINE (SHADE_W) and TILE (tile_w) granularities — both come from the
    same per-tile extents, so reporting both costs nothing extra, and
    callers pick the build granularity from their ratio (choose_shade_w)
    then cap with the matching element.

    `row_stride`/`row_offset` (static ints) restrict the stats to the
    cyclic-interleaved band's tiles — use the max over offsets for the
    unified caps of an interleaved shard (parallel/raster_shard.py).
    Span maxima stay GLOBAL: build_queue enumerates global spans.
    """
    nty_g, ntx = h // tile_h, w // tile_w
    nty = nty_g // row_stride
    ty0, ty1, tx0, tx1 = tile_ranges(setup, tile_h, tile_w)
    one = jnp.int32(1)
    span_y = jnp.where(setup.valid, ty1 - ty0 + 1, one)
    span_x = jnp.where(setup.valid, tx1 - tx0 + 1, one)

    # per-tile counts via the coverage matrix (build-time only)
    ty = jnp.arange(nty, dtype=jnp.int32) * row_stride + row_offset
    tx = jnp.arange(ntx, dtype=jnp.int32)
    cov_y = (ty[None, :] >= ty0[:, None]) & (ty[None, :] <= ty1[:, None])
    cov_x = (tx[None, :] >= tx0[:, None]) & (tx[None, :] <= tx1[:, None])
    cov = cov_y[:, :, None] & cov_x[:, None, :] & setup.valid[:, None, None]
    covf = cov.reshape(-1, nty * ntx)
    counts = covf.sum(axis=0).astype(jnp.int32)
    total_chunks = jnp.sum(pl.cdiv(counts, chunk))
    # occupied SHADE-BLOCK count: per tile, the pair AABBs' y-extent times
    # the SHADE_W-wide block span of their x-extent (with the same
    # ROW_MARGIN expansion build_queue bakes into Queue.rows) — the exact
    # per-tile block count build_queue's occupancy test produces.
    ymin_t = jnp.min(jnp.where(covf, jnp.maximum(
        setup.min_y - ROW_MARGIN, 0)[:, None], h), axis=0)
    ymax_t = jnp.max(jnp.where(covf, jnp.minimum(
        setup.max_y + ROW_MARGIN, h)[:, None], 0), axis=0)
    xmin_t = jnp.min(jnp.where(covf, jnp.maximum(
        setup.min_x - ROW_MARGIN, 0)[:, None], w), axis=0)
    xmax_t = jnp.max(jnp.where(covf, jnp.minimum(
        setup.max_x + ROW_MARGIN, w)[:, None], 0), axis=0)
    t_lo = ((jnp.arange(nty * ntx, dtype=jnp.int32) // ntx)
            * row_stride + row_offset) * tile_h   # GLOBAL first pixel row
    rows_per_tile = jnp.clip(
        jnp.minimum(ymax_t, t_lo + tile_h) - jnp.maximum(ymin_t, t_lo),
        0, tile_h)
    spt = tile_w // SHADE_W
    tb_lo = (jnp.arange(nty * ntx, dtype=jnp.int32) % ntx) * spt
    blk_lo = jnp.maximum(xmin_t // SHADE_W, tb_lo)
    blk_hi = jnp.minimum((jnp.maximum(xmax_t, 1) - 1) // SHADE_W,
                         tb_lo + spt - 1)
    blocks_per_row = jnp.clip(blk_hi - blk_lo + 1, 0, spt)
    occ_fine = jnp.sum(rows_per_tile * blocks_per_row)
    occ_tile = jnp.sum(rows_per_tile)
    return (total_chunks, jnp.max(span_y), jnp.max(span_x),
            occ_fine, occ_tile)
