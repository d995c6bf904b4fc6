#!/usr/bin/env python
"""Prototype: pre-compact pair keys before the queue-build sort.

The build_queue sort handles T*m_y*m_x static keys, but only ~10-15% are
real pairs (profile_build.py: KillerooP sorts 219,006 keys, ~20k real —
546 us of the 947 us rebuild). Idea: expand (tri, cell) pairs compactly
via jnp.repeat(arange(T), cnt, total_repeat_length=P_cap) — a gather-only
cumsum+searchsorted expand, no scatters — then sort only P_cap keys.

Measures, per mesh: current sort vs repeat-expand + small sort, and
verifies the sorted real-key prefix is IDENTICAL.
Usage: python tools/proto_sortcompact.py [mesh_idx]

MEASURED VERDICT (v5e, killeroo, 2026-08-18): ALL compaction variants
lose to the plain 219k-key XLA sort (523 us):
  - repeat-expand + 24.5k sort: 1116 us (jnp.repeat lowers to a scatter,
    ~25 ns/index on TPU)
  - searchsorted-expand + sort: 3507 us (searchsorted lowers to a
    gather-per-probe while_loop)
  - lax.top_k(n=219k, k=24.5k): 521 us (XLA lowers large-k top_k via a
    full sort -- zero partial-sort advantage)
The sorted-prefix parity of every variant DID hold; the sort itself on
the compacted 24.5k keys is ~18 us. The cost is entirely in realizing
the compact key array: there is no scatter-free, gather-cheap expansion
primitive on TPU. Keep the dense-enumeration sort.
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from rustexp_tpu.assets import cubemap, mesh
from rustexp_tpu.ops import raster_queue as rq
from rustexp_tpu.ops.raster_setup import setup_triangles_planar
from rustexp_tpu.raster import camera, pipeline as pp

W = H = 512
K = 256


def main(mesh_idx=0):
    np.asarray(jnp.zeros(8))
    m = mesh.get_mesh(mesh_idx)
    scene = pp.make_scene(m, cubemap.get_cm_set(0))
    cam = mesh.mesh_camera(mesh_idx)
    ticks = np.arange(K, dtype=np.float64) / 60.0
    eyes = jnp.asarray(
        np.stack([camera.camera_eye(cam, t) for t in ticks]), jnp.float32)
    stats = [jax.device_get(pp._queue_stats_jit(scene, eyes[i], W, H))
             for i in range(0, K, K // 8)]
    agg = tuple(max(int(s[j]) for s in stats) for j in range(4))
    s_cap, m_y, m_x, t_cap = rq.suggest_queue_config(agg)
    tile_h, tile_w, chunk = rq.TILE_H, rq.TILE_W, rq.CHUNK
    nty, ntx = H // tile_h, W // tile_w
    n_tiles = nty * ntx
    T = m.num_tris
    p_cap = s_cap * chunk
    print(f"mesh {mesh_idx} T={T} m_y={m_y} m_x={m_x} "
          f"static={T*m_y*m_x} p_cap={p_cap}")

    def spans(e):
        xs, ys, zs, _, _, _ = pp.transform_corners_planar(scene, e, W, H)
        setup = setup_triangles_planar(xs, ys, zs, W, H)
        ty0, ty1, tx0, tx1 = rq.tile_ranges(setup, tile_h, tile_w)
        span_y = jnp.where(setup.valid, ty1 - ty0 + 1, 0)
        span_x = jnp.where(setup.valid, tx1 - tx0 + 1, 0)
        return setup, ty0, tx0, span_y, span_x

    big = jnp.int32(n_tiles * T)

    def keys_current(e):
        setup, ty0, tx0, span_y, span_x = spans(e)
        dy = jnp.arange(m_y, dtype=jnp.int32)
        dx = jnp.arange(m_x, dtype=jnp.int32)
        t_ty = ty0[:, None, None] + dy[None, :, None]
        t_tx = tx0[:, None, None] + dx[None, None, :]
        ok = ((dy[None, :, None] < span_y[:, None, None])
              & (dx[None, None, :] < span_x[:, None, None]))
        tile_id = t_ty * ntx + t_tx
        tri_id = jnp.arange(T, dtype=jnp.int32)[:, None, None]
        return jnp.where(ok, tile_id * T + tri_id, big).reshape(-1)

    def sort_current(e):
        return rq._sort_keys(keys_current(e), big)

    def keys_compact(e):
        setup, ty0, tx0, span_y, span_x = spans(e)
        cnt = (span_y * span_x).astype(jnp.int32)     # 0 for invalid
        base = jnp.cumsum(cnt) - cnt                  # exclusive
        n_real = base[-1] + cnt[-1]
        tri = jnp.repeat(jnp.arange(T, dtype=jnp.int32), cnt,
                         total_repeat_length=p_cap)
        j = jnp.arange(p_cap, dtype=jnp.int32)
        i = j - base[tri]
        sx = jnp.maximum(span_x[tri], 1)
        dy = i // sx
        dx = i - dy * sx
        key = ((ty0[tri] + dy) * ntx + tx0[tri] + dx) * T + tri
        key = jnp.where(j < n_real, key, big)
        return key, n_real

    def sort_compact(e):
        key, n_real = keys_compact(e)
        return jnp.sort(key), n_real

    def keys_compact_ss(e):
        """Expansion via searchsorted (gathers only, no scatter/repeat)."""
        setup, ty0, tx0, span_y, span_x = spans(e)
        cnt = (span_y * span_x).astype(jnp.int32)
        cum = jnp.cumsum(cnt)                         # inclusive
        n_real = cum[-1]
        j = jnp.arange(p_cap, dtype=jnp.int32)
        tri = jnp.searchsorted(cum, j, side="right").astype(jnp.int32)
        tri_c = jnp.minimum(tri, T - 1)
        base = cum[tri_c] - cnt[tri_c]                # exclusive at tri
        i = j - base
        sx = jnp.maximum(span_x[tri_c], 1)
        dy = i // sx
        dx = i - dy * sx
        key = ((ty0[tri_c] + dy) * ntx + tx0[tri_c] + dx) * T + tri_c
        key = jnp.where(j < n_real, key, big)
        return key, n_real

    def sort_compact_ss(e):
        key, n_real = keys_compact_ss(e)
        return jnp.sort(key), n_real

    def sort_topk(e):
        """Compaction + sort in one partial-sort: smallest p_cap keys."""
        flat = keys_current(e)
        neg, _ = jax.lax.top_k(big - flat, p_cap)
        return big - neg

    # --- parity: sorted real prefix identical ---
    e0 = eyes[7]
    a = np.asarray(jax.jit(sort_current)(e0))
    b, n_real = jax.jit(sort_compact)(e0)
    b, n_real = np.asarray(b), int(n_real)
    assert n_real <= p_cap, (n_real, p_cap)
    n_a = int(np.sum(a < int(big)))
    assert n_a == n_real, (n_a, n_real)
    assert np.array_equal(a[:n_real], b[:n_real]), "sorted prefix differs!"
    c, n_real2 = jax.jit(sort_compact_ss)(e0)
    c, n_real2 = np.asarray(c), int(n_real2)
    assert n_real2 == n_real and np.array_equal(a[:n_real], c[:n_real]), \
        "ss-expansion prefix differs!"
    d = np.asarray(jax.jit(sort_topk)(e0))
    assert np.array_equal(a[:n_real], d[:n_real]), "top_k prefix differs!"
    print(f"parity OK: n_real={n_real} identical sorted prefix (all variants)")

    def sustained(fn, label):
        @jax.jit
        def loop(eyes):
            def body(c, e):
                out = fn(e)
                s = jnp.float32(0)
                for leaf in jax.tree_util.tree_leaves(out):
                    s += jnp.sum(leaf.astype(jnp.float32))
                return c + s, None
            return jax.lax.scan(body, jnp.float32(0), eyes)[0]
        np.asarray(loop(eyes))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(loop(eyes))
            best = min(best, (time.perf_counter() - t0) / K)
        print(f"{label:<40} {best*1e6:9.1f} us", flush=True)
        return best

    t_sp = sustained(spans, "spans only (geometry)")
    t_kc = sustained(keys_current, "+ current key build")
    t_sc = sustained(sort_current, "+ current sort")
    t_ke = sustained(keys_compact, "+ compact expand keys (repeat)")
    t_se = sustained(sort_compact, "+ compact sort (repeat)")
    t_ks = sustained(keys_compact_ss, "+ compact expand keys (searchsorted)")
    t_ss = sustained(sort_compact_ss, "+ compact sort (searchsorted)")
    t_tk = sustained(sort_topk, "top_k partial-sort compaction")
    print(f"\ncurrent:  keys {1e6*(t_kc-t_sp):7.0f}  "
          f"sort {1e6*(t_sc-t_kc):7.0f}  total {1e6*(t_sc-t_sp):7.0f}")
    print(f"repeat:   keys {1e6*(t_ke-t_sp):7.0f}  "
          f"sort {1e6*(t_se-t_ke):7.0f}  total {1e6*(t_se-t_sp):7.0f}")
    print(f"ssorted:  keys {1e6*(t_ks-t_sp):7.0f}  "
          f"sort {1e6*(t_ss-t_ks):7.0f}  total {1e6*(t_ss-t_sp):7.0f}")
    print(f"top_k:    total {1e6*(t_tk-t_sp):7.0f}")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 0)
