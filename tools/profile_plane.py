#!/usr/bin/env python
"""Per-stage cost of the round-5 PLANE-ORDERED queue rebuild.

Same method as profile_build.py (cumulative prefixes, each sustained K
frames per jitted scan over real orbit eyes; successive differences =
stage costs), but for build_queue(order="plane") — the production
moving-camera path for dense meshes — plus the full moving-frame body
so the build/render split is measured, not inferred.

Stages (cumulative):
  geo     transform_corners_planar + setup_triangles_planar
  keys    tile_ranges + (base, class, tri) group key construction
  sort    _sort_keys of T keys
  hist    one-hot [*,T]@[T,*] group histogram + cumsum bounds
  runs    static run table -> per-tile run_len/run_start/counts
  cov     [T, nT] coverage matrix + per-tile y extents
  layout  chunk layout scalars (tile_of / k_of / cnt / scal)
  slots   run-membership one-hot matvec -> slot triangle ids
  build   full build_queue (adds rows list + Queue assembly)
  frame   full moving body: build + render_frame(queue)

Usage: python tools/profile_plane.py [mesh_idx] [K] [per_pixel]
"""

from __future__ import annotations

import os
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


def main(mesh_idx=0, K=256, per_pixel=True):
    np.asarray(jnp.zeros(8))
    m = mesh.get_mesh(mesh_idx)
    scene = pp.make_scene(m, cubemap.get_cm_set(0))
    cam = mesh.mesh_camera(mesh_idx)
    ticks = np.arange(K, dtype=np.float64) / 60.0
    eyes = jnp.asarray(
        np.stack([camera.camera_eye(cam, t) for t in ticks]), jnp.float32)

    stats = [jax.device_get(pp._queue_stats_jit(scene, eyes[i], W, H))
             for i in range(0, K, max(1, K // 8))]
    agg = tuple(max(int(s[j]) for s in stats) for j in range(5))
    shade_w = rq.choose_shade_w(agg[3], agg[4], rebuild_per_frame=True,
                                per_pixel=per_pixel)
    occ = agg[3] if shade_w == rq.SHADE_W else agg[4]
    s_cap, m_y, m_x, t_cap = rq.suggest_queue_config(agg[:3] + (occ,))
    T = m.num_tris
    print(f"mesh {mesh_idx} T={T} s_cap={s_cap} m_y={m_y} m_x={m_x} "
          f"t_cap={t_cap} shade_w={shade_w}")

    tile_h, tile_w, chunk = rq.TILE_H, rq.TILE_W, rq.CHUNK
    nty, ntx = H // tile_h, W // tile_w
    n_tiles = nty * ntx
    C = m_y * m_x
    big = jnp.int32(n_tiles * C * T)

    def geo(e):
        xs, ys, zs, _, _, _ = pp.transform_corners_planar(scene, e, W, H)
        return setup_triangles_planar(xs, ys, zs, W, H)

    def keys(e):
        setup = geo(e)
        ty0, ty1, tx0, tx1 = rq.tile_ranges(setup, tile_h, tile_w)
        sy = jnp.clip(ty1 - ty0 + 1, 1, m_y)
        sx = jnp.clip(tx1 - tx0 + 1, 1, m_x)
        cls = (sy - 1) * m_x + (sx - 1)
        group = (ty0 * ntx + tx0) * C + cls
        tri = jnp.arange(T, dtype=jnp.int32)
        flat = jnp.where(setup.valid, group * T + tri, big)
        return setup, flat, (ty0, ty1, tx0, tx1, sy, sx)

    def sort_st(e):
        setup, flat, rng = keys(e)
        return setup, rq._sort_keys(flat, big), rng

    def hist_st(e):
        setup, skey, rng = sort_st(e)
        ty0, ty1, tx0, tx1, sy, sx = rng
        uy = ((ty0[:, None] == jnp.arange(nty, dtype=jnp.int32)[None, :])
              & setup.valid[:, None])
        usy = sy[:, None] == jnp.arange(1, m_y + 1, dtype=jnp.int32)[None, :]
        ux = tx0[:, None] == jnp.arange(ntx, dtype=jnp.int32)[None, :]
        usx = sx[:, None] == jnp.arange(1, m_x + 1, dtype=jnp.int32)[None, :]
        U = (uy[:, :, None] & usy[:, None, :]).reshape(T, nty * m_y)
        V = (ux[:, :, None] & usx[:, None, :]).reshape(T, ntx * m_x)
        cnt_yx = jnp.einsum("ta,tb->ab", U.astype(jnp.float32),
                            V.astype(jnp.float32))
        glen = (cnt_yx.reshape(nty, m_y, ntx, m_x)
                .transpose(0, 2, 1, 3).reshape(-1).astype(jnp.int32))
        gbounds = jnp.concatenate([
            jnp.zeros((1,), jnp.int32), jnp.cumsum(glen)])
        return setup, skey, rng, glen, gbounds

    def runs_st(e):
        # Mirrors build_queue's shift-based run tables (no gathers).
        setup, skey, rng, glen, gbounds = hist_st(e)
        g3 = glen.reshape(nty, ntx, C)
        gb3 = gbounds[:-1].reshape(nty, ntx, C)

        def _shifted(img, dy, dx, cls_list):
            pad = jnp.pad(img[:, :, jnp.asarray(cls_list)],
                          ((dy, 1), (dx, 0), (0, 0)))
            win = jax.lax.dynamic_slice(
                pad, (jnp.int32(0), jnp.int32(0), jnp.int32(0)),
                (nty, ntx, len(cls_list)))
            return win

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
        return setup, skey, rng, run_len, run_start, counts

    def cov_st(e):
        setup, skey, rng, run_len, run_start, counts = runs_st(e)
        ty0, ty1, tx0, tx1 = rng[:4]
        ty_ar = jnp.arange(nty, dtype=jnp.int32)
        tx_ar = jnp.arange(ntx, dtype=jnp.int32)
        cov_y = (ty_ar[None, :] >= ty0[:, None]) \
            & (ty_ar[None, :] <= ty1[:, None])
        cov_x = (tx_ar[None, :] >= tx0[:, None]) \
            & (tx_ar[None, :] <= tx1[:, None])
        cov = (cov_y[:, :, None] & cov_x[:, None, :]
               & setup.valid[:, None, None]).reshape(T, n_tiles)
        ymin_tri = jnp.maximum(setup.min_y - rq.ROW_MARGIN, 0)
        ymax_tri = jnp.minimum(setup.max_y + rq.ROW_MARGIN, H)
        ymin_t = jnp.min(jnp.where(cov, ymin_tri[:, None], H), axis=0)
        ymax_t = jnp.max(jnp.where(cov, ymax_tri[:, None], 0), axis=0)
        return (setup, skey, rng, run_len, run_start, counts,
                ymin_t, ymax_t)

    def layout_st(e):
        (setup, skey, rng, run_len, run_start, counts,
         ymin_t, ymax_t) = cov_st(e)
        import jax.experimental.pallas as pl
        cpt = pl.cdiv(counts, chunk)
        starts = jnp.cumsum(cpt) - cpt
        cs = jnp.arange(s_cap, dtype=jnp.int32)
        in_tile = (cs[None, :] >= starts[:, None]) \
            & (cs[None, :] < (starts + cpt)[:, None])
        tile_of = jnp.argmax(in_tile, axis=0).astype(jnp.int32)
        chunk_live = jnp.any(in_tile, axis=0)
        k_of = cs - starts[tile_of]
        first = (chunk_live & (k_of == 0)) | ~chunk_live
        cnt = jnp.clip(counts[tile_of] - k_of * chunk, 0, chunk)
        cnt = jnp.where(chunk_live, cnt, 0)
        ty = jnp.where(chunk_live, tile_of // ntx, nty)
        tx = jnp.where(chunk_live, tile_of % ntx, 0)
        scal = jnp.stack([ty, tx, first.astype(jnp.int32), cnt, ty], axis=1)
        return (skey, run_len, run_start, tile_of, k_of, cnt, scal,
                ymin_t, ymax_t)

    def slots_st(e):
        (skey, run_len, run_start, tile_of, k_of, cnt, scal,
         ymin_t, ymax_t) = layout_st(e)
        stri = skey % T
        slot_ok = jnp.arange(chunk, dtype=jnp.int32)[None, :] < cnt[:, None]
        kk = k_of[:, None] * chunk + jnp.arange(
            chunk, dtype=jnp.int32)[None, :]
        rlen_t = run_len[tile_of]
        rinc_t = jnp.cumsum(rlen_t, axis=1)
        rexc_t = rinc_t - rlen_t
        onehot = ((rexc_t[:, None, :] <= kk[:, :, None])
                  & (kk[:, :, None] < rinc_t[:, None, :]))
        b = (run_start[tile_of] - rexc_t).astype(jnp.float32)
        pos = jnp.einsum("skr,sr->sk", onehot.astype(jnp.float32),
                         b).astype(jnp.int32) + kk
        src = stri[jnp.clip(pos, 0, T - 1).reshape(-1)]
        ids = jnp.where(slot_ok, src.reshape(s_cap, chunk), -1)
        return ids, scal, ymin_t, ymax_t

    ORDER = os.environ.get("FORCE_ORDER", "auto")

    def build(e):
        setup = geo(e)
        return rq.build_queue(setup, H, W, s_cap=s_cap, m_y=m_y, m_x=m_x,
                              t_cap=t_cap, order=ORDER, shade_w=shade_w)

    def frame(e):
        setup = geo(e)
        q = rq.build_queue(setup, H, W, s_cap=s_cap, m_y=m_y, m_x=m_x,
                           t_cap=t_cap, order=ORDER, shade_w=shade_w)
        fb, ov = pp.render_frame(
            scene, e, 0.0, w=W, h=H, mode=pp.MODE_FILL,
            per_pixel=per_pixel, shader_idx=5, bg_idx=0, show_cm=False,
            backend="queue", raster_queue=q, return_overflow=True)
        return fb

    def fixed_frame(e):
        # Reference point: render with a PREBUILT queue (the fixed-eye
        # suite's shape) so frame - fixed = geo + build exactly.
        fb, ov = pp.render_frame(
            scene, e, 0.0, w=W, h=H, mode=pp.MODE_FILL,
            per_pixel=per_pixel, shader_idx=5, bg_idx=0, show_cm=False,
            backend="queue", raster_queue=prebuilt, return_overflow=True)
        return fb

    prebuilt = jax.jit(build)(eyes[0])

    def sustained(fn, label):
        @jax.jit
        def loop(eyes):
            def body(c, e):
                out = fn(e)
                s = jnp.float32(0)
                for leaf in jax.tree_util.tree_leaves(out):
                    if hasattr(leaf, "astype"):
                        s += jnp.sum(leaf.astype(jnp.float32))
                return c + s, None
            c, _ = jax.lax.scan(body, jnp.float32(0), eyes)
            return c
        np.asarray(loop(eyes))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(loop(eyes))
            best = min(best, (time.perf_counter() - t0) / K)
        print(f"{label:8s} {best*1e6:8.1f} us/frame", flush=True)
        return best * 1e6

    all_stages = [("geo", geo), ("keys", keys), ("sort", sort_st),
                  ("hist", hist_st), ("runs", runs_st), ("cov", cov_st),
                  ("layout", layout_st), ("slots", slots_st),
                  ("build", build), ("frame", frame),
                  ("fixed", fixed_frame)]
    only = os.environ.get("STAGES")
    if only:
        keep = set(only.split(","))
        all_stages = [(l, f) for l, f in all_stages if l in keep]
    ts = {}
    for label, fn in all_stages:
        ts[label] = sustained(fn, label)
    if only:
        return

    print("\nstage deltas (us):")
    order = ["geo", "keys", "sort", "hist", "runs", "cov", "layout",
             "slots", "build"]
    prev = 0.0
    for label in order:
        print(f"  {label:8s} {ts[label]-prev:8.1f}")
        prev = ts[label]
    print(f"  render   {ts['frame']-ts['build']:8.1f}  (frame - build)")
    print(f"  fixed    {ts['fixed']:8.1f}  (prebuilt-queue frame)")
    print(f"  overhead {ts['frame']-ts['fixed']:8.1f}  (moving - fixed)")


if __name__ == "__main__":
    mesh_idx = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    pp_flag = (sys.argv[3] != "0") if len(sys.argv) > 3 else True
    main(mesh_idx, K, pp_flag)
