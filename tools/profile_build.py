#!/usr/bin/env python
"""Per-stage cost of the in-graph queue REBUILD (moving-camera path).

Cumulative prefixes of build_queue's internal stages, each run K frames
per jitted scan over real orbit eyes (so nothing hoists); successive
differences = stage costs. Targets the moving-camera suite's dominant
term (BASELINE.md round-4: rebuild ~= +1.0-1.5 ms/frame on dense meshes).
Usage: python tools/profile_build.py [mesh_idx] [K]

MEASURED (v5e, 2026-08-18), killeroo (T=24334, s_cap=192, m3x3,
948 us full build): geometry 131 | keys 3 | SORT 547 | bounds 27 |
layout 4 | SLOT GATHER 163 | rows/cov 73.
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


def main(mesh_idx=0, K=256):
    np.asarray(jnp.zeros(8))
    m = mesh.get_mesh(mesh_idx)
    scene = pp.make_scene(m, cubemap.get_cm_set(0))
    cam = mesh.mesh_camera(mesh_idx)
    ticks = np.arange(K, dtype=np.float64) / 60.0
    eyes = jnp.asarray(
        np.stack([camera.camera_eye(cam, t) for t in ticks]), jnp.float32)

    stats = [jax.device_get(pp._queue_stats_jit(scene, eyes[i], W, H))
             for i in range(0, K, max(1, K // 8))]
    agg = tuple(max(int(s[j]) for s in stats) for j in range(4))
    s_cap, m_y, m_x, t_cap = rq.suggest_queue_config(agg)
    print(f"mesh {mesh_idx} T={m.num_tris} s_cap={s_cap} m_y={m_y} "
          f"m_x={m_x} t_cap={t_cap} pairs_static={m.num_tris*m_y*m_x}")

    tile_h, tile_w, chunk = rq.TILE_H, rq.TILE_W, rq.CHUNK
    nty, ntx = H // tile_h, W // tile_w
    n_tiles = nty * ntx

    def geo(e):
        xs, ys, zs, _, _, _ = pp.transform_corners_planar(scene, e, W, H)
        return setup_triangles_planar(xs, ys, zs, W, H)

    def keys(e):
        setup = geo(e)
        T = setup.valid.shape[0]
        ty0, ty1, tx0, tx1 = rq.tile_ranges(setup, tile_h, tile_w)
        span_y = ty1 - ty0 + 1
        span_x = tx1 - tx0 + 1
        dy = jnp.arange(m_y, dtype=jnp.int32)
        dx = jnp.arange(m_x, dtype=jnp.int32)
        t_ty = ty0[:, None, None] + dy[None, :, None]
        t_tx = tx0[:, None, None] + dx[None, None, :]
        ok = (setup.valid[:, None, None]
              & (dy[None, :, None] < span_y[:, None, None])
              & (dx[None, None, :] < span_x[:, None, None]))
        tile_id = t_ty * ntx + t_tx
        tri_id = jnp.broadcast_to(
            jnp.arange(T, dtype=jnp.int32)[:, None, None], tile_id.shape)
        big = jnp.int32(n_tiles * T)
        flat = jnp.where(ok, tile_id * T + tri_id, big).reshape(-1)
        return setup, flat, big, (ty0, ty1, tx0, tx1)

    def sorted_keys(e):
        setup, flat, big, rng = keys(e)
        return setup, rq._sort_keys(flat, big), rng

    def bounds_st(e):
        setup, skey, rng = sorted_keys(e)
        T = setup.valid.shape[0]
        bounds = jnp.searchsorted(
            skey, jnp.arange(n_tiles + 1, dtype=jnp.int32) * T
        ).astype(jnp.int32)
        return setup, skey, bounds

    def layout_st(e):
        setup, skey, bounds = bounds_st(e)
        counts = bounds[1:] - bounds[:-1]
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
        scal = jnp.stack([ty, tx, first.astype(jnp.int32), cnt], axis=1)
        return setup, skey, bounds, scal, tile_of, k_of, cnt

    def slots_st(e):
        setup, skey, bounds, scal, tile_of, k_of, cnt = layout_st(e)
        T = setup.valid.shape[0]
        pos = (bounds[tile_of] + k_of * chunk)[:, None] \
            + jnp.arange(chunk, dtype=jnp.int32)[None, :]
        slot_ok = jnp.arange(chunk, dtype=jnp.int32)[None, :] < cnt[:, None]
        src = skey[jnp.clip(pos, 0, skey.shape[0] - 1).reshape(-1)]
        ids = jnp.where(slot_ok, src.reshape(s_cap, chunk) % T,
                        -1).astype(jnp.int32)
        return scal, ids

    def full(e):
        setup = geo(e)
        return rq.build_queue(setup, H, W, s_cap=s_cap, m_y=m_y, m_x=m_x,
                              t_cap=t_cap)

    def sustained(fn, label):
        @jax.jit
        def loop(eyes):
            def body(c, e):
                out = fn(e)
                s = jnp.float32(0)
                for leaf in jax.tree_util.tree_leaves(out):
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
        print(f"{label:<44} {best*1e6:9.1f} us", flush=True)
        return best

    t_geo = sustained(geo, "geometry (transform+setup)")
    t_key = sustained(keys, "+ pair key construction")
    t_srt = sustained(sorted_keys, "+ key sort")
    t_bnd = sustained(bounds_st, "+ tile bounds searchsorted")
    t_lay = sustained(layout_st, "+ chunk layout")
    t_slt = sustained(slots_st, "+ slot gather (ids)")
    t_all = sustained(full, "full build_queue (incl rows/cov)")
    print(f"\nderived: keys {1e6*(t_key-t_geo):.0f}  "
          f"sort {1e6*(t_srt-t_key):.0f}  "
          f"bounds {1e6*(t_bnd-t_srt):.0f}  "
          f"layout {1e6*(t_lay-t_bnd):.0f}  "
          f"slots {1e6*(t_slt-t_lay):.0f}  "
          f"rows/cov {1e6*(t_all-t_slt):.0f}")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 0,
         int(sys.argv[2]) if len(sys.argv) > 2 else 256)
