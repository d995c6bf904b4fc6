#!/usr/bin/env python
"""Cumulative per-stage costs of the (planar) flat-queue render path.

Each stage is a prefix of the real pipeline, run K frames per dispatch in
a lax.scan over a (K, 3) eye array. Successive differences = stage costs;
the absolute floor (~25 ms tunnel RTT / K) cancels in the differences.
Usage: python tools/profile_queue.py [mesh_idx] [V|P]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from rustexp_tpu.assets import cubemap, mesh
from rustexp_tpu.ops.raster_queue import (
    gather_rows, pack_table, raster_attrs_queue,
)
from rustexp_tpu.ops.raster_setup import setup_triangles_planar
from rustexp_tpu.raster import camera, pipeline as pp

W = H = 512
K = 256


def sustained(fn, label=""):
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

    np.asarray(loop(eyes_g))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(loop(eyes_g))
        best = min(best, (time.perf_counter() - t0) / K)
    print(f"{label:<52} {best*1e6:9.1f} us", flush=True)
    return best


def main(mesh_idx=1, mode="P"):
    global eyes_g
    np.asarray(jnp.zeros(8))
    per_pixel = mode == "P"
    m = mesh.get_mesh(mesh_idx)
    cm = cubemap.get_cm_set(0)
    scene = pp.make_scene(m, cm)
    eye = jnp.asarray(camera.camera_eye(mesh.mesh_camera(mesh_idx), 0.0))
    eyes_g = jnp.broadcast_to(eye, (K, 3))
    queue = pp.build_scene_queue(scene, eye, W, H)
    print(f"mesh {mesh_idx} {mode} T={m.num_tris} s_cap={queue.ids.shape[0]} "
          f"r_cap={queue.rows.shape[0]}")
    T = scene.tris.shape[0]
    one = jnp.ones((T,), jnp.float32)
    bg = pp.background(0, W, H)
    tick = jnp.float32(0.0)

    def geometry(e):
        xs, ys, zs, iw, n_c, world_c = pp.transform_corners_planar(
            scene, e, W, H)
        setup = setup_triangles_planar(xs, ys, zs, W, H)
        cc = scene.cc3
        base_d = lambda j: [one, cc[j][0], cc[j][1], cc[j][2]]
        base = [q * iw[0] for q in base_d(0)]
        d10 = [q * iw[1] - b for q, b in zip(base_d(1), base)]
        d20 = [q * iw[2] - b for q, b in zip(base_d(2), base)]
        extra = base + d10 + d20
        n2, n3 = 4, 0
        if per_pixel:
            extra = extra + [n_c[0, k] * iw[0] for k in range(3)] \
                + [n_c[1, k] * iw[1] for k in range(3)] \
                + [n_c[2, k] * iw[2] for k in range(3)]
            n3 = 3
        return setup, tuple(extra), n2, n3

    def st_geo(e):
        setup, extra, n2, n3 = geometry(e)
        return setup, extra

    def st_rows(e):
        setup, extra, n2, n3 = geometry(e)
        return gather_rows(queue, pack_table(setup, list(extra)))

    def st_raster(e):
        setup, extra, n2, n3 = geometry(e)
        return raster_attrs_queue(queue, setup, extra, n2, n3, H, W)

    def st_full(e):
        fb, stale = pp.raster_and_shade_queue(
            scene, queue, None if per_pixel else scene.colors, e, tick,
            w=W, h=H, per_pixel=per_pixel, shader_idx=5, bg_fb=bg)
        return fb

    t0 = sustained(st_geo, "geometry (transform+setup+channels)")
    t1 = sustained(st_rows, "+ pack_table + gather_rows")
    t2 = sustained(st_raster, "+ raster kernel")
    t3 = sustained(st_full, "full (shade + pack)")
    print(f"\nderived: rows {1e6*(t1-t0):.0f}  kernel {1e6*(t2-t1):.0f}  "
          f"shade {1e6*(t3-t2):.0f}")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1,
         sys.argv[2] if len(sys.argv) > 2 else "P")
