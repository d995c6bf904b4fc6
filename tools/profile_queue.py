#!/usr/bin/env python
"""Cumulative per-stage costs of the flat-queue render path on real TPU.

Each stage is a prefix of the real pipeline, run K frames per dispatch in a
lax.scan over a (K, 3) eye array (the same methodology as app/benchmark.py:
variation flows through the data, no artificial perturbation). Successive
differences = stage costs.
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from rustexp_tpu.assets import cubemap, mesh
from rustexp_tpu.core.colors import pack_abgr32_gamma_arith
from rustexp_tpu.ops.raster_pallas import attr_channels_2mad, attr_channels_3w
from rustexp_tpu.ops.raster_queue import (
    gather_rows, pack_rows, raster_attrs_queue,
)
from rustexp_tpu.ops.raster_setup import setup_triangles_v
from rustexp_tpu.raster import camera, pipeline as pp, shaders as sh

W = H = 512
K = 128


def sustained(fn, *args, label=""):
    @jax.jit
    def loop(args):
        def body(c, e):
            out = fn(e, *args)
            s = jnp.float32(0)
            for leaf in jax.tree_util.tree_leaves(out):
                s += jnp.sum(leaf.astype(jnp.float32))
            return c + s, None
        eyes = jnp.broadcast_to(args[0], (K,) + args[0].shape) \
            if False else None
        c, _ = jax.lax.scan(body, jnp.float32(0), eyes_g)
        return c

    np.asarray(loop(args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(loop(args))
        best = min(best, (time.perf_counter() - t0) / K)
    print(f"{label:<52} {best*1e6:9.1f} us", flush=True)
    return best


def main(mesh_idx=0):
    global eyes_g
    np.asarray(jnp.zeros(8))
    m = mesh.get_mesh(mesh_idx)
    cm = cubemap.get_cm_set(0)
    scene = pp.make_scene(m, cm)
    eye = jnp.asarray(camera.camera_eye(mesh.mesh_camera(mesh_idx), 0.0))
    eyes_g = jnp.broadcast_to(eye, (K, 3))
    queue = pp.build_scene_queue(scene, eye, W, H)
    tick = jnp.float32(0.0)
    print(f"mesh {mesh_idx} T={m.num_tris} s_cap={queue.ids.shape[0]}")

    def st_transform(e):
        return pp.transform_corners(scene, e, W, H)

    def st_setup(e):
        vp_c, n_c = pp.transform_corners(scene, e, W, H)
        return setup_triangles_v(vp_c[0::3], vp_c[1::3], vp_c[2::3], W, H)

    def mk_extra(e, per_pixel):
        vp_c, n_c = pp.transform_corners(scene, e, W, H)
        v0, v1, v2 = vp_c[0::3], vp_c[1::3], vp_c[2::3]
        setup = setup_triangles_v(v0, v1, v2, W, H)
        iw0, iw1, iw2 = v0[:, 3], v1[:, 3], v2[:, 3]
        T = scene.tris.shape[0]
        ones = jnp.ones((T, 1), jnp.float32)
        c_col = scene.c_col

        def cat2(j):
            return jnp.concatenate([ones, c_col[j::3]], axis=1)

        f2 = attr_channels_2mad(iw0, iw1, iw2, cat2(0), cat2(1), cat2(2))
        if not per_pixel:
            return setup, f2, 4, 0
        f3 = attr_channels_3w(iw0, iw1, iw2, n_c[0::3], n_c[1::3], n_c[2::3])
        return setup, jnp.concatenate([f2, f3], axis=1), 4, 3

    def st_rows(e):
        setup, extra, n2, n3 = mk_extra(e, True)
        return gather_rows(queue, *pack_rows(setup, extra))

    def st_raster(e, per_pixel):
        setup, extra, n2, n3 = mk_extra(e, per_pixel)
        return raster_attrs_queue(queue, setup, extra, n2, n3, H, W)

    def st_v_full(e):
        z, mask, lin, stale = st_raster(e, False)
        wr = 1.0 / lin[0]
        c = jnp.stack([q * wr for q in lin[1:4]], axis=-1)
        packed = pack_abgr32_gamma_arith(c[..., 0], c[..., 1], c[..., 2])
        return jnp.where(mask, packed, jnp.uint32(0x40404040)), stale

    def st_p_texels(e):
        z, mask, lin, stale = st_raster(e, True)
        wr = 1.0 / lin[0]
        c = jnp.stack([q * wr for q in lin[1:4]], axis=-1)
        n = jnp.stack([q * wr for q in lin[4:7]], axis=-1)
        M = pp.inv_world_to_vp(eye, W, H)
        xs = jnp.arange(W, dtype=jnp.float32)[None, :]
        ys = jnp.arange(H, dtype=jnp.float32)[:, None]
        p = jnp.stack(
            [wr * (M[r, 0] * xs + M[r, 1] * ys + M[r, 2] * z + M[r, 3])
             for r in range(3)], axis=-1)
        nn = sh.fast_normalize(n)
        tex_n = sh.cm_texel_from_dir(nn)
        tex_r = sh.cm_texel_from_dir(sh.reflect(p - eye, nn))
        return tex_n, tex_r, c, mask, stale

    def st_p_full(e):
        z, mask, lin, stale = st_raster(e, True)
        wr = 1.0 / lin[0]
        c = jnp.stack([q * wr for q in lin[1:4]], axis=-1)
        n = jnp.stack([q * wr for q in lin[4:7]], axis=-1)
        M = pp.inv_world_to_vp(eye, W, H)
        xs = jnp.arange(W, dtype=jnp.float32)[None, :]
        ys = jnp.arange(H, dtype=jnp.float32)[:, None]
        p = jnp.stack(
            [wr * (M[r, 0] * xs + M[r, 1] * ys + M[r, 2] * z + M[r, 3])
             for r in range(3)], axis=-1)
        out = sh.shader_cm_refl(p, n, c, eye, tick, scene.cm)
        packed = pack_abgr32_gamma_arith(out[..., 0], out[..., 1], out[..., 2])
        return jnp.where(mask, packed, jnp.uint32(0x40404040)), stale

    t0 = sustained(st_transform, label="transform_corners")
    t1 = sustained(st_setup, label="+ setup_triangles_v")
    t2 = sustained(st_rows, label="+ pack/gather rows (P channels)")
    t3 = sustained(lambda e: st_raster(e, False), label="+ raster kernel V")
    t4 = sustained(lambda e: st_raster(e, True), label="+ raster kernel P")
    t5 = sustained(st_v_full, label="V full (wr,c,pack,where)")
    t6 = sustained(st_p_texels, label="P through texel indices (no gathers)")
    t7 = sustained(st_p_full, label="P full (CMRefl 2 gathers, pack)")
    print(f"\nderived: raster-V kernel {1e6*(t3-t2):.0f}  "
          f"raster-P kernel {1e6*(t4-t2):.0f}  V epilogue {1e6*(t5-t3):.0f}  "
          f"P elementwise {1e6*(t6-t4):.0f}  P gathers+combine "
          f"{1e6*(t7-t6):.0f}")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 0)
