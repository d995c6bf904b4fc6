#!/usr/bin/env python
"""Validate: are [N, 4]-shaped arrays the reason transform/setup/row-gather
cost ~1.2 ms? Measure planar [4, N] equivalents on the real TPU."""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from rustexp_tpu.assets import cubemap, mesh
from rustexp_tpu.ops.raster_setup import setup_triangles_v
from rustexp_tpu.raster import camera, pipeline as pp

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


np.asarray(jnp.zeros(8))
m = mesh.get_mesh(0)
scene = pp.make_scene(m, cubemap.get_cm_set(0))
eye = jnp.asarray(camera.camera_eye(mesh.mesh_camera(0), 0.0))
eyes_g = jnp.broadcast_to(eye, (K, 3))

# planar corner data [4, 3T] homogeneous
cp = jnp.concatenate(
    [scene.c_pos, jnp.ones((scene.c_pos.shape[0], 1), jnp.float32)],
    axis=1).T  # [4, 3T]
cn = scene.c_nrm.T  # [3, 3T]
T = scene.tris.shape[0]
print(f"T={T} corners={cp.shape[1]}")


def world_to_vp_mat(e):
    return (pp.viewport_matrix(W, H) @ pp.perspective(45.0, W / H, 0.1, 10.0)
            @ pp.look_at(e, jnp.zeros(3, jnp.float32),
                         jnp.array([0.0, 1.0, 0.0])))


def xf_planar(e, cp, cn, it33, ndim):
    M = world_to_vp_mat(e) @ ndim  # mesh -> viewport directly [4,4]
    clip = M @ cp                  # [4, 3T]
    iw = 1.0 / clip[3]
    xs, ys, zs = clip[0] * iw, clip[1] * iw, clip[2] * iw
    n = it33 @ cn                  # [3, 3T]
    return xs, ys, zs, iw, n


def setup_planar(xs, ys, zs):
    def c3(v):
        return v[0::3].reshape(1, -1), v[1::3], v[2::3]

    x0 = (xs[0::3] * 16.0).astype(jnp.int32)
    y0 = (ys[0::3] * 16.0).astype(jnp.int32)
    x1 = (xs[1::3] * 16.0).astype(jnp.int32)
    y1 = (ys[1::3] * 16.0).astype(jnp.int32)
    x2 = (xs[2::3] * 16.0).astype(jnp.int32)
    y2 = (ys[2::3] * 16.0).astype(jnp.int32)
    dx10, dy01 = x1 - x0, y0 - y1
    dx21, dy12 = x2 - x1, y1 - y2
    dx02, dy20 = x0 - x2, y2 - y0
    area2 = (x1 - x0) * (y2 - y0) - (y1 - y0) * (x2 - x0)
    front = area2 > 0
    inv_a2 = jnp.where(front,
                       1.0 / jnp.maximum(area2, 1).astype(jnp.float32), 0.0)

    def fill_bias(dy, dx):
        return jnp.where((dy > 0) | ((dy == 0) & (dx > 0)), 1, 0)

    C0 = x0 * y1 - y0 * x1 + fill_bias(dy01, dx10) + 1
    C1 = x1 * y2 - y1 * x2 + fill_bias(dy12, dx21) + 1
    C2 = x2 * y0 - y2 * x0 + fill_bias(dy20, dx02) + 1
    mnx = jnp.maximum((jnp.minimum(x0, jnp.minimum(x1, x2)) + 0xF) >> 4, 0)
    mny = jnp.maximum((jnp.minimum(y0, jnp.minimum(y1, y2)) + 0xF) >> 4, 0)
    mxx = jnp.minimum((jnp.maximum(x0, jnp.maximum(x1, x2)) + 0xF) >> 4, W)
    mxy = jnp.minimum((jnp.maximum(y0, jnp.maximum(y1, y2)) + 0xF) >> 4, H)
    valid = front & (mxx > mnx) & (mxy > mny)
    z0 = zs[0::3]
    return (dy01, dy12, dy20, dx10, dx21, dx02, C0, C1, C2, inv_a2,
            z0, zs[1::3] - z0, zs[2::3] - z0, mnx, mny, mxx, mxy, valid)


def st_xf(e, cp, cn):
    return xf_planar(e, cp, cn, scene.it33, scene.ndim)


def st_setup(e, cp, cn):
    xs, ys, zs, iw, n = xf_planar(e, cp, cn, scene.it33, scene.ndim)
    return setup_planar(xs, ys, zs)


def st_stack(e, cp, cn):
    xs, ys, zs, iw, n = xf_planar(e, cp, cn, scene.it33, scene.ndim)
    su = setup_planar(xs, ys, zs)
    chans = [c.astype(jnp.float32) if c.dtype != jnp.float32 else c
             for c in su[:17]]
    # plus 12 P attr channels stand-ins
    chans += [xs[0::3] * float(i) for i in range(12)]
    tab = jnp.stack(chans, axis=0)      # [29, T]
    return tab.T                        # [T, 29]


ids = jnp.asarray(
    np.random.default_rng(0).integers(0, T, 244 * 128), jnp.int32)


def st_gather(e, cp, cn, ids):
    tabT = st_stack(e, cp, cn)
    return tabT[ids]


# current path for comparison
def cur_xf(e):
    return pp.transform_corners(scene, e, W, H)


def cur_setup(e):
    vp_c, n_c = pp.transform_corners(scene, e, W, H)
    return setup_triangles_v(vp_c[0::3], vp_c[1::3], vp_c[2::3], W, H)


sustained(cur_xf, label="CURRENT transform_corners")
sustained(cur_setup, label="CURRENT + setup")
sustained(st_xf, cp, cn, label="planar transform")
sustained(st_setup, cp, cn, label="planar + setup")
sustained(st_stack, cp, cn, label="planar + setup + stack + transpose")
sustained(st_gather, cp, cn, ids, label="planar + ... + row gather [31232,29]")


# corner-major layout [3, 4, T]: no strided slices anywhere
cp3 = jnp.stack([cp[:, 0::3], cp[:, 1::3], cp[:, 2::3]], axis=0)  # [3,4,T]
cn3 = jnp.stack([cn[:, 0::3], cn[:, 1::3], cn[:, 2::3]], axis=0)  # [3,3,T]


def xf_cm(e, cp3, cn3):
    M = world_to_vp_mat(e) @ scene.ndim
    clip = jnp.einsum("ab,jbt->jat", M, cp3)   # [3,4,T]
    iw = 1.0 / clip[:, 3]                      # [3,T]
    xs = clip[:, 0] * iw
    ys = clip[:, 1] * iw
    zs = clip[:, 2] * iw
    n = jnp.einsum("ab,jbt->jat", scene.it33, cn3)
    return xs, ys, zs, iw, n


def setup_cm(xs, ys, zs):
    xi = (xs * 16.0).astype(jnp.int32)
    yi = (ys * 16.0).astype(jnp.int32)
    x0, x1, x2 = xi[0], xi[1], xi[2]
    y0, y1, y2 = yi[0], yi[1], yi[2]
    dx10, dy01 = x1 - x0, y0 - y1
    dx21, dy12 = x2 - x1, y1 - y2
    dx02, dy20 = x0 - x2, y2 - y0
    area2 = (x1 - x0) * (y2 - y0) - (y1 - y0) * (x2 - x0)
    front = area2 > 0
    inv_a2 = jnp.where(front,
                       1.0 / jnp.maximum(area2, 1).astype(jnp.float32), 0.0)

    def fill_bias(dy, dx):
        return jnp.where((dy > 0) | ((dy == 0) & (dx > 0)), 1, 0)

    C0 = x0 * y1 - y0 * x1 + fill_bias(dy01, dx10) + 1
    C1 = x1 * y2 - y1 * x2 + fill_bias(dy12, dx21) + 1
    C2 = x2 * y0 - y2 * x0 + fill_bias(dy20, dx02) + 1
    mnx = jnp.maximum((jnp.minimum(x0, jnp.minimum(x1, x2)) + 0xF) >> 4, 0)
    mny = jnp.maximum((jnp.minimum(y0, jnp.minimum(y1, y2)) + 0xF) >> 4, 0)
    mxx = jnp.minimum((jnp.maximum(x0, jnp.maximum(x1, x2)) + 0xF) >> 4, W)
    mxy = jnp.minimum((jnp.maximum(y0, jnp.maximum(y1, y2)) + 0xF) >> 4, H)
    valid = front & (mxx > mnx) & (mxy > mny)
    z0 = zs[0]
    return (dy01, dy12, dy20, dx10, dx21, dx02, C0, C1, C2, inv_a2,
            z0, zs[1] - z0, zs[2] - z0, mnx, mny, mxx, mxy, valid)


def st_xf_cm(e, cp3, cn3):
    return xf_cm(e, cp3, cn3)


def st_setup_cm(e, cp3, cn3):
    xs, ys, zs, iw, n = xf_cm(e, cp3, cn3)
    return setup_cm(xs, ys, zs)


def st_stack_cm(e, cp3, cn3):
    xs, ys, zs, iw, n = xf_cm(e, cp3, cn3)
    su = setup_cm(xs, ys, zs)
    chans = [c.astype(jnp.float32) if c.dtype != jnp.float32 else c
             for c in su[:17]]
    chans += [xs[0] * float(i) for i in range(12)]
    tab = jnp.stack(chans, axis=0)
    return tab.T


def st_gather_cm(e, cp3, cn3, ids):
    tabT = st_stack_cm(e, cp3, cn3)
    return tabT[ids]


def st_empty(e, cp3, cn3):
    return e * 2.0


sustained(st_empty, cp3, cn3, label="empty body (scan overhead)")
sustained(st_xf_cm, cp3, cn3, label="corner-major transform")
sustained(st_setup_cm, cp3, cn3, label="corner-major + setup")
sustained(st_stack_cm, cp3, cn3, label="corner-major + stack + transpose")
sustained(st_gather_cm, cp3, cn3, ids, label="corner-major + row gather")
