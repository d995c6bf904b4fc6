#!/usr/bin/env python
"""Forensics for a single differing pixel: replicate the oracle's scalar
per-op chain in numpy f32 from the engine's (bit-exact) transformed vertices
and compare each intermediate against the engine's vectorized value.

Usage: python tools/debug_px_forensics.py HandV 326 283
"""

import os
import sys

sys.path.insert(0, ".")
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from rustexp_tpu.app.benchmark import SCENES
from rustexp_tpu.assets import cubemap, mesh
from rustexp_tpu.raster import camera, pipeline as pp
from rustexp_tpu.ops import raster_setup, raster_xla
from rustexp_tpu.core.colors import GAMMA_11BIT_LUT

f = np.float32


def main():
    label, px, py = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    _, mesh_idx, per_pixel, _ref = next(s for s in SCENES if s[0] == label)
    m = mesh.get_mesh(mesh_idx)
    scene = pp.make_scene(m, cubemap.get_cm_set(0))
    eye = jnp.asarray(camera.camera_eye(mesh.mesh_camera(mesh_idx), 0.0))

    # Mirror render_frame's vertex stage (XLA backend path).
    vp, world, n_world = pp.transform_vertices(scene, eye, 512, 512)
    vp, world, n_world = map(np.asarray, (vp, world, n_world))
    colors_in = np.asarray(scene.colors)
    if not per_pixel:
        from rustexp_tpu.raster import shaders as sh
        colors = np.asarray(sh.shader_fn(5)(
            jnp.asarray(world), jnp.asarray(n_world),
            jnp.asarray(colors_in), eye, 0.0, scene.cm))
    else:
        colors = colors_in

    setup = raster_setup.setup_triangles(jnp.asarray(vp),
                                         scene.tris, 512, 512)
    gb = raster_xla.raster_gbuffer_xla(setup, 512, 512)
    tid = int(gb.tid[py, px])
    b = np.asarray(gb.b[py, px])
    print(f"pixel ({px},{py}): tid={tid} b={b!r}")
    tri = np.asarray(scene.tris[tid])
    i0, i1, i2 = (int(v) for v in tri)

    b0, b1, b2 = f(b[0]), f(b[1]), f(b[2])
    iw0, iw1, iw2 = f(vp[i0, 3]), f(vp[i1, 3]), f(vp[i2, 3])

    # Oracle scalar chain (oracle.cpp:1239-1261), strict per-op f32:
    w10, w20 = f(iw1 - iw0), f(iw2 - iw0)
    denom = f(f(iw0 + f(w10 * b2)) + f(w20 * b0))
    w_raster = f(f(1.0) / denom)
    print(f"scalar w_raster={w_raster!r} denom={denom!r}")

    c0, c1, c2 = colors[i0].astype(f), colors[i1].astype(f), colors[i2].astype(f)
    out_scalar = []
    for ch in range(3):
        q0 = f(c0[ch] * iw0)
        q10 = f(f(c1[ch] * iw1) - q0)
        q20 = f(f(c2[ch] * iw2) - q0)
        acc = f(f(q0 + f(q10 * b2)) + f(q20 * b0))
        out_scalar.append(f(acc * w_raster))
    print("scalar c_raster:", out_scalar)
    idx = [int(f(v * f(2047.0))) for v in out_scalar]
    print("scalar gamma idx:", idx,
          "bytes:", [int(GAMMA_11BIT_LUT[min(max(i, 0), 2047)]) for i in idx])

    # Engine vectorized equivalents for the same pixel
    c_eng = np.asarray(pp and _engine_lerp(vp, colors, tri, b))
    print("engine c_raster:", [repr(v) for v in c_eng])
    idx_e = [int(f(v) * 2047.0) for v in c_eng]
    print("engine gamma idx:", idx_e)

    # Per-channel ulp report
    for ch in range(3):
        d = np.frombuffer(np.array([out_scalar[ch]], f).tobytes(), np.int32)[0] \
            - np.frombuffer(np.array([f(c_eng[ch])], f).tobytes(), np.int32)[0]
        print(f"ch{ch}: scalar={out_scalar[ch]!r} engine={f(c_eng[ch])!r} "
              f"ulp_delta={-d}")


def _engine_lerp(vp, colors, tri, b):
    """Exactly persp_lerp_2mad under jit, for one fragment."""
    i0, i1, i2 = (int(v) for v in tri)

    @jax.jit
    def go(vp, colors, b):
        b0, b1, b2 = b[0], b[1], b[2]
        inv_w0, inv_w1, inv_w2 = vp[i0, 3], vp[i1, 3], vp[i2, 3]
        w_raster = 1.0 / (inv_w0 + (inv_w1 - inv_w0) * b2
                          + (inv_w2 - inv_w0) * b0)
        a0, a1, a2 = colors[i0], colors[i1], colors[i2]
        base = a0 * inv_w0
        d10 = a1 * inv_w1 - base
        d20 = a2 * inv_w2 - base
        return (base + d10 * b2 + d20 * b0) * w_raster

    return go(jnp.asarray(vp), jnp.asarray(colors), jnp.asarray(b))


if __name__ == "__main__":
    main()
