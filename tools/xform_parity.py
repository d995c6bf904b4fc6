#!/usr/bin/env python
"""Ulp-parity lab for the planar vertex transform (VERDICT r3 next-6).

Compares the engine's transform_corners_planar outputs against the oracle's
scalar transform_vertices (strict IEEE f32, the reference's nalgebra
accumulation order, rasterizer.rs:1180-1230) per corner, in bits — and
prototypes a fixed-order contraction that reproduces the scalar order
inside XLA. Run on CPU from the repo root:

    JAX_PLATFORMS=cpu python tools/xform_parity.py [mesh_idx ...]
"""

from __future__ import annotations

import os
import subprocess
import sys

sys.path.insert(0, ".")
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu"

import jax.numpy as jnp

from rustexp_tpu.assets import cubemap, mesh, paths
from rustexp_tpu.raster import camera, pipeline as pp

ORACLE = os.path.join("tools", "ref_oracle", "oracle")
W = H = 512


def mm_exact(a, b):
    """Fixed-order 4x4 @ 4x4 matching the oracle's m4_mul: per entry,
    s = a[i,0]*b[0,j]; s += a[i,1]*b[1,j]; ... (oracle.cpp m4_mul)."""
    s = a[:, 0:1] * b[0:1, :]
    s = s + a[:, 1:2] * b[1:2, :]
    s = s + a[:, 2:3] * b[2:3, :]
    s = s + a[:, 3:4] * b[3:4, :]
    return s


def mv_exact(m4, v):
    """Fixed-order [4,4] x [4,T] matching m4_mul_v4's per-row order."""
    s = m4[:, 0:1] * v[0:1]
    s = s + m4[:, 1:2] * v[1:2]
    s = s + m4[:, 2:3] * v[2:3]
    s = s + m4[:, 3:4] * v[3:4]
    return s


def dot3(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def cross3(a, b):
    return jnp.stack([a[1] * b[2] - a[2] * b[1],
                      a[2] * b[0] - a[0] * b[2],
                      a[0] * b[1] - a[1] * b[0]])


def norm3(a):
    return a / jnp.sqrt(dot3(a, a))


def look_at_exact(eye, at, up):
    """Scalar-order look_at matching the oracle (rasterizer.rs:1236-1245):
    division-form normalize, left-to-right dot, dot(-eye, axis) column."""
    z = norm3(eye - at)
    x = norm3(cross3(up, z))
    y = cross3(z, x)
    ne = -eye
    return jnp.stack([
        jnp.stack([x[0], x[1], x[2], dot3(ne, x)]),
        jnp.stack([y[0], y[1], y[2], dot3(ne, y)]),
        jnp.stack([z[0], z[1], z[2], dot3(ne, z)]),
        jnp.array([0.0, 0.0, 0.0, 1.0], jnp.float32),
    ])


def transform_exact(scene, eye, w, h):
    """Prototype: transform_corners_planar with scalar-order contraction."""
    world_to_vp = mm_exact(
        mm_exact(pp.viewport_matrix(w, h),
                 pp.perspective(45.0, w / h, 0.1, 10.0)),
        look_at_exact(eye, jnp.zeros(3, jnp.float32),
                      jnp.array([0.0, 1.0, 0.0])))
    world = jnp.stack([mv_exact(scene.ndim, scene.cp3[j]) for j in range(3)])
    clip = jnp.stack([mv_exact(world_to_vp, world[j]) for j in range(3)])
    iw = 1.0 / clip[:, 3]
    xs = clip[:, 0] * iw
    ys = clip[:, 1] * iw
    zs = clip[:, 2] * iw
    return xs, ys, zs, iw, world[:, :3]


def bits(a):
    return np.asarray(a, np.float32).view(np.uint32)


def report(tag, eng, orc_field, tris):
    """eng [3,T]; orc_field [Nv]; corner j of tri t is vertex tris[t, j]."""
    o = np.stack([orc_field[tris[:, j]] for j in range(3)])
    d = (bits(eng) != bits(o)).sum()
    ulp = np.abs(bits(eng).astype(np.int64) - bits(o).astype(np.int64))
    print(f"  {tag:8s} mismatched corners {d:7d} / {o.size}   "
          f"max ulp {ulp.max()}")
    return int(d)


def main():
    mesh_indices = [int(a) for a in sys.argv[1:]] or [0, 4, 6, 9]
    subprocess.run(["make", "-C", os.path.dirname(ORACLE)], check=True,
                   capture_output=True)
    ref_root = paths.asset_root()
    for mi in mesh_indices:
        m = mesh.get_mesh(mi)
        scene = pp.make_scene(m, cubemap.get_cm_set(0))
        eye = jnp.asarray(camera.camera_eye(mesh.mesh_camera(mi), 0.0))
        out = f"/tmp/xf_{mi}.raw"
        subprocess.run([ORACLE, "xform", ref_root, str(mi), "0.0",
                        str(W), str(H), out], check=True)
        raw = np.fromfile(out, np.float32)
        orc_ndim = raw[:16].reshape(4, 4)
        orc_wvp = raw[16:32].reshape(4, 4)
        orc_eye = raw[32:35]
        orc = raw[36:].reshape(-1, 8)
        tris = np.asarray(scene.tris)

        # matrix-level parity first
        eng_ndim = np.asarray(scene.ndim)
        print(f"mesh {mi}: ndim bit-equal: "
              f"{bool((bits(eng_ndim) == bits(orc_ndim)).all())}")
        print(f"  eye bit-equal: "
              f"{bool((bits(np.asarray(eye)) == bits(orc_eye)).all())}  "
              f"eng {np.asarray(eye)!r} orc {orc_eye!r}")
        for tag, f in (("einsum-chain", lambda e: (
                pp.viewport_matrix(W, H)
                @ pp.perspective(45.0, W / H, 0.1, 10.0)
                @ pp.look_at(e, jnp.zeros(3, jnp.float32),
                             jnp.array([0.0, 1.0, 0.0])))),
                       ("fixed-order", lambda e: mm_exact(
                mm_exact(pp.viewport_matrix(W, H),
                         pp.perspective(45.0, W / H, 0.1, 10.0)),
                look_at_exact(e, jnp.zeros(3, jnp.float32),
                              jnp.array([0.0, 1.0, 0.0]))))):
            wvp = np.asarray(jax.jit(f)(eye))
            eq = bits(wvp) == bits(orc_wvp)
            print(f"  world_to_vp [{tag}] bit-equal: {bool(eq.all())}"
                  + ("" if eq.all() else f"  ({16 - eq.sum()} entries off, "
                     f"max ulp "
                     f"{np.abs(bits(wvp).astype(np.int64) - bits(orc_wvp).astype(np.int64)).max()})"))

        xs, ys, zs, iw, _n, _w = jax.jit(
            lambda s, e: pp.transform_corners_planar(s, e, W, H))(scene, eye)
        print(f"mesh {mi} ({m.name}), {orc.shape[0]} verts — CURRENT einsum:")
        t = 0
        for tag, eng, col in (("vp.x", xs, 0), ("vp.y", ys, 1),
                              ("vp.z", zs, 2), ("inv_w", iw, 3)):
            t += report(tag, eng, orc[:, col], tris)

        xs2, ys2, zs2, iw2, _ = jax.jit(
            lambda s, e: transform_exact(s, e, W, H))(scene, eye)
        print(f"mesh {mi} — FIXED-ORDER prototype:")
        t2 = 0
        for tag, eng, col in (("vp.x", xs2, 0), ("vp.y", ys2, 1),
                              ("vp.z", zs2, 2), ("inv_w", iw2, 3)):
            t2 += report(tag, eng, orc[:, col], tris)
        print(f"  => total corner-field mismatches: einsum {t}, exact {t2}")


if __name__ == "__main__":
    main()
