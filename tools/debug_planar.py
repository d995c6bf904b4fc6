#!/usr/bin/env python
"""Where does the planar path diverge bitwise from the indexed path?"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from rustexp_tpu.assets import cubemap, mesh
from rustexp_tpu.ops.raster_setup import (
    setup_triangles, setup_triangles_planar,
)
from rustexp_tpu.raster import camera, pipeline as pp

W = H = 512

scene = pp.make_scene(mesh.make_sphere(8, 16), cubemap.make_procedural_set())
eye = jnp.asarray(camera.cam_orbit(0.7))

vp, world, nw = jax.jit(pp.transform_vertices, static_argnums=(2, 3))(
    scene, eye, W, H)
xs, ys, zs, iw, n_c, world_c = jax.jit(
    pp.transform_corners_planar, static_argnums=(2, 3))(scene, eye, W, H)

tris = np.asarray(scene.tris)
vpn = np.asarray(vp)
for j in range(3):
    for name, planar, col in (("x", xs, 0), ("y", ys, 1), ("z", zs, 2),
                              ("iw", iw, 3)):
        a = vpn[tris[:, j], col]
        b = np.asarray(planar)[j]
        neq = (a != b)
        if neq.any():
            i = np.argmax(neq)
            print(f"corner {j} {name}: {neq.sum()}/{len(a)} differ, "
                  f"e.g. t={i}: {a[i]!r} vs {b[i]!r} "
                  f"ulp={abs(a[i].view(np.int32)-b[i].view(np.int32))}")
        else:
            print(f"corner {j} {name}: identical")
    break  # corner 0 is representative

# setup comparison
su_old = jax.jit(setup_triangles, static_argnums=(2, 3))(vp, scene.tris, W, H)
su_new = jax.jit(setup_triangles_planar, static_argnums=(3, 4))(
    xs, ys, zs, W, H)
for f, a, b in (("A0", su_old.A[:, 0], su_new.A0),
                ("C0", su_old.C[:, 0], su_new.C0),
                ("z0", su_old.z0, su_new.z0),
                ("inv_a2", su_old.inv_a2, su_new.inv_a2),
                ("valid", su_old.valid, su_new.valid)):
    a, b = np.asarray(a), np.asarray(b)
    print(f"setup {f}: {'identical' if np.array_equal(a, b) else f'{(a!=b).sum()} differ'}")

# frames
queue = pp.build_scene_queue(scene, eye, W, H)
for ppx in (False, True):
    kw = dict(w=W, h=H, shader_idx=5, show_cm=False, per_pixel=ppx)
    a = np.asarray(pp.render_frame(scene, eye, 0.7, backend="pallas", **kw))
    b, stale = pp.render_frame(scene, eye, 0.7, backend="queue",
                               raster_queue=queue, return_overflow=True, **kw)
    b = np.asarray(b)
    neq = a != b
    print(f"per_pixel={ppx}: stale={bool(stale)} diff_pixels={neq.sum()}")
    if neq.any():
        ys_, xs_ = np.nonzero(neq)
        print("  first diffs:", [(int(y), int(x), hex(a[y, x]), hex(b[y, x]))
                                 for y, x in zip(ys_[:4], xs_[:4])])
