#!/usr/bin/env python
"""Validate raster_queue vs raster_attrs_pallas on TPU (bit-equality), then
time it (killeroo V / P7)."""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo/tools")
from profile_raster import bench  # noqa: E402


def main():
    from rustexp_tpu.assets import cubemap, mesh
    import rustexp_tpu.ops.raster_pallas as rp
    import rustexp_tpu.ops.raster_queue as rq
    from rustexp_tpu.ops.raster_setup import setup_triangles
    from rustexp_tpu.raster import camera, pipeline as pp

    np.asarray(jnp.zeros(8))

    def make_inputs(mesh_obj, cam, w, h, per_pixel):
        scene = pp.make_scene(mesh_obj, cubemap.get_cm_set(0))
        eye = jnp.asarray(camera.camera_eye(cam, 0.0)) if isinstance(cam, str) \
            else jnp.asarray(cam)
        vp, world, n_world = jax.jit(
            lambda e: pp.transform_vertices(scene, e, w, h))(eye)
        setup = jax.jit(lambda v: setup_triangles(v, scene.tris, w, h))(vp)
        tris = scene.tris
        i0, i1, i2 = tris[:, 0], tris[:, 1], tris[:, 2]
        iw0, iw1, iw2 = vp[i0, 3], vp[i1, 3], vp[i2, 3]
        ones = jnp.ones((tris.shape[0], 1), jnp.float32)
        colors = scene.colors

        def cat2(ci):
            return jnp.concatenate([ones, colors[ci]], axis=1)

        f2 = rp.attr_channels_2mad(iw0, iw1, iw2, cat2(i0), cat2(i1),
                                   cat2(i2))
        if not per_pixel:
            return setup, f2, 4, 0
        f3n = rp.attr_channels_3w(iw0, iw1, iw2, n_world[i0], n_world[i1],
                                  n_world[i2])
        return setup, jnp.concatenate([f2, f3n], axis=1), 4, 3

    # --- correctness: sphere + killeroo vs the [nT,cap] kernel
    for mesh_obj, cam, w, h, label in (
        (mesh.make_sphere(12, 24), camera.cam_orbit(0.7), 128, 128, "sphere"),
        (mesh.get_mesh(0), "orbit", 512, 512, "killeroo"),
        (mesh.get_mesh(9), "orbit", 512, 512, "cube"),
        (mesh.get_mesh(11), "pan_front", 512, 512, "cornell"),
    ):
        for per_pixel in (False, True):
            setup, extra, n2, n3 = make_inputs(mesh_obj, cam, w, h, per_pixel)
            stats = jax.jit(
                lambda s: rq.queue_stats(s, h, w))(setup)
            s_cap, m_y, m_x = rq.suggest_queue_config(
                tuple(int(x) for x in jax.device_get(stats)))
            queue = jax.jit(lambda s: rq.build_queue(
                s, h, w, s_cap=s_cap, m_y=m_y, m_x=m_x))(setup)
            z_q, mask_q, lin_q, stale = rq.raster_attrs_queue(
                queue, setup, extra, n2, n3, h, w)
            assert not bool(stale), f"{label} stale"
            z_r, mask_r, lin_r, ov = rp.raster_attrs_pallas(
                setup, extra, n2, n3, h, w)
            assert not bool(ov)
            # z / lins are only defined under the coverage mask (unvisited
            # tiles are garbage by design; callers select by mask)
            mk = np.asarray(mask_r)
            ok_z = np.array_equal(np.asarray(z_q)[mk], np.asarray(z_r)[mk])
            ok_m = np.array_equal(np.asarray(mask_q), mk)
            ok_l = all(np.array_equal(np.asarray(a)[mk], np.asarray(b)[mk])
                       for a, b in zip(lin_q, lin_r))
            print(f"{label} pp={per_pixel}: s_cap={s_cap} m=({m_y},{m_x}) "
                  f"z={ok_z} mask={ok_m} lins={ok_l}")
            if not (ok_z and ok_m and ok_l):
                zq, zr = np.asarray(z_q), np.asarray(z_r)
                bad = np.argwhere(zq != zr)
                print("  first mismatches:", bad[:5],
                      zq[tuple(bad[0])] if len(bad) else "")
                mq, mr = np.asarray(mask_q), np.asarray(mask_r)
                print("  mask diff count:", (mq != mr).sum())
                return 1

    # --- perf: killeroo V / P7 (kernel incl. per-frame row gather)
    for per_pixel, nm in ((False, "V"), (True, "P7")):
        setup, extra, n2, n3 = make_inputs(mesh.get_mesh(0), "orbit",
                                           512, 512, per_pixel)
        stats = jax.jit(lambda s: rq.queue_stats(s, 512, 512))(setup)
        s_cap, m_y, m_x = rq.suggest_queue_config(
            tuple(int(x) for x in jax.device_get(stats)))
        queue = jax.jit(lambda s: rq.build_queue(
            s, 512, 512, s_cap=s_cap, m_y=m_y, m_x=m_x))(setup)
        bench(lambda q, s, e: rq.raster_attrs_queue(q, s, e, n2, n3,
                                                    512, 512),
              queue, setup, extra, K=128,
              label=f"queue kernel+gather {nm} (S={s_cap})")
        bench(lambda s: rq.build_queue(s, 512, 512, s_cap=s_cap, m_y=m_y,
                                       m_x=m_x),
              setup, K=64, label=f"build_queue {nm} m=({m_y},{m_x})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
