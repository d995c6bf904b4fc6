#!/usr/bin/env python
"""Sweep tile_h / chunk for the attr kernel on the real TPU (killeroo V/P)."""

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
    from rustexp_tpu.ops.raster_setup import setup_triangles
    from rustexp_tpu.raster import camera, pipeline as pp

    np.asarray(jnp.zeros(8))
    W = H = 512
    m = mesh.get_mesh(0)
    scene = pp.make_scene(m, cubemap.get_cm_set(0))
    eye = jnp.asarray(camera.camera_eye(mesh.mesh_camera(0), 0.0))

    vp, world, n_world = jax.jit(
        lambda e: pp.transform_vertices(scene, e, W, H))(eye)
    setup = jax.jit(
        lambda v: setup_triangles(v, scene.tris, W, H))(vp)

    tris = scene.tris
    i0, i1, i2 = tris[:, 0], tris[:, 1], tris[:, 2]
    colors = scene.colors

    def mk_extra(per_pixel):
        iw0, iw1, iw2 = vp[i0, 3], vp[i1, 3], vp[i2, 3]
        ones = jnp.ones((tris.shape[0], 1), jnp.float32)

        def cat2(ci):
            return jnp.concatenate([ones, colors[ci]], axis=1)

        f2 = rp.attr_channels_2mad(iw0, iw1, iw2, cat2(i0), cat2(i1), cat2(i2))
        if not per_pixel:
            return f2, 4, 0

        def cat3(ci):
            return jnp.concatenate([world[ci], n_world[ci]], axis=1)

        f3 = rp.attr_channels_3w(iw0, iw1, iw2, cat3(i0), cat3(i1), cat3(i2))
        return jnp.concatenate([f2, f3], axis=1), 4, 6

    for th in (32, 16, 8):
        mb = int(jax.jit(
            lambda s: rp.max_bin_count(s, H, W, tile_h=th, tile_w=128),
            )(setup))
        cap = max(512, -(-int(mb * 1.3) // 512) * 512)
        for chunk in sorted({512, cap}):
            if chunk > cap:
                continue
            for flag, nm in ((False, "V"), (True, "P")):
                extra, n2, n3 = mk_extra(flag)
                extra = jax.device_put(extra)

                def run(s, e, th=th, cap=cap, chunk=chunk, n2=n2, n3=n3):
                    return rp.raster_attrs_pallas(
                        s, e, n2, n3, H, W, cap=cap, tile_h=th, tile_w=128,
                        chunk=chunk)

                # bins prebuilt outside: measure kernel alone by binning once
                def run_kernel_only(s, e, th=th, cap=cap, chunk=chunk,
                                    n2=n2, n3=n3):
                    return rp.raster_attrs_pallas(
                        s, e, n2, n3, H, W, cap=cap, tile_h=th, tile_w=128,
                        chunk=chunk)

                bench(run, setup, extra, K=64,
                      label=f"tile_h={th} cap={cap} chunk={chunk} "
                            f"{nm} bins+kernel (maxbin={mb})")


if __name__ == "__main__":
    main()
