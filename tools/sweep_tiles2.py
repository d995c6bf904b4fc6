#!/usr/bin/env python
"""Kernel-only timing: prebuilt bins, sweep tile_h/chunk (killeroo V/P)."""

from __future__ import annotations

import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo/tools")
from profile_raster import bench  # noqa: E402


def kernel_only(bins, n2, n3, h, w, cap, tile_h, tile_w, chunk, group=8):
    import rustexp_tpu.ops.raster_pallas as rp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nty, ntx = h // tile_h, w // tile_w
    n_k = cap // chunk
    f_ch = 7 + 3 * (n2 + n3)
    n_planes = n2 + n3
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nty, ntx, n_k),
        in_specs=[
            pl.BlockSpec((1, chunk, rp._I_CH),
                         lambda i, j, k, *_: (i * ntx + j, k, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk, f_ch),
                         lambda i, j, k, *_: (i * ntx + j, k, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_h, tile_w), lambda i, j, k, *_: (i, j),
                         memory_space=pltpu.VMEM)
        ] * (2 + n_planes),
    )
    out_shape = (
        [jax.ShapeDtypeStruct((h, w), jnp.float32),
         jax.ShapeDtypeStruct((h, w), jnp.int32)]
        + [jax.ShapeDtypeStruct((h, w), jnp.float32)] * n_planes
    )
    kernel = functools.partial(
        rp._attr_tile_kernel, tile_h=tile_h, tile_w=tile_w, ntx=ntx,
        chunk_size=chunk, n2=n2, n3=n3, group=group,
    )
    return pl.pallas_call(kernel, grid_spec=grid_spec, out_shape=out_shape,
                          interpret=False)(bins.counts, bins.setup_i,
                                           bins.setup_f)


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

    results = {}
    for th in (32, 16, 8):
        mb = int(jax.jit(
            lambda s: rp.max_bin_count(s, H, W, tile_h=th, tile_w=128),
            )(setup))
        cap = max(512, -(-int(mb * 1.3) // 512) * 512)
        for flag, nm in ((False, "V"), (True, "P")):
            extra, n2, n3 = mk_extra(flag)
            bins = jax.jit(lambda s, e: rp.bin_triangles(
                s, H, W, cap, th, 128, extra_f=e))(setup, extra)
            for chunk in sorted({min(512, cap), cap}):
                t = bench(
                    functools.partial(kernel_only, n2=n2, n3=n3, h=H, w=W,
                                      cap=cap, tile_h=th, tile_w=128,
                                      chunk=chunk),
                    bins, K=128,
                    label=f"kernel th={th} cap={cap} chunk={chunk} {nm}")
                results[(th, chunk, nm)] = t


if __name__ == "__main__":
    main()
