#!/usr/bin/env python
"""Isolate per-group overhead: loop-only, slice-only, static-slice variants.
Stripped V kernel (z+slot merge only), th=32, killeroo bins."""

from __future__ import annotations

import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo/tools")
from profile_raster import bench  # noqa: E402

TH, TW = 32, 128
GROUP = 8


def make_kernel(mode):
    """mode: full | noslice | loop_only | static_slice | smem_consts"""

    def kern(counts_ref, si_ref, sf_ref, z_ref, slot_ref, *, ntx, chunk_size):
        ti = pl.program_id(0)
        tj = pl.program_id(1)
        tk = pl.program_id(2)
        count = counts_ref[ti * ntx + tj]

        shape3 = (1, TH, TW)
        xs = tj * TW + jax.lax.broadcasted_iota(jnp.int32, shape3, 2)
        ys = ti * TH + jax.lax.broadcasted_iota(jnp.int32, shape3, 1)
        xf = xs << 4
        yf = ys << 4

        @pl.when(tk == 0)
        def _init():
            z_ref[:] = jnp.ones((TH, TW), jnp.float32)
            slot_ref[:] = jnp.full((TH, TW), -1, jnp.int32)

        remaining = count - tk * chunk_size
        n_groups = jnp.clip(pl.cdiv(remaining, GROUP), 0, chunk_size // GROUP)

        def body(si, sf, slot0):
            def ci(ch):
                return jnp.broadcast_to(si[:, ch].reshape(GROUP, 1, 1),
                                        (GROUP, TH, 1))

            def cf(ch):
                return jnp.broadcast_to(sf[:, ch].reshape(GROUP, 1, 1),
                                        (GROUP, TH, 1))

            e0 = ci(0) * xf + ci(2) * yf + ci(4)
            e1 = ci(1) * xf + ci(3) * yf + ci(5)
            e2 = ci(6) - e0 - e1
            inside = (e0 | e1 | e2) >= 0
            inv_a2 = cf(6)
            b0 = e0.astype(jnp.float32) * inv_a2 - cf(0)
            b2 = e2.astype(jnp.float32) * inv_a2 - cf(2)
            zi = cf(3) + cf(4) * b2 + cf(5) * b0
            zm = jnp.where(inside, zi, jnp.float32(jnp.inf))
            for g in range(GROUP):
                upd = zm[g] < z_ref[:]
                z_ref[:] = jnp.where(upd, zm[g], z_ref[:])
                slot_ref[:] = jnp.where(upd, slot0 + g, slot_ref[:])

        if mode == "static_slice":
            # whole chunk processed with static slices; pl.when skips groups
            for c in range(chunk_size // GROUP):
                @pl.when(c < n_groups)
                def _do(c=c):
                    si = si_ref[0, c * GROUP:(c + 1) * GROUP, :]
                    sf = sf_ref[0, c * GROUP:(c + 1) * GROUP, :]
                    body(si, sf, tk * chunk_size + c * GROUP)
            return

        def chunk(c, _):
            base = pl.multiple_of(c * GROUP, GROUP)
            if mode == "loop_only":
                # touch output only; no slice, no math
                z_ref[:] = z_ref[:] + jnp.float32(c)
                return 0
            si = si_ref[0, pl.ds(base, GROUP), :]
            sf = sf_ref[0, pl.ds(base, GROUP), :]
            if mode == "noslice_math":
                # math from in-register constants; slice read but only summed
                z_ref[:] = z_ref[:] + (si[0, 0] + sf[0, 0].astype(jnp.int32)
                                       ).astype(jnp.float32)
                return 0
            body(si, sf, tk * chunk_size + base)
            return 0

        jax.lax.fori_loop(0, n_groups, chunk, 0)

    return kern


def run(bins, cap, chunk, mode, label):
    h = w = 512
    nty, ntx = h // TH, w // TW
    n_k = cap // chunk
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nty, ntx, n_k),
        in_specs=[
            pl.BlockSpec((1, chunk, 12),
                         lambda i, j, k, *_: (i * ntx + j, k, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk, 19),
                         lambda i, j, k, *_: (i * ntx + j, k, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TH, TW), lambda i, j, k, *_: (i, j),
                         memory_space=pltpu.VMEM)
        ] * 2,
    )
    out_shape = [jax.ShapeDtypeStruct((h, w), jnp.float32),
                 jax.ShapeDtypeStruct((h, w), jnp.int32)]
    kernel = functools.partial(make_kernel(mode), ntx=ntx, chunk_size=chunk)

    def fn(counts, si, sf):
        return pl.pallas_call(kernel, grid_spec=grid_spec,
                              out_shape=out_shape, interpret=False)(
            counts, si, sf)

    bench(fn, bins.counts, bins.setup_i, bins.setup_f, K=128, label=label)


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
    setup = jax.jit(lambda v: setup_triangles(v, scene.tris, W, H))(vp)

    tris = scene.tris
    i0 = tris[:, 0]
    iw0 = vp[i0, 3]
    ones = jnp.ones((tris.shape[0], 1), jnp.float32)
    f2 = rp.attr_channels_2mad(iw0, iw0, iw0,
                               jnp.concatenate([ones] * 4, axis=1),
                               jnp.concatenate([ones] * 4, axis=1),
                               jnp.concatenate([ones] * 4, axis=1))
    cap = 2048
    bins = jax.jit(lambda s: rp.bin_triangles(s, H, W, cap, TH, TW,
                                              extra_f=f2))(setup)

    run(bins, cap, 2048, "full", "stripped full (dyn slice + math)")
    run(bins, cap, 2048, "noslice_math", "dyn slice only (no math)")
    run(bins, cap, 2048, "loop_only", "fori_loop only (no slice/math)")
    run(bins, cap, 512, "static_slice", "static slices, pl.when, chunk512")
    run(bins, cap, 256, "static_slice", "static slices, pl.when, chunk256")


if __name__ == "__main__":
    main()
