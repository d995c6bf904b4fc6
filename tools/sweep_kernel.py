#!/usr/bin/env python
"""Kernel micro-variant sweep on TPU: unroll, in_box removal, group size,
stripped floor. Killeroo V config (n2=4, n3=0), th=32, tw=128."""

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


def make_kernel(n2, n3, group, unroll, use_inbox, strip, lane_bcast=False,
                th=None):
    TH_ = th or TH

    def kern(counts_ref, si_ref, sf_ref, *out_refs, ntx, chunk_size):
        z_ref, slot_ref = out_refs[0], out_refs[1]
        lin_refs = out_refs[2:]
        ti = pl.program_id(0)
        tj = pl.program_id(1)
        tk = pl.program_id(2)
        count = counts_ref[ti * ntx + tj]

        shape3 = (1, TH_, TW)
        xs = tj * TW + jax.lax.broadcasted_iota(jnp.int32, shape3, 2)
        ys = ti * TH_ + jax.lax.broadcasted_iota(jnp.int32, shape3, 1)
        xf = xs << 4
        yf = ys << 4

        @pl.when(tk == 0)
        def _init():
            z_ref[:] = jnp.ones((TH_, TW), jnp.float32)
            slot_ref[:] = jnp.full((TH_, TW), -1, jnp.int32)
            for r in lin_refs:
                r[:] = jnp.zeros((TH_, TW), jnp.float32)

        remaining = count - tk * chunk_size
        n_groups = jnp.clip(pl.cdiv(remaining, group * unroll), 0,
                            chunk_size // (group * unroll))

        def chunk(c, _):
            for u in range(unroll):
                one_group(c * unroll + u)
            return 0

        def one_group(c):
            base = pl.multiple_of(c * group, group)
            si = si_ref[0, pl.ds(base, group), :]
            sf = sf_ref[0, pl.ds(base, group), :]

            if lane_bcast:
                def ci(ch):
                    return jnp.broadcast_to(si[:, ch].reshape(group, 1, 1),
                                            (group, 1, TW))

                def cf(ch):
                    return jnp.broadcast_to(sf[:, ch].reshape(group, 1, 1),
                                            (group, 1, TW))
            else:
                def ci(ch):
                    return jnp.broadcast_to(si[:, ch].reshape(group, 1, 1),
                                            (group, TH_, 1))

                def cf(ch):
                    return jnp.broadcast_to(sf[:, ch].reshape(group, 1, 1),
                                            (group, TH_, 1))

            e0 = ci(0) * xf + ci(2) * yf + ci(4)
            e1 = ci(1) * xf + ci(3) * yf + ci(5)
            e2 = ci(6) - e0 - e1
            inside = (e0 | e1 | e2) >= 0
            if use_inbox:
                inside = inside & ((xs >= ci(7)) & (ys >= ci(8))
                                   & (xs < ci(9)) & (ys < ci(10)))
            inv_a2 = cf(6)
            b0 = e0.astype(jnp.float32) * inv_a2 - cf(0)
            b1 = e1.astype(jnp.float32) * inv_a2 - cf(1)
            b2 = e2.astype(jnp.float32) * inv_a2 - cf(2)
            zi = cf(3) + cf(4) * b2 + cf(5) * b0
            zm = jnp.where(inside, zi, jnp.float32(jnp.inf))

            lins = []
            if not strip:
                off = 7
                for a in range(n2):
                    lins.append(cf(off + a) + cf(off + n2 + a) * b2
                                + cf(off + 2 * n2 + a) * b0)
                off = 7 + 3 * n2
                for a in range(n3):
                    lins.append(cf(off + a) * b1 + cf(off + n3 + a) * b2
                                + cf(off + 2 * n3 + a) * b0)

            slot0 = tk * chunk_size + base
            for g in range(group):
                upd = zm[g] < z_ref[:]
                z_ref[:] = jnp.where(upd, zm[g], z_ref[:])
                slot_ref[:] = jnp.where(upd, slot0 + g, slot_ref[:])
                for r, lin in zip(lin_refs, lins):
                    r[:] = jnp.where(upd, lin[g], r[:])

        jax.lax.fori_loop(0, n_groups, chunk, 0)

    return kern


def run_variant(bins, n2, n3, h, w, cap, chunk, group, unroll, use_inbox,
                strip, label, lane_bcast=False, th=TH):
    nty, ntx = h // th, w // TW
    n_k = cap // chunk
    f_ch = 7 + 3 * (n2 + n3)
    n_planes = 0 if strip else n2 + n3
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nty, ntx, n_k),
        in_specs=[
            pl.BlockSpec((1, chunk, 12),
                         lambda i, j, k, *_: (i * ntx + j, k, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk, f_ch),
                         lambda i, j, k, *_: (i * ntx + j, k, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((th, TW), lambda i, j, k, *_: (i, j),
                         memory_space=pltpu.VMEM)
        ] * (2 + n_planes),
    )
    out_shape = (
        [jax.ShapeDtypeStruct((h, w), jnp.float32),
         jax.ShapeDtypeStruct((h, w), jnp.int32)]
        + [jax.ShapeDtypeStruct((h, w), jnp.float32)] * n_planes
    )
    kernel = functools.partial(
        make_kernel(n2, n3, group, unroll, use_inbox, strip,
                    lane_bcast=lane_bcast, th=th),
        ntx=ntx, chunk_size=chunk)

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
    i0, i1, i2 = tris[:, 0], tris[:, 1], tris[:, 2]
    colors = scene.colors
    iw0, iw1, iw2 = vp[i0, 3], vp[i1, 3], vp[i2, 3]
    ones = jnp.ones((tris.shape[0], 1), jnp.float32)

    def cat2(ci):
        return jnp.concatenate([ones, colors[ci]], axis=1)

    f2 = rp.attr_channels_2mad(iw0, iw1, iw2, cat2(i0), cat2(i1), cat2(i2))

    def cat3(ci):
        return jnp.concatenate([world[ci], n_world[ci]], axis=1)

    f3 = rp.attr_channels_3w(iw0, iw1, iw2, cat3(i0), cat3(i1), cat3(i2))
    extraP = jnp.concatenate([f2, f3], axis=1)
    f3n = rp.attr_channels_3w(iw0, iw1, iw2, n_world[i0], n_world[i1],
                              n_world[i2])
    extraP7 = jnp.concatenate([f2, f3n], axis=1)

    cap = 2048
    binsV = jax.jit(lambda s: rp.bin_triangles(s, H, W, cap, TH, TW,
                                               extra_f=f2))(setup)
    binsP = jax.jit(lambda s: rp.bin_triangles(s, H, W, cap, TH, TW,
                                               extra_f=extraP))(setup)
    binsP7 = jax.jit(lambda s: rp.bin_triangles(s, H, W, cap, TH, TW,
                                                extra_f=extraP7))(setup)

    # Variants: (n2, n3, bins, group, unroll, inbox, strip, label)
    run_variant(binsV, 4, 0, H, W, cap, 2048, 8, 1, False, False,
                "V no-inbox (ref)")
    run_variant(binsV, 4, 0, H, W, cap, 2048, 8, 1, False, False,
                "V no-inbox LANE-bcast", lane_bcast=True)
    run_variant(binsV, 4, 0, H, W, cap, 2048, 16, 1, False, False,
                "V g16 no-inbox LANE-bcast", lane_bcast=True)
    run_variant(binsV, 4, 0, H, W, cap, 2048, 8, 1, False, True,
                "V stripped LANE-bcast", lane_bcast=True)
    run_variant(binsP7, 4, 3, H, W, cap, 2048, 8, 1, False, False,
                "P7 no-inbox LANE-bcast", lane_bcast=True)

    # 8-row tiles with lane-bcast constants
    mb8 = int(jax.jit(
        lambda s: rp.max_bin_count(s, H, W, tile_h=8, tile_w=128))(setup))
    cap8 = max(512, -(-int(mb8 * 1.3) // 512) * 512)
    binsV8 = jax.jit(lambda s: rp.bin_triangles(s, H, W, cap8, 8, TW,
                                                extra_f=f2))(setup)
    binsP78 = jax.jit(lambda s: rp.bin_triangles(s, H, W, cap8, 8, TW,
                                                 extra_f=extraP7))(setup)
    run_variant(binsV8, 4, 0, H, W, cap8, cap8, 8, 1, False, False,
                f"V th8 cap{cap8} LANE-bcast", lane_bcast=True, th=8)
    run_variant(binsV8, 4, 0, H, W, cap8, cap8, 8, 1, False, False,
                f"V th8 cap{cap8} sublane-bcast", lane_bcast=False, th=8)
    run_variant(binsP78, 4, 3, H, W, cap8, cap8, 8, 1, False, False,
                f"P7 th8 cap{cap8} LANE-bcast", lane_bcast=True, th=8)


if __name__ == "__main__":
    main()
