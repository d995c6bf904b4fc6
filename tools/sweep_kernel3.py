#!/usr/bin/env python
"""Tree-merge kernel variant: break the serial z_ref dependency chain.
Lexicographic (z asc, slot asc) tree min within group, one RMW per group."""

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

TW = 128


def make_kernel(n2, n3, group, th, tree):
    def kern(counts_ref, si_ref, sf_ref, *out_refs, ntx, chunk_size):
        z_ref, slot_ref = out_refs[0], out_refs[1]
        lin_refs = out_refs[2:]
        n_planes = len(lin_refs)
        ti = pl.program_id(0)
        tj = pl.program_id(1)
        tk = pl.program_id(2)
        count = counts_ref[ti * ntx + tj]

        shape3 = (1, th, TW)
        xs = tj * TW + jax.lax.broadcasted_iota(jnp.int32, shape3, 2)
        ys = ti * th + jax.lax.broadcasted_iota(jnp.int32, shape3, 1)
        xf = xs << 4
        yf = ys << 4

        @pl.when(tk == 0)
        def _init():
            z_ref[:] = jnp.ones((th, TW), jnp.float32)
            slot_ref[:] = jnp.full((th, TW), -1, jnp.int32)
            for r in lin_refs:
                r[:] = jnp.zeros((th, TW), jnp.float32)

        remaining = count - tk * chunk_size
        n_groups = jnp.clip(pl.cdiv(remaining, group), 0, chunk_size // group)

        def chunk(c, _):
            base = pl.multiple_of(c * group, group)
            si = si_ref[0, pl.ds(base, group), :]
            sf = sf_ref[0, pl.ds(base, group), :]

            def ci(ch):
                return jnp.broadcast_to(si[:, ch].reshape(group, 1, 1),
                                        (group, th, 1))

            def cf(ch):
                return jnp.broadcast_to(sf[:, ch].reshape(group, 1, 1),
                                        (group, th, 1))

            e0 = ci(0) * xf + ci(2) * yf + ci(4)
            e1 = ci(1) * xf + ci(3) * yf + ci(5)
            e2 = ci(6) - e0 - e1
            inside = (e0 | e1 | e2) >= 0
            inv_a2 = cf(6)
            b0 = e0.astype(jnp.float32) * inv_a2 - cf(0)
            b1 = e1.astype(jnp.float32) * inv_a2 - cf(1)
            b2 = e2.astype(jnp.float32) * inv_a2 - cf(2)
            zi = cf(3) + cf(4) * b2 + cf(5) * b0
            zm = jnp.where(inside, zi, jnp.float32(jnp.inf))

            lins = []
            off = 7
            for a in range(n2):
                lins.append(cf(off + a) + cf(off + n2 + a) * b2
                            + cf(off + 2 * n2 + a) * b0)
            off = 7 + 3 * n2
            for a in range(n3):
                lins.append(cf(off + a) * b1 + cf(off + n3 + a) * b2
                            + cf(off + 2 * n3 + a) * b0)
            lins = lins[:n_planes]

            slot0 = tk * chunk_size + base

            if not tree:
                for g in range(group):
                    upd = zm[g] < z_ref[:]
                    z_ref[:] = jnp.where(upd, zm[g], z_ref[:])
                    slot_ref[:] = jnp.where(upd, slot0 + g, slot_ref[:])
                    for r, lin in zip(lin_refs, lins):
                        r[:] = jnp.where(upd, lin[g], r[:])
                return 0

            # Tree reduction within the group: strict-less keeps the earlier
            # (smaller slot) candidate, exactly like the sequential merge.
            zs = [zm[g] for g in range(group)]
            ss = [jnp.full((th, TW), slot0 + g, jnp.int32)
                  for g in range(group)]
            ats = [[lin[g] for lin in lins] for g in range(group)]
            n = group
            while n > 1:
                h = n // 2
                for k in range(h):
                    a, b = k, k + h
                    take_b = zs[b] < zs[a]
                    zs[k] = jnp.where(take_b, zs[b], zs[a])
                    ss[k] = jnp.where(take_b, ss[b], ss[a])
                    ats[k] = [jnp.where(take_b, xb, xa)
                              for xa, xb in zip(ats[a], ats[b])]
                n = h
            upd = zs[0] < z_ref[:]
            z_ref[:] = jnp.where(upd, zs[0], z_ref[:])
            slot_ref[:] = jnp.where(upd, ss[0], slot_ref[:])
            for r, lin in zip(lin_refs, ats[0]):
                r[:] = jnp.where(upd, lin, r[:])
            return 0

        jax.lax.fori_loop(0, n_groups, chunk, 0)

    return kern


def run(bins, n2, n3, n_planes, cap, chunk, group, th, tree, label):
    h = w = 512
    nty, ntx = h // th, w // TW
    n_k = cap // chunk
    f_ch = 7 + 3 * (n2 + n3)
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
    kernel = functools.partial(make_kernel(n2, n3, group, th, tree),
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
    f3n = rp.attr_channels_3w(iw0, iw1, iw2, n_world[i0], n_world[i1],
                              n_world[i2])
    extraP7 = jnp.concatenate([f2, f3n], axis=1)

    for th in (32, 8):
        mb = int(jax.jit(lambda s: rp.max_bin_count(
            s, H, W, tile_h=th, tile_w=128))(setup))
        cap = max(512, -(-int(mb * 1.3) // 512) * 512)
        binsV = jax.jit(lambda s: rp.bin_triangles(s, H, W, cap, th, TW,
                                                   extra_f=f2))(setup)
        binsP = jax.jit(lambda s: rp.bin_triangles(s, H, W, cap, th, TW,
                                                   extra_f=extraP7))(setup)
        for g in (8, 16, 32):
            run(binsV, 4, 0, 4, cap, cap, g, th, True,
                f"V th{th} g{g} TREE")
        run(binsV, 4, 0, 4, cap, cap, 8, th, False, f"V th{th} g8 seq")
        run(binsP, 4, 3, 7, cap, cap, 16, th, True, f"P7 th{th} g16 TREE")


if __name__ == "__main__":
    main()
