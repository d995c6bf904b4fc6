#!/usr/bin/env python
"""Prototype: flat-queue th8 raster kernel on TPU (killeroo V config).

Queue = chunk-aligned per-tile segments of pair rows; grid is 1D over
chunks; out-block index comes from prefetched per-chunk tile ids.
Measures kernel time vs the [nT, cap] design.
"""

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

TH, TW = 8, 128


def queue_kernel(scal_ref, rows_i_ref, rows_f_ref, *out_refs,
                 chunk, group, n2, n3):
    # scal_ref: [S, 4] per-chunk (tile_ty, tile_tx, first_flag, pair_count)
    z_ref, slot_ref = out_refs[0], out_refs[1]
    lin_refs = out_refs[2:]
    c = pl.program_id(0)
    ty = scal_ref[c, 0]
    tx = scal_ref[c, 1]
    first = scal_ref[c, 2]
    cnt = scal_ref[c, 3]

    shape3 = (1, TH, TW)
    xs = tx * TW + jax.lax.broadcasted_iota(jnp.int32, shape3, 2)
    ys = ty * TH + jax.lax.broadcasted_iota(jnp.int32, shape3, 1)
    xf = xs << 4
    yf = ys << 4

    @pl.when(first == 1)
    def _init():
        z_ref[:] = jnp.ones((TH, TW), jnp.float32)
        slot_ref[:] = jnp.full((TH, TW), -1, jnp.int32)
        for r in lin_refs:
            r[:] = jnp.zeros((TH, TW), jnp.float32)

    n_groups = jnp.clip(pl.cdiv(cnt, group), 0, chunk // group)

    def body(g, _):
        base = pl.multiple_of(g * group, group)
        si = rows_i_ref[0, pl.ds(base, group), :]
        sf = rows_f_ref[0, pl.ds(base, group), :]

        def ci(ch):
            return jnp.broadcast_to(si[:, ch].reshape(group, 1, 1),
                                    (group, TH, 1))

        def cf(ch):
            return jnp.broadcast_to(sf[:, ch].reshape(group, 1, 1),
                                    (group, TH, 1))

        e0 = ci(0) * xf + ci(2) * yf + ci(4)
        e1 = ci(1) * xf + ci(3) * yf + ci(5)
        e2 = ci(6) - e0 - e1
        inside = (e0 | e1 | e2) >= 0
        in_box = ((xs >= ci(7)) & (ys >= ci(8))
                  & (xs < ci(9)) & (ys < ci(10)))
        inv_a2 = cf(6)
        b0 = e0.astype(jnp.float32) * inv_a2 - cf(0)
        b1 = e1.astype(jnp.float32) * inv_a2 - cf(1)
        b2 = e2.astype(jnp.float32) * inv_a2 - cf(2)
        zi = cf(3) + cf(4) * b2 + cf(5) * b0
        zm = jnp.where(inside & in_box, zi, jnp.float32(jnp.inf))

        lins = []
        off = 7
        for a in range(n2):
            lins.append(cf(off + a) + cf(off + n2 + a) * b2
                        + cf(off + 2 * n2 + a) * b0)
        off = 7 + 3 * n2
        for a in range(n3):
            lins.append(cf(off + a) * b1 + cf(off + n3 + a) * b2
                        + cf(off + 2 * n3 + a) * b0)

        slot0 = c * chunk + base
        for g2 in range(group):
            upd = zm[g2] < z_ref[:]
            z_ref[:] = jnp.where(upd, zm[g2], z_ref[:])
            slot_ref[:] = jnp.where(upd, slot0 + g2, slot_ref[:])
            for r, lin in zip(lin_refs, lins):
                r[:] = jnp.where(upd, lin[g2], r[:])
        return 0

    jax.lax.fori_loop(0, n_groups, body, 0)


def build_queue_host(setup, extra_f, h, w, chunk):
    """Host-side queue construction from a device TriSetup (prototype only)."""
    mn_x = np.asarray(setup.min_x)
    mx_x = np.asarray(setup.max_x)
    mn_y = np.asarray(setup.min_y)
    mx_y = np.asarray(setup.max_y)
    valid = np.asarray(setup.valid)
    T = mn_x.shape[0]
    nty, ntx = h // TH, w // TW

    packed_i = np.concatenate(
        [np.asarray(setup.A)[:, :2], np.asarray(setup.B)[:, :2],
         np.asarray(setup.C)[:, :2],
         np.asarray(setup.C).sum(axis=1, keepdims=True),
         mn_x[:, None], mn_y[:, None], mx_x[:, None], mx_y[:, None],
         np.arange(T, dtype=np.int32)[:, None]], axis=1).astype(np.int32)
    packed_f = np.concatenate(
        [np.asarray(setup.bias), np.asarray(setup.z0)[:, None],
         np.asarray(setup.z10)[:, None], np.asarray(setup.z20)[:, None],
         np.asarray(setup.inv_a2)[:, None], np.asarray(extra_f)],
        axis=1).astype(np.float32)

    segments = [[] for _ in range(nty * ntx)]
    for t in range(T):
        if not valid[t]:
            continue
        ty0, ty1 = mn_y[t] // TH, (mx_y[t] - 1) // TH
        tx0, tx1 = mn_x[t] // TW, (mx_x[t] - 1) // TW
        for ty in range(ty0, ty1 + 1):
            for tx in range(tx0, tx1 + 1):
                segments[ty * ntx + tx].append(t)

    rows_i, rows_f, scal = [], [], []
    i_ch, f_ch = packed_i.shape[1], packed_f.shape[1]
    pairs = 0
    for j, seg in enumerate(segments):
        if not seg:
            continue
        pairs += len(seg)
        n_chunks = -(-len(seg) // chunk)
        for ci_ in range(n_chunks):
            part = seg[ci_ * chunk:(ci_ + 1) * chunk]
            bi = np.zeros((chunk, i_ch), np.int32)
            bf = np.zeros((chunk, f_ch), np.float32)
            bi[:len(part)] = packed_i[part]
            bf[:len(part)] = packed_f[part]
            rows_i.append(bi)
            rows_f.append(bf)
            scal.append((j // ntx, j % ntx, 1 if ci_ == 0 else 0, len(part)))
    S = len(scal)
    print(f"queue: {pairs} pairs, {S} chunks of {chunk} "
          f"({S * chunk} slots, {pairs / (S * chunk):.0%} full)")
    return (np.stack(rows_i), np.stack(rows_f),
            np.asarray(scal, np.int32), S)


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

    for extra, n2, n3, nm in ((f2, 4, 0, "V"), (extraP7, 4, 3, "P7")):
        for chunk in (64, 128, 256):
            ri, rf, scal, S = build_queue_host(setup, extra, H, W, chunk)
            ri, rf, scal = (jnp.asarray(ri), jnp.asarray(rf),
                            jnp.asarray(scal))
            n_planes = n2 + n3
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(S,),
                in_specs=[
                    pl.BlockSpec((1, chunk, ri.shape[2]),
                                 lambda c, scal: (c, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, chunk, rf.shape[2]),
                                 lambda c, scal: (c, 0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=[
                    pl.BlockSpec((TH, TW),
                                 lambda c, scal: (scal[c, 0], scal[c, 1]),
                                 memory_space=pltpu.VMEM)
                ] * (2 + n_planes),
            )
            out_shape = (
                [jax.ShapeDtypeStruct((H, W), jnp.float32),
                 jax.ShapeDtypeStruct((H, W), jnp.int32)]
                + [jax.ShapeDtypeStruct((H, W), jnp.float32)] * n_planes
            )
            kern = functools.partial(queue_kernel, chunk=chunk, group=8,
                                     n2=n2, n3=n3)

            def fn(scal, ri, rf):
                return pl.pallas_call(kern, grid_spec=grid_spec,
                                      out_shape=out_shape,
                                      interpret=False)(scal, ri, rf)

            bench(fn, scal, ri, rf, K=256,
                  label=f"QUEUE th8 {nm} chunk={chunk} S={S}")


if __name__ == "__main__":
    main()
