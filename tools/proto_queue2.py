#!/usr/bin/env python
"""Prototype 2: scalar-operand flat-queue kernel — per-pair constants read
as SMEM scalars (vector-scalar ops, no broadcasts, no G axis).

Variant A: rows streamed as SMEM blocks via BlockSpec(memory_space=SMEM).
Variant B: rows streamed to VMEM, copied to SMEM scratch per chunk.
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
from proto_queue import build_queue_host  # noqa: E402

TH, TW = 8, 128


def scalar_kernel(scal_ref, rows_i_ref, rows_f_ref, *out_refs,
                  chunk, n2, n3, interleave):
    z_ref, slot_ref = out_refs[0], out_refs[1]
    lin_refs = out_refs[2:]
    c = pl.program_id(0)
    ty = scal_ref[c, 0]
    tx = scal_ref[c, 1]
    first = scal_ref[c, 2]
    cnt = scal_ref[c, 3]

    shape2 = (TH, TW)
    xs = tx * TW + jax.lax.broadcasted_iota(jnp.int32, shape2, 1)
    ys = ty * TH + jax.lax.broadcasted_iota(jnp.int32, shape2, 0)
    xf = xs << 4
    yf = ys << 4

    @pl.when(first == 1)
    def _init():
        z_ref[:] = jnp.ones(shape2, jnp.float32)
        slot_ref[:] = jnp.full(shape2, -1, jnp.int32)
        for r in lin_refs:
            r[:] = jnp.zeros(shape2, jnp.float32)

    def one(p, slot_base):
        # All constants are SMEM scalars -> vector-scalar ops, no broadcast
        A0 = rows_i_ref[0, p, 0]
        A1 = rows_i_ref[0, p, 1]
        B0 = rows_i_ref[0, p, 2]
        B1 = rows_i_ref[0, p, 3]
        C0 = rows_i_ref[0, p, 4]
        C1 = rows_i_ref[0, p, 5]
        S = rows_i_ref[0, p, 6]
        mnx = rows_i_ref[0, p, 7]
        mny = rows_i_ref[0, p, 8]
        mxx = rows_i_ref[0, p, 9]
        mxy = rows_i_ref[0, p, 10]

        e0 = A0 * xf + B0 * yf + C0
        e1 = A1 * xf + B1 * yf + C1
        e2 = S - e0 - e1
        inside = (e0 | e1 | e2) >= 0
        in_box = (xs >= mnx) & (ys >= mny) & (xs < mxx) & (ys < mxy)
        inv_a2 = rows_f_ref[0, p, 6]
        b0 = e0.astype(jnp.float32) * inv_a2 - rows_f_ref[0, p, 0]
        b1 = e1.astype(jnp.float32) * inv_a2 - rows_f_ref[0, p, 1]
        b2 = e2.astype(jnp.float32) * inv_a2 - rows_f_ref[0, p, 2]
        zi = (rows_f_ref[0, p, 3] + rows_f_ref[0, p, 4] * b2
              + rows_f_ref[0, p, 5] * b0)
        zm = jnp.where(inside & in_box, zi, jnp.float32(jnp.inf))

        lins = []
        off = 7
        for a in range(n2):
            lins.append(rows_f_ref[0, p, off + a]
                        + rows_f_ref[0, p, off + n2 + a] * b2
                        + rows_f_ref[0, p, off + 2 * n2 + a] * b0)
        off = 7 + 3 * n2
        for a in range(n3):
            lins.append(rows_f_ref[0, p, off + a] * b1
                        + rows_f_ref[0, p, off + n3 + a] * b2
                        + rows_f_ref[0, p, off + 2 * n3 + a] * b0)

        upd = zm < z_ref[:]
        z_ref[:] = jnp.where(upd, zm, z_ref[:])
        slot_ref[:] = jnp.where(upd, slot_base + p, slot_ref[:])
        for r, lin in zip(lin_refs, lins):
            r[:] = jnp.where(upd, lin, r[:])

    n_iters = jnp.clip(pl.cdiv(cnt, interleave), 0, chunk // interleave)

    def body(i, _):
        for k in range(interleave):
            one(i * interleave + k, c * chunk)
        return 0

    jax.lax.fori_loop(0, n_iters, body, 0)


def run(ri, rf, scal, S, chunk, n2, n3, interleave, smem, label):
    H = W = 512
    n_planes = n2 + n3
    space = pltpu.SMEM if smem else pltpu.VMEM
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(S,),
        in_specs=[
            pl.BlockSpec((1, chunk, ri.shape[2]),
                         lambda c, scal: (c, 0, 0), memory_space=space),
            pl.BlockSpec((1, chunk, rf.shape[2]),
                         lambda c, scal: (c, 0, 0), memory_space=space),
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
    kern = functools.partial(scalar_kernel, chunk=chunk, n2=n2, n3=n3,
                             interleave=interleave)

    def fn(scal, ri, rf):
        return pl.pallas_call(kern, grid_spec=grid_spec,
                              out_shape=out_shape, interpret=False)(
            scal, ri, rf)

    bench(fn, scal, ri, rf, K=256, label=label)


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
        for chunk in (128,):
            ri_np, rf_np, scal_np, S = build_queue_host(setup, extra, H, W,
                                                        chunk)
            ri = jnp.asarray(ri_np)
            rf = jnp.asarray(rf_np)
            scal = jnp.asarray(scal_np)
            for smem in (True, False):
                for il in (1, 2, 4):
                    try:
                        run(ri, rf, scal, S, chunk, n2, n3, il, smem,
                            f"SCALAR {nm} chunk={chunk} "
                            f"{'SMEM' if smem else 'VMEM'} il={il}")
                    except Exception as e:
                        print(f"SCALAR {nm} {'SMEM' if smem else 'VMEM'} "
                              f"il={il}: {type(e).__name__}: "
                              f"{str(e)[:200]}")


if __name__ == "__main__":
    main()
