#!/usr/bin/env python
"""Per-stage raster pipeline profiling on the real TPU.

Methodology (see BASELINE.md): K reps inside one jitted lax.scan, each rep
reduced to a checksum; wall/K after a warm-up dispatch and an initial d2h
pull to force honest-sync mode. Per-dispatch timing through the axon tunnel
only measures its ~25 ms round trip.

CRITICAL: the scanned body must depend on the scan variable, otherwise XLA
hoists the loop-invariant computation out of the scan and the measurement is
pure dispatch floor. Every array argument is perturbed by a value that is
always zero (ints: + (x >> 30); floats: + x * 1e-38) but not provably so.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def _perturb(a, x):
    if not isinstance(a, jnp.ndarray):
        return a
    if a.dtype == jnp.bool_:
        return a ^ (x >> 30 != 0)
    if jnp.issubdtype(a.dtype, jnp.integer):
        return a + (x >> 30).astype(a.dtype)
    return a + (x * 1e-38).astype(a.dtype)


def bench(fn, *args, K=128, runs=3, label=""):
    """Sustained per-rep seconds for fn(*args) -> arbitrary pytree."""

    @jax.jit
    def loop(args):
        def body(c, x):
            pargs = jax.tree_util.tree_map(lambda a: _perturb(a, x), args)
            out = fn(*pargs)
            leaves = jax.tree_util.tree_leaves(out)
            s = jnp.float32(0)
            for leaf in leaves:
                s += jnp.sum(leaf.astype(jnp.float32))
            return c + s, None
        c, _ = jax.lax.scan(body, jnp.float32(0),
                            jnp.arange(K, dtype=jnp.int32))
        return c

    np.asarray(loop(args))  # compile + warm
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        np.asarray(loop(args))
        best = min(best, (time.perf_counter() - t0) / K)
    print(f"{label:<46} {best * 1e6:9.1f} us", flush=True)
    return best


def main():
    from rustexp_tpu.assets import cubemap, mesh
    from rustexp_tpu.ops.raster_pallas import (
        bin_pairs, bin_triangles, raster_attrs_pallas,
    )
    from rustexp_tpu.ops.raster_setup import setup_triangles
    from rustexp_tpu.raster import camera, pipeline as pp

    # honest-sync mode
    np.asarray(jnp.zeros(8))

    W = H = 512
    m = mesh.get_mesh(0)  # killeroo
    scene = pp.make_scene(m, cubemap.get_cm_set(0))
    eye = jnp.asarray(camera.camera_eye(mesh.mesh_camera(0), 0.0))
    cap, spans, rows_cap = pp.suggest_binning(scene, eye, W, H)
    print(f"killeroo T={m.num_tris} cap={cap} spans={spans} "
          f"rows_cap={rows_cap}", flush=True)

    tick = jnp.float32(0.0)

    # --- full frames
    for pp_flag, name in ((False, "V"), (True, "P")):
        bench(
            lambda e: pp.render_frame(scene, e, 0.0, w=W, h=H,
                                      per_pixel=pp_flag, shader_idx=5,
                                      show_cm=False, raster_cap=cap,
                                      raster_spans=spans),
            eye, K=64, label=f"full frame {name} (pairs bins)")
        bench(
            lambda e: pp.render_frame(scene, e, 0.0, w=W, h=H,
                                      per_pixel=pp_flag, shader_idx=5,
                                      show_cm=False, raster_cap=cap),
            eye, K=64, label=f"full frame {name} (dense bins)")

    # --- stages
    def t_xform(e):
        return pp.transform_vertices(scene, e, W, H)

    bench(t_xform, eye, K=256, label="transform_vertices")

    def t_setup(e):
        vp, _, _ = t_xform(e)
        return setup_triangles(vp, scene.tris, W, H)

    bench(t_setup, eye, K=256, label="+ setup_triangles")

    vp, world, n_world = jax.jit(t_xform)(eye)
    setup = jax.jit(t_setup)(eye)

    bench(lambda s: bin_triangles(s, H, W, cap), setup, K=64,
          label="bin_triangles (dense cov+argsort+gather)")
    bench(lambda s: bin_pairs(s, H, W, cap, spans[0], spans[1]), setup, K=64,
          label="bin_pairs (flat sort+searchsorted+gather)")

    # binning sub-stages
    import rustexp_tpu.ops.raster_pallas as rp

    def t_cov(s):
        nty, ntx = H // 32, W // 128
        tx = jnp.arange(ntx, dtype=jnp.int32)
        ty = jnp.arange(nty, dtype=jnp.int32)
        tx_lo = s.min_x // 128
        tx_hi = (s.max_x - 1) // 128
        ty_lo = s.min_y // 32
        ty_hi = (s.max_y - 1) // 32
        cov_x = (tx[None, :] >= tx_lo[:, None]) & (tx[None, :] <= tx_hi[:, None])
        cov_y = (ty[None, :] >= ty_lo[:, None]) & (ty[None, :] <= ty_hi[:, None])
        cov = cov_y[:, :, None] & cov_x[:, None, :] & s.valid[:, None, None]
        return cov.reshape(-1, nty * ntx)

    bench(t_cov, setup, K=256, label="coverage matrix")
    cov = jax.jit(t_cov)(setup)
    bench(lambda c: jnp.argsort(~c, axis=0, stable=True)[:cap], cov, K=64,
          label="argsort compaction")
    T = int(setup.A.shape[0])
    nT = int(cov.shape[1])

    # primitives
    bench(lambda c: jnp.cumsum(c.astype(jnp.int32), axis=0), cov, K=256,
          label=f"cumsum i32 [{T},{nT}]")

    # blocked lower-triangular matmul rank (exclusive cumsum)
    B = 512
    nB = (T + B - 1) // B
    Tp = nB * B
    lt = jnp.tril(jnp.ones((B, B), jnp.float32), k=-1)

    def t_ltrank(c):
        cp = jnp.pad(c.astype(jnp.float32), ((0, Tp - T), (0, 0)))
        cb = cp.reshape(nB, B, nT)
        within = jnp.einsum("st,bto->bso", lt, cb,
                            preferred_element_type=jnp.float32)
        block_tot = cb.sum(axis=1)
        offs = jnp.cumsum(block_tot, axis=0) - block_tot
        return (within + offs[:, None, :]).reshape(Tp, nT)[:T]

    bench(t_ltrank, cov, K=256, label=f"LT-matmul exclusive rank [{T},{nT}]")

    # scatter / gather costs at pair scale
    for n_idx in (32768, 147456):
        idx = jnp.asarray(np.random.default_rng(0).integers(0, nT * cap, n_idx),
                          jnp.int32)
        src = jnp.zeros((nT * cap,), jnp.float32)
        vals = jnp.ones((n_idx,), jnp.float32)
        bench(lambda i: src.at[i].set(vals, mode="drop"), idx, K=256,
              label=f"scatter f32 [{n_idx}] -> [{nT * cap}]")
        bench(lambda i: src[i], idx, K=256, label=f"gather f32 [{n_idx}]")
        rows = jnp.zeros((nT * cap, 19), jnp.float32)
        vrows = jnp.ones((n_idx, 19), jnp.float32)
        bench(lambda i: rows.at[i].set(vrows, mode="drop"), idx, K=256,
              label=f"scatter rows [{n_idx}, 19]")
        bench(lambda i: rows[i], idx, K=256, label=f"gather rows [{n_idx}, 19]")

    for n_sort in (147456, T * nT):
        keys = jnp.asarray(
            np.random.default_rng(0).integers(0, 1 << 30, n_sort), jnp.int32)
        bench(lambda k: jnp.sort(k), keys, K=64, label=f"sort i32 [{n_sort}]")

    # kernel alone (pre-binned, pairs)
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

    for flag, nm, nn3 in ((False, "V", 0), (True, "P", 6)):
        extra, n2, n3 = mk_extra(flag)
        extra = jax.device_put(extra)
        bench(lambda s, e: raster_attrs_pallas(s, e, n2, n3, H, W, cap=cap,
                                               spans=spans),
              setup, extra, K=64, label=f"bin_pairs + attr kernel {nm}")

    # shading alone (P): planes of ones
    from rustexp_tpu.raster import shaders as sh
    planes = jnp.ones((H, W, 3), jnp.float32)

    def t_shade(p):
        return sh.shader_fn(5)(p, p, p, eye, tick, scene.cm)

    bench(t_shade, planes, K=128, label="shader 5 CMRefl over 512^2 (P)")

    from rustexp_tpu.core.colors import pack_abgr32_gamma_arith
    bench(lambda p: pack_abgr32_gamma_arith(p[..., 0], p[..., 1], p[..., 2]),
          planes, K=256, label="gamma pack 512^2")


if __name__ == "__main__":
    main()
