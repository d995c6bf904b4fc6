#!/usr/bin/env python
"""A/B: compacted-shade granularity sweep (VERDICT r4 #7).

The compacted deferred shade gathers OCCUPIED 128-px row-blocks; on
silhouette-heavy scenes most of a row-block's pixels are background
(TorusKnotP: 75.5% of the frame occupied at 128-px blocks vs 57.9% at
32-px — measured from the pair AABBs). This prototype rebuilds the
occupied-block list at sub-block granularity (host-side, same AABB
superset semantics as build_queue's rows) and times the fixed-eye frame
loop with pipeline._shade_compacted(block_w=sub_w).

Cost model being tested: gather ~2.6 ns/index + ~0.5 ns/element,
scatter-back ~25 ns/index — finer blocks trade fewer shaded elements
for more scatter indices.

Usage: python tools/proto_subshade.py [cpu]   # cpu = correctness only
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import numpy as np


def fine_rows(setup, h, w, sub_w, margin=2):
    import jax.numpy as jnp

    nsub = w // sub_w
    mnx, mxx = np.asarray(setup.min_x), np.asarray(setup.max_x)
    mny, mxy = np.asarray(setup.min_y), np.asarray(setup.max_y)
    valid = np.asarray(setup.valid) & (mxx > mnx) & (mxy > mny)
    occ = np.zeros((h, nsub), bool)
    for t in np.nonzero(valid)[0]:
        y0, y1 = max(mny[t] - margin, 0), min(mxy[t] + margin, h)
        x0 = max(mnx[t] - margin, 0) // sub_w
        x1 = (min(mxx[t] + margin, w) - 1) // sub_w + 1
        occ[y0:y1, x0:x1] = True
    ids = np.nonzero(occ.reshape(-1))[0].astype(np.int32)
    # pad to a 64-quantized cap with out-of-range ids (shade drops them)
    cap = -(-len(ids) // 64) * 64
    pad = np.full(cap - len(ids), h * nsub, np.int32)
    return jnp.asarray(np.concatenate([ids, pad])), len(ids)


def run_scene(mesh_idx, sub_w, runs=10, check=False):
    import jax
    import jax.numpy as jnp

    from rustexp_tpu.app.benchmark import ENV, SHADER, TICK, W, H
    from rustexp_tpu.assets import cubemap, mesh
    from rustexp_tpu.ops.raster_setup import setup_triangles_planar
    from rustexp_tpu.raster import camera, pipeline as pp

    m = mesh.get_mesh(mesh_idx)
    scene = pp.make_scene(m, cubemap.get_cm_set(ENV))
    eye = camera.camera_eye(mesh.mesh_camera(mesh_idx), TICK)
    queue = pp.build_scene_queue(scene, eye, W, H)

    # Rebuild the rows list at sub_w regardless of what build_scene_queue
    # chose for this scene; the queue CARRIES its granularity (round-5
    # Queue.shade_w, static pytree structure), so swapping both fields is
    # all it takes — the shade path follows automatically.
    from rustexp_tpu.ops.raster_queue import StaticInt

    xs, ys, zs, _, _, _ = pp.transform_corners_planar(scene, eye, W, H)
    setup = setup_triangles_planar(xs, ys, zs, W, H)
    rows, n_occ = fine_rows(setup, H, W, sub_w)
    queue = queue._replace(rows=rows, shade_w=StaticInt(sub_w))

    K = 1024

    @jax.jit
    def frames(scene, queue, eyes):
        def body(c, e):
            fb, stale = pp.render_frame(
                scene, e, TICK, w=W, h=H, mode=pp.MODE_FILL,
                per_pixel=True, shader_idx=SHADER, bg_idx=0,
                show_cm=False, backend="queue", raster_queue=queue,
                return_overflow=True)
            return c, jnp.sum(fb, dtype=jnp.uint32) + stale.astype(jnp.uint32)
        _, sums = jax.lax.scan(body, 0, eyes)
        return sums

    if check:
        fb, _ = pp.render_frame(
            scene, jnp.asarray(eye), TICK, w=W, h=H, mode=pp.MODE_FILL,
            per_pixel=True, shader_idx=SHADER, bg_idx=0, show_cm=False,
            backend="queue", raster_queue=queue, return_overflow=True)
        return np.asarray(fb), n_occ
    eyes = jnp.broadcast_to(jnp.asarray(eye), (K, 3))
    np.asarray(frames(scene, queue, eyes))
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        np.asarray(frames(scene, queue, eyes))
        best = min(best, (time.perf_counter() - t0) / K)
    return best * 1e6, n_occ


def main():
    cpu = "cpu" in sys.argv[1:]
    if cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
        # correctness: fine-grained shade must be bit-identical
        for mesh_idx, name in ((6, "TorusKnotP"),):
            ref, _ = run_scene(mesh_idx, 128, check=True)
            for sub_w in (64, 32):
                got, n_occ = run_scene(mesh_idx, sub_w, check=True)
                ok = np.array_equal(ref, got)
                print(f"{name} sub_w={sub_w}: bit-equal={ok} "
                      f"(occ blocks {n_occ})", flush=True)
                assert ok
        return
    for mesh_idx, name in ((6, "TorusKnotP"), (11, "CornellBoxP"),
                           (0, "KillerooP")):
        for sub_w in (128, 64, 32):
            us, n_occ = run_scene(mesh_idx, sub_w)
            print(f"{name:<12} sub_w={sub_w:3d}: {us:7.1f} us "
                  f"(occ {n_occ} x {sub_w}px = "
                  f"{n_occ * sub_w / (512 * 512) * 100:.0f}% of frame)",
                  flush=True)


if __name__ == "__main__":
    main()
