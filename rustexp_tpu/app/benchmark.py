"""The 12-scene rasterizer regression benchmark.

Port of the reference's built-in ``rast_benchmark`` (rasterizer.rs:1781-1884):
six meshes x {per-vertex, per-pixel} shading at 512x512, RenderMode::Fill,
shader 5 (CMRefl), envmap 0 (Grace), tick 0 — warm-up pass then best-of-N
wall-clock timing per scene, compared against the reference CPU's hardcoded
microsecond table (its ANSI regression report becomes a plain-text table
here, with TPU timings vs the CPU baseline).
"""

from __future__ import annotations

import time

import jax
import numpy as np

from ..assets import cubemap, mesh
from ..raster import camera, pipeline as pp

# (label, mesh_idx, per_pixel, reference_us) — rasterizer.rs:1791-1804
SCENES = (
    ("KillerooV", 0, False, 1812),
    ("HeadV", 1, False, 2500),
    ("HandV", 4, False, 910),
    ("TorusKnotV", 6, False, 1287),
    ("CubeV", 9, False, 1107),
    ("CornellBoxV", 11, False, 1326),
    ("KillerooP", 0, True, 2435),
    ("HeadP", 1, True, 3841),
    ("HandP", 4, True, 1689),
    ("TorusKnotP", 6, True, 3132),
    ("CubeP", 9, True, 3461),
    ("CornellBoxP", 11, True, 3786),
)

W = H = 512
SHADER = 5  # CMRefl
ENV = 0     # Grace
TICK = 0.0
REF_TOTAL_US = 27286  # rasterizer.rs:1829-1834


FRAMES_PER_DISPATCH = 64


def bench_scene(mesh_idx: int, per_pixel: bool, runs: int, backend: str = "pallas"):
    """Best-of-N per-frame seconds for one scene.

    Measurement methodology: K frames render back-to-back inside one jitted
    `lax.scan` (each reduced to a checksum that is pulled to the host), and
    per-frame time = wall / K. This measures sustained on-device throughput;
    per-dispatch timing through a remote-TPU tunnel would only measure the
    ~25 ms host round-trip. The scene matches the reference exactly
    (rasterizer.rs:1805-1812: tick 0, Fill, CMRefl, Grace, 512x512).
    """
    import jax.numpy as jnp
    import numpy as np

    m = mesh.get_mesh(mesh_idx)
    cm = cubemap.get_cm_set(ENV)
    scene = pp.make_scene(m, cm)
    eye = camera.camera_eye(mesh.mesh_camera(mesh_idx), TICK)
    cap = pp.suggest_cap(scene, eye, W, H) if backend != "xla" else None
    K = FRAMES_PER_DISPATCH
    eyes = jnp.broadcast_to(jnp.asarray(eye), (K, 3))

    @jax.jit
    def frames(scene, eyes):
        def body(c, e):
            fb = pp.render_frame(
                scene, e, TICK, w=W, h=H, mode=pp.MODE_FILL,
                per_pixel=per_pixel, shader_idx=SHADER, bg_idx=0,
                show_cm=False, backend=backend, raster_cap=cap,
            )
            return c, jnp.sum(fb, dtype=jnp.uint32)
        _, sums = jax.lax.scan(body, 0, eyes)
        return sums

    np.asarray(frames(scene, eyes))  # compile + warm-up (rasterizer.rs:1845)
    best = float("inf")
    for _ in range(max(1, runs // 8)):
        t0 = time.perf_counter()
        np.asarray(frames(scene, eyes))  # host pull forces real completion
        best = min(best, (time.perf_counter() - t0) / K)
    return best


def run_suite(runs: int = 20, backend: str = "pallas", verbose: bool = True):
    """Run all 12 scenes; return the headline JSON dict for bench.py."""
    rows = []
    total_s = 0.0
    ref_total = 0
    for label, mesh_idx, per_pixel, ref_us in SCENES:
        best = bench_scene(mesh_idx, per_pixel, runs, backend)
        total_s += best
        ref_total += ref_us
        us = best * 1e6
        rows.append((label, us, ref_us, ref_us / us))
        if verbose:
            print(f"# {label:<12} {us:9.0f} us   ref {ref_us:6d} us   "
                  f"speedup x{ref_us / us:6.2f}")
    mpix_s = len(rows) * W * H / total_s / 1e6
    if verbose:
        print(f"# total {total_s * 1e6:9.0f} us   ref {ref_total} us   "
              f"speedup x{ref_total / (total_s * 1e6):.2f}   {mpix_s:.0f} Mpix/s")
    return {
        "metric": "raster_suite_Mpix_per_s",
        "value": round(mpix_s, 1),
        "unit": "Mpix/s",
        "vs_baseline": round(ref_total / (total_s * 1e6), 3),
    }
