#!/usr/bin/env python
"""Per-scene raster floor table (VERDICT r3 next-4, "finalize the ceiling").

For each bench scene, computes the exact work quantities the roofline says
are irreducible under the bit-parity contract — tile x triangle PAIRS at
tile_h=16 (the queue kernel's SMEM scalar reads scale with pairs x 38
channels) and occupied ROW-BLOCKS (the compacted shade's cubemap-gather
cost scales with them) — then models each scene's floor from the
per-stage rates measured on v5e for KillerooP (docs/ROADMAP.md round-3
findings #3: geometry 152 us, pack+gather 232, kernel ~810 @ 21k pairs,
compacted shade 435). Stage constants are CALIBRATED on KillerooP's own
counts so the model reproduces its measured stage times, then applied to
every scene's counts. Output: markdown table floor-vs-measured.

Run on CPU: JAX_PLATFORMS=cpu python tools/scene_floors.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from rustexp_tpu.app.benchmark import SCENES
from rustexp_tpu.assets import cubemap, mesh
from rustexp_tpu.raster import camera, pipeline as pp
from rustexp_tpu.ops import raster_queue as rq
from rustexp_tpu.ops.raster_setup import setup_triangles

W = H = 512

# Measured KillerooP stage times on v5e (ROADMAP round-3 findings #3).
K_GEOM_US = 152.0
K_GATHER_US = 232.0
K_KERNEL_US = 810.0
K_SHADE_US = 435.0

# Round-3 measured per-scene totals (BASELINE.md round-3 table).
MEASURED_R3 = {
    "KillerooV": 976, "HeadV": 1386, "HandV": 296, "TorusKnotV": 272,
    "CubeV": 129, "CornellBoxV": 266, "KillerooP": 1405, "HeadP": 2529,
    "HandP": 742, "TorusKnotP": 1394, "CubeP": 1234, "CornellBoxP": 1275,
}


def scene_counts(mesh_idx: int):
    m = mesh.get_mesh(mesh_idx)
    scene = pp.make_scene(m, cubemap.get_cm_set(0))
    eye = jnp.asarray(camera.camera_eye(mesh.mesh_camera(mesh_idx), 0.0))
    vp, _, _ = pp.transform_vertices(scene, eye, W, H)
    s = setup_triangles(vp, scene.tris, W, H)
    stats = rq.queue_stats(s, H, W)
    # total tile x tri pairs (not chunk-quantized): rebuild the coverage sum
    ty0, ty1, tx0, tx1 = rq.tile_ranges(s, rq.TILE_H, rq.TILE_W)
    spans = jnp.where(s.valid, (ty1 - ty0 + 1) * (tx1 - tx0 + 1), 0)
    pairs = int(jnp.sum(spans))
    chunks, span_y, span_x, occ_rows = (int(x) for x in stats)
    n_tris = int(s.valid.sum())
    return scene, pairs, chunks, occ_rows, n_tris


def main():
    # Calibrate on KillerooP (mesh 0) counts
    _, k_pairs, k_chunks, k_rows, k_tris = scene_counts(0)
    geom_per_tri = K_GEOM_US / k_tris          # transform+setup scale w/ T
    gather_per_pair = K_GATHER_US / k_pairs
    kernel_per_pair = K_KERNEL_US / k_pairs
    shade_per_row = K_SHADE_US / k_rows        # P-mode cm gathers
    print(f"calibration (KillerooP): tris {k_tris}, pairs {k_pairs}, "
          f"chunks {k_chunks}, occ_rows {k_rows}")
    print(f"  geom {geom_per_tri * 1e3:.3f} ns/tri, gather "
          f"{gather_per_pair * 1e3:.1f} ns/pair, kernel "
          f"{kernel_per_pair * 1e3:.1f} ns/pair, shade "
          f"{shade_per_row * 1e3:.1f} ns/row-block-row\n")

    print("| Scene | tris | pairs | occ rows | floor µs | measured r3 µs "
          "| headroom |")
    print("|---|---:|---:|---:|---:|---:|---:|")
    total_floor = total_meas = 0.0
    for label, mesh_idx, per_pixel, _ref in SCENES:
        _, pairs, chunks, occ_rows, n_tris = scene_counts(mesh_idx)
        geom = geom_per_tri * n_tris
        gather = gather_per_pair * pairs
        kernel = kernel_per_pair * pairs
        shade = shade_per_row * occ_rows if per_pixel else 0.0
        floor = geom + gather + kernel + shade
        meas = MEASURED_R3[label]
        total_floor += floor
        total_meas += meas
        print(f"| {label} | {n_tris} | {pairs} | {occ_rows} | {floor:.0f} "
              f"| {meas} | {meas - floor:+.0f} |")
    print(f"| **total** | | | | **{total_floor:.0f}** | **{total_meas:.0f}**"
          f" | **{total_meas - total_floor:+.0f}** |")


if __name__ == "__main__":
    main()
