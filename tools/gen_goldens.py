#!/usr/bin/env python
"""Generate the reference-scene goldens (CPU; run from repo root).

Writes tests/goldens/ref_<scene>.npz for the four frozen 512^2 frames and
tests/goldens/ref_checksums.json with the framebuffer checksum of all 12
bench scenes (rasterizer.rs:1791-1812 configs: 512^2, Fill, CMRefl, Grace,
tick 0). Renders use the XLA oracle backend — the backends are proven
pairwise bit-equal by tests/test_raster.py, so one anchor serves all.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, ".")
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np
import jax.numpy as jnp

from rustexp_tpu.app.benchmark import SCENES, W, H, SHADER, TICK
from rustexp_tpu.assets import cubemap, mesh
from rustexp_tpu.raster import camera, pipeline as pp

GOLDEN_DIR = os.path.join("tests", "goldens")
FROZEN = {"KillerooV", "KillerooP", "CornellBoxV", "CornellBoxP"}


def main():
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    sums = {}
    for label, mesh_idx, per_pixel, _ref in SCENES:
        m = mesh.get_mesh(mesh_idx)
        scene = pp.make_scene(m, cubemap.get_cm_set(0))
        eye = jnp.asarray(camera.camera_eye(mesh.mesh_camera(mesh_idx), TICK))
        fb = np.asarray(pp.render_frame(
            scene, eye, TICK, w=W, h=H, per_pixel=per_pixel,
            shader_idx=SHADER, show_cm=False, backend="xla"))
        sums[label] = int(fb.astype(np.uint64).sum())
        if label in FROZEN:
            np.savez_compressed(
                os.path.join(GOLDEN_DIR, f"ref_{label}.npz"), fb=fb)
        print(f"{label:<12} checksum {sums[label]:#x}", flush=True)
    with open(os.path.join(GOLDEN_DIR, "ref_checksums.json"), "w") as f:
        json.dump(sums, f, indent=1)
    print("wrote", GOLDEN_DIR)


if __name__ == "__main__":
    main()
