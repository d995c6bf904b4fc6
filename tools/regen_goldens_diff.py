#!/usr/bin/env python
"""Regenerate the 12 scene goldens from the live engine and diff vs oracle.

One-shot round-4 tool: after the exact-order vertex transform landed, the
stored goldens (old engine output) go stale. For each bench scene: render
live (CPU, backend=xla), compare against the scalar oracle, rewrite the
golden. Prints a per-scene diff table.
"""

import os
import subprocess
import sys
import time

sys.path.insert(0, ".")
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu"

import jax.numpy as jnp

from rustexp_tpu.app.benchmark import SCENES
from rustexp_tpu.assets import cubemap, mesh, paths
from rustexp_tpu.raster import camera, pipeline as pp

GOLDEN_DIR = os.path.join("tests", "goldens")
ORACLE = os.path.join("tools", "ref_oracle", "oracle")


def main():
    subprocess.run(["make", "-C", os.path.dirname(ORACLE)], check=True,
                   capture_output=True)
    total = 0
    for label, mesh_idx, per_pixel, _ref in SCENES:
        m = mesh.get_mesh(mesh_idx)
        scene = pp.make_scene(m, cubemap.get_cm_set(0))
        eye = jnp.asarray(camera.camera_eye(mesh.mesh_camera(mesh_idx), 0.0))
        t0 = time.time()
        fb = np.asarray(pp.render_frame(scene, eye, 0.0, w=512, h=512,
                                        per_pixel=per_pixel, shader_idx=5,
                                        show_cm=False, backend="xla"))
        out = f"/tmp/orc_{label}.raw"
        subprocess.run([ORACLE, "rast", paths.asset_root(), str(mesh_idx),
                        "5", "0", "0", "1" if per_pixel else "0", "0.0",
                        "512", "512", out, "0"], check=True)
        orc = np.fromfile(out, np.uint32).reshape(512, 512)
        diff = int((orc != fb).sum())
        total += diff
        np.savez_compressed(os.path.join(GOLDEN_DIR, f"ref_{label}.npz"),
                            fb=fb)
        print(f"{label:<12} {time.time()-t0:6.1f}s  differing px: {diff}",
              flush=True)
    print(f"TOTAL differing px: {total}")


if __name__ == "__main__":
    main()
