#!/usr/bin/env python
"""Diagnose the 4 residual differing pixels (HandV 1 px, TorusKnotP 3 px).

Renders each scene live (CPU, backend=xla), runs the scalar oracle, and for
every differing pixel prints coordinates and both ABGR values, decomposed to
channels, so the divergence point (which channel, how many LSB) is visible.
"""

import os
import subprocess
import sys

sys.path.insert(0, ".")
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from rustexp_tpu.app.benchmark import SCENES
from rustexp_tpu.assets import cubemap, mesh, paths
from rustexp_tpu.raster import camera, pipeline as pp

ORACLE = os.path.join("tools", "ref_oracle", "oracle")


def channels(v):
    return (v & 0xFF, (v >> 8) & 0xFF, (v >> 16) & 0xFF, (v >> 24) & 0xFF)


def main():
    subprocess.run(["make", "-C", os.path.dirname(ORACLE)], check=True,
                   capture_output=True)
    for label in sys.argv[1:] or ["HandV", "TorusKnotP"]:
        _, mesh_idx, per_pixel, _ref = next(s for s in SCENES if s[0] == label)
        m = mesh.get_mesh(mesh_idx)
        scene = pp.make_scene(m, cubemap.get_cm_set(0))
        eye = jnp.asarray(camera.camera_eye(mesh.mesh_camera(mesh_idx), 0.0))
        fb = np.asarray(pp.render_frame(scene, eye, 0.0, w=512, h=512,
                                        per_pixel=per_pixel, shader_idx=5,
                                        show_cm=False, backend="xla"))
        out = f"/tmp/orc_{label}.raw"
        subprocess.run([ORACLE, "rast", paths.asset_root(), str(mesh_idx),
                        "5", "0", "0", "1" if per_pixel else "0", "0.0",
                        "512", "512", out, "0"], check=True)
        orc = np.fromfile(out, np.uint32).reshape(512, 512)
        ys, xs = np.nonzero(orc != fb)
        print(f"== {label}: {len(ys)} differing px")
        for y, x in zip(ys, xs):
            e, o = int(fb[y, x]), int(orc[y, x])
            print(f"  ({x},{y})  engine={e:08x} {channels(e)}  "
                  f"oracle={o:08x} {channels(o)}")


if __name__ == "__main__":
    main()
