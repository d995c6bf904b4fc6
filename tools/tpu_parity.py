#!/usr/bin/env python
"""On-hardware fidelity: render the 12 bench scenes on the TPU and diff
against the stored CPU-chain goldens (VERDICT r4 missing #1).

The 12/12 + 32/32 bit-exact claim was, before round 5, verified entirely
on the CPU chain (C++ oracle <-> goldens <-> engine backends). This tool
closes the loop on the hardware the project is named for: every scene is
rendered ON THE TPU with the production backend (auto: flat-queue for
dense meshes, bins kernel for tiny ones) and compared byte-for-byte to
tests/goldens/ref_<scene>.npz. Run twice:

    python tools/tpu_parity.py                    # relaxed (default TPU)
    RUSTEXP_STRICT_IEEE=1 python tools/tpu_parity.py   # sealed build

and record both rows in docs/PARITY.md. The reference's semantic contract
is per-op scalar f32 (rasterizer.rs:1695-1744); differences here are the
TPU build's FMA/rounding trait, the same class as compiling the reference
with -ffp-contract=fast.

Emits one JSON line: per-scene differing-pixel counts + a sustained
suite timing in the chosen mode (so the strict-mode cost on-chip is a
recorded number, not an estimate).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main(time_suite: bool = True):
    import jax
    import jax.numpy as jnp

    from rustexp_tpu.app.benchmark import SCENES, W, H, SHADER, TICK
    from rustexp_tpu.assets import cubemap, mesh
    from rustexp_tpu.ops.ieee import strict_default
    from rustexp_tpu.raster import camera, pipeline as pp

    backend = jax.default_backend()
    mode = "strict" if strict_default() else "relaxed"
    print(f"# backend={backend} mode={mode}", file=sys.stderr, flush=True)

    golden_dir = os.path.join("tests", "goldens")
    out = {"backend": backend, "mode": mode, "scenes": {}}
    total_diff = 0
    t_start = time.time()
    for label, mesh_idx, per_pixel, _ref in SCENES:
        m = mesh.get_mesh(mesh_idx)
        scene = pp.make_scene(m, cubemap.get_cm_set(0))
        eye = jnp.asarray(camera.camera_eye(mesh.mesh_camera(mesh_idx), TICK))
        bk = "queue" if m.num_tris >= 1000 else "pallas"
        kw = {}
        if bk == "queue":
            kw["raster_queue"] = pp.build_scene_queue(scene, eye, W, H)
        fb = np.asarray(pp.render_frame(
            scene, eye, TICK, w=W, h=H, per_pixel=per_pixel,
            shader_idx=SHADER, show_cm=False, backend=bk, **kw))
        ref = np.load(os.path.join(golden_dir, f"ref_{label}.npz"))["fb"]
        diff = fb != ref
        n_diff = int(diff.sum())
        total_diff += n_diff
        # max per-channel byte delta among differing pixels
        if n_diff:
            a = fb[diff].view(np.uint8).reshape(-1, 4).astype(np.int16)
            b = ref[diff].view(np.uint8).reshape(-1, 4).astype(np.int16)
            max_d = int(np.abs(a - b).max())
        else:
            max_d = 0
        out["scenes"][label] = {"diff_px": n_diff, "max_chan_delta": max_d}
        print(f"# {label:<12} diff_px={n_diff:6d} max_chan_delta={max_d}",
              file=sys.stderr, flush=True)
    out["total_diff_px"] = total_diff
    out["render_wall_s"] = round(time.time() - t_start, 1)

    if time_suite and backend != "cpu":
        # Sustained suite timing in THIS mode (KillerooP + CornellBoxV as
        # representative dense/simple scenes; full-suite timing lives in
        # bench.py) — quantifies the strict-on cost on-chip.
        from rustexp_tpu.app import benchmark as bm

        for label, mesh_idx, per_pixel in (("KillerooP", 0, True),
                                           ("CornellBoxV", 11, False)):
            best = bm.bench_scene(mesh_idx, per_pixel, runs=12)
            out[f"sustained_us_{label}"] = round(best * 1e6, 1)
            print(f"# sustained {label}: {best * 1e6:.0f} us",
                  file=sys.stderr, flush=True)

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main(time_suite="notime" not in sys.argv[1:])
