#!/usr/bin/env python
"""A/B the round-5 plane-ordered queue build on the live chip.

Three questions, answered same-session (chip-day variance rules):
  1. What does the (z, tri) tie-break + 12th int channel cost on the
     FIXED-eye path (cached queue, kernel-bound)?  -> fixed KillerooP A/B
  2. What does the plane build save on the MOVING path (in-graph rebuild
     per frame)?  -> moving KillerooP / HeadV / Killeroo V A/B
  3. Auto-order sanity on a small mesh (TorusKnotP moving).

Usage: python tools/ab_planesort.py [quick]
"""

from __future__ import annotations

import functools
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main(quick: bool = False):
    from rustexp_tpu.app import benchmark as bm
    from rustexp_tpu.ops import raster_queue as rq
    from rustexp_tpu.raster import pipeline as pp

    orig_build = rq.build_queue
    orig_attrs = rq.raster_attrs_queue

    def set_mode(order: str, tie: bool):
        rq.build_queue = functools.partial(orig_build, order=order)
        rq.raster_attrs_queue = functools.partial(orig_attrs, tie=tie)

    def fixed(name, mesh_idx, per_pixel, runs=16):
        best = bm.bench_scene(mesh_idx, per_pixel, runs=runs)
        print(f"  {name}: {best * 1e6:8.1f} us", flush=True)
        return best * 1e6

    def moving(name, mesh_idx, per_pixel, k=128):
        r = bm.bench_scene_moving(mesh_idx, per_pixel, runs=3, k=k)
        print(f"  {name}: {r['value']:8.1f} us", flush=True)
        return r["value"]

    out = {}
    t0 = time.time()
    print("== 1. tie-break cost, fixed KillerooP (cached queue) ==")
    set_mode("tri", False)
    out["fixed_KP_tri_notie"] = fixed("tri,  tie=off", 0, True)
    set_mode("tri", True)
    out["fixed_KP_tri_tie"] = fixed("tri,  tie=on ", 0, True)

    print("== 2. moving-path build A/B ==")
    for label, mesh_idx, per_pixel in (
        ("KillerooP", 0, True), ("HeadV", 1, False), ("KillerooV", 0, False),
        ("TorusKnotP", 6, True),
    ):
        if quick and label not in ("KillerooP", "HeadV"):
            continue
        set_mode("tri", True)
        out[f"mv_{label}_tri"] = moving(f"{label} tri  ", mesh_idx, per_pixel)
        set_mode("auto", True)
        out[f"mv_{label}_auto"] = moving(f"{label} plane", mesh_idx, per_pixel)

    rq.build_queue = orig_build
    rq.raster_attrs_queue = orig_attrs
    print(f"== done in {time.time() - t0:.0f}s ==")
    for k, v in out.items():
        print(f"{k:>22}: {v:9.1f} us")


if __name__ == "__main__":
    main(quick="quick" in sys.argv[1:])
