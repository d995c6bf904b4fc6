#!/usr/bin/env python
"""Same-session A/B: compacted-shade granularity 64 vs 128, production paths.

Unlike tools/proto_subshade.py (host-built per-triangle rows lists), this
drives the REAL production paths — bench_scene / bench_scene_moving with the
queue built by build_queue at the forced granularity — so the numbers include
the per-tile-extent rows list and (for moving) the per-frame in-graph build
cost of the finer occupancy. Cross-session bench comparisons mix chip-day
variance (±5-15%) into the verdict; this runs both arms back to back.

Used to calibrate ops.raster_queue.choose_shade_w's thresholds.

Usage: python tools/ab_shadew.py [fixed|moving] [runs]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

SCENES_P = [(0, "KillerooP"), (1, "HeadP"), (4, "HandP"),
            (6, "TorusKnotP"), (11, "CornellBoxP")]


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    from rustexp_tpu.app import benchmark as bm

    if which in ("fixed", "both"):
        print("# fixed-eye (cached queue): us best-of-%d" % runs, flush=True)
        for mi, name in SCENES_P:
            row = {}
            for sw in (128, 64):
                row[sw] = bm.bench_scene(mi, True, runs, shade_w=sw) * 1e6
            d = (row[64] - row[128]) / row[128] * 100
            print(f"fixed {name:12s} 128: {row[128]:7.1f}  64: {row[64]:7.1f}"
                  f"  delta64 {d:+5.1f}%", flush=True)
    if which in ("moving", "both"):
        print("# moving (per-frame in-graph rebuild): us/frame", flush=True)
        for mi, name in SCENES_P:
            row = {}
            for sw in (128, 64):
                row[sw] = bm.bench_scene_moving(
                    mi, True, runs=max(2, runs // 2), k=128,
                    shade_w=sw)["value"]
            d = (row[64] - row[128]) / row[128] * 100
            print(f"moving {name:12s} 128: {row[128]:7.1f}  64: {row[64]:7.1f}"
                  f"  delta64 {d:+5.1f}%", flush=True)


if __name__ == "__main__":
    main()
