#!/usr/bin/env python
"""Minimal repro for the XLA:TPU gather+select+scatter fusion miscompile.

The production pipeline carries a load-bearing ``jax.lax.optimization_barrier``
in its compacted-shade scatter-back (raster/pipeline.py:574,637): without it,
XLA:TPU fuses the compaction row-gathers + ``jnp.where`` select + the
``.at[rows].set`` scatter into one kernel that writes whole occupied tiles
as zeros (black). Each op alone is correct; the barriered form is correct;
only the fused composition miscompiles. This script distills that pattern
to its minimal standalone form (whether THIS reduction still triggers the
bug must be checked on the TPU backend — the full-pipeline regression test
is tests/test_raster.py's drift-holes golden), kept so that

  * a new XLA release can be re-checked in seconds (if BARRIERED == UNFUSED
    == FUSED, the bug is fixed and the barrier can be retired), and
  * the failure is demonstrable outside the full rasterizer when filing
    a compiler bug.

Run on the target backend (TPU shows the bug; CPU compiles it correctly):

    python tools/repro_fusion_miscompile.py

Exit status: 0 = fusion correct on this backend (bug absent or fixed),
1 = miscompile reproduced (keep the barrier), 2 = unexpected mismatch shape.
"""

from __future__ import annotations

import os
import sys

import jax

# The terminal's sitecustomize pins jax_platforms to "axon,cpu" at
# interpreter start, overriding JAX_PLATFORMS. Re-pin from the env so
# `JAX_PLATFORMS=cpu python tools/repro_fusion_miscompile.py` really runs
# on CPU (same dance as tests/conftest.py).
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
import jax.numpy as jnp
import numpy as np

# Shapes mirror the production site at 512^2: a [H*ntx, 128] row-blocked
# framebuffer, a compacted row list of ~1/4 occupancy with out-of-bounds
# padding entries, and a boolean coverage mask over the compacted rows.
NROWS = 2048          # h * ntx for a 512x512 frame at TILE_W=128 is 2048
TILE_W = 128
RC = 512              # compacted row capacity (25% occupancy + padding)
NVALID = 384


def build_inputs(seed: int = 0):
    rng = np.random.default_rng(seed)
    bgv = jnp.asarray(
        rng.integers(0, 2**32, (NROWS, TILE_W), dtype=np.uint64)
        .astype(np.uint32))
    rows = np.full((RC,), NROWS + 7, dtype=np.int32)     # pad = OOB sentinel
    rows[:NVALID] = rng.choice(NROWS, NVALID, replace=False)
    mask = rng.random((RC, TILE_W)) < 0.6
    plane = rng.random((NROWS, TILE_W), dtype=np.float32) + 0.5
    return bgv, jnp.asarray(rows), jnp.asarray(mask), jnp.asarray(plane)


def scatter_back(bgv, rows, mask, plane, *, barrier: bool):
    """The production pattern: gather -> arith -> select -> scatter."""
    padr = rows >= NROWS
    rows_g = jnp.where(padr, 0, rows)
    comp = plane[rows_g]                       # compaction row-gather
    packed = (comp * 255.0).astype(jnp.uint32) # stand-in for the gamma pack
    merged = jnp.where(mask, packed, bgv[rows_g])
    rows_s = jnp.where(padr, NROWS, rows)      # pads scatter out of bounds
    if barrier:
        merged = jax.lax.optimization_barrier(merged)
    return bgv.at[rows_s].set(merged, mode="drop")


def main() -> int:
    bgv, rows, mask, plane = build_inputs()
    fused = jax.jit(lambda *a: scatter_back(*a, barrier=False))
    guarded = jax.jit(lambda *a: scatter_back(*a, barrier=True))
    # Eager/op-by-op reference: no fusion possible.
    with jax.disable_jit():
        want = np.asarray(scatter_back(bgv, rows, mask, plane, barrier=False))

    got_fused = np.asarray(fused(bgv, rows, mask, plane))
    got_guarded = np.asarray(guarded(bgv, rows, mask, plane))

    backend = jax.default_backend()
    ok_guarded = np.array_equal(want, got_guarded)
    ok_fused = np.array_equal(want, got_fused)
    print(f"backend={backend} guarded={'OK' if ok_guarded else 'BAD'} "
          f"fused={'OK' if ok_fused else 'BAD'}")
    if not ok_guarded:
        # The barriered form is the production path — it must never break.
        bad = np.argwhere(want != got_guarded)
        print(f"UNEXPECTED: barriered form mismatches at {bad[:4]} "
              f"({len(bad)} px)")
        return 2
    if not ok_fused:
        bad = np.argwhere(want != got_fused)
        n_zero = int((got_fused[want != got_fused] == 0).sum())
        print(f"MISCOMPILE reproduced: {len(bad)} px differ "
              f"({n_zero} written as zero); first at {bad[:4].tolist()}")
        print("Keep the optimization_barrier in raster/pipeline.py.")
        return 1
    print("Fusion compiles correctly on this backend — if this is a TPU "
          "run on a new jax/XLA release, the barrier can be re-evaluated.")
    return 0


if __name__ == "__main__":
    sys.exit(main())
