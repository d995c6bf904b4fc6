"""Routing/planning logic of the benchmark + GoL banded machinery.

Pure-Python planner checks pin the measured hardware optima (they must
never silently change), and tiny interpret-mode runs lock the
bench_gol banded branch and the chain helper's remainder dispatch."""

import jax.numpy as jnp
import numpy as np

from rustexp_tpu.ops import gol_bits, gol_stencil


def test_pick_plan_reproduces_measured_optima():
    """The cost model must keep choosing the plans the v5e sweep measured
    as fastest (BASELINE.md GoL scaling table): 2048-row bands at 4096^2,
    1024 at 8192^2, 256 at 16384^2 — all at 128 gens/dispatch."""
    assert gol_bits.pick_plan(4096, 4096, 65536) == (2048, 128)
    assert gol_bits.pick_plan(8192, 8192, 65536) == (1024, 128)
    assert gol_bits.pick_plan(16384, 16384, 65536) == (256, 128)


def test_pick_band_counts_sublane_padding():
    """Feasibility must use sublane-PADDED word-rows: a [20, 16384] block
    (nominal 1.25 MB) really allocates 24 rows and failed TPU compile at
    17.45 MB scoped VMEM, while same-words [40, 8192] runs."""
    # band 512 @ k=64 on a 16384-wide grid would be the [20, 16384] block
    b = gol_bits.pick_band(16384, 16384, 64)
    hw = 2  # ceil(64/32)
    bw = b // 32
    assert gol_bits._pad8(bw + 2 * hw) * 16384 <= gol_bits.VMEM_BLOCK_WORDS
    assert b != 512  # the unpadded-count answer


def test_chain_remainder_dispatch():
    """multi_step_packed_chain splits k = full*kk + rem into fori_loop
    dispatches plus one smaller remainder dispatch on the same band; the
    result must equal the roll oracle for k values that do not divide."""
    rng = np.random.default_rng(6)
    g = jnp.asarray(rng.integers(0, 2, (128, 256)).astype(np.int32))
    budget = 3000  # deep halos infeasible -> kk halves below k
    k = 300
    band, kk = gol_bits.pick_plan(128, 256, k, budget=budget)
    assert k % kk != 0, (k, kk)  # the case under test
    out = gol_bits.unpack_rows(gol_bits.multi_step_packed_chain(
        gol_bits.pack_rows(g), k, budget=budget))
    want = np.asarray(gol_stencil.multi_step(g, k, "roll"))
    np.testing.assert_array_equal(np.asarray(out), want)


def test_bench_gol_banded_branch(monkeypatch):
    """bench_gol's big-grid route must produce a well-formed metric via
    the banded chain (forced at test size by shrinking MAX_CELLS)."""
    from rustexp_tpu.app import benchmark

    monkeypatch.setattr(gol_bits, "MAX_CELLS", 0)
    out = benchmark.bench_gol(generations_per_dispatch=8, runs=1, n=64)
    assert out["metric"] == "gol_cell_updates_per_s"
    assert out["value"] > 0 and out["gens_per_s"] > 0
