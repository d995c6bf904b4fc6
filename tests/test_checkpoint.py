"""Checkpoint/resume: save_state/load_state round trips (beyond-reference
aux subsystem — the reference can only re-seed, SURVEY.md §5)."""

import numpy as np
import pytest

from rustexp_tpu.core.checkpoint import load_state, save_state


def test_gol_resume_bit_exact(tmp_path):
    """Interrupted-and-resumed evolution == uninterrupted evolution."""
    from rustexp_tpu.sims.gol import GoLExperiment

    exp = GoLExperiment()
    ref = exp.init(pattern="gun")
    for _ in range(6):
        ref = exp.step(ref)

    st = exp.init(pattern="gun")
    for _ in range(3):
        st = exp.step(st)
    p = tmp_path / "gol.npz"
    save_state(p, st)
    st2 = load_state(p, exp)
    assert st2.generations == st.generations
    for _ in range(3):
        st2 = exp.step(st2)
    np.testing.assert_array_equal(np.asarray(st2.grid), np.asarray(ref.grid))


def test_nbody_resume_exact_arrays(tmp_path):
    from rustexp_tpu.sims.nbody import NBodyExperiment

    exp = NBodyExperiment()
    st = exp.init(mode="orbits", n=256)
    st = exp.step(exp.step(st))
    st.dt = 0.02
    st.theta = 0.0  # brute route
    p = tmp_path / "nb.npz"
    save_state(p, st)
    st2 = load_state(p, exp)
    assert st2.dt == 0.02 and st2.theta == 0.0 and st2.steps == st.steps
    for name in ("px", "py", "vx", "vy", "m"):
        np.testing.assert_array_equal(np.asarray(getattr(st2, name)),
                                      np.asarray(getattr(st, name)))
    # resumed state steps (same routing) and matches continuing the original
    a = exp.step(st)
    b = exp.step(st2)
    np.testing.assert_array_equal(np.asarray(a.px), np.asarray(b.px))


def test_raster_state_roundtrip(tmp_path):
    from rustexp_tpu.sims.rasterizer import RasterizerExperiment

    exp = RasterizerExperiment()
    st = exp.init()
    st = exp.handle_key(st, "W")  # mesh 1
    st = exp.handle_key(st, "S")  # shader 6
    st = exp.handle_key(st, "P")  # per-pixel on
    p = tmp_path / "rast.npz"
    save_state(p, st)
    st2 = load_state(p, exp)
    assert (st2.mesh_idx, st2.shader_idx, st2.per_pixel) == (1, 6, True)
    assert st2._scene_cache is None  # transient cache rebuilt lazily


def test_extensionless_path_roundtrip(tmp_path):
    # Regression: np.savez appended ".npz" while load opened the bare
    # path — `--save-state /tmp/st` then `--load-state /tmp/st` died.
    from rustexp_tpu.sims.gol import GoLExperiment

    exp = GoLExperiment()
    st = exp.init(pattern="acorn")
    written = save_state(tmp_path / "bare", st)
    assert str(written).endswith("bare.npz")
    st2 = load_state(tmp_path / "bare", exp)  # extensionless alias
    np.testing.assert_array_equal(np.asarray(st2.grid), np.asarray(st.grid))


def test_wrong_experiment_rejected(tmp_path):
    from rustexp_tpu.sims.gol import GoLExperiment
    from rustexp_tpu.sims.nbody import NBodyExperiment

    p = tmp_path / "x.npz"
    save_state(p, GoLExperiment().init())
    with pytest.raises(ValueError, match="GoLState"):
        load_state(p, NBodyExperiment())
