"""Smoke tests for the headless CLI driver (app/cli.py) — the user
entry point replacing the reference's GLFW loop. Small sizes keep this
CPU-cheap; deep behavior is covered by the per-sim test files."""

import os

from rustexp_tpu.app import cli


def test_gol_grid_steps_keys_png(tmp_path, capsys):
    out = str(tmp_path / "g")
    rc = cli.main(["gol", "--frames", "2", "--grid", "64",
                   "--steps-per-frame", "2", "--keys", "G",
                   "--size", "128", "--out", out])
    assert rc in (None, 0)
    assert os.path.exists(f"{out}_000.png") and os.path.exists(f"{out}_001.png")
    text = capsys.readouterr().out
    assert "64x64 Grid" in text          # --grid honored + status truthful
    assert "4 Gens" in text              # 2 frames x 2 steps_per_frame


def test_sine_smoke(capsys):
    rc = cli.main(["sine", "--frames", "1", "--size", "64", "--no-overlay"])
    assert rc in (None, 0)
    assert "frames in" in capsys.readouterr().out


def test_checkpoint_roundtrip_flags(tmp_path, capsys):
    path = str(tmp_path / "st.npz")
    cli.main(["gol", "--frames", "1", "--grid", "64", "--size", "64",
              "--save-state", path])
    assert os.path.exists(path)
    cli.main(["gol", "--frames", "1", "--size", "64",
              "--load-state", path])
    text = capsys.readouterr().out
    assert "resumed from" in text
    assert "64x64 Grid" in text          # grid size restored, not default


def test_devices_flag_runs_sharded(capsys):
    import jax

    if len(jax.devices()) < 2:
        import pytest

        pytest.skip("needs >= 2 devices (conftest forces 8 on CPU)")
    rc = cli.main(["gol", "--frames", "1", "--devices", "2", "--size", "64"])
    assert rc in (None, 0)
    assert "device" in capsys.readouterr().out.lower()
