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


def _need_devices(n):
    import jax

    if len(jax.devices()) < n:
        import pytest

        pytest.skip("needs >= %d devices (conftest forces 8 on CPU)" % n)


def test_devices_flag_runs_sharded(capsys):
    _need_devices(2)
    rc = cli.main(["gol", "--frames", "1", "--devices", "2", "--size", "64"])
    assert rc in (None, 0)
    assert "device" in capsys.readouterr().out.lower()


def test_devices_keys_select_gol_pattern(capsys):
    """--keys applies the reference keybindings before sharding: 'G' seeds
    the Gosper gun, and the sharded run's status must reflect real work."""
    _need_devices(2)
    rc = cli.main(["gol", "--frames", "1", "--devices", "2", "--size", "64",
                   "--keys", "G"])
    assert rc in (None, 0)
    assert "2 dev" in capsys.readouterr().out


def test_devices_keys_select_raster_scene(tmp_path, capsys):
    """QQQ walks the mesh registry back to the Cube; the sharded flat-queue
    render must report the selected mesh, not the Killeroo default."""
    _need_devices(2)
    out = str(tmp_path / "r")
    rc = cli.main(["rasterizer", "--frames", "1", "--devices", "2",
                   "--size", "128", "--keys", "QQQA", "--out", out])
    assert rc in (None, 0)
    text = capsys.readouterr().out
    assert "Cube" in text and "12 Tri" in text
    assert os.path.exists(f"{out}_000.png")


def test_devices_animate_conflict_fails_loudly():
    import pytest

    with pytest.raises(SystemExit, match="single device"):
        cli.main(["rasterizer", "--devices", "2", "--animate", "2"])


def test_devices_nbody_uneven_bodies_fail_loudly():
    """5 bodies (keys 'E') cannot shard over 2 devices — clear error, not
    a shape crash."""
    import pytest

    _need_devices(2)
    with pytest.raises(SystemExit, match="shard evenly"):
        cli.main(["nbody", "--frames", "1", "--devices", "2", "--size",
                  "64", "--keys", "E"])
