"""Golden-output regression tests.

The reference has no tests; its QA is eyeballing known scenes (SURVEY.md
§4). These tests freeze that practice: fixed scenes render on CPU and must
match stored framebuffers bit-for-bit. If an intentional change shifts the
output, regenerate with:

    UPDATE_GOLDENS=1 python -m pytest tests/test_golden.py

and review the refreshed PNG-equivalent arrays in the diff.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")
UPDATE = bool(os.environ.get("UPDATE_GOLDENS"))


def _check(name: str, fb: np.ndarray, max_diff_frac: float = 0.0):
    """Compare against the stored golden.

    max_diff_frac > 0 tolerates a sprinkle of differing pixels: XLA:CPU
    fma fusion varies across host CPU generations, flipping the depth
    winner where two triangles tie within an ulp (and moving an N-body
    splat by a pixel). Integer paths (GoL) stay exact. Any real logic
    regression changes far more than 0.3% of pixels.
    """
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    path = os.path.join(GOLDEN_DIR, f"{name}.npz")
    if UPDATE or not os.path.exists(path):
        np.savez_compressed(path, fb=fb)
        if not UPDATE:
            pytest.skip(f"golden {name} created; rerun to verify")
    want = np.load(path)["fb"]
    diff = int((fb != want).sum())
    if diff > max_diff_frac * fb.size:
        raise AssertionError(
            f"golden {name}: {diff} of {fb.size} pixels differ "
            f"(allowed {int(max_diff_frac * fb.size)}). If the change is "
            f"intentional, rerun with UPDATE_GOLDENS=1."
        )


@pytest.fixture(scope="module")
def raster_scene():
    from rustexp_tpu.assets import cubemap, mesh
    from rustexp_tpu.raster import pipeline as pp

    return pp.make_scene(mesh.make_sphere(12, 24), cubemap.make_procedural_set())


def test_golden_raster_cmrefl_pixel(raster_scene):
    from rustexp_tpu.raster import camera, pipeline as pp

    fb = pp.render_frame(
        raster_scene, jnp.asarray(camera.cam_orbit(0.5)), 0.5, w=128, h=128,
        per_pixel=True, shader_idx=5, bg_idx=1, show_cm=True, backend="pallas",
    )
    _check("raster_sphere_cmrefl_p", np.asarray(fb), 0.003)


def test_golden_raster_plastic_vertex(raster_scene):
    from rustexp_tpu.raster import camera, pipeline as pp

    fb = pp.render_frame(
        raster_scene, jnp.asarray(camera.cam_orbit_front(1.3)), 1.3, w=128,
        h=128, per_pixel=False, shader_idx=3, bg_idx=0, show_cm=False,
        backend="pallas",
    )
    _check("raster_sphere_plastic_v", np.asarray(fb), 0.003)


def test_golden_raster_wireframe(raster_scene):
    from rustexp_tpu.raster import camera, pipeline as pp

    fb = pp.render_frame(
        raster_scene, jnp.asarray(camera.cam_pan_front(0.2)), 0.2, w=128,
        h=128, mode=pp.MODE_LINE, shader_idx=0, bg_idx=4, show_cm=False,
    )
    _check("raster_sphere_wire", np.asarray(fb), 0.003)


def test_golden_gol_gun():
    from rustexp_tpu.assets.gol_patterns import PATTERNS, pattern_to_array
    from rustexp_tpu.ops import gol_stencil
    from rustexp_tpu.sims.gol import gol_render, set_pattern

    grid = set_pattern(pattern_to_array(PATTERNS["gun"]))
    grid = gol_stencil.multi_step(grid, 64, "mxu")
    fb = gol_render(grid, jnp.zeros(256), jnp.zeros(256))
    _check("gol_gun_64", np.asarray(fb))


def test_golden_nbody_orbits():
    from rustexp_tpu.ops import nbody_forces
    from rustexp_tpu.sims.nbody import nbody_render, stable_orbits

    px, py, vx, vy, m = stable_orbits(jax.random.PRNGKey(0), 512)
    for _ in range(4):
        px, py, vx, vy = nbody_forces.step_brute_force(px, py, vx, vy, m)
    fb = nbody_render(px, py, vx, vy, 256, 256)
    _check("nbody_orbits_512_4", np.asarray(fb), 0.01)


# ---------------------------------------------------------------------------
# Bench-scene regression anchors: the 12 bench scenes from the REAL assets
# (rasterizer.rs:1791-1812 configs), frozen by tools/gen_goldens.py from
# THIS repo's XLA oracle backend. They pin the oracle's output so kernel /
# pipeline changes can't silently shift the frames — they are NOT
# independent evidence of parity with the Rust reference. Fidelity to the
# reference rests on (a) the per-op reference-math tests (snap, fill
# convention, gamma LUT, shader formulas) and (b) the independent scalar
# C++ oracle cross-checks in test_ref_oracle.py / docs/PARITY.md.
# A missing anchor is a failure, not a skip.
# ---------------------------------------------------------------------------


def _render_bench_scene(label: str):
    from rustexp_tpu.app.benchmark import SCENES, SHADER, TICK, H, W
    from rustexp_tpu.assets import cubemap, mesh
    from rustexp_tpu.raster import camera, pipeline as pp

    _, mesh_idx, per_pixel, _ = next(s for s in SCENES if s[0] == label)
    m = mesh.get_mesh(mesh_idx)
    if "(procedural)" in m.name:
        pytest.skip("real mesh assets unavailable")
    scene = pp.make_scene(m, cubemap.get_cm_set(0))
    eye = jnp.asarray(camera.camera_eye(mesh.mesh_camera(mesh_idx), TICK))
    return np.asarray(pp.render_frame(
        scene, eye, TICK, w=W, h=H, per_pixel=per_pixel, shader_idx=SHADER,
        show_cm=False, backend="xla"))


def _check_ref(label: str, fb: np.ndarray):
    path = os.path.join(GOLDEN_DIR, f"ref_{label}.npz")
    assert os.path.exists(path), (
        f"bench-scene anchor {path} missing — regenerate with "
        f"`python tools/gen_goldens.py` and commit it")
    want = np.load(path)["fb"]
    diff = int((fb != want).sum())
    # <=0.3%: cross-host fma-fusion tie flips (see _check docstring).
    assert diff <= 0.003 * fb.size, (
        f"reference golden {label}: {diff} of {fb.size} pixels differ; if "
        f"intentional, regenerate via tools/gen_goldens.py and review")


def test_golden_ref_cornellbox_default_gate(reference_root):
    """512^2 live-engine-vs-golden in the DEFAULT run (VERDICT r3 next-8).

    The other ref_* anchors are slow-marked (multi-minute 512^2 renders on
    a 1-core host), which left default runs blind to live-vs-golden drift
    at full resolution. CornellBoxV is the cheapest-compiling bench scene,
    so it rides in the routine gate; the full 12-scene pass stays under
    `pytest -m ""`.
    """
    _check_ref("CornellBoxV", _render_bench_scene("CornellBoxV"))


@pytest.mark.slow
def test_golden_ref_killeroo_pixel(reference_root):
    """KillerooP: the reference's flagship bench scene (rasterizer.rs:1798).

    slow: a 512^2 XLA-oracle render is ~3 min of EXECUTION when the
    terminal is provisioned with a single CPU core (intra-op parallelism
    gone). The full golden pass runs with `pytest -m ""`.
    """
    _check_ref("KillerooP", _render_bench_scene("KillerooP"))


@pytest.mark.slow
@pytest.mark.parametrize("label", ["KillerooV", "CornellBoxV", "CornellBoxP"])
def test_golden_ref_scene(reference_root, label):
    _check_ref(label, _render_bench_scene(label))


@pytest.mark.slow
def test_golden_ref_all_12_scenes(reference_root):
    """Every bench scene's frame vs its stored golden
    (rasterizer.rs:1791-1804)."""
    from rustexp_tpu.app.benchmark import SCENES

    for label, _, _, _ in SCENES:
        _check_ref(label, _render_bench_scene(label))
