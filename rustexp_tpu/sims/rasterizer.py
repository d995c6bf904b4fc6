"""Rasterizer experiment: the user-visible driver around raster/pipeline.

Reference: hs-src/RustRasterizerExperiment.hs — state defaults (per-vertex
shading, Fill mode, mesh 0 Killeroo, shader 5 CMRefl, envmap 0 Grace, bg 0,
RustRasterizerExperiment.hs:68-75), wrapping selection keys
(RustRasterizerExperiment.hs:127-143), and the status string with frame
stats, scene names, and triangle count (RustRasterizerExperiment.hs:94-126).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

import jax

from ..assets import cubemap, mesh
from ..core.timing import FrameTimes
from ..raster import camera, pipeline as pp


@dataclass
class RasterState:
    per_pixel: bool = False
    mode: int = pp.MODE_FILL
    mesh_idx: int = 0
    shader_idx: int = 5
    env_idx: int = 0
    bg_idx: int = 0
    backend: str = "auto"
    frame_times: FrameTimes = field(default_factory=FrameTimes)
    _scene_cache: tuple | None = None  # (mesh_idx, env_idx, Scene)


class RasterizerExperiment:
    name = "Rasterizer"

    def init(self, **config) -> RasterState:
        return RasterState(**config)

    def _scene(self, state: RasterState, w: int, h: int):
        key = (state.mesh_idx, state.env_idx, w, h)
        if state._scene_cache is None or state._scene_cache[0] != key:
            scene = pp.make_scene(
                mesh.get_mesh(state.mesh_idx), cubemap.get_cm_set(state.env_idx)
            )
            eye0 = camera.camera_eye(mesh.mesh_camera(state.mesh_idx), 0.0)
            binning = pp.suggest_binning(scene, eye0, w, h)
            state._scene_cache = (key, scene, binning)
        return state._scene_cache[1], state._scene_cache[2]

    def step(self, state: RasterState) -> RasterState:
        return state  # all per-frame work happens in render (like the reference)

    def render(self, state: RasterState, w: int, h: int, tick: float = 0.0):
        scene, (cap, spans) = self._scene(state, w, h)
        eye = camera.camera_eye(mesh.mesh_camera(state.mesh_idx), tick)
        t0 = time.perf_counter()
        fb, overflow = pp.render_frame(
            scene, eye, tick, w=w, h=h, mode=state.mode,
            per_pixel=state.per_pixel, shader_idx=state.shader_idx,
            bg_idx=state.bg_idx, backend=state.backend, raster_cap=cap,
            raster_spans=spans, return_overflow=True,
        )
        if bool(overflow):
            # Camera moved past the cached binning's cap/span margins and
            # triangles were dropped: re-measure at this viewpoint and
            # re-render. The reference's dynamic bins are exact by
            # construction (rasterizer.rs:2115-2163); static shapes trade
            # that for this loud re-bin.
            from ..core.trace import trace_warn

            trace_warn(f"bin overflow at tick {tick:.2f}; re-binning")
            key = state._scene_cache[0]
            binning = pp.suggest_binning(scene, eye, w, h)
            state._scene_cache = (key, scene, binning)
            cap, spans = binning
            fb, overflow = pp.render_frame(
                scene, eye, tick, w=w, h=h, mode=state.mode,
                per_pixel=state.per_pixel, shader_idx=state.shader_idx,
                bg_idx=state.bg_idx, backend=state.backend, raster_cap=cap,
                raster_spans=spans, return_overflow=True,
            )
        jax.block_until_ready(fb)
        state.frame_times.push(time.perf_counter() - t0)
        return fb

    def status(self, state: RasterState) -> str:
        fps, med, _, _ = state.frame_times.stats()
        ms = med * 1000.0
        m = mesh.get_mesh(state.mesh_idx)
        return (
            f"{fps:.1f}FPS | {ms:.2f}ms | Mode: {pp.MODE_NAMES[state.mode]} "
            f"| PerPixel: {'On' if state.per_pixel else 'Off'} "
            f"| Mesh: {mesh.mesh_name(state.mesh_idx)} ({m.num_tris} Tri) "
            f"| Shdr: {pp.sh.shader_name(state.shader_idx)} "
            f"| Env: {cubemap.cm_set_name(state.env_idx)} | Bg: {state.bg_idx}"
        )

    def handle_key(self, state: RasterState, key: str) -> RasterState:
        """Wrapping scene-selection keys (RustRasterizerExperiment.hs:127-143)."""
        key = key.upper() if len(key) == 1 else key
        if key == "M":
            state.mode = (state.mode + 1) % len(pp.MODE_NAMES)
        elif key == "P":
            state.per_pixel = not state.per_pixel
        elif key == "Q":
            state.mesh_idx = (state.mesh_idx - 1) % mesh.NUM_MESHES
        elif key == "W":
            state.mesh_idx = (state.mesh_idx + 1) % mesh.NUM_MESHES
        elif key == "A":
            state.shader_idx = (state.shader_idx - 1) % pp.sh.NUM_SHADERS
        elif key == "S":
            state.shader_idx = (state.shader_idx + 1) % pp.sh.NUM_SHADERS
        elif key == "Z":
            state.env_idx = (state.env_idx - 1) % cubemap.NUM_CM_SETS
        elif key == "X":
            state.env_idx = (state.env_idx + 1) % cubemap.NUM_CM_SETS
        elif key == "1":
            state.bg_idx = (state.bg_idx - 1) % pp.NUM_BACKGROUNDS
        elif key == "2":
            state.bg_idx = (state.bg_idx + 1) % pp.NUM_BACKGROUNDS
        elif key == "B":
            from ..app.benchmark import run_suite

            run_suite()
        return state
