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

    def _scene(self, state: RasterState, w: int, h: int, eye):
        """Scene + cached raster work structure (rebuilt when stale).

        Big meshes use the flat work queue; small ones the [nT, cap] bins —
        the measured crossover (see app/benchmark.py QUEUE_MIN_TRIS).
        """
        key = (state.mesh_idx, state.env_idx, w, h)
        if state._scene_cache is None or state._scene_cache[0] != key:
            from ..app.benchmark import QUEUE_MIN_TRIS

            m = mesh.get_mesh(state.mesh_idx)
            scene = pp.make_scene(m, cubemap.get_cm_set(state.env_idx))
            if m.num_tris >= QUEUE_MIN_TRIS:
                work = ("queue", pp.build_scene_queue(scene, eye, w, h))
            else:
                work = ("pallas", pp.suggest_binning(scene, eye, w, h))
            state._scene_cache = (key, scene, work)
        return state._scene_cache[1], state._scene_cache[2]

    def _rebuild(self, state: RasterState, scene, eye, w: int, h: int,
                 kind: str):
        key = state._scene_cache[0]
        if kind == "queue":
            work = ("queue", pp.build_scene_queue(scene, eye, w, h))
        else:
            work = ("pallas", pp.suggest_binning(scene, eye, w, h))
        state._scene_cache = (key, scene, work)
        return work

    def step(self, state: RasterState) -> RasterState:
        return state  # all per-frame work happens in render (like the reference)

    def _frame_kwargs(self, state, work, w, h):
        kind, data = work
        kw = dict(
            w=w, h=h, mode=state.mode, per_pixel=state.per_pixel,
            shader_idx=state.shader_idx, bg_idx=state.bg_idx,
            return_overflow=True,
        )
        backend = state.backend
        if backend == "auto":
            backend = kind if (w % 128 == 0 and h % 8 == 0) else "xla"
        kw["backend"] = backend
        if backend == "queue":
            kw["raster_queue"] = data
        elif backend == "pallas" and isinstance(data, tuple):
            kw["raster_cap"], kw["raster_spans"], kw["raster_rows"] = data
        return kw

    def render(self, state: RasterState, w: int, h: int, tick: float = 0.0):
        eye = camera.camera_eye(mesh.mesh_camera(state.mesh_idx), tick)
        scene, work = self._scene(state, w, h, eye)
        t0 = time.perf_counter()
        fb, stale = pp.render_frame(scene, eye, tick,
                                    **self._frame_kwargs(state, work, w, h))
        if bool(stale):
            # Camera moved beyond the cached work structure (or the static
            # bins overflowed): rebuild at this viewpoint and re-render.
            # The reference's dynamic bins are exact by construction
            # (rasterizer.rs:2115-2163); static shapes trade that for this
            # loud rebuild.
            from ..core.trace import trace_info

            trace_info(f"raster structure stale at tick {tick:.2f}; rebuilding")
            work = self._rebuild(state, scene, eye, w, h, work[0])
            fb, stale = pp.render_frame(
                scene, eye, tick, **self._frame_kwargs(state, work, w, h))
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
