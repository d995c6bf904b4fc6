"""Camera animation paths (host-side, tiny per-frame scalar math).

Reference: rasterizer.rs:417-473 — five eye-position-from-time paths, all
looking at the origin. Computed in float64 and cast to float32 exactly like
the reference's f64 tick -> f32 Point3.
"""

from __future__ import annotations

import math

import numpy as np


def smootherstep(edge0: float, edge1: float, x: float) -> float:
    """Ken Perlin's smootherstep (rasterizer.rs:467-473)."""
    x = min(max((x - edge0) / (edge1 - edge0), 0.0), 1.0)
    return x * x * x * (x * (x * 6.0 - 15.0) + 10.0)


def cam_orbit(tick: float) -> np.ndarray:
    return np.array(
        [math.cos(tick / 1.25) * 1.8, 0.0, math.sin(tick / 1.25) * 1.8],
        dtype=np.float32,
    )


def cam_orbit_closer(tick: float) -> np.ndarray:
    return np.array(
        [math.cos(tick / 1.25) * 1.6, 0.0, math.sin(tick / 1.25) * 1.6],
        dtype=np.float32,
    )


def cam_orbit_front(tick: float) -> np.ndarray:
    """Dampened front orbit with vertical bobbing (rasterizer.rs:434-451)."""
    tick_slow = tick / 3.5
    reverse = int(tick_slow) % 2 == 1
    frac = tick_slow - math.floor(tick_slow)
    tick_f = (1.0 - frac) if reverse else frac
    smooth = smootherstep(0.0, 1.0, float(np.float32(tick_f)))
    tick_seg = -math.pi / 2.0 - (
        -(math.pi / 6.0) * (1.0 - smooth) + (math.pi / 6.0) * smooth
    )
    return np.array(
        [math.cos(tick_seg), math.sin(tick / 2.0) * 0.25 + 0.2, math.sin(tick_seg)],
        dtype=np.float32,
    )


def cam_pan_front(tick: float) -> np.ndarray:
    return np.array(
        [math.cos(tick) * 0.3, math.sin(tick) * 0.3 + 0.4, 1.7], dtype=np.float32
    )


def cam_pan_back(tick: float) -> np.ndarray:
    return np.array(
        [math.cos(tick) * 0.3, math.sin(tick) * 0.3, -2.0], dtype=np.float32
    )


CAMERAS = {
    "orbit": cam_orbit,
    "orbit_closer": cam_orbit_closer,
    "orbit_front": cam_orbit_front,
    "pan_front": cam_pan_front,
    "pan_back": cam_pan_back,
}


def camera_eye(name: str, tick: float) -> np.ndarray:
    return CAMERAS[name](tick)
