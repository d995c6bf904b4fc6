"""Experiment state checkpoint/resume.

The reference has NO persistence — sim state is reconstructible only by
re-seeding (SURVEY.md §5: closest artifact is the screenshot key). A
framework intended for long runs needs real save/resume, so every
experiment state (a dataclass of device arrays + config scalars) round-
trips through one compressed npz:

  * array fields (grid, particle arrays, PRNG key) -> npz arrays
  * config scalars (dt, theta, steps_per_frame, ...) -> a JSON meta blob
  * transient fields (timing rings, device-side caches) are intentionally
    dropped and rebuilt on resume

GoL resumes BIT-EXACTLY (integer state); N-body resumes exactly from the
saved f32 arrays (the continuation equals the uninterrupted run as long
as step routing stays on the same path). CLI: --save-state / --load-state.
"""

from __future__ import annotations

import dataclasses
import json
import os

import numpy as np

# Rebuilt on resume, not persisted: timing rings and device-side caches.
_TRANSIENT = {"step_times", "frame_times", "_scene_cache"}


def save_state(path: str, state) -> str:
    """Write an experiment state dataclass to `path`; returns the real path.

    np.savez appends ".npz" to extensionless paths, which would break the
    save->load round trip (`--save-state /tmp/st` wrote /tmp/st.npz while
    `--load-state /tmp/st` opened /tmp/st) — normalize up front and return
    the path actually written so callers print the truth.
    """
    path = str(path)
    if not path.endswith(".npz"):
        path += ".npz"
    arrays = {}
    scalars = {}
    for f in dataclasses.fields(state):
        if f.name in _TRANSIENT:
            continue
        v = getattr(state, f.name)
        if v is None:
            continue
        if hasattr(v, "shape"):
            arrays[f.name] = np.asarray(v)
        elif isinstance(v, (bool, int, float, str)):
            scalars[f.name] = v
    meta = json.dumps({"type": type(state).__name__, "scalars": scalars})
    arrays["__meta__"] = np.frombuffer(meta.encode(), np.uint8)
    np.savez_compressed(path, **arrays)
    return path


def load_state(path: str, experiment):
    """Rebuild a state for `experiment` from a save_state() file.

    Starts from experiment.init() (fresh transients, correct defaults for
    any fields added since the save), then overlays the saved scalars and
    arrays.
    """
    import jax.numpy as jnp

    path = str(path)
    if not path.endswith(".npz") and not os.path.exists(path):
        path += ".npz"  # accept the extensionless alias save_state took
    data = np.load(path)
    meta = json.loads(bytes(bytearray(np.asarray(data["__meta__"]))))
    state = experiment.init()
    want = type(state).__name__
    if meta["type"] != want:
        raise ValueError(
            f"checkpoint {path} holds a {meta['type']}, expected {want}")
    for k, v in meta["scalars"].items():
        setattr(state, k, v)
    for k in data.files:
        if k == "__meta__":
            continue
        setattr(state, k, jnp.asarray(data[k]))
    return state
