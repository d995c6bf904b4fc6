"""The Experiment protocol — the user-visible API of the engine.

Re-expresses the reference's Experiment typeclass (hs-src/Experiment.hs:22-36)
as a functional protocol over explicit state pytrees:

    init(config)            -> state            (withExperiment setup)
    step(state, ...)        -> state            (sim advance; pure, jittable)
    render(state, w, h)     -> uint32[h, w]     (experimentDraw's fb fill)
    status(state)           -> str              (experimentStatusString)
    handle_key(state, key)  -> state            (experimentGLFWEvent)

Unlike the reference's mutexed global state (gol.rs:10-16, nbody.rs:28-32),
all state is an explicit, immutable pytree threaded through jitted step
functions — the idiomatic XLA shape.
"""

from __future__ import annotations

from typing import Any, Protocol, runtime_checkable


@runtime_checkable
class Experiment(Protocol):
    name: str

    def init(self, **config) -> Any: ...

    def step(self, state: Any) -> Any: ...

    def render(self, state: Any, w: int, h: int) -> Any: ...

    def status(self, state: Any) -> str: ...

    def handle_key(self, state: Any, key: str) -> Any: ...


class EmptyExperiment:
    """Reference Experiment.hs EmptyExperiment dummy."""

    name = "Empty"

    def init(self, **config):
        return None

    def step(self, state):
        return state

    def render(self, state, w, h):
        import jax.numpy as jnp

        return jnp.zeros((h, w), dtype=jnp.uint32)

    def status(self, state):
        return ""

    def handle_key(self, state, key):
        return state
