"""Model protocol: every model family exposes init / step / render.

A "model" bundles static specs (grid/render geometry) with pure step functions over
(state, params) pytrees, so the runtime driver (`runtime/simulation.py`) can scan any of
them with donated carries, and `parallel/` can shard any of them over a mesh.
"""

from __future__ import annotations

from typing import Any, Protocol

import jax

from ..core.state import ParticleState


class Model(Protocol):
    """Structural interface implemented by each model family."""

    def init(self, key: jax.Array, n: int) -> ParticleState: ...

    def step(self, state: ParticleState, params: Any) -> ParticleState: ...

    def render(self, state: ParticleState, params: Any, camera=None): ...

    def default_params(self) -> Any: ...
