"""Train-state containers (flax struct pytrees)."""

from __future__ import annotations

from typing import Any, Dict

import flax.struct


@flax.struct.dataclass
class EngineState:
    """One model + optimizer bundle.

    params holds {'model': ..., 'criterion': ...} for engines with a
    learnable criterion (PCME shift/negative_scale), else {'model': ...}.
    """

    params: Dict[str, Any]
    batch_stats: Dict[str, Any]
    opt_state: Any
    step: int = 0


@flax.struct.dataclass
class MoonState:
    """Client state + the frozen pre-round copy for MOON intra-contrast
    (reference deep-copies the model at round start,
    ClientTrainer.py:195)."""

    live: EngineState
    old_params: Dict[str, Any]
    old_batch_stats: Dict[str, Any]
