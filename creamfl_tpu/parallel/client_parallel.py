"""Client-parallel execution: stacked client states, vmapped steps.

The core new parallelism axis vs the reference (SURVEY.md §2.1 "client
parallel"): clients of one model family share an architecture, so their
parameters stack on a leading [C, ...] axis and one vmapped/jitted
program trains all of them at once; sharding that axis over the mesh's
"client" dimension gives linear scaling with zero communication during
local epochs (client steps are data-independent).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, List, Sequence

import jax
import jax.numpy as jnp

from creamfl_tpu.engine.state import EngineState


# Both directions run as ONE jitted program: an eager tree.map over the
# ~100 leaves of (params, opt_state, batch_stats) costs one device
# dispatch per leaf — ~7 ms each through a remote-TPU tunnel, >2 s per
# stack/unstack pair at paper scale (BENCH.md round-2 probes). jit
# collapses that to a single dispatch; programs cache per (C, treedef).


@jax.jit
def _stack_prog(states):
    return jax.tree.map(lambda *xs: jnp.stack(xs), *states)


def stack_states(states: Sequence[EngineState]) -> EngineState:
    """List of per-client EngineStates -> one stacked EngineState."""
    return _stack_prog(tuple(states))


@functools.lru_cache(maxsize=None)
def _unstack_prog(n: int):
    @jax.jit
    def prog(s):
        return tuple(jax.tree.map(lambda x: x[i], s) for i in range(n))

    return prog


def unstack_states(stacked: EngineState, n: int) -> List[EngineState]:
    return list(_unstack_prog(n)(stacked))


def vmap_client_step(step_fn: Callable, in_axes=(0, 0),
                     out_axes=(0, 0)) -> Callable:
    """vmap a per-client (state, batch) -> (state, aux) step over the
    stacked client axis. Batches must carry a leading [C, ...] axis
    (each client sees its own shard's batch)."""
    return jax.vmap(step_fn, in_axes=in_axes, out_axes=out_axes)


def take_client(tree: Any, i: int) -> Any:
    return jax.tree.map(lambda x: x[i], tree)
