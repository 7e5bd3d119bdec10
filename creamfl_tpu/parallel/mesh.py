"""Mesh and sharding helpers.

The reference is a single-GPU, single-process simulation: clients run
sequentially and "communication" is host-RAM tensor handoff (SURVEY.md
§2.1). The TPU-native layout replaces all of that with one device mesh:

  axes ("client", "data"):
    * server training / distillation / eval: batch sharded over the
      whole mesh (pure DP; the models are far below TP scale).
    * client local training: the stacked client axis of each family's
      parameter pytree is sharded over "client"; each device trains its
      resident clients; no cross-device traffic during local epochs.
    * global features: replicated (the broadcast of MMFL.py:229 becomes
      a replicated sharding — XLA all-gathers once over ICI).
    * con_w aggregation: per-client weight rows computed where the
      client reps live, then a psum-weighted reduction over "client".
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Multi-host initialization (DCN). On a single host this is a
    no-op; on a pod slice call once per host before building the mesh —
    jax.distributed wires the cross-host collectives so the same
    pjit-ted programs span hosts (ICI within a slice, DCN across).

    Either pass all of (coordinator, num_processes, process_id) —
    tests/distributed_worker.py does — or none of them, in which case
    initialization is attempted only inside an auto-detectable cluster
    environment (TPU pod / SLURM, where jax.distributed.initialize
    resolves everything itself; plain hosts no-op)."""
    import os

    import jax

    explicit = (coordinator, num_processes, process_id)
    if any(a is not None for a in explicit):
        if any(a is None for a in explicit):
            raise ValueError(
                "init_distributed needs coordinator, num_processes AND "
                f"process_id together; got {explicit!r}")
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)
        return
    # Auto mode: only meaningful where jax can discover the cluster.
    if any(k in os.environ for k in ("COORDINATOR_ADDRESS",
                                     "SLURM_JOB_ID", "TPU_WORKER_ID",
                                     "CLOUD_TPU_TASK_ID")):
        jax.distributed.initialize()


def make_mesh(n_client: Optional[int] = None,
              n_data: Optional[int] = None,
              devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n_client is None and n_data is None:
        n_client, n_data = n, 1
    elif n_client is None:
        n_client = n // n_data
    elif n_data is None:
        n_data = n // n_client
    assert n_client * n_data == n, (n_client, n_data, n)
    arr = np.asarray(devices).reshape(n_client, n_data)
    return Mesh(arr, axis_names=("client", "data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Batch-dim sharding over one mesh axis (or both for server DP)."""
    if axis == "all":
        return NamedSharding(mesh, P(("client", "data")))
    return NamedSharding(mesh, P(axis))


def client_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis sharding for stacked client pytrees."""
    return NamedSharding(mesh, P("client"))


# ---------------------------------------------------------------------------
# Multi-process-safe placement / readback
#
# On a pod slice the round loop runs SPMD: every process executes the
# identical deterministic host program (same seeds, same data pipeline),
# so host-side values are process-identical, but jax.device_put of a
# host array onto a sharding containing NON-ADDRESSABLE devices is
# invalid. put_global/to_host are the two crossing points the whole
# round loop uses instead (VERDICT r4 next-step #3; exercised by
# tests/test_multiprocess_round.py).
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _reshard_prog(sharding):
    """Jitted identity pinned to ``sharding`` — the supported way to
    re-lay-out an existing global array across processes (XLA inserts
    the collectives)."""
    return jax.jit(lambda x: x, out_shardings=sharding)


def put_global(tree, sharding):
    """``jax.device_put(tree, sharding)`` that also works when the
    sharding spans multiple processes.

    Single-process this IS device_put (the fast committed-transfer
    path). Multi-process: host arrays are process-identical (SPMD host
    program), so each process contributes exactly its addressable
    shards via ``jax.make_array_from_callback``; arrays that are
    already global reshard through a jitted identity."""
    if jax.process_count() == 1:
        return jax.device_put(tree, sharding)

    def put_one(x):
        if x is None:
            return None
        if isinstance(x, jax.Array):
            if jnp_issubdtype_key(x.dtype):
                data = np.asarray(to_host(jax.random.key_data(x)))
                spec = getattr(sharding, "spec", P())
                data_sh = NamedSharding(sharding.mesh, spec)
                out = jax.make_array_from_callback(
                    data.shape, data_sh, lambda idx: data[idx])
                return jax.random.wrap_key_data(
                    out, impl=jax.random.key_impl(x))
            if not x.is_fully_addressable:
                return _reshard_prog(sharding)(x)
            x = np.asarray(x)
        a = np.asarray(x)
        return jax.make_array_from_callback(a.shape, sharding,
                                            lambda idx: a[idx])

    return jax.tree.map(put_one, tree)


def jnp_issubdtype_key(dtype) -> bool:
    try:
        return jax.dtypes.issubdtype(dtype, jax.dtypes.prng_key)
    except Exception:
        return False


def to_host(x) -> np.ndarray:
    """``np.asarray`` that also works for non-addressable (multi-
    process) arrays. Fully-replicated arrays read their local replica
    directly (no communication, safe from any one process); anything
    else resharded to replicated first — that is a COLLECTIVE, so every
    process of the mesh must reach this call (never gate a to_host of a
    sharded array behind ``process_index() == 0``)."""
    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        if not x.is_fully_replicated:
            mesh = getattr(x.sharding, "mesh", None)
            if mesh is None:  # pragma: no cover - non-Named shardings
                raise TypeError(f"cannot gather {x.sharding}")
            x = _reshard_prog(NamedSharding(mesh, P()))(x)
    return np.asarray(x)
