"""Worker for the two-process jax.distributed smoke test.

Usage: python tests/distributed_worker.py <process_id> <num_processes>
       <coordinator addr>

Each process contributes 2 virtual CPU devices; the script initializes
the distributed runtime through creamfl_tpu.parallel.mesh.init_distributed
(the DCN path a pod-slice launch uses, SURVEY.md §5), builds the global
("client", "data") mesh, and runs a cross-process psum + a sharded
global-batch reduction. Prints OK lines the test asserts on.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=2").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
except Exception:
    pass

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from creamfl_tpu.parallel.mesh import init_distributed, make_mesh  # noqa: E402


def main():
    pid, nproc, coordinator = (int(sys.argv[1]), int(sys.argv[2]),
                               sys.argv[3])
    init_distributed(coordinator=coordinator, num_processes=nproc,
                     process_id=pid)
    assert jax.process_count() == nproc, jax.process_count()
    n_global = jax.device_count()
    n_local = jax.local_device_count()
    print(f"init OK: process {jax.process_index()}/{jax.process_count()} "
          f"devices {n_local}/{n_global}", flush=True)

    # Cross-process allgather over DCN-equivalent transport.
    from jax.experimental import multihost_utils

    ids = multihost_utils.process_allgather(
        np.asarray([jax.process_index()], np.int32))
    assert sorted(np.asarray(ids).ravel().tolist()) == list(range(nproc))
    print("allgather OK", flush=True)

    # Global mesh spanning both processes; per-process shards feed one
    # jitted global reduction (the multi-host analogue of the round
    # loop's sharded client axis).
    mesh = make_mesh(n_client=n_global, n_data=1)
    sharding = NamedSharding(mesh, P("client"))
    local = np.full((n_local, 4), float(pid + 1), np.float32)
    arr = jax.make_array_from_process_local_data(sharding, local,
                                                 (n_global, 4))
    total = jax.jit(lambda a: jnp.sum(a),
                    out_shardings=NamedSharding(mesh, P()))(arr)
    expected = 4.0 * n_local * sum(range(1, nproc + 1))
    got = float(np.asarray(jax.device_get(total)))
    assert got == expected, (got, expected)
    print(f"global psum OK: {got}", flush=True)


if __name__ == "__main__":
    main()
