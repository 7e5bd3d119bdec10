"""Two-process jax.distributed smoke: exercises
creamfl_tpu.parallel.mesh.init_distributed (the multi-host/DCN path; the
reference is single-process so this is a TPU-build axis, SURVEY.md §5).

Spawns two CPU processes that form one distributed runtime, build the
global ("client", "data") mesh, and run cross-process collectives.
A pod-slice launch uses the same code path with real hosts (DESIGN.md).
"""

import os
import socket
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow  # >60s on the 1-core CPU host


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.timeout(300)
def test_two_process_distributed_init_and_psum():
    port = _free_port()
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(root, "tests", "distributed_worker.py")
    env = dict(os.environ)
    # Children provision their own CPU platform; drop the parent's
    # virtual-device flag so each worker declares its own count.
    env.pop("XLA_FLAGS", None)
    procs = [subprocess.Popen(
        [sys.executable, worker, str(i), "2", f"localhost:{port}"],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env, cwd=root) for i in range(2)]
    outs = [p.communicate(timeout=280)[0] for p in procs]
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
        assert "init OK" in out and f"process {i}/2" in out, out
        assert "allgather OK" in out, out
        assert "global psum OK" in out, out
