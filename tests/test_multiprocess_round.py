"""Two-process FULL production round (VERDICT r4 next-step #3).

test_distributed.py proves jax.distributed init + collectives; this
test proves the actual round loop is multi-process-correct: two
processes x 4 virtual CPU devices form the same 8-device mesh as the
single-process oracle, each runs the identical deterministic host
program, and MMFL.train() must produce the same retrieval scores and
round artifacts. Exercises every put_global/to_host crossing
(parallel/mesh.py): DP batch feeds, replicated server state/globals,
client-sharded stacks, shard_map'd con_w, evaluator gathers, and the
process-0-only checkpoint writes.
"""

import json
import os
import socket
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow  # ~30 min on the 1-core host: two
# concurrent worker compiles + the in-process oracle round

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.timeout(5400)
def test_two_process_full_round_matches_single_process(tmp_path):
    port = _free_port()
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(root, "tests", "multiprocess_round_worker.py")
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # workers declare their own device count
    procs = [subprocess.Popen(
        [sys.executable, worker, str(i), "2", f"localhost:{port}",
         str(tmp_path)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env, cwd=root) for i in range(2)]
    outs = [p.communicate(timeout=2700)[0] for p in procs]
    summaries = []
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out[-4000:]}"
        line = [ln for ln in out.splitlines() if ln.startswith("SCORES ")]
        assert line, out[-2000:]
        summaries.append(json.loads(line[-1][len("SCORES "):]))

    # Both processes computed the identical global round.
    s0, s1 = summaries
    assert s0 == s1, (s0, s1)

    # Single-process oracle on the same 8-device mesh (the conftest
    # already provisions 8 virtual devices in this process).
    from mp_round_config import build_algo

    algo = build_algo(tmp_path / "oracle", use_mesh=True, mesh_devices=8)
    scores = algo.train(0)
    for key in ("i2t", "t2i"):
        for metric in ("recall_1", "recall_5", "recall_10"):
            assert s0[key][metric] == pytest.approx(
                scores[key][metric]), (key, metric, s0[key], scores[key])
    # Round artifacts agree across the process split (collective
    # reduction order may differ under gloo: tolerance, not equality).
    import numpy as np

    from creamfl_tpu.parallel.mesh import to_host

    for got, arr in [(s0["g_img_sum"], algo.global_img_feature),
                     (s0["g_txt_sum"], algo.global_txt_feature),
                     (s0["img_vec_sum"], algo.img_vec),
                     (s0["txt_vec_sum"], algo.txt_vec)]:
        want = float(np.sum(to_host(arr)))
        assert got == pytest.approx(want, rel=1e-3, abs=1e-3), (got, want)
