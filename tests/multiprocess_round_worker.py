"""Worker for the two-process FULL-ROUND test (VERDICT r4 next-step #3).

Usage: python tests/multiprocess_round_worker.py <pid> <nproc>
       <coordinator> <exp_dir>

Each process contributes 4 virtual CPU devices; together they form the
same 8-device ("client", "data") mesh the single-process oracle uses,
and each runs the IDENTICAL deterministic host program (same seeds,
same synthetic pipeline) — the SPMD model the round loop's
put_global/to_host crossings assume. Runs one production MMFL.train()
round and prints a "SCORES {json}" line the test compares across
processes and against the single-process oracle.
"""

import json
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=4").strip()
if "xla_cpu_max_isa" not in flags:
    flags = (flags + " --xla_cpu_max_isa=AVX2").strip()
os.environ["XLA_FLAGS"] = flags

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
except Exception:
    pass

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from creamfl_tpu.parallel.mesh import init_distributed, to_host  # noqa: E402


def main():
    pid, nproc, coordinator, exp_dir = (int(sys.argv[1]), int(sys.argv[2]),
                                        sys.argv[3], sys.argv[4])
    init_distributed(coordinator=coordinator, num_processes=nproc,
                     process_id=pid)
    assert jax.process_count() == nproc
    assert jax.device_count() == 8, jax.device_count()
    print(f"init OK: process {pid}/{nproc}", flush=True)

    import numpy as np

    from mp_round_config import build_algo  # tests/ dir (sys.path below)

    algo = build_algo(os.path.join(exp_dir, f"p{pid}"), use_mesh=True,
                      mesh_devices=8)
    assert algo.mesh is not None and algo.mesh.size == 8
    scores = algo.train(0)
    summary = {
        "i2t": scores["i2t"], "t2i": scores["t2i"],
        "g_img_sum": float(np.sum(to_host(algo.global_img_feature))),
        "g_txt_sum": float(np.sum(to_host(algo.global_txt_feature))),
        "img_vec_sum": float(np.sum(to_host(algo.img_vec))),
        "txt_vec_sum": float(np.sum(to_host(algo.txt_vec))),
    }
    print("SCORES " + json.dumps(summary), flush=True)


sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.abspath(__file__))))

if __name__ == "__main__":
    main()
