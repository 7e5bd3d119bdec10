"""Per-stage fused-vs-standard bottleneck timing on the live chip.

The tower-level probe (perf_probe --parts resnet,resnet_fused) showed
the fused trunk LOSING (128 vs 68 ms @bs128). This isolates where: one
repeated (non-projecting) bottleneck per R101 stage geometry, standard
XLA lowering vs the Pallas FusedBottleneck, fwd+bwd train-mode.

Usage: python tools/fused_stage_probe.py [--batch 128] [--iters 20]
"""

from __future__ import annotations

import argparse
import json
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from bench import _time_scan  # noqa: E402
from creamfl_tpu.models.resnet import Bottleneck, FusedBottleneck  # noqa: E402

# (stage, filters, cin, hw) for R101 @224^2
GEOMS = [
    ("s1", 64, 256, 56),
    ("s2", 128, 512, 28),
    ("s3", 256, 1024, 14),
    ("s4", 512, 2048, 7),
]


def time_block(cls, f, cin, hw, batch, iters):
    x = jax.random.normal(jax.random.PRNGKey(0), (batch, hw, hw, cin),
                          jnp.bfloat16)
    blk = cls(filters=f, stride=1, dtype=jnp.bfloat16)
    variables = jax.jit(lambda: blk.init(jax.random.PRNGKey(1), x))()
    params, bs = variables["params"], variables["batch_stats"]

    def loss(p):
        out, _ = blk.apply({"params": p, "batch_stats": bs}, x, True,
                           mutable=["batch_stats"])
        return jnp.sum(jnp.square(out.astype(jnp.float32)))

    def step(p):
        g = jax.grad(loss)(p)
        return jax.tree.map(lambda a, b: a - 1e-6 * b, p, g)

    first = next(iter(params))
    leaf = next(iter(params[first]))
    return _time_scan(step, params,
                      lambda p: jnp.sum(p[first][leaf]), iters=iters)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--stages", default="s1,s2,s3,s4")
    args = ap.parse_args()

    out = {}
    want = set(args.stages.split(","))
    for name, f, cin, hw in GEOMS:
        if name not in want:
            continue
        std = time_block(Bottleneck, f, cin, hw, args.batch, args.iters)
        fus = time_block(FusedBottleneck, f, cin, hw, args.batch,
                         args.iters)
        out[name] = {"std_ms": round(std * 1e3, 3),
                     "fused_ms": round(fus * 1e3, 3)}
        print(f"{name} ({cin}->{f} @{hw}^2): std {std*1e3:8.3f} ms   "
              f"fused {fus*1e3:8.3f} ms", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
