"""Isolate WHERE the fused bottleneck loses: fwd-only vs fwd+bwd, and
block_m sensitivity, at one stage geometry on the live chip.

fused_stage_probe showed s3 fused 1.379 ms vs std 0.960 ms (fwd+bwd).
This splits the difference: (a) forward-only block apply, (b) raw
mm_bn_stats kernel vs the XLA reference lowering at conv1/conv3
geometry, (c) block_m in {128, 256, 512} for the raw kernel fwd+bwd.

Usage: python tools/fused_tune_probe.py [--batch 128]
"""

from __future__ import annotations

import argparse
import functools
import json
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from bench import _time_scan  # noqa: E402
from creamfl_tpu.models.resnet import Bottleneck, FusedBottleneck  # noqa: E402
from creamfl_tpu.ops import fused_bn_mm as F  # noqa: E402


def time_block_fwd(cls, f, cin, hw, batch, iters):
    x = jax.random.normal(jax.random.PRNGKey(0), (batch, hw, hw, cin),
                          jnp.bfloat16)
    blk = cls(filters=f, stride=1, dtype=jnp.bfloat16)
    variables = jax.jit(lambda: blk.init(jax.random.PRNGKey(1), x))()
    params, bs = variables["params"], variables["batch_stats"]

    # Non-projecting block: output shape == input shape, so the block
    # output is the scan carry (forward-only chain, no grads).
    def step(xx):
        out, _ = blk.apply({"params": params, "batch_stats": bs}, xx,
                           True, mutable=["batch_stats"])
        return out

    return _time_scan(
        step, x,
        lambda o: jnp.sum(o[:1, :1, :1, :8].astype(jnp.float32)),
        iters=iters)


def time_raw_simple(m, k, n, relu, block_m, iters, pallas, bwd):
    x = jax.random.normal(jax.random.PRNGKey(0), (m, k), jnp.bfloat16)
    w0 = jax.random.normal(jax.random.PRNGKey(1), (k, n),
                           jnp.float32) * 0.02
    inv = jnp.ones((k,), jnp.float32)
    beta = jnp.zeros((k,), jnp.float32)

    if pallas:
        def call(xx, ww):
            return F._mm_bn_stats_pallas(xx, ww.astype(xx.dtype), inv,
                                         beta, relu, block_m, False)
    else:
        def call(xx, ww):
            return F.mm_bn_stats_reference(xx, ww.astype(xx.dtype), inv,
                                           beta, relu)

    if bwd:
        def step(ww):
            def loss(w_):
                y, s, q = call(x, w_)
                return (jnp.sum(y.astype(jnp.float32)) + jnp.sum(s)
                        + jnp.sum(q))
            g = jax.grad(loss)(ww)
            return ww - 1e-6 * g
        return _time_scan(step, w0, lambda ww: jnp.sum(ww[0, :8]),
                          iters=iters)
    else:
        def step(ww):
            y, s, q = call(x, ww)
            # fold outputs back into a small carry so the scan chains
            return ww + (jnp.sum(y.astype(jnp.float32)) + jnp.sum(s)
                         + jnp.sum(q)) * 1e-30
        return _time_scan(step, w0, lambda ww: jnp.sum(ww[0, :8]),
                          iters=iters)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--part", default="all",
                    help="fwdblk | raw | sweep | all")
    args = ap.parse_args()

    out = {}
    hw, cin, f = 14, 1024, 256
    m = args.batch * hw * hw

    if args.part in ("fwdblk", "all"):
        std = time_block_fwd(Bottleneck, f, cin, hw, args.batch,
                             args.iters)
        fus = time_block_fwd(FusedBottleneck, f, cin, hw, args.batch,
                             args.iters)
        out["block_fwd"] = {"std_ms": round(std * 1e3, 3),
                            "fused_ms": round(fus * 1e3, 3)}
        print(f"block fwd-only: std {std*1e3:.3f} ms  "
              f"fused {fus*1e3:.3f} ms", flush=True)

    if args.part in ("raw", "all"):
        for (kk, nn, tag) in [(cin, f, "conv1"), (f, f * 4, "conv3")]:
            for bwd in (False, True):
                ref = time_raw_simple(m, kk, nn, tag == "conv3", 256,
                                      args.iters, False, bwd)
                pal = time_raw_simple(m, kk, nn, tag == "conv3", 256,
                                      args.iters, True, bwd)
                key = f"{tag}_{'fwdbwd' if bwd else 'fwd'}"
                out[key] = {"xla_ms": round(ref * 1e3, 3),
                            "pallas_ms": round(pal * 1e3, 3)}
                print(f"{key}: xla {ref*1e3:.3f} ms  pallas "
                      f"{pal*1e3:.3f} ms", flush=True)

    if args.part in ("sweep", "all"):
        for bm in (128, 512, 1024):
            pal = time_raw_simple(m, cin, f, False, bm, args.iters,
                                  True, True)
            out[f"sweep_bm{bm}"] = round(pal * 1e3, 3)
            print(f"conv1 fwdbwd block_m={bm}: {pal*1e3:.3f} ms",
                  flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
