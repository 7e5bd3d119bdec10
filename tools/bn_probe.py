"""Stage-3 bottleneck micro-roofline on the live chip (VERDICT r4 #2).

tools/roofline_r101.py prices the 22 repeated b256 bottlenecks at
~1.08 ms/block fwd+bwd (bs128 @14x14, bf16) and blames the measured gap
on BN-stat/epilogue HBM traffic. This probe measures the actual XLA
cost of ONE stage-3 block and its ablations so the Pallas fusion target
is a number, not a hunch:

  block_train — Bottleneck(256) fwd+bwd, train-mode BN (stats)  [prod]
  block_eval  — same, eval-mode BN (no stats pass)
  convs_only  — the three convs + residual + relu, no BN at all
  c1_bn       — conv1 (1x1 1024->256) + BN + ReLU alone
  mm_c1       — the equivalent bare [25088,1024]@[1024,256] matmul

Usage: python tools/bn_probe.py [--batch 128] [--iters 20]
"""

from __future__ import annotations

import argparse
import functools
import json
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from bench import _time_scan  # noqa: E402


def _bn_apply(x, scale, bias, train: bool, mean=None, var=None):
    if train:
        m = jnp.mean(x, axis=(0, 1, 2))
        v = jnp.mean(jnp.square(x), axis=(0, 1, 2)) - jnp.square(m)
    else:
        m, v = mean, var
    inv = jax.lax.rsqrt(v + 1e-5) * scale
    return (x - m) * inv + bias


def _conv(x, w, stride=1):
    # bf16 in/out like the production flax trunk (dtype=bf16 nn.Conv).
    return jax.lax.conv_general_dilated(
        x.astype(w.dtype), w, window_strides=(stride, stride),
        padding="SAME" if w.shape[0] > 1 else "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def build_params(key, cin=1024, width=256, dtype=jnp.bfloat16):
    ks = jax.random.split(key, 3)
    p = {
        "w1": jax.random.normal(ks[0], (1, 1, cin, width), dtype) * 0.03,
        "w2": jax.random.normal(ks[1], (3, 3, width, width), dtype) * 0.03,
        "w3": jax.random.normal(ks[2], (1, 1, width, cin), dtype) * 0.03,
    }
    for i, c in (("1", width), ("2", width), ("3", cin)):
        p[f"s{i}"] = jnp.ones((c,), jnp.float32)
        p[f"b{i}"] = jnp.zeros((c,), jnp.float32)
    return p


def block(p, x, train: bool, use_bn: bool = True):
    def bn(y, i):
        if not use_bn:
            return y
        c = y.shape[-1]
        return _bn_apply(y.astype(jnp.float32), p[f"s{i}"], p[f"b{i}"],
                         train, jnp.zeros((c,)), jnp.ones((c,))
                         ).astype(y.dtype)

    y = jax.nn.relu(bn(_conv(x, p["w1"]), "1"))
    y = jax.nn.relu(bn(_conv(y, p["w2"]), "2"))
    y = bn(_conv(y, p["w3"]), "3")
    return jax.nn.relu(y + x)


def timed_grad(fn, p, x, iters):
    g = jax.grad(lambda p_: jnp.sum(fn(p_, x).astype(jnp.float32) ** 2))

    def step(p_):
        return jax.tree.map(lambda a, b: a - 1e-6 * b.astype(a.dtype),
                            p_, g(p_))

    return _time_scan(step, p, lambda p_: jnp.sum(
        p_["w1"].astype(jnp.float32)), iters=iters)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--hw", type=int, default=14)
    ap.add_argument("--cin", type=int, default=1024)
    ap.add_argument("--width", type=int, default=256)
    ap.add_argument("--block_only", action="store_true",
                    help="skip the c1/matmul micro ablations")
    args = ap.parse_args()

    key = jax.random.PRNGKey(0)
    p = build_params(key, cin=args.cin, width=args.width)
    x = jax.random.normal(key, (args.batch, args.hw, args.hw, args.cin),
                          jnp.bfloat16)
    out = {}

    for name, fn in [
        ("block_train", functools.partial(block, train=True)),
        ("block_eval", functools.partial(block, train=False)),
        ("convs_only", functools.partial(block, train=False,
                                         use_bn=False)),
    ]:
        dt = timed_grad(fn, p, x, args.iters)
        out[name] = round(dt * 1e3, 3)
        print(f"{name:12s} {dt * 1e3:7.3f} ms fwd+bwd", flush=True)

    if args.block_only:
        out.update(hw=args.hw, cin=args.cin, width=args.width)
        print(json.dumps(out))
        return

    def c1_bn(p_, x_):
        y = _conv(x_, p_["w1"])
        return jax.nn.relu(_bn_apply(y.astype(jnp.float32), p_["s1"],
                                     p_["b1"], True).astype(y.dtype))

    dt = timed_grad(c1_bn, p, x, args.iters)
    out["c1_bn"] = round(dt * 1e3, 3)
    print(f"{'c1_bn':12s} {dt * 1e3:7.3f} ms fwd+bwd", flush=True)

    m = x.reshape(-1, args.cin)

    def mm_c1(p_, m_):
        return jnp.dot(m_, p_["w1"].reshape(args.cin, args.width))

    dt = timed_grad(mm_c1, p, m, args.iters)
    out["mm_c1"] = round(dt * 1e3, 3)
    print(f"{'mm_c1':12s} {dt * 1e3:7.3f} ms fwd+bwd", flush=True)

    out.update(hw=args.hw, cin=args.cin, width=args.width)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
