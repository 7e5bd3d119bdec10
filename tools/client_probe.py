"""Component-level timing of the stacked client phases on the live chip.

The paper-scale round (PAPER_ROUND.json) is dominated by the client
phases (reference HOT LOOPs 3-4, SURVEY.md §3.2). This probe times one
stacked scan-chunk (SCAN_CHUNK batches) of each family's contrast
program plus one stacked task step, with realistic paper-scale shapes:
pub batches bs128 @ 224^2 / L=32, C clients vmapped per family
(expected sample split of 10 from 10/10/15 pools ~= 3 img / 3 txt / 4 mm).

Usage: python tools/client_probe.py [--parts img,txt,mm,mm_task]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
import types

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

PUB_N = 50_000


def _rtt() -> float:
    f = jax.jit(lambda x: jnp.sum(x))
    x = jnp.ones((8, 8))
    float(f(x))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(f(x))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def _time_calls(call, to_scalar, n_calls=6, repeats=3):
    """Time ``n_calls`` queued dispatches of ``call`` (warm), forcing
    completion with one scalar fetch; subtract tunnel RTT."""
    out = call()
    float(to_scalar(out))  # compile + warm
    rtt = _rtt()
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(n_calls):
            out = call()
        float(to_scalar(out))
        best = min(best, time.perf_counter() - t0)
    return max(best - rtt, 1e-9) / n_calls


def make_args():
    a = types.SimpleNamespace()
    a.feature_dim = 256
    a.img_model_local = "resnet18"
    a.mlp_local = False
    a.interintra_weight = 0.5
    a.loss_scale = False
    a.contrast_local_inter = True
    a.contrast_local_intra = True
    a.local_epochs = 5
    return a


def pub_batch(rng, bs=128, img=224, seqlen=32):
    return {
        "images": jnp.asarray(
            rng.normal(size=(bs, img, img, 3)).astype(np.float32)),
        "captions": jnp.asarray(
            rng.integers(1, 4000, size=(bs, seqlen)).astype(np.int32)),
        "lengths": jnp.asarray(
            rng.integers(8, seqlen, size=(bs,)).astype(np.int32)),
    }


def globals_mats(rng):
    g = rng.normal(size=(PUB_N, 256)).astype(np.float32)
    g /= np.linalg.norm(g, axis=-1, keepdims=True)
    return jnp.asarray(g)


def stack_tree(trees):
    return jax.tree.map(lambda *xs: jnp.stack(xs), *trees)


def probe_uni(kind: str, n_clients: int, scan_chunk: int, results,
              lowering: str = "scan", use_bf16: bool = True):
    from creamfl_tpu.engine.client_uni import UniClientEngine
    from creamfl_tpu.federation import stacked as S

    rng = np.random.default_rng(0)
    args = make_args()
    engine = UniClientEngine(
        kind, num_class=100 if kind == "img" else 4, args=args,
        vocab_size=4000, use_bf16=use_bf16)
    batch = pub_batch(rng)
    states = [engine.init_state(jax.random.PRNGKey(i), batch)
              for i in range(n_clients)]
    stacked = stack_tree(states)
    old_params = stack_tree([s.params for s in states])
    old_bs = (stack_tree([s.batch_stats for s in states])
              if states[0].batch_stats else {})
    same = other = globals_mats(rng)
    idx = jnp.asarray(
        np.stack([rng.integers(0, PUB_N, size=(128,)).astype(np.int32)
                  for _ in range(scan_chunk)]))
    batches = jax.tree.map(
        lambda x: jnp.broadcast_to(x[None], (scan_chunk,) + x.shape),
        batch)
    prog = S._uni_chunk_prog(engine, True, True, bool(old_bs),
                             lowering)

    def call():
        st, _ = prog(stacked, old_params, old_bs if old_bs else None,
                     batches, idx, same, other)
        return st

    dt = _time_calls(call, lambda st: jnp.sum(st.step))
    per_batch = dt / scan_chunk
    tag = "" if use_bf16 else "_fp32"
    results[f"{kind}_contrast_chunk{scan_chunk}_C{n_clients}{tag}"] = round(
        per_batch * 1e3, 2)
    print(f"{kind}{tag} contrast C={n_clients}: {per_batch*1e3:.1f} ms/batch "
          f"(paper round: x{391*5} batches = "
          f"{per_batch*391*5:.0f}s/round)", flush=True)


def probe_mm(n_clients: int, scan_chunk: int, results, task=False,
             lowering: str = "scan"):
    from creamfl_tpu.config import default_config_path, parse_config
    from creamfl_tpu.engine.client_mm import MMClientEngine
    from creamfl_tpu.federation import stacked as S

    rng = np.random.default_rng(0)
    args = make_args()
    cfg = parse_config(default_config_path("f30k.yaml"), strict_cast=False)
    cfg.model.embed_dim = 256
    cfg.train.use_bf16 = True
    engine = MMClientEngine(cfg, vocab_size=4000, args=args)
    batch = pub_batch(rng)
    states = [engine.init_state(jax.random.PRNGKey(i), batch)
              for i in range(n_clients)]
    stacked = stack_tree(states)
    old_params = stack_tree([s.params for s in states])
    old_bs = (stack_tree([s.batch_stats for s in states])
              if states[0].batch_stats else {})
    g = globals_mats(rng)
    idx = jnp.asarray(
        np.stack([rng.integers(0, PUB_N, size=(128,)).astype(np.int32)
                  for _ in range(scan_chunk)]))
    batches = jax.tree.map(
        lambda x: jnp.broadcast_to(x[None], (scan_chunk,) + x.shape),
        batch)

    if task:
        def one(state, b, key):
            new_state, _ = engine.local_step(state, b, key)
            return new_state

        vstep = jax.jit(jax.vmap(one, in_axes=(0, 0, 0)))
        tb = jax.tree.map(
            lambda x: jnp.broadcast_to(x[None], (n_clients,) + x.shape),
            batch)
        keys = jnp.stack([jax.random.PRNGKey(i) for i in range(n_clients)])

        def call():
            return vstep(stacked, tb, keys)

        dt = _time_calls(call, lambda st: jnp.sum(st.step))
        results[f"mm_task_C{n_clients}"] = round(dt * 1e3, 2)
        print(f"mm task C={n_clients}: {dt*1e3:.1f} ms/batch "
              f"(paper round: x{76*5} = {dt*76*5:.0f}s/round)", flush=True)
        return

    prog = S._mm_chunk_prog(engine, True, True, bool(old_bs),
                            lowering)

    def call():
        st, _ = prog(stacked, old_params, old_bs if old_bs else None,
                     batches, idx, g, g)
        return st

    dt = _time_calls(call, lambda st: jnp.sum(st.step))
    per_batch = dt / scan_chunk
    results[f"mm_contrast_chunk{scan_chunk}_C{n_clients}"] = round(
        per_batch * 1e3, 2)
    print(f"mm contrast C={n_clients}: {per_batch*1e3:.1f} ms/batch "
          f"(paper round: x{391*5} = {per_batch*391*5:.0f}s/round)",
          flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--parts", default="txt,img,mm,mm_task")
    ap.add_argument("--chunk", type=int, default=8)
    ap.add_argument("--lowering", default="scan", choices=["scan", "vmap"],
                    help="client-axis lowering to measure (production: "
                         "scan on one device, vmap on a client mesh)")
    args = ap.parse_args()
    parts = args.parts.split(",")
    results = {}
    if "txt" in parts:
        probe_uni("txt", 3, args.chunk, results, args.lowering)
    if "img" in parts:
        probe_uni("img", 3, args.chunk, results, args.lowering)
    if "img_fp32" in parts:
        # Production default: image clients run fp32 unless
        # --client_bf16 (parity with the reference's fp32 clients);
        # the delta vs the bf16 row above is the flag's headroom.
        probe_uni("img", 3, args.chunk, results, args.lowering,
                  use_bf16=False)
    if "mm" in parts:
        probe_mm(4, args.chunk, results, lowering=args.lowering)
    if "mm_task" in parts:
        probe_mm(4, args.chunk, results, task=True,
                 lowering=args.lowering)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
