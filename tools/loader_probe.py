"""Where does the paper-scale pub sweep time go? (chip probe)

PAPER_ROUND.json shows clients_txt ~ 120 s while the stacked txt
contrast compute is ~6 s (tools/client_probe.py) — the gap is the pub
loader pipeline itself (device image synthesis + chunk stacking +
dispatch). This probe times one 391-batch pub sweep in three modes:

  iterate   — loader iteration only (synth dispatches, nothing consumed)
  consume   — + _device_batch + chunk stacking (the stacked-epoch host path)
  txt_epoch — full stacked_uni_contrast_epoch for 3 txt clients

Usage: python tools/loader_probe.py [--batches 96]
"""

from __future__ import annotations

import argparse
import sys
import time
import types

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")


def make_args():
    a = types.SimpleNamespace()
    a.feature_dim = 256
    a.img_model_local = "resnet18"
    a.mlp_local = False
    a.interintra_weight = 0.5
    a.loss_scale = False
    a.batch_size = 128
    a.num_img_clients = 0
    a.num_txt_clients = 0
    a.num_mm_clients = 0
    a.seed = 42
    a.alpha = 0.1
    return a


def build_pub(pub_size):
    from creamfl_tpu.data import pipelines

    args = make_args()
    ds = pipelines.build_synthetic_datasets(
        args, pub_size=pub_size, image_size=224, max_len=32,
        client_data_size=8, test_size=8, retrieval_test_size=8,
        cache=True, prefetch=2, device_images=True,
        pub_batch_size=128, pub_eval_batch_size=256)
    return ds["pub_train"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, default=96)
    ap.add_argument("--pub_size", type=int, default=50_000)
    ap.add_argument("--parts", default="iterate,consume,txt_epoch")
    args = ap.parse_args()
    parts = args.parts.split(",")
    loader = build_pub(args.pub_size)

    def take(n):
        it = iter(loader)
        for _ in range(n):
            yield next(it)

    # warm the synth program
    b = next(iter(loader))
    jnp.sum(b["images"]).block_until_ready()

    if "iterate" in parts:
        t0 = time.perf_counter()
        last = None
        for b in take(args.batches):
            last = b
        float(jnp.sum(last["images"]))  # force the queue
        dt = (time.perf_counter() - t0) / args.batches
        print(f"iterate : {dt*1e3:6.1f} ms/batch "
              f"({dt*391*5:5.0f}s per 5-epoch sweep)", flush=True)

    if "consume" in parts:
        from creamfl_tpu.federation.stacked import _chunks, _stack_chunk

        t0 = time.perf_counter()
        out = None
        for group in _chunks(take(args.batches), 8):
            out = _stack_chunk(group)
        float(jnp.sum(out["images"]))
        dt = (time.perf_counter() - t0) / args.batches
        print(f"consume : {dt*1e3:6.1f} ms/batch "
              f"({dt*391*5:5.0f}s per 5-epoch sweep)", flush=True)

    if "txt_epoch" in parts:
        from creamfl_tpu.engine.client_uni import UniClientEngine
        from creamfl_tpu.federation import stacked as S
        from creamfl_tpu.federation.rounds import _device_batch

        uargs = make_args()
        engine = UniClientEngine("txt", num_class=4, args=uargs,
                                 vocab_size=100)
        sample = _device_batch(next(iter(loader)))
        states = [engine.init_state(jax.random.PRNGKey(i), sample)
                  for i in range(3)]
        rng = np.random.default_rng(0)
        g = rng.normal(size=(args.pub_size, 256)).astype(np.float32)
        g /= np.linalg.norm(g, axis=-1, keepdims=True)
        g = jnp.asarray(g)
        def batch_rows(batch):
            # HOST array, like MMFL._batch_rows — returning a device
            # array here costs a fetch round-trip per batch.
            return (np.asarray(batch["index"]) % args.pub_size).astype(
                np.int32)

        from creamfl_tpu.data.loaders import ProjectedLoader

        def take_proj(n):
            src = ProjectedLoader(loader,
                                  ("captions", "lengths", "index",
                                   "valid"))
            it = iter(src)
            for _ in range(n):
                yield next(it)

        def run(n):
            new_states = S.stacked_uni_contrast_epoch(
                engine, states, [s.params for s in states],
                [s.batch_stats for s in states], take_proj(n),
                g, g, batch_rows, True, True, _device_batch,
                scan_chunk=32)
            float(jnp.sum(new_states[0].step))

        run(64)  # compile the chunk program outside the timed region
        t0 = time.perf_counter()
        run(args.batches)
        dt = (time.perf_counter() - t0) / args.batches
        print(f"txt_epoch: {dt*1e3:6.1f} ms/batch "
              f"({dt*391*5:5.0f}s per 5-epoch sweep)", flush=True)


if __name__ == "__main__":
    main()
