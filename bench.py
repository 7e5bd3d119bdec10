"""Benchmark harness — run on the real TPU chip (default axon platform).

Headline metric: server PCME (ResNet-101 + BERT-base) training-step
throughput in samples/s — the reference's HOT LOOP 1 (SURVEY.md §3.2),
391 batches x bs128 per round, and the dominant server-side cost.

vs_baseline: the reference repo publishes no numbers (BASELINE.md). The
baseline constant below is a roofline derivation anchored by a measured
torch-CPU run of the same computation (tools/torch_anchor.py):
workload = ResNet-101 fwd+bwd at 224^2 (7.85 GMACs -> 47.1 GFLOP/sample
fwd+bwd) + BERT-base at L=32 (16.3 GFLOP/sample) ~= 63.4 GFLOP/sample.
On the reference's documented V100-class fp16 hardware (125 TFLOP/s
peak) at the 25-35% MFU typical for torch mixed conv+transformer
training, that is 490-690 samples/s compute-bound; the reference
additionally tokenizes inside the forward on the host (pcme.py:40-44)
and syncs per batch, so 500 samples/s is an optimistic-for-the-
reference baseline. (torch_anchor measured this host's torch CPU at
0.99 samples/s / 62.6 GFLOP/s, confirming the FLOP accounting.)

Also measured (reported in "extra"): the inter-modal contrast step
against a 50k gallery (client HOT LOOP 4) and con_w aggregation
(HOT LOOP 6).
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_SERVER_SAMPLES_PER_SEC = 500.0


def _rtt() -> float:
    """Round-trip latency of a trivial dispatch + scalar fetch. The axon
    tunnel's block_until_ready does not actually synchronize, so all
    timings below force completion with a scalar host fetch and subtract
    this latency."""
    f = jax.jit(lambda x: jnp.sum(x))
    x = jnp.ones((8, 8))
    float(f(x))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(f(x))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def _time_scan(step_fn, init_state, to_scalar, iters=10, repeats=3):
    """Time ``iters`` chained applications of ``step_fn`` compiled as ONE
    program (lax.scan), completion forced by fetching a scalar."""
    from jax import lax

    @jax.jit
    def run(state):
        def body(s, _):
            return step_fn(s), None

        s, _ = lax.scan(body, state, None, length=iters)
        return to_scalar(s)

    float(run(init_state))  # compile + warm
    rtt = _rtt()
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(run(init_state))
        best = min(best, time.perf_counter() - t0)
    return max(best - rtt, 1e-9) / iters


def bench_server_step(on_tpu: bool):
    from creamfl_tpu.config import default_config_path, parse_config
    from creamfl_tpu.models.bert import BertConfig

    from creamfl_tpu.engine.server import ServerEngine

    cfg = parse_config(default_config_path("coco.yaml"), strict_cast=False)
    cfg.model.embed_dim = 256
    if on_tpu:
        cfg.model.cnn_type = "resnet101"
        cfg.model.not_bert = False
        cfg.train.use_bf16 = True
        # bs128 = the reference's public-set batch size (coco.yaml) and
        # the better-measured MFU point (105ms vs 57ms at bs64).
        batch, img, seqlen = 128, 224, 32
        bert_cfg = BertConfig()
    else:  # CPU smoke fallback so the harness always emits a line
        cfg.model.cnn_type = "resnet10"
        cfg.model.not_bert = True
        cfg.model.word_dim = 32
        cfg.train.use_bf16 = False
        batch, img, seqlen = 8, 64, 16
        bert_cfg = BertConfig.tiny()
    engine = ServerEngine(cfg, vocab_size=30522 if on_tpu else 512,
                          bert_config=bert_cfg)

    rng = np.random.default_rng(0)
    sample = {
        "images": rng.normal(size=(batch, img, img, 3)).astype(np.float32),
        "captions": rng.integers(
            1, 400, size=(batch, seqlen)).astype(np.int32),
        "lengths": np.full((batch,), seqlen, np.int32),
        "bert_ids": rng.integers(
            1, 400, size=(batch, seqlen)).astype(np.int32),
        "bert_mask": np.ones((batch, seqlen), np.int32),
    }
    state = engine.init_state(jax.random.PRNGKey(0), sample)
    images, captions, lengths, bert_mask = (
        jnp.asarray(sample["images"]),) + engine._text_inputs(sample)
    from creamfl_tpu.utils.helper import fast_prng_key

    key = fast_prng_key(1)

    def step(state):
        new_state, _ = engine.train_step(state, images, captions, lengths,
                                         bert_mask, key)
        return new_state

    dt = _time_scan(step, state,
                    lambda s: jnp.sum(s.params["criterion"]["shift"]),
                    iters=10 if on_tpu else 3)
    return batch / dt, dt


def bench_contrast_step(on_tpu: bool):
    """bs x 50k inter-modal CE + MOON fwd+bwd (client hot loop)."""
    from creamfl_tpu.losses.contrast import (combine_inter_intra,
                                             inter_modal_loss,
                                             intra_modal_moon_loss)

    n, d, bs = (50000, 256, 128) if on_tpu else (2048, 64, 32)
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.normal(size=(bs, d)), jnp.float32)
    gallery = jnp.asarray(rng.normal(size=(n, d)), jnp.float32)
    target = jnp.asarray(rng.normal(size=(bs, d)), jnp.float32)
    old = jnp.asarray(rng.normal(size=(bs, d)), jnp.float32)
    idx = jnp.arange(bs, dtype=jnp.int32)

    def step(f):
        def loss_fn(f):
            li = inter_modal_loss(f, gallery, idx, 0.5)
            lm = intra_modal_moon_loss(f, target, old, 0.5)
            return combine_inter_intra(lm, li, 0.5, False)

        return f - 1e-3 * jax.grad(loss_fn)(f)

    # Cheap step: many iterations so the chain dwarfs the tunnel RTT.
    dt = _time_scan(step, feats, jnp.sum, iters=200 if on_tpu else 10)
    return bs / dt, dt


def bench_conw(on_tpu: bool):
    """con_w aggregation: K clients x (50k x 50k) streamed."""
    from creamfl_tpu.federation.aggregation import con_w_aggregate

    k, n, d = (5, 50000, 256) if on_tpu else (3, 1024, 64)
    rng = np.random.default_rng(0)
    reps = jnp.asarray(rng.normal(size=(k, n, d)), jnp.float32)
    g = jnp.asarray(rng.normal(size=(n, d)), jnp.float32)
    row_block = 2048 if on_tpu else 256
    col_block = 8192 if on_tpu else 512

    def step(reps):
        out = con_w_aggregate(reps, g, row_block=row_block,
                              col_block=col_block)
        # Keep the chain data-dependent so scan can't parallelize it.
        return reps + 1e-6 * out[None, :, :]

    dt = _time_scan(step, reps, jnp.sum, iters=2, repeats=2)
    return dt


def _device_responsive(timeout_s: float = 90.0) -> bool:
    """True iff a trivial dispatch+fetch completes within the timeout.

    The remote-TPU tunnel can wedge (every dispatch blocks forever);
    without this guard the harness would hang instead of emitting its
    one JSON line. Probed on a daemon thread so a hung fetch can't
    stall us."""
    import threading

    ok = []

    def probe():
        try:
            float(jax.jit(lambda x: jnp.sum(x))(jnp.ones((8, 8))))
            ok.append(True)
        except Exception:
            pass

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout_s)
    return bool(ok)


def _force_cpu():
    import jax as _jax
    from jax._src import xla_bridge

    _jax.config.update("jax_platforms", "cpu")
    try:
        # The persistent cache was configured while the backend was
        # still TPU; CPU AOT artifacts are ISA-fragile on this
        # live-migrating VM (tests/conftest.py) — turn it off.
        _jax.config.update("jax_compilation_cache_dir", None)
    except Exception:
        pass
    if xla_bridge.backends_are_initialized():
        xla_bridge._clear_backends()
        _jax.clear_caches()


def main():
    from creamfl_tpu.main import _enable_compile_cache

    _enable_compile_cache()
    platform = jax.devices()[0].platform
    on_tpu = platform not in ("cpu",)
    device_unresponsive = False
    if on_tpu and not _device_responsive():
        # Wedged tunnel: fall back to the CPU smoke so the harness
        # still gets a line (flagged in extra.device_unresponsive).
        device_unresponsive = True
        _force_cpu()
        platform = jax.devices()[0].platform
        on_tpu = False
    server_sps, server_dt = bench_server_step(on_tpu)
    contrast_sps, contrast_dt = bench_contrast_step(on_tpu)
    conw_dt = bench_conw(on_tpu)

    # Measured paper-scale round (written by a --paper_scale run via
    # tools/record_paper_round.py; measured, not projected). Only the
    # headline numbers go into the one-line JSON — the full history
    # stays in PAPER_ROUND.json (the driver's tail-capture choked on
    # the embedded multi-KB record in rounds 3-4).
    paper_round = None
    try:
        import os
        path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "PAPER_ROUND.json")
        if os.path.exists(path):
            with open(path) as f:
                full = json.load(f)
            paper_round = {
                "steady_round_s": full.get("steady_round_s"),
                "cold_round_s": full.get("cold_round_s"),
                "file": "PAPER_ROUND.json",
            }
    except Exception:
        paper_round = None

    result = {
        "metric": "server PCME(R101+BERT) train-step throughput"
                  if on_tpu else "server train-step throughput (CPU smoke)",
        "value": round(server_sps, 2),
        "unit": "samples/s",
        "vs_baseline": round(server_sps / BASELINE_SERVER_SAMPLES_PER_SEC,
                             3) if on_tpu else 0.0,
        "extra": {
            "platform": platform,
            "device_unresponsive": device_unresponsive,
            "server_step_ms": round(server_dt * 1e3, 2),
            "contrast_step_samples_per_s": round(contrast_sps, 2),
            "contrast_step_ms": round(contrast_dt * 1e3, 2),
            "conw_aggregate_s": round(conw_dt, 4),
            "paper_round": paper_round,
            "baseline_note": "vs 500 samples/s reference roofline "
                             "(bench.py docstring + tools/torch_anchor.py)",
        },
    }
    line = json.dumps(result)
    assert len(line) < 1500, "bench JSON line must stay compact"
    print(line)
    import sys
    sys.stdout.flush()
    sys.stderr.flush()
    # Hard-exit: the remote-TPU tunnel client's teardown has aborted the
    # process AFTER a successful print twice (rc=134, "FATAL: exception
    # not rethrown" from a detached thread in its atexit path), turning
    # good benchmark runs into driver failures. The JSON is already on
    # stdout and flushed; skip interpreter teardown entirely.
    import os
    os._exit(0)


if __name__ == "__main__":
    main()
