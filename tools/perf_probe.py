"""Component-level timing of the server train step on the live chip.

Breaks HOT LOOP 1 (R101+BERT bs128, bench.py headline) into parts so the
optimization target is measured, not guessed:

  full      — engine.train_step (loss fwd+bwd + AdamP + clip)
  fwd_bwd   — value_and_grad of the loss only (no optimizer)
  fwd       — forward + loss only
  resnet    — image tower fwd+bwd only
  bert      — text tower fwd+bwd only
  adamp     — optimizer transform alone on fixed grads

Usage: python tools/perf_probe.py [--parts full,fwd_bwd,...]
"""

from __future__ import annotations

import argparse
import json
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from bench import _time_scan  # noqa: E402


def build(batch=128, img=224, seqlen=32):
    from creamfl_tpu.config import default_config_path, parse_config
    from creamfl_tpu.engine.server import ServerEngine
    from creamfl_tpu.models.bert import BertConfig

    cfg = parse_config(default_config_path("coco.yaml"), strict_cast=False)
    cfg.model.embed_dim = 256
    cfg.model.cnn_type = "resnet101"
    cfg.model.not_bert = False
    cfg.train.use_bf16 = True
    engine = ServerEngine(cfg, vocab_size=30522,
                          bert_config=BertConfig())
    rng = np.random.default_rng(0)
    sample = {
        "images": rng.normal(size=(batch, img, img, 3)).astype(np.float32),
        "bert_ids": rng.integers(1, 400, size=(batch, seqlen)).astype(
            np.int32),
        "bert_mask": np.ones((batch, seqlen), np.int32),
    }
    state = engine.init_state(jax.random.PRNGKey(0), sample)
    images = jnp.asarray(sample["images"])
    captions, lengths, bert_mask = engine._text_inputs(sample)
    return engine, state, images, captions, lengths, bert_mask


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--parts", default="full,fwd_bwd,fwd,resnet,bert,adamp")
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()
    parts = args.parts.split(",")

    engine, state, images, captions, lengths, bert_mask = build(args.batch)
    key = jax.random.PRNGKey(1)
    results = {}

    def report(name, dt):
        results[name] = round(dt * 1e3, 2)
        print(f"{name:10s} {dt * 1e3:8.2f} ms "
              f"({args.batch / dt:8.1f} samples/s)", flush=True)

    from creamfl_tpu.losses.mcsoft import mcsoft_contrastive_loss

    def loss_only(params):
        out = engine.model.apply(
            {"params": params["model"], "batch_stats": state.batch_stats},
            images, captions, lengths, bert_mask, train=True,
            mutable=["batch_stats"], rngs={"dropout": key})[0]
        loss, _ = mcsoft_contrastive_loss(
            params["criterion"], out["image_features"],
            out["caption_features"], engine.criterion_config)
        return loss

    if "full" in parts:
        def step(s):
            new_s, _ = engine.train_step(s, images, captions, lengths,
                                         bert_mask, key)
            return new_s
        report("full", _time_scan(
            step, state, lambda s: jnp.sum(s.params["criterion"]["shift"]),
            iters=args.iters))

    if "full_rbg" in parts:
        rbg_key = jax.random.key(1, impl="rbg")

        def step(s):
            new_s, _ = engine.train_step(s, images, captions, lengths,
                                         bert_mask, rbg_key)
            return new_s
        report("full_rbg", _time_scan(
            step, state, lambda s: jnp.sum(s.params["criterion"]["shift"]),
            iters=args.iters))

    if "fwd_bwd" in parts:
        def step(params):
            g = jax.grad(loss_only)(params)
            return jax.tree.map(lambda p, gg: p - 1e-6 * gg, params, g)
        report("fwd_bwd", _time_scan(
            step, state.params,
            lambda p: jnp.sum(p["criterion"]["shift"]), iters=args.iters))

    if "fwd" in parts:
        def step(params):
            l = loss_only(params)
            return jax.tree.map(lambda p: p + 1e-12 * l, params)
        report("fwd", _time_scan(
            step, state.params,
            lambda p: jnp.sum(p["criterion"]["shift"]), iters=args.iters))

    if "resnet" in parts:
        from creamfl_tpu.models.pcme import ImageEncoder

        enc = ImageEncoder(cnn_type="resnet101", embed_dim=256,
                           dtype=jnp.bfloat16)
        variables = jax.jit(enc.init)(jax.random.PRNGKey(0), images)
        img_p = variables["params"]
        img_bs = variables.get("batch_stats", {})

        def img_loss(p):
            out = enc.apply({"params": p, "batch_stats": img_bs}, images,
                            True, mutable=["batch_stats"])[0]
            return jnp.sum(jnp.square(out["embedding"]))

        def step(p):
            g = jax.grad(img_loss)(p)
            return jax.tree.map(lambda a, b: a - 1e-6 * b, p, g)
        report("resnet", _time_scan(
            step, img_p,
            lambda p: jnp.sum(p["fc"]["bias"]), iters=args.iters))

    if "resnet_fused" in parts:
        from creamfl_tpu.models.pcme import ImageEncoder

        enc = ImageEncoder(cnn_type="resnet101", embed_dim=256,
                           dtype=jnp.bfloat16, fused_bn=True)
        variables = jax.jit(enc.init)(jax.random.PRNGKey(0), images)
        img_p = variables["params"]
        img_bs = variables.get("batch_stats", {})

        def img_loss(p):
            out = enc.apply({"params": p, "batch_stats": img_bs}, images,
                            True, mutable=["batch_stats"])[0]
            return jnp.sum(jnp.square(out["embedding"]))

        def step(p):
            g = jax.grad(img_loss)(p)
            return jax.tree.map(lambda a, b: a - 1e-6 * b, p, g)
        report("resnet_fused", _time_scan(
            step, img_p,
            lambda p: jnp.sum(p["fc"]["bias"]), iters=args.iters))

    if "stem" in parts:
        import flax.linen as nn

        class Stem(nn.Module):
            @nn.compact
            def __call__(self, x, train=True):
                x = x.astype(jnp.bfloat16)
                x = nn.Conv(64, (7, 7), strides=(2, 2), padding=3,
                            use_bias=False, dtype=jnp.bfloat16,
                            name="conv1")(x)
                x = nn.BatchNorm(use_running_average=not train,
                                 momentum=0.9, epsilon=1e-5,
                                 dtype=jnp.bfloat16, name="bn1")(x)
                x = nn.relu(x)
                return nn.max_pool(x, (3, 3), strides=(2, 2),
                                   padding=((1, 1), (1, 1)))

        stem = Stem()
        variables = jax.jit(stem.init)(jax.random.PRNGKey(0), images)
        sp, sbs = variables["params"], variables["batch_stats"]

        def stem_loss(p):
            out = stem.apply({"params": p, "batch_stats": sbs}, images,
                             True, mutable=["batch_stats"])[0]
            return jnp.sum(jnp.square(out.astype(jnp.float32)))

        def step(p):
            g = jax.grad(stem_loss)(p)
            return jax.tree.map(lambda a, b: a - 1e-6 * b, p, g)
        report("stem", _time_scan(
            step, sp, lambda p: jnp.sum(p["conv1"]["kernel"]),
            iters=args.iters))

    if "resnet_remat" in parts:
        from creamfl_tpu.models.pcme import ImageEncoder

        for mode in ("block", "dots"):
            enc = ImageEncoder(cnn_type="resnet101", embed_dim=256,
                               dtype=jnp.bfloat16, remat=mode)
            variables = jax.jit(enc.init)(jax.random.PRNGKey(0), images)
            img_p = variables["params"]
            img_bs = variables.get("batch_stats", {})

            def img_loss(p, enc=enc, img_bs=img_bs):
                out = enc.apply({"params": p, "batch_stats": img_bs},
                                images, True,
                                mutable=["batch_stats"])[0]
                return jnp.sum(jnp.square(out["embedding"]))

            def step(p, img_loss=img_loss):
                g = jax.grad(img_loss)(p)
                return jax.tree.map(lambda a, b: a - 1e-6 * b, p, g)
            report(f"resnet_remat_{mode}", _time_scan(
                step, img_p,
                lambda p: jnp.sum(p["fc"]["bias"]), iters=args.iters))

    if "bert" in parts:
        from creamfl_tpu.models.bert import BertConfig
        from creamfl_tpu.models.pcme import TextEncoderBert

        enc = TextEncoderBert(embed_dim=256, bert_config=BertConfig(),
                              dtype=jnp.bfloat16)
        variables = jax.jit(enc.init)(jax.random.PRNGKey(0), captions,
                                      bert_mask)
        txt_p = variables["params"]

        def txt_loss(p):
            out = enc.apply({"params": p}, captions, bert_mask, True,
                            rngs={"dropout": key})
            return jnp.sum(jnp.square(out["embedding"]))

        def txt_loss_nodrop(p):
            out = enc.apply({"params": p}, captions, bert_mask, False)
            return jnp.sum(jnp.square(out["embedding"]))

        def step(p):
            g = jax.grad(txt_loss)(p)
            return jax.tree.map(lambda a, b: a - 1e-6 * b, p, g)

        def step_nodrop(p):
            g = jax.grad(txt_loss_nodrop)(p)
            return jax.tree.map(lambda a, b: a - 1e-6 * b, p, g)
        report("bert", _time_scan(
            step, txt_p,
            lambda p: jnp.sum(p["linear"]["bias"]), iters=args.iters))
        report("bert_nodrop", _time_scan(
            step_nodrop, txt_p,
            lambda p: jnp.sum(p["linear"]["bias"]), iters=args.iters))

    if "adamp" in parts:
        grads = jax.jit(jax.grad(loss_only))(state.params)
        grads = jax.tree.map(lambda x: x, grads)

        def step(carry):
            params, opt_state = carry
            updates, opt_state = engine.tx.update(grads, opt_state, params)
            import optax
            return optax.apply_updates(params, updates), opt_state
        report("adamp", _time_scan(
            step, (state.params, state.opt_state),
            lambda c: jnp.sum(c[0]["criterion"]["shift"]),
            iters=args.iters))

    print(json.dumps(results))


if __name__ == "__main__":
    main()
