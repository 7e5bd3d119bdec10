"""Server engine: global PCME training, feature extraction, distillation.

Reference: `src/algorithms/retrieval_trainer.py:37-238` (train/eval/ckpt)
plus the distill pass owned by `MMFL.distill` (`MMFL.py:343-391`).

All hot paths are single jitted programs:
  * ``train_step``   — PCME forward + MCSoft criterion + AdamP(+clip2).
  * ``extract_step`` — feature pass over the public set. The reference
    leaves the model in train() mode here, so BatchNorm consumes batch
    statistics and updates running stats even under no_grad
    (MMFL.py:194-221); reproduced via ``mutable=['batch_stats']``.
  * ``distill_step`` — forward + kd_weight * MSE against the con_w
    aggregated targets; modality terms are compile-time flags matching
    MMFL.py:361-378 (the mm-client term double-counts on purpose).

bf16 policy: ResNet/BERT compute in bf16, params + criterion fp32 (the
TPU equivalent of the reference's apex O2, coco.yaml:58).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from creamfl_tpu.engine.state import EngineState
from creamfl_tpu.losses.mcsoft import (MCSoftContrastiveConfig,
                                       init_mcsoft_params,
                                       mcsoft_contrastive_loss)
from creamfl_tpu.models.bert import BertConfig
from creamfl_tpu.models.pcme import PCME
from creamfl_tpu.optim.factory import (cosine_annealing_schedule,
                                       make_server_optimizer)


class ServerEngine:
    def __init__(self, config, vocab_size: int, mlp_local: bool = False,
                 bert_config: Optional[BertConfig] = None,
                 use_bf16: Optional[bool] = None):
        model_cfg = config.model
        if use_bf16 is None:
            use_bf16 = bool(config.train.get("use_bf16", False))
        dtype = jnp.bfloat16 if use_bf16 else jnp.float32
        self.config = config
        self.model = PCME(
            embed_dim=model_cfg.embed_dim,
            cnn_type=model_cfg.cnn_type,
            vocab_size=vocab_size,
            word_dim=model_cfg.get("word_dim", 300),
            not_bert=bool(model_cfg.get("not_bert", True)),
            mlp_local=mlp_local,
            bert_config=bert_config or BertConfig(),
            dtype=dtype,
        )
        crit_cfg = config.criterion
        self.criterion_config = MCSoftContrastiveConfig(
            init_shift=float(crit_cfg.get("init_shift", 15)),
            init_negative_scale=float(crit_cfg.get("init_negative_scale",
                                                   15)),
            uniform_lambda=float(crit_cfg.get("uniform_lambda", 0)),
            vib_beta=float(crit_cfg.get("vib_beta", 0)),
        )
        opt_cfg = config.optimizer
        self.tx, self.lr_schedule = make_server_optimizer(
            learning_rate=float(opt_cfg.learning_rate),
            t_max=int(config.lr_scheduler.get("T_max", 30)),
            grad_clip=float(config.train.get("grad_clip", 2.0)),
            weight_decay=float(opt_cfg.get("weight_decay", 0.0)),
        )
        self.kd_weight = 0.3  # overridden by federation from CLI args

    # -- state ---------------------------------------------------------
    def init_state(self, rng, sample_batch: Dict[str, Any]) -> EngineState:
        images = jnp.asarray(sample_batch["images"])
        captions, lengths, bert_mask = self._text_inputs(sample_batch)
        return self._init_program(rng, images, captions, lengths,
                                  bert_mask)

    @functools.partial(jax.jit, static_argnums=(0,))
    def _init_program(self, rng, images, captions, lengths,
                      bert_mask) -> EngineState:
        # One compiled program: eager init would dispatch hundreds of
        # ops (deadly over a remote-TPU tunnel at ~25ms RTT each).
        variables = self.model.init(rng, images, captions, lengths,
                                    bert_mask)
        params = {"model": variables["params"],
                  "criterion": init_mcsoft_params(self.criterion_config)}
        batch_stats = variables.get("batch_stats", {})
        return EngineState(params=params, batch_stats=batch_stats,
                           opt_state=self.tx.init(params), step=0)

    def _text_inputs(self, batch):
        if self.model.not_bert:
            return (jnp.asarray(batch["captions"]),
                    jnp.asarray(batch["lengths"]), None)
        return (jnp.asarray(batch["bert_ids"]),
                jnp.asarray(batch["bert_mask"]).sum(-1),
                jnp.asarray(batch["bert_mask"]))

    def _text_inputs_host(self, batch):
        """Host (numpy) variant of ``_text_inputs`` for callers that
        device_put straight into a mesh sharding: jnp.asarray would
        commit to the default device first, costing a second
        device-to-device reshard per field per batch."""
        if self.model.not_bert:
            return (np.asarray(batch["captions"]),
                    np.asarray(batch["lengths"]), None)
        mask = np.asarray(batch["bert_mask"])
        return (np.asarray(batch["bert_ids"]),
                mask.sum(-1, dtype=np.int32), mask)

    def set_round_lr(self, state: EngineState, round_n: int) -> EngineState:
        state.opt_state.hyperparams["learning_rate"] = (
            self.lr_schedule(round_n))
        return state

    def load_pretrained(self, state: EngineState,
                        resnet_path: Optional[str] = None,
                        bert_path: Optional[str] = None,
                        glove_path: Optional[str] = None,
                        vocab=None) -> EngineState:
        """Graft pretrained torchvision/HF/GloVe weights into the state
        (reference loads all three at construction; here they are local
        checkpoint files — this env has no network)."""
        from creamfl_tpu.models import convert

        params = jax.tree.map(lambda x: x, state.params)  # shallow copy
        batch_stats = dict(state.batch_stats)
        model_p = dict(params["model"])
        if resnet_path:
            sd = convert.load_state_dict(resnet_path)
            trunk, stats = convert.torchvision_resnet_to_flax(sd)
            img_enc = dict(model_p["img_enc"])
            img_enc["cnn"] = trunk
            model_p["img_enc"] = img_enc
            bs_img = dict(batch_stats.get("img_enc", {}))
            bs_img["cnn"] = stats
            batch_stats["img_enc"] = bs_img
        if bert_path and not self.model.not_bert:
            sd = convert.load_state_dict(bert_path)
            txt_enc = dict(model_p["txt_enc"])
            txt_enc["bert"] = convert.hf_bert_to_flax(
                sd, self.model.bert_config.num_layers)
            model_p["txt_enc"] = txt_enc
        if glove_path and self.model.not_bert and vocab is not None:
            txt_enc = dict(model_p["txt_enc"])
            mat, missing = convert.load_glove_embeddings(
                glove_path, vocab, self.model.word_dim,
                init=np.asarray(txt_enc["embed"]["embedding"]))
            txt_enc["embed"] = {"embedding": jnp.asarray(mat)}
            model_p["txt_enc"] = txt_enc
        params["model"] = model_p
        return state.replace(params=params, batch_stats=batch_stats)

    def save_models(self, path: str, state: EngineState,
                    metadata: Optional[Dict] = None) -> str:
        """Engine checkpoint bundle (reference
        retrieval_trainer.py:137-149: model+criterion+optimizer+config
        +metadata, sha1-tagged)."""
        from creamfl_tpu.utils.serialize import save_checkpoint

        return save_checkpoint(path, {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "step": int(state.step),
            "config": self.config.to_dict(),
            "metadata": metadata or {},
        })

    def load_models(self, path: str, state: EngineState) -> EngineState:
        """Restore a save_models bundle into an initialized state,
        including the optimizer moments (reference load_models restores
        the optimizer state_dict, retrieval_trainer.py:160-171)."""
        from creamfl_tpu.utils.serialize import load_checkpoint

        blob = load_checkpoint(path)
        opt_state = state.opt_state
        if "opt_state" in blob:
            # The saved tree mirrors the live optax state's structure;
            # restore leaf-by-leaf so AdamP mu/nu/count (and the
            # injected learning_rate) resume instead of resetting.
            leaves, treedef = jax.tree.flatten(opt_state)
            saved = jax.tree.leaves(blob["opt_state"])
            if len(saved) == len(leaves):
                opt_state = jax.tree.unflatten(
                    treedef, [jnp.asarray(s).astype(jnp.asarray(l).dtype)
                              if hasattr(l, "dtype") else s
                              for s, l in zip(saved, leaves)])
        return state.replace(
            params=jax.tree.map(jnp.asarray, blob["params"]),
            batch_stats=jax.tree.map(jnp.asarray, blob["batch_stats"]),
            opt_state=opt_state,
            step=blob.get("step", 0))

    def report_scores(self, step: int, scores: Dict, metadata=None,
                      prefix: str = "", logger=None) -> Dict:
        """Flattened metric report (reference retrieval_trainer.py:216-237
        key format: ``{split}__{section}_{metric}``)."""
        from creamfl_tpu.utils.serialize import flatten_dict

        report = {}
        for data_key, sub in scores.items():
            if isinstance(sub, dict):
                flat = flatten_dict(sub, sep="_")
                report.update({f"{prefix}{data_key}__{k}": v
                               for k, v in flat.items()})
            else:
                report[f"{prefix}{data_key}"] = sub
        if metadata:
            report.update({f"{prefix}meta_{k}": v
                           for k, v in metadata.items()})
        if logger is not None:
            logger.report(step, report)
        return report

    # -- jitted programs ----------------------------------------------
    # State buffers are donated (the round loop always replaces the
    # state; nothing aliases server params, unlike the client MOON
    # snapshots which forbid donation in the client engines).
    @functools.partial(jax.jit, static_argnums=(0,), donate_argnums=(1,))
    def train_step(self, state: EngineState, images, captions, lengths,
                   bert_mask, dropout_rng
                   ) -> Tuple[EngineState, Dict[str, jnp.ndarray]]:
        return self._train_core(state, images, captions, lengths,
                                bert_mask, dropout_rng)

    def _train_core(self, state: EngineState, images, captions, lengths,
                    bert_mask, dropout_rng
                    ) -> Tuple[EngineState, Dict[str, jnp.ndarray]]:
        def loss_fn(params):
            out, mut = self.model.apply(
                {"params": params["model"],
                 "batch_stats": state.batch_stats},
                images, captions, lengths, bert_mask, train=True,
                mutable=["batch_stats"], rngs={"dropout": dropout_rng})
            loss, ldict = mcsoft_contrastive_loss(
                params["criterion"], out["image_features"],
                out["caption_features"], self.criterion_config)
            return loss, (mut.get("batch_stats", {}), ldict)

        (loss, (batch_stats, ldict)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = self.tx.update(grads, state.opt_state,
                                            state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = EngineState(params=params, batch_stats=batch_stats,
                                opt_state=opt_state, step=state.step + 1)
        return new_state, ldict

    @functools.partial(jax.jit, static_argnums=(0,))
    def extract_step(self, state: EngineState, images, captions, lengths,
                     bert_mask, rng=None):
        """Train-mode feature pass (parity: MMFL.py:197-218 — the model
        is still in train() mode from the preceding server epoch, so BN
        uses batch stats AND dropout draws fresh iid noise per batch;
        callers pass a fresh ``rng`` each batch).
        Returns (img_feats, txt_feats, new_batch_stats)."""
        if rng is None:
            rng = jax.random.PRNGKey(0)
        out, mut = self.model.apply(
            {"params": state.params["model"],
             "batch_stats": state.batch_stats},
            images, captions, lengths, bert_mask, train=True,
            mutable=["batch_stats"],
            rngs={"dropout": rng})
        return (out["image_features"], out["caption_features"],
                mut.get("batch_stats", {}))

    @functools.partial(jax.jit, static_argnums=(0,))
    def eval_step(self, state: EngineState, images, captions, lengths,
                  bert_mask):
        """Eval-mode forward for retrieval evaluation."""
        out = self.model.apply(
            {"params": state.params["model"],
             "batch_stats": state.batch_stats},
            images, captions, lengths, bert_mask, train=False)
        return out["image_features"], out["caption_features"]

    # -- chunked sweeps -------------------------------------------------
    # The extract/eval sweeps are forward-only, so per-batch time is
    # milliseconds and the loops are DISPATCH-bound on a remote device
    # (~2 ms tunnel RTT per call; the eval extract floor was ~3 s of
    # pure RTT at paper geometry — BENCH.md round-3 pinning). A lax.scan
    # over a [k, B, ...] chunk of batches amortizes the dispatch k-fold;
    # the per-step math is identical to the per-batch programs.

    @functools.partial(jax.jit, static_argnums=(0,))
    def extract_chunk(self, state: EngineState, images, captions,
                      lengths, bert_mask, base_rng):
        """``extract_step`` over k stacked batches in ONE dispatch.

        BN running stats thread through the scan carry exactly as the
        per-batch loop threads them through successive calls; dropout
        keys derive per step by fold_in (fresh iid noise per batch,
        MMFL.py:197-218 train-mode extraction parity).
        Returns ([k,B,E] img, [k,B,E] txt, new_batch_stats)."""
        steps = jnp.arange(images.shape[0])
        has_mask = bert_mask is not None

        def body(bs, inp):
            if has_mask:
                img, cap, lens, bm, i = inp
            else:
                img, cap, lens, i = inp
                bm = None
            out, mut = self.model.apply(
                {"params": state.params["model"], "batch_stats": bs},
                img, cap, lens, bm, train=True,
                mutable=["batch_stats"],
                rngs={"dropout": jax.random.fold_in(base_rng, i)})
            return (mut.get("batch_stats", {}),
                    (out["image_features"], out["caption_features"]))

        xs = ((images, captions, lengths, bert_mask, steps) if has_mask
              else (images, captions, lengths, steps))
        batch_stats, (fi, ft) = jax.lax.scan(body, state.batch_stats, xs)
        return fi, ft, batch_stats

    @functools.partial(jax.jit, static_argnums=(0,))
    def eval_chunk(self, state: EngineState, images, captions, lengths,
                   bert_mask):
        """``eval_step`` over k stacked batches in ONE dispatch
        (eval-mode BN: stateless). Returns ([k,B,E], [k,B,E])."""
        has_mask = bert_mask is not None

        def body(_, inp):
            if has_mask:
                img, cap, lens, bm = inp
            else:
                img, cap, lens = inp
                bm = None
            out = self.model.apply(
                {"params": state.params["model"],
                 "batch_stats": state.batch_stats},
                img, cap, lens, bm, train=False)
            return None, (out["image_features"],
                          out["caption_features"])

        xs = ((images, captions, lengths, bert_mask) if has_mask
              else (images, captions, lengths))
        _, (fi, ft) = jax.lax.scan(body, None, xs)
        return fi, ft

    @functools.partial(jax.jit, static_argnums=(0,), donate_argnums=(1,))
    def train_chunk(self, state: EngineState, images, captions, lengths,
                    bert_mask, base_rng
                    ) -> Tuple[EngineState, jnp.ndarray]:
        """``train_step`` over k stacked batches in ONE dispatch: the
        scan carries the FULL engine state (params + AdamP moments + BN
        stats), so step t+1 sees exactly the state the per-batch loop
        would hand it; dropout keys derive per step by fold_in.
        Returns (new_state, [k] losses)."""
        steps = jnp.arange(images.shape[0])
        has_mask = bert_mask is not None

        def body(st, inp):
            if has_mask:
                img, cap, lens, bm, i = inp
            else:
                img, cap, lens, i = inp
                bm = None
            st, ldict = self._train_core(st, img, cap, lens, bm,
                                         jax.random.fold_in(base_rng, i))
            return st, ldict["loss"]

        xs = ((images, captions, lengths, bert_mask, steps) if has_mask
              else (images, captions, lengths, steps))
        return jax.lax.scan(body, state, xs)

    @functools.partial(jax.jit,
                       static_argnums=(0, 8, 9, 10), donate_argnums=(1,))
    def distill_chunk(self, state: EngineState, images, captions,
                      lengths, bert_mask,
                      aggregated: Dict[str, jnp.ndarray],
                      rows: jnp.ndarray,
                      use_img: bool, use_txt: bool, use_mm: bool,
                      kd_weight: float, base_rng
                      ) -> Tuple[EngineState, jnp.ndarray]:
        """``distill_step`` over k stacked batches in ONE dispatch
        (full-state scan carry, fold_in dropout keys); ``rows`` is
        [k, B]. Returns (new_state, [k] losses)."""
        steps = jnp.arange(images.shape[0])
        has_mask = bert_mask is not None

        def body(st, inp):
            if has_mask:
                img, cap, lens, bm, r, i = inp
            else:
                img, cap, lens, r, i = inp
                bm = None
            st, loss = self._distill_core(
                st, img, cap, lens, bm, aggregated, r, use_img, use_txt,
                use_mm, kd_weight, jax.random.fold_in(base_rng, i))
            return st, loss

        xs = ((images, captions, lengths, bert_mask, rows, steps)
              if has_mask else (images, captions, lengths, rows, steps))
        return jax.lax.scan(body, state, xs)

    @functools.partial(jax.jit,
                       static_argnums=(0, 8, 9, 10), donate_argnums=(1,))
    def distill_step(self, state: EngineState, images, captions, lengths,
                     bert_mask, aggregated: Dict[str, jnp.ndarray],
                     rows: jnp.ndarray,
                     use_img: bool, use_txt: bool, use_mm: bool,
                     kd_weight: float, dropout_rng=None
                     ) -> Tuple[EngineState, jnp.ndarray]:
        """aggregated: {'img': [N,d], 'txt': [N,d]} full con_w ensembles
        (device-resident across the epoch); ``rows`` [B] indexes this
        batch's targets. The gather lives INSIDE the program — eager
        per-batch gathers cost a dispatch round-trip each on a remote
        device."""
        if dropout_rng is None:
            dropout_rng = jax.random.PRNGKey(0)
        return self._distill_core(state, images, captions, lengths,
                                  bert_mask, aggregated, rows, use_img,
                                  use_txt, use_mm, kd_weight, dropout_rng)

    def _distill_core(self, state: EngineState, images, captions,
                      lengths, bert_mask, aggregated, rows,
                      use_img: bool, use_txt: bool, use_mm: bool,
                      kd_weight: float, dropout_rng
                      ) -> Tuple[EngineState, jnp.ndarray]:
        def loss_fn(params):
            out, mut = self.model.apply(
                {"params": params["model"],
                 "batch_stats": state.batch_stats},
                images, captions, lengths, bert_mask, train=True,
                mutable=["batch_stats"], rngs={"dropout": dropout_rng})
            loss = 0.0
            img_f = out["image_features"].astype(jnp.float32)
            txt_f = out["caption_features"].astype(jnp.float32)
            t_img = jnp.take(aggregated["img"], rows, axis=0)
            t_txt = jnp.take(aggregated["txt"], rows, axis=0)

            def mse(a, b):
                return jnp.mean(jnp.square(a - b))

            if use_img:
                loss += kd_weight * mse(img_f, t_img)
            if use_txt:
                loss += kd_weight * mse(txt_f, t_txt)
            if use_mm:
                # The reference adds both terms *again* for mm clients
                # (MMFL.py:371-378); reproduced for parity.
                loss += kd_weight * mse(img_f, t_img)
                loss += kd_weight * mse(txt_f, t_txt)
            return loss, mut.get("batch_stats", {})

        (loss, batch_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = self.tx.update(grads, state.opt_state,
                                            state.params)
        params = optax.apply_updates(state.params, updates)
        return EngineState(params=params, batch_stats=batch_stats,
                           opt_state=opt_state,
                           step=state.step + 1), loss
