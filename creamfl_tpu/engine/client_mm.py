"""Multimodal (Flickr30k) client engine.

Reference: `src/algorithms/MMClientTrainer.py:89-359` +
`src/algorithms/base.py:62-230` (engine construction from f30k.yaml:
PCME resnet18+GRU, MCSoft criterion, AdamP, cosine schedule, clip 2).

Per round: local PCME contrastive epochs on the client's F30k shard,
then public-set inter+intra contrast over *both* modalities (the intra
logits stack image rows on caption rows before one CE,
MMClientTrainer.py:184-191), then upload of both representation
matrices.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from creamfl_tpu.engine.state import EngineState
from creamfl_tpu.losses.classification import cross_entropy
from creamfl_tpu.losses.contrast import (combine_inter_intra,
                                         inter_modal_loss)
from creamfl_tpu.losses.mcsoft import (MCSoftContrastiveConfig,
                                       init_mcsoft_params,
                                       mcsoft_contrastive_loss)
from creamfl_tpu.models.pcme import PCME
from creamfl_tpu.optim.factory import make_server_optimizer


class MMClientEngine:
    def __init__(self, config, vocab_size: int, args,
                 mlp_local: bool = False):
        model_cfg = config.model
        self.args = args
        self.model = PCME(
            embed_dim=model_cfg.embed_dim,
            cnn_type=model_cfg.get("cnn_type", "resnet18"),
            vocab_size=vocab_size,
            word_dim=model_cfg.get("word_dim", 300),
            not_bert=True,
            mlp_local=mlp_local,
            # bf16 conv compute (apex-O2 equivalent, f30k.yaml use_fp16).
            dtype=(jnp.bfloat16
                   if config.train.get("use_bf16", False)
                   else jnp.float32),
        )
        self.criterion_config = MCSoftContrastiveConfig(
            init_shift=float(config.criterion.get("init_shift", 15)),
            init_negative_scale=float(
                config.criterion.get("init_negative_scale", 15)),
        )
        self.tx, self.lr_schedule = make_server_optimizer(
            learning_rate=float(config.optimizer.learning_rate),
            t_max=int(config.lr_scheduler.get("T_max", 30)),
            grad_clip=float(config.train.get("grad_clip", 2.0)),
            weight_decay=float(config.optimizer.get("weight_decay", 0.0)),
        )
        self.tau = 0.5

    def init_state(self, rng, sample_batch) -> EngineState:
        return self._init_program(rng, jnp.asarray(sample_batch["images"]),
                                  jnp.asarray(sample_batch["captions"]),
                                  jnp.asarray(sample_batch["lengths"]))

    @functools.partial(jax.jit, static_argnums=(0,))
    def _init_program(self, rng, images, captions, lengths) -> EngineState:
        # Single compiled init (see ServerEngine._init_program).
        variables = self.model.init(rng, images, captions, lengths)
        params = {"model": variables["params"],
                  "criterion": init_mcsoft_params(self.criterion_config)}
        return EngineState(params=params,
                           batch_stats=variables.get("batch_stats", {}),
                           opt_state=self.tx.init(params), step=0)

    def set_round_lr(self, state: EngineState, round_n: int,
                     step_lr: bool = False) -> EngineState:
        """Parity quirk: the reference builds a cosine scheduler for mm
        clients but never calls .step() (MMClientTrainer has no
        lr_scheduler.step), so their LR stays at the initial 2e-4.
        ``step_lr=True`` opts into actually annealing."""
        if step_lr:
            state.opt_state.hyperparams["learning_rate"] = (
                self.lr_schedule(round_n))
        return state

    def _forward(self, params, batch_stats, batch, train,
                 mutable=False, rng=None):
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        kwargs = dict(train=train)
        if mutable:
            kwargs["mutable"] = ["batch_stats"]
        if train:
            kwargs["rngs"] = {"dropout": (rng if rng is not None
                                          else jax.random.PRNGKey(0))}
        return self.model.apply(variables, batch["images"],
                                batch["captions"], batch["lengths"],
                                **kwargs)

    # -- local PCME epoch step ----------------------------------------
    @functools.partial(jax.jit, static_argnums=(0,))
    def local_step(self, state: EngineState, batch, dropout_rng
                   ) -> Tuple[EngineState, Dict[str, jnp.ndarray]]:
        # Pairs touching repeat-padded rows are zeroed, matching the
        # reference's bare torch partial batch (drop_last=False) up to
        # BN batch statistics, which still see the duplicated rows.
        valid = batch.get("valid")

        def loss_fn(params):
            out, mut = self._forward(params["model"], state.batch_stats,
                                     batch, train=True, mutable=True,
                                     rng=dropout_rng)
            loss, ldict = mcsoft_contrastive_loss(
                params["criterion"], out["image_features"],
                out["caption_features"], self.criterion_config,
                valid=valid)
            return loss, (mut.get("batch_stats", {}), ldict)

        (loss, (batch_stats, ldict)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = self.tx.update(grads, state.opt_state,
                                            state.params)
        params = optax.apply_updates(state.params, updates)
        return EngineState(params=params, batch_stats=batch_stats,
                           opt_state=opt_state,
                           step=state.step + 1), ldict

    # -- public-set contrast ------------------------------------------
    @functools.partial(jax.jit, static_argnums=(0, 6, 7))
    def contrast_step(self, state: EngineState, old_params,
                      old_batch_stats, batch,
                      globals_: Dict[str, jnp.ndarray],
                      do_inter: bool, do_intra: bool
                      ) -> Tuple[EngineState, jnp.ndarray]:
        d_idx = globals_["index"]
        tgt_img = jnp.take(globals_["img"], d_idx, axis=0)
        tgt_txt = jnp.take(globals_["txt"], d_idx, axis=0)

        def loss_fn(params):
            out, mut = self._forward(params["model"], state.batch_stats,
                                     batch, train=True, mutable=True)
            f_img = out["image_features"].astype(jnp.float32)
            f_txt = out["caption_features"].astype(jnp.float32)
            loss_intra = loss_inter = jnp.float32(0.0)
            if do_intra:
                old = self._forward(old_params["model"], old_batch_stats,
                                    batch, train=False)
                old_img = jax.lax.stop_gradient(
                    old["image_features"].astype(jnp.float32))
                old_txt = jax.lax.stop_gradient(
                    old["caption_features"].astype(jnp.float32))
                # Stacked 2-way CE over img rows then txt rows
                # (MMClientTrainer.py:184-191).
                pos = jnp.concatenate([
                    jnp.sum(f_img * tgt_img, -1),
                    jnp.sum(f_txt * tgt_txt, -1)])
                neg = jnp.concatenate([
                    jnp.sum(f_img * old_img, -1),
                    jnp.sum(f_txt * old_txt, -1)])
                logits = jnp.stack([pos, neg], axis=1) / self.tau
                labels = jnp.zeros((logits.shape[0],), jnp.int32)
                loss_intra = cross_entropy(logits, labels)
            if do_inter:
                loss_inter = (
                    inter_modal_loss(f_img, globals_["txt"], d_idx,
                                     self.tau)
                    + inter_modal_loss(f_txt, globals_["img"], d_idx,
                                       self.tau))
            if do_inter and do_intra:
                loss = combine_inter_intra(loss_intra, loss_inter,
                                           self.args.interintra_weight,
                                           self.args.loss_scale)
            else:
                loss = loss_inter + loss_intra
            return loss, mut.get("batch_stats", {})

        (loss, batch_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = self.tx.update(grads, state.opt_state,
                                            state.params)
        params = optax.apply_updates(state.params, updates)
        # The MCSoft criterion scalars are unused by the contrast loss:
        # torch AdamP sees grad=None for them and skips (their moment
        # buffers from the local epochs must NOT keep perturbing them).
        from creamfl_tpu.optim.factory import restore_frozen

        params, opt_state = restore_frozen(
            ("criterion",), params, opt_state, state.params,
            state.opt_state)
        return EngineState(params=params, batch_stats=batch_stats,
                           opt_state=opt_state,
                           step=state.step + 1), loss

    @functools.partial(jax.jit, static_argnums=(0,))
    def features_step(self, state: EngineState, batch):
        """Eval-mode rep upload (MMClientTrainer.generate_logits calls
        .eval(), unlike the unimodal path)."""
        out = self._forward(state.params["model"], state.batch_stats,
                            batch, train=False)
        return out["image_features"], out["caption_features"]
