"""Unimodal client engine (CIFAR image clients / AG_NEWS text clients).

Reference: `src/algorithms/ClientTrainer.py:136-674`. Per federated
round a selected client runs:
  1. ``local_epochs`` x task epochs: margin-softmax CE + 0.5 x
     weight-orthogonality loss, SGD(momentum 0.9, wd 5e-5), with the
     head-weight ReLU clamp persisted each step (§2.3 of SURVEY.md).
  2. ``local_epochs`` x public-set contrast epochs: inter-modal CE
     against the frozen other-modality global features + MOON intra
     contrast against the frozen pre-round model.
  3. representation upload: feature pass over the public set.

TPU design notes:
  * every step is one jitted program; the MOON "old model" is just a
    second param pytree (no deepcopy of module objects);
  * BatchNorm follows the reference's modes: contrast + rep-extraction
    run with train-mode BN (stats update; the reference never flips
    torch eval mode there), local test uses eval-mode BN;
  * clients of one family share the compiled program; stacked-client
    vmap/shard_map execution lives in creamfl_tpu.parallel.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from creamfl_tpu.engine.state import EngineState
from creamfl_tpu.losses.classification import (cross_entropy,
                                               margin_softmax_loss,
                                               weight_orthogonality_loss)
from creamfl_tpu.losses.contrast import (combine_inter_intra,
                                         inter_modal_loss,
                                         intra_modal_moon_loss)
from creamfl_tpu.models.clients import (ImageClientNet, TextClientNet,
                                        clamp_head_weights)
from creamfl_tpu.optim.factory import make_client_sgd, restore_frozen


def _deep_merge(a, b):
    """Union of two nested variable dicts; on a shared leaf keep ``a``'s
    (identical anyway — flax param rngs key off module paths)."""
    out = dict(a)
    for k, v in b.items():
        if k in out and isinstance(out[k], dict) and isinstance(v, dict):
            out[k] = _deep_merge(out[k], v)
        else:
            out.setdefault(k, v)
    return out


class UniClientEngine:
    """One engine per client *family* (image or text); individual clients
    differ only in their EngineState."""

    def __init__(self, modality: str, num_class: int, args,
                 vocab_size: int = 0, use_bf16: bool = False):
        assert modality in ("img", "txt")
        self.modality = modality
        self.args = args
        if modality == "img":
            self.model = ImageClientNet(
                # The reference builds resnet18_client unconditionally
                # (ClientTrainer.py:278 — --img_model_local is never
                # read for the architecture), so everything maps to
                # resnet18 except the scaled-down test/dryrun trunks.
                cnn_type=args.img_model_local
                if args.img_model_local in ("resnet6", "resnet10",
                                            "resnet18")
                else "resnet18",
                num_class=num_class, embed_dim=args.feature_dim,
                scale=128.0, mlp_local=args.mlp_local,
                dtype=jnp.bfloat16 if use_bf16 else jnp.float32)
        else:
            self.model = TextClientNet(
                vocab_size=vocab_size, num_class=num_class,
                embed_dim=args.feature_dim, scale=128.0,
                mlp_local=args.mlp_local)
        self.tx, self.lr_schedule = make_client_sgd(
            init_lr=1e-4, total_rounds=30)
        self.margin = 4.0  # inter_distance (MMFL.py:135)
        self.tau = 0.5

    # -- helpers -------------------------------------------------------
    def _apply(self, params, batch_stats, batch, train, phase,
               mutable=False):
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        kwargs = dict(train=train, phase=phase)
        if mutable:
            kwargs["mutable"] = ["batch_stats"]
        if self.modality == "img":
            return self.model.apply(variables, batch["images"], **kwargs)
        return self.model.apply(variables, batch["captions"],
                                batch["lengths"], **kwargs)

    def init_state(self, rng, sample_batch) -> EngineState:
        if self.modality == "img":
            args = (jnp.asarray(sample_batch["images"]),)
        else:
            args = (jnp.asarray(sample_batch["captions"]),
                    jnp.asarray(sample_batch["lengths"]))
        return self._init_program(rng, *args)

    @functools.partial(jax.jit, static_argnums=(0,))
    def _init_program(self, rng, *args) -> EngineState:
        # Single compiled init (see ServerEngine._init_program). Flax
        # init is lazy, so with --mlp_local BOTH phases must initialize
        # or the features-phase-only 'head_proj' params would never be
        # created and the first contrast/features apply would fail.
        # Flax derives param rngs from module paths (not creation
        # order), so shared modules get identical params in both inits
        # and a deep merge is exact.
        variables = self.model.init(rng, *args, False, "train")
        if getattr(self.model, "mlp_local", False):
            feat_vars = self.model.init(rng, *args, False, "features")
            variables = _deep_merge(variables, feat_vars)
        params = variables["params"]
        return EngineState(params=params,
                           batch_stats=variables.get("batch_stats", {}),
                           opt_state=self.tx.init(params), step=0)

    def set_round_lr(self, state: EngineState, round_n: int) -> EngineState:
        state.opt_state.hyperparams["learning_rate"] = (
            self.lr_schedule(round_n))
        return state

    # -- jitted steps --------------------------------------------------
    @functools.partial(jax.jit, static_argnums=(0,))
    def task_step(self, state: EngineState, batch
                  ) -> Tuple[EngineState, Dict[str, jnp.ndarray]]:
        """Margin CE + 0.5 * orthogonality, with the persistent head
        clamp applied *before* the forward (reference semantics)."""
        clamped = clamp_head_weights(dict(state.params))
        labels = batch["labels"]
        # Pad-aware loss: repeat-padded final batches (static shapes)
        # compute the same masked mean the reference gets from its bare
        # torch partial batch (DataLoader drop_last=False). Residual
        # deviation: BN batch statistics still see the duplicated rows.
        valid = batch.get("valid")

        def loss_fn(params):
            out = self._apply(params, state.batch_stats, batch,
                              train=True, phase="train", mutable=True)
            (x1, _x2, w1, _w2), mut = out
            task = margin_softmax_loss(x1, labels, self.margin,
                                       valid=valid)
            # Reference grad semantics: the center loss flows through
            # relu(W) (ClientTrainer.py:350 uses fc_weight_relu, whose
            # backward masks entries clamped to 0), while the logits
            # path uses the post-`.data`-swap weight UNmasked. w1 is
            # already clamped (>=0), so the strict where() only changes
            # the GRADIENT at the zero entries, not the value.
            center = weight_orthogonality_loss(
                jnp.where(w1 > 0, w1, 0.0))
            return task + 0.5 * center, (mut.get("batch_stats", {}), x1)

        (loss, (batch_stats, logits)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(clamped)
        updates, opt_state = self.tx.update(grads, state.opt_state, clamped)
        params = optax.apply_updates(clamped, updates)
        if getattr(self.model, "mlp_local", False):
            # head_proj only exists in the features phase: torch sees
            # grad=None for it here and skips it entirely.
            params, opt_state = restore_frozen(
                ("head_proj",), params, opt_state, clamped,
                state.opt_state)
        # top-1/top-5 on the margin-adjusted logits (reference
        # ClientTrainer.py:352-358 measures accuracy on fvec post-margin).
        adj = logits - self.margin * jax.nn.one_hot(labels,
                                                    logits.shape[-1])
        top5 = jax.lax.top_k(adj, min(5, adj.shape[-1]))[1]
        w = (jnp.ones_like(labels, jnp.float32) if valid is None
             else valid.astype(jnp.float32))
        denom = jnp.maximum(jnp.sum(w), 1.0)
        correct1 = jnp.sum(
            (top5[:, 0] == labels).astype(jnp.float32) * w) / denom
        correct5 = jnp.sum(jnp.any(top5 == labels[:, None],
                                   axis=1).astype(jnp.float32) * w) / denom
        metrics = {"loss": loss, "top1": correct1 * 100,
                   "top5": correct5 * 100}
        return EngineState(params=params, batch_stats=batch_stats,
                           opt_state=opt_state,
                           step=state.step + 1), metrics

    @functools.partial(jax.jit, static_argnums=(0, 6, 7))
    def contrast_step(self, state: EngineState, old_params,
                      old_batch_stats, batch,
                      globals_: Dict[str, jnp.ndarray],
                      do_inter: bool, do_intra: bool
                      ) -> Tuple[EngineState, jnp.ndarray]:
        """Public-set regularization (reference ClientTrainer.py:369-510).

        globals_: {'same': [N,d] same-modality global features,
                   'other': [N,d] other-modality global features,
                   'index': [B] row indices of this batch in the 50k set}
        """
        d_idx = globals_["index"]
        target = jnp.take(globals_["same"], d_idx, axis=0)

        def loss_fn(params):
            (feats, mut) = self._apply(params, state.batch_stats, batch,
                                       train=True, phase="features",
                                       mutable=True)
            loss_inter = loss_intra = jnp.float32(0.0)
            if do_inter:
                loss_inter = inter_modal_loss(feats, globals_["other"],
                                              d_idx, self.tau)
            if do_intra:
                old_feats = self._apply(old_params, old_batch_stats, batch,
                                        train=False, phase="features")
                loss_intra = intra_modal_moon_loss(feats, target,
                                                   old_feats, self.tau)
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
        # The classifier heads are unused by the features phase: torch
        # sees grad=None and skips them (no decay/momentum), so freeze
        # them here too (ClientTrainer.py:369-510 contrast epochs leave
        # the heads exactly as the task epochs left them).
        params, opt_state = restore_frozen(
            ("class_fc", "class_fc_2"), params, opt_state,
            state.params, state.opt_state)
        return EngineState(params=params, batch_stats=batch_stats,
                           opt_state=opt_state,
                           step=state.step + 1), loss

    @functools.partial(jax.jit, static_argnums=(0,))
    def features_step(self, state: EngineState, batch):
        """Representation upload pass -> (features, new_batch_stats).

        Reference runs this with the model left in train() mode
        (test() flips back to train at ClientTrainer.py:552 and
        extract_conv_feature never calls .eval()), so BN uses batch
        statistics AND the running stats update persists — callers must
        thread the returned batch_stats into the client state to track
        the reference trajectory."""
        feats, mut = self._apply(state.params, state.batch_stats, batch,
                                 train=True, phase="features",
                                 mutable=True)
        return feats, mut.get("batch_stats", {})

    @functools.partial(jax.jit, static_argnums=(0,))
    def test_step(self, state: EngineState, batch):
        """Eval-mode top-1/top-k on the local test set
        (ClientTrainer.py:512-552). The reference's custom ``is_train``
        flag is still True during test, so its forward ReLU-clamps the
        head weights before computing logits (resnet_client.py:192-199)
        — clamp here too. (Its ``.data`` persistence is a no-op for the
        trajectory: task_step re-clamps before every forward.)"""
        out = self._apply(clamp_head_weights(dict(state.params)),
                          state.batch_stats, batch,
                          train=False, phase="train")
        x1 = out[0]
        labels = batch["labels"]
        k = min(5, x1.shape[-1])
        topk = jax.lax.top_k(x1, k)[1]
        correct1 = (topk[:, 0] == labels).astype(jnp.float32)
        correctk = jnp.any(topk == labels[:, None], axis=1).astype(
            jnp.float32)
        valid = batch.get("valid",
                          jnp.ones_like(labels, jnp.bool_)).astype(
            jnp.float32)
        return (jnp.sum(correct1 * valid), jnp.sum(correctk * valid),
                jnp.sum(valid))
