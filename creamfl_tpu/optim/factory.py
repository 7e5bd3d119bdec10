"""Optimizer / LR-schedule factories.

Parity targets:
  * server: AdamP + CosineAnnealingLR(T_max=30) stepped once per round +
    grad-clip by global norm 2 (`src/algorithms/optimizers.py`,
    `retrieval_trainer.py:205-214`, coco.yaml).
  * unimodal clients: SGD(lr=1e-4, momentum=0.9, wd=5e-5) with x0.1 decay
    at 50% / 80% of total rounds (`ClientTrainer.py:287-302`).
"""

from __future__ import annotations

from typing import Optional

import jax
import optax

from creamfl_tpu.optim.adamp import adamp


def cosine_annealing_schedule(base_lr: float, t_max: int,
                              eta_min: float = 0.0):
    """torch CosineAnnealingLR: lr(t) = eta_min + (base-eta_min)
    * (1 + cos(pi * t / T_max)) / 2, stepped per round."""
    import jax.numpy as jnp

    def schedule(count):
        frac = jnp.asarray(count, jnp.float32) / t_max
        return eta_min + (base_lr - eta_min) * 0.5 * (
            1.0 + jnp.cos(jnp.pi * frac))

    return schedule


def two_step_decay_schedule(init_lr: float, total_rounds: int,
                            decay: float = 0.1):
    """lr*decay at >=50% rounds, lr*decay^2 at >=80%
    (`ClientTrainer.py:291-302`; keyed on the *round*, not the step)."""

    def schedule(round_n):
        import jax.numpy as jnp

        r = jnp.asarray(round_n, jnp.float32)
        lr = jnp.where(r >= 0.8 * total_rounds, init_lr * decay * decay,
                       jnp.where(r >= 0.5 * total_rounds, init_lr * decay,
                                 init_lr))
        return lr

    return schedule


def get_optimizer(name: str, learning_rate, config: Optional[dict] = None,
                  grad_clip: float = 0.0) -> optax.GradientTransformation:
    """Reference factory surface (`optimizers.py:7-32`): adam | adamp."""
    config = config or {}
    betas = tuple(config.get("betas", (0.9, 0.999)))
    eps = float(config.get("eps", 1e-8))
    wd = float(config.get("weight_decay", 0.0))
    if name == "adam":
        # torch optim.Adam couples weight_decay as L2 into the gradient
        # BEFORE the moments (not adamw's decoupled decay), so parity is
        # add_decayed_weights -> adam (optimizers.py:14-19).
        tx = optax.adam(learning_rate, b1=betas[0], b2=betas[1], eps=eps)
        if wd:
            tx = optax.chain(optax.add_decayed_weights(wd), tx)
    elif name in ("adamp", "adamn"):
        tx = adamp(learning_rate, b1=betas[0], b2=betas[1], eps=eps,
                   weight_decay=wd)
    elif name == "sgd":
        tx = optax.sgd(learning_rate,
                       momentum=config.get("momentum", 0.0) or None)
        if wd:
            tx = optax.chain(optax.add_decayed_weights(wd), tx)
    else:
        raise ValueError(f"invalid optimizer name: {name}")
    if grad_clip and grad_clip > 0:
        tx = optax.chain(optax.clip_by_global_norm(grad_clip), tx)
    return tx


def make_server_optimizer(learning_rate: float, t_max: int = 30,
                          grad_clip: float = 2.0,
                          weight_decay: float = 0.0):
    """AdamP + cosine(T_max) + clip-2 (server engine).

    The reference steps CosineAnnealingLR once per *round*
    (MMFL.py:286), not per optimizer step, so the LR is injected as a
    hyperparameter the round loop sets from the returned schedule.
    """
    schedule = cosine_annealing_schedule(learning_rate, t_max)

    # Parity: the reference clips model.parameters() only — the
    # criterion's learnable shift/negative_scale are NOT part of the
    # clip norm (retrieval_trainer.py:212-214, MMClientTrainer.py:137).
    def _model_only(params):
        return {k: jax.tree.map(lambda _: k == "model", v)
                for k, v in params.items()}

    @optax.inject_hyperparams
    def _make(learning_rate):
        return optax.chain(
            optax.masked(optax.clip_by_global_norm(grad_clip),
                         _model_only),
            adamp(learning_rate, weight_decay=weight_decay),
        )

    return _make(learning_rate), schedule


def restore_frozen(keys, new_params, new_opt_state, old_params,
                   old_opt_state):
    """torch optimizers SKIP params whose ``.grad`` is None (an unused
    branch of the forward), so neither weight decay, momentum, nor the
    moment buffers advance for them. A jitted jax step sees zero grads
    for unused params instead — decay/momentum would still move them.
    Restoring the frozen top-level subtrees (params AND every optimizer
    slot that mirrors them) post-update reproduces the torch semantics
    exactly (reference: per-phase forwards touch disjoint heads,
    ClientTrainer.py:369-510 / resnet_client.py:184-189)."""
    import jax.tree_util as jtu

    keys = set(keys)
    params = {k: (old_params[k] if k in keys else v)
              for k, v in new_params.items()}

    def pick(path, new, old):
        for entry in path:
            name = getattr(entry, "key", None)
            if name is None:
                name = getattr(entry, "name", None)
            if name in keys:
                return old
        return new

    opt_state = jtu.tree_map_with_path(pick, new_opt_state,
                                       old_opt_state)
    return params, opt_state


def set_learning_rate(opt_state, lr):
    """Set the injected learning_rate hyperparameter in-place-ish."""
    opt_state.hyperparams["learning_rate"] = lr
    return opt_state


def make_client_sgd(init_lr: float = 1e-4, total_rounds: int = 30,
                    momentum: float = 0.9, weight_decay: float = 5e-5,
                    decay: float = 0.1):
    """Client SGD whose lr is driven by the federated round index.

    The round index is injected via ``optax.inject_hyperparams`` so one
    compiled step covers every round (no recompilation on decay).
    """
    schedule = two_step_decay_schedule(init_lr, total_rounds, decay)

    @optax.inject_hyperparams
    def _make(learning_rate):
        return optax.chain(
            optax.add_decayed_weights(weight_decay),
            optax.sgd(learning_rate, momentum=momentum),
        )

    return _make(init_lr), schedule
