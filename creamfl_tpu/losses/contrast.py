"""Public-set contrastive regularizers (the CreamFL client losses).

* ``inter_modal_loss`` — CE of ``f @ G_other.T / tau`` against the row
  index of each public sample (reference ``ClientTrainer.py:480-504``;
  both directions for multimodal clients, ``MMClientTrainer.py:294-308``).
* ``intra_modal_moon_loss`` — MOON-style: positive = <f_new, g_same[idx]>,
  negative = <f_new, f_old> (features from the frozen pre-round model),
  2-way CE at temperature tau with label 0
  (``ClientTrainer.py:404-414``, ``MMClientTrainer.py:172-191``).

Both operate on *unnormalized-by-tau* dot products of L2-normalized
features, temperature 0.5 throughout the reference.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from creamfl_tpu.losses.classification import cross_entropy
from creamfl_tpu.ops import dispatch
from creamfl_tpu.ops.gallery import gallery_cross_entropy


def inter_modal_loss(feats: jnp.ndarray, global_other: jnp.ndarray,
                     batch_index: jnp.ndarray, tau: float = 0.5,
                     blockwise: bool = False) -> jnp.ndarray:
    """CE(f @ G_other.T / tau, batch_index); gallery is constant.

    Dispatches to the fused Pallas kernel on TPU; ``blockwise`` selects
    the rematerialised XLA scan on other backends."""
    if blockwise:
        return gallery_cross_entropy(feats, global_other, batch_index,
                                     tau=tau, blockwise=True)
    return dispatch.gallery_ce(feats, global_other, batch_index, tau)


def intra_modal_moon_loss(feats: jnp.ndarray, target_feats: jnp.ndarray,
                          old_feats: jnp.ndarray,
                          tau: float = 0.5) -> jnp.ndarray:
    """2-way CE([pos, neg] / tau, 0) with pos/neg as row-wise dots.

    ``target_feats`` = global same-modality features for the batch rows
    (positive pair), ``old_feats`` = this client's frozen pre-round model
    features (negative pair); both are constants wrt the step.
    """
    target_feats = lax.stop_gradient(target_feats)
    old_feats = lax.stop_gradient(old_feats)
    pos = jnp.sum(feats * target_feats, axis=-1, dtype=jnp.float32)
    neg = jnp.sum(feats * old_feats, axis=-1, dtype=jnp.float32)
    logits = jnp.stack([pos, neg], axis=1) / tau
    labels = jnp.zeros((feats.shape[0],), jnp.int32)
    return cross_entropy(logits, labels)


def combine_inter_intra(loss_intra: jnp.ndarray, loss_inter: jnp.ndarray,
                        interintra_weight: float = 0.5,
                        loss_scale: bool = False) -> jnp.ndarray:
    """Reference combination (``ClientTrainer.py:416-419``):
    plain sum, or ratio-normalized when --loss_scale."""
    if loss_scale:
        ratio = lax.stop_gradient(loss_inter / loss_intra)
        return (loss_intra + loss_inter / ratio) * interintra_weight
    return (loss_intra + loss_inter) * interintra_weight
