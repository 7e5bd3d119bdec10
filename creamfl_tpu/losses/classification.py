"""Unimodal client classification losses.

Reference semantics (``ClientTrainer.py:344-351``):
  * margin-adjusted CE: logits ``fvec`` minus ``inter_distance * onehot``
    (margin 4 by default) before standard cross-entropy.
  * "center" weight-orthogonality loss: CE of the Gram matrix
    ``W @ W.T`` ([C, C]) against labels ``arange(C)`` — pushes class
    weights towards mutual orthogonality; weighted 0.5 in the total.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray,
                  valid: jnp.ndarray = None) -> jnp.ndarray:
    """Mean softmax cross-entropy with integer labels (torch CE parity).

    ``valid`` ([N] bool/float) restricts the mean to real rows, so a
    repeat-padded final batch computes the same loss the reference gets
    from its bare partial batch (torch DataLoader drop_last=False)."""
    logits = logits.astype(jnp.float32)
    lse = jax.scipy.special.logsumexp(logits, axis=-1)
    label_logit = jnp.take_along_axis(
        logits, labels[:, None].astype(jnp.int32), axis=-1)[:, 0]
    per_row = lse - label_logit
    if valid is None:
        return jnp.mean(per_row)
    w = valid.astype(jnp.float32)
    return jnp.sum(per_row * w) / jnp.maximum(jnp.sum(w), 1.0)


def margin_softmax_loss(logits: jnp.ndarray, labels: jnp.ndarray,
                        margin: float = 4.0,
                        valid: jnp.ndarray = None) -> jnp.ndarray:
    """CE over ``logits - margin * onehot(labels)``."""
    onehot = jax.nn.one_hot(labels, logits.shape[-1], dtype=logits.dtype)
    return cross_entropy(logits - margin * onehot, labels, valid=valid)


def weight_orthogonality_loss(class_weight: jnp.ndarray) -> jnp.ndarray:
    """CE(W @ W.T, arange(C)) on the (already ReLU-clamped) class weights."""
    c = class_weight.shape[0]
    gram = jnp.dot(class_weight.astype(jnp.float32), class_weight.T,
                   preferred_element_type=jnp.float32)
    return cross_entropy(gram, jnp.arange(c))
