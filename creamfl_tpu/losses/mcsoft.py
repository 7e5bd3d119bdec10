"""MC soft contrastive loss (PCME criterion), fully vectorized.

Reference math (``src/criterions/probemb.py``):

* pairwise L2 distance with eps: ``d_ij = sqrt(||x_i - y_j||^2 + 1e-6)``
  (``batchwise_cdist``, probemb.py:7).
* logits ``s_ij = -a * d_ij + b`` with learnable scalars
  ``a = negative_scale`` and ``b = shift`` (init 15/15, coco.yaml:43-44).
* soft-contrastive NLL per pair (probemb.py:48, K=1 MC samples):
  ``nll_ij = log(exp(s_ij) + exp(-s_ij)) - s_ij * m_ij`` where ``m_ij`` is
  +1 on the diagonal (matched) and -1 off it.
* total = sum over all N^2 pairs, computed for both directions
  (i2t uses d(x_i, y_j); t2i uses its transpose) and added
  (probemb.py:241-243). With symmetric distances the two directions give
  equal values; we keep both terms for exact parity.

The reference builds N^2 index lists in Python (``full_sampling``,
probemb.py:171) — here it is a single broadcasted computation, jit-safe.
The learnable scalars live in a small param dict so optimizers treat them
like model params (the reference registers them as nn.Parameters).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class MCSoftContrastiveConfig:
    init_shift: float = 15.0
    init_negative_scale: float = 15.0
    num_samples: int = 1  # MC samples; deterministic PCME path uses 1
    eps: float = 1e-6
    reduction: str = "sum"  # reference default (probemb.py:119)
    uniform_lambda: float = 0.0  # off in all CreamFL configs
    vib_beta: float = 0.0


def uniformity_loss(x: jnp.ndarray, t: float = 2.0) -> jnp.ndarray:
    """log mean exp(-t * ||x_i - x_j||^2) over pairs (probemb.py:139)."""
    sq = (jnp.sum(x * x, 1)[:, None] - 2 * x @ x.T
          + jnp.sum(x * x, 1)[None, :])
    n = x.shape[0]
    mask = ~jnp.eye(n, dtype=bool)
    vals = jnp.where(mask, jnp.exp(-t * jnp.maximum(sq, 0.0)), 0.0)
    return jnp.log(jnp.sum(vals) / (n * (n - 1)))


def kl_divergence(mu: jnp.ndarray, logsigma: jnp.ndarray) -> jnp.ndarray:
    """-0.5 sum(1 + logsigma - mu^2 - e^logsigma) (probemb.py:146)."""
    return -0.5 * jnp.sum(1 + logsigma - mu * mu - jnp.exp(logsigma))


def init_mcsoft_params(config: MCSoftContrastiveConfig) -> Dict[str, jnp.ndarray]:
    return {
        "shift": jnp.asarray([config.init_shift], jnp.float32),
        "negative_scale": jnp.asarray([config.init_negative_scale],
                                      jnp.float32),
    }


def pairwise_l2(x: jnp.ndarray, y: jnp.ndarray,
                eps: float = 1e-6) -> jnp.ndarray:
    """[N,d] x [M,d] -> [N,M] L2 distances with the reference's eps-in-sqrt."""
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    sq = (jnp.sum(x * x, 1)[:, None] - 2.0 * jnp.dot(
        x, y.T, preferred_element_type=jnp.float32)
        + jnp.sum(y * y, 1)[None, :])
    return jnp.sqrt(jnp.maximum(sq, 0.0) + eps)


def _soft_contrastive_nll(logits: jnp.ndarray,
                          matched: jnp.ndarray) -> jnp.ndarray:
    """Per-pair NLL for K=1: log(exp(s) + exp(-s)) - s*m, stable form."""
    # log(exp(s)+exp(-s)) = |s| + log1p(exp(-2|s|))
    log_denom = jnp.abs(logits) + jnp.log1p(jnp.exp(-2.0 * jnp.abs(logits)))
    return log_denom - logits * matched


def match_prob(params: Dict[str, jnp.ndarray], queries: jnp.ndarray,
               gallery: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """[M,d] x [N,d] -> [M,N] match probabilities (probemb.py:210-219):
    p = e^s / (e^s + e^-s) = sigmoid(2s), s = -a*d(q,g) + b."""
    d = pairwise_l2(queries, gallery, eps)
    s = -params["negative_scale"][0] * d + params["shift"][0]
    return jax.nn.sigmoid(2.0 * s)


def mcsoft_contrastive_loss(
    params: Dict[str, jnp.ndarray],
    image_features: jnp.ndarray,
    caption_features: jnp.ndarray,
    config: MCSoftContrastiveConfig = MCSoftContrastiveConfig(),
    image_logsigma: jnp.ndarray = None,
    caption_logsigma: jnp.ndarray = None,
    valid: jnp.ndarray = None,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Returns (loss, loss_dict) like the reference criterion forward.

    Features may be [N, d] or [N, K, d]; K>1 multi-embeddings reduce over
    the K^2 sample pairs with logsumexp exactly as probemb.py:83-86.
    ``valid`` ([N] bool/float) zeroes every pair touching a padded row,
    so a repeat-padded final batch yields the same sum the reference
    computes over its bare torch partial batch.
    """
    img = image_features
    txt = caption_features
    if img.ndim == 2:
        img = img[:, None, :]
    if txt.ndim == 2:
        txt = txt[:, None, :]
    n, k, d = img.shape
    a = params["negative_scale"][0]
    b = params["shift"][0]

    # [N, N, K, K] distances between every (i, j) pair's sample embeddings.
    diff = img[:, None, :, None, :] - txt[None, :, None, :, :]
    dist = jnp.sqrt(jnp.sum(jnp.square(diff.astype(jnp.float32)), -1)
                    + config.eps)
    logits = -a * dist + b  # [N, N, K, K]

    matched = jnp.where(jnp.eye(n, dtype=bool), 1.0, -1.0)

    if k == 1:
        per_pair = _soft_contrastive_nll(logits[..., 0, 0], matched)
    else:
        # K^2 MC samples: nll = log(K^2) - logsumexp_k(s*m - log(e^s+e^-s))
        s = logits.reshape(n, n, k * k)
        log_denom = jnp.abs(s) + jnp.log1p(jnp.exp(-2.0 * jnp.abs(s)))
        inner = s * matched[..., None] - log_denom
        per_pair = (jnp.log(jnp.float32(k * k))
                    - jax.scipy.special.logsumexp(inner, axis=-1))

    if valid is not None:
        w = valid.astype(per_pair.dtype)
        per_pair = per_pair * (w[:, None] * w[None, :])
    eye = jnp.eye(n, dtype=bool)
    pos_loss = jnp.sum(jnp.where(eye, per_pair, 0.0))
    neg_loss = jnp.sum(jnp.where(eye, 0.0, per_pair))
    one_dir = pos_loss + neg_loss
    # i2t and t2i directions (probemb.py:241-242). d is symmetric, so the
    # transpose direction has identical value; keep 2x for parity.
    loss = 2.0 * one_dir
    if config.reduction == "mean":
        # Mean per direction over the real pairs, then both directions
        # added — the docstring convention (probemb.py:103). The
        # reference declares this mode but never applies it
        # (probemb.py:200 always .sum()s), so 'sum' is the parity path.
        if valid is not None:
            n_real = jnp.maximum(jnp.sum(valid.astype(jnp.float32)), 1.0)
            loss = loss / (n_real * n_real)
        else:
            loss = loss / (n * n)

    # Optional terms (off in every CreamFL config; probemb.py:139-148).
    if config.uniform_lambda:
        feats = jnp.concatenate([img.reshape(-1, d), txt.reshape(-1, d)])
        loss = loss + config.uniform_lambda * uniformity_loss(feats)
    if config.vib_beta:
        vib = (kl_divergence(jnp.mean(img, 1), image_logsigma)
               + kl_divergence(jnp.mean(txt, 1), caption_logsigma))
        loss = loss + config.vib_beta * vib

    loss_dict = {
        "i2t_loss": one_dir,
        "t2i_loss": one_dir,
        "i2t_pos_loss": pos_loss,
        "i2t_neg_loss": neg_loss,
        "t2i_pos_loss": pos_loss,
        "t2i_neg_loss": neg_loss,
        "shift": b,
        "negative_scale": a,
        "loss": loss,
    }
    return loss, loss_dict
