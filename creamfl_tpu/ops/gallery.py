"""Streamed gallery similarity ops — the CreamFL hot loops, TPU-native.

Three computations in the reference hammer a large "gallery" of public-set
features (50 000 x d):

1. Inter-modal contrastive CE: per public batch, ``CE(f @ G.T / tau, idx)``
   (reference ``ClientTrainer.py:388,493``, ``MMClientTrainer.py:194-201,
   301-308``).
2. con_w aggregation: per client representation matrix ``V`` (50k x d),
   ``diag(log_softmax(V @ G.T))`` — the reference materialises 50k x 50k
   logits on GPU and takes the diagonal (``MMFL.py:304-307``).
3. Retrieval ranking (handled in ``creamfl_tpu.engine.evaluator``).

TPU-first design: never materialise an ``N x N`` similarity matrix. The
diagonal of ``V @ G.T`` is just ``sum(V * G, -1)``; the row log-sum-exp is
streamed over gallery blocks with an online (flash-style) max/sum carry, so
peak memory is ``rows_block x cols_block`` regardless of gallery size. The
batch CE keeps its logits (bs x N is small) but exposes a rematerialised
blockwise variant for galleries that would not fit.

All reductions accumulate in float32 regardless of input dtype (bf16-safe).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax


def _as_f32(x):
    return x.astype(jnp.float32)


# ---------------------------------------------------------------------------
# Streaming log-sum-exp over gallery columns
# ---------------------------------------------------------------------------

def streaming_logsumexp(v: jnp.ndarray, gallery: jnp.ndarray,
                        tau: float = 1.0,
                        col_block: int = 8192) -> jnp.ndarray:
    """Row-wise ``logsumexp(v @ gallery.T / tau)`` without the full matrix.

    Args:
      v: [m, d] query features.
      gallery: [n, d] gallery features.
      tau: softmax temperature (logits are divided by tau).
      col_block: gallery block width per scan step.

    Returns:
      [m] float32 log-sum-exp of each row of the (m x n) logits.
    """
    m, d = v.shape
    n = gallery.shape[0]
    inv_tau = jnp.float32(1.0 / tau)

    n_blocks = -(-n // col_block)
    n_pad = n_blocks * col_block
    # Pad gallery rows with zeros and mask them out of the reduction.
    g_pad = jnp.pad(gallery, ((0, n_pad - n), (0, 0)))
    g_blocks = g_pad.reshape(n_blocks, col_block, d)
    valid = (jnp.arange(n_pad) < n).reshape(n_blocks, col_block)

    v32 = _as_f32(v)

    def body(carry, xs):
        run_max, run_sum = carry
        g_blk, valid_blk = xs
        logits = jnp.dot(v32, _as_f32(g_blk).T,
                         preferred_element_type=jnp.float32) * inv_tau
        logits = jnp.where(valid_blk[None, :], logits, -jnp.inf)
        blk_max = jnp.max(logits, axis=1)
        new_max = jnp.maximum(run_max, blk_max)
        # Rescale previous sum to the new max; guard -inf - -inf.
        scale = jnp.exp(jnp.where(jnp.isneginf(run_max), -jnp.inf,
                                  run_max - new_max))
        blk_sum = jnp.sum(jnp.exp(logits - new_max[:, None]), axis=1)
        return (new_max, run_sum * scale + blk_sum), None

    init = (jnp.full((m,), -jnp.inf, jnp.float32),
            jnp.zeros((m,), jnp.float32))
    (final_max, final_sum), _ = lax.scan(body, init, (g_blocks, valid))
    return final_max + jnp.log(final_sum)


# ---------------------------------------------------------------------------
# con_w diagonal log-softmax
# ---------------------------------------------------------------------------

def gallery_log_softmax_diag(v: jnp.ndarray, gallery: jnp.ndarray,
                             row_block: int = 1024,
                             col_block: int = 8192) -> jnp.ndarray:
    """``diag(log_softmax(v @ gallery.T, axis=1))`` streamed blockwise.

    Reference semantics (``MMFL.py:303-307``): per-row
    ``logit_ii - logsumexp_j(logit_ij)`` where ``logit = v @ gallery.T``
    (no temperature). The diagonal requires ``v.shape[0] == gallery.shape[0]``.

    Peak live memory is O(row_block * col_block) instead of O(n^2).
    """
    n, d = v.shape
    assert gallery.shape[0] == n, "con_w requires square similarity"
    diag = jnp.sum(_as_f32(v) * _as_f32(gallery), axis=1)

    n_row_blocks = -(-n // row_block)
    n_row_pad = n_row_blocks * row_block
    v_pad = jnp.pad(v, ((0, n_row_pad - n), (0, 0)))
    v_blocks = v_pad.reshape(n_row_blocks, row_block, d)

    def row_body(_, v_blk):
        return None, streaming_logsumexp(v_blk, gallery, tau=1.0,
                                         col_block=col_block)

    _, lse_blocks = lax.scan(row_body, None, v_blocks)
    lse = lse_blocks.reshape(n_row_pad)[:n]
    return diag - lse


# ---------------------------------------------------------------------------
# Inter-modal contrastive cross-entropy against the gallery
# ---------------------------------------------------------------------------

def gallery_cross_entropy(feats: jnp.ndarray, gallery: jnp.ndarray,
                          labels: jnp.ndarray, tau: float = 0.5,
                          blockwise: bool = False,
                          col_block: int = 8192) -> jnp.ndarray:
    """Mean CE of ``feats @ gallery.T / tau`` against integer ``labels``.

    The gallery is a constant (frozen global features) — gradients flow
    only into ``feats`` (the reference holds global features with no grad,
    ``ClientTrainer.py:370,388``).

    ``blockwise=True`` switches to a rematerialised scan over gallery
    blocks (memory O(bs x col_block)); the default materialises the
    (bs x n) logits, which XLA handles well for n <= ~100k.
    """
    gallery = lax.stop_gradient(gallery)
    if not blockwise:
        logits = jnp.dot(_as_f32(feats), _as_f32(gallery).T,
                         preferred_element_type=jnp.float32) / tau
        lse = jax.scipy.special.logsumexp(logits, axis=1)
        label_logit = jnp.take_along_axis(
            logits, labels[:, None].astype(jnp.int32), axis=1)[:, 0]
        return jnp.mean(lse - label_logit)

    # Blockwise: label logit is a direct gather; lse is streamed. The scan
    # body is rematerialised so the backward pass recomputes block logits
    # instead of saving them (flash-attention-style).
    label_vecs = jnp.take(gallery, labels.astype(jnp.int32), axis=0)
    label_logit = jnp.sum(_as_f32(feats) * _as_f32(label_vecs), axis=1) / tau
    lse_fn = jax.checkpoint(
        functools.partial(streaming_logsumexp, tau=tau, col_block=col_block))
    lse = lse_fn(feats, gallery)
    return jnp.mean(lse - label_logit)
