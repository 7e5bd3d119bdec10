"""Polysemous Instance Embedding (PIE) attention head.

Re-derivation of the reference module (`src/networks/models/pie_model.py`):
Lin et al. (ICLR'17) structured self-attention ``softmax(w2 tanh(w1 x))``
pooled over the sequence, followed by a sigmoid-gated residual added to the
backbone embedding and LayerNorm-fused.

TPU notes: everything is a batched matmul / elementwise op; the pad mask
uses a large negative fill instead of -inf to stay bf16-safe.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

_NEG_INF = -1e9


class MultiHeadSelfAttention(nn.Module):
    """attn = softmax_L(w2 tanh(w1 x)); out = attn^T x. [B,L,D] -> [B,H,D]."""

    n_head: int
    d_hidden: int

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 pad_mask: Optional[jnp.ndarray] = None
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        h = jnp.tanh(nn.Dense(self.d_hidden, use_bias=False,
                              kernel_init=nn.initializers.xavier_uniform(),
                              name="w_1")(x))
        attn = nn.Dense(self.n_head, use_bias=False,
                        kernel_init=nn.initializers.xavier_uniform(),
                        name="w_2")(h)  # [B, L, H]
        if pad_mask is not None:
            # pad_mask: [B, L] True at padding positions.
            attn = jnp.where(pad_mask[:, :, None], _NEG_INF, attn)
        attn = nn.softmax(attn, axis=1)
        out = jnp.einsum("blh,bld->bhd", attn, x)
        if self.n_head == 1:
            out = out[:, 0, :]
        return out, attn


class PIENet(nn.Module):
    """LayerNorm(out + sigmoid(fc(attention_pool(x)))) head."""

    n_embeds: int
    d_out: int
    d_hidden: int
    dropout_rate: float = 0.0

    @nn.compact
    def __call__(self, out: jnp.ndarray, x: jnp.ndarray,
                 pad_mask: Optional[jnp.ndarray] = None,
                 deterministic: bool = True):
        residual, attn = MultiHeadSelfAttention(
            self.n_embeds, self.d_hidden, name="attention")(x, pad_mask)
        residual = nn.sigmoid(
            nn.Dense(self.d_out,
                     kernel_init=nn.initializers.xavier_uniform(),
                     bias_init=nn.initializers.zeros,
                     name="fc")(residual))
        residual = nn.Dropout(self.dropout_rate,
                              deterministic=deterministic)(residual)
        if self.n_embeds > 1:
            out = jnp.repeat(out[:, None, :], self.n_embeds, axis=1)
        # epsilon matches torch nn.LayerNorm's default (the reference
        # module, pie_model.py:55) — flax's default is 1e-6.
        out = nn.LayerNorm(epsilon=1e-5, name="layer_norm")(out + residual)
        return out, attn, residual
