"""BERT encoder in Flax (server text branch when ``not_bert`` is False).

The reference wraps HuggingFace ``BertModel`` and tokenizes raw caption
strings *inside the forward pass* (`src/networks/models/pcme.py:31-44`).
TPU-native redesign: tokenization moves into the input pipeline
(`creamfl_tpu.data.tokenize.BertWordPieceTokenizer`) so the compiled
program sees only static-shape int32 ids + attention mask; the encoder
here is a standard 12-layer transformer whose CLS hidden state feeds the
PCME projection head. Weight layout follows HF ``bert-base-uncased`` so
pretrained checkpoints can be ported when present (no egress here, so
random init is the default).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class BertConfig:
    vocab_size: int = 30522
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12
    dropout_rate: float = 0.1

    @classmethod
    def tiny(cls) -> "BertConfig":
        """Small config for tests / CPU smoke runs."""
        return cls(vocab_size=512, hidden_size=64, num_layers=2,
                   num_heads=2, intermediate_size=128, max_position=64)


class BertLayer(nn.Module):
    config: BertConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, h, attn_bias, deterministic=True):
        cfg = self.config
        d = cfg.hidden_size
        nh = cfg.num_heads
        hd = d // nh
        b, l, _ = h.shape

        def dense(features, name):
            return nn.Dense(features, dtype=self.dtype, name=name)

        # Separate Q/K/V projections, HF layout. (A fused [d, 3d]
        # projection was probed on-chip and measured neutral-to-slower —
        # XLA already schedules the three matmuls back-to-back and the
        # fused variant pays an extra split copy; see BENCH.md.)
        q = dense(d, "q")(h).reshape(b, l, nh, hd)
        k = dense(d, "k")(h).reshape(b, l, nh, hd)
        v = dense(d, "v")(h).reshape(b, l, nh, hd)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(
            jnp.asarray(hd, h.dtype))
        scores = scores + attn_bias  # [B, 1, 1, L] additive mask
        probs = nn.softmax(scores.astype(jnp.float32), axis=-1).astype(h.dtype)
        probs = nn.Dropout(cfg.dropout_rate,
                           deterministic=deterministic)(probs)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, l, d)
        attn_out = dense(d, "attn_out")(ctx)
        attn_out = nn.Dropout(cfg.dropout_rate,
                              deterministic=deterministic)(attn_out)
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps,
                         name="attn_ln")(h + attn_out)

        ffn = dense(cfg.intermediate_size, "ffn_in")(h)
        ffn = nn.gelu(ffn, approximate=False)
        ffn = dense(d, "ffn_out")(ffn)
        ffn = nn.Dropout(cfg.dropout_rate, deterministic=deterministic)(ffn)
        return nn.LayerNorm(epsilon=cfg.layer_norm_eps,
                            name="ffn_ln")(h + ffn)


class BertEncoder(nn.Module):
    """input ids + mask -> last hidden states [B, L, H]."""

    config: BertConfig = BertConfig()
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray,
                 attention_mask: jnp.ndarray,
                 token_type_ids: Optional[jnp.ndarray] = None,
                 deterministic: bool = True) -> jnp.ndarray:
        cfg = self.config
        b, l = input_ids.shape
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(input_ids)

        word = nn.Embed(cfg.vocab_size, cfg.hidden_size, dtype=self.dtype,
                        name="word_embeddings")(input_ids)
        pos = nn.Embed(cfg.max_position, cfg.hidden_size, dtype=self.dtype,
                       name="position_embeddings")(
            jnp.arange(l)[None, :].repeat(b, axis=0))
        typ = nn.Embed(cfg.type_vocab_size, cfg.hidden_size,
                       dtype=self.dtype,
                       name="token_type_embeddings")(token_type_ids)
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps,
                         name="embeddings_ln")(word + pos + typ)
        h = nn.Dropout(cfg.dropout_rate, deterministic=deterministic)(h)

        attn_bias = jnp.where(attention_mask[:, None, None, :] > 0, 0.0,
                              -1e9).astype(h.dtype)
        for i in range(cfg.num_layers):
            h = BertLayer(cfg, dtype=self.dtype,
                          name=f"layer_{i}")(h, attn_bias, deterministic)
        return h
