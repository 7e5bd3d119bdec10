"""PCME joint-embedding model (server + multimodal-client flagship).

Reference architecture (`src/networks/models/pcme.py`):
  * image branch: ResNet trunk -> 7x7 grid; global-avg-pool -> fc ->
    PIENet attention over grid tokens -> L2 norm
    (`image_encoder.py:54-67`).
  * text branch: either GloVe-embed + bi-GRU + PIENet over word
    embeddings (`caption_encoder.py:87-116`), or BERT CLS -> linear ->
    L2 norm (`pcme.py:40-44`).

TPU redesign decisions:
  * NHWC convs, fused under one jit with the loss;
  * BERT tokenization precomputed in the data pipeline (static shapes);
  * ``n_embeddings`` is 1 — the reference broadcasts a single embedding
    7x at eval and sum-pools it back, which is score-neutral
    (eval_coco.py:42-48); we keep a single vector.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax.numpy as jnp

from creamfl_tpu.models.bert import BertConfig, BertEncoder
from creamfl_tpu.models.gru import BiGRU
from creamfl_tpu.models.pie import PIENet
from creamfl_tpu.models.resnet import (ResNetBackbone, global_avg_pool,
                                       resnet_feature_dim)
from creamfl_tpu.ops.l2norm import l2_normalize


class MLPHead(nn.Module):
    """Optional 512->512 projection head (--mlp_local)."""

    width: int = 512

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Dense(self.width, name="fc1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         name="bn")(x)
        x = nn.relu(x)
        return nn.Dense(self.width, name="fc2")(x)


class ImageEncoder(nn.Module):
    """ResNet grid -> pooled fc embedding fused with PIE attention."""

    cnn_type: str = "resnet18"
    embed_dim: int = 256
    mlp_local: bool = False
    dtype: Any = jnp.float32
    remat: str = "none"
    fused_bn: bool = False  # Pallas fused conv+BN bottlenecks (TPU)

    @nn.compact
    def __call__(self, images: jnp.ndarray, train: bool = False
                 ) -> Dict[str, jnp.ndarray]:
        cnn_dim = resnet_feature_dim(self.cnn_type)
        grid = ResNetBackbone(self.cnn_type, dtype=self.dtype,
                              remat=self.remat, fused_bn=self.fused_bn,
                              name="cnn")(images, train)
        b, h, w, c = grid.shape
        grid = grid.astype(jnp.float32)
        pooled = global_avg_pool(grid)
        out = nn.Dense(self.embed_dim,
                       kernel_init=nn.initializers.xavier_uniform(),
                       name="fc")(pooled)
        tokens = grid.reshape(b, h * w, c)
        out, attn, residual = PIENet(n_embeds=1, d_out=self.embed_dim,
                                     d_hidden=cnn_dim // 2,
                                     name="pie_net")(out, tokens)
        if self.mlp_local:
            out = MLPHead(name="head_proj")(out, train)
        out = l2_normalize(out)
        return {"embedding": out, "attention": attn, "residual": residual}


class TextEncoderGRU(nn.Module):
    """GloVe-style embedding + masked bi-GRU + PIE over word embeddings."""

    vocab_size: int
    embed_dim: int = 256
    word_dim: int = 300
    mlp_local: bool = False

    @nn.compact
    def __call__(self, captions: jnp.ndarray, lengths: jnp.ndarray,
                 train: bool = False) -> Dict[str, jnp.ndarray]:
        wemb = nn.Embed(self.vocab_size, self.word_dim,
                        embedding_init=nn.initializers.xavier_uniform(),
                        name="embed")(captions)  # [B, L, word_dim]
        _, final = BiGRU(hidden_size=self.embed_dim // 2,
                         name="rnn")(wemb, lengths)
        pad_mask = (jnp.arange(captions.shape[1])[None, :]
                    >= lengths[:, None])  # True at pads
        out, attn, residual = PIENet(n_embeds=1, d_out=self.embed_dim,
                                     d_hidden=self.word_dim // 2,
                                     name="pie_net")(final, wemb, pad_mask)
        out = l2_normalize(out)
        # Reference caption encoder applies mlp_local AFTER the norm
        # (caption_encoder.py:109-113) — kept for parity.
        if self.mlp_local:
            out = MLPHead(name="head_proj")(out, train)
        return {"embedding": out, "attention": attn, "residual": residual}


class TextEncoderBert(nn.Module):
    """BERT CLS -> linear -> L2 norm (server text branch)."""

    embed_dim: int = 256
    bert_config: BertConfig = BertConfig()
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray, attention_mask: jnp.ndarray,
                 train: bool = False) -> Dict[str, jnp.ndarray]:
        hidden = BertEncoder(self.bert_config, dtype=self.dtype,
                             name="bert")(input_ids, attention_mask,
                                          deterministic=not train)
        cls = hidden[:, 0, :].astype(jnp.float32)
        out = l2_normalize(nn.Dense(self.embed_dim, name="linear")(cls))
        return {"embedding": out}


class PCME(nn.Module):
    """Joint embedding model; forward returns the reference's output dict."""

    embed_dim: int = 256
    cnn_type: str = "resnet18"
    vocab_size: int = 11755
    word_dim: int = 300
    not_bert: bool = True  # True -> GRU text branch (mm clients)
    mlp_local: bool = False
    bert_config: BertConfig = BertConfig()
    dtype: Any = jnp.float32
    fused_bn: bool = False  # opt-in Pallas fused bottlenecks (BENCH.md)

    def setup(self):
        self.img_enc = ImageEncoder(self.cnn_type, self.embed_dim,
                                    self.mlp_local, dtype=self.dtype,
                                    fused_bn=self.fused_bn)
        if self.not_bert:
            self.txt_enc = TextEncoderGRU(self.vocab_size, self.embed_dim,
                                          self.word_dim, self.mlp_local)
        else:
            self.txt_enc = TextEncoderBert(self.embed_dim, self.bert_config,
                                           dtype=self.dtype)

    def __call__(self, images: jnp.ndarray, captions: jnp.ndarray,
                 lengths: jnp.ndarray,
                 bert_mask: Optional[jnp.ndarray] = None,
                 train: bool = False) -> Dict[str, jnp.ndarray]:
        image_output = self.img_enc(images, train)
        if self.not_bert:
            caption_output = self.txt_enc(captions, lengths, train)
        else:
            if bert_mask is None:
                bert_mask = (jnp.arange(captions.shape[1])[None, :]
                             < lengths[:, None]).astype(jnp.int32)
            caption_output = self.txt_enc(captions, bert_mask, train)
        return {
            "image_features": image_output["embedding"],
            "image_attentions": image_output.get("attention"),
            "image_residuals": image_output.get("residual"),
            "caption_features": caption_output["embedding"],
            "caption_attentions": caption_output.get("attention"),
            "caption_residuals": caption_output.get("residual"),
        }

    def image_forward(self, images: jnp.ndarray, train: bool = False):
        return self.img_enc(images, train)

    def text_forward(self, captions: jnp.ndarray, lengths: jnp.ndarray,
                     train: bool = False):
        if self.not_bert:
            return self.txt_enc(captions, lengths, train)
        mask = (jnp.arange(captions.shape[1])[None, :]
                < lengths[:, None]).astype(jnp.int32)
        return self.txt_enc(captions, mask, train)
