"""Unimodal client networks (CIFAR image clients, AG_NEWS text clients).

Reference (`src/networks/resnet_client.py:104-208`,
`src/networks/language_model.py:28-130`): client nets share a trunk with a
``scale`` (=128) feature multiplier, an optional 512->embed_dim linear, and
two classifier heads whose weights are ReLU-clamped *inside the training
forward* (a parameter mutation). Feature-extraction mode
(``phase='extract_conv_feature'``) bypasses the heads and L2-normalizes.

TPU redesign: the forward is pure; the weight clamp is an explicit param
transform (`clamp_head_weights`) the train step applies before the
forward — numerically identical to the reference's in-forward
``weight.data = relu(weight)`` since the clamped value both produces the
logits and persists into the next step.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from creamfl_tpu.models.gru import BiGRU
from creamfl_tpu.models.pcme import MLPHead
from creamfl_tpu.models.pie import PIENet
from creamfl_tpu.models.resnet import ResNetBackbone, global_avg_pool
from creamfl_tpu.ops.l2norm import l2_normalize

# Head module names whose kernels get ReLU-clamped each train step.
_CLAMPED_HEADS = ("class_fc", "class_fc_2")


def clamp_head_weights(params: Dict[str, Any]) -> Dict[str, Any]:
    """ReLU-clamp classifier head kernels (reference
    `resnet_client.py:192-197`, `language_model.py:115-121`)."""
    params = dict(params)
    for head in _CLAMPED_HEADS:
        if head in params:
            head_params = dict(params[head])
            head_params["kernel"] = jax.nn.relu(head_params["kernel"])
            params[head] = head_params
    return params


class ImageClientNet(nn.Module):
    """ResNet client: trunk -> avgpool -> *scale -> [linear] -> heads/feature.

    ``phase='features'`` returns the L2-normalized public-set
    representation; ``phase='train'`` returns
    (logits_task, logits_aux80, class_weight, aux_weight).
    """

    cnn_type: str = "resnet18"
    num_class: int = 100
    embed_dim: int = 256
    scale: float = 128.0
    mlp_local: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images: jnp.ndarray, train: bool = False,
                 phase: str = "train"):
        grid = ResNetBackbone(self.cnn_type, dtype=self.dtype,
                              name="backbone")(images, train)
        x = global_avg_pool(grid.astype(jnp.float32))
        x = x * self.scale
        if self.embed_dim != 512:
            x = nn.Dense(self.embed_dim, name="linear")(x)

        if phase == "features":
            if self.mlp_local:
                x = MLPHead(name="head_proj")(x, train)
                x = l2_normalize(x)
            return l2_normalize(x)

        class_fc = nn.Dense(self.num_class, name="class_fc")
        class_fc_2 = nn.Dense(80, name="class_fc_2")
        x1 = class_fc(x)
        x2 = class_fc_2(x)
        # Weight matrices (out, in) for the orthogonality loss.
        w1 = class_fc.variables["params"]["kernel"].T
        w2 = class_fc_2.variables["params"]["kernel"].T
        return x1, x2, w1, w2


class TextClientNet(nn.Module):
    """GRU text client (reference `language_model.py:28-130`)."""

    vocab_size: int
    num_class: int = 4
    embed_dim: int = 256
    word_dim: int = 300
    scale: float = 128.0
    mlp_local: bool = False

    @nn.compact
    def __call__(self, captions: jnp.ndarray, lengths: jnp.ndarray,
                 train: bool = False, phase: str = "train"):
        wemb = nn.Embed(self.vocab_size, self.word_dim,
                        embedding_init=nn.initializers.xavier_uniform(),
                        name="embed")(captions)
        _, final = BiGRU(hidden_size=self.embed_dim // 2,
                         name="rnn")(wemb, lengths)
        pad_mask = (jnp.arange(captions.shape[1])[None, :]
                    >= lengths[:, None])
        out, _, _ = PIENet(n_embeds=1, d_out=self.embed_dim,
                           d_hidden=self.word_dim // 2,
                           name="pie_net")(final, wemb, pad_mask)
        out = out * self.scale
        out = nn.relu(out)

        if phase == "features":
            if self.mlp_local:
                out = MLPHead(name="head_proj")(out, train)
            return l2_normalize(out)

        class_fc = nn.Dense(self.num_class, name="class_fc")
        class_fc_2 = nn.Dense(80, name="class_fc_2")
        x1 = class_fc(out)
        x2 = class_fc_2(out)
        w1 = class_fc.variables["params"]["kernel"].T
        w2 = class_fc_2.variables["params"]["kernel"].T
        return x1, x2, w1, w2
