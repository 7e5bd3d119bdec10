"""ResNet backbones in Flax, NHWC layout (TPU-native).

Covers the reference's torchvision server/client backbones
(`src/networks/models/image_encoder.py:24-32` uses resnet50/101 with
fc+avgpool stripped; `src/networks/resnet_client.py` defines
resnet10/18/50 client trunks). We expose only the convolutional trunk —
the framework always consumes the final feature *grid* and pools/heads
are owned by the calling encoder.

TPU notes: NHWC + channels-last keeps XLA's conv layout passes trivial;
all convs are bias-free + BatchNorm like torchvision; compute dtype is
configurable (bf16 policy casts activations, keeps params/BN stats fp32).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

ModuleDef = Any


class BasicBlock(nn.Module):
    filters: int
    stride: int = 1
    dtype: Any = jnp.float32
    expansion: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = lambda name: nn.BatchNorm(  # noqa: E731
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name=name)
        residual = x
        y = nn.Conv(self.filters, (3, 3), strides=(self.stride,) * 2,
                    padding=1, use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        y = nn.relu(norm("bn1")(y))
        y = nn.Conv(self.filters, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="conv2")(y)
        y = norm("bn2")(y)
        if residual.shape != y.shape:
            residual = nn.Conv(self.filters, (1, 1),
                               strides=(self.stride,) * 2, use_bias=False,
                               dtype=self.dtype, name="downsample_conv")(x)
            residual = norm("downsample_bn")(residual)
        return nn.relu(y + residual)


class Bottleneck(nn.Module):
    filters: int
    stride: int = 1
    dtype: Any = jnp.float32
    expansion: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = lambda name: nn.BatchNorm(  # noqa: E731
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name=name)
        residual = x
        y = nn.Conv(self.filters, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        y = nn.relu(norm("bn1")(y))
        # torchvision v1: stride on the 3x3 conv.
        y = nn.Conv(self.filters, (3, 3), strides=(self.stride,) * 2,
                    padding=1, use_bias=False, dtype=self.dtype,
                    name="conv2")(y)
        y = nn.relu(norm("bn2")(y))
        y = nn.Conv(self.filters * 4, (1, 1), use_bias=False,
                    dtype=self.dtype, name="conv3")(y)
        y = norm("bn3")(y)
        if residual.shape != y.shape:
            residual = nn.Conv(self.filters * 4, (1, 1),
                               strides=(self.stride,) * 2, use_bias=False,
                               dtype=self.dtype, name="downsample_conv")(x)
            residual = norm("downsample_bn")(residual)
        return nn.relu(y + residual)


# name -> (block class, stage sizes, feature dim of final grid)
RESNET_CONFIGS = {
    "resnet10": (BasicBlock, (1, 1, 1, 1), 512),
    "resnet18": (BasicBlock, (2, 2, 2, 2), 512),
    "resnet34": (BasicBlock, (3, 4, 6, 3), 512),
    "resnet50": (Bottleneck, (3, 4, 6, 3), 2048),
    "resnet101": (Bottleneck, (3, 4, 23, 3), 2048),
    "resnet152": (Bottleneck, (3, 8, 36, 3), 2048),
}


def resnet_feature_dim(cnn_type: str) -> int:
    return RESNET_CONFIGS[cnn_type][2]


class ResNetBackbone(nn.Module):
    """Stride-32 conv trunk: [B, H, W, 3] -> [B, H/32, W/32, C]."""

    cnn_type: str = "resnet18"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        block_cls, stage_sizes, _ = RESNET_CONFIGS[self.cnn_type]
        x = x.astype(self.dtype)
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=3, use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for stage, n_blocks in enumerate(stage_sizes):
            for block in range(n_blocks):
                stride = 2 if stage > 0 and block == 0 else 1
                x = block_cls(filters=64 * (2 ** stage), stride=stride,
                              dtype=self.dtype,
                              name=f"layer{stage + 1}_{block}")(x, train)
        return x


def global_avg_pool(grid: jnp.ndarray) -> jnp.ndarray:
    """[B, H, W, C] -> [B, C] (AdaptiveAvgPool2d((1,1)) equivalent)."""
    return jnp.mean(grid, axis=(1, 2))
