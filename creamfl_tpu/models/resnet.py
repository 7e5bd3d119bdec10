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
import jax
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
# "resnet6" is a dryrun/test-scale trunk (stem + 2 basic blocks) with no
# reference counterpart: sharding/compile checks on a 1-core CPU host
# are compile-time-bound, and trunk depth is irrelevant to the sharding
# semantics being checked. The reference zoo starts at resnet10.
RESNET_CONFIGS = {
    "resnet6": (BasicBlock, (1, 1), 128),
    "resnet10": (BasicBlock, (1, 1, 1, 1), 512),
    "resnet18": (BasicBlock, (2, 2, 2, 2), 512),
    "resnet34": (BasicBlock, (3, 4, 6, 3), 512),
    "resnet50": (Bottleneck, (3, 4, 6, 3), 2048),
    "resnet101": (Bottleneck, (3, 4, 23, 3), 2048),
    "resnet152": (Bottleneck, (3, 8, 36, 3), 2048),
}


def resnet_feature_dim(cnn_type: str) -> int:
    return RESNET_CONFIGS[cnn_type][2]


#: jax.checkpoint policies selectable via ``ResNetBackbone.remat``.
#: "block" reruns each residual block's forward during backward (stores
#: only block inputs — minimum activation HBM traffic); "dots" keeps
#: MXU results and recomputes the cheap elementwise/BN tail.
REMAT_POLICIES = {
    "block": None,
    "dots": "checkpoint_dots_with_no_batch_dims",
}


class _StemKernel(nn.Module):
    """Holds the canonical [7,7,3,64] stem kernel at param path
    ``conv1/kernel`` (checkpoint/convert-compatible with nn.Conv)."""

    @nn.compact
    def __call__(self):
        return self.param("kernel", nn.initializers.lecun_normal(),
                          (7, 7, 3, 64))


def _s2d_stem(x: jnp.ndarray, kernel: jnp.ndarray,
              dtype: Any) -> jnp.ndarray:
    """Space-to-depth stem: math-identical to conv 7x7/s2/p3 on [B,H,W,3]
    but MXU-efficient. A 3-input-channel conv wastes ~97% of the MXU's
    input lanes; regrouping 2x2 pixel cells into 12 channels and running
    the equivalent 4x4/s1 VALID conv on the [B,(H+6)/2,(W+6)/2,12] grid
    recovers ~4x on the stem (the standard MLPerf-ResNet TPU trick).
    The [7,7,3,64] kernel stays canonical (checkpoints untouched); it is
    zero-padded to 8x8 and regrouped on device each step (37k elements —
    free), so gradients flow exactly as for the 7x7 conv.
    """
    b, h, w, c = x.shape
    assert c == 3 and h % 2 == 0 and w % 2 == 0, (h, w, c)
    x = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)))
    hc, wc = (h + 6) // 2, (w + 6) // 2
    x = x.reshape(b, hc, 2, wc, 2, 3).transpose(0, 1, 3, 2, 4, 5)
    x = x.reshape(b, hc, wc, 12)
    w8 = jnp.pad(kernel, ((0, 1), (0, 1), (0, 0), (0, 0)))
    w4 = w8.reshape(4, 2, 4, 2, 3, -1).transpose(0, 2, 1, 3, 4, 5)
    w4 = w4.reshape(4, 4, 12, -1)
    return jax.lax.conv_general_dilated(
        x.astype(dtype), w4.astype(dtype), window_strides=(1, 1),
        padding="VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))


class ResNetBackbone(nn.Module):
    """Stride-32 conv trunk: [B, H, W, 3] -> [B, H/32, W/32, C]."""

    cnn_type: str = "resnet18"
    dtype: Any = jnp.float32
    remat: str = "none"
    # "conv7" (default) or "s2d". Both were timed on the chip (BENCH.md
    # round-2 probes): identical step time — XLA:TPU already legalizes
    # the 3-channel stem conv, so the s2d regrouping buys nothing here.
    # Kept selectable (and parity-tested) for other hardware/XLA versions.
    stem: str = "conv7"

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        block_cls, stage_sizes, _ = RESNET_CONFIGS[self.cnn_type]
        if self.remat != "none":
            policy_name = REMAT_POLICIES[self.remat]
            policy = (getattr(jax.checkpoint_policies, policy_name)
                      if policy_name else None)
            block_cls = nn.remat(block_cls, policy=policy,
                                 static_argnums=(2,))
        x = x.astype(self.dtype)
        if (self.stem == "s2d" and x.shape[1] % 2 == 0
                and x.shape[2] % 2 == 0):
            kernel = _StemKernel(name="conv1")()
            x = _s2d_stem(x, kernel, self.dtype)
        else:
            x = nn.Conv(64, (7, 7), strides=(2, 2), padding=3,
                        use_bias=False, dtype=self.dtype, name="conv1")(x)
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
