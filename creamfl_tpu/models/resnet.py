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


class _ConvKernel(nn.Module):
    """Bare conv kernel holder — same param tree as nn.Conv (so
    FusedBottleneck checkpoints interchange with Bottleneck's)."""

    shape: tuple

    @nn.compact
    def __call__(self):
        return self.param("kernel", nn.initializers.lecun_normal(),
                          self.shape)


class _BNState(nn.Module):
    """BatchNorm params + running stats — same trees as nn.BatchNorm."""

    ch: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.ch,))
        bias = self.param("bias", nn.initializers.zeros, (self.ch,))
        mean = self.variable("batch_stats", "mean",
                             lambda: jnp.zeros((self.ch,), jnp.float32))
        var = self.variable("batch_stats", "var",
                            lambda: jnp.ones((self.ch,), jnp.float32))
        return scale, bias, mean, var


class FusedBottleneck(nn.Module):
    """Bottleneck with the 1x1 convs + BatchNorm run as fused Pallas
    matmul/stats kernels (ops/fused_bn_mm.py).

    Math-equivalent to ``Bottleneck`` (normalize arithmetic in fp32
    instead of the compute dtype — a strict precision upgrade), with
    IDENTICAL param/batch_stats trees, so checkpoints interchange. The
    3x3 conv stays an XLA conv (flops-bound — tools/bn_probe.py); its
    BN folds into the conv3 kernel's prologue, so no normalized
    intermediate is ever materialised for it. Train-mode BN stats come
    out of the matmul epilogues instead of re-reading each conv output
    (the measured XLA overhead this removes: +0.73 ms/block at 56^2,
    +0.21 at 14^2, bn_probe).
    """

    filters: int
    stride: int = 1
    dtype: Any = jnp.float32
    expansion: int = 4
    momentum: float = 0.9
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x, train: bool = False):
        from creamfl_tpu.ops.fused_bn_mm import mm_bn_stats

        f = self.filters
        cin = x.shape[-1]
        b, h, w0, _ = x.shape
        w1 = _ConvKernel((1, 1, cin, f), name="conv1")()
        bn1 = _BNState(f, name="bn1")()
        bn2 = _BNState(f, name="bn2")()
        w3 = _ConvKernel((1, 1, f, f * self.expansion), name="conv3")()
        bn3 = _BNState(f * self.expansion, name="bn3")()
        need_proj = (self.stride != 1) or (cin != f * self.expansion)
        if need_proj:
            wp = _ConvKernel((1, 1, cin, f * self.expansion),
                             name="downsample_conv")()
            bnp = _BNState(f * self.expansion, name="downsample_bn")()

        upd = train and not self.is_initializing()

        def fold(bn, mean, var):
            scale, bias = bn[0], bn[1]
            inv = scale * jax.lax.rsqrt(var + self.eps)
            return inv, bias - mean * inv

        def stats_of(bn, ssum, ssq, n):
            """batch (mean, var) from kernel stat outputs + running
            update (flax BatchNorm semantics: biased var, momentum
            EMA)."""
            mean = ssum / n
            var = ssq / n - jnp.square(mean)
            if upd:
                bn[2].value = (self.momentum * bn[2].value
                               + (1 - self.momentum) * mean)
                bn[3].value = (self.momentum * bn[3].value
                               + (1 - self.momentum) * var)
            return mean, var

        x = x.astype(self.dtype)
        x2d = x.reshape(-1, cin)

        # conv1 (1x1) + bn1 stats in one pass (identity affine: the
        # block input is already the previous block's relu output).
        y1, ss1, sq1 = mm_bn_stats(x2d, w1.reshape(cin, f), relu=False)
        n1 = y1.shape[0]
        if train:
            m1, v1 = stats_of(bn1, ss1, sq1, n1)
        else:
            m1, v1 = bn1[2].value, bn1[3].value
        inv1, beta1 = fold(bn1, m1, v1)
        a1 = jnp.maximum(y1.astype(jnp.float32) * inv1 + beta1, 0.0)
        a1 = a1.astype(self.dtype).reshape(b, h, w0, f)

        # conv2 (3x3, carries the stride) — XLA conv; its BN folds into
        # the conv3 kernel's prologue below.
        y2 = nn.Conv(f, (3, 3), strides=(self.stride,) * 2, padding=1,
                     use_bias=False, dtype=self.dtype, name="conv2")(a1)
        hw2 = y2.shape[1], y2.shape[2]
        y2_2d = y2.reshape(-1, f)
        n2 = y2_2d.shape[0]
        if train:
            y2f = y2_2d.astype(jnp.float32)
            m2 = jnp.mean(y2f, axis=0)
            v2 = jnp.mean(jnp.square(y2f), axis=0) - jnp.square(m2)
            if upd:
                bn2[2].value = (self.momentum * bn2[2].value
                                + (1 - self.momentum) * m2)
                bn2[3].value = (self.momentum * bn2[3].value
                                + (1 - self.momentum) * v2)
        else:
            m2, v2 = bn2[2].value, bn2[3].value
        inv2, beta2 = fold(bn2, m2, v2)

        # bn2-normalize + relu + conv3 (1x1) + bn3 stats in one pass.
        y3, ss3, sq3 = mm_bn_stats(y2_2d, w3.reshape(f, f * self.expansion),
                                   inv2, beta2, relu=True)
        if train:
            m3, v3 = stats_of(bn3, ss3, sq3, n2)
        else:
            m3, v3 = bn3[2].value, bn3[3].value
        inv3, beta3 = fold(bn3, m3, v3)

        if need_proj:
            xs = x[:, ::self.stride, ::self.stride, :].reshape(-1, cin)
            r, ssr, sqr = mm_bn_stats(
                xs, wp.reshape(cin, f * self.expansion), relu=False)
            if train:
                mr, vr = stats_of(bnp, ssr, sqr, n2)
            else:
                mr, vr = bnp[2].value, bnp[3].value
            invr, betar = fold(bnp, mr, vr)
            res = r.astype(jnp.float32) * invr + betar
        else:
            res = x2d.astype(jnp.float32)

        out = jnp.maximum(y3.astype(jnp.float32) * inv3 + beta3 + res,
                          0.0)
        return out.astype(self.dtype).reshape(
            b, hw2[0], hw2[1], f * self.expansion)


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
    # Fused Pallas conv+BN+stats bottlenecks (FusedBottleneck docstring);
    # same params, tolerance-level same math, fewer HBM passes in train.
    fused_bn: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        block_cls, stage_sizes, _ = RESNET_CONFIGS[self.cnn_type]
        if self.fused_bn and block_cls is Bottleneck:
            block_cls = FusedBottleneck
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
