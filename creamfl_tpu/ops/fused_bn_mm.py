"""Fused (BN-normalize -> ReLU ->) 1x1-conv matmul with BN-stats epilogue.

Train-mode BatchNorm is the measured gap between the R101 tower and its
HBM roofline (tools/bn_probe.py: +0.73 ms/block at 56^2, +0.21 at 14^2 —
the batch-stat reduction forces XLA to re-read every conv output, and
the normalize+relu between convs materialises an extra tensor because
convs cannot fuse producers). A bottleneck's 1x1 convs are matmuls over
the flattened pixels, so one Pallas kernel can do all three steps in a
single HBM pass per tensor:

    A = relu(x * inv + beta)       # previous BN folded: inv = s*rsqrt(
    Y = A @ W                      #   var+eps), beta = b - mean*inv
    ssum, ssq = col-sums of Y, Y^2 # batch stats of Y, free in-VMEM

The custom VJP runs the mirrored single-pass kernel: it folds the
stat-output cotangents into dY (d ssum/d y = 1, d ssq/d y = 2y), computes
dX and accumulates dW / d inv / d beta per row-block, so the backward
reads each big tensor once too.

Semantics match the unfused flax chain (BatchNorm -> relu -> Conv 1x1 ->
stats) with the normalize arithmetic in fp32; reference for what the
math must reproduce: torchvision Bottleneck as used by the server tower
(`/root/reference/src/networks/models/image_encoder.py:24-32`).
``models/resnet.py:FusedBottleneck`` wires it into the trunk.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def mm_bn_stats_reference(x, w, inv, beta, relu: bool):
    """Pure-jnp oracle (and the non-TPU path; plain autodiff)."""
    a = x.astype(jnp.float32) * inv + beta
    if relu:
        a = jnp.maximum(a, 0.0)
    y = jnp.dot(a.astype(w.dtype), w,
                preferred_element_type=jnp.float32).astype(x.dtype)
    yf = y.astype(jnp.float32)
    return y, jnp.sum(yf, axis=0), jnp.sum(yf * yf, axis=0)


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------

def _fwd_kernel(x_ref, w_ref, inv_ref, beta_ref, mvalid_ref,
                y_ref, s_ref, q_ref, *, relu_in: bool, block_m: int,
                identity: bool):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        s_ref[:] = jnp.zeros_like(s_ref)
        q_ref[:] = jnp.zeros_like(q_ref)

    if identity:
        # inv==1, beta==0 statically (conv1 / projection inputs): skip
        # the fp32 expansion of the whole x block — it was the VPU tax
        # that made the fwd kernel 3x slower than XLA's conv at s3
        # geometry (tools/fused_tune_probe.py).
        a = x_ref[:]
        if relu_in:
            a = jnp.maximum(a, jnp.zeros((), a.dtype))
    else:
        a = (x_ref[:].astype(jnp.float32) * inv_ref[0:1, :]
             + beta_ref[0:1, :])
        if relu_in:
            a = jnp.maximum(a, 0.0)
    y = jax.lax.dot_general(a.astype(w_ref.dtype), w_ref[:],
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    yc = y.astype(y_ref.dtype)
    y_ref[:] = yc

    # Stats of the STORED values (bf16-rounded like the unfused conv
    # output the flax BatchNorm reduces), fp32 accumulation, padded
    # rows masked out.
    yf = yc.astype(jnp.float32)
    rows = i * block_m + jax.lax.broadcasted_iota(jnp.int32, yf.shape, 0)
    yv = jnp.where(rows < mvalid_ref[0], yf, 0.0)
    s_ref[:] += jnp.broadcast_to(jnp.sum(yv, axis=0, keepdims=True),
                                 s_ref.shape)
    q_ref[:] += jnp.broadcast_to(jnp.sum(yv * yv, axis=0, keepdims=True),
                                 q_ref.shape)


def _fwd_pallas(x, w, inv, beta, relu: bool, block_m: int,
                interpret: bool, identity: bool = False):
    m, k = x.shape
    n = w.shape[1]
    mp = _round_up(m, block_m)
    kp = _round_up(k, _LANE)
    np_ = _round_up(n, _LANE)
    xp = jnp.pad(x, ((0, mp - m), (0, kp - k)))
    wp = jnp.pad(w, ((0, kp - k), (0, np_ - n)))
    # Padded K columns contribute a = 0*0 + 0 = 0 (inv/beta pad zero).
    ip = jnp.broadcast_to(
        jnp.pad(inv.astype(jnp.float32), (0, kp - k))[None, :], (8, kp))
    bp = jnp.broadcast_to(
        jnp.pad(beta.astype(jnp.float32), (0, kp - k))[None, :], (8, kp))
    mvalid = jnp.asarray([m], jnp.int32)

    grid = (mp // block_m,)
    y, s, q = pl.pallas_call(
        functools.partial(_fwd_kernel, relu_in=relu, block_m=block_m,
                          identity=identity),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, kp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kp, np_), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, kp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, kp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((block_m, np_), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, np_), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, np_), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((mp, np_), x.dtype),
            jax.ShapeDtypeStruct((8, np_), jnp.float32),
            jax.ShapeDtypeStruct((8, np_), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * kp * np_,
            bytes_accessed=(mp * kp * x.dtype.itemsize
                            + mp * np_ * x.dtype.itemsize
                            + grid[0] * kp * np_ * w.dtype.itemsize),
            transcendentals=0,
        ),
        interpret=interpret,
    )(xp, wp, ip, bp, mvalid)
    return y[:m, :n], s[0, :n], q[0, :n]


# ---------------------------------------------------------------------------
# backward kernel
# ---------------------------------------------------------------------------

def _bwd_kernel(x_ref, w_ref, inv_ref, beta_ref, y_ref, dy_ref, dsq_ref,
                mvalid_ref, dx_ref, dw_ref, dinv_ref, dbeta_ref, *,
                relu_in: bool, block_m: int, identity: bool):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref)
        dinv_ref[:] = jnp.zeros_like(dinv_ref)
        dbeta_ref[:] = jnp.zeros_like(dbeta_ref)

    y = y_ref[:].astype(jnp.float32)
    # Fold stat cotangents into dY: d ssum/d y = 1, d ssq/d y = 2y.
    dyt = (dy_ref[:].astype(jnp.float32)
           + dsq_ref[0:1, :] + 2.0 * y * dsq_ref[1:2, :])
    rows = i * block_m + jax.lax.broadcasted_iota(jnp.int32, dyt.shape, 0)
    dyt = jnp.where(rows < mvalid_ref[0], dyt, 0.0)
    dyt_c = dyt.astype(w_ref.dtype)

    da = jax.lax.dot_general(dyt_c, w_ref[:], (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    if identity:
        # inv==1, beta==0 statically: a = relu?(x) in the compute dtype
        # (no fp32 expansion of the x block), dx = da, and the inv/beta
        # cotangents are NOT computed (the identity entry point never
        # exposes them to autodiff).
        xc = x_ref[:]
        if relu_in:
            da = jnp.where(xc > jnp.zeros((), xc.dtype), da, 0.0)
            a = jnp.maximum(xc, jnp.zeros((), xc.dtype))
        else:
            a = xc
        dx_ref[:] = da.astype(dx_ref.dtype)
        dw_ref[:] += jax.lax.dot_general(
            a.astype(w_ref.dtype), dyt_c, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return
    x = x_ref[:].astype(jnp.float32)
    a = x * inv_ref[0:1, :] + beta_ref[0:1, :]
    if relu_in:
        da = jnp.where(a > 0.0, da, 0.0)
        a = jnp.maximum(a, 0.0)
    dx_ref[:] = (da * inv_ref[0:1, :]).astype(dx_ref.dtype)
    dw_ref[:] += jax.lax.dot_general(
        a.astype(w_ref.dtype), dyt_c, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dinv_ref[:] += jnp.broadcast_to(
        jnp.sum(da * x, axis=0, keepdims=True), dinv_ref.shape)
    dbeta_ref[:] += jnp.broadcast_to(
        jnp.sum(da, axis=0, keepdims=True), dbeta_ref.shape)


def _bwd_pallas(x, w, inv, beta, y, dy, dssum, dssq, relu: bool,
                block_m: int, interpret: bool, identity: bool = False):
    m, k = x.shape
    n = w.shape[1]
    mp = _round_up(m, block_m)
    kp = _round_up(k, _LANE)
    np_ = _round_up(n, _LANE)
    xp = jnp.pad(x, ((0, mp - m), (0, kp - k)))
    wp = jnp.pad(w, ((0, kp - k), (0, np_ - n)))
    yp = jnp.pad(y, ((0, mp - m), (0, np_ - n)))
    dyp = jnp.pad(dy, ((0, mp - m), (0, np_ - n)))
    ip = jnp.broadcast_to(
        jnp.pad(inv.astype(jnp.float32), (0, kp - k))[None, :], (8, kp))
    bp = jnp.broadcast_to(
        jnp.pad(beta.astype(jnp.float32), (0, kp - k))[None, :], (8, kp))
    ds = jnp.stack([jnp.pad(dssum.astype(jnp.float32), (0, np_ - n)),
                    jnp.pad(dssq.astype(jnp.float32), (0, np_ - n))])
    ds = jnp.concatenate([ds, jnp.zeros((6, np_), jnp.float32)])
    mvalid = jnp.asarray([m], jnp.int32)

    grid = (mp // block_m,)
    dx, dw, dinv, dbeta = pl.pallas_call(
        functools.partial(_bwd_kernel, relu_in=relu, block_m=block_m,
                          identity=identity),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, kp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kp, np_), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, kp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, kp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_m, np_), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_m, np_), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, np_), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((block_m, kp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kp, np_), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, kp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, kp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((mp, kp), x.dtype),
            jax.ShapeDtypeStruct((kp, np_), jnp.float32),
            jax.ShapeDtypeStruct((8, kp), jnp.float32),
            jax.ShapeDtypeStruct((8, kp), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * mp * kp * np_,
            bytes_accessed=(mp * (2 * kp + 2 * np_) * x.dtype.itemsize
                            + grid[0] * kp * np_ * 6),
            transcendentals=0,
        ),
        interpret=interpret,
    )(xp, wp, ip, bp, yp, dyp, ds, mvalid)
    return (dx[:m, :k], dw[:k, :n].astype(w.dtype),
            dinv[0, :k], dbeta[0, :k])


# ---------------------------------------------------------------------------
# custom-VJP wrapper + backend dispatch
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _mm_bn_stats_pallas(x, w, inv, beta, relu, block_m, interpret):
    return _fwd_pallas(x, w, inv, beta, relu, block_m, interpret)


def _vjp_fwd(x, w, inv, beta, relu, block_m, interpret):
    out = _fwd_pallas(x, w, inv, beta, relu, block_m, interpret)
    return out, (x, w, inv, beta, out[0])


def _vjp_bwd(relu, block_m, interpret, res, cts):
    x, w, inv, beta, y = res
    dy, dssum, dssq = cts
    dx, dw, dinv, dbeta = _bwd_pallas(x, w, inv, beta, y, dy, dssum,
                                      dssq, relu, block_m, interpret)
    return dx, dw, dinv.astype(inv.dtype), dbeta.astype(beta.dtype)


_mm_bn_stats_pallas.defvjp(_vjp_fwd, _vjp_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _mm_stats_pallas_id(x, w, relu, block_m, interpret):
    """Identity-affine variant: relu?(x) @ w + stats, no inv/beta
    inputs. Skipping the per-element fp32 normalize is worth ~3x on
    the forward at R101 stage-3 geometry (tools/fused_tune_probe.py);
    conv1 and the projection feed raw (already-normalized or residual)
    tensors, so their affine is statically the identity."""
    k = x.shape[1]
    dummy = jnp.zeros((k,), jnp.float32)
    return _fwd_pallas(x, w, dummy, dummy, relu, block_m, interpret,
                       identity=True)


def _vjp_id_fwd(x, w, relu, block_m, interpret):
    out = _mm_stats_pallas_id(x, w, relu, block_m, interpret)
    return out, (x, w, out[0])


def _vjp_id_bwd(relu, block_m, interpret, res, cts):
    x, w, y = res
    dy, dssum, dssq = cts
    k = x.shape[1]
    dummy = jnp.zeros((k,), jnp.float32)
    dx, dw, _, _ = _bwd_pallas(x, w, dummy, dummy, y, dy, dssum, dssq,
                               relu, block_m, interpret, identity=True)
    return dx, dw


_mm_stats_pallas_id.defvjp(_vjp_id_fwd, _vjp_id_bwd)


def mm_bn_stats(x, w, inv=None, beta=None, relu: bool = False,
                block_m: int = 128):
    """relu((x*inv + beta)) @ w with column sum/sum-of-squares outputs.

    ``x`` [M, K] raw previous-conv output (or an already-normalized
    tensor), ``w`` [K, N] the 1x1 conv kernel reshaped, ``inv``/``beta``
    [K] the folded previous-BN affine — pass ``None`` for both to take
    the identity fast path (no per-element normalize; the kernel skips
    the fp32 expansion of the x block entirely).
    Returns (y [M, N] in x.dtype, ssum [N] fp32, ssq [N] fp32).

    ``block_m`` defaults to 128: the measured best on v5e for the
    fwd+bwd chain (0.209 ms vs 0.230/0.261/0.280 at 1024/512/256,
    tools/fused_tune_probe.py sweep at stage-3 geometry).

    ``w`` is cast to the compute dtype (x.dtype) first — exactly what
    ``nn.Conv(dtype=...)`` does in the unfused block. Besides numeric
    parity this is load-bearing for the kernel: a bf16 weight block is
    half the VMEM (the R101 layer4 backward holds w + the dw
    accumulator — 8 MB each in fp32 blows the 16 MB scoped-VMEM limit)
    and keeps the matmul on the bf16 MXU path. The dw cotangent is
    accumulated in fp32 and flows back through the cast to the fp32
    param, matching unfused autodiff.
    """
    from creamfl_tpu.ops.dispatch import _pallas_active

    w = w.astype(x.dtype)
    identity = inv is None and beta is None
    if _pallas_active():
        if identity:
            return _mm_stats_pallas_id(x, w, relu, block_m, False)
        return _mm_bn_stats_pallas(x, w, inv, beta, relu, block_m, False)
    if identity:
        k = x.shape[1]
        inv = jnp.ones((k,), jnp.float32)
        beta = jnp.zeros((k,), jnp.float32)
    return mm_bn_stats_reference(x, w, inv, beta, relu)
