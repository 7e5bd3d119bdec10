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
                y_ref, s_ref, q_ref, *, relu_in: bool, block_m: int):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        s_ref[:] = jnp.zeros_like(s_ref)
        q_ref[:] = jnp.zeros_like(q_ref)

    a = x_ref[:].astype(jnp.float32) * inv_ref[0:1, :] + beta_ref[0:1, :]
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
                interpret: bool):
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
        functools.partial(_fwd_kernel, relu_in=relu, block_m=block_m),
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
                relu_in: bool, block_m: int):
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
                block_m: int, interpret: bool):
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
        functools.partial(_bwd_kernel, relu_in=relu, block_m=block_m),
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


def mm_bn_stats(x, w, inv, beta, relu: bool = False,
                block_m: int = 256):
    """relu((x*inv + beta)) @ w with column sum/sum-of-squares outputs.

    ``x`` [M, K] raw previous-conv output (or an already-normalized
    tensor with inv=1, beta=0), ``w`` [K, N] the 1x1 conv kernel
    reshaped, ``inv``/``beta`` [K] the folded previous-BN affine.
    Returns (y [M, N] in x.dtype, ssum [N] fp32, ssq [N] fp32).
    """
    from creamfl_tpu.ops.dispatch import _pallas_active

    if _pallas_active():
        return _mm_bn_stats_pallas(x, w, inv, beta, relu, block_m, False)
    return mm_bn_stats_reference(x, w, inv, beta, relu)
