"""Pallas TPU kernels for the gallery hot loops.

Two kernels, both flash-style online-softmax over gallery column blocks:

* ``row_logsumexp`` — row-wise logsumexp of ``v @ g.T / tau`` without
  materialising the (M x N) logits. Grid = (row_blocks, col_blocks) with
  the column dimension innermost; VMEM scratch carries the running
  (max, sum) accumulators across column steps, so HBM traffic is one
  read of each v/g block per grid step and the matmul runs on the MXU
  from VMEM.
* ``fused_gallery_ce`` — inter-modal CE with a custom VJP: forward =
  streamed lse + label-logit dot; backward recomputes block logits and
  accumulates ``softmax @ gallery`` (``_softmax_matvec``), so neither
  pass ever holds an (M x N) buffer.

These power the con_w aggregation (50k x 50k per client,
reference MMFL.py:304) and the public-set inter-modal contrast
(bs x 50k per step, ClientTrainer.py:388). Accumulators are fp32; the
lane-sized (x128) scratch layout follows the TPU tiling constraints
(min tile 8x128 for fp32). On non-TPU backends use the XLA versions in
``ops.gallery`` (numerically identical); ``ops.dispatch`` selects.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
_LANE = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# ---------------------------------------------------------------------------
# row logsumexp
# ---------------------------------------------------------------------------

def _lse_kernel(v_ref, g_ref, nvalid_ref, out_ref, m_ref, s_ref, *,
                inv_tau: float, block_cols: int):
    j = pl.program_id(1)
    n_j = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        s_ref[:] = jnp.zeros_like(s_ref)

    logits = jax.lax.dot_general(
        v_ref[:], g_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * inv_tau

    # Mask padded gallery rows (tail block).
    col_ids = j * block_cols + jax.lax.broadcasted_iota(
        jnp.int32, logits.shape, dimension=1)
    logits = jnp.where(col_ids < nvalid_ref[0], logits, NEG_INF)

    run_max = m_ref[:, :1]  # [BR, 1]
    blk_max = jnp.max(logits, axis=1, keepdims=True)
    new_max = jnp.maximum(run_max, blk_max)
    scale = jnp.exp(run_max - new_max)
    blk_sum = jnp.sum(jnp.exp(logits - new_max), axis=1, keepdims=True)
    m_ref[:] = jnp.broadcast_to(new_max, m_ref.shape)
    s_ref[:] = s_ref[:] * scale + jnp.broadcast_to(blk_sum, s_ref.shape)

    @pl.when(j == n_j - 1)
    def _():
        out_ref[:] = m_ref[:] + jnp.log(s_ref[:])


@functools.partial(jax.jit,
                   static_argnames=("tau", "block_rows", "block_cols"))
def row_logsumexp(v: jnp.ndarray, gallery: jnp.ndarray, tau: float = 1.0,
                  block_rows: int = 256,
                  block_cols: int = 2048) -> jnp.ndarray:
    """[M, D] x [N, D] -> [M] logsumexp rows of v @ g.T / tau (Pallas)."""
    m, d = v.shape
    n = gallery.shape[0]
    m_pad = _round_up(m, block_rows)
    n_pad = _round_up(n, block_cols)
    d_pad = _round_up(d, _LANE)
    v_p = jnp.pad(v.astype(jnp.float32),
                  ((0, m_pad - m), (0, d_pad - d)))
    g_p = jnp.pad(gallery.astype(jnp.float32),
                  ((0, n_pad - n), (0, d_pad - d)))
    nvalid = jnp.asarray([n], jnp.int32)

    grid = (m_pad // block_rows, n_pad // block_cols)
    out = pl.pallas_call(
        functools.partial(_lse_kernel, inv_tau=1.0 / tau,
                          block_cols=block_cols),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_rows, d_pad), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_cols, d_pad), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((block_rows, _LANE), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, _LANE), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((block_rows, _LANE), jnp.float32),
            pltpu.VMEM((block_rows, _LANE), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * n_pad * d_pad,
            bytes_accessed=4 * (grid[1] * m_pad * d_pad
                                + grid[0] * n_pad * d_pad
                                + m_pad * _LANE),
            transcendentals=m_pad * n_pad,
        ),
    )(v_p, g_p, nvalid)
    return out[:m, 0]


def conw_diag_pallas(v: jnp.ndarray, gallery: jnp.ndarray,
                     block_rows: int = 256,
                     block_cols: int = 2048) -> jnp.ndarray:
    """diag(log_softmax(v @ g.T)) via the Pallas streamed lse."""
    diag = jnp.sum(v.astype(jnp.float32) * gallery.astype(jnp.float32),
                   axis=1)
    return diag - row_logsumexp(v, gallery, 1.0, block_rows, block_cols)


# ---------------------------------------------------------------------------
# fused gallery cross-entropy with custom VJP
# ---------------------------------------------------------------------------

def _softmax_matvec_kernel(v_ref, g_ref, lse_ref, nvalid_ref, out_ref,
                           acc_ref, *, inv_tau: float, block_cols: int):
    """acc += softmax(v g^T)[block] @ g[block]; write on last col step."""
    j = pl.program_id(1)
    n_j = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    logits = jax.lax.dot_general(
        v_ref[:], g_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * inv_tau
    col_ids = j * block_cols + jax.lax.broadcasted_iota(
        jnp.int32, logits.shape, dimension=1)
    logits = jnp.where(col_ids < nvalid_ref[0], logits, NEG_INF)
    probs = jnp.exp(logits - lse_ref[:, :1])  # [BR, BC]
    acc_ref[:] += jax.lax.dot_general(
        probs, g_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(j == n_j - 1)
    def _():
        out_ref[:] = acc_ref[:]


@functools.partial(jax.jit,
                   static_argnames=("tau", "block_rows", "block_cols"))
def _softmax_matvec(v, gallery, lse, tau, block_rows=256,
                    block_cols=2048):
    """Implicit softmax(v g^T / tau) @ gallery -> [M, D]."""
    m, d = v.shape
    n = gallery.shape[0]
    m_pad = _round_up(m, block_rows)
    n_pad = _round_up(n, block_cols)
    d_pad = _round_up(d, _LANE)
    v_p = jnp.pad(v.astype(jnp.float32), ((0, m_pad - m), (0, d_pad - d)))
    g_p = jnp.pad(gallery.astype(jnp.float32),
                  ((0, n_pad - n), (0, d_pad - d)))
    lse_p = jnp.broadcast_to(
        jnp.pad(lse.astype(jnp.float32), (0, m_pad - m))[:, None],
        (m_pad, _LANE))
    nvalid = jnp.asarray([n], jnp.int32)

    grid = (m_pad // block_rows, n_pad // block_cols)
    out = pl.pallas_call(
        functools.partial(_softmax_matvec_kernel, inv_tau=1.0 / tau,
                          block_cols=block_cols),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_rows, d_pad), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_cols, d_pad), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, _LANE), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((block_rows, d_pad), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, d_pad), jnp.float32),
        scratch_shapes=[pltpu.VMEM((block_rows, d_pad), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=4 * m_pad * n_pad * d_pad,
            bytes_accessed=4 * (grid[1] * m_pad * d_pad
                                + grid[0] * n_pad * d_pad
                                + m_pad * d_pad),
            transcendentals=m_pad * n_pad,
        ),
    )(v_p, g_p, lse_p, nvalid)
    return out[:m, :d]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_gallery_ce(feats, gallery, labels, tau=0.5):
    """Mean CE of ``feats @ gallery.T / tau`` vs integer ``labels``.

    Gallery is a constant (frozen global features) — its cotangent is
    zero, matching ``ops.gallery.gallery_cross_entropy`` semantics.
    """
    loss, _ = _fused_ce_fwd_impl(feats, gallery, labels, tau)
    return loss


def _fused_ce_fwd_impl(feats, gallery, labels, tau):
    lse = row_logsumexp(feats, gallery, tau)
    label_vecs = jnp.take(gallery, labels.astype(jnp.int32), axis=0)
    label_logit = jnp.sum(feats.astype(jnp.float32)
                          * label_vecs.astype(jnp.float32), axis=1) / tau
    loss = jnp.mean(lse - label_logit)
    return loss, (lse, label_vecs)


def _fused_ce_fwd(feats, gallery, labels, tau):
    loss, (lse, label_vecs) = _fused_ce_fwd_impl(feats, gallery, labels,
                                                 tau)
    return loss, (feats, gallery, lse, label_vecs)


def _fused_ce_bwd(tau, res, gbar):
    feats, gallery, lse, label_vecs = res
    bs = feats.shape[0]
    soft = _softmax_matvec(feats, gallery, lse, tau)
    dfeats = (soft - label_vecs.astype(jnp.float32)) * (gbar / (tau * bs))
    zero_labels = np.zeros((bs,), jax.dtypes.float0)
    return (dfeats.astype(feats.dtype), jnp.zeros_like(gallery),
            zero_labels)


fused_gallery_ce.defvjp(_fused_ce_fwd, _fused_ce_bwd)
