"""con_w representation-ensemble aggregation (reference `MMFL.py:291-335`).

Math: for each client k with public-set representations V_k in R^{N x d}
and the *other-modality* global features G:
    w_k = diag(log_softmax(V_k @ G.T))          (N-dim, per-sample)
    alpha = softmax over clients of [w_1 ... w_K]
    aggregated = sum_k alpha_k * V_k

The reference materialises each 50k x 50k logits matrix on GPU and
empties the cache between clients (MMFL.py:304-309). Here the diagonal
and the row log-sum-exp stream blockwise (ops.gallery_log_softmax_diag)
— peak memory O(row_block x col_block) — and the whole aggregation is one
jitted program over the stacked client axis, which shard_map distributes
over the mesh's ``clients`` axis (clients are data-independent).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from creamfl_tpu.ops import dispatch
from creamfl_tpu.ops.gallery import gallery_log_softmax_diag


@functools.partial(jax.jit, static_argnames=("row_block", "col_block",
                                             "use_pallas"))
def _con_w_prog(client_reps: jnp.ndarray, global_other: jnp.ndarray,
                row_block: int, col_block: int,
                k_mask: Optional[jnp.ndarray],
                use_pallas: bool) -> jnp.ndarray:
    if use_pallas:
        diag_logprob = jnp.stack([
            dispatch.conw_diag_log_softmax(client_reps[k], global_other)
            for k in range(client_reps.shape[0])])
    else:
        diag_logprob = jax.vmap(
            lambda v: gallery_log_softmax_diag(v, global_other,
                                               row_block=row_block,
                                               col_block=col_block)
        )(client_reps)  # [K, N]
    if k_mask is not None:
        diag_logprob = jnp.where(k_mask[:, None], diag_logprob, -jnp.inf)
    alpha = jax.nn.softmax(diag_logprob, axis=0)  # softmax over clients
    return jnp.einsum("kn,knd->nd", alpha, client_reps)


def con_w_aggregate(client_reps: jnp.ndarray, global_other: jnp.ndarray,
                    row_block: int = 1024,
                    col_block: int = 8192,
                    k_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """[K, N, d] client reps + [N, d] other-modality globals -> [N, d].

    K (the stacked-client axis) is small and static, so the per-client
    streamed diagonals unroll; on TPU each is the Pallas kernel.
    ``k_mask`` ([K] bool) excludes padded clients from the softmax —
    callers pad K to a bucket so per-round client sampling reuses one
    compiled program per bucket instead of one per distinct K.

    The dispatch backend is resolved at CALL time and is part of the jit
    cache key (``use_pallas`` static arg) — otherwise the first trace
    would bake the backend in and a later ``dispatch.set_backend`` would
    be silently ignored for same-shape calls.
    """
    return _con_w_prog(client_reps, global_other, row_block=row_block,
                       col_block=col_block, k_mask=k_mask,
                       use_pallas=dispatch._pallas_active())


def _bucketed(reps: jnp.ndarray):
    """Pad the client axis up to the next power of two; returns
    (padded_reps, k_mask). Bounds distinct compiled shapes to
    log2(max clients) regardless of the per-round sample."""
    k = reps.shape[0]
    bucket = 1 << max(0, (k - 1).bit_length())
    if bucket == k:
        return reps, jnp.ones((k,), bool)
    pad = jnp.zeros((bucket - k,) + reps.shape[1:], reps.dtype)
    mask = jnp.concatenate([jnp.ones((k,), bool),
                            jnp.zeros((bucket - k,), bool)])
    return jnp.concatenate([reps, pad], axis=0), mask


def aggregate_modalities(img_reps: Optional[jnp.ndarray],
                         txt_reps: Optional[jnp.ndarray],
                         global_img: jnp.ndarray,
                         global_txt: jnp.ndarray,
                         row_block: int = 1024,
                         col_block: int = 8192):
    """Reference `aggregation()` closure: image reps weight against the
    global *text* features and vice versa (MMFL.py:298-331)."""
    img_out = txt_out = None
    if img_reps is not None and len(img_reps) > 0:
        reps, mask = _bucketed(jnp.asarray(img_reps))
        img_out = con_w_aggregate(reps, global_txt, row_block=row_block,
                                  col_block=col_block, k_mask=mask)
    if txt_reps is not None and len(txt_reps) > 0:
        reps, mask = _bucketed(jnp.asarray(txt_reps))
        txt_out = con_w_aggregate(reps, global_img, row_block=row_block,
                                  col_block=col_block, k_mask=mask)
    return img_out, txt_out
