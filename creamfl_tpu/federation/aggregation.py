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


def _diag_logprobs(client_reps, global_other, row_block: int,
                   col_block: int, use_pallas: bool):
    """[K, N, d] x [N, d] -> [K, N] per-client diag(log_softmax)."""
    if use_pallas:
        return jnp.stack([
            dispatch.conw_diag_log_softmax(client_reps[k], global_other)
            for k in range(client_reps.shape[0])])
    return jax.vmap(
        lambda v: gallery_log_softmax_diag(v, global_other,
                                           row_block=row_block,
                                           col_block=col_block)
    )(client_reps)  # [K, N]


def _ensemble(diag_logprob, client_reps, k_mask):
    if k_mask is not None:
        diag_logprob = jnp.where(k_mask[:, None], diag_logprob, -jnp.inf)
    alpha = jax.nn.softmax(diag_logprob, axis=0)  # softmax over clients
    return jnp.einsum("kn,knd->nd", alpha, client_reps)


@functools.partial(jax.jit, static_argnames=("row_block", "col_block",
                                             "use_pallas"))
def _con_w_prog(client_reps: jnp.ndarray, global_other: jnp.ndarray,
                row_block: int, col_block: int,
                k_mask: Optional[jnp.ndarray],
                use_pallas: bool) -> jnp.ndarray:
    diag = _diag_logprobs(client_reps, global_other, row_block,
                          col_block, use_pallas)
    return _ensemble(diag, client_reps, k_mask)


@functools.lru_cache(maxsize=None)
def _con_w_mesh_prog(mesh, axis: str, row_block: int, col_block: int,
                     use_pallas: bool):
    """Mesh variant: the per-client streamed diagonals run under
    ``shard_map`` over the ``client`` axis, so each device computes only
    its LOCAL clients' [Kl, N] diagonals — the unrolled
    ``client_reps[k]`` slicing of the flat program would gather the
    whole [K, 50k, 256] stack onto one device and serialize the Pallas
    kernels (VERDICT r3 #7). The cross-client softmax + ensemble run in
    the surrounding jit where XLA inserts the (cheap, [K, N]-sized)
    collectives. Cached per (mesh, blocks, backend): a fresh shard_map
    wrapper per call would re-trace every round."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    def local_diag(reps_local, g):
        return _diag_logprobs(reps_local, g, row_block, col_block,
                              use_pallas)

    # check_vma off: the streamed-lse scan carries and the Pallas
    # kernel's out_shape are built without varying-mesh-axis annotations
    # (they're plain per-device programs); the replication checker would
    # reject them even though the partitioning is correct.
    try:
        sharded_diag = shard_map(local_diag, mesh=mesh,
                                 in_specs=(P(axis), P()),
                                 out_specs=P(axis), check_vma=False)
    except TypeError:  # older jax: the kwarg was check_rep
        sharded_diag = shard_map(local_diag, mesh=mesh,
                                 in_specs=(P(axis), P()),
                                 out_specs=P(axis), check_rep=False)

    def run(client_reps, global_other, k_mask):
        diag = sharded_diag(client_reps, global_other)
        return _ensemble(diag, client_reps, k_mask)

    return jax.jit(run), NamedSharding(mesh, P(axis))


def con_w_aggregate(client_reps: jnp.ndarray, global_other: jnp.ndarray,
                    row_block: int = 1024,
                    col_block: int = 8192,
                    k_mask: Optional[jnp.ndarray] = None,
                    mesh=None, axis: str = "client") -> jnp.ndarray:
    """[K, N, d] client reps + [N, d] other-modality globals -> [N, d].

    K (the stacked-client axis) is small and static, so the per-client
    streamed diagonals unroll; on TPU each is the Pallas kernel.
    ``k_mask`` ([K] bool) excludes padded clients from the softmax —
    callers pad K to a bucket so per-round client sampling reuses one
    compiled program per bucket instead of one per distinct K.

    With ``mesh``, K must divide by ``mesh.shape[axis]`` (callers pad
    via ``_bucketed(multiple_of=...)``) and the diagonals partition over
    the mesh's client axis via shard_map — no device ever holds more
    than its K/D shard of the rep stack.

    The dispatch backend is resolved at CALL time and is part of the jit
    cache key (``use_pallas`` static arg) — otherwise the first trace
    would bake the backend in and a later ``dispatch.set_backend`` would
    be silently ignored for same-shape calls.
    """
    use_pallas = dispatch._pallas_active()
    if mesh is not None:
        n_dev = mesh.shape[axis]
        assert client_reps.shape[0] % n_dev == 0, (
            f"client axis {client_reps.shape[0]} not divisible by mesh "
            f"axis {n_dev}; pad via _bucketed(multiple_of={n_dev})")
        prog, sharding = _con_w_mesh_prog(mesh, axis, row_block,
                                          col_block, use_pallas)
        from creamfl_tpu.parallel.mesh import put_global

        client_reps = put_global(jnp.asarray(client_reps), sharding)
        if k_mask is None:
            k_mask = jnp.ones((client_reps.shape[0],), bool)
        return prog(client_reps, global_other, k_mask)
    return _con_w_prog(client_reps, global_other, row_block=row_block,
                       col_block=col_block, k_mask=k_mask,
                       use_pallas=use_pallas)


def _bucketed(reps: jnp.ndarray, multiple_of: int = 1):
    """Pad the client axis up to the next power of two (and, on a mesh,
    to a multiple of the mesh client axis); returns (padded_reps,
    k_mask). Bounds distinct compiled shapes to log2(max clients)
    regardless of the per-round sample."""
    k = reps.shape[0]
    bucket = 1 << max(0, (k - 1).bit_length())
    bucket += (-bucket) % multiple_of
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
                         col_block: int = 8192,
                         mesh=None):
    """Reference `aggregation()` closure: image reps weight against the
    global *text* features and vice versa (MMFL.py:298-331)."""
    mult = mesh.shape["client"] if mesh is not None else 1
    img_out = txt_out = None
    if img_reps is not None and len(img_reps) > 0:
        reps, mask = _bucketed(jnp.asarray(img_reps), multiple_of=mult)
        img_out = con_w_aggregate(reps, global_txt, row_block=row_block,
                                  col_block=col_block, k_mask=mask,
                                  mesh=mesh)
    if txt_reps is not None and len(txt_reps) > 0:
        reps, mask = _bucketed(jnp.asarray(txt_reps), multiple_of=mult)
        txt_out = con_w_aggregate(reps, global_img, row_block=row_block,
                                  col_block=col_block, k_mask=mask,
                                  mesh=mesh)
    return img_out, txt_out
