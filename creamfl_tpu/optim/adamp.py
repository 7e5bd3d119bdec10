"""AdamP optimizer as an optax gradient transformation.

The reference uses the ``adamp`` pip package (Heo et al., ICLR 2021,
"AdamP: Slowing Down the Slowdown for Momentum Optimizers on
Scale-invariant Weights"; reference `src/algorithms/optimizers.py:25-29`).
Not available here — reimplemented from the published algorithm:

Adam moments -> perturbation ``m_hat / (sqrt(v_hat) + eps)``; for >=2D
parameters whose gradient is nearly orthogonal to the weight (max |cos|
over channel and layer views below ``delta / sqrt(view_dim)``), the radial
component of the perturbation is projected out and decoupled weight decay
is damped by ``wd_ratio``.

JAX notes: the data-dependent "should project?" branch becomes a
``jnp.where`` select (both paths are cheap elementwise math), keeping the
transformation jit-compatible with no host sync.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import chex
import jax
import jax.numpy as jnp
import optax


class AdamPState(NamedTuple):
    count: chex.Array      # global step clock (drives a callable lr)
    counts: optax.Updates  # per-leaf clocks = torch state['step']
    mu: optax.Updates
    nu: optax.Updates


def _project_views(p: jnp.ndarray, g: jnp.ndarray, perturb: jnp.ndarray,
                   delta: float, wd_ratio: float, eps: float,
                   channel_axis: int = -1):
    """Channel-view then layer-view projection; returns (perturb, wd).

    Torch AdamP's channel view is ``weight.view(out_channels, -1)`` —
    torch puts output channels first (Linear [out,in], Conv [O,I,kh,kw]).
    Flax kernels put output features LAST (Dense [in,out], Conv
    [kh,kw,I,O]), so the channel view here groups by the last axis to
    match the algorithm's intent (per-output-channel scale invariance
    under a following Norm layer). Exception: ``nn.Embed``'s table is
    [vocab, features] exactly like torch's, so its caller passes
    ``channel_axis=0`` (one row per vocab entry, matching the reference
    optimizer's grouping).
    """

    ca = channel_axis % p.ndim
    # Shape after moveaxis(x, ca, 0) — also the inverse-reshape target.
    moved_shape = (p.shape[ca],) + p.shape[:ca] + p.shape[ca + 1:]

    def to_channels(x):
        # channel axis -> leading, flatten the rest: [C, prod(rest)]
        return jnp.moveaxis(x, ca, 0).reshape(
            p.shape[ca], -1).astype(jnp.float32)

    def cosine_max(xv, yv):
        dot = jnp.sum(xv * yv, axis=1)
        nx = jnp.linalg.norm(xv, axis=1)
        ny = jnp.linalg.norm(yv, axis=1)
        return jnp.max(jnp.abs(dot) / jnp.maximum(nx * ny, eps))

    def projected_channels():
        pv = to_channels(p)
        pn = pv / (jnp.linalg.norm(pv, axis=1, keepdims=True) + eps)
        pert_v = to_channels(perturb)
        radial = jnp.sum(pn * pert_v, axis=1, keepdims=True)
        out = (pert_v - pn * radial).reshape(moved_shape)
        return jnp.moveaxis(out, 0, ca)

    def projected_layer():
        pv = p.reshape(1, -1).astype(jnp.float32)
        pn = pv / (jnp.linalg.norm(pv) + eps)
        pert_v = perturb.reshape(1, -1)
        radial = jnp.sum(pn * pert_v)
        return (pert_v - pn * radial).reshape(p.shape)

    # Elements per channel-view row (torch: weight.view(C, -1).size(1)).
    channel_dim = math.prod(p.shape) // p.shape[ca]
    layer_dim = math.prod(p.shape)

    cos_c = cosine_max(to_channels(g), to_channels(p))
    cos_l = cosine_max(g.reshape(1, -1).astype(jnp.float32),
                       p.reshape(1, -1).astype(jnp.float32))
    use_c = cos_c < delta / jnp.sqrt(jnp.float32(channel_dim))
    use_l = jnp.logical_and(jnp.logical_not(use_c),
                            cos_l < delta / jnp.sqrt(jnp.float32(layer_dim)))

    out = jnp.where(use_c, projected_channels(),
                    jnp.where(use_l, projected_layer(), perturb))
    wd = jnp.where(jnp.logical_or(use_c, use_l), wd_ratio, 1.0)
    return out, wd


def adamp(learning_rate: optax.ScalarOrSchedule,
          b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8,
          weight_decay: float = 0.0, delta: float = 0.1,
          wd_ratio: float = 0.1) -> optax.GradientTransformation:
    """AdamP; returns deltas to add to params (optax convention)."""

    def init_fn(params):
        return AdamPState(
            count=jnp.zeros([], jnp.int32),
            counts=jax.tree.map(
                lambda _: jnp.zeros([], jnp.int32), params),
            mu=jax.tree.map(jnp.zeros_like, params),
            nu=jax.tree.map(jnp.zeros_like, params),
        )

    def update_fn(updates, state, params=None):
        if params is None:
            raise ValueError("adamp requires params")
        count = state.count + 1
        # Per-leaf clocks mirror torch AdamP's state['step']: engines
        # that freeze a subtree for a phase (grad=None in torch) restore
        # its counts along with mu/nu via restore_frozen, so its bias
        # corrections resume where the last REAL update left them
        # instead of inheriting the global clock advanced by the
        # frozen-phase steps.
        counts = jax.tree.map(lambda c: c + 1, state.counts)
        mu = jax.tree.map(lambda m, g: b1 * m + (1 - b1) * g,
                          state.mu, updates)
        nu = jax.tree.map(lambda v, g: b2 * v + (1 - b2) * g * g,
                          state.nu, updates)
        lr = (learning_rate(count - 1)
              if callable(learning_rate) else learning_rate)

        def leaf_update(path, p, g, m, v, c):
            cf = c.astype(jnp.float32)
            bc1 = 1.0 - b1 ** cf
            bc2 = 1.0 - b2 ** cf
            step_size = lr / bc1
            denom = jnp.sqrt(v / bc2) + eps
            perturb = m / denom
            if p.ndim > 1:
                # nn.Embed tables are [vocab, features] — same layout as
                # torch — so their channel view groups by the FIRST axis;
                # Dense/Conv kernels put output features last.
                leaf_name = str(getattr(path[-1], "key", path[-1]))
                channel_axis = 0 if leaf_name == "embedding" else -1
                perturb, wd = _project_views(p, g, perturb, delta,
                                             wd_ratio, eps,
                                             channel_axis=channel_axis)
            else:
                wd = jnp.float32(1.0)
            delta_p = -step_size * perturb
            if weight_decay > 0:
                # Decoupled decay p *= (1 - lr*wd*ratio), expressed as delta.
                delta_p = delta_p - lr * weight_decay * wd * p
            return delta_p.astype(p.dtype)

        new_updates = jax.tree_util.tree_map_with_path(
            leaf_update, params, updates, mu, nu, counts)
        return new_updates, AdamPState(count=count, counts=counts,
                                       mu=mu, nu=nu)

    return optax.GradientTransformation(init_fn, update_fn)
