"""Masked bidirectional GRU with PyTorch packed-sequence semantics.

The reference text encoders run ``pack_padded_sequence`` -> ``nn.GRU`` ->
gather of the last valid state (`src/networks/models/caption_encoder.py:87-101`,
`src/networks/language_model.py:95-107`). Packed semantics matter:

* the forward direction never updates its hidden state on pad steps;
* the backward direction *starts* at the last valid token of each
  sequence (not at the padding);
* per-position outputs at pad positions are zero.

TPU-first design: instead of packing (dynamic shapes), we run a
``lax.scan`` over the time axis on the full padded batch with a validity
mask, and realise the backward direction by gathering each sequence's
reversed valid prefix. Static shapes, one compiled program for all length
distributions in a bucket.

Gate math matches torch.nn.GRU exactly (r/z/n gate order, the candidate
uses ``r * (W_hn h + b_hn)``), so torch weights port over directly.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax


def _gru_scan(x: jnp.ndarray, mask: jnp.ndarray, wi: jnp.ndarray,
              bi: jnp.ndarray, wh: jnp.ndarray, bh: jnp.ndarray
              ) -> jnp.ndarray:
    """Unidirectional masked GRU. x: [B,L,D], mask: [B,L] -> outs [B,L,H]."""
    hidden = wh.shape[0]
    # Precompute input projections for all steps: [B, L, 3H] (one big matmul
    # feeds the MXU instead of L small ones inside the scan).
    xproj = jnp.einsum("bld,dk->blk", x, wi) + bi

    def step(h, inputs):
        xp_t, m_t = inputs
        xr, xz, xn = jnp.split(xp_t, 3, axis=-1)
        hp = jnp.dot(h, wh, preferred_element_type=jnp.float32) + bh
        hr, hz, hn = jnp.split(hp, 3, axis=-1)
        r = nn.sigmoid(xr + hr)
        z = nn.sigmoid(xz + hz)
        n = jnp.tanh(xn + r * hn)
        h_new = (1.0 - z) * n + z * h
        h = jnp.where(m_t[:, None], h_new, h)
        return h, h

    b = x.shape[0]
    h0 = jnp.zeros((b, hidden), x.dtype)
    _, outs = lax.scan(step, h0,
                       (jnp.swapaxes(xproj, 0, 1), jnp.swapaxes(mask, 0, 1)))
    return jnp.swapaxes(outs, 0, 1)  # [B, L, H]


def _reverse_valid(x: jnp.ndarray, lengths: jnp.ndarray) -> jnp.ndarray:
    """Reverse each sequence's first ``len`` elements; pads stay in place
    (their values are irrelevant under the mask)."""
    b, l = x.shape[:2]
    t = jnp.arange(l)[None, :]
    idx = jnp.clip(lengths[:, None] - 1 - t, 0, l - 1)
    return jnp.take_along_axis(
        x, idx.reshape(b, l, *([1] * (x.ndim - 2))), axis=1)


class BiGRU(nn.Module):
    """Bidirectional masked GRU. Returns ([B,L,2H] outputs, [B,2H] final).

    ``outputs[b, t] = [h_fwd_t, h_bwd_t]`` with torch packed semantics;
    outputs at pad positions are zeroed. ``final[b] = outputs[b, len_b-1]``
    — exactly the reference's last-state gather.
    """

    hidden_size: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, lengths: jnp.ndarray
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        d_in = x.shape[-1]
        h = self.hidden_size
        k = 1.0 / jnp.sqrt(h)

        def init(key, shape, dtype=jnp.float32):
            # torch GRU init: U(-1/sqrt(H), 1/sqrt(H)).
            return jax.random.uniform(key, shape, dtype, -k, k)

        def gru_params(prefix):
            # Torch layout: weight_ih [3H, D] / weight_hh [3H, H]; we store
            # transposed for right-multiplication.
            wi = self.param(f"{prefix}_wi", init, (d_in, 3 * h))
            bi = self.param(f"{prefix}_bi", init, (3 * h,))
            wh = self.param(f"{prefix}_wh", init, (h, 3 * h))
            bh = self.param(f"{prefix}_bh", init, (3 * h,))
            return wi, bi, wh, bh

        l = x.shape[1]
        mask = jnp.arange(l)[None, :] < lengths[:, None]  # [B, L]

        fwd = _gru_scan(x, mask, *gru_params("fwd"))

        x_rev = _reverse_valid(x, lengths)
        bwd_rev = _gru_scan(x_rev, mask, *gru_params("bwd"))
        bwd = _reverse_valid(bwd_rev, lengths)

        outs = jnp.concatenate([fwd, bwd], axis=-1)
        outs = jnp.where(mask[:, :, None], outs, 0.0)
        final = gather_last_valid(outs, lengths)
        return outs, final


def gather_last_valid(outs: jnp.ndarray, lengths: jnp.ndarray) -> jnp.ndarray:
    """outs[b, lengths[b]-1, :] (reference's torch.gather last-state trick)."""
    idx = jnp.clip(lengths - 1, 0, outs.shape[1] - 1)
    return jnp.take_along_axis(outs, idx[:, None, None], axis=1)[:, 0, :]
