"""PCME uncertainty (log-sigma) heads.

Reference `src/networks/models/uncertainty_module.py` — attention-pooled
log-sigma estimators for probabilistic embeddings. The CreamFL pipeline
never instantiates them (the PCME configs run the deterministic path and
`pcme.py:50` emits ``logsigma=None``); ported for component completeness
so the probabilistic-embedding mode is available (sampling uses
``sample_gaussian_embeddings``).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from creamfl_tpu.models.pie import MultiHeadSelfAttention


class UncertaintyModule(nn.Module):
    """Shared image/text shape: attention over tokens + fc residual ->
    log-sigma vector [B, d_out]."""

    d_out: int
    d_hidden: int

    @nn.compact
    def __call__(self, pooled: jnp.ndarray, tokens: jnp.ndarray,
                 pad_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        residual, attn = MultiHeadSelfAttention(
            1, self.d_hidden, name="attention")(tokens, pad_mask)
        fc_out = nn.Dense(self.d_out,
                          kernel_init=nn.initializers.xavier_uniform(),
                          name="fc")(pooled)
        out = nn.Dense(self.d_out,
                       kernel_init=nn.initializers.xavier_uniform(),
                       name="embed")(residual) + fc_out
        return out  # logsigma


def sample_gaussian_embeddings(mu: jnp.ndarray, logsigma: jnp.ndarray,
                               n_samples: int, rng) -> jnp.ndarray:
    """[B, d] mu/logsigma -> [B, K, d] samples (reference
    tensor_utils.sample_gaussian_tensors)."""
    eps = jax.random.normal(rng, (mu.shape[0], n_samples, mu.shape[-1]),
                            mu.dtype)
    return mu[:, None, :] + eps * jnp.exp(logsigma)[:, None, :]
