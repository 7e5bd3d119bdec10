"""Pallas gallery kernels vs XLA/NumPy references (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from creamfl_tpu.ops.gallery import gallery_cross_entropy
from creamfl_tpu.ops.pallas_gallery import (conw_diag_pallas,
                                            fused_gallery_ce,
                                            row_logsumexp)


@pytest.fixture(autouse=True)
def interpret_mode():
    with pltpu.force_tpu_interpret_mode():
        yield


def naive_lse(v, g, tau):
    logits = (v @ g.T) / tau
    m = logits.max(axis=1, keepdims=True)
    return (m + np.log(np.exp(logits - m).sum(1, keepdims=True)))[:, 0]


def test_row_logsumexp_matches_numpy(rng):
    m, n, d = 10, 300, 48
    v = rng.normal(size=(m, d)).astype(np.float32)
    g = rng.normal(size=(n, d)).astype(np.float32)
    got = np.asarray(row_logsumexp(jnp.asarray(v), jnp.asarray(g),
                                   tau=0.5, block_rows=8,
                                   block_cols=128))
    np.testing.assert_allclose(got, naive_lse(v, g, 0.5), rtol=1e-5)


def test_conw_diag_pallas_matches_numpy(rng):
    n, d = 70, 16
    v = rng.normal(size=(n, d)).astype(np.float32)
    g = rng.normal(size=(n, d)).astype(np.float32)
    got = np.asarray(conw_diag_pallas(jnp.asarray(v), jnp.asarray(g),
                                      block_rows=16, block_cols=64))
    logits = v @ g.T
    expected = np.diag(logits) - naive_lse(v, g, 1.0)
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


def test_fused_gallery_ce_matches_xla(rng):
    bs, n, d = 6, 150, 24
    f = rng.normal(size=(bs, d)).astype(np.float32)
    g = rng.normal(size=(n, d)).astype(np.float32)
    labels = rng.integers(0, n, size=(bs,))
    got = float(fused_gallery_ce(jnp.asarray(f), jnp.asarray(g),
                                 jnp.asarray(labels), 0.5))
    expected = float(gallery_cross_entropy(jnp.asarray(f), jnp.asarray(g),
                                           jnp.asarray(labels), tau=0.5))
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_fused_gallery_ce_grad_matches_xla(rng):
    bs, n, d = 4, 90, 16
    f = rng.normal(size=(bs, d)).astype(np.float32)
    g = rng.normal(size=(n, d)).astype(np.float32)
    labels = jnp.asarray(rng.integers(0, n, size=(bs,)))

    d_pl = jax.grad(lambda x: fused_gallery_ce(x, jnp.asarray(g), labels,
                                               0.5))(jnp.asarray(f))
    d_xla = jax.grad(lambda x: gallery_cross_entropy(
        x, jnp.asarray(g), labels, tau=0.5))(jnp.asarray(f))
    np.testing.assert_allclose(np.asarray(d_pl), np.asarray(d_xla),
                               rtol=2e-4, atol=1e-6)
