"""Golden tests for the streamed gallery ops against naive NumPy."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from creamfl_tpu.ops import (
    gallery_cross_entropy,
    gallery_log_softmax_diag,
    l2_normalize,
    streaming_logsumexp,
)


def naive_lse(v, g, tau):
    logits = (v @ g.T) / tau
    m = logits.max(axis=1, keepdims=True)
    return (m + np.log(np.exp(logits - m).sum(axis=1, keepdims=True)))[:, 0]


def test_l2_normalize(rng):
    x = rng.normal(size=(4, 7)).astype(np.float32)
    out = np.asarray(l2_normalize(jnp.asarray(x)))
    np.testing.assert_allclose(np.linalg.norm(out, axis=1), 1.0, rtol=1e-5)
    np.testing.assert_allclose(out, x / np.linalg.norm(x, axis=1, keepdims=True),
                               rtol=1e-5)
    zero = np.asarray(l2_normalize(jnp.zeros((2, 3))))
    assert np.all(np.isfinite(zero))


@pytest.mark.parametrize("tau", [1.0, 0.5])
@pytest.mark.parametrize("n,col_block", [(100, 32), (64, 64), (37, 128)])
def test_streaming_logsumexp(rng, tau, n, col_block):
    v = rng.normal(size=(9, 16)).astype(np.float32)
    g = rng.normal(size=(n, 16)).astype(np.float32)
    got = np.asarray(streaming_logsumexp(jnp.asarray(v), jnp.asarray(g),
                                         tau=tau, col_block=col_block))
    np.testing.assert_allclose(got, naive_lse(v, g, tau), rtol=1e-5)


def test_gallery_log_softmax_diag(rng):
    n, d = 130, 8
    v = rng.normal(size=(n, d)).astype(np.float32)
    g = rng.normal(size=(n, d)).astype(np.float32)
    got = np.asarray(gallery_log_softmax_diag(jnp.asarray(v), jnp.asarray(g),
                                              row_block=32, col_block=64))
    logits = v @ g.T
    expected = np.diag(logits) - naive_lse(v, g, 1.0)
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("blockwise", [False, True])
def test_gallery_cross_entropy_value(rng, blockwise):
    bs, n, d = 10, 90, 12
    f = rng.normal(size=(bs, d)).astype(np.float32)
    g = rng.normal(size=(n, d)).astype(np.float32)
    labels = rng.integers(0, n, size=(bs,))
    got = float(gallery_cross_entropy(jnp.asarray(f), jnp.asarray(g),
                                      jnp.asarray(labels), tau=0.5,
                                      blockwise=blockwise, col_block=32))
    logits = (f @ g.T) / 0.5
    lse = naive_lse(f, g, 0.5)
    expected = float(np.mean(lse - logits[np.arange(bs), labels]))
    np.testing.assert_allclose(got, expected, rtol=1e-5)


@pytest.mark.parametrize("blockwise", [False, True])
def test_gallery_cross_entropy_grad(rng, blockwise):
    """Gradient wrt feats matches the dense formula; gallery gets no grad."""
    bs, n, d = 6, 40, 8
    f = rng.normal(size=(bs, d)).astype(np.float32)
    g = rng.normal(size=(n, d)).astype(np.float32)
    labels = rng.integers(0, n, size=(bs,))

    def loss(f_, g_):
        return gallery_cross_entropy(f_, g_, jnp.asarray(labels), tau=0.5,
                                     blockwise=blockwise, col_block=16)

    df, dg = jax.grad(loss, argnums=(0, 1))(jnp.asarray(f), jnp.asarray(g))
    logits = (f @ g.T) / 0.5
    p = np.exp(logits - logits.max(1, keepdims=True))
    p /= p.sum(1, keepdims=True)
    onehot = np.eye(n)[labels]
    expected_df = ((p - onehot) @ g) / (0.5 * bs)
    np.testing.assert_allclose(np.asarray(df), expected_df, rtol=2e-4,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(dg), 0.0, atol=1e-7)
