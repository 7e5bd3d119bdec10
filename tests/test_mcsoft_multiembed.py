"""MC soft contrastive loss with K>1 multi-embeddings vs NumPy
(reference probemb.py:83-86 logsumexp over K^2 sample pairs)."""

import jax.numpy as jnp
import numpy as np

from creamfl_tpu.losses.mcsoft import (MCSoftContrastiveConfig,
                                       init_mcsoft_params,
                                       mcsoft_contrastive_loss)


def test_k3_matches_numpy(rng):
    n, k, d = 4, 3, 8
    img = rng.normal(size=(n, k, d)).astype(np.float32)
    txt = rng.normal(size=(n, k, d)).astype(np.float32)
    cfg = MCSoftContrastiveConfig(num_samples=k)
    params = init_mcsoft_params(cfg)
    loss, _ = mcsoft_contrastive_loss(params, jnp.asarray(img),
                                      jnp.asarray(txt), cfg)

    a = b = 15.0
    total = 0.0
    for i in range(n):
        for j in range(n):
            m = 1.0 if i == j else -1.0
            # K^2 sampled logits between (i, j).
            s = []
            for ki in range(k):
                for kj in range(k):
                    dd = np.sqrt(((img[i, ki] - txt[j, kj]) ** 2).sum()
                                 + 1e-6)
                    s.append(-a * dd + b)
            s = np.asarray(s)
            inner = s * m - np.logaddexp(s, -s)
            nll = np.log(k * k) - (np.max(inner) + np.log(
                np.exp(inner - np.max(inner)).sum()))
            total += nll
    np.testing.assert_allclose(float(loss), 2.0 * total, rtol=1e-4)
