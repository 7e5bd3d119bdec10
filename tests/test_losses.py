"""Golden tests for losses vs independent NumPy implementations of the
reference math (SURVEY.md §2.3)."""

import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from creamfl_tpu.losses import (
    MCSoftContrastiveConfig,
    cross_entropy,
    init_mcsoft_params,
    inter_modal_loss,
    intra_modal_moon_loss,
    margin_softmax_loss,
    mcsoft_contrastive_loss,
    weight_orthogonality_loss,
)


def test_cross_entropy_matches_torch(rng):
    logits = rng.normal(size=(16, 5)).astype(np.float32)
    labels = rng.integers(0, 5, size=(16,))
    ours = float(cross_entropy(jnp.asarray(logits), jnp.asarray(labels)))
    theirs = float(F.cross_entropy(torch.tensor(logits), torch.tensor(labels)))
    np.testing.assert_allclose(ours, theirs, rtol=1e-5)


def test_margin_softmax_matches_reference_math(rng):
    logits = rng.normal(size=(8, 10)).astype(np.float32)
    labels = rng.integers(0, 10, size=(8,))
    ours = float(margin_softmax_loss(jnp.asarray(logits), jnp.asarray(labels),
                                     margin=4.0))
    adj = logits - 4.0 * np.eye(10)[labels]
    theirs = float(F.cross_entropy(torch.tensor(adj), torch.tensor(labels)))
    np.testing.assert_allclose(ours, theirs, rtol=1e-5)


def test_weight_orthogonality_loss(rng):
    w = np.abs(rng.normal(size=(6, 12))).astype(np.float32)
    ours = float(weight_orthogonality_loss(jnp.asarray(w)))
    gram = torch.tensor(w) @ torch.tensor(w).T
    theirs = float(F.cross_entropy(gram, torch.arange(6)))
    np.testing.assert_allclose(ours, theirs, rtol=1e-5)


def test_mcsoft_matches_reference_math(rng):
    """Exact reference formula in NumPy: d=sqrt(||x-y||^2+1e-6),
    s=-a*d+b, nll=log(e^s+e^-s)-s*m, sum over N^2, doubled (two dirs)."""
    n, d = 7, 16
    img = rng.normal(size=(n, d)).astype(np.float32)
    txt = rng.normal(size=(n, d)).astype(np.float32)
    img /= np.linalg.norm(img, axis=1, keepdims=True)
    txt /= np.linalg.norm(txt, axis=1, keepdims=True)

    cfg = MCSoftContrastiveConfig()
    params = init_mcsoft_params(cfg)
    loss, ldict = mcsoft_contrastive_loss(params, jnp.asarray(img),
                                          jnp.asarray(txt), cfg)

    a, b = 15.0, 15.0
    dist = np.sqrt(((img[:, None, :] - txt[None, :, :]) ** 2).sum(-1) + 1e-6)
    s = -a * dist + b
    m = np.where(np.eye(n, dtype=bool), 1.0, -1.0)
    nll = np.logaddexp(s, -s) - s * m
    expected = 2.0 * nll.sum()
    np.testing.assert_allclose(float(loss), expected, rtol=1e-4)
    np.testing.assert_allclose(float(ldict["i2t_pos_loss"]),
                               nll[np.eye(n, dtype=bool)].sum(), rtol=1e-4)


def test_intra_modal_moon_matches_reference_math(rng):
    bs, d = 9, 32
    f = rng.normal(size=(bs, d)).astype(np.float32)
    tgt = rng.normal(size=(bs, d)).astype(np.float32)
    old = rng.normal(size=(bs, d)).astype(np.float32)
    ours = float(intra_modal_moon_loss(jnp.asarray(f), jnp.asarray(tgt),
                                       jnp.asarray(old), tau=0.5))
    pos = (f * tgt).sum(-1)[:, None]
    neg = (f * old).sum(-1)[:, None]
    logits = torch.tensor(np.concatenate([pos, neg], 1) / 0.5)
    theirs = float(F.cross_entropy(logits, torch.zeros(bs, dtype=torch.long)))
    np.testing.assert_allclose(ours, theirs, rtol=1e-5)


def test_combine_inter_intra_loss_scale(rng):
    """--loss_scale: inter term is ratio-normalized to the intra scale
    (ClientTrainer.py:419)."""
    from creamfl_tpu.losses import combine_inter_intra

    li = jnp.asarray(8.0)
    lm = jnp.asarray(2.0)
    plain = float(combine_inter_intra(lm, li, 0.5, False))
    np.testing.assert_allclose(plain, (2.0 + 8.0) * 0.5)
    scaled = float(combine_inter_intra(lm, li, 0.5, True))
    # inter / (inter/intra) == intra in value: (2 + 2) * 0.5
    np.testing.assert_allclose(scaled, 2.0)


def test_inter_modal_matches_reference_math(rng):
    bs, n, d = 5, 50, 16
    f = rng.normal(size=(bs, d)).astype(np.float32)
    g = rng.normal(size=(n, d)).astype(np.float32)
    idx = rng.integers(0, n, size=(bs,))
    ours = float(inter_modal_loss(jnp.asarray(f), jnp.asarray(g),
                                  jnp.asarray(idx), tau=0.5))
    logits = torch.tensor((f @ g.T) / 0.5)
    theirs = float(F.cross_entropy(logits, torch.tensor(idx)))
    np.testing.assert_allclose(ours, theirs, rtol=1e-5)


def test_margin_ce_masked_equals_bare():
    """Repeat-padded batch + valid mask == bare partial batch (the
    reference trains torch partial batches; we keep static shapes)."""
    import numpy as np

    from creamfl_tpu.losses.classification import margin_softmax_loss

    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.normal(size=(5, 7)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 7, size=(5,)), jnp.int32)
    bare = margin_softmax_loss(logits[:3], labels[:3])
    padded_logits = jnp.concatenate([logits[:3], logits[:2]])
    padded_labels = jnp.concatenate([labels[:3], labels[:2]])
    valid = jnp.asarray([1, 1, 1, 0, 0], jnp.float32)
    masked = margin_softmax_loss(padded_logits, padded_labels,
                                 valid=valid)
    np.testing.assert_allclose(float(masked), float(bare), rtol=1e-6)


def test_mcsoft_pair_mask_equals_bare():
    import numpy as np

    from creamfl_tpu.losses.mcsoft import (MCSoftContrastiveConfig,
                                           init_mcsoft_params,
                                           mcsoft_contrastive_loss)

    rng = np.random.default_rng(1)
    cfg = MCSoftContrastiveConfig()
    params = init_mcsoft_params(cfg)
    img = jnp.asarray(rng.normal(size=(6, 4)), jnp.float32)
    txt = jnp.asarray(rng.normal(size=(6, 4)), jnp.float32)
    bare, _ = mcsoft_contrastive_loss(params, img[:4], txt[:4], cfg)
    pad_img = jnp.concatenate([img[:4], img[:2]])
    pad_txt = jnp.concatenate([txt[:4], txt[:2]])
    valid = jnp.asarray([1, 1, 1, 1, 0, 0], jnp.float32)
    masked, _ = mcsoft_contrastive_loss(params, pad_img, pad_txt, cfg,
                                        valid=valid)
    np.testing.assert_allclose(float(masked), float(bare), rtol=1e-5)
