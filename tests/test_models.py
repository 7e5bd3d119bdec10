"""Shape/behavior tests for the model zoo on tiny inputs."""

import flax
import jax
import jax.numpy as jnp
import numpy as np

from creamfl_tpu.models import (
    PCME,
    BertConfig,
    BertEncoder,
    ImageClientNet,
    PIENet,
    ResNetBackbone,
    TextClientNet,
    clamp_head_weights,
)
from creamfl_tpu.models.pcme import TextEncoderGRU


def test_resnet_backbone_grid_shape(key):
    model = ResNetBackbone("resnet18")
    x = jnp.zeros((2, 64, 64, 3))
    variables = model.init(key, x, False)
    grid, _ = model.apply(variables, x, True,
                          mutable=["batch_stats"])
    assert grid.shape == (2, 2, 2, 512)


def test_s2d_stem_matches_conv7(key):
    """The space-to-depth stem is math-identical to conv 7x7/s2/p3 for
    the SAME canonical [7,7,3,64] kernel (resnet.py:_s2d_stem)."""
    model_fast = ResNetBackbone("resnet10", stem="s2d")
    model_ref = ResNetBackbone("resnet10", stem="conv7")
    x = jax.random.normal(key, (2, 32, 32, 3))
    variables = model_ref.init(key, x, False)
    # Same param tree works for both stems (path conv1/kernel, [7,7,3,64]).
    g_ref = model_ref.apply(variables, x, False)
    g_fast = model_fast.apply(variables, x, False)
    np.testing.assert_allclose(np.asarray(g_fast), np.asarray(g_ref),
                               rtol=2e-5, atol=2e-5)
    # Odd spatial sizes fall back to the plain conv stem.
    x_odd = jax.random.normal(key, (2, 33, 33, 3))
    v_odd = model_fast.init(key, x_odd, False)
    assert v_odd["params"]["conv1"]["kernel"].shape == (7, 7, 3, 64)


def test_resnet_bottleneck_dim(key):
    model = ResNetBackbone("resnet50")
    x = jnp.zeros((1, 64, 64, 3))
    variables = model.init(key, x, False)
    grid = model.apply(variables, x, False)
    assert grid.shape == (1, 2, 2, 2048)


def test_pienet_masked_attention_ignores_pads(key):
    pie = PIENet(n_embeds=1, d_out=16, d_hidden=8)
    b, l, d = 2, 6, 10
    out = jnp.ones((b, 16))
    x = jax.random.normal(key, (b, l, d))
    mask = jnp.asarray([[False] * 3 + [True] * 3, [False] * 6])
    variables = pie.init(key, out, x, mask)

    # Changing padded positions must not change the output of row 0.
    x2 = x.at[0, 4].set(100.0)
    y1, _, _ = pie.apply(variables, out, x, mask)
    y2, _, _ = pie.apply(variables, out, x2, mask)
    np.testing.assert_allclose(np.asarray(y1[0]), np.asarray(y2[0]),
                               atol=1e-5)
    # Row 1 has no padding: changing its content must change its output.
    x3 = x.at[1, 4].set(100.0)
    y3, _, _ = pie.apply(variables, out, x3, mask)
    assert not np.allclose(np.asarray(y1[1]), np.asarray(y3[1]))


def test_text_encoder_gru_shapes_and_norm(key):
    enc = TextEncoderGRU(vocab_size=50, embed_dim=32, word_dim=12)
    caps = jnp.asarray([[1, 2, 3, 0, 0], [4, 5, 6, 7, 8]])
    lens = jnp.asarray([3, 5])
    variables = enc.init(key, caps, lens)
    out = enc.apply(variables, caps, lens)
    assert out["embedding"].shape == (2, 32)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(out["embedding"]), axis=1), 1.0, rtol=1e-5)


def test_bert_encoder_tiny(key):
    cfg = BertConfig.tiny()
    enc = BertEncoder(cfg)
    ids = jnp.ones((2, 10), jnp.int32)
    mask = jnp.asarray([[1] * 6 + [0] * 4, [1] * 10])
    variables = enc.init(key, ids, mask)
    h = enc.apply(variables, ids, mask)
    assert h.shape == (2, 10, cfg.hidden_size)
    # Masked positions must not affect the CLS state.
    ids2 = ids.at[0, 8].set(5)
    h2 = enc.apply(variables, ids2, mask)
    np.testing.assert_allclose(np.asarray(h[0, 0]), np.asarray(h2[0, 0]),
                               atol=1e-5)


def test_pcme_gru_end_to_end(key):
    model = PCME(embed_dim=16, cnn_type="resnet10", vocab_size=50,
                 word_dim=12, not_bert=True)
    images = jnp.zeros((2, 64, 64, 3))
    caps = jnp.asarray([[1, 2, 3, 0], [4, 5, 6, 7]])
    lens = jnp.asarray([3, 4])
    variables = model.init(key, images, caps, lens)
    out, _ = model.apply(variables, images, caps, lens, train=True,
                         mutable=["batch_stats"],
                         rngs={"dropout": key})
    assert out["image_features"].shape == (2, 16)
    assert out["caption_features"].shape == (2, 16)


def test_image_client_phases_and_clamp(key):
    model = ImageClientNet(cnn_type="resnet10", num_class=7, embed_dim=24)
    x = jnp.zeros((2, 64, 64, 3))
    variables = model.init(key, x, False, "train")

    x1, x2, w1, w2 = model.apply(variables, x, False, "train")
    assert x1.shape == (2, 7) and x2.shape == (2, 80)
    assert w1.shape == (7, 24) and w2.shape == (80, 24)

    feats = model.apply(variables, x, False, "features")
    assert feats.shape == (2, 24)

    clamped = flax.core.freeze(
        {"params": clamp_head_weights(dict(variables["params"])),
         "batch_stats": variables["batch_stats"]})
    _, _, w1c, _ = model.apply(clamped, x, False, "train")
    assert np.all(np.asarray(w1c) >= 0)


def test_text_client_phases(key):
    model = TextClientNet(vocab_size=40, num_class=4, embed_dim=16,
                          word_dim=10)
    caps = jnp.asarray([[1, 2, 0], [3, 4, 5]])
    lens = jnp.asarray([2, 3])
    variables = model.init(key, caps, lens, False, "train")
    x1, x2, w1, w2 = model.apply(variables, caps, lens, False, "train")
    assert x1.shape == (2, 4) and x2.shape == (2, 80)
    feats = model.apply(variables, caps, lens, False, "features")
    np.testing.assert_allclose(np.linalg.norm(np.asarray(feats), axis=1),
                               1.0, rtol=1e-5)
