"""Weight-converter tests.

BERT: full forward parity against a randomly-initialized torch
``transformers.BertModel`` (tiny config, no downloads). ResNet: mapping
shape-compatibility against our Flax init tree. GloVe: text-file load
with the hit-rate fallback.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from creamfl_tpu.models.bert import BertConfig, BertEncoder
from creamfl_tpu.models.convert import (hf_bert_to_flax,
                                        load_glove_embeddings,
                                        torchvision_resnet_to_flax)
from creamfl_tpu.models.resnet import ResNetBackbone
from creamfl_tpu.data.vocab import Vocabulary


def test_bert_forward_parity_with_transformers(key):
    from transformers import BertConfig as HFConfig
    from transformers import BertModel

    hf_cfg = HFConfig(vocab_size=100, hidden_size=32,
                      num_hidden_layers=2, num_attention_heads=2,
                      intermediate_size=64, max_position_embeddings=24,
                      hidden_dropout_prob=0.0,
                      attention_probs_dropout_prob=0.0)
    torch.manual_seed(0)
    hf = BertModel(hf_cfg).eval()

    ids = np.array([[2, 5, 9, 11, 0, 0], [3, 4, 5, 6, 7, 8]])
    mask = np.array([[1, 1, 1, 1, 0, 0], [1] * 6])
    with torch.no_grad():
        expected = hf(input_ids=torch.tensor(ids),
                      attention_mask=torch.tensor(mask)
                      ).last_hidden_state.numpy()

    cfg = BertConfig(vocab_size=100, hidden_size=32, num_layers=2,
                     num_heads=2, intermediate_size=64, max_position=24,
                     dropout_rate=0.0)
    enc = BertEncoder(cfg)
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    params = hf_bert_to_flax(sd, num_layers=2)
    got = np.asarray(enc.apply({"params": params}, jnp.asarray(ids),
                               jnp.asarray(mask)))
    # Valid (unmasked) positions must match; HF computes garbage-but-
    # masked values at pads too, ours equally — compare only valid.
    np.testing.assert_allclose(got[1], expected[1], rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(got[0, :4], expected[0, :4], rtol=2e-4,
                               atol=2e-5)


def _fake_torchvision_resnet18_sd():
    """Random state_dict with torchvision resnet18 naming/shapes."""
    sd = {}

    def conv(name, o, i, k, s=1):
        sd[name + ".weight"] = np.random.randn(o, i, k, k).astype(
            np.float32) * 0.05

    def bn(name, c):
        sd[name + ".weight"] = np.ones((c,), np.float32)
        sd[name + ".bias"] = np.zeros((c,), np.float32)
        sd[name + ".running_mean"] = np.zeros((c,), np.float32)
        sd[name + ".running_var"] = np.ones((c,), np.float32)

    conv("conv1", 64, 3, 7)
    bn("bn1", 64)
    channels = [64, 128, 256, 512]
    for stage in range(4):
        c = channels[stage]
        c_in = channels[stage - 1] if stage else 64
        for block in range(2):
            p = f"layer{stage + 1}.{block}"
            first_in = c_in if block == 0 else c
            conv(f"{p}.conv1", c, first_in, 3)
            bn(f"{p}.bn1", c)
            conv(f"{p}.conv2", c, c, 3)
            bn(f"{p}.bn2", c)
            if block == 0 and stage > 0:
                conv(f"{p}.downsample.0", c, c_in, 1)
                bn(f"{p}.downsample.1", c)
    return sd


def test_resnet18_conversion_loads_into_flax(key):
    np.random.seed(0)
    sd = _fake_torchvision_resnet18_sd()
    params, stats = torchvision_resnet_to_flax(sd)

    model = ResNetBackbone("resnet18")
    ref = model.init(key, jnp.zeros((1, 64, 64, 3)), False)
    ref_shapes = jax.tree.map(lambda x: x.shape, ref["params"])
    got_shapes = jax.tree.map(lambda x: np.asarray(x).shape, params)
    assert ref_shapes == got_shapes
    # Forward runs with the ported tree.
    out = model.apply({"params": params, "batch_stats": stats},
                      jnp.ones((1, 64, 64, 3)), False)
    assert out.shape == (1, 2, 2, 512)
    assert np.isfinite(np.asarray(out)).all()


def test_glove_loading_with_fallback(tmp_path):
    vocab = Vocabulary()
    for t in ("<pad>", "<start>", "<end>", "<unk>"):
        vocab.add_word(t)
    for w in ("cat", "well-lit", "u.s", "dog"):
        vocab.add_word(w)
    path = tmp_path / "glove.txt"
    path.write_text(
        "cat " + " ".join(["0.5"] * 4) + "\n"
        "welllit " + " ".join(["0.25"] * 4) + "\n"
        "us " + " ".join(["0.75"] * 4) + "\n")
    mat, missing = load_glove_embeddings(str(path), vocab, word_dim=4)
    np.testing.assert_allclose(mat[vocab("cat")], 0.5)
    np.testing.assert_allclose(mat[vocab("well-lit")], 0.25)  # fallback
    np.testing.assert_allclose(mat[vocab("u.s")], 0.75)  # strip '.'
    assert missing == 5  # 4 specials + 'dog'
