"""Full-geometry converter validation (VERDICT r4 next-step #5).

test_convert.py proves the torch->Flax weight mappings at tiny geometry
(2 layers / 32 dims); stride, padding, or name drift specific to the
REAL server shapes would slip through. Here the actual
``torchvision.models.resnet101`` and ``transformers.BertModel`` at
bert-base geometry (the models the reference loads at
`src/networks/models/image_encoder.py:24-32` / `pcme.py:31-33`) are
instantiated with random weights, converted via models/convert.py, and
must match the fp32 forward at the production geometry (224^2 images,
L=32 captions).
"""

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from creamfl_tpu.models.bert import BertConfig, BertEncoder
from creamfl_tpu.models.convert import (hf_bert_to_flax,
                                        torchvision_resnet_to_flax)
from creamfl_tpu.models.resnet import ResNetBackbone

pytestmark = pytest.mark.slow


def _torch_resnet101():
    """Real torchvision when present; otherwise the state_dict-compatible
    stub the round oracle uses (tests/ref_oracle_stubs.py:_TVResNet —
    identical naming/shapes/strides to torchvision resnet101)."""
    try:
        import torchvision

        return torchvision.models.resnet101(weights=None)
    except ImportError:
        from ref_oracle_stubs import _TVBottleneck, _TVResNet

        return _TVResNet(_TVBottleneck, [3, 4, 23, 3])


def test_resnet101_full_geometry_forward_parity():
    torch.manual_seed(0)
    tv = _torch_resnet101().eval()
    # Randomize BN running stats so the mean/var conversion is load-
    # bearing (fresh models carry the trivial mean=0/var=1).
    g = torch.Generator().manual_seed(1)
    for m in tv.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.copy_(
                torch.randn(m.running_mean.shape, generator=g) * 0.1)
            m.running_var.copy_(
                1.0 + 0.2 * torch.rand(m.running_var.shape, generator=g))
    sd = {k: v.detach().numpy() for k, v in tv.state_dict().items()}
    params, stats = torchvision_resnet_to_flax(sd)

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 224, 224, 3)).astype(np.float32)
    with torch.no_grad():
        t = torch.from_numpy(x.transpose(0, 3, 1, 2))
        # Grid features the image encoder consumes: everything up to
        # (not including) avgpool/fc, like the reference strips them
        # (image_encoder.py:24-32).
        h = tv.conv1(t)
        h = tv.maxpool(tv.relu(tv.bn1(h)))
        for stage in (tv.layer1, tv.layer2, tv.layer3, tv.layer4):
            h = stage(h)
        expected = h.numpy().transpose(0, 2, 3, 1)  # NCHW -> NHWC

    model = ResNetBackbone("resnet101")
    got = np.asarray(model.apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(x), False))
    assert got.shape == expected.shape == (2, 7, 7, 2048)
    # Random (untrained) kaiming weights at full depth grow activations
    # to ~1e3 and fp32 conv stacks accumulate ~1e-3 relative error;
    # scale atol to the activation magnitude. Structural drift
    # (stride/pad/name) produces relative errors >> 1.
    scale = float(np.std(expected))
    np.testing.assert_allclose(got, expected, rtol=5e-3,
                               atol=5e-3 * scale)


def test_bert_base_full_geometry_forward_parity():
    from transformers import BertConfig as HFConfig
    from transformers import BertModel

    hf_cfg = HFConfig(hidden_dropout_prob=0.0,
                      attention_probs_dropout_prob=0.0)  # bert-base
    torch.manual_seed(0)
    hf = BertModel(hf_cfg).eval()

    rng = np.random.default_rng(1)
    ids = rng.integers(1, hf_cfg.vocab_size, size=(2, 32)).astype(np.int64)
    mask = np.ones((2, 32), np.int64)
    mask[0, 20:] = 0
    with torch.no_grad():
        expected = hf(input_ids=torch.from_numpy(ids),
                      attention_mask=torch.from_numpy(mask)
                      ).last_hidden_state.numpy()

    enc = BertEncoder(BertConfig(dropout_rate=0.0))
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    params = hf_bert_to_flax(sd, num_layers=12)
    got = np.asarray(enc.apply({"params": params}, jnp.asarray(ids),
                               jnp.asarray(mask)))
    assert got.shape == expected.shape == (2, 32, 768)
    # Compare valid positions (pads are masked garbage both sides).
    np.testing.assert_allclose(got[1], expected[1], rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(got[0, :20], expected[0, :20], rtol=2e-3,
                               atol=2e-4)
