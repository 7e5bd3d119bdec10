"""Trajectory-level parity for the CLIENT engines vs torch twins of the
reference (VERDICT r2 task 5).

Covers what test_trajectory_parity.py (server) does not:
  * UniClientEngine task steps — margin CE + 0.5*orthogonality with the
    in-forward head ReLU clamp's exact grad semantics
    (`ClientTrainer.py:322-367`, `resnet_client.py:175-200`) + SGD
    (momentum 0.9, wd 5e-5);
  * UniClientEngine contrast steps — inter CE vs frozen other-modality
    globals + MOON intra vs the eval-mode old model, momentum state
    CONTINUING from the task epochs (`ClientTrainer.py:369-510`);
  * MMClientEngine local MCSoft step (`MMClientTrainer.py:116-142`).

The torch twins are hand-built from the reference's code, including the
subtle `.data`-swap clamp: grads reach the weight unmasked through the
logits path but relu-masked through the center loss.
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F

sys.path.insert(0, os.path.dirname(__file__))
from test_trajectory_parity import (TTrunk, _lin, _np)  # noqa: E402

from creamfl_tpu.engine.client_uni import UniClientEngine
from creamfl_tpu.models.convert import torchvision_resnet_to_flax

pytestmark = pytest.mark.slow  # resnet10 grads on the 1-core CPU host

B, IMG, E, C = 4, 32, 16, 10
N_PUB = 12


class TClientNet(tnn.Module):
    """Reference client ResNet (resnet_client.py:100-208) at resnet10
    depth: trunk -> avgpool -> *scale -> linear -> dual clamped heads;
    phase 'extract_conv_feature' returns the L2-normed feature."""

    def __init__(self):
        super().__init__()
        self.trunk = TTrunk()
        self.linear = tnn.Linear(512, E)
        self.class_fc_2 = tnn.Linear(E, C)
        self.class_fc_22 = tnn.Linear(E, 80)
        self.scale = 128
        self.phase = "none"
        self.is_train = True

    def forward(self, x):
        x = self.trunk(x)
        x = x.mean((2, 3))
        x = x * self.scale
        x = self.linear(x)
        if self.phase == "extract_conv_feature":
            return F.normalize(x, p=2, dim=1)
        if self.is_train:
            # Exact reference clamp semantics (resnet_client.py:192-199).
            fc_weight_relu = torch.relu(self.class_fc_2.weight)
            self.class_fc_2.weight.data = fc_weight_relu
            fc_weight_relu2 = torch.relu(self.class_fc_22.weight)
            self.class_fc_22.weight.data = fc_weight_relu2
            x1 = self.class_fc_2(x)
            x2 = self.class_fc_22(x)
            return x1, x2, fc_weight_relu, fc_weight_relu2
        return x


def _to_one_hot(y, n_dims):
    return F.one_hot(y, n_dims).float()


@pytest.fixture(scope="module")
def uni_setup():
    torch.manual_seed(11)
    rng = np.random.default_rng(11)
    images = rng.normal(size=(B, IMG, IMG, 3)).astype(np.float32) * 0.5
    labels = (np.arange(B) % C).astype(np.int32)
    pub_images = rng.normal(size=(N_PUB, IMG, IMG, 3)).astype(
        np.float32) * 0.5
    g_img = rng.normal(size=(N_PUB, E)).astype(np.float32)
    g_img /= np.linalg.norm(g_img, axis=1, keepdims=True)
    g_txt = rng.normal(size=(N_PUB, E)).astype(np.float32)
    g_txt /= np.linalg.norm(g_txt, axis=1, keepdims=True)

    tmodel = TClientNet()

    class _Args:
        img_model_local = "resnet10"
        feature_dim = E
        mlp_local = False
        interintra_weight = 0.5
        loss_scale = False

    engine = UniClientEngine("img", num_class=C, args=_Args())
    state = engine.init_state(jax.random.PRNGKey(0),
                              {"images": images, "labels": labels})
    trunk, stats = torchvision_resnet_to_flax(
        {k: _np(v) for k, v in tmodel.trunk.state_dict().items()})
    params = {
        "backbone": jax.tree.map(jnp.asarray, trunk),
        "linear": _lin(tmodel.linear),
        "class_fc": _lin(tmodel.class_fc_2),
        "class_fc_2": _lin(tmodel.class_fc_22),
    }
    assert (jax.tree.map(lambda x: x.shape, state.params)
            == jax.tree.map(lambda x: x.shape, params))
    state = state.replace(
        params=params,
        batch_stats={"backbone": jax.tree.map(jnp.asarray, stats)})
    state = state.replace(opt_state=engine.tx.init(state.params))
    state = engine.set_round_lr(state, 0)
    return (engine, state, tmodel, images, labels, pub_images, g_img,
            g_txt)


def _flax_linear_weight(params, name):
    return np.asarray(params[name]["kernel"]).T


@pytest.fixture(scope="module")
def uni_trajectories(uni_setup):
    (engine, state, tmodel, images, labels, pub_images, g_img,
     g_txt) = uni_setup
    lr = 1e-4

    # ---- torch: 5 task steps, then old snapshot + 5 contrast steps ----
    import copy

    timages = torch.tensor(images).permute(0, 3, 1, 2).contiguous()
    tlabels = torch.tensor(labels.astype(np.int64))
    opt = torch.optim.SGD(tmodel.parameters(), lr=lr, momentum=0.9,
                          weight_decay=5e-5)
    crit = tnn.CrossEntropyLoss()
    center_labels = torch.arange(C)

    # Reference run(): old snapshot BEFORE the epochs, eval mode.
    old_model = copy.deepcopy(tmodel)
    old_model.eval()
    old_model.phase = "extract_conv_feature"
    old_model.is_train = False

    t_task_losses = []
    tmodel.train()
    tmodel.phase = "none"
    tmodel.is_train = True
    for _ in range(5):
        opt.zero_grad()
        fvec, _, class_weight, _ = tmodel(timages)
        fvec = fvec - 4.0 * _to_one_hot(tlabels, C)
        loss = crit(fvec, tlabels)
        center = crit(class_weight @ class_weight.t(), center_labels)
        total = 0.5 * center + loss
        total.backward()
        opt.step()
        t_task_losses.append(float(total))

    tmodel.phase = "extract_conv_feature"
    tmodel.is_train = False
    tpub = torch.tensor(pub_images).permute(0, 3, 1, 2).contiguous()
    tg_img = torch.tensor(g_img)
    tg_txt = torch.tensor(g_txt)
    d_idx = torch.arange(B)  # first B rows of the public set per step
    t_contrast_losses = []
    for _ in range(5):
        opt.zero_grad()
        f = tmodel(tpub[:B])
        target = tg_img[d_idx]
        with torch.no_grad():
            old_f = old_model(tpub[:B])
        logits_inter = (f @ tg_txt.t()) / 0.5
        loss_inter = crit(logits_inter, d_idx)
        pos = (f * target).sum(-1).reshape(-1, 1)
        neg = (f * old_f).sum(-1).reshape(-1, 1)
        logits = torch.cat((pos, neg), dim=1) / 0.5
        loss_moon = crit(logits, torch.zeros(B, dtype=torch.long))
        loss = (loss_moon + loss_inter) * 0.5
        loss.backward()
        opt.step()
        t_contrast_losses.append(float(loss))

    # ---- JAX engine: same schedule ------------------------------------
    old_params = state.params
    old_bs = state.batch_stats
    batch = {"images": jnp.asarray(images), "labels": jnp.asarray(labels)}
    j_task_losses = []
    for _ in range(5):
        state, metrics = engine.task_step(state, batch)
        j_task_losses.append(float(metrics["loss"]))

    pub_batch = {"images": jnp.asarray(pub_images[:B])}
    globals_ = {"same": jnp.asarray(g_img), "other": jnp.asarray(g_txt),
                "index": jnp.arange(B, dtype=jnp.int32)}
    j_contrast_losses = []
    for _ in range(5):
        state, loss = engine.contrast_step(state, old_params, old_bs,
                                           pub_batch, globals_, True,
                                           True)
        j_contrast_losses.append(float(loss))

    return (tmodel, state, t_task_losses, j_task_losses,
            t_contrast_losses, j_contrast_losses)


def test_uni_task_loss_trajectory(uni_trajectories):
    _, _, t_losses, j_losses, _, _ = uni_trajectories
    np.testing.assert_allclose(j_losses, t_losses, rtol=2e-4)
    # The trajectory moved (not a frozen no-op).
    assert abs(t_losses[0] - t_losses[-1]) > 1e-6


def test_uni_contrast_loss_trajectory(uni_trajectories):
    _, _, _, _, t_losses, j_losses = uni_trajectories
    np.testing.assert_allclose(j_losses, t_losses, rtol=5e-4)


def test_uni_final_params_match(uni_trajectories):
    tmodel, state, *_ = uni_trajectories
    np.testing.assert_allclose(
        _flax_linear_weight(state.params, "linear"),
        _np(tmodel.linear.weight), rtol=1e-3, atol=2e-6)
    # Heads froze during the contrast epochs (torch grad=None skip), so
    # both sides hold the last task step's post-clamp post-update value.
    np.testing.assert_allclose(
        _flax_linear_weight(state.params, "class_fc"),
        _np(tmodel.class_fc_2.weight), rtol=1e-3, atol=2e-6)
    np.testing.assert_allclose(
        np.asarray(state.params["class_fc"]["bias"]),
        _np(tmodel.class_fc_2.bias), rtol=1e-3, atol=2e-6)


def test_mm_local_step_trajectory():
    """MMClientEngine.local_step vs the torch PCME+MCSoft+AdamP twin
    from test_trajectory_parity (MMClientTrainer.py:116-142: forward ->
    criterion -> clip(2) -> AdamP step)."""
    from test_trajectory_parity import (TModel, TCriterion, TorchAdamP,
                                        _gru, _pie, B as SB, IMG as SIMG,
                                        L as SL, V as SV, E as SE)

    from creamfl_tpu.config import default_config_path, parse_config
    from creamfl_tpu.engine.client_mm import MMClientEngine

    torch.manual_seed(23)
    rng = np.random.default_rng(23)
    images = rng.normal(size=(SB, SIMG, SIMG, 3)).astype(np.float32)
    captions = rng.integers(1, SV, size=(SB, SL)).astype(np.int32)
    lengths = np.array([SL, 7, 5, 9, 3, 6], np.int32)
    captions[np.arange(SL)[None, :] >= lengths[:, None]] = 0

    tmodel = TModel()
    tcrit = TCriterion()

    cfg = parse_config(default_config_path("f30k.yaml"),
                       strict_cast=False)
    cfg.model.embed_dim = SE
    cfg.model.cnn_type = "resnet10"
    cfg.model.word_dim = 12
    cfg.train.use_bf16 = False  # fp32 for exact-parity comparison

    class _Args:
        interintra_weight = 0.5
        loss_scale = False

    engine = MMClientEngine(cfg, vocab_size=SV, args=_Args())
    lr = float(cfg.optimizer.learning_rate)
    sample = {"images": images, "captions": captions, "lengths": lengths}
    state = engine.init_state(jax.random.PRNGKey(0), sample)
    trunk, stats = torchvision_resnet_to_flax(
        {k: _np(v) for k, v in tmodel.cnn.state_dict().items()})
    params = {
        "model": {
            "img_enc": {"cnn": jax.tree.map(jnp.asarray, trunk),
                        "fc": _lin(tmodel.fc),
                        "pie_net": _pie(tmodel.pie_i)},
            "txt_enc": {"embed": {"embedding": jnp.asarray(
                            _np(tmodel.embed.weight))},
                        "rnn": _gru(tmodel.rnn),
                        "pie_net": _pie(tmodel.pie_t)},
        },
        "criterion": {"shift": jnp.asarray([15.0]),
                      "negative_scale": jnp.asarray([15.0])},
    }
    assert (jax.tree.map(lambda x: x.shape, state.params)
            == jax.tree.map(lambda x: x.shape, params))
    state = state.replace(
        params=params,
        batch_stats={"img_enc": {"cnn": jax.tree.map(jnp.asarray,
                                                     stats)}})
    state = state.replace(opt_state=engine.tx.init(state.params))

    timages = torch.tensor(images).permute(0, 3, 1, 2).contiguous()
    tcaptions = torch.tensor(captions.astype(np.int64))
    tlengths = torch.tensor(lengths.astype(np.int64))
    model_params = list(tmodel.parameters())
    opt = TorchAdamP(model_params + list(tcrit.parameters()), lr=lr)
    tmodel.train()
    t_losses = []
    for _ in range(3):
        opt.zero_grad()
        img_f, txt_f = tmodel(timages, tcaptions, tlengths)
        loss = tcrit(img_f, txt_f)
        loss.backward()
        torch.nn.utils.clip_grad_norm_(model_params, 2.0)
        opt.step()
        t_losses.append(float(loss))

    batch = {"images": jnp.asarray(images),
             "captions": jnp.asarray(captions),
             "lengths": jnp.asarray(lengths)}
    j_losses = []
    for i in range(3):
        state, ldict = engine.local_step(state, batch,
                                         jax.random.PRNGKey(i))
        j_losses.append(float(ldict["loss"]))

    np.testing.assert_allclose(j_losses, t_losses, rtol=2e-4)
