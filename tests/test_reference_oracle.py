"""Parity against the REFERENCE'S OWN torch modules (VERDICT r2 task 4).

The builder-authored torch twins (test_trajectory_parity.py) could share
a misreading with the port; these tests import the reference's actual
code — `src/criterions/probemb.py` (MCSoftContrastiveLoss,
batchwise_cdist, match_prob), `src/networks/models/pie_model.py`
(PIENet), and `src/algorithms/eval_coco.py` (evaluate_recall +
ParallelMatMulModule) — and assert forward values, input gradients, and
retrieval scores match. The modules need only numpy+torch(+tqdm), all
present in this env. Skipped wholesale when /root/reference is absent.
"""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference tree absent")

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def ref_modules():
    sys.path.insert(0, REF)
    import importlib.util

    def load(name, rel):
        spec = importlib.util.spec_from_file_location(
            name, os.path.join(REF, rel))
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod

    probemb = load("ref_probemb", "src/criterions/probemb.py")
    pie = load("ref_pie", "src/networks/models/pie_model.py")
    eval_coco = load("ref_eval_coco", "src/algorithms/eval_coco.py")
    return probemb, pie, eval_coco


class _CritConfig:
    """Shim for the munch config MCSoftContrastiveLoss expects."""

    init_shift = 15.0
    init_negative_scale = 15.0
    num_samples = 1

    def get(self, key, default=None):
        return getattr(self, key, default)


def _rand_feats(rng, n, k, d):
    x = rng.standard_normal((n, k, d)).astype(np.float32)
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


@pytest.mark.parametrize("k", [1, 3])
def test_mcsoft_forward_and_grads_match_reference(ref_modules, k):
    import jax
    import jax.numpy as jnp

    from creamfl_tpu.losses.mcsoft import (MCSoftContrastiveConfig,
                                           init_mcsoft_params,
                                           mcsoft_contrastive_loss)

    probemb, _, _ = ref_modules
    rng = np.random.default_rng(0)
    n, d = 7, 16
    img = _rand_feats(rng, n, k, d)
    txt = _rand_feats(rng, n, k, d)

    # --- reference forward + input grads -------------------------------
    crit = probemb.MCSoftContrastiveLoss(_CritConfig())
    t_img = torch.tensor(img, requires_grad=True)
    t_txt = torch.tensor(txt, requires_grad=True)
    ref_loss, ref_dict = crit(t_img, t_txt, None, None)
    ref_loss.backward()

    # --- ours ----------------------------------------------------------
    cfg = MCSoftContrastiveConfig()
    params = init_mcsoft_params(cfg)

    def loss_fn(i, t):
        return mcsoft_contrastive_loss(params, i, t, cfg)[0]

    ours, grads = jax.value_and_grad(loss_fn, argnums=(0, 1))(
        jnp.asarray(img), jnp.asarray(txt))

    np.testing.assert_allclose(float(ours), float(ref_loss.item()),
                               rtol=2e-5)
    np.testing.assert_allclose(np.asarray(grads[0]),
                               t_img.grad.numpy(), rtol=2e-4, atol=2e-6)
    np.testing.assert_allclose(np.asarray(grads[1]),
                               t_txt.grad.numpy(), rtol=2e-4, atol=2e-6)
    # Learnable-scalar grads too (they train in the server step).
    shift_g = jax.grad(
        lambda p: mcsoft_contrastive_loss(p, jnp.asarray(img),
                                          jnp.asarray(txt), cfg)[0]
    )(params)
    crit.zero_grad()
    loss2, _ = crit(torch.tensor(img), torch.tensor(txt), None, None)
    loss2.backward()
    np.testing.assert_allclose(np.asarray(shift_g["shift"]),
                               crit.shift.grad.numpy(), rtol=2e-4)
    np.testing.assert_allclose(np.asarray(shift_g["negative_scale"]),
                               crit.negative_scale.grad.numpy(),
                               rtol=2e-4)


def test_match_prob_matches_reference(ref_modules):
    import jax.numpy as jnp

    from creamfl_tpu.losses.mcsoft import (MCSoftContrastiveConfig,
                                           init_mcsoft_params, match_prob)

    probemb, _, _ = ref_modules
    rng = np.random.default_rng(1)
    q = _rand_feats(rng, 5, 1, 8)
    g = _rand_feats(rng, 5, 1, 8)
    crit = probemb.MCSoftContrastiveLoss(_CritConfig())
    # Reference signature is PAIRWISE: [N,K,D] vs [N,K,D] -> [N] probs
    # of the aligned pairs (probemb.py:204-219); ours is the full
    # query-x-gallery matrix — the aligned pairs are its diagonal.
    ref = crit.match_prob(torch.tensor(q), torch.tensor(g), None, None)
    ours = match_prob(init_mcsoft_params(MCSoftContrastiveConfig()),
                      jnp.asarray(q)[:, 0], jnp.asarray(g)[:, 0])
    np.testing.assert_allclose(np.diag(np.asarray(ours)),
                               ref.detach().numpy().ravel(), rtol=2e-5)


@pytest.mark.parametrize("n_embeds,masked", [(1, False), (1, True),
                                             (2, False)])
def test_pienet_matches_reference(ref_modules, n_embeds, masked):
    import jax
    import jax.numpy as jnp

    from creamfl_tpu.models.pie import PIENet

    _, pie, _ = ref_modules
    torch.manual_seed(3)
    b, L, d_in, d_out, d_h = 4, 6, 10, 10, 12
    ref_net = pie.PIENet(n_embeds, d_in, d_out, d_h).eval()

    rng = np.random.default_rng(3)
    out_in = rng.standard_normal((b, d_out)).astype(np.float32)
    x = rng.standard_normal((b, L, d_in)).astype(np.float32)
    pad = np.zeros((b, L), bool)
    if masked:
        pad[:, 4:] = True  # True at padding positions

    ours = PIENet(n_embeds=n_embeds, d_out=d_out, d_hidden=d_h)
    # Graft the reference's torch weights into the flax params.
    sd = ref_net.state_dict()
    params = {
        "attention": {
            "w_1": {"kernel": jnp.asarray(sd["attention.w_1.weight"]
                                          .numpy().T)},
            "w_2": {"kernel": jnp.asarray(sd["attention.w_2.weight"]
                                          .numpy().T)},
        },
        "fc": {"kernel": jnp.asarray(sd["fc.weight"].numpy().T),
               "bias": jnp.asarray(sd["fc.bias"].numpy())},
        "layer_norm": {"scale": jnp.asarray(sd["layer_norm.weight"]
                                            .numpy()),
                       "bias": jnp.asarray(sd["layer_norm.bias"]
                                           .numpy())},
    }

    t_out = torch.tensor(out_in, requires_grad=True)
    t_x = torch.tensor(x, requires_grad=True)
    ref_o, ref_attn, ref_res = ref_net(
        t_out, t_x, torch.tensor(pad) if masked else None)
    ref_o.sum().backward()

    def fwd(o, xx):
        res = ours.apply({"params": params}, o, xx,
                         jnp.asarray(pad) if masked else None)
        return res[0]

    our_o = fwd(jnp.asarray(out_in), jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(our_o),
                               ref_o.detach().numpy(), rtol=2e-4,
                               atol=2e-5)
    go, gx = jax.grad(lambda o, xx: fwd(o, xx).sum(), argnums=(0, 1))(
        jnp.asarray(out_in), jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(go), t_out.grad.numpy(),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(gx), t_x.grad.numpy(),
                               rtol=2e-4, atol=2e-5)


def test_evaluate_recall_matches_reference(ref_modules):
    """Reference evaluate_recall (ParallelMatMulModule ranking) vs
    RetrievalEvaluator on the same random features/labels."""
    from creamfl_tpu.engine.evaluator import RetrievalEvaluator

    _, _, eval_coco = ref_modules
    rng = np.random.default_rng(7)
    n_img, n_cap, d = 30, 60, 8
    g = _rand_feats(rng, n_img, 1, d)[:, 0]       # gallery: images
    q = _rand_feats(rng, n_cap, 1, d)[:, 0]       # queries: captions
    q_labels = np.arange(n_cap) % n_img           # caption -> image
    g_labels = np.arange(n_img)

    ref_ev = eval_coco.COCOEvaluator(eval_method="matmul",
                                     extract_device="cpu",
                                     eval_device="cpu")

    class _Stub:
        n_embeddings = 1
        embed_dim = d

    ref_ev.set_model(_Stub())
    ref_scores = ref_ev.evaluate_recall(
        torch.tensor(q), torch.tensor(g),
        q_labels, g_labels, batch_size=16)

    ours = RetrievalEvaluator().evaluate_recall(q, g, q_labels, g_labels)
    for key in ("recall_1", "recall_5", "recall_10", "rsum", "medr",
                "meanr"):
        assert ours[key] == pytest.approx(ref_scores[key]), key
