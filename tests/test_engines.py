"""Engine integration tests on minuscule shapes (single jitted steps)."""

import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from creamfl_tpu.config import default_config_path, parse_config
from creamfl_tpu.engine.client_uni import UniClientEngine
from creamfl_tpu.engine.server import ServerEngine


def _args(**kw):
    base = dict(img_model_local="resnet10", feature_dim=16,
                mlp_local=False, interintra_weight=0.5, loss_scale=False)
    base.update(kw)
    return types.SimpleNamespace(**base)


@pytest.fixture(scope="module")
def txt_engine():
    return UniClientEngine("txt", num_class=4, args=_args(), vocab_size=30)


@pytest.fixture(scope="module")
def txt_state(txt_engine):
    batch = {"captions": np.ones((4, 6), np.int32),
             "lengths": np.full((4,), 6, np.int32),
             "labels": np.zeros((4,), np.int32)}
    return txt_engine.init_state(jax.random.PRNGKey(0), batch), batch


def test_uni_task_step_clamps_and_learns(txt_engine, txt_state):
    state, batch = txt_state
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    s1, m1 = txt_engine.task_step(state, batch)
    # The head clamp is applied pre-forward and persisted: the new kernel
    # equals relu(old) + sgd_delta, so it can only dip below zero by the
    # (lr-sized) update magnitude, never by the original negative mass.
    assert float(jnp.min(s1.params["class_fc"]["kernel"])) > -1e-2
    for _ in range(5):
        s1, m = txt_engine.task_step(s1, batch)
    assert float(m["loss"]) < float(m1["loss"])


def test_uni_contrast_step_runs_and_descends(txt_engine, txt_state):
    state, batch = txt_state
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    n_pub, d = 20, 16
    rng = np.random.default_rng(0)
    g_img = jnp.asarray(rng.normal(size=(n_pub, d)), jnp.float32)
    g_txt = jnp.asarray(rng.normal(size=(n_pub, d)), jnp.float32)
    globals_ = {"same": g_txt, "other": g_img,
                "index": jnp.arange(4, dtype=jnp.int32)}
    old_params = state.params
    losses = []
    s = state
    for _ in range(4):
        s, loss = txt_engine.contrast_step(s, old_params,
                                           state.batch_stats, batch,
                                           globals_, True, True)
        losses.append(float(loss))
    assert losses[-1] < losses[0]


def test_uni_features_normalized(txt_engine, txt_state):
    state, batch = txt_state
    feats, _bs = txt_engine.features_step(state,
                                          {k: jnp.asarray(v)
                                           for k, v in batch.items()})
    np.testing.assert_allclose(np.linalg.norm(np.asarray(feats), axis=1),
                               1.0, rtol=1e-4)


def test_uni_mlp_local_init_and_features():
    """--mlp_local adds a features-phase-only MLPHead; init must create
    its params (lazy flax init would otherwise crash the first
    contrast/features apply) and the BN rep sweep must persist stats."""
    import types

    from creamfl_tpu.engine.client_uni import UniClientEngine

    args = types.SimpleNamespace(img_model_local="resnet10",
                                 feature_dim=8, mlp_local=True,
                                 interintra_weight=0.5, loss_scale=False)
    engine = UniClientEngine("img", num_class=10, args=args,
                             vocab_size=20)
    batch = {"images": np.random.default_rng(0).normal(
        size=(4, 16, 16, 3)).astype(np.float32),
        "labels": np.zeros((4,), np.int32)}
    state = engine.init_state(jax.random.PRNGKey(0), batch)
    assert "head_proj" in state.params, sorted(state.params)
    dev = {k: jnp.asarray(v) for k, v in batch.items()}
    feats, bs = engine.features_step(state, dev)
    # head_proj is a fixed 512->512 MLP in the reference regardless of
    # embed_dim (resnet_client.py:130-136), so mlp_local features are
    # 512-dim.
    assert feats.shape == (4, 512)
    # BN running stats moved (train-mode sweep persists the update).
    before = jax.tree.leaves(state.batch_stats)
    after = jax.tree.leaves(bs)
    assert any(not np.allclose(np.asarray(a), np.asarray(b))
               for a, b in zip(before, after))


def test_server_save_load_models_roundtrip(tmp_path):
    cfg = parse_config(default_config_path("coco.yaml"), strict_cast=False)
    cfg.model.embed_dim = 8
    cfg.model.cnn_type = "resnet10"
    cfg.model.not_bert = True
    cfg.model.word_dim = 8
    cfg.train.use_bf16 = False
    engine = ServerEngine(cfg, vocab_size=20)
    batch = {"images": np.zeros((1, 32, 32, 3), np.float32),
             "captions": np.ones((1, 4), np.int32),
             "lengths": np.full((1,), 4, np.int32)}
    state = engine.init_state(jax.random.PRNGKey(0), batch)
    path = str(tmp_path / "server.ckpt")
    sha = engine.save_models(path, state, metadata={"round": 3})
    assert len(sha) == 40

    state2 = engine.init_state(jax.random.PRNGKey(9), batch)
    restored = engine.load_models(path, state2)
    a = jax.tree.leaves(state.params)
    b = jax.tree.leaves(restored.params)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y))

    # Optimizer moments resume too (reference load_models restores the
    # optimizer state_dict, retrieval_trainer.py:160-171): advance one
    # step so mu/nu/count are non-trivial, save, restore, compare.
    images = jnp.asarray(batch["images"])
    captions, lengths, bert_mask = engine._text_inputs(batch)
    stepped, _ = engine.train_step(state, images, captions, lengths,
                                   bert_mask, jax.random.PRNGKey(1))
    engine.save_models(path, stepped, metadata={})
    restored = engine.load_models(path, state2)
    for x, y in zip(jax.tree.leaves(stepped.opt_state),
                    jax.tree.leaves(restored.opt_state)):
        np.testing.assert_allclose(np.asarray(x, np.float64),
                                   np.asarray(y, np.float64), rtol=1e-6)


def test_server_distill_step_moves_towards_targets():
    cfg = parse_config(default_config_path("coco.yaml"), strict_cast=False)
    cfg.model.embed_dim = 16
    cfg.model.cnn_type = "resnet10"
    cfg.model.not_bert = True
    cfg.model.word_dim = 8
    cfg.train.use_bf16 = False
    cfg.optimizer.learning_rate = 1e-3
    engine = ServerEngine(cfg, vocab_size=30)
    batch = {"images": np.zeros((2, 32, 32, 3), np.float32),
             "captions": np.ones((2, 5), np.int32),
             "lengths": np.full((2,), 5, np.int32)}
    state = engine.init_state(jax.random.PRNGKey(0), batch)
    images = jnp.asarray(batch["images"])
    captions, lengths, bert_mask = engine._text_inputs(batch)
    aggregated = {"img": jnp.ones((2, 16)) / 4.0,
                  "txt": jnp.ones((2, 16)) / 4.0}
    rows = jnp.arange(2, dtype=jnp.int32)
    losses = []
    for i in range(4):
        state, loss = engine.distill_step(
            state, images, captions, lengths, bert_mask, aggregated,
            rows, True, True, False, 0.3, jax.random.PRNGKey(i))
        losses.append(float(loss))
    assert losses[-1] < losses[0]
