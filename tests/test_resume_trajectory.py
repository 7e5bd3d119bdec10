"""Kill-and-resume TRAJECTORY equality (VERDICT r3 next-step #8).

``--resume`` exists to guarantee that a crash + restart continues the
exact run: 2 rounds + fresh MMFL instance + resume + 1 round must equal
3 straight rounds — scores, sampled clients, and server parameters —
not merely restore loadable state (test_checkpoint covers roundtrips).

This requires every per-round randomness source to be a pure function
of (seed, round): MMFL._seed_round re-keys the dropout/extract key, the
client-sampling rng, and every loader's epoch order (ArrayLoader/
GrainLoader.set_round) at round entry, so the resumed process replays
the straight run's streams. ``client_num_per_round < n_clients``
exercises the sampling determinism specifically.
"""

import types

import numpy as np
import pytest

from creamfl_tpu.data.pipelines import build_synthetic_datasets
from creamfl_tpu.federation.rounds import MMFL
from creamfl_tpu.main import build_configs

pytestmark = pytest.mark.slow  # 7 federated rounds on the 1-core host


def _args(tmp_path, ckpt_dir):
    return types.SimpleNamespace(
        name="t", exp_dir=str(tmp_path), local_epochs=1, comm_rounds=3,
        img_model_local="resnet10", seed=11, num_img_clients=2,
        num_txt_clients=1, num_mm_clients=0,
        # fewer slots than clients: sampling must be resume-stable
        client_num_per_round=2,
        batch_size=8, alpha=0.5, server_lr=1e-4, disable_distill=False,
        agg_method="con_w", contrast_local_intra=True,
        contrast_local_inter=True, mlp_local=False, kd_weight=0.3,
        interintra_weight=0.5, loss_scale=False, save_client=False,
        pub_data_num=16, feature_dim=16, not_bert=True, smoke=True,
        synthetic=True, client_parallel=True, use_mesh=False,
        ckpt_dir=ckpt_dir, wandb=False)


def _build(tmp_path, ckpt_dir):
    args = _args(tmp_path, ckpt_dir)
    server_cfg, mm_cfg, bert_cfg = build_configs(args)
    server_cfg.model.cnn_type = "resnet10"
    server_cfg.model.word_dim = 8
    datasets = build_synthetic_datasets(
        args, pub_size=16, image_size=32, max_len=8, client_data_size=8,
        test_size=8, retrieval_test_size=20, batch_size=8)
    return args, MMFL(args, datasets, server_cfg, mm_cfg,
                      bert_config=bert_cfg)


def _flat_scores(scores):
    out = {}
    for split in ("i2t", "t2i"):
        for k, v in scores[split].items():
            out[f"{split}_{k}"] = v
        if "n_fold" in scores:
            for k, v in scores["n_fold"][split].items():
                out[f"nfold_{split}_{k}"] = v
    out["rsum"] = scores["rsum"]
    return out


@pytest.fixture(scope="module")
def runs(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("resume_traj")

    # Straight 3-round run (its own checkpoint dir, unused for resume).
    _, straight = _build(tmp / "a", str(tmp / "a_ckpt"))
    straight_scores = [straight.train(r) for r in range(3)]

    # 2 rounds, then a FRESH MMFL instance resumes and runs round 2.
    _, first = _build(tmp / "b", str(tmp / "b_ckpt"))
    for r in range(2):
        first.train(r)
    del first

    _, resumed = _build(tmp / "b2", str(tmp / "b_ckpt"))
    next_round = resumed.resume()
    assert next_round == 2
    resumed_scores = resumed.train(2)

    return straight, straight_scores, resumed, resumed_scores


def test_resumed_round_scores_equal_straight(runs):
    _, straight_scores, _, resumed_scores = runs
    a = _flat_scores(straight_scores[2])
    b = _flat_scores(resumed_scores)
    assert set(a) == set(b)
    for k in a:
        np.testing.assert_allclose(b[k], a[k], atol=1e-9, err_msg=k)


def test_resumed_server_params_equal_straight(runs):
    straight, _, resumed, _ = runs
    import jax

    pa = jax.tree.map(np.asarray, straight.server_state.params)
    pb = jax.tree.map(np.asarray, resumed.server_state.params)
    leaves_a = jax.tree.leaves(pa)
    leaves_b = jax.tree.leaves(pb)
    assert len(leaves_a) == len(leaves_b)
    for la, lb in zip(leaves_a, leaves_b):
        np.testing.assert_allclose(lb, la, rtol=1e-6, atol=1e-7)


def test_resumed_client_states_equal_straight(runs):
    straight, _, resumed, _ = runs
    import jax

    for ca, cb in zip(straight.clients, resumed.clients):
        assert ca.client_idx == cb.client_idx
        for la, lb in zip(jax.tree.leaves(ca.state.params),
                          jax.tree.leaves(cb.state.params)):
            np.testing.assert_allclose(np.asarray(lb), np.asarray(la),
                                       rtol=1e-6, atol=1e-7)


def test_best_score_meta_restored(runs):
    """The resumed instance carries the straight run's best-score meta
    (covers the checkpointed meta dict, not just model state)."""
    straight, straight_scores, resumed, _ = runs
    assert straight.best_score > 0
    np.testing.assert_allclose(resumed.best_score, straight.best_score)
