"""End-to-end federated round on minuscule synthetic data (CPU).

Covers the full MMFL path: server epoch, global feature extraction,
stacked client training (all three families) with inter+intra contrast,
rep upload, con_w aggregation, distillation, retrieval eval, round
checkpoint + resume.
"""

import types

import numpy as np
import pytest

from creamfl_tpu.federation.rounds import MMFL
from creamfl_tpu.main import build_configs
from creamfl_tpu.data.pipelines import build_synthetic_datasets

pytestmark = pytest.mark.slow  # >60s on the 1-core CPU host


def _args(tmp_path, **kw):
    ns = types.SimpleNamespace(
        name="t", exp_dir=str(tmp_path), local_epochs=1, comm_rounds=2,
        img_model_local="resnet10", seed=3, num_img_clients=1,
        num_txt_clients=1, num_mm_clients=1, client_num_per_round=3,
        batch_size=8, alpha=0.5, server_lr=1e-4, disable_distill=False,
        agg_method="con_w", contrast_local_intra=True,
        contrast_local_inter=True, mlp_local=False, kd_weight=0.3,
        interintra_weight=0.5, loss_scale=False, save_client=False,
        pub_data_num=32, feature_dim=16, not_bert=True, smoke=True,
        synthetic=True, client_parallel=True,
        # Mesh off: pad slots cost real compute on the 1-core CPU host;
        # mesh coverage lives in test_full_round_mesh / stacked tests.
        use_mesh=False,
        ckpt_dir=str(tmp_path / "ckpt"), wandb=False)
    for k, v in kw.items():
        setattr(ns, k, v)
    return ns


@pytest.fixture(scope="module")
def tiny_run(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("fed")
    args = _args(tmp_path)
    server_cfg, mm_cfg, bert_cfg = build_configs(args)
    server_cfg.model.cnn_type = "resnet10"
    server_cfg.model.word_dim = 8
    mm_cfg.model.cnn_type = "resnet10"
    mm_cfg.model.word_dim = 8
    datasets = build_synthetic_datasets(
        args, pub_size=16, image_size=32, max_len=8, client_data_size=8,
        test_size=8, retrieval_test_size=20, batch_size=8)
    algo = MMFL(args, datasets, server_cfg, mm_cfg, bert_config=bert_cfg)
    scores = algo.train(0)
    return args, algo, scores, tmp_path


def test_round_produces_scores_and_reps(tiny_run):
    args, algo, scores, _ = tiny_run
    assert 0.0 <= scores["i2t"]["recall_1"] <= 100.0
    assert "t2i" in scores and "rsum" in scores
    # con_w aggregation produced both modality targets.
    assert algo.img_vec is not None and algo.txt_vec is not None
    assert algo.img_vec.shape == (16, 16)
    # Global features extracted for the full public set.
    assert algo.global_img_feature.shape == (16, 16)
    assert np.array_equal(np.sort(algo.distill_index), np.arange(16))


def test_round_checkpoint_and_resume(tiny_run):
    args, algo, _, tmp_path = tiny_run
    assert algo.checkpointer.latest_round() == 0
    # Fresh MMFL instance resumes from the round-0 checkpoint.
    server_cfg, mm_cfg, bert_cfg = build_configs(args)
    server_cfg.model.cnn_type = "resnet10"
    server_cfg.model.word_dim = 8
    mm_cfg.model.cnn_type = "resnet10"
    mm_cfg.model.word_dim = 8
    datasets = build_synthetic_datasets(
        args, pub_size=16, image_size=32, max_len=8, client_data_size=8,
        test_size=8, retrieval_test_size=20, batch_size=8)
    algo2 = MMFL(args, datasets, server_cfg, mm_cfg,
                 bert_config=bert_cfg)
    next_round = algo2.resume()
    assert next_round == 1
    np.testing.assert_allclose(
        np.asarray(algo2.server_state.params["criterion"]["shift"]),
        np.asarray(algo.server_state.params["criterion"]["shift"]))


def test_sequential_matches_reference_structure(tmp_path):
    """--no_client_parallel path still runs a full round."""
    args = _args(tmp_path, client_parallel=False, num_mm_clients=0,
                 client_num_per_round=2, ckpt_dir=None)
    server_cfg, mm_cfg, bert_cfg = build_configs(args)
    server_cfg.model.cnn_type = "resnet10"
    server_cfg.model.word_dim = 8
    datasets = build_synthetic_datasets(
        args, pub_size=16, image_size=32, max_len=8, client_data_size=8,
        test_size=8, retrieval_test_size=20, batch_size=8)
    algo = MMFL(args, datasets, server_cfg, mm_cfg, bert_config=bert_cfg)
    scores = algo.train(0)
    assert "i2t" in scores


def test_save_client_snapshots(tiny_run):
    """--save_client produces loadable per-client bundles named like the
    reference's Client{k}-model_{epoch} files
    (ClientTrainer.py:207-208)."""
    import os

    from creamfl_tpu.utils.serialize import load_checkpoint

    args, algo, _, tmp_path = tiny_run
    algo._save_clients(algo.clients, round_n=0)
    root = tmp_path / "saved_clients"
    paths = sorted(str(p.relative_to(root)) for p in root.rglob("*.ckpt"))
    assert paths == [os.path.join(c.kind, f"Client{c.client_id}-model_"
                                  f"{args.local_epochs}.ckpt")
                     for c in sorted(algo.clients,
                                     key=lambda c: (c.kind, c.client_id))]
    bundle = load_checkpoint(str(root / paths[0]))
    assert bundle["round"] == 1
    assert "params" in bundle and "batch_stats" in bundle
