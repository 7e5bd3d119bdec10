"""Single-device family-stack shape bucketing (VERDICT r3 #4).

A freshly sampled family size used to compile new stacked-epoch
programs (+63 s on a 198 s steady paper round); ``--stack_bucket``
pads the stacked client axis to a stable shape with masked dummy
slots so different per-round mixes reuse compiled programs. The pad
mechanism is the mesh path's (stacked.stacked_task_epoch active
masks); here we pin the single-device policy arithmetic and that a
padded run is score-identical to an unpadded one.
"""

import types

import numpy as np
import pytest

from creamfl_tpu.data.pipelines import build_synthetic_datasets
from creamfl_tpu.federation.rounds import MMFL
from creamfl_tpu.main import build_configs


def _args(tmp_path, **kw):
    ns = types.SimpleNamespace(
        name="b", exp_dir=str(tmp_path), local_epochs=1, comm_rounds=1,
        img_model_local="resnet10", seed=5, num_img_clients=3,
        num_txt_clients=1, num_mm_clients=0, client_num_per_round=4,
        batch_size=8, alpha=0.5, server_lr=1e-4, disable_distill=False,
        agg_method="con_w", contrast_local_intra=True,
        contrast_local_inter=True, mlp_local=False, kd_weight=0.3,
        interintra_weight=0.5, loss_scale=False, save_client=False,
        pub_data_num=16, feature_dim=16, not_bert=True, smoke=True,
        synthetic=True, client_parallel=True, use_mesh=False,
        ckpt_dir=None, wandb=False)
    for k, v in kw.items():
        setattr(ns, k, v)
    return ns


def test_bucket_policy_arithmetic(tmp_path):
    algo_even = _build(tmp_path, stack_bucket="even")[1]
    for n, pad in ((1, 0), (2, 0), (3, 1), (4, 0), (5, 1), (9, 1)):
        sharding, got = algo_even._group_sharding(n)
        assert sharding is None and got == pad, (n, got)
    algo_pow2 = _build(tmp_path, stack_bucket="pow2")[1]
    for n, pad in ((1, 0), (3, 1), (5, 3), (6, 2), (9, 7)):
        _, got = algo_pow2._group_sharding(n)
        assert got == pad, (n, got)
    algo_none = _build(tmp_path, stack_bucket="none")[1]
    for n in (1, 3, 5):
        _, got = algo_none._group_sharding(n)
        assert got == 0


def _build(tmp_path, **kw):
    args = _args(tmp_path, **kw)
    server_cfg, mm_cfg, bert_cfg = build_configs(args)
    server_cfg.model.cnn_type = "resnet10"
    server_cfg.model.word_dim = 8
    datasets = build_synthetic_datasets(
        args, pub_size=16, image_size=32, max_len=8, client_data_size=8,
        test_size=8, retrieval_test_size=20, batch_size=8)
    return args, MMFL(args, datasets, server_cfg, mm_cfg,
                      bert_config=bert_cfg)


@pytest.mark.slow  # two federated rounds on the 1-core host
def test_padded_run_matches_unpadded(tmp_path):
    """3 img clients pad to 4 slots under ``even``; every score and the
    per-client states must equal the unpadded (``none``) run's — pad
    slots replay masked batches and are sliced off before reps."""
    _, algo_p = _build(tmp_path / "p", stack_bucket="even")
    assert algo_p._group_sharding(3) == (None, 1)
    scores_p = algo_p.train(0)

    _, algo_n = _build(tmp_path / "n", stack_bucket="none")
    scores_n = algo_n.train(0)

    for key in ("i2t", "t2i"):
        for metric, v in scores_n[key].items():
            assert scores_p[key][metric] == pytest.approx(v), (
                key, metric)
    import jax

    for cp, cn in zip(algo_p.clients, algo_n.clients):
        for a, b in zip(jax.tree.leaves(cp.state.params),
                        jax.tree.leaves(cn.state.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-6)
