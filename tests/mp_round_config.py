"""Shared tiny-round builder for the multi-process round test: the
worker processes and the in-test single-process oracle must construct
IDENTICAL MMFL instances (same args, same synthetic data, same seeds) —
any drift would show up as a bogus score mismatch. Geometry mirrors
tests/test_full_round_mesh.py."""

import types


def build_args(exp_dir, **kw):
    ns = types.SimpleNamespace(
        name="mp", exp_dir=str(exp_dir), local_epochs=1, comm_rounds=1,
        img_model_local="resnet10", seed=7, num_img_clients=2,
        num_txt_clients=1, num_mm_clients=1, client_num_per_round=4,
        batch_size=8, alpha=0.5, server_lr=1e-4, disable_distill=False,
        agg_method="con_w", contrast_local_intra=True,
        contrast_local_inter=True, mlp_local=False, kd_weight=0.3,
        interintra_weight=0.5, loss_scale=False, save_client=False,
        pub_data_num=32, feature_dim=16, not_bert=True, smoke=True,
        synthetic=True, client_parallel=True, ckpt_dir=None, wandb=False,
        use_mesh=True, mesh_devices=8)
    for k, v in kw.items():
        setattr(ns, k, v)
    return ns


def build_algo(exp_dir, **kw):
    from creamfl_tpu.data.pipelines import build_synthetic_datasets
    from creamfl_tpu.federation.rounds import MMFL
    from creamfl_tpu.main import build_configs

    args = build_args(exp_dir, **kw)
    server_cfg, mm_cfg, bert_cfg = build_configs(args)
    for cfg in (server_cfg, mm_cfg):
        cfg.model.cnn_type = "resnet10"
        cfg.model.word_dim = 8
        cfg.train.use_bf16 = False  # fp32: cross-layout comparisons
    datasets = build_synthetic_datasets(
        args, pub_size=16, image_size=32, max_len=8, client_data_size=8,
        test_size=8, retrieval_test_size=20, batch_size=8)
    return MMFL(args, datasets, server_cfg, mm_cfg, bert_config=bert_cfg)
