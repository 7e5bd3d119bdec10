"""Full production round on the 8-device mesh (VERDICT r2 task 1).

Runs MMFL.train() twice on identical tiny synthetic data — once with
the mesh engaged (8 virtual CPU devices; client counts deliberately NOT
divisible by 8 so the pad-slot path is exercised) and once pinned
single-device — and asserts:
  * the runs agree (scores, server params, globals, con_w aggregates);
  * server-phase batches were actually partitioned over the mesh
    (P(("client","data")), rounds._to_mesh_dp);
  * stacked client states were actually partitioned over the client
    axis (P("client"), stacked._place).
Reference scope: the whole round schedule src/algorithms/MMFL.py:180-286.
"""

import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from creamfl_tpu.data.pipelines import build_synthetic_datasets
from creamfl_tpu.federation import stacked as S
from creamfl_tpu.federation.rounds import MMFL
from creamfl_tpu.main import build_configs


def _args(tmp_path, **kw):
    ns = types.SimpleNamespace(
        name="mesh", exp_dir=str(tmp_path), local_epochs=1, comm_rounds=1,
        img_model_local="resnet10", seed=7, num_img_clients=2,
        num_txt_clients=1, num_mm_clients=1, client_num_per_round=4,
        batch_size=8, alpha=0.5, server_lr=1e-4, disable_distill=False,
        agg_method="con_w", contrast_local_intra=True,
        contrast_local_inter=True, mlp_local=False, kd_weight=0.3,
        interintra_weight=0.5, loss_scale=False, save_client=False,
        pub_data_num=32, feature_dim=16, not_bert=True, smoke=True,
        synthetic=True, client_parallel=True, ckpt_dir=None, wandb=False,
        # 4-device mesh: full sharded coverage at half the padded
        # compute of 8 (pad slots are real FLOPs on the 1-core host).
        mesh_devices=4)
    for k, v in kw.items():
        setattr(ns, k, v)
    return ns


def _build(tmp_path, use_mesh: bool):
    args = _args(tmp_path, use_mesh=use_mesh)
    server_cfg, mm_cfg, bert_cfg = build_configs(args)
    for cfg in (server_cfg, mm_cfg):
        cfg.model.cnn_type = "resnet10"
        cfg.model.word_dim = 8
        # fp32: the yaml default bf16 compute would make cross-layout
        # comparisons bf16-noise-bound (~1e-2 relative per matmul).
        cfg.train.use_bf16 = False
    datasets = build_synthetic_datasets(
        args, pub_size=16, image_size=32, max_len=8, client_data_size=8,
        test_size=8, retrieval_test_size=20, batch_size=8)
    return args, MMFL(args, datasets, server_cfg, mm_cfg,
                      bert_config=bert_cfg)


@pytest.fixture(scope="module")
def mesh_vs_single(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("meshround")

    # --- mesh run, instrumented ------------------------------------
    _, algo_m = _build(tmp, use_mesh=True)
    assert algo_m.mesh is not None and algo_m.mesh.size == 4

    server_batch_shardings = []
    orig_to_mesh = algo_m._to_mesh_dp

    def spy_to_mesh(a):
        out = orig_to_mesh(a)
        if isinstance(out, jax.Array):
            server_batch_shardings.append(out.sharding)
        return out

    algo_m._to_mesh_dp = spy_to_mesh

    stacked_shardings = []
    orig_place = S._place

    def spy_place(tree, sharding):
        out = orig_place(tree, sharding)
        if sharding is not None and tree is not None and tree != {}:
            stacked_shardings.append(jax.tree.leaves(out)[0].sharding)
        return out

    S._place = spy_place
    try:
        scores_m = algo_m.train(0)
    finally:
        S._place = orig_place

    # --- single-device oracle --------------------------------------
    _, algo_s = _build(tmp, use_mesh=False)
    assert algo_s.mesh is None
    scores_s = algo_s.train(0)
    return (algo_m, scores_m, server_batch_shardings, stacked_shardings,
            algo_s, scores_s)


def test_server_batches_partitioned(mesh_vs_single):
    _, _, server_shardings, _, _, _ = mesh_vs_single
    assert server_shardings, "no server-phase batches crossed _to_mesh_dp"
    partitioned = [s for s in server_shardings
                   if not s.is_fully_replicated]
    # pub bs=8 divides the 8-device mesh: every full batch must shard.
    assert len(partitioned) >= len(server_shardings) // 2
    spec = partitioned[0].spec
    assert tuple(spec)[0] == ("client", "data"), spec


def test_stacked_states_partitioned(mesh_vs_single):
    _, _, _, stacked_shardings, _, _ = mesh_vs_single
    assert stacked_shardings, "no stacked client state crossed _place"
    for s in stacked_shardings:
        assert not s.is_fully_replicated
        assert tuple(s.spec)[0] == "client", s.spec


def test_pad_slots_engaged(mesh_vs_single):
    """2 img / 1 txt / 1 mm members on a 4-way client axis: every
    family pads (the r2 divisibility gate would have fallen back)."""
    algo_m = mesh_vs_single[0]
    for n in (1, 2):
        sharding, pad = algo_m._group_sharding(n)
        assert sharding is not None and pad == 4 - n


def test_scores_match_single_device(mesh_vs_single):
    _, scores_m, _, _, _, scores_s = mesh_vs_single
    for key in ("i2t", "t2i"):
        for metric in ("recall_1", "recall_5", "recall_10"):
            assert scores_m[key][metric] == pytest.approx(
                scores_s[key][metric]), (key, metric)


def test_single_step_dp_parity(mesh_vs_single):
    """ONE server train step from an identical state: sharded batch on
    the mesh vs single-device must agree tightly. (Full-ROUND param
    equality across layouts is ill-conditioned by construction: AdamP
    divides by sqrt(v), so fp-reassociation noise from the sharded
    reductions is amplified to O(lr) per step — the round-level
    agreement evidence is the scores test plus the cosine test below.)
    """
    algo_m, _, _, _, algo_s, _ = mesh_vs_single
    batch = next(iter(algo_s.datasets["pub_train"]))
    key = jax.random.PRNGKey(99)

    base = jax.tree.map(jnp.copy, algo_s.server_state)
    i_s, c_s, l_s, m_s = algo_s._server_inputs(batch)
    out_s, ld_s = algo_s.server.train_step(base, i_s, c_s, l_s, m_s, key)

    repl = jax.device_put(jax.tree.map(jnp.copy, algo_s.server_state),
                          algo_m._repl_sharding)
    i_m, c_m, l_m, m_m = algo_m._server_inputs(batch)
    assert not i_m.sharding.is_fully_replicated  # actually partitioned
    out_m, ld_m = algo_m.server.train_step(repl, i_m, c_m, l_m, m_m, key)

    assert float(ld_m["loss"]) == pytest.approx(float(ld_s["loss"]),
                                                rel=1e-5)
    for a, b in zip(jax.tree.leaves(out_m.params),
                    jax.tree.leaves(out_s.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=5e-6)


def test_round_artifacts_agree_single_device(mesh_vs_single):
    """Round-level agreement across layouts at feature level: globals
    and con_w aggregates are (near-)unit-norm feature rows — cosine
    alignment is the right metric once adaptive-optimizer noise
    amplification is in play (see test_single_step_dp_parity)."""
    algo_m, _, _, _, algo_s, _ = mesh_vs_single

    def mean_cos(a, b):
        a = np.asarray(a, np.float64)
        b = np.asarray(b, np.float64)
        num = (a * b).sum(-1)
        den = np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1)
        return float((num / np.maximum(den, 1e-12)).mean())

    assert np.array_equal(algo_m.distill_index, algo_s.distill_index)
    assert mean_cos(algo_m.global_img_feature,
                    algo_s.global_img_feature) > 0.99
    assert mean_cos(algo_m.global_txt_feature,
                    algo_s.global_txt_feature) > 0.99
    assert mean_cos(algo_m.img_vec, algo_s.img_vec) > 0.99
    assert mean_cos(algo_m.txt_vec, algo_s.txt_vec) > 0.99
    # Client trajectories (SGD: no adaptive amplification) stay close.
    for cm, cs in zip(algo_m.clients, algo_s.clients):
        if cm.kind == "mm":  # AdamP family — covered by cosine above
            continue
        for a, b in zip(jax.tree.leaves(cm.state.params),
                        jax.tree.leaves(cs.state.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=5e-2, atol=1e-4)
