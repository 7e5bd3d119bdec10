"""Retrieval evaluator tests against hand-built feature matrices with
known ranks (SURVEY.md §4 strategy) and a NumPy argsort oracle."""

import jax.numpy as jnp
import numpy as np

from creamfl_tpu.engine.evaluator import (RetrievalEvaluator,
                                          best_positive_ranks)


def oracle_ranks(q, g, ql, gl):
    """Stable descending argsort + min positive position."""
    sims = q @ g.T
    out = np.zeros(len(q), np.int64)
    for i in range(len(q)):
        order = np.argsort(-sims[i], kind="stable")
        pos = np.where(gl[order] == ql[i])[0]
        out[i] = pos.min()
    return out


def test_best_positive_ranks_matches_oracle(rng):
    q = rng.normal(size=(23, 8)).astype(np.float32)
    g = rng.normal(size=(57, 8)).astype(np.float32)
    ql = rng.integers(0, 10, size=(23,))
    gl = np.concatenate([np.arange(10), rng.integers(0, 10, size=(47,))])
    got = np.asarray(best_positive_ranks(jnp.asarray(q), jnp.asarray(g),
                                         jnp.asarray(ql), jnp.asarray(gl),
                                         block_size=8))
    np.testing.assert_array_equal(got, oracle_ranks(q, g, ql, gl))


def test_best_positive_ranks_with_ties():
    """Exact ties broken by gallery index (stable sort semantics)."""
    q = np.asarray([[1.0, 0.0]], np.float32)
    g = np.asarray([[1.0, 0.0], [1.0, 0.0], [0.5, 0.0]], np.float32)
    ql = np.asarray([7])
    gl = np.asarray([9, 7, 7])
    # sims = [1, 1, .5]; stable desc order = [0, 1, 2]; positives at
    # orders 1 and 2 -> best rank 1.
    got = np.asarray(best_positive_ranks(jnp.asarray(q), jnp.asarray(g),
                                         jnp.asarray(ql), jnp.asarray(gl),
                                         block_size=1))
    assert got[0] == 1


def test_recall_scores_known_ranking():
    """Identity features: image i matches captions {2i, 2i+1} exactly."""
    n_img = 10
    img = np.eye(n_img, dtype=np.float32)
    cap = np.repeat(img, 2, axis=0) + 0.01  # 2 captions per image
    img_cls = np.arange(n_img)
    cap_cls = np.repeat(img_cls, 2)

    ev = RetrievalEvaluator(n_crossfolds=0)
    i2t = ev.evaluate_recall(img, cap, img_cls, cap_cls)
    t2i = ev.evaluate_recall(cap, img, cap_cls, img_cls)
    assert i2t["recall_1"] == 100.0
    assert t2i["recall_1"] == 100.0
    assert i2t["medr"] == 1.0


def test_retrieve_topk():
    ev = RetrievalEvaluator(n_crossfolds=0)
    q = np.eye(2, 4, dtype=np.float32)
    g = np.asarray([[1, 0, 0, 0], [0.5, 0, 0, 0], [0, 1, 0, 0]],
                   np.float32)
    items, scores = ev.retrieve(q, g, q_ids=[10, 20],
                                g_ids=[100, 200, 300], topk=2)
    assert items[10] == [100, 200]
    assert items[20] == [300, 100] or items[20][0] == 300
    assert scores[10][0] == 1.0


def test_extract_features_dedup_and_alignment():
    """Images dedup by image_id; captions regrouped in image order."""
    d = 4

    def fake_batches():
        # Two batches; image 7 appears in both; captions interleaved.
        yield {
            "images": None,
            "image_ids": np.asarray([7, 3, 7]),
            "ann_ids": np.asarray([70, 30, 71]),
            "valid": np.asarray([True, True, True]),
            "_img": np.asarray([[7.0] * d, [3.0] * d, [7.1] * d]),
            "_cap": np.asarray([[0.7] * d, [0.3] * d, [0.71] * d]),
        }
        yield {
            "images": None,
            "image_ids": np.asarray([3, 9]),
            "ann_ids": np.asarray([31, 90]),
            "valid": np.asarray([True, True]),
            "_img": np.asarray([[3.0] * d, [9.0] * d]),
            "_cap": np.asarray([[0.31] * d, [0.9] * d]),
        }

    ev = RetrievalEvaluator()
    feats = ev.extract_features(list(fake_batches()),
                                lambda b: (b["_img"], b["_cap"]))
    # Images in first-seen order 7, 3, 9; first occurrence kept.
    np.testing.assert_array_equal(feats["image_classes"], [7, 3, 9])
    np.testing.assert_allclose(feats["image_features"][0], [7.0] * d)
    # Captions grouped by image order: 7's two, then 3's two, then 9's.
    np.testing.assert_array_equal(feats["caption_classes"],
                                  [7, 7, 3, 3, 9])
    np.testing.assert_array_equal(feats["caption_ids"],
                                  [70, 71, 30, 31, 90])


def test_best_positive_ranks_sharded_matches_single(rng):
    """Mesh-parallel ranking == single-device ranking (query rows shard
    over the 8-device mesh, gallery replicated)."""
    import jax

    from creamfl_tpu.engine.evaluator import best_positive_ranks_sharded
    from creamfl_tpu.parallel.mesh import make_mesh

    assert jax.device_count() == 8
    q = rng.normal(size=(53, 8)).astype(np.float32)
    g = rng.normal(size=(37, 8)).astype(np.float32)
    ql = rng.integers(0, 9, size=(53,))
    gl = np.concatenate([np.arange(9), rng.integers(0, 9, size=(28,))])
    mesh = make_mesh(n_client=4, n_data=2)
    got = np.asarray(best_positive_ranks_sharded(
        q, g, ql, gl, mesh, block_size=4))
    single = np.asarray(best_positive_ranks(
        jnp.asarray(q), jnp.asarray(g), jnp.asarray(ql),
        jnp.asarray(gl), block_size=8))
    np.testing.assert_array_equal(got, single)


def test_matching_prob_eval_sharded_matches_single(rng):
    """matching_prob mode on a mesh: the sims_fn (MatchingProbModule,
    eval_coco.py:54-72) rides the sharded ranking path and agrees with
    the single-device evaluator (VERDICT r3 #9 — this mode previously
    fell back to one device whenever a mesh was active)."""
    import jax

    from creamfl_tpu.parallel.mesh import make_mesh

    assert jax.device_count() == 8
    crit = {"shift": jnp.asarray([0.3]),
            "negative_scale": jnp.asarray([2.0])}
    q = rng.normal(size=(29, 8)).astype(np.float32)
    g = rng.normal(size=(23, 8)).astype(np.float32)
    ql = rng.integers(0, 7, size=(29,))
    gl = np.concatenate([np.arange(7), rng.integers(0, 7, size=(16,))])

    ev_single = RetrievalEvaluator(eval_method="matching_prob",
                                   criterion_params=crit)
    ev_mesh = RetrievalEvaluator(eval_method="matching_prob",
                                 criterion_params=crit,
                                 mesh=make_mesh(n_client=4, n_data=2))
    s_single = ev_single.evaluate_recall(q, g, ql, gl)
    s_mesh = ev_mesh.evaluate_recall(q, g, ql, gl)
    assert s_single == s_mesh
    # And it really is probability-ranked, not dot-ranked: a matmul
    # evaluator on the same features must disagree somewhere (the l2
    # distance reorders unnormalized galleries).
    s_dot = RetrievalEvaluator().evaluate_recall(q, g, ql, gl)
    assert s_dot != s_mesh
