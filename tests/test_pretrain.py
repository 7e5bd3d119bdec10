"""RawTrainer pretraining loop + two-tower / class-mode evaluation
(reference rawTrainerEngine, retrieval_trainer.py:240-359, and
mm_eval.COCOEvaluator)."""

import os

import jax
import numpy as np
import pytest

from creamfl_tpu.config import default_config_path, parse_config
from creamfl_tpu.data.loaders import ArrayLoader
from creamfl_tpu.data.synthetic import SyntheticCaptionDataset
from creamfl_tpu.engine.evaluator import RetrievalEvaluator
from creamfl_tpu.engine.pretrain import RawTrainer
from creamfl_tpu.engine.server import ServerEngine


@pytest.fixture(scope="module")
def small_engine():
    cfg = parse_config(default_config_path("coco.yaml"),
                       strict_cast=False)
    cfg.model.embed_dim = 16
    cfg.model.cnn_type = "resnet10"
    cfg.model.not_bert = True
    cfg.model.word_dim = 8
    cfg.train.use_bf16 = False
    ds = SyntheticCaptionDataset(n_captions=16, image_size=32, max_len=8)
    engine = ServerEngine(cfg, vocab_size=len(ds.vocab))
    loader = ArrayLoader(ds, batch_size=8, drop_last=True, shuffle=True)
    sample = next(iter(loader))
    state = engine.init_state(jax.random.PRNGKey(0), sample)
    return engine, state, ds, loader


def test_raw_trainer_pretrains_and_checkpoints(small_engine, tmp_path):
    engine, state, ds, loader = small_engine
    val_loader = ArrayLoader(ds, batch_size=8, pad_last=True)
    trainer = RawTrainer(engine, state,
                         evaluator=RetrievalEvaluator(n_crossfolds=0))
    best = str(tmp_path / "best.pth")
    last = str(tmp_path / "last.pth")
    out = trainer.train(loader, n_epochs=2, val_loaders={"val": val_loader},
                        val_epochs=1, model_save_to=last,
                        best_model_save_to=best, pub_data_ratio=1.0)
    assert os.path.exists(last) and os.path.exists(best)
    assert out["best_score"] > 0
    assert "val" in out["scores"]
    # The trained state can be restored into a fresh engine state.
    restored = engine.load_models(last, state)
    assert int(restored.step) == int(trainer.state.step)


def test_raw_trainer_requires_val_key(small_engine):
    engine, state, _, loader = small_engine
    trainer = RawTrainer(engine, state)
    with pytest.raises(KeyError):
        trainer.train(loader, 1, val_loaders={"test": loader})


def test_two_tower_evaluate_matches_joint(rng):
    """evaluate_two_tower == evaluate with the same features split into
    two tower functions (mm_eval's COCOEvaluator surface)."""
    n_img, d = 8, 6
    img = rng.normal(size=(n_img * 2, d)).astype(np.float32)
    cap = rng.normal(size=(n_img * 2, d)).astype(np.float32)
    batches = [{
        "images": None,  # towers ignore the raw batch contents here
        "image_ids": np.repeat(np.arange(n_img), 2)[i * 8:(i + 1) * 8],
        "ann_ids": np.arange(i * 8, (i + 1) * 8),
        "_rows": np.arange(i * 8, (i + 1) * 8),
    } for i in range(2)]

    ev = RetrievalEvaluator(n_crossfolds=0)
    joint = ev.evaluate(batches, lambda b: (img[b["_rows"]],
                                            cap[b["_rows"]]))
    two = ev.evaluate_two_tower(batches, lambda b: img[b["_rows"]],
                                lambda b: cap[b["_rows"]])
    assert joint == two


def test_iid_to_cls_class_mode(rng):
    """Class-mode labels group galleries by class; crossfolds skipped
    (mm_eval.py:127-133, 372-373)."""
    # 6 images, classes: images {0,1} -> class 100, {2,3} -> 101,
    # {4,5} -> 102; one caption per image.
    iid_to_cls = {0: 100, 1: 100, 2: 101, 3: 101, 4: 102, 5: 102}
    img = np.eye(6, dtype=np.float32)
    # Caption i is closest to image i's feature.
    cap = img + 0.01
    batches = [{
        "image_ids": np.arange(6),
        "ann_ids": np.arange(6),
        "_rows": np.arange(6),
    }]
    ev = RetrievalEvaluator(n_crossfolds=5, iid_to_cls=iid_to_cls)
    scores = ev.evaluate(batches,
                         lambda b: (img[b["_rows"]], cap[b["_rows"]]))
    assert "n_fold" not in scores
    # Every query's top-1 is its own pair -> same class: R@1 = 100.
    assert scores["i2t"]["recall_1"] == 100.0
    assert scores["t2i"]["recall_1"] == 100.0
    # Class siblings rank 2nd: R@2-equivalent via recall_5 = 100 and
    # the best-positive rank of a sibling-only query would be > 0 —
    # check labels really were remapped by making one query's own pair
    # a wrong-class match.
    feats = ev.extract_features(batches,
                                lambda b: (img[b["_rows"]],
                                           cap[b["_rows"]]))
    assert feats["image_classes"].tolist() == [100, 100, 101, 101,
                                               102, 102]
    assert feats["caption_classes"].tolist() == feats[
        "image_classes"].tolist()
