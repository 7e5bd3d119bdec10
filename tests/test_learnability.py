"""Learning sanity: PCME trained on concept-correlated synthetic pairs
must beat chance at retrieval (the synthetic data carries a real
cross-modal signal; see SyntheticCaptionDataset)."""

import jax
import jax.numpy as jnp
import numpy as np

from creamfl_tpu.config import default_config_path, parse_config
from creamfl_tpu.data.loaders import ArrayLoader
from creamfl_tpu.data.synthetic import SyntheticCaptionDataset
from creamfl_tpu.data.vocab import Vocabulary
from creamfl_tpu.engine.evaluator import RetrievalEvaluator
from creamfl_tpu.engine.server import ServerEngine
import pytest

pytestmark = pytest.mark.slow  # >60s on the 1-core CPU host


def test_pcme_learns_synthetic_alignment():
    vocab = Vocabulary.synthetic(60)
    ds = SyntheticCaptionDataset(n_captions=64, image_size=32, max_len=10,
                                 vocab=vocab, captions_per_image=2,
                                 n_concepts=4, seed=11)
    train = ArrayLoader(ds, batch_size=16, shuffle=True, drop_last=True,
                        seed=0)
    eval_loader = ArrayLoader(ds, batch_size=16, pad_last=True)

    cfg = parse_config(default_config_path("coco.yaml"),
                       strict_cast=False)
    cfg.model.embed_dim = 32
    cfg.model.cnn_type = "resnet10"
    cfg.model.not_bert = True
    cfg.model.word_dim = 16
    cfg.train.use_bf16 = False
    cfg.optimizer.learning_rate = 5e-4
    engine = ServerEngine(cfg, vocab_size=len(vocab))
    state = engine.init_state(jax.random.PRNGKey(0),
                              next(iter(eval_loader)))

    ev = RetrievalEvaluator(n_crossfolds=0, logger=None)

    def extract(batch):
        images = jnp.asarray(batch["images"])
        captions, lengths, mask = engine._text_inputs(batch)
        return engine.eval_step(state, images, captions, lengths, mask)

    before = ev.evaluate(eval_loader, extract, n_crossfolds=0)

    key = jax.random.PRNGKey(1)
    for _ in range(8):  # 8 epochs x 4 steps
        for batch in train:
            images = jnp.asarray(batch["images"])
            captions, lengths, mask = engine._text_inputs(batch)
            key, sub = jax.random.split(key)
            state, _ = engine.train_step(state, images, captions,
                                         lengths, mask, sub)

    after = ev.evaluate(eval_loader, extract, n_crossfolds=0)
    # 32 images, 4 concepts: concept-level alignment alone gives strong
    # recall@10; require a clear improvement over the untrained model.
    assert after["i2t"]["rsum"] > before["i2t"]["rsum"] + 20, (
        before["i2t"], after["i2t"])
    assert after["t2i"]["rsum"] > before["t2i"]["rsum"] + 20, (
        before["t2i"], after["t2i"])
