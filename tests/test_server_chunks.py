"""Chunked server sweeps == the per-batch loops, step for step.

The scanned chunk programs (``server.train_chunk`` / ``distill_chunk``
/ ``extract_chunk`` / ``eval_chunk``) exist purely to amortize dispatch
RTT (VERDICT r3 next-step #3); their math must be the per-batch
programs' exactly. Two-part equivalence argument, because XLA compiles
the scan body and the standalone per-batch program with different
fusion/accumulation orders (measured ~1e-6 relative on conv grads per
step, chaotically amplified by AdamP's normalizing projections over
steps — NOT a semantic difference):

  1. ``chunk(k)`` is BITWISE equal to k chained ``chunk(1)`` calls —
     the carry threading, batch ordering, and state donation are
     exactly the sequential semantics (same compiled body both sides).
  2. one ``chunk(1)`` step matches one per-batch step within fp32
     reassociation tolerance — the body IS the per-batch math.

Dropout keys derive by fold_in instead of sequential splits, so
equivalence is asserted where dropout is structurally absent (not_bert
+ PIE rate 0.0 — the parity configuration, as in test_full_round_mesh).

Reference scope: the server epoch retrieval_trainer.py:185-214, the
distill epoch MMFL.py:343-391, the extraction sweep MMFL.py:194-221.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from creamfl_tpu.config import default_config_path, parse_config
from creamfl_tpu.engine.server import ServerEngine


@pytest.fixture(scope="module")
def engine():
    cfg = parse_config(default_config_path("coco.yaml"),
                       strict_cast=False)
    cfg.model.embed_dim = 8
    cfg.model.cnn_type = "resnet10"
    cfg.model.not_bert = True
    cfg.model.word_dim = 8
    cfg.train.use_bf16 = False
    cfg.optimizer.learning_rate = 1e-3
    return ServerEngine(cfg, vocab_size=23)


@pytest.fixture(scope="module")
def data(engine):
    rng = np.random.default_rng(3)
    k, b = 4, 2
    images = rng.normal(size=(k, b, 32, 32, 3)).astype(np.float32)
    captions = rng.integers(1, 23, size=(k, b, 6)).astype(np.int32)
    lengths = np.full((k, b), 6, np.int32)
    state = engine.init_state(
        jax.random.PRNGKey(0),
        {"images": images[0], "captions": captions[0],
         "lengths": lengths[0]})
    return state, images, captions, lengths


def _copy(state):
    # train/distill steps donate their state argument; hand each path
    # its own buffers so the fixture state survives every test.
    return jax.tree.map(jnp.array, state)


def _assert_bitwise(a, b):
    for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def _assert_close(a, b, rtol=5e-2, atol=1e-3):
    # One fwd+bwd+AdamP step across two COMPILATIONS of the same math:
    # conv-grad reassociation (~1e-6) passes through AdamP's
    # norm-dividing projections, and elements with near-zero grads get
    # sign-like +-lr updates whose sign the noise can flip. atol=1e-3
    # (= lr) tolerates those single elements while still failing if the
    # body consumed the wrong batch (which flips update signs en
    # masse); the bitwise chain tests pin the exact semantics, and the
    # loss comparisons pin the forward math tightly.
    for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_allclose(np.asarray(x, np.float64),
                                   np.asarray(y, np.float64),
                                   rtol=rtol, atol=atol)


def test_train_chunk_is_sequential(engine, data):
    state, images, captions, lengths = data
    base = jax.random.PRNGKey(11)

    st = _copy(state)
    losses_1 = []
    for i in range(images.shape[0]):
        # NB: single-step chunks fold step index 0 internally; dropout
        # is structurally off here so key values are inert.
        st, ls = engine.train_chunk(st, images[i:i + 1],
                                    captions[i:i + 1], lengths[i:i + 1],
                                    None, jax.random.fold_in(base, i))
        losses_1.append(np.asarray(ls))

    st_k, losses_k = engine.train_chunk(_copy(state), images, captions,
                                        lengths, None, base)
    _assert_bitwise(st, st_k)
    # Losses are emitted per step from the same body; compare loosely
    # only because fold_in(fold_in(base,i),0) != fold_in(base,i) feeds
    # the (unused) dropout stream — values must still be identical.
    np.testing.assert_array_equal(np.concatenate(losses_1),
                                  np.asarray(losses_k))


def test_train_chunk_body_is_train_step(engine, data):
    state, images, captions, lengths = data
    key = jax.random.PRNGKey(11)
    st, ldict = engine.train_step(
        _copy(state), jnp.asarray(images[0]), jnp.asarray(captions[0]),
        jnp.asarray(lengths[0]), None, key)
    st_c, losses = engine.train_chunk(_copy(state), images[:1],
                                      captions[:1], lengths[:1], None,
                                      key)
    _assert_close(st, st_c)
    np.testing.assert_allclose(float(ldict["loss"]), float(losses[0]),
                               rtol=1e-5)


def test_distill_chunk_is_sequential(engine, data):
    state, images, captions, lengths = data
    base = jax.random.PRNGKey(13)
    rng = np.random.default_rng(5)
    n_pub = 16
    aggregated = {
        "img": jnp.asarray(rng.normal(size=(n_pub, 8)), jnp.float32),
        "txt": jnp.asarray(rng.normal(size=(n_pub, 8)), jnp.float32)}
    rows = rng.integers(0, n_pub,
                        size=images.shape[:2]).astype(np.int32)

    st = _copy(state)
    for i in range(images.shape[0]):
        st, _ = engine.distill_chunk(
            st, images[i:i + 1], captions[i:i + 1], lengths[i:i + 1],
            None, aggregated, rows[i:i + 1], True, True, False, 0.3,
            jax.random.fold_in(base, i))

    st_k, _ = engine.distill_chunk(_copy(state), images, captions,
                                   lengths, None, aggregated, rows,
                                   True, True, False, 0.3, base)
    _assert_bitwise(st, st_k)


def test_distill_chunk_body_is_distill_step(engine, data):
    state, images, captions, lengths = data
    key = jax.random.PRNGKey(13)
    rng = np.random.default_rng(5)
    aggregated = {
        "img": jnp.asarray(rng.normal(size=(16, 8)), jnp.float32),
        "txt": jnp.asarray(rng.normal(size=(16, 8)), jnp.float32)}
    rows = rng.integers(0, 16, size=images.shape[:2]).astype(np.int32)
    st, _ = engine.distill_step(
        _copy(state), jnp.asarray(images[0]), jnp.asarray(captions[0]),
        jnp.asarray(lengths[0]), None, aggregated, jnp.asarray(rows[0]),
        True, True, False, 0.3, key)
    st_c, _ = engine.distill_chunk(_copy(state), images[:1],
                                   captions[:1], lengths[:1], None,
                                   aggregated, rows[:1], True, True,
                                   False, 0.3, key)
    _assert_close(st, st_c)


def test_extract_chunk_matches_per_batch(engine, data):
    state, images, captions, lengths = data
    base = jax.random.PRNGKey(17)

    bs = state.batch_stats
    fis, fts = [], []
    for i in range(images.shape[0]):
        fi, ft, bs = engine.extract_step(
            state.replace(batch_stats=bs), jnp.asarray(images[i]),
            jnp.asarray(captions[i]), jnp.asarray(lengths[i]), None,
            jax.random.fold_in(base, i))
        fis.append(np.asarray(fi))
        fts.append(np.asarray(ft))

    fi_c, ft_c, bs_c = engine.extract_chunk(state, images, captions,
                                            lengths, None, base)
    np.testing.assert_allclose(np.asarray(fi_c), np.stack(fis),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ft_c), np.stack(fts),
                               rtol=1e-4, atol=1e-6)
    _assert_close(bs, bs_c, rtol=1e-4, atol=1e-6)  # forward-only: tight


def test_eval_chunk_matches_per_batch(engine, data):
    state, images, captions, lengths = data
    fis = [np.asarray(engine.eval_step(
        state, jnp.asarray(images[i]), jnp.asarray(captions[i]),
        jnp.asarray(lengths[i]), None)[0])
        for i in range(images.shape[0])]
    fi_c, _ = engine.eval_chunk(state, images, captions, lengths, None)
    np.testing.assert_allclose(np.asarray(fi_c), np.stack(fis),
                               rtol=1e-4, atol=1e-6)
