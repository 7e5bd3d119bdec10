"""stacked_task_epoch(mm=True) == sequential local_step loop.

The mm local epochs use dropout, so parity with the sequential oracle
(--no_client_parallel) requires both paths to draw IDENTICAL per-client
key streams. rounds._client_epoch_keys derives keys by fold_in on
(round, client_idx, epoch) + per-step fold_in — order-independent —
and the stacked lock-step index equals each active client's own batch
index, so the streams line up even with uneven loader lengths
(reference sequential loop: MMClientTrainer.py:112-142).
"""

import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from creamfl_tpu.config import default_config_path, parse_config
from creamfl_tpu.engine.client_mm import MMClientEngine
from creamfl_tpu.federation import stacked as S
from creamfl_tpu.federation.rounds import _client_epoch_keys
from creamfl_tpu.parallel.mesh import client_sharding, make_mesh

pytestmark = pytest.mark.slow  # >60s on the 1-core CPU host


class _ListLoader:
    def __init__(self, batches):
        self.batches = batches

    def __iter__(self):
        return iter(self.batches)


def _batch(rng, bs=2, s=32, L=5):
    return {"images": rng.normal(size=(bs, s, s, 3)).astype(np.float32),
            "captions": rng.integers(1, 20, size=(bs, L)).astype(np.int32),
            "lengths": np.full((bs,), L, np.int32)}


@pytest.mark.parametrize("lowering", ["scan", "vmap"])
def test_stacked_mm_task_epoch_matches_sequential(rng, lowering):
    cfg = parse_config(default_config_path("f30k.yaml"), strict_cast=False)
    cfg.model.embed_dim = 8
    cfg.model.cnn_type = "resnet10"
    cfg.model.word_dim = 8
    cfg.train.use_bf16 = False
    args = types.SimpleNamespace(feature_dim=8, mlp_local=False,
                                 interintra_weight=0.5, loss_scale=False)
    engine = MMClientEngine(cfg, vocab_size=20, args=args)

    sample = _batch(rng)
    states = [engine.init_state(jax.random.PRNGKey(i), sample)
              for i in range(4)]
    # Uneven loader lengths exercise the exhausted-client masking.
    loaders = [[_batch(rng) for _ in range(n)] for n in (3, 1, 2, 2)]
    root = jax.random.PRNGKey(7)
    round_n, epoch = 2, 0
    idxs = jnp.asarray([10, 11, 12, 13], jnp.int32)  # global client_idx

    # Sequential oracle: per client, its own batches in order.
    seq = []
    for c, (st, batches) in enumerate(zip(states, loaders)):
        ek = _client_epoch_keys(root, round_n, idxs[c:c + 1], epoch)[0]
        for t, b in enumerate(batches):
            st, _ = engine.local_step(
                st, {k: jnp.asarray(v) for k, v in b.items()},
                jax.random.fold_in(ek, t))
        seq.append(st)

    eks = _client_epoch_keys(root, round_n, idxs, epoch)

    # sharding=None -> scan lowering; a 2-device client mesh -> vmap
    # (the multi-device branch of _client_map, incl. key handling).
    sharding = (None if lowering == "scan"
                else client_sharding(make_mesh(n_client=2, n_data=1,
                                               devices=jax.devices()[:2])))

    got = S.stacked_task_epoch(
        engine, states, [_ListLoader(b) for b in loaders],
        lambda b: b, mm=True, epoch_keys=eks, sharding=sharding)

    # Trajectory bound: fp fusion noise through 3 AdamP+BN steps at bs2
    # is chaotic — measured means wander 1e-6..6e-5 across compile
    # contexts for scan, ~1e-4 for the grouped-conv vmap lowering (an
    # identical-keys scan-vs-vmap control reproduces the same envelope).
    # Anything structural (wrong batch routing, broken masking/replay)
    # lands decades higher; exact key parity is asserted bitwise in
    # test_epoch_key_derivation_matches_sequential below.
    for a, b in zip(seq, got):
        for x, y in zip(jax.tree.leaves(a.params), jax.tree.leaves(b.params)):
            diff = np.abs(np.asarray(x, np.float64)
                          - np.asarray(y, np.float64))
            assert diff.max() < 5e-3, diff.max()
            assert diff.mean() < 5e-4, diff.mean()


def test_epoch_key_derivation_matches_sequential():
    """The stacked program folds ``fold_in(epoch_key, step)`` in-jit;
    the sequential oracle computes the same expression eagerly. Assert
    the streams are BITWISE identical per (client, step) — exact, and
    unlike the fp trajectory it fails loudly on any derivation skew."""
    root = jax.random.PRNGKey(7)
    idxs = jnp.asarray([10, 11, 12, 13], jnp.int32)
    eks = _client_epoch_keys(root, 2, idxs, 0)
    fold = jax.jit(lambda k, s: jax.random.fold_in(k, s))
    for c in range(4):
        seq_ek = _client_epoch_keys(root, 2, idxs[c:c + 1], 0)[0]
        for t in range(3):
            seq_key = jax.random.fold_in(seq_ek, t)
            stk_key = fold(eks[c], np.int32(t))
            np.testing.assert_array_equal(
                np.asarray(jax.random.key_data(seq_key)),
                np.asarray(jax.random.key_data(stk_key)))
