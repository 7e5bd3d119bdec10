"""Mesh-sharded stacked client execution == single-device execution."""

import types

import jax
import jax.numpy as jnp
import numpy as np

from creamfl_tpu.engine.client_uni import UniClientEngine
from creamfl_tpu.federation import stacked as S
from creamfl_tpu.parallel.mesh import client_sharding, make_mesh
import pytest

pytestmark = pytest.mark.slow  # >60s on the 1-core CPU host


class _OneBatchLoader:
    def __init__(self, batch):
        self.batch = batch

    def __iter__(self):
        yield self.batch


def test_sharded_stacked_contrast_matches_unsharded(rng):
    assert jax.device_count() == 8
    args = types.SimpleNamespace(img_model_local="resnet10",
                                 feature_dim=8, mlp_local=False,
                                 interintra_weight=0.5, loss_scale=False)
    engine = UniClientEngine("txt", num_class=4, args=args, vocab_size=20)
    batch = {"captions": np.ones((4, 5), np.int32),
             "lengths": np.full((4,), 5, np.int32),
             "labels": np.zeros((4,), np.int32)}
    states = [engine.init_state(jax.random.PRNGKey(i), batch)
              for i in range(8)]
    old_params = [s.params for s in states]
    old_bs = [s.batch_stats for s in states]

    n_pub, d = 12, 8
    same = jnp.asarray(rng.normal(size=(n_pub, d)), jnp.float32)
    other = jnp.asarray(rng.normal(size=(n_pub, d)), jnp.float32)
    pub_batch = {"captions": np.ones((4, 5), np.int32),
                 "lengths": np.full((4,), 5, np.int32),
                 "index": np.arange(4, dtype=np.int64),
                 "images": np.zeros((4, 8, 8, 3), np.float32)}
    loader = _OneBatchLoader(pub_batch)

    def rows_fn(batch):
        return jnp.asarray(batch["index"], jnp.int32)

    def dev(batch):
        return {k: jnp.asarray(v) for k, v in batch.items()}

    out_plain = S.stacked_uni_contrast_epoch(
        engine, states, old_params, old_bs, loader, same, other, rows_fn,
        True, True, dev, sharding=None)

    mesh = make_mesh(n_client=8, n_data=1)
    out_shard = S.stacked_uni_contrast_epoch(
        engine, states, old_params, old_bs, loader, same, other, rows_fn,
        True, True, dev, sharding=client_sharding(mesh))

    for a, b in zip(out_plain, out_shard):
        flat_a = jax.tree.leaves(a.params)
        flat_b = jax.tree.leaves(b.params)
        for x, y in zip(flat_a, flat_b):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       rtol=1e-5, atol=1e-6)


class _ListLoader:
    def __init__(self, batches):
        self.batches = batches

    def __iter__(self):
        return iter(self.batches)


def test_stacked_task_epoch_matches_sequential(rng):
    """stacked_task_epoch == per-client sequential task loop, including
    clients with different batch counts (VERDICT r1 next #4)."""
    args = types.SimpleNamespace(img_model_local="resnet10",
                                 feature_dim=8, mlp_local=False,
                                 interintra_weight=0.5, loss_scale=False)
    engine = UniClientEngine("txt", num_class=4, args=args, vocab_size=20)

    def make_batch(i):
        r = np.random.default_rng(i)
        return {"captions": r.integers(1, 20, size=(4, 5)).astype(np.int32),
                "lengths": np.full((4,), 5, np.int32),
                "labels": r.integers(0, 4, size=(4,)).astype(np.int32)}

    # Uneven streams: 3, 1, and 2 batches.
    loaders = [_ListLoader([make_batch(i * 10 + j) for j in range(n)])
               for i, n in enumerate((3, 1, 2))]
    sample = make_batch(0)
    states = [engine.init_state(jax.random.PRNGKey(i), sample)
              for i in range(3)]

    def dev(batch):
        return {k: jnp.asarray(v) for k, v in batch.items()}

    # Sequential reference.
    seq = []
    for st, loader in zip(states, loaders):
        for batch in loader:
            st, _ = engine.task_step(st, dev(batch))
        seq.append(st)

    got = S.stacked_task_epoch(engine, states, loaders, dev, mm=False)

    for a, b in zip(seq, got):
        assert int(a.step) == int(b.step)
        for x, y in zip(jax.tree.leaves(a.params),
                        jax.tree.leaves(b.params)):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       rtol=1e-5, atol=1e-6)
        for x, y in zip(jax.tree.leaves(a.opt_state),
                        jax.tree.leaves(b.opt_state)):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       rtol=1e-5, atol=1e-6)


def test_stacked_task_epoch_sharded(rng):
    """Task epoch also runs under a client-axis sharding."""
    args = types.SimpleNamespace(img_model_local="resnet10",
                                 feature_dim=8, mlp_local=False,
                                 interintra_weight=0.5, loss_scale=False)
    engine = UniClientEngine("txt", num_class=4, args=args, vocab_size=20)
    batch = {"captions": np.ones((4, 5), np.int32),
             "lengths": np.full((4,), 5, np.int32),
             "labels": np.zeros((4,), np.int32)}
    loaders = [_ListLoader([batch]) for _ in range(8)]
    states = [engine.init_state(jax.random.PRNGKey(i), batch)
              for i in range(8)]

    def dev(b):
        return {k: jnp.asarray(v) for k, v in b.items()}

    mesh = make_mesh(n_client=8, n_data=1)
    plain = S.stacked_task_epoch(engine, states, loaders, dev, mm=False)
    shard = S.stacked_task_epoch(engine, states, loaders, dev, mm=False,
                                 sharding=client_sharding(mesh))
    for a, b in zip(plain, shard):
        for x, y in zip(jax.tree.leaves(a.params),
                        jax.tree.leaves(b.params)):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       rtol=1e-5, atol=1e-6)


def test_scan_chunked_contrast_matches_unchunked(rng):
    """scan_chunk>1 runs identical math: chunked epoch == per-batch
    epoch over a 5-batch public stream (2 scanned chunks + remainder)."""
    args = types.SimpleNamespace(img_model_local="resnet10",
                                 feature_dim=8, mlp_local=False,
                                 interintra_weight=0.5, loss_scale=False)
    engine = UniClientEngine("txt", num_class=4, args=args, vocab_size=20)
    base = {"captions": np.ones((4, 5), np.int32),
            "lengths": np.full((4,), 5, np.int32),
            "labels": np.zeros((4,), np.int32)}
    states = [engine.init_state(jax.random.PRNGKey(i), base)
              for i in range(3)]
    old_params = [s.params for s in states]
    old_bs = [s.batch_stats for s in states]

    n_pub, d = 20, 8
    same = jnp.asarray(rng.normal(size=(n_pub, d)), jnp.float32)
    other = jnp.asarray(rng.normal(size=(n_pub, d)), jnp.float32)

    def make_batches():
        r = np.random.default_rng(5)
        return [{"captions": r.integers(1, 20, (4, 5)).astype(np.int32),
                 "lengths": np.full((4,), 5, np.int32),
                 "index": np.arange(i * 4, i * 4 + 4, dtype=np.int64)}
                for i in range(5)]

    def rows_fn(batch):
        return jnp.asarray(batch["index"], jnp.int32)

    def dev(batch):
        return {k: jnp.asarray(v) for k, v in batch.items()}

    out_seq = S.stacked_uni_contrast_epoch(
        engine, states, old_params, old_bs, make_batches(), same, other,
        rows_fn, True, True, dev, scan_chunk=1)
    out_chunk = S.stacked_uni_contrast_epoch(
        engine, states, old_params, old_bs, make_batches(), same, other,
        rows_fn, True, True, dev, scan_chunk=2)
    for a, b in zip(out_seq, out_chunk):
        for x, y in zip(jax.tree.leaves(a.params),
                        jax.tree.leaves(b.params)):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       rtol=1e-5, atol=1e-6)


def test_ragged_final_batch_in_full_chunk_takes_per_batch_path(rng):
    """Public loaders emit a bare ragged final batch; when the batch
    count is an exact multiple of scan_chunk the ragged batch lands
    inside a 'full' chunk group — _stack_chunk used to np.stack mixed
    shapes and crash. Must route through the per-batch path instead."""
    import types

    args = types.SimpleNamespace(img_model_local="resnet10",
                                 feature_dim=8, mlp_local=False,
                                 interintra_weight=0.5, loss_scale=False)
    engine = UniClientEngine("txt", num_class=4, args=args, vocab_size=20)

    def batch(bs):
        return {"captions": np.ones((bs, 5), np.int32),
                "lengths": np.full((bs,), 5, np.int32),
                "labels": np.zeros((bs,), np.int32),
                "index": np.arange(bs, dtype=np.int64)}

    state = engine.init_state(jax.random.PRNGKey(0), batch(4))
    n_pub, d = 12, 8
    same = jnp.asarray(rng.normal(size=(n_pub, d)), jnp.float32)

    class _L:
        def __iter__(self):
            yield batch(4)
            yield batch(2)  # ragged final batch, group size == chunk

    out = S.stacked_uni_contrast_epoch(
        engine, [state], [state.params], [state.batch_stats], _L(),
        same, same, lambda b: jnp.asarray(b["index"], jnp.int32),
        True, True, lambda b: {k: jnp.asarray(v) for k, v in b.items()},
        sharding=None, scan_chunk=2)
    assert len(out) == 1 and out[0].step == 2
