"""con_w aggregation golden test vs straightforward NumPy
(SURVEY.md §2.3 step 4)."""

import jax.numpy as jnp
import numpy as np

from creamfl_tpu.federation.aggregation import (aggregate_modalities,
                                                con_w_aggregate)


def naive_con_w(client_reps, global_other):
    k, n, d = client_reps.shape
    w = np.zeros((k, n))
    for i, v in enumerate(client_reps):
        logits = v @ global_other.T
        log_prob = logits - np.log(
            np.exp(logits).sum(axis=1, keepdims=True))
        w[i] = np.diag(log_prob)
    e = np.exp(w - w.max(axis=0, keepdims=True))
    alpha = e / e.sum(axis=0, keepdims=True)
    return (alpha[:, :, None] * client_reps).sum(axis=0)


def test_con_w_matches_numpy(rng):
    k, n, d = 3, 70, 16
    # L2-normalized reps like the real pipeline (keeps exp() tame).
    reps = rng.normal(size=(k, n, d)).astype(np.float32)
    reps /= np.linalg.norm(reps, axis=-1, keepdims=True)
    g = rng.normal(size=(n, d)).astype(np.float32)
    g /= np.linalg.norm(g, axis=-1, keepdims=True)

    got = np.asarray(con_w_aggregate(jnp.asarray(reps), jnp.asarray(g),
                                     row_block=32, col_block=16))
    expected = naive_con_w(reps, g)
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-6)


def test_aggregate_modalities_cross_weighting(rng):
    """img reps weight against global *txt* features and vice versa
    (MMFL.py:304,321)."""
    k, n, d = 2, 40, 8
    img = rng.normal(size=(k, n, d)).astype(np.float32)
    txt = rng.normal(size=(k, n, d)).astype(np.float32)
    g_img = rng.normal(size=(n, d)).astype(np.float32)
    g_txt = rng.normal(size=(n, d)).astype(np.float32)
    for a in (img, txt, g_img, g_txt):
        a /= np.linalg.norm(a, axis=-1, keepdims=True)

    img_out, txt_out = aggregate_modalities(
        img, txt, jnp.asarray(g_img), jnp.asarray(g_txt),
        row_block=16, col_block=16)
    np.testing.assert_allclose(np.asarray(img_out),
                               naive_con_w(img, g_txt), rtol=1e-4,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(txt_out),
                               naive_con_w(txt, g_img), rtol=1e-4,
                               atol=1e-6)

    only_img, none_txt = aggregate_modalities(img, None,
                                              jnp.asarray(g_img),
                                              jnp.asarray(g_txt),
                                              row_block=16, col_block=16)
    assert none_txt is None and only_img is not None


def test_con_w_mesh_matches_unsharded(rng):
    """Mesh path (shard_map over the client axis) == flat path == numpy,
    including the bucket padding to a multiple of the mesh axis
    (VERDICT r3 #7: no device may gather the whole [K, N, d] stack)."""
    import jax
    from jax.sharding import PartitionSpec as P

    from creamfl_tpu.parallel.mesh import make_mesh

    k, n, d = 3, 40, 8
    reps = rng.normal(size=(k, n, d)).astype(np.float32)
    reps /= np.linalg.norm(reps, axis=-1, keepdims=True)
    g_img = rng.normal(size=(n, d)).astype(np.float32)
    g_txt = rng.normal(size=(n, d)).astype(np.float32)
    for a in (g_img, g_txt):
        a /= np.linalg.norm(a, axis=-1, keepdims=True)

    mesh = make_mesh(n_client=8, n_data=1)
    out_mesh, _ = aggregate_modalities(
        reps, None, jnp.asarray(g_img), jnp.asarray(g_txt),
        row_block=8, col_block=8, mesh=mesh)
    np.testing.assert_allclose(np.asarray(out_mesh),
                               naive_con_w(reps, g_txt),
                               rtol=1e-4, atol=1e-6)

    # The shard_map program's rep input is client-partitioned by
    # construction; verify the placement the wrapper commits to.
    from creamfl_tpu.federation.aggregation import _con_w_mesh_prog
    _, sharding = _con_w_mesh_prog(mesh, "client", 8, 8, False)
    assert sharding.spec == P("client")


def test_con_w_mesh_pallas_interpret(rng):
    """The mesh path keeps the Pallas kernel per-shard: shard_map +
    conw_diag_pallas (interpret mode on CPU) == numpy."""
    from jax.experimental.pallas import tpu as pltpu

    from creamfl_tpu.ops import dispatch
    from creamfl_tpu.parallel.mesh import make_mesh

    k, n, d = 2, 24, 8
    reps = rng.normal(size=(k, n, d)).astype(np.float32)
    reps /= np.linalg.norm(reps, axis=-1, keepdims=True)
    g = rng.normal(size=(n, d)).astype(np.float32)
    g /= np.linalg.norm(g, axis=-1, keepdims=True)

    import jax

    mesh = make_mesh(n_client=2, n_data=1, devices=jax.devices()[:2])
    dispatch.set_backend("pallas")
    try:
        with pltpu.force_tpu_interpret_mode():
            out = con_w_aggregate(jnp.asarray(reps), jnp.asarray(g),
                                  mesh=mesh)
            out = np.asarray(out)
    finally:
        dispatch.set_backend(None)
    np.testing.assert_allclose(out, naive_con_w(reps, g),
                               rtol=1e-4, atol=1e-5)


def test_con_w_bucket_padding_no_recompile(rng):
    """aggregate_modalities pads the client axis to a power-of-two
    bucket: K=3 and K=4 share one compiled program and padded clients
    get zero softmax weight (VERDICT r1 weak #7)."""
    n, d = 24, 8
    g_img = rng.normal(size=(n, d)).astype(np.float32)
    g_txt = rng.normal(size=(n, d)).astype(np.float32)
    for a in (g_img, g_txt):
        a /= np.linalg.norm(a, axis=-1, keepdims=True)

    outs = {}
    cache0 = None
    for k in (3, 4):
        reps = rng.normal(size=(k, n, d)).astype(np.float32)
        reps /= np.linalg.norm(reps, axis=-1, keepdims=True)
        out, _ = aggregate_modalities(reps, None, jnp.asarray(g_img),
                                      jnp.asarray(g_txt),
                                      row_block=8, col_block=8)
        np.testing.assert_allclose(np.asarray(out),
                                   naive_con_w(reps, g_txt),
                                   rtol=1e-4, atol=1e-6)
        from creamfl_tpu.federation.aggregation import _con_w_prog
        size = _con_w_prog._cache_size()
        if cache0 is None:
            cache0 = size
        outs[k] = size
    assert outs[4] == cache0, "K=4 re-used the K=3 bucket's program"
