"""FusedBottleneck (Pallas fused conv+BN+stats) vs the standard flax
Bottleneck: identical param/batch_stats trees, same forward, same
running-stat updates, same gradients — on both the reference backend
and the Pallas kernels (interpret mode on CPU)."""

import contextlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from creamfl_tpu.models.resnet import (Bottleneck, FusedBottleneck,
                                       ResNetBackbone)
from creamfl_tpu.ops import dispatch


@contextlib.contextmanager
def _backend(name):
    try:
        if name == "pallas":
            with pltpu.force_tpu_interpret_mode():
                dispatch.set_backend("pallas")
                yield
        else:
            dispatch.set_backend(None)
            yield
    finally:
        dispatch.set_backend(None)


@pytest.fixture
def setup(key, rng):
    x = jnp.asarray(rng.normal(size=(4, 16, 16, 16)), jnp.float32)
    ref = Bottleneck(filters=8, stride=2)
    fused = FusedBottleneck(filters=8, stride=2)
    variables = ref.init(key, x, False)
    # Perturb running stats so eval mode is load-bearing.
    variables = jax.tree.map(
        lambda a: a + 0.05 * jnp.arange(a.size, dtype=a.dtype
                                        ).reshape(a.shape) / a.size,
        variables)
    return x, ref, fused, variables


def test_param_trees_identical(key):
    x = jnp.zeros((2, 8, 8, 16))
    ref = Bottleneck(filters=8, stride=2).init(key, x, False)
    fused = FusedBottleneck(filters=8, stride=2).init(key, x, False)
    assert (jax.tree.map(jnp.shape, ref)
            == jax.tree.map(jnp.shape, fused))


@pytest.mark.parametrize("backend", ["reference", "pallas"])
@pytest.mark.parametrize("train", [True, False])
def test_forward_and_stats_parity(setup, backend, train):
    x, ref, fused, variables = setup
    out_r, upd_r = ref.apply(variables, x, train,
                             mutable=["batch_stats"])
    with _backend(backend):
        out_f, upd_f = fused.apply(variables, x, train,
                                   mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_r),
                               rtol=1e-5, atol=1e-5)
    for a, b in zip(jax.tree.leaves(upd_f), jax.tree.leaves(upd_r)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("backend", ["reference", "pallas"])
def test_gradient_parity(setup, backend):
    x, ref, fused, variables = setup
    params, bs = variables["params"], variables["batch_stats"]

    def loss(mod, p, xin):
        out = mod.apply({"params": p, "batch_stats": bs}, xin, True,
                        mutable=["batch_stats"])[0]
        return jnp.sum(jnp.square(out) + jnp.sin(out))

    g_r, gx_r = jax.grad(lambda p, xin: loss(ref, p, xin),
                         argnums=(0, 1))(params, x)
    with _backend(backend):
        g_f, gx_f = jax.grad(lambda p, xin: loss(fused, p, xin),
                             argnums=(0, 1))(params, x)
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_r),
                               rtol=5e-4, atol=5e-4)
    flat_r = jax.tree_util.tree_flatten_with_path(g_r)[0]
    flat_f = jax.tree_util.tree_flatten_with_path(g_f)[0]
    for (path, a), (_, b) in zip(flat_f, flat_r):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-4,
            err_msg=jax.tree_util.keystr(path))


def test_backbone_flag_swaps_blocks(key):
    x = jnp.zeros((1, 32, 32, 3))
    std = ResNetBackbone("resnet50").init(key, x, False)
    fus = ResNetBackbone("resnet50", fused_bn=True).init(key, x, False)
    assert (jax.tree.map(jnp.shape, std) == jax.tree.map(jnp.shape, fus))
    out = ResNetBackbone("resnet50", fused_bn=True).apply(fus, x, False)
    assert out.shape == (1, 1, 1, 2048)
    assert np.isfinite(np.asarray(out)).all()
