"""Aux-component tests: loss factory, match_prob eval mode, uncertainty
heads, helpers, profiling."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from creamfl_tpu.engine.evaluator import RetrievalEvaluator
from creamfl_tpu.losses.factory import create, triplet_loss
from creamfl_tpu.losses.mcsoft import (MCSoftContrastiveConfig,
                                       init_mcsoft_params, match_prob,
                                       kl_divergence, uniformity_loss)
from creamfl_tpu.models.uncertainty import (UncertaintyModule,
                                            sample_gaussian_embeddings)
from creamfl_tpu.utils.helper import get_save_dirs, set_seed, to_one_hot
from creamfl_tpu.utils.profiling import StepTimer


def test_loss_factory():
    assert create("softmax").__name__ == "cross_entropy"
    assert create("triplet") is triplet_loss
    with pytest.raises(NotImplementedError):
        create("histogram")
    with pytest.raises(ValueError):
        create("nope")


def test_match_prob_reference_formula(rng):
    params = init_mcsoft_params(MCSoftContrastiveConfig())
    q = rng.normal(size=(3, 8)).astype(np.float32)
    g = rng.normal(size=(5, 8)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    g /= np.linalg.norm(g, axis=1, keepdims=True)
    got = np.asarray(match_prob(params, jnp.asarray(q), jnp.asarray(g)))
    d = np.sqrt(((q[:, None] - g[None]) ** 2).sum(-1) + 1e-6)
    s = -15.0 * d + 15.0
    expected = np.exp(s) / (np.exp(s) + np.exp(-s))
    # probabilities span e^-60..1 here; compare with a denormal-safe atol
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-25)
    assert got.shape == (3, 5)


def test_matching_prob_eval_ranks_by_distance(rng):
    """matching_prob is monotone-decreasing in distance, so with unit
    vectors it must produce the same ranking as matmul."""
    params = init_mcsoft_params(MCSoftContrastiveConfig())
    q = rng.normal(size=(6, 8)).astype(np.float32)
    g = rng.normal(size=(15, 8)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    g /= np.linalg.norm(g, axis=1, keepdims=True)
    ql = np.arange(6)
    gl = np.concatenate([np.arange(6), rng.integers(0, 6, size=9)])

    ev_mm = RetrievalEvaluator(n_crossfolds=0)
    ev_mp = RetrievalEvaluator(n_crossfolds=0,
                               eval_method="matching_prob",
                               criterion_params=params)
    s_mm = ev_mm.evaluate_recall(q, g, ql, gl)
    s_mp = ev_mp.evaluate_recall(q, g, ql, gl)
    assert s_mm == s_mp


def test_uncertainty_module_shapes(key):
    m = UncertaintyModule(d_out=16, d_hidden=8)
    pooled = jnp.ones((2, 16))
    tokens = jax.random.normal(key, (2, 5, 16))
    variables = m.init(key, pooled, tokens)
    logsigma = m.apply(variables, pooled, tokens)
    assert logsigma.shape == (2, 16)
    samples = sample_gaussian_embeddings(pooled, logsigma, 7, key)
    assert samples.shape == (2, 7, 16)


def test_uniformity_and_kl(rng):
    x = rng.normal(size=(6, 4)).astype(np.float32)
    u = float(uniformity_loss(jnp.asarray(x)))
    assert np.isfinite(u)
    mu = jnp.zeros((3, 4))
    ls = jnp.zeros((3, 4))
    np.testing.assert_allclose(float(kl_divergence(mu, ls)), 0.0,
                               atol=1e-6)


def test_helpers(tmp_path):
    set_seed(123)
    dirs = get_save_dirs(str(tmp_path), "exp1")
    assert all(np.asarray([os.path.isdir(d) for d in dirs.values()]))
    oh = np.asarray(to_one_hot(jnp.asarray([1, 0]), 3))
    np.testing.assert_array_equal(oh, [[0, 1, 0], [1, 0, 0]])


def test_step_timer():
    t = StepTimer()
    with t.phase("a"):
        pass
    with t.phase("a"):
        pass
    summary = t.report(0)
    assert "a_s" in summary and t.totals == {}


def test_init_distributed_arg_validation():
    """All three explicit args or none: partial specs used to pass
    coordinator=None through to jax.distributed.initialize."""
    import pytest as _pytest

    from creamfl_tpu.parallel.mesh import init_distributed

    with _pytest.raises(ValueError):
        init_distributed(num_processes=2)
    with _pytest.raises(ValueError):
        init_distributed(process_id=1)
    # Auto mode is a no-op only without cluster env vars — clear them
    # so the test is environment-independent (on a SLURM/TPU host the
    # bare call would legitimately try to initialize).
    import os
    saved = {k: os.environ.pop(k) for k in
             ("COORDINATOR_ADDRESS", "SLURM_JOB_ID", "TPU_WORKER_ID",
              "CLOUD_TPU_TASK_ID") if k in os.environ}
    try:
        init_distributed()
    finally:
        os.environ.update(saved)


def test_recall_scores_empty_ranks_clear_error():
    import numpy as np
    import pytest as _pytest

    from creamfl_tpu.engine.evaluator import _recall_scores

    with _pytest.raises(ValueError, match="empty eval set"):
        _recall_scores(np.array([], dtype=np.int32))


def test_evaluator_set_criterion_params_rebuilds_scorer():
    """matching_prob bakes the criterion params into the jitted ranking
    program (static-arg closure); set_criterion_params must swap in a
    fresh closure so updated shift/negative_scale take effect."""
    import jax.numpy as jnp
    import numpy as np

    from creamfl_tpu.engine.evaluator import RetrievalEvaluator

    p1 = {"shift": jnp.asarray([0.0]),
          "negative_scale": jnp.asarray([1.0])}
    ev = RetrievalEvaluator(eval_method="matching_prob",
                            criterion_params=p1)
    q = jnp.asarray(np.eye(2, 4, dtype=np.float32))
    g = jnp.asarray(np.eye(2, 4, dtype=np.float32))
    s1 = np.asarray(ev._sims_fn(q, g))
    p2 = {"shift": jnp.asarray([5.0]),
          "negative_scale": jnp.asarray([1.0])}
    ev.set_criterion_params(p2)
    s2 = np.asarray(ev._sims_fn(q, g))
    assert not np.allclose(s1, s2), "updated params were ignored"
