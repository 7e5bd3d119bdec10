"""AdamP + schedule tests.

AdamP's defining property: for scale-invariant (normalized-output) weights
the radial component of the update is projected out, so the weight norm
grows strictly slower than plain Adam's. Plus exact-match checks of the
schedules against the torch formulas.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from creamfl_tpu.optim import (
    adamp,
    cosine_annealing_schedule,
    make_client_sgd,
    two_step_decay_schedule,
)


def test_adamp_matches_adam_when_no_projection(rng):
    """1-D params never project -> identical to Adam."""
    p = {"b": jnp.asarray(rng.normal(size=(7,)), jnp.float32)}
    g = {"b": jnp.asarray(rng.normal(size=(7,)), jnp.float32)}
    tx_p = adamp(1e-2)
    tx_a = optax.adam(1e-2)
    s_p = tx_p.init(p)
    s_a = tx_a.init(p)
    for _ in range(3):
        up_p, s_p = tx_p.update(g, s_p, p)
        up_a, s_a = tx_a.update(g, s_a, p)
        np.testing.assert_allclose(np.asarray(up_p["b"]),
                                   np.asarray(up_a["b"]), rtol=1e-5)


def test_adamp_projects_radial_component():
    """Gradient orthogonal to the weight (scale-invariant case): the
    update must stay orthogonal to the weight row."""
    w = jnp.asarray([[3.0, 0.0, 0.0, 0.0]])
    g = jnp.asarray([[0.0, 1.0, 0.0, 0.0]])  # orthogonal to w
    tx = adamp(1e-1)
    state = tx.init({"w": w})
    up, _ = tx.update({"w": g}, state, {"w": w})
    radial = float(jnp.sum(up["w"] * w) / jnp.linalg.norm(w))
    assert abs(radial) < 1e-6


def test_adamp_channel_view_groups_output_features():
    """Flax Dense kernels are [in, out]; the channel view must group by
    the LAST axis (output features, matching torch's [out, in] rows).
    With per-output-column-orthogonal gradients the update must lose its
    radial component per column."""
    w = jnp.asarray([[3.0, 0.0], [4.0, 0.0], [0.0, 2.0]])  # [in=3,out=2]
    # grad orthogonal to each w column.
    g = jnp.asarray([[-4.0, 1.0], [3.0, 0.0], [1.0, 0.0]]) * 0.1
    tx = adamp(1e-1)
    state = tx.init({"w": w})
    up, _ = tx.update({"w": g}, state, {"w": w})
    for col in range(2):
        radial = float(jnp.dot(up["w"][:, col], w[:, col])
                       / jnp.linalg.norm(w[:, col]))
        assert abs(radial) < 1e-6, col


def test_adamp_no_projection_when_aligned():
    """Gradient parallel to weight: no projection, update ~ -lr * sign."""
    w = jnp.asarray([[3.0, 0.0], [0.0, 2.0]])
    g = w * 0.5
    tx = adamp(1e-1)
    state = tx.init({"w": w})
    up, _ = tx.update({"w": g}, state, {"w": w})
    # Adam first step: m_hat/sqrt(v_hat) = sign(g); projection would have
    # zeroed the diagonal directions.
    expected = -1e-1 * jnp.sign(g)
    np.testing.assert_allclose(np.asarray(up["w"]), np.asarray(expected),
                               atol=1e-6)


def test_cosine_annealing_matches_torch_formula():
    sched = cosine_annealing_schedule(1e-3, t_max=30)
    for t in [0, 10, 15, 30]:
        expected = 0.5 * 1e-3 * (1 + np.cos(np.pi * t / 30))
        np.testing.assert_allclose(float(sched(t)), expected, rtol=1e-6)


def test_two_step_decay():
    sched = two_step_decay_schedule(1e-4, total_rounds=30, decay=0.1)
    np.testing.assert_allclose(float(sched(0)), 1e-4)
    np.testing.assert_allclose(float(sched(14)), 1e-4)
    np.testing.assert_allclose(float(sched(15)), 1e-5, rtol=1e-5)
    np.testing.assert_allclose(float(sched(24)), 1e-6, rtol=1e-5)


def test_client_sgd_injects_round_lr():
    tx, sched = make_client_sgd(init_lr=1e-2, total_rounds=10)
    p = {"w": jnp.ones((3,))}
    state = tx.init(p)
    state.hyperparams["learning_rate"] = sched(9)  # late round -> lr*0.01
    up, _ = tx.update({"w": jnp.ones((3,))}, state, p)
    # momentum first step: update = -lr * (g + wd*p)
    np.testing.assert_allclose(np.asarray(up["w"]),
                               -1e-4 * (1 + 5e-5) * np.ones(3), rtol=1e-4)


def test_adamp_embedding_channel_axis_rowwise_projection():
    """nn.Embed tables are [vocab, features] (torch layout), so their
    channel view groups by the FIRST axis — one row per vocab entry.
    With per-row-orthogonal gradients the update must lose its radial
    component per ROW, and the projected values must match a numpy
    per-row oracle (regression: the inverse reshape used to scramble
    channel_axis=0 leaves)."""
    rng = np.random.default_rng(0)
    vocab, feat = 5, 4
    w = rng.normal(size=(vocab, feat)).astype(np.float32)
    # Per-row orthogonal gradient: remove each row's radial component.
    g = rng.normal(size=(vocab, feat)).astype(np.float32)
    wn = w / np.linalg.norm(w, axis=1, keepdims=True)
    g = (g - wn * np.sum(wn * g, axis=1, keepdims=True)).astype(np.float32)

    params = {"txt_enc": {"embed": {"embedding": jnp.asarray(w)}}}
    grads = {"txt_enc": {"embed": {"embedding": jnp.asarray(g)}}}
    tx = adamp(1e-1)
    state = tx.init(params)
    up, _ = tx.update(grads, state, params)
    upd = np.asarray(up["txt_enc"]["embed"]["embedding"])

    # Radial component per row must vanish (projection fired per row).
    radial = np.sum(upd * wn, axis=1)
    np.testing.assert_allclose(radial, 0.0, atol=1e-6)

    # Numpy oracle: perturb = m_hat/(sqrt(v_hat)+eps) row-projected.
    b1, b2, eps = 0.9, 0.999, 1e-8
    m = (1 - b1) * g / (1 - b1)
    v = (1 - b2) * g * g / (1 - b2)
    perturb = m / (np.sqrt(v) + eps)
    pn = w / (np.linalg.norm(w, axis=1, keepdims=True) + eps)
    expect = -0.1 * (perturb - pn * np.sum(pn * perturb, axis=1,
                                           keepdims=True))
    np.testing.assert_allclose(upd, expect, rtol=1e-4, atol=1e-5)


def test_adamp_frozen_subtree_resumes_its_own_clock():
    """torch AdamP keeps a per-param state['step'] and skips grad=None
    params entirely, so a subtree frozen for a phase (mm criterion
    during contrast, client_mm.py:187-194) resumes with the bias
    corrections of ITS OWN update count — not the global clock the
    other params advanced. Oracle: the frozen subtree's trajectory must
    equal an uninterrupted adamp run that sees only its real grads."""
    from creamfl_tpu.optim.factory import restore_frozen

    rng = np.random.default_rng(3)

    def vec():
        return jnp.asarray(rng.normal(size=(5,)), jnp.float32)

    params = {"model": vec(), "criterion": vec()}
    crit0 = params["criterion"]
    g1c, g4c = vec(), vec()
    tx = adamp(1e-2)
    state = tx.init(params)

    # Step 1: both subtrees get real grads.
    up, state = tx.update({"model": vec(), "criterion": g1c}, state,
                          params)
    params = optax.apply_updates(params, up)
    # Steps 2-3: criterion frozen (grad=None in torch -> zero grads +
    # post-update restore here, as the engines do).
    for _ in range(2):
        grads = {"model": vec(), "criterion": jnp.zeros(5, jnp.float32)}
        up, new_state = tx.update(grads, state, params)
        new_params = optax.apply_updates(params, up)
        params, state = restore_frozen(("criterion",), new_params,
                                       new_state, params, state)
    # Step 4: criterion thaws.
    up, state = tx.update({"model": vec(), "criterion": g4c}, state,
                          params)
    params = optax.apply_updates(params, up)

    # Uninterrupted oracle over just the criterion's two real grads.
    o_params = {"criterion": crit0}
    o_state = tx.init(o_params)
    for g in (g1c, g4c):
        o_up, o_state = tx.update({"criterion": g}, o_state, o_params)
        o_params = optax.apply_updates(o_params, o_up)

    np.testing.assert_allclose(np.asarray(params["criterion"]),
                               np.asarray(o_params["criterion"]),
                               rtol=1e-6, atol=1e-7)
