"""Round checkpoint save/restore/retention tests."""

import jax.numpy as jnp
import numpy as np

from creamfl_tpu.utils.checkpoint import RoundCheckpointer
from creamfl_tpu.engine.state import EngineState


def _state(v):
    return EngineState(params={"w": jnp.full((3,), float(v))},
                       batch_stats={}, opt_state=(), step=v)


def test_save_restore_roundtrip(tmp_path):
    ck = RoundCheckpointer(str(tmp_path), keep=5)
    payload = {"server": _state(1), "clients": [_state(2), _state(3)],
               "meta": {"best_score": 12.5, "round": 4}}
    ck.save(4, payload)
    restored = ck.restore(template=payload)
    assert restored["meta"]["round"] == 4
    np.testing.assert_allclose(
        np.asarray(restored["server"].params["w"]), 1.0)
    np.testing.assert_allclose(
        np.asarray(restored["clients"][1].params["w"]), 3.0)
    assert float(restored["meta"]["best_score"]) == 12.5


def test_latest_and_retention(tmp_path):
    ck = RoundCheckpointer(str(tmp_path), keep=2)
    for r in range(5):
        ck.save(r, {"server": _state(r), "clients": [],
                    "meta": {"round": r}})
    assert ck.latest_round() == 4
    assert ck.list_rounds() == [3, 4]  # keep-last-2

    restored = ck.restore(
        template={"server": _state(0), "clients": [],
                  "meta": {"round": 0}})
    assert restored["meta"]["round"] == 4


def test_restore_empty_dir(tmp_path):
    ck = RoundCheckpointer(str(tmp_path))
    assert ck.restore() is None
