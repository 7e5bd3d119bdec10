"""Serialization helpers.

``flatten_dict`` matches the reference's pandas-json_normalize-based
flattening of nested score dicts (`src/utils/serialize_utils.py:9`) without
the pandas dependency; ``save_checkpoint``/``load_checkpoint`` provide the
engine checkpoint bundle (`src/algorithms/retrieval_trainer.py:137-174`)
on top of Orbax-compatible pytree serialization.
"""

from __future__ import annotations

import hashlib
import os
import pickle
from typing import Any, Dict

import jax


def flatten_dict(d: Dict[str, Any], sep: str = "_",
                 _parent: str = "") -> Dict[str, Any]:
    """Flatten nested dicts: {'a': {'b': 1}} -> {'a_b': 1}."""
    out: Dict[str, Any] = {}
    for key, val in d.items():
        flat_key = f"{_parent}{sep}{key}" if _parent else str(key)
        if isinstance(val, dict):
            out.update(flatten_dict(val, sep=sep, _parent=flat_key))
        else:
            out[flat_key] = val
    return out


def tree_to_numpy(tree):
    """Device pytree -> host numpy pytree (for pickling / hashing).
    Gathers non-addressable (multi-process mesh) leaves first."""
    from creamfl_tpu.parallel.mesh import to_host

    return jax.tree.map(to_host, tree)


def save_checkpoint(path: str, payload: Dict[str, Any]) -> str:
    """Save a checkpoint bundle; returns a sha1 provenance hash
    (reference tags checkpoints with a model hash, retrieval_trainer.py:151-174).
    """
    # Gather BEFORE any process gating: tree_to_numpy of sharded leaves
    # is a collective on a multi-process mesh — every process must
    # reach it. Only process 0 touches the filesystem (the payload is
    # process-identical).
    host_payload = {
        k: tree_to_numpy(v) if k in ("params", "batch_stats", "opt_state",
                                     "criterion_params") else v
        for k, v in payload.items()
    }
    blob = pickle.dumps(host_payload, protocol=pickle.HIGHEST_PROTOCOL)
    sha1 = hashlib.sha1(blob).hexdigest()
    host_payload["sha1"] = sha1
    if jax.process_index() == 0:
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        with open(path, "wb") as f:
            pickle.dump(host_payload, f, protocol=pickle.HIGHEST_PROTOCOL)
    return sha1


def load_checkpoint(path: str) -> Dict[str, Any]:
    with open(path, "rb") as f:
        return pickle.load(f)
