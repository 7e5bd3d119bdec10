"""Checkpoint / resume.

The reference only saves (engine bundles at
`retrieval_trainer.py:137-149`, bare ``{'net': state_dict}`` best/last at
`MMFL.py:281-284`); its ``load_state_dict`` resume helper is never wired
(`retrieval_trainer.py:176-180`). Here checkpointing is round-grained and
resumable: server EngineState + every client EngineState + round counter
+ best-score bookkeeping, written with Orbax when available (async-safe,
TPU-friendly) and a pickle fallback otherwise.
"""

from __future__ import annotations

import os
import pickle
from typing import Any, Dict, Optional

import jax


def _to_host(tree):
    from creamfl_tpu.parallel.mesh import to_host

    return jax.tree.map(to_host, tree)


class RoundCheckpointer:
    """Per-round federated checkpoints with keep-last-k retention."""

    def __init__(self, directory: str, keep: int = 3,
                 use_orbax: bool = True):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.keep = keep
        self._orbax = None
        if use_orbax:
            try:
                import orbax.checkpoint as ocp

                self._orbax = ocp.PyTreeCheckpointer()
            except Exception:
                self._orbax = None

    def _path(self, round_n: int) -> str:
        return os.path.join(self.directory, f"round_{round_n:05d}")

    # -- save ----------------------------------------------------------
    def save(self, round_n: int, payload: Dict[str, Any]) -> str:
        """payload: {'server': EngineState-pytree, 'clients': [...],
        'meta': {...}} — anything jax.tree-mappable."""
        path = self._path(round_n)
        # All processes gather (collective for sharded leaves); one
        # writes — the payload is process-identical on a multi-process
        # mesh and concurrent writers would race on the same paths.
        host = _to_host(payload)
        if jax.process_index() != 0:
            return path
        if self._orbax is not None:
            self._orbax.save(path, host, force=True)
        else:
            os.makedirs(path, exist_ok=True)
            with open(os.path.join(path, "state.pkl"), "wb") as f:
                pickle.dump(host, f, protocol=pickle.HIGHEST_PROTOCOL)
        self._gc()
        return path

    def _gc(self):
        rounds = self.list_rounds()
        for r in rounds[: max(0, len(rounds) - self.keep)]:
            import shutil

            shutil.rmtree(self._path(r), ignore_errors=True)

    # -- load ----------------------------------------------------------
    def list_rounds(self):
        out = []
        for name in sorted(os.listdir(self.directory)):
            if name.startswith("round_"):
                try:
                    out.append(int(name.split("_")[1]))
                except ValueError:
                    pass
        return sorted(out)

    def latest_round(self) -> Optional[int]:
        rounds = self.list_rounds()
        return rounds[-1] if rounds else None

    def restore(self, round_n: Optional[int] = None,
                template: Optional[Dict[str, Any]] = None
                ) -> Optional[Dict[str, Any]]:
        if round_n is None:
            round_n = self.latest_round()
            if round_n is None:
                return None
        path = self._path(round_n)
        if self._orbax is not None and not os.path.exists(
                os.path.join(path, "state.pkl")):
            restored = (self._orbax.restore(path, item=template)
                        if template is not None
                        else self._orbax.restore(path))
        else:
            with open(os.path.join(path, "state.pkl"), "rb") as f:
                restored = pickle.load(f)
        restored.setdefault("meta", {})["round"] = round_n
        return restored
