"""Backend dispatch: Pallas kernels on TPU, XLA-scan versions elsewhere.

Both implementations are numerically equivalent (tested against each
other in interpret mode); the Pallas path owns its block pipelining and
fuses the masked online-softmax with the MXU matmuls.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from creamfl_tpu.ops import gallery as _xla
from creamfl_tpu.ops import pallas_gallery as _pl

_FORCE = None  # None = auto; "pallas" | "xla" for tests/debug


def set_backend(name):
    """Force 'pallas' / 'xla' / None (auto).

    The branch below is taken at TRACE time, so the choice is baked
    into every caller's jit cache (contrast_step etc.). Clearing jax's
    caches here makes the switch actually take effect for same-shape
    calls — without it an A/B backend comparison would compare a cached
    program against itself."""
    global _FORCE
    if name != _FORCE:
        _FORCE = name
        jax.clear_caches()


def _pallas_active() -> bool:
    if _FORCE is not None:
        return _FORCE == "pallas"
    return jax.default_backend() == "tpu"


def gallery_ce(feats, gallery, labels, tau: float = 0.5) -> jnp.ndarray:
    if _pallas_active():
        return _pl.fused_gallery_ce(feats, gallery, labels, tau)
    return _xla.gallery_cross_entropy(feats, gallery, labels, tau=tau)


def conw_diag_log_softmax(v, gallery) -> jnp.ndarray:
    if _pallas_active():
        return _pl.conw_diag_pallas(v, gallery)
    return _xla.gallery_log_softmax_diag(v, gallery)
