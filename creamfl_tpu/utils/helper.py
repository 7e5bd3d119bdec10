"""Experiment helpers (reference `src/utils/helper.py`,
`src/utils/Utils.py`, `src/utils/color_lib.py`).

``set_seed``/``get_save_dirs`` mirror the reference's Helper; per-dataset
RGB stats cover the color_lib table entries CreamFL reads
(MMFL.py:134 uses Cifar100's).
"""

from __future__ import annotations

import os
import random
from typing import Dict

import numpy as np

RGB_MEAN: Dict[str, tuple] = {
    "Cifar100": (0.5071, 0.4866, 0.4409),
    "Cifar10": (0.4914, 0.4822, 0.4465),
    "Imagenet": (0.485, 0.456, 0.406),
}
RGB_STD: Dict[str, tuple] = {
    "Cifar100": (0.2673, 0.2564, 0.2762),
    "Cifar10": (0.2470, 0.2435, 0.2616),
    "Imagenet": (0.229, 0.224, 0.225),
}


def set_seed(seed: int) -> None:
    """Python/NumPy seeding (JAX uses explicit PRNG keys, threaded from
    the same seed by the federation layer; there is no global JAX seed
    to set, and no cudnn determinism knob on TPU)."""
    random.seed(seed)
    np.random.seed(seed % (2 ** 32))
    os.environ["PYTHONHASHSEED"] = str(seed)


def get_save_dirs(exp_dir: str, name: str) -> Dict[str, str]:
    """Experiment directory tree (reference helper.py:96-109)."""
    base = os.path.join(exp_dir, name)
    dirs = {
        "base": base,
        "logs": os.path.join(base, "logs"),
        "checkpoints": os.path.join(base, "checkpoints"),
        "results": os.path.join(base, "results"),
    }
    for d in dirs.values():
        os.makedirs(d, exist_ok=True)
    return dirs


def to_one_hot(labels, n_dims: int):
    """Integer labels -> one-hot (reference Utils.py to_one_hot)."""
    import jax.nn

    return jax.nn.one_hot(labels, n_dims)


def fast_prng_key(seed: int):
    """PRNG key for dropout/sampling in hot loops.

    The ``rbg`` implementation (XLA RngBitGenerator) generates random
    bits ~4% faster per server train step than threefry on the chip
    (BENCH.md probe); semantics are identical for dropout. Falls back
    to the default threefry key if the impl is unavailable.
    """
    import jax

    try:
        return jax.random.key(seed, impl="rbg")
    except Exception:
        return jax.random.PRNGKey(seed)
