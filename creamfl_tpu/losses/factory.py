"""Classification-loss factory (reference `src/losses/__init__.py`).

The reference registers a dozen metric-learning losses, of which only
``softmax`` (plain CE) is ever used by CreamFL (default
``loss='softmax'`` at ClientTrainer.py:137; see SURVEY.md §2.2 item 12).
We provide the live one plus the two simple legacy ones (triplet,
center); the remaining legacy names raise with a pointer, by design —
they are dead code in the reference pipeline.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from creamfl_tpu.losses.classification import cross_entropy

_LEGACY_DEAD = ("batchall", "batchhard", "neighbour", "nhard",
                "histogram", "distance_match", "gaussian_metric",
                "center_triplet")


def triplet_loss(embeddings: jnp.ndarray, labels: jnp.ndarray,
                 margin: float = 1.0) -> jnp.ndarray:
    """Batch-hard triplet loss on L2 distances."""
    d = jnp.sqrt(jnp.maximum(
        jnp.sum(embeddings ** 2, 1)[:, None]
        - 2 * embeddings @ embeddings.T
        + jnp.sum(embeddings ** 2, 1)[None, :], 0.0) + 1e-12)
    same = labels[:, None] == labels[None, :]
    eye = jnp.eye(len(labels), dtype=bool)
    pos = jnp.max(jnp.where(same & ~eye, d, 0.0), axis=1)
    neg = jnp.min(jnp.where(~same, d, jnp.inf), axis=1)
    neg = jnp.where(jnp.isinf(neg), 0.0, neg)
    return jnp.mean(jnp.maximum(pos - neg + margin, 0.0))


def center_loss(embeddings: jnp.ndarray, labels: jnp.ndarray,
                centers: jnp.ndarray) -> jnp.ndarray:
    """Mean squared distance to class centers."""
    c = jnp.take(centers, labels, axis=0)
    return jnp.mean(jnp.sum((embeddings - c) ** 2, axis=1))


def create(name: str = "softmax") -> Callable:
    name = name.lower()
    if name == "softmax":
        return cross_entropy
    if name == "triplet":
        return triplet_loss
    if name == "center":
        return center_loss
    if name in _LEGACY_DEAD:
        raise NotImplementedError(
            f"loss {name!r} is legacy dead code in the reference "
            f"(never reached by CreamFL); use 'softmax'")
    raise ValueError(f"unknown loss {name!r}")
