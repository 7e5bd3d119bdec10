"""L2 normalization (reference `src/utils/tensor_utils.py` l2_normalize)."""

import jax.numpy as jnp


def l2_normalize(x: jnp.ndarray, axis: int = -1,
                 eps: float = 1e-12) -> jnp.ndarray:
    """x / ||x||_2 along ``axis``.

    Matches torch.nn.functional.normalize(p=2) semantics: the norm is
    clamped from below by ``eps`` to avoid division by zero.
    """
    # Clamp inside the sqrt: sqrt'(0) = inf would turn the zero-vector
    # gradient into NaN via 0 * inf; clamping the squared sum keeps the
    # backward pass finite (value is identical for any non-degenerate x).
    sq = jnp.sum(jnp.square(x), axis=axis, keepdims=True)
    return x / jnp.sqrt(jnp.maximum(sq, eps * eps))
