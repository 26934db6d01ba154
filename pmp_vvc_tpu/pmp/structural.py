"""QT-depth map structural-consistency vote (post-processing).

Functional contract: Metrics.py:612-637 (``eli_structual_error`` +
``check_square_unity``): the raw 8x8 QT-depth regression output is 2x2
max-pooled, rounded, clamped to [0,3], then each 4x4 map is repaired by
majority voting so the implied quadtree is structurally consistent, and
nearest-upsampled back to 8x8.

Implemented fully vectorized over the batch (no per-sample Python loop) so
it runs as one fused XLA program on TPU.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _check_square_unity(mat: jax.Array) -> jax.Array:
    """Vectorized repair of one 4x4 depth map; ``mat`` is (..., 4, 4)."""
    num0 = jnp.sum(mat == 0, axis=(-2, -1), keepdims=True)

    # Case A (num0 <= 12): promote zeros to 1, then harmonize each 2x2 quadrant.
    a = jnp.where(mat == 0, 1.0, mat)
    quads = a.reshape(*a.shape[:-2], 2, 2, 2, 2).transpose(
        *range(a.ndim - 2), -4, -2, -3, -1)  # (..., 2, 2, 2, 2) quadrant-major
    qsum = jnp.sum(quads, axis=(-2, -1), keepdims=True)
    n1 = jnp.sum(quads == 1, axis=(-2, -1), keepdims=True)
    mixed = (qsum >= 5) & (qsum <= 10)
    promoted = jnp.where(quads == 1, 2.0, quads)   # minority 1s -> 2
    flattened = jnp.ones_like(quads)               # majority 1s -> all 1
    quads = jnp.where(mixed, jnp.where(n1 < 3, promoted, flattened), quads)
    a = quads.transpose(*range(a.ndim - 2), -4, -2, -3, -1).reshape(mat.shape)

    out = jnp.where(num0 <= 12, a, mat)
    # Case B (12 < num0 < 16): all zeros. num0 == 16 is untouched (already 0).
    return jnp.where((num0 > 12) & (num0 < 16), jnp.zeros_like(mat), out)


def structural_vote(qt_raw: jax.Array) -> jax.Array:
    """(N, 8, 8[, 1]) raw QT-depth output -> structurally repaired (same shape)."""
    squeeze = qt_raw.ndim == 4
    x = qt_raw[..., 0] if squeeze else qt_raw
    pooled = jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 2, 2), (1, 2, 2), "VALID")
    pooled = jnp.clip(jnp.round(pooled), 0, 3)
    repaired = _check_square_unity(pooled)
    up = jnp.repeat(jnp.repeat(repaired, 2, axis=-2), 2, axis=-1)
    return up[..., None] if squeeze else up
