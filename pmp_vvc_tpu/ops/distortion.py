"""Distortion kernels: Hadamard SATD, SAD, SSE — batched, MXU-formulated.

Bit-exact contracts (RdCost.cpp):
- ``satd``: xGetHADs (:2828-2951) — tile the block per VTM's rules
  (16x8 / 8x16 / 8x4 / 4x8 / 8x8 / 4x4 / 2x2), per-tile 2-D Hadamard of
  differences with mean-scaled DC (JVET-R0164: satd - |DC| + (|DC|>>2)),
  per-tile normalization ((s+2)>>2 for 8x8, (s+1)>>1 for 4x4,
  trunc(s/sqrt(wh)*2) for non-square).
- ``sse``: xGetSSE — per-element d*d.
- ``sad``: xGetSAD — sum |d|.

VTM10 uses full-precision distortion: DISTORTION_PRECISION_ADJUSTMENT is 0
(TypeDef.h:379), i.e. no bit-depth shift — lambda absorbs the scaling. The
``bit_depth`` kwargs are kept for API stability but do not rescale.

Hadamard ordering note: any +-1 Hadamard with an all-ones first row gives
the same |coeff| multiset, so the Sylvester matrix product H_h @ D @ H_w^T
reproduces VTM's butterfly results exactly (DC lands at [0,0]). All sums
fit float32's 2^24 integer range, so the matmuls run on the MXU in f32.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np


@functools.cache
def hadamard(n: int) -> np.ndarray:
    if n == 1:
        return np.array([[1.0]], np.float32)
    h = hadamard(n // 2)
    return np.block([[h, h], [h, -h]]).astype(np.float32)


def _tile_shape(w: int, h: int) -> tuple[int, int]:
    """VTM xGetHADs tiling rule -> (tile_h, tile_w)."""
    if w > h and h % 8 == 0 and w % 16 == 0:
        return 8, 16
    if w < h and w % 8 == 0 and h % 16 == 0:
        return 16, 8
    if w > h and h % 4 == 0 and w % 8 == 0:
        return 4, 8
    if w < h and w % 4 == 0 and h % 8 == 0:
        return 8, 4
    if h % 8 == 0 and w % 8 == 0:
        return 8, 8
    if h % 4 == 0 and w % 4 == 0:
        return 4, 4
    if h % 2 == 0 and w % 2 == 0:
        return 2, 2
    raise ValueError(f"invalid SATD size {w}x{h}")


@functools.partial(jax.jit, static_argnames=("bit_depth",))
def _satd_tiles(diff: jax.Array, bit_depth: int) -> jax.Array:
    """(..., T, th, tw) int diffs -> (...,) per-batch SATD sums."""
    th, tw = diff.shape[-2], diff.shape[-1]
    hh = jnp.asarray(hadamard(th))
    hw = jnp.asarray(hadamard(tw))
    d = diff.astype(jnp.float32)
    coef = jnp.einsum("ij,...jk,lk->...il", hh, d, hw,
                      preferred_element_type=jnp.float32)
    absc = jnp.abs(coef)
    s = jnp.sum(absc, axis=(-2, -1))
    dc = absc[..., 0, 0]
    if (th, tw) == (2, 2):
        tile = s - dc + jnp.floor(dc / 4.0)
    else:
        tile = s - dc + jnp.floor(dc / 4.0)
        if (th, tw) == (8, 8):
            tile = jnp.floor((tile + 2.0) / 4.0)
        elif (th, tw) == (4, 4):
            tile = jnp.floor((tile + 1.0) / 2.0)
        else:
            scale = 2.0 / math.sqrt(th * tw)
            tile = jnp.trunc(tile.astype(jnp.float64 if jax.config.x64_enabled
                                         else jnp.float32) * scale)
    return jnp.sum(tile, axis=-1).astype(
        jnp.int64 if jax.config.x64_enabled else jnp.int32)


def satd(org: jax.Array, cur: jax.Array, *, bit_depth: int = 10) -> jax.Array:
    """(..., H, W) x2 -> (...,) SATD (VTM xGetHADs semantics)."""
    h, w = org.shape[-2], org.shape[-1]
    th, tw = _tile_shape(w, h)
    diff = org.astype(jnp.int32) - cur.astype(jnp.int32)
    nth, ntw = h // th, w // tw
    lead = diff.shape[:-2]
    d = diff.reshape(*lead, nth, th, ntw, tw)
    d = jnp.moveaxis(d, -2, -3).reshape(*lead, nth * ntw, th, tw)
    return _satd_tiles(d, bit_depth)


@functools.partial(jax.jit, static_argnames=("bit_depth",))
def sad(org: jax.Array, cur: jax.Array, *, bit_depth: int = 10) -> jax.Array:
    d = jnp.abs(org.astype(jnp.int32) - cur.astype(jnp.int32))
    return jnp.sum(d, axis=(-2, -1))


@functools.partial(jax.jit, static_argnames=("bit_depth",))
def sse(org: jax.Array, cur: jax.Array, *, bit_depth: int = 10) -> jax.Array:
    d = org.astype(jnp.int64 if jax.config.x64_enabled else jnp.int32) \
        - cur.astype(jnp.int32)
    return jnp.sum(d * d, axis=(-2, -1))
