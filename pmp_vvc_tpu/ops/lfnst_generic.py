"""Size-generic batched LFNST for the device wave path.

Same contracts as ops/lfnst.py (TrQuant.cpp fwdLfnstNxN/invLfnstNxN
:248-326, xFwdLfnst/xInvLfnst :354-562, getLFNSTIntraMode/
getTransposeFlag :328-352), reformulated with CU size and intra mode as
tensor data on padded (B, P, P) tiles: the top-left-region gather is a
per-CU variant-indexed index-table lookup, the kernel set a per-CU
gather from one stacked int-kernel array, and the 16-point secondary
transform ONE batched matmul — MXU-shaped, no per-size Python.
"""
from __future__ import annotations

import functools

import numpy as np

import jax.numpy as jnp

from .lfnst import _DIAG4, _tables

NUM_LUMA_MODE = 67
EXT_HALF = 14
DIA_IDX = 34
_MODE_SHIFT = np.array([0, 6, 10, 12, 14, 15], np.int32)
_LOG2 = np.zeros(129, np.int32)
for _n in (1, 2, 4, 8, 16, 32, 64, 128):
    _LOG2[_n] = int(np.log2(_n))


@functools.cache
def _gather_tables(P):
    """(4, 48) flat source indices + masks for the region gather;
    variants: 0 = 8x8 plain, 1 = 8x8 transposed, 2 = 4x4 plain,
    3 = 4x4 transposed (xFwdLfnst :498-543 orders).  Masked-off slots
    index P*P (out of bounds -> dropped on scatter, zeroed on gather)."""
    idx = np.full((4, 48), P * P, np.int32)

    def put(v, k, y, x):
        idx[v, k] = y * P + x

    k = 0
    for y in range(4):
        for x in range(8):
            put(0, k, y, x)
            k += 1
    for y in range(4, 8):
        for x in range(4):
            put(0, k, y, x)
            k += 1
    for y in range(8):
        for i in range(4):
            put(1, 8 * i + y, y, i)
    for y in range(4):
        for i in range(4):
            put(1, 32 + 4 * i + y, y, 4 + i)
    k = 0
    for y in range(4):
        for x in range(4):
            put(2, k, y, x)
            k += 1
    k = 0
    for y in range(4):
        for x in range(4):
            put(3, k, x, y)
            k += 1
    return idx, (idx < P * P).astype(np.int32)


@functools.cache
def _kernels():
    """lfnstLut + stacked kernels K[sb8, set, idx-1] as (16, 48)
    (the 4x4 kernels occupy the first 16 columns)."""
    lut, m4, m8 = _tables()
    S = m8.shape[0]
    K = np.zeros((2, S, 2, 16, 48), np.int32)
    K[1] = m8
    K[0, :, :, :, :16] = m4
    return np.asarray(lut, np.int32), K


def lfnst_params_generic(modes, ws, hs):
    """(set_idx, transpose) per CU — vectorized lfnst_params (the
    wide-angle extension of getLFNSTIntraMode)."""
    lut, _ = _kernels()
    m = modes.astype(jnp.int32)
    lw = jnp.take(jnp.asarray(_LOG2), ws)
    lh = jnp.take(jnp.asarray(_LOG2), hs)
    shift = jnp.take(jnp.asarray(_MODE_SHIFT), jnp.abs(lw - lh))
    ang = (m > 1) & (m <= 66)
    wam = jnp.where(ang & (ws > hs) & (m < 2 + shift), m + 65,
                    jnp.where(ang & (hs > ws) & (m > 66 - shift),
                              m - 65, m))
    ext = jnp.where(wam < 0, wam + EXT_HALF + NUM_LUMA_MODE,
                    jnp.where(wam >= NUM_LUMA_MODE, wam + EXT_HALF, wam))
    transpose = (ext >= NUM_LUMA_MODE + EXT_HALF) \
        | ((ext < NUM_LUMA_MODE) & (ext > DIA_IDX))
    return jnp.take(jnp.asarray(lut), ext), transpose


def _diag_flat(P):
    d = np.asarray(_DIAG4, np.int32)
    return d[:, 0] * P + d[:, 1]


def _geom(coef, modes, ws, hs, lfnst_idx):
    P = coef.shape[-1]
    idx_tab, msk_tab = _gather_tables(P)
    _, K = _kernels()
    set_idx, transpose = lfnst_params_generic(modes, ws, hs)
    sb8 = ((ws >= 8) & (hs >= 8)).astype(jnp.int32)
    v = (1 - sb8) * 2 + transpose.astype(jnp.int32)
    idx = jnp.take(jnp.asarray(idx_tab), v, axis=0)       # (B, 48)
    msk = jnp.take(jnp.asarray(msk_tab), v, axis=0)
    kern = jnp.asarray(K)[sb8, set_idx, lfnst_idx - 1]     # (B, 16, 48)
    n16 = jnp.where(((ws == 4) & (hs == 4)) | ((ws == 8) & (hs == 8)),
                    8, 16)
    return P, idx, msk, kern, n16


def fwd_lfnst_generic(coef, modes, ws, hs, lfnst_idx: int):
    """(B, P, P) primary coefficients -> secondary coefficients placed
    on the top-left 4x4 diagonal scan; everything else zero."""
    B = coef.shape[0]
    P, idx, msk, kern, n_out = _geom(coef, modes, ws, hs, lfnst_idx)
    flat = coef.reshape(B, -1)
    src = jnp.take_along_axis(
        jnp.pad(flat, ((0, 0), (0, 1))), idx, axis=1) * msk
    out16 = (jnp.einsum("bij,bj->bi", kern, src,
                        preferred_element_type=jnp.int32) + 64) >> 7
    out16 = out16 * (np.arange(16)[None] < n_out[:, None])
    out = jnp.zeros((B, P * P), coef.dtype)
    out = out.at[:, _diag_flat(P)].set(out16.astype(coef.dtype))
    return out.reshape(B, P, P)


def inv_lfnst_generic(coef, modes, ws, hs, lfnst_idx: int):
    """Top-left diagonal secondary coefficients -> primary coefficients
    (clipped to the 15-bit dynamic range, invLfnstNxN :300-326)."""
    B = coef.shape[0]
    P, idx, msk, kern, n_in = _geom(coef, modes, ws, hs, lfnst_idx)
    vec16 = coef.reshape(B, -1)[:, _diag_flat(P)] \
        * (np.arange(16)[None] < n_in[:, None])
    res = (jnp.einsum("bij,bi->bj", kern, vec16,
                      preferred_element_type=jnp.int32) + 64) >> 7
    res = jnp.clip(res, -(1 << 15), (1 << 15) - 1) * msk
    out = jnp.zeros((B, P * P + 1), coef.dtype)
    out = out.at[jnp.arange(B)[:, None], idx].set(res.astype(coef.dtype),
                                                  mode="drop")
    return out[:, :P * P].reshape(B, P, P)
