"""Matrix-based intra prediction (MIP) — decoder-exact, batched for RMD.

Contract: MatrixIntraPrediction.cpp (VTM-10.0):
- prepareInputForPred (:61-120): Haar boundary downsampling + rebase
  around the first reduced sample (DC anchor for sizeId < 2);
- computeReducedPred (:293-335): uint8 weight matmul, MIP_SHIFT_MATRIX=6,
  MIP_OFFSET_MATRIX=32, with the sizeId-2 "weight--" quirk (first input
  term dropped, 7 weights per output);
- predictionUpsampling(1D) (:195-268): horizontal linear upsampling
  against the full left boundary, then vertical against the full top;
- size classes: getMipSizeId / getNumModesMip (UnitTools.cpp:3938-3964).

All shapes static per (w, h); the matmul batches every (mode, transpose)
candidate so one call yields the whole RMD candidate set on the MXU.
"""
from __future__ import annotations

import functools
import pathlib

import jax.numpy as jnp
import numpy as np

_DATA = pathlib.Path(__file__).resolve().parent.parent / "codec" / "data"

MIP_SHIFT = 6
MIP_OFFSET = 32


@functools.cache
def _matrices():
    z = np.load(_DATA / "mip_matrices.npz")
    return (z["mipMatrix4x4"], z["mipMatrix8x8"], z["mipMatrix16x16"])


def size_id(w: int, h: int) -> int:
    if w == 4 and h == 4:
        return 0
    if w == 4 or h == 4 or (w == 8 and h == 8):
        return 1
    return 2


def num_modes(w: int, h: int) -> int:
    return (16, 8, 6)[size_id(w, h)]


def _downsample(vec, n_out):
    n_in = vec.shape[-1]
    if n_in == n_out:
        return vec
    f = n_in // n_out
    s = vec.reshape(vec.shape[:-1] + (n_out, f)).sum(-1)
    return (s + (f >> 1)) >> _log2(f)


def _log2(v):
    return int(np.log2(v))


def _upsample_1d(red, before, factor):
    """predictionUpsampling1D along the last axis.

    red: (..., n) reduced samples; before: (...,) boundary sample
    prepended; returns (..., n * factor)."""
    if factor == 1:
        return red
    prev = jnp.concatenate([before[..., None], red[..., :-1]], axis=-1)
    p = jnp.arange(1, factor + 1, dtype=jnp.int32)          # (f,)
    out = ((factor - p) * prev[..., None] + p * red[..., None]
           + (factor >> 1)) >> _log2(factor)
    return out.reshape(out.shape[:-2] + (-1,))


def predict_mip_all(top, left, *, w: int, h: int, bit_depth: int = 10):
    """All MIP candidate predictions for one block.

    top/left: (2W+3,) / (2H+3,) substituted (unfiltered) reference
    lines with index 0 = the corner (ops.intra.fill_reference_samples
    layout).  Returns (2 * numModes, h, w) int32: index t * numModes + m
    = mode m with transpose flag t.
    """
    sid = size_id(w, h)
    red_b = 2 if sid == 0 else 4
    red_p = 4 if sid < 2 else 8
    n_modes = num_modes(w, h)
    mat = jnp.asarray(_matrices()[sid], jnp.int32)     # (M, rp*rp, in)

    top_full = top[1:1 + w].astype(jnp.int32)
    left_full = left[1:1 + h].astype(jnp.int32)
    red_top = _downsample(top_full, red_b)
    red_left = _downsample(left_full, red_b)

    def reduced_pred(bdry):                            # bdry: (2*red_b,)
        off = bdry[0]
        first = (1 << (bit_depth - 1)) - off if sid < 2 else 0
        vec = jnp.concatenate([jnp.array([first], jnp.int32),
                               bdry[1:] - off])
        if sid == 2:
            vec_m = vec[1:]                            # 7-weight rows
        else:
            vec_m = vec
        add = (1 << (MIP_SHIFT - 1)) - MIP_OFFSET * vec.sum()
        res = (mat @ vec_m + add) >> MIP_SHIFT         # (M, rp*rp)
        res = jnp.clip(res + off, 0, (1 << bit_depth) - 1)
        return res.reshape(n_modes, red_p, red_p)

    bdry_n = jnp.concatenate([red_top, red_left])
    bdry_t = jnp.concatenate([red_left, red_top])
    red_n = reduced_pred(bdry_n)                       # (M, rp, rp)
    red_t = jnp.transpose(reduced_pred(bdry_t), (0, 2, 1))
    red = jnp.concatenate([red_n, red_t], axis=0)      # (2M, rp, rp)

    f_h = w // red_p
    f_v = h // red_p
    out = red
    if f_h > 1:
        # horizontal pass: boundary = left sample of each target row
        # (m_refSamplesLeft[fv - 1 + y * fv], :247)
        lsel = left_full[f_v - 1::f_v][:red_p]         # (rp,)
        out = _upsample_1d(out, jnp.broadcast_to(lsel, out.shape[:-1]),
                           f_h)                        # (2M, rp, w)
    if f_v > 1:
        # vertical pass against the full top boundary
        cols = jnp.swapaxes(out, -1, -2)               # (2M, w, rp)
        t_b = jnp.broadcast_to(top_full, cols.shape[:-1])
        cols = _upsample_1d(cols, t_b, f_v)            # (2M, w, h)
        out = jnp.swapaxes(cols, -1, -2)
    return out
