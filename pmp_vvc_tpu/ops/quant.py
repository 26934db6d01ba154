"""VVC scalar quantization / dequantization (batched, int32).

Bit-exact semantics of the standard / VTM path with scaling lists and
dependent-quant off (Quant.cpp:954-1031 ``Quant::quant``,
:380-470 ``Quant::dequant``; constants CommonDef.h:328-329,
scale tables Rom.cpp:475-486):

  tShift   = 15 - bitDepth - (log2W + log2H)/2          (ChromaFormat.h:111)
  sqrt2    = (log2W + log2H) odd                        (UnitTools.cpp:3900)
  qBits    = 14 + qp/6 + tShift - sqrt2
  level    = sign * ((|c| * qScale[sqrt2][qp%6] + dz << (qBits-9)) >> qBits)
  deq      = clip16((clip16(level) * iqScale[sqrt2][qp%6] + add) >> rShift)
  rShift   = 6 - (tShift - sqrt2 + qp/6)                (may be negative)

Dead-zone ``dz`` = 171 for IRAP slices (all-intra), 85 otherwise.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

QUANT_SCALES = np.array([[26214, 23302, 20560, 18396, 16384, 14564],
                         [18396, 16384, 14564, 13107, 11651, 10280]],
                        np.int32)
INV_QUANT_SCALES = np.array([[40, 45, 51, 57, 64, 72],
                             [57, 64, 72, 80, 90, 102]], np.int32)

QUANT_SHIFT = 14
IQUANT_SHIFT = 6
MAX_LOG2_DYN_RANGE = 15
COEFF_MIN = -(1 << MAX_LOG2_DYN_RANGE)
COEFF_MAX = (1 << MAX_LOG2_DYN_RANGE) - 1


def _geom(w: int, h: int, bit_depth: int):
    lw, lh = w.bit_length() - 1, h.bit_length() - 1
    t_shift = MAX_LOG2_DYN_RANGE - bit_depth - ((lw + lh) >> 1)
    sqrt2 = (lw + lh) & 1
    return t_shift, sqrt2


@functools.partial(jax.jit,
                   static_argnames=("w", "h", "qp", "bit_depth", "is_irap"))
def quantize(coef: jax.Array, *, w: int, h: int, qp: int, bit_depth: int = 10,
             is_irap: bool = True) -> jax.Array:
    """(..., H, W) int32 transform coeffs -> quantized levels."""
    t_shift, sqrt2 = _geom(w, h, bit_depth)
    scale = int(QUANT_SCALES[sqrt2][qp % 6])
    q_bits = QUANT_SHIFT + qp // 6 + (t_shift - sqrt2)
    dz = 171 if is_irap else 85
    add = dz << (q_bits - 9)
    mag = jnp.abs(coef.astype(jnp.int32))
    level = (mag * scale + add) >> q_bits
    signed = jnp.where(coef < 0, -level, level)
    return jnp.clip(signed, COEFF_MIN, COEFF_MAX)


@functools.partial(jax.jit, static_argnames=("w", "h", "qp", "bit_depth"))
def dequantize(level: jax.Array, *, w: int, h: int, qp: int,
               bit_depth: int = 10) -> jax.Array:
    """Quantized levels -> reconstructed transform coeffs (clip16)."""
    t_shift, sqrt2 = _geom(w, h, bit_depth)
    scale = int(INV_QUANT_SCALES[sqrt2][qp % 6])
    right_shift = IQUANT_SHIFT - ((t_shift - sqrt2) + qp // 6)
    lvl = jnp.clip(level.astype(jnp.int32), COEFF_MIN, COEFF_MAX)
    if right_shift > 0:
        add = 1 << (right_shift - 1)
        deq = (lvl * scale + add) >> right_shift
    else:
        deq = (lvl * scale) << (-right_shift)
    return jnp.clip(deq, COEFF_MIN, COEFF_MAX)


def ts_qp(qp: int, internal_minus_input: int = 0) -> int:
    """Transform-skip QP clamp (QpParam ctor, Quant.cpp:98):
    baseQpTS = max(baseQp, 4 + 6 * internalMinusInputBitDepth)."""
    return max(qp, 4 + 6 * internal_minus_input)


def quantize_ts(resid: np.ndarray, qp: int, *, is_irap: bool = True):
    """Transform-skip forward quantisation (Quant::quant with
    iTransformShift = 0 and no sqrt2 adjustment, Quant.cpp: iQBits =
    QUANT_SHIFT + per; TU::needsSqrt2Scale returns false for TS,
    UnitTools.cpp:3900). ``qp`` must already be TS-clamped."""
    q_bits = QUANT_SHIFT + qp // 6
    scale = int(QUANT_SCALES[0][qp % 6])
    add = (171 if is_irap else 85) << (q_bits - 9)
    r = np.asarray(resid, np.int64)
    mag = (np.abs(r) * scale + add) >> q_bits
    mag = np.minimum(mag, COEFF_MAX)
    return np.where(r < 0, -mag, mag).astype(np.int32)


def dequantize_ts(level: np.ndarray, qp: int):
    """Transform-skip dequantisation (Quant::dequant TS branch:
    rightShift = IQUANT_SHIFT - QP_per, no transform shift); the
    inverse transform is the identity copy (TrQuant::xITransformSkip)."""
    shift = IQUANT_SHIFT - qp // 6
    scale = int(INV_QUANT_SCALES[0][qp % 6])
    lvl = np.clip(np.asarray(level, np.int64), COEFF_MIN, COEFF_MAX)
    if shift > 0:
        deq = (lvl * scale + (1 << (shift - 1))) >> shift
    else:
        deq = (lvl * scale) << (-shift)
    return np.clip(deq, COEFF_MIN, COEFF_MAX).astype(np.int32)
