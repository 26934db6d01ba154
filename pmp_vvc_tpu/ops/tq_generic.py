"""Size-generic transform / quant / distortion — CU size as data.

Companion to ops/intra_generic.py for the wavefront device path: one
compiled program covers every CU shape by padding to a square tile and
driving the size-dependent behaviour with per-CU tensors.

- DCT-II of any size via the *nesting* property of the VVC cores: the
  N-point DCT-2 matrix rows are the (64/N)-strided rows of the 64-point
  matrix (verified in tests against codec/data/transform_cores.npz), so
  per-CU transform matrices are a gather from one constant —
  TrQuant_EMT.cpp's per-size fastFwdDCT2_BN dispatch becomes data.
- forward/inverse shifts, quantiser qBits/scale and dequant shift follow
  ops/transforms.py / ops/quant.py (TrQuant.cpp:806-893,
  Quant.cpp:954-1031) with log2 sizes as tensors.
- SATD uses 8x8 Hadamard tiles when min(w,h) >= 8, else 4x4 (else 2x2),
  masked to the (h, w) region.  This deviates from RdCost::xGetHADs'
  16x8/8x16/8x4/4x8 tilings for extreme aspect ratios — a mode-*decision*
  heuristic only (never touches reconstruction), kept uniform so one
  program serves all shapes.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .distortion import hadamard
from .quant import INV_QUANT_SCALES, IQUANT_SHIFT, QUANT_SCALES, QUANT_SHIFT
from .transforms import COEFF_MAX, COEFF_MIN, MATRIX_SHIFT, core_matrix

MAX_LOG2_DYN_RANGE = 15


def _log2(v):
    """log2 for powers of two in 1..128, as data."""
    return ((v > 1).astype(jnp.int32) + (v > 2) + (v > 4) + (v > 8)
            + (v > 16) + (v > 32) + (v > 64))


def _rshift_v(x, s):
    """Round-shift with per-CU (broadcastable) non-negative shift."""
    return (x + (1 << jnp.maximum(s - 1, 0)) * (s > 0)) >> s


@functools.cache
def _dct2_64():
    return core_matrix(0, 64).astype(np.int32)


def dct2_matrices(n, pad):
    """(B, pad, pad) int32 DCT-2 matrices for per-CU sizes ``n`` (data),
    rows >= zero-out limit and columns >= n zeroed."""
    ln = _log2(n)
    d = _dct2_64()[:, :pad]                           # (64, pad)
    rows = np.arange(pad)[None, :] << (6 - ln)[:, None]       # (B, pad)
    t = jnp.take(d, jnp.clip(rows, 0, 63), axis=0)    # (B, pad, pad)
    keep = jnp.minimum(n, 32)                          # zero-out rule
    i = np.arange(pad)
    mask = (i[None, :, None] < keep[:, None, None]) & \
        (i[None, None, :] < n[:, None, None])
    return jnp.where(mask, t, 0)


@functools.cache
def _mts_table(kind):
    """(4, 32, 32) int32 padded DST-7 / DCT-8 cores for sizes 4..32
    (no nesting property, unlike DCT-2 — four gathered size slots)."""
    out = np.zeros((4, 32, 32), np.int32)
    for i, n in enumerate((4, 8, 16, 32)):
        out[i, :n, :n] = core_matrix(kind, n)
    return out


def tr_matrices(kind, n, pad):
    """(B, pad, pad) transform matrices of static ``kind``
    (transforms.py order: 0 DCT2, 1 DCT8, 2 DST7) for per-CU sizes
    ``n``; MTS zero-out keeps 16 coefficients (nonzero_out_size,
    TrQuant.cpp:777)."""
    if kind == 0:
        return dct2_matrices(n, pad)
    ln = _log2(n)
    t = jnp.take(jnp.asarray(_mts_table(kind)),
                 jnp.clip(ln - 2, 0, 3), axis=0)      # (B, 32, 32)
    if pad > 32:
        t = jnp.pad(t, ((0, 0), (0, pad - 32), (0, pad - 32)))
    elif pad < 32:
        t = t[:, :pad, :pad]       # 8/16-pad tile classes (size <= pad)
    i = np.arange(pad)
    mask = (i[None, :, None] < jnp.minimum(n, 16)[:, None, None]) & \
        (i[None, None, :] < n[:, None, None])
    return jnp.where(mask, t, 0)


def forward_transform_generic(x, w, h, *, bit_depth: int = 10,
                              kind_w: int = 0, kind_h: int = 0):
    """(B, P, P) int32 residual -> coeffs; w/h: (B,) data.  Input columns
    >= w and rows >= h may hold garbage (masked by the matrices).
    ``kind_w``/``kind_h``: static horizontal/vertical cores (MTS)."""
    tw = tr_matrices(kind_w, w, x.shape[-1])
    th_ = tr_matrices(kind_h, h, x.shape[-1])
    lw, lh = _log2(w), _log2(h)
    s1 = (lw + bit_depth + MATRIX_SHIFT - MAX_LOG2_DYN_RANGE)[:, None, None]
    s2 = (lh + MATRIX_SHIFT)[:, None, None]
    t1 = _rshift_v(jnp.einsum("byj,bij->byi", x.astype(jnp.int32), tw,
                              preferred_element_type=jnp.int32), s1)
    t2 = _rshift_v(jnp.einsum("bky,byi->bki", th_, t1,
                              preferred_element_type=jnp.int32), s2)
    return t2


def inverse_transform_generic(c, w, h, *, bit_depth: int = 10,
                              kind_w: int = 0, kind_h: int = 0):
    """(B, P, P) coeffs -> residual (clipped to the 16-bit range)."""
    tw = tr_matrices(kind_w, w, c.shape[-1])
    th_ = tr_matrices(kind_h, h, c.shape[-1])
    s1 = MATRIX_SHIFT + 1
    s2 = MATRIX_SHIFT + MAX_LOG2_DYN_RANGE - 1 - bit_depth
    e = jnp.einsum("bky,bki->byi", th_, c.astype(jnp.int32),
                   preferred_element_type=jnp.int32)
    e = jnp.clip(_rshift_v(e, s1), COEFF_MIN, COEFF_MAX)
    r = jnp.einsum("byi,bij->byj", e, tw,
                   preferred_element_type=jnp.int32)
    return jnp.clip(_rshift_v(r, s2), COEFF_MIN, COEFF_MAX)


def _geom_v(w, h, bit_depth):
    lw, lh = _log2(w), _log2(h)
    t_shift = MAX_LOG2_DYN_RANGE - bit_depth - ((lw + lh) >> 1)
    sqrt2 = (lw + lh) & 1
    return t_shift, sqrt2


def quantize_generic(coef, w, h, qp: int, *, bit_depth: int = 10,
                     is_irap: bool = True):
    t_shift, sqrt2 = _geom_v(w, h, bit_depth)
    scale = jnp.take(QUANT_SCALES[:, qp % 6], sqrt2)
    q_bits = QUANT_SHIFT + qp // 6 + (t_shift - sqrt2)
    dz = 171 if is_irap else 85
    add = dz << (q_bits - 9)
    mag = jnp.abs(coef.astype(jnp.int32))
    level = (mag * scale[:, None, None] + add[:, None, None]) \
        >> q_bits[:, None, None]
    signed = jnp.where(coef < 0, -level, level)
    return jnp.clip(signed, COEFF_MIN, COEFF_MAX)


def dequantize_generic(level, w, h, qp: int, *, bit_depth: int = 10):
    t_shift, sqrt2 = _geom_v(w, h, bit_depth)
    scale = jnp.take(INV_QUANT_SCALES[:, qp % 6], sqrt2)[:, None, None]
    rs = (IQUANT_SHIFT - ((t_shift - sqrt2) + qp // 6))[:, None, None]
    lvl = jnp.clip(level.astype(jnp.int32), COEFF_MIN, COEFF_MAX)
    pos = (lvl * scale + (1 << jnp.maximum(rs - 1, 0)) * (rs > 0)) \
        >> jnp.maximum(rs, 0)
    neg = (lvl * scale) << jnp.maximum(-rs, 0)
    return jnp.clip(jnp.where(rs > 0, pos, neg), COEFF_MIN, COEFF_MAX)


def satd_generic(org, pred, w, h, *, min_dim: int = 4):
    """(B, M, P, P) SATD with per-CU sizes; diffs outside (h, w) are
    masked to zero so padded tiles contribute nothing.  ``min_dim``:
    static lower bound on CU dims (skips the 2x2 pass when >= 4)."""
    P = org.shape[-1]
    i = np.arange(P)
    inside = (i[None, :, None] < h[:, None, None]) & \
        (i[None, None, :] < w[:, None, None])
    d = (org.astype(jnp.int32) - pred.astype(jnp.int32)) \
        * inside[:, None, :, :]

    def tiles(ts):
        nt = P // ts
        hh = hadamard(ts)
        lead = d.shape[:-2]
        v = d.reshape(*lead, nt, ts, nt, ts).astype(jnp.float32)
        coef = jnp.einsum("ij,...ajbk,lk->...abil", hh, v, hh,
                          preferred_element_type=jnp.float32)
        absc = jnp.abs(coef)
        s = jnp.sum(absc, axis=(-2, -1))
        dc = absc[..., 0, 0]
        t = s - dc + jnp.floor(dc / 4.0)
        if ts == 8:
            t = jnp.floor((t + 2.0) / 4.0)
        elif ts == 4:
            t = jnp.floor((t + 1.0) / 2.0)
        return jnp.sum(t, axis=(-2, -1))

    mn = jnp.minimum(w, h)[:, None]
    if P >= 8:
        out = jnp.where(mn >= 8, tiles(8), tiles(4))
    else:
        out = tiles(4)          # 4-pad tiles: every CU is < 8
    if min_dim < 4:
        out = jnp.where(mn >= 4, out, tiles(2))
    return out.astype(jnp.int32)


def rd_cleanup_generic(lev, coef, w, h, qp: int, lam: float,
                       *, bit_depth: int = 10):
    """RDOQ-lite zeroing on 4x4 coding groups, size as data (mirrors
    residual.rd_quant_cleanup's rate model; skipped for dims < 4 where
    the CG geometry differs)."""
    P = lev.shape[-1]
    t_shift, sqrt2 = _geom_v(w, h, bit_depth)
    divisor = jnp.exp2(2.0 * t_shift.astype(jnp.float32)
                       - sqrt2.astype(jnp.float32))
    iscale = jnp.take(INV_QUANT_SCALES[:, qp % 6], sqrt2)[:, None, None]
    rs = (IQUANT_SHIFT - ((t_shift - sqrt2) + qp // 6))[:, None, None]
    fl = lev.astype(jnp.int32)
    fc = coef.astype(jnp.float32)
    pos = (fl * iscale + (1 << jnp.maximum(rs - 1, 0)) * (rs > 0)) \
        >> jnp.maximum(rs, 0)
    neg = (fl * iscale) << jnp.maximum(-rs, 0)
    deq = jnp.where(rs > 0, pos, neg).astype(jnp.float32)
    gain = (fc * fc - (fc - deq) ** 2) / divisor[:, None, None]
    nz = (fl != 0).astype(jnp.float32)
    g = gain.reshape(-1, P // 4, 4, P // 4, 4)
    n = nz.reshape(-1, P // 4, 4, P // 4, 4)
    gsum = g.sum(axis=(2, 4))
    k = n.sum(axis=(2, 4))
    kill_cg = gsum < lam * (3.0 * k + 1.5)
    kill_cg = jnp.repeat(jnp.repeat(kill_cg, 4, axis=1), 4, axis=2)
    out = jnp.where(kill_cg, 0, fl)
    out = jnp.where((jnp.abs(out) == 1) & (gain < lam * 3.0), 0, out)
    ok = (jnp.minimum(w, h) >= 4)[:, None, None]
    return jnp.where(ok, out, fl)
