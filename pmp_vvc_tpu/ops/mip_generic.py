"""Size-generic MIP — block size as *data*, one program for all sizes.

Companion to ops/mip.py (static-shape, oracle-exact) for the wavefront
device path.  The three MIP size classes (MatrixIntraPrediction.cpp,
getMipSizeId UnitTools.cpp:3938) are unified on padded tensors:

- matrices padded into one (3, 16, 64, 8) table; the sizeId-2
  "weight--" quirk (7 weights applied to vec[1:]) is absorbed by
  placing its matrix at input columns 1..7 with column 0 zero;
- Haar boundary downsampling via a data-driven group-membership
  one-hot (exact: group sizes are powers of two);
- reduced prediction as ONE batched int matmul over the padded table
  (the MXU-friendly formulation of computeReducedPred :293-335);
- linear upsampling with per-CU factors as data — the f == 1 case
  degenerates to the identity under the same formula, so no branches.

Bit-exact vs ops.mip.predict_mip_all for every (w, h)
(tests/test_mip_generic.py).
"""
from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from .mip import MIP_OFFSET, MIP_SHIFT, _matrices

MAX_MODES = 16


@functools.cache
def _mip_table():
    m4, m8, m16 = _matrices()
    t = np.zeros((3, MAX_MODES, 64, 8), np.int32)
    t[0, :16, :16, :4] = m4
    t[1, :8, :16, :8] = m8
    t[2, :6, :64, 1:8] = m16          # 7-weight rows act on vec[1:]
    return t


def _log2d(v):
    """log2 for power-of-two data in 1..64."""
    return ((v > 1).astype(jnp.int32) + (v > 2) + (v > 4) + (v > 8)
            + (v > 16) + (v > 32))


def sid_generic(w, h):
    return jnp.where((w == 4) & (h == 4), 0,
                     jnp.where((w == 4) | (h == 4)
                               | ((w == 8) & (h == 8)), 1, 2))


def predict_mip_generic(top_u, left_u, w, h, *, pad: int,
                        bit_depth: int = 10):
    """All MIP candidates for B blocks on a (pad, pad) tile.

    top_u/left_u: (B, 2*pad+3) substituted UNFILTERED reference rows,
    index 0 = corner; w/h: (B,) data.  Returns (preds, n_modes):
    preds (B, 2*MAX_MODES, pad, pad) int32 where index t*MAX_MODES + m
    = mode m, transpose t (only m < n_modes[b] is meaningful);
    n_modes: (B,) per-CU valid mode count."""
    P = pad
    B = w.shape[0]
    sid = sid_generic(w, h)
    red_b = jnp.where(sid == 0, 2, 4)
    red_p = jnp.where(sid < 2, 4, 8)
    n_modes = jnp.take(jnp.asarray(np.array([16, 8, 6], np.int32)), sid)
    maxv = (1 << bit_depth) - 1

    top_full = top_u[:, 1:1 + P].astype(jnp.int32)
    left_full = left_u[:, 1:1 + P].astype(jnp.int32)

    i = np.arange(P)
    j4 = np.arange(4)

    def down(vec, n):
        f = n // red_b
        grp = (i[None, :] * red_b[:, None]) // n[:, None]
        sel = (grp[:, :, None] == j4[None, None, :]) \
            & (i[None, :, None] < n[:, None, None])
        s = jnp.einsum("bp,bpj->bj", vec, sel.astype(jnp.int32))
        return (s + (f[:, None] >> 1)) >> _log2d(f)[:, None]

    rt = down(top_full, w)
    rl = down(left_full, h)

    k8 = np.arange(8)
    from_first = k8[None, :] < red_b[:, None]
    idx_a = jnp.clip(jnp.broadcast_to(k8[None, :], (B, 8)), 0, 3)
    idx_b = jnp.clip(k8[None, :] - red_b[:, None], 0, 3)

    def pack(a, b):
        return jnp.where(from_first, jnp.take_along_axis(a, idx_a, 1),
                         jnp.take_along_axis(b, idx_b, 1))

    valid_k = k8[None, :] < 2 * red_b[:, None]
    mats = jnp.take(jnp.asarray(_mip_table()), sid, axis=0)

    def reduced(bd):
        off = bd[:, 0]
        first = jnp.where(sid < 2, (1 << (bit_depth - 1)) - off, 0)
        vec = jnp.where(valid_k, bd - off[:, None], 0)
        vec = vec.at[:, 0].set(first)
        add = (1 << (MIP_SHIFT - 1)) - MIP_OFFSET * vec.sum(axis=1)
        res = (jnp.einsum("bmik,bk->bmi", mats, vec)
               + add[:, None, None]) >> MIP_SHIFT
        return jnp.clip(res + off[:, None, None], 0, maxv)

    rn = reduced(pack(rt, rl))                  # (B, 16, 64)
    rtr = reduced(pack(rl, rt))

    # 64-vector -> (8, 8) grid with per-CU red_p stride
    r8 = np.arange(8)
    gidx = jnp.clip(r8[:, None] * red_p[:, None, None] + r8[None, :],
                    0, 63).reshape(B, 1, 64)
    grid_n = jnp.take_along_axis(
        rn, jnp.broadcast_to(gidx, rn.shape), axis=2).reshape(B, -1, 8, 8)
    grid_t = jnp.take_along_axis(
        rtr, jnp.broadcast_to(gidx, rtr.shape),
        axis=2).reshape(B, -1, 8, 8)
    cand = jnp.concatenate([grid_n, jnp.swapaxes(grid_t, -1, -2)],
                           axis=1)              # (B, 2*MAX, 8, 8)
    M2 = cand.shape[1]

    f_h = w // red_p
    f_v = h // red_p
    lf_h, lf_v = _log2d(f_h), _log2d(f_v)

    # left boundary samples per reduced row: left_full[(r+1)*f_v - 1]
    lidx = jnp.clip((r8[None, :] + 1) * f_v[:, None] - 1, 0, P - 1)
    lsel = jnp.take_along_axis(left_full, lidx, axis=1)     # (B, 8)

    # horizontal pass: (B, M2, 8, 8) -> (B, M2, 8, P)
    x = np.arange(P)
    jh = (x[None, :] * red_p[:, None]) // w[:, None]        # (B, P)
    ph = x[None, :] - jh * f_h[:, None] + 1
    jh_b = jnp.broadcast_to(jh[:, None, None, :], (B, M2, 8, P))
    redv = jnp.take_along_axis(cand, jh_b, axis=3)
    prevv = jnp.take_along_axis(cand, jnp.maximum(jh_b - 1, 0), axis=3)
    lsel_b = jnp.broadcast_to(lsel[:, None, :, None], prevv.shape)
    prevv = jnp.where(jh_b == 0, lsel_b, prevv)
    num = (f_h[:, None] - ph)[:, None, None, :] * prevv \
        + ph[:, None, None, :] * redv + (f_h >> 1)[:, None, None, None]
    out_h = num >> lf_h[:, None, None, None]

    # vertical pass: rows 8 -> P against the full top boundary
    jv = (x[None, :] * red_p[:, None]) // h[:, None]        # (B, P)
    pv = x[None, :] - jv * f_v[:, None] + 1
    jv_b = jnp.broadcast_to(jv[:, None, :, None], (B, M2, P, P))
    redv2 = jnp.take_along_axis(out_h, jv_b, axis=2)
    prev2 = jnp.take_along_axis(out_h, jnp.maximum(jv_b - 1, 0), axis=2)
    top_b = jnp.broadcast_to(top_full[:, None, None, :],
                             (B, M2, P, P))
    prev2 = jnp.where(jv_b == 0, top_b, prev2)
    num2 = (f_v[:, None] - pv)[:, None, :, None] * prev2 \
        + pv[:, None, :, None] * redv2 + (f_v >> 1)[:, None, None, None]
    preds = num2 >> lf_v[:, None, None, None]
    return preds, n_modes
