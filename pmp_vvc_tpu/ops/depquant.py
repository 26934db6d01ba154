"""Dependent quantization (trellis-coded quantization) — decoder-exact.

Contract: DepQuant.cpp (VTM-10.0):
- Quantizer::dequantBlock (:713-780): scan-order state machine starting
  at the last significant position, qIdx = 2*level -/+ (state >> 1),
  QP+1 parameter set (shift = IQUANT_SHIFT + 1 - qpPer - tShift), state
  transition table packed in the 16-bit constant 32040, applied at every
  scan position (zeros included);
- Quantizer::initQuantBlock (:668-711): QShift = QUANT_SHIFT - 1 + qpPer
  + tShift for the forward scale.

The encoder here quantizes greedily in decoding order (distortion-
nearest level in the current state's quantizer); VTM's full 8-state
Viterbi trellis (DepQuant::quant :1627) is the round-2 RDOQ upgrade.
The decoder replays whatever states the levels imply, so greedy output
is conformant by construction.
"""
from __future__ import annotations

import numpy as np

from .quant import (COEFF_MAX, COEFF_MIN, INV_QUANT_SCALES, IQUANT_SHIFT,
                    QUANT_SCALES, QUANT_SHIFT, _geom)

STATE_TAB = 32040


def _params(w, h, qp, bit_depth):
    t_shift, sqrt2 = _geom(w, h, bit_depth)
    qp_dq = qp + 1
    per, rem = qp_dq // 6, qp_dq % 6
    tr_shift = t_shift - sqrt2
    q_shift = QUANT_SHIFT - 1 + per + tr_shift
    q_scale = int(QUANT_SCALES[sqrt2][rem])
    inv_shift = IQUANT_SHIFT + 1 - per - tr_shift
    inv_scale = int(INV_QUANT_SCALES[sqrt2][rem])
    return q_shift, q_scale, inv_shift, inv_scale


def dep_dequant(levels, scan, *, w, h, qp, bit_depth=10):
    """Quantizer::dequantBlock over flat scan (scan[k] = blkPos)."""
    lev = np.asarray(levels).reshape(-1)
    _, _, inv_shift, inv_scale = _params(w, h, qp, bit_depth)
    add = 0 if inv_shift < 0 else (1 << inv_shift) >> 1
    out = np.zeros(w * h, np.int64)
    nz = np.nonzero(lev[scan])[0]
    if nz.size == 0:
        return out.reshape(h, w)
    last = int(nz[-1])
    state = 0
    for k in range(last, -1, -1):
        level = int(lev[scan[k]])
        if level:
            if inv_shift < 0 and k == last:
                inv_scale <<= -inv_shift
            q_idx = (level << 1) + (-(state >> 1) if level > 0
                                    else (state >> 1))
            v = (q_idx * inv_scale + add) >> max(inv_shift, 0)
            out[scan[k]] = min(max(v, COEFF_MIN), COEFF_MAX)
        state = (STATE_TAB >> ((state << 2) + ((level & 1) << 1))) & 3
    return out.reshape(h, w)


def dep_quant_trellis(coef, scan, *, w, h, qp, bit_depth=10, lam=None):
    """4-state Viterbi TCQ (DepQuant::quant :1627, simplified rates).

    Distortion uses VTM's normalization (initQuantBlock :668): cost of
    coding quantization index q for a coefficient with scaled target r is
    F * (q^2 - 2*q*r) relative to coding zero, with
    F = 2^(SCALE_BITS - 2*tShift + sqrt2 + 2*QShift) / (qScale^2 * lam)
    collapsed to float; the rate model is a fixed per-level bin estimate
    instead of VTM's context-exact rates (round-2 refinement).
    """
    c = np.asarray(coef).reshape(-1).astype(np.int64)
    q_shift, q_scale, _, _ = _params(w, h, qp, bit_depth)
    t_shift, sqrt2 = _geom(w, h, bit_depth)
    if lam is None:
        # slice lambda at the internal (bit-depth-offset) QP: distortion
        # is measured in bit_depth-domain squared error (FULL_NBIT), so
        # lambda is driven by the internal QP (EncSlice::initializeLambda
        # bitDepthShift) -- ``qp`` here IS the internal QP already --
        # plus the dep-quant slope adjustment (calculateLambda)
        lam = 0.57 * 2.0 ** ((qp - 12) / 3.0) * 2.0 ** (0.25 / 3.0)
    # nomDistFactor * 2^QShift (initQuantBlock), re-normalized so the
    # rate term is in plain bits (VTM fractional-bit scale / 2^15)
    f = 2.0 ** (-2 * t_shift + sqrt2 + 2 * q_shift) \
        / (float(q_scale) ** 2 * lam)
    r_all = np.abs(c[scan]).astype(np.float64) * q_scale / (1 << q_shift)

    def bits(level):
        if level == 0:
            return 0.7
        b = 2.7                      # sig + gt1 + sign, roughly
        if level >= 2:
            b += 1.0                 # par + gt2
        if level >= 3:
            b += 2.0 * np.log2(level - 1)
        return b

    n = len(scan)
    # find the last position: highest scan index that would code nonzero
    # in the state-0 quantizer with the IRAP dead zone
    last = -1
    for k in range(n - 1, -1, -1):
        if int(np.floor(r_all[k] / 2.0 + 171.0 / 512.0)) > 0:
            last = k
            break
    lev = np.zeros(w * h, np.int64)
    if last < 0:
        return lev.reshape(h, w)

    big = 1e30
    cost = [big] * 4
    cost[0] = 0.0
    back = np.zeros((last + 1, 4), np.int64)     # chosen level per state
    prev = np.zeros((last + 1, 4), np.int8)      # predecessor state
    for k in range(last, -1, -1):
        r = r_all[k]
        ncost = [big] * 4
        nback = [0] * 4
        nprev = [0] * 4
        for s in range(4):
            if cost[s] >= big:
                continue
            off = s >> 1
            base = int(np.floor((r + off) / 2.0))
            cand = {0, max(0, base), base + 1, max(0, base - 1)}
            for L in cand:
                q = (2 * L - off) if L > 0 else 0
                d = f * (q * q - 2.0 * q * r)
                if k == last and L == 0:
                    continue             # last position must be nonzero
                tot = cost[s] + d + bits(L)
                s2 = (STATE_TAB >> ((s << 2) + ((L & 1) << 1))) & 3
                if tot < ncost[s2]:
                    ncost[s2] = tot
                    nback[s2] = L
                    nprev[s2] = s
        cost = ncost
        back[k] = nback
        prev[k] = nprev
    s = int(np.argmin(cost))
    for k in range(0, last + 1):
        L = int(back[k][s])
        lev[scan[k]] = L if c[scan[k]] >= 0 else -L
        s = int(prev[k][s])
    return lev.reshape(h, w)


def dep_quant_greedy(coef, scan, *, w, h, qp, bit_depth=10):
    """Greedy state-following quantization in decoding order.

    Returns (h, w) int levels. Positions above the chosen last are zero;
    from the last downwards each coefficient takes the distortion-best
    level reachable in the current state's quantizer (ties go to the
    smaller level)."""
    c = np.asarray(coef).reshape(-1).astype(np.int64)
    q_shift, q_scale, _, _ = _params(w, h, qp, bit_depth)
    lev = np.zeros(w * h, np.int64)
    # real-valued target in qIdx units (2 qIdx steps per level)
    r_all = np.abs(c[scan]).astype(np.float64) * q_scale / (1 << q_shift)
    state = 0
    found_last = False
    # dead-zone rounding bias matching the scalar IRAP dead zone
    # (dz = 171/512, Quant.cpp): frac >= 2/3 rounds up
    dz = 171.0 / 512.0
    for k in range(len(scan) - 1, -1, -1):
        r = r_all[k]
        off = state >> 1
        L = max(0, int(np.floor((r + off) / 2.0 + dz)))
        if not found_last:
            if L == 0:
                continue                 # still above the last position
            found_last = True
        lev[scan[k]] = L if c[scan[k]] >= 0 else -L
        state = (STATE_TAB >> ((state << 2) + ((L & 1) << 1))) & 3
    return lev.reshape(h, w)
