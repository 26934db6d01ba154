"""VVC intra prediction — batched over (CU, mode), bit-exact.

Contracts (IntraPrediction.cpp):
- reference line layout          :977-1225 (xFillReferenceSamples) — here
  ``top``/``left`` arrays of length 2W+3 / 2H+3 with index 0 = the
  top-left corner sample, then 2W (2H) reference samples, then 2 slots of
  replication for the angular over-read.
- [1 2 1] reference smoothing    :1227-1262 (xFilterReferenceSamples)
- mode parametrisation           :371-443 (initPredIntraParams): wide-angle
  remap (:183-203), MDIS filter decision (m_aucIntraFilter :58),
  angle/inverse-angle tables, PDPC enablement + scale
- planar                         :298-360
- DC                             :152-180
- angular w/ 4-tap (luma DCT-IF/"cubic" or Gaussian smoothing) and 2-tap
  (chroma) interpolation, negative-angle side projection, PDPC :476-672
- planar/DC PDPC                 :248-271 (in predIntraAng)

Everything is expressed as gathers + elementwise ops over static shapes so
a full 67-mode RMD sweep for a batch of CUs compiles to one XLA program.
Predictions for "horizontal" modes are computed in transposed space and
flipped at the end, exactly like the reference.
"""
from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

PLANAR_IDX, DC_IDX = 0, 1
HOR_IDX, DIA_IDX, VER_IDX, VDIA_IDX = 18, 34, 50, 66
NUM_LUMA_MODE = 67

ANG_TABLE = np.array([0, 1, 2, 3, 4, 6, 8, 10, 12, 14, 16, 18, 20, 23, 26,
                      29, 32, 35, 39, 45, 51, 57, 64, 73, 86, 102, 128, 171,
                      256, 341, 512, 1024], np.int32)
INV_ANG_TABLE = np.array([0, 16384, 8192, 5461, 4096, 2731, 2048, 1638, 1365,
                          1170, 1024, 910, 819, 712, 630, 565, 512, 468, 420,
                          364, 321, 287, 256, 224, 191, 161, 128, 96, 64, 48,
                          32, 16], np.int32)
# MDIS thresholds per log2 size (IntraPrediction.cpp:58)
INTRA_FILTER_THRESH = np.array([24, 24, 24, 14, 2, 0, 0, 0], np.int32)

# 4-tap DCT-IF ("cubic") filter, normative H.266 table
# (InterpolationFilter.cpp:182, spec 8.4.5.2.13)
CHROMA_FILTER = np.array([
    [0, 64, 0, 0], [-1, 63, 2, 0], [-2, 62, 4, 0], [-2, 60, 7, -1],
    [-2, 58, 10, -2], [-3, 57, 12, -2], [-4, 56, 14, -2], [-4, 55, 15, -2],
    [-4, 54, 16, -2], [-5, 53, 18, -2], [-6, 52, 20, -2], [-6, 49, 24, -3],
    [-6, 46, 28, -4], [-5, 44, 29, -4], [-4, 42, 30, -4], [-4, 39, 33, -4],
    [-4, 36, 36, -4], [-4, 33, 39, -4], [-4, 30, 42, -4], [-4, 29, 44, -5],
    [-4, 28, 46, -6], [-3, 24, 49, -6], [-2, 20, 52, -6], [-2, 18, 53, -5],
    [-2, 16, 54, -4], [-2, 15, 55, -4], [-2, 14, 56, -4], [-2, 12, 57, -3],
    [-2, 10, 58, -2], [-1, 7, 60, -2], [0, 4, 62, -2], [0, 2, 63, -1]],
    np.int32)


def _flog2(v: int) -> int:
    return int(v).bit_length() - 1


def wide_angle(width: int, height: int, mode: int) -> int:
    """Wide-angle mode remap (IntraPrediction.cpp:183-203)."""
    if mode <= DC_IDX or mode > VDIA_IDX:
        return mode
    mode_shift = [0, 6, 10, 12, 14, 15]
    delta = abs(_flog2(width) - _flog2(height))
    if width > height and mode < 2 + mode_shift[delta]:
        return mode + (VDIA_IDX - 1)
    if height > width and mode > VDIA_IDX - mode_shift[delta]:
        return mode - (VDIA_IDX - 1)
    return mode


@dataclass(frozen=True)
class ModeParams:
    """Static per-mode parameters for one (w, h, is_luma) geometry."""

    mode: int
    pred_mode: int       # after wide-angle remap
    is_ver: bool
    angle: int           # signed intraPredAngle (1/32 px)
    inv_angle: int
    use_filtered: bool   # reference-filtering (MDIS [1 2 1]) selected
    interpolate_gauss: bool  # Gaussian smoothing 4-tap instead of DCT-IF
    apply_pdpc: bool
    pdpc_scale: int


def mode_params(w: int, h: int, mode: int, *, is_luma: bool = True,
                mrl: int = 0, isp: bool = False) -> ModeParams:
    """initPredIntraParams contract (IntraPrediction.cpp:371-443)."""
    pred_mode = wide_angle(w, h, mode)
    is_ver = pred_mode >= DIA_IDX
    ang_mode = (pred_mode - VER_IDX) if is_ver else -(pred_mode - HOR_IDX)
    apply_pdpc = w >= 4 and h >= 4 and mrl == 0

    angle = inv_angle = 0
    scale = 0
    if DC_IDX < mode < NUM_LUMA_MODE:
        abs_mode = abs(ang_mode)
        angle = int(np.sign(ang_mode) or 1) * int(ANG_TABLE[abs_mode]) \
            if ang_mode != 0 else 0
        inv_angle = int(INV_ANG_TABLE[abs_mode])
        if ang_mode < 0:
            apply_pdpc = False
        elif ang_mode > 0:
            side = h if is_ver else w
            scale = min(2, _flog2(side) - (_flog2(3 * inv_angle - 2) - 8))
            apply_pdpc = apply_pdpc and scale >= 0

    use_filtered = False
    interp = False
    if not (not is_luma or isp or mrl or mode == DC_IDX):
        if mode == PLANAR_IDX:
            use_filtered = w * h > 32
        else:
            diff = min(abs(pred_mode - HOR_IDX), abs(pred_mode - VER_IDX))
            log2_size = (_flog2(w) + _flog2(h)) >> 1
            if diff > int(INTRA_FILTER_THRESH[log2_size]):
                is_int_slope = (abs(angle) & 0x1F) == 0
                use_filtered = is_int_slope
                interp = not is_int_slope
    return ModeParams(mode, pred_mode, is_ver, angle, inv_angle,
                      use_filtered, interp, apply_pdpc, scale)


# ---------------------------------------------------------------------------
# Reference sample preparation
# ---------------------------------------------------------------------------

def fill_reference_samples(top_raw, left_raw, avail_top, avail_left,
                           avail_corner, corner_raw, *, bit_depth: int = 10):
    """VVC reference substitution (spec 8.4.5.2.2 / xFillReferenceSamples).

    top_raw:  (N, 2W) candidate top samples; left_raw: (N, 2H);
    corner_raw: (N,); avail_*: boolean masks of the same shapes.
    Returns (top, left): (N, 2W+3) / (N, 2H+3) with index 0 = corner and
    2 trailing replication slots.
    Substitution scans bottom-left -> corner -> top-right, replacing
    unavailable samples with the previous available one (first samples
    backfilled from the first available; all-DC if nothing available).
    """
    n, w2 = top_raw.shape
    h2 = left_raw.shape[1]
    dc = 1 << (bit_depth - 1)
    # Build the scan: [left reversed (bottom-left first), corner, top]
    scan_vals = jnp.concatenate(
        [left_raw[:, ::-1], corner_raw[:, None], top_raw], axis=1)
    scan_avail = jnp.concatenate(
        [avail_left[:, ::-1], avail_corner[:, None], avail_top], axis=1)
    L = h2 + 1 + w2
    idx = np.arange(L)[None, :]
    # last available index at or before i (-1 if none)
    masked = jnp.where(scan_avail, idx, -1)
    last = jax.lax.cummax(masked, axis=1)
    # first available index overall (for leading run)
    first = jnp.argmax(scan_avail, axis=1)
    any_avail = jnp.any(scan_avail, axis=1)
    gather_idx = jnp.where(last >= 0, last, first[:, None])
    filled = jnp.take_along_axis(scan_vals, gather_idx, axis=1)
    filled = jnp.where(any_avail[:, None], filled, dc)
    left = filled[:, :h2 + 1][:, ::-1]     # [corner, left_0..left_{2H-1}]
    top = filled[:, h2:]                   # [corner, top_0..top_{2W-1}]
    # 2 replication slots for angular over-read (maxIndex extension)
    top = jnp.concatenate([top, top[:, -1:], top[:, -1:]], axis=1)
    left = jnp.concatenate([left, left[:, -1:], left[:, -1:]], axis=1)
    return top, left


def filter_reference_samples(top, left):
    """[1 2 1]/4 smoothing (xFilterReferenceSamples, :1227-1262).

    top: (N, 2W+3), left: (N, 2H+3), index 0 = corner. The last real
    sample (index 2W / 2H) is copied unfiltered; replication slots follow.
    """
    def smooth(row, other_first):
        # corner: (corner + top[1] + left[1] + corner... per reference:
        # (c + top1 + c_row2 + left1 + 2) >> 2 with c appearing twice
        n = row.shape[1] - 2              # index of last real sample + 1? see below
        prev = row[:, :-2]
        cur = row[:, 1:-1]
        nxt = row[:, 2:]
        mid = (prev + 2 * cur + nxt + 2) >> 2
        return mid

    corner = (top[:, 0] + top[:, 1] + left[:, 0] + left[:, 1] + 2) >> 2
    t_mid = smooth(top, left)   # filtered values for indices 1..2W
    l_mid = smooth(left, top)
    # assemble: [corner, filtered 1..len-1, last unfiltered, repl, repl]
    def assemble(row, mid):
        last_real = row.shape[1] - 3       # index 2W
        out = jnp.concatenate(
            [corner[:, None], mid[:, :last_real - 1], row[:, last_real:]],
            axis=1)
        return out
    return assemble(top, t_mid), assemble(left, l_mid)


# ---------------------------------------------------------------------------
# Prediction
# ---------------------------------------------------------------------------

def _predict_planar(top, left, w, h):
    """top/left: (N, >=W+2)/(N, >=H+2) incl. corner at 0. Returns (N,h,w)."""
    log2w, log2h = _flog2(w), _flog2(h)
    t = top[:, 1:w + 2].astype(jnp.int32)      # top[0..w]
    l = left[:, 1:h + 2].astype(jnp.int32)     # left[0..h]
    bottom_left = l[:, h][:, None]
    top_right = t[:, w][:, None]
    xs = jnp.arange(w)
    ys = jnp.arange(h)
    top_row = t[:, :w]
    left_col = l[:, :h]
    # hor[y,x] = (left[y]<<log2w) + (x+1)*(topRight - left[y])
    hor = (left_col[:, :, None] << log2w) + \
        (xs[None, None, :] + 1) * (top_right[:, :, None] - left_col[:, :, None])
    ver = (top_row[:, None, :] << log2h) + \
        (ys[None, :, None] + 1) * (bottom_left[:, :, None] - top_row[:, None, :])
    offset = 1 << (log2w + log2h)
    return ((hor << log2h) + (ver << log2w) + offset) >> (1 + log2w + log2h)


def _predict_dc(top, left, w, h):
    t = top[:, 1:w + 1].astype(jnp.int32)
    l = left[:, 1:h + 1].astype(jnp.int32)
    denom = (w << 1) if w == h else max(w, h)
    shift = _flog2(denom)
    s = 0
    if w >= h:
        s = s + jnp.sum(t, axis=1)
    if w <= h:
        s = s + jnp.sum(l, axis=1)
    dc = (s + (denom >> 1)) >> shift
    return jnp.broadcast_to(dc[:, None, None], (top.shape[0], h, w))


def _pdpc_planar_dc(pred, top, left, w, h):
    """PDPC for planar/DC (predIntraAng :248-271). No clipping."""
    scale = (_flog2(w) - 2 + _flog2(h) - 2 + 2) >> 2
    xs = jnp.arange(w)
    ys = jnp.arange(h)
    wT = 32 >> jnp.minimum(31, (ys[:, None] << 1) >> scale)      # (h,1)
    wL = 32 >> jnp.minimum(31, (xs[None, :] << 1) >> scale)      # (1,w)
    t = top[:, 1:w + 1].astype(jnp.int32)[:, None, :]            # (N,1,w)
    l = left[:, 1:h + 1].astype(jnp.int32)[:, :, None]           # (N,h,1)
    return pred + ((wL[None] * (l - pred) + wT[None] * (t - pred) + 32) >> 6)


def _predict_angular_batch(main_u, main_f, side_u, side_f, mps, wp: int,
                           hp: int, is_luma: bool, bit_depth: int):
    """All angular modes of one orientation in ONE vectorized program.

    ``mps``: list of ModeParams (static), all with the same orientation
    (callers pass vertical modes with (main, side) = (top, left) and
    horizontal modes with the pair swapped + a final transpose).
    main_u/main_f: (N, 2wp+3) unfiltered/filtered main reference rows,
    side_*: (N, 2hp+3).  Returns (N, M, hp, wp) int32.

    The per-mode scalar branches of xPredIntraAng (IntraPrediction.cpp
    :476-660) are folded into data: the integer-slope copy is the 4-tap
    DCT-IF at phase 0 ([0,64,0,0]); the reference's [1 2 1] smoothing +
    copy for smoothed integer-slope modes equals the Gaussian 4-tap at
    phase 0 on the *unfiltered* refs, but we keep the mode's
    use_filtered selection and phase-0 cubic taps so values match the
    scalar path bit-for-bit; the chroma 2-tap lerp ``p0 +
    ((f*(p1-p0)+16)>>5)`` is the 4-tap [0, 64-2f, 2f, 0] exactly.
    """
    n = main_u.shape[0]
    m = len(mps)
    pel_max = (1 << bit_depth) - 1
    angle = np.array([p.angle for p in mps], np.int32)
    inv_angle = np.array([p.inv_angle for p in mps], np.int64)
    use_filt = np.array([p.use_filtered for p in mps], bool)
    gauss = np.array([p.interpolate_gauss for p in mps], bool)
    pdpc = np.array([p.apply_pdpc for p in mps], bool)
    scale = np.array([max(p.pdpc_scale, 0) for p in mps], np.int32)

    filt = jnp.asarray(use_filt)[None, :, None]
    main_sel = jnp.where(filt, main_f[:, None, :],
                         main_u[:, None, :]).astype(jnp.int32)  # (N,M,L)
    side_sel = jnp.where(filt, side_f[:, None, :],
                         side_u[:, None, :]).astype(jnp.int32)  # (N,M,Ls)
    ls = side_sel.shape[2]

    # negative-angle extension, built unconditionally (positive-angle
    # modes never index below ``off``): j in -hp..-1 projected from side
    neg_j = np.arange(1, hp + 1)
    proj = np.minimum((neg_j[None, :] * inv_angle[:, None] + 256) >> 9,
                      hp).astype(np.int32)                       # (M,hp)
    neg = jnp.take_along_axis(side_sel,
                              jnp.asarray(proj[:, ::-1])[None], axis=2)
    ref = jnp.concatenate([neg, main_sel], axis=2)               # (N,M,hp+L)
    off = hp
    l2 = hp + main_sel.shape[2]

    ys = np.arange(hp)
    delta_pos = angle[:, None].astype(np.int64) * (1 + ys[None, :])
    delta_int = (delta_pos >> 5).astype(np.int32)                # (M,hp)
    delta_frac = (delta_pos & 31).astype(np.int32)
    if is_luma:
        half = delta_frac >> 1
        g = np.stack([16 - half, 32 - half, 16 + half, half], axis=-1)
        c = CHROMA_FILTER[delta_frac]
        fs = np.where(gauss[:, None, None], g, c)                # (M,hp,4)
    else:
        zf = np.zeros_like(delta_frac)
        fs = np.stack([zf, 64 - 2 * delta_frac, 2 * delta_frac, zf],
                      axis=-1)
    fs = jnp.asarray(fs)

    xs = np.arange(wp)
    base = off + delta_int[:, :, None] + xs[None, None, :]       # (M,hp,wp)
    acc = jnp.zeros((n, m, hp, wp), jnp.int32)
    for k in range(4):
        idx = np.clip(base + k, 0, l2 - 1).reshape(m, hp * wp)
        vals = jnp.take_along_axis(ref, jnp.asarray(idx)[None],
                                   axis=2).reshape(n, m, hp, wp)
        acc = acc + fs[None, :, :, k:k + 1] * vals
    pred = (acc + 32) >> 6
    pred = jnp.clip(pred, 0, pel_max)

    if pdpc.any():
        zero = angle == 0
        # variant A: angle > 0 — side-projected gather (:624-660)
        inv_sum = 256 + (xs[None, :] + 1) * inv_angle[:, None]
        side_idx = ys[None, :, None] + (inv_sum[:, None, :] >> 9) + 1
        side_idx = np.clip(side_idx, 0, ls - 1).astype(np.int32)
        sv = jnp.take_along_axis(
            side_sel, jnp.asarray(side_idx.reshape(m, hp * wp))[None],
            axis=2).reshape(n, m, hp, wp)
        w_l = 32 >> np.minimum(31, (2 * xs[None, :]) >> scale[:, None])
        adj_pos = (w_l[None, :, None, :] * (sv - pred) + 32) >> 6
        lim = np.minimum(3 << scale, wp)
        adj_pos = jnp.where(
            jnp.asarray((xs[None, :] < lim[:, None]))[None, :, None, :],
            adj_pos, 0)
        pred_pos = pred + adj_pos
        # variant B: angle == 0 (pure hor/ver) — top-left form (:600-622)
        scale0 = (_flog2(wp) + _flog2(hp) - 2) >> 2
        top_left = ref[:, :, off][:, :, None, None]
        lvals = side_sel[:, :, 1:hp + 1][:, :, :, None]
        wl0 = 32 >> np.minimum(31, (2 * xs) >> scale0)
        adj0 = (wl0[None, None, None, :] * (lvals - top_left) + 32) >> 6
        adj0 = jnp.where(jnp.asarray(xs < min(3 << scale0, wp)), adj0, 0)
        pred_zero = jnp.clip(pred + adj0, 0, pel_max)
        which = np.where(~pdpc, 0, np.where(zero, 2, 1))
        sel = jnp.asarray(which)[None, :, None, None]
        pred = jnp.where(sel == 2, pred_zero,
                         jnp.where(sel == 1, pred_pos, pred))
    return pred


def predict_block(top_u, left_u, top_f, left_f, *, w: int, h: int,
                  modes: tuple, is_luma: bool = True, bit_depth: int = 10):
    """Predict a batch of CUs for a static tuple of modes.

    top_u/left_u (and filtered variants): (N, 2W+3)/(N, 2H+3) reference
    rows (index 0 = corner). Returns (N, len(modes), h, w) int32.
    All vertical (horizontal) angular modes compile to one vectorized
    gather program each, so a full 67-mode RMD sweep is ~4 XLA chunks
    instead of 67.
    """
    params = [mode_params(w, h, mode, is_luma=is_luma) for mode in modes]
    outs = [None] * len(modes)
    ver_idx = [i for i, p in enumerate(params)
               if p.mode > DC_IDX and p.is_ver]
    hor_idx = [i for i, p in enumerate(params)
               if p.mode > DC_IDX and not p.is_ver]
    for i, p in enumerate(params):
        if p.mode == PLANAR_IDX:
            top = top_f if p.use_filtered else top_u
            left = left_f if p.use_filtered else left_u
            pred = _predict_planar(top, left, w, h)
            if p.apply_pdpc:
                pred = _pdpc_planar_dc(pred, top, left, w, h)
            outs[i] = pred
        elif p.mode == DC_IDX:
            pred = _predict_dc(top_u, left_u, w, h)
            if p.apply_pdpc:
                pred = _pdpc_planar_dc(pred, top_u, left_u, w, h)
            outs[i] = pred
    if ver_idx:
        preds = _predict_angular_batch(
            top_u, top_f, left_u, left_f, [params[i] for i in ver_idx],
            w, h, is_luma, bit_depth)
        for k, i in enumerate(ver_idx):
            outs[i] = preds[:, k]
    if hor_idx:
        preds = _predict_angular_batch(
            left_u, left_f, top_u, top_f, [params[i] for i in hor_idx],
            h, w, is_luma, bit_depth)
        for k, i in enumerate(hor_idx):
            outs[i] = jnp.swapaxes(preds[:, k], -1, -2)
    return jnp.stack(outs, axis=1)


# ---------------------------------------------------------------------------
# Multi-reference-line prediction (host-side; MRL candidates are few)
# ---------------------------------------------------------------------------

def substitute_line(vals, avail, bit_depth=10):
    """xFillReferenceSamples substitution over one scan-ordered line."""
    vals = np.asarray(vals, np.int64)
    avail = np.asarray(avail, bool)
    if not avail.any():
        return np.full_like(vals, 1 << (bit_depth - 1))
    idx = np.where(avail, np.arange(len(vals)), -1)
    idx = np.maximum.accumulate(idx)
    idx[idx < 0] = int(np.argmax(avail))
    return vals[idx]


def isp_split_dim(width: int, height: int, divide_rows: bool) -> int:
    """CU::getISPSplitDim (UnitTools.cpp:522-545): sub-partition height
    (divide_rows=True, HOR split) or width (VER split)."""
    split_size = height if divide_rows else width
    non_split = width if divide_rows else height
    min_samples = 16                       # 1 << (2*log2(MIN_TB_SIZEY))
    factor = (min_samples >> _flog2(non_split)) \
        if non_split < min_samples else 1
    return max(split_size >> 2, factor)


def can_use_isp(w: int, h: int, max_tb: int = 64) -> bool:
    """CU::canUseISP (UnitTools.cpp:489-498)."""
    return (_flog2(w) + _flog2(h) > 4) and w <= max_tb and h <= max_tb


def can_use_lfnst_with_isp(cu_w: int, cu_h: int, isp: int) -> bool:
    """CU::canUseLfnstWithISP (UnitTools.cpp:500-513); isp 1=HOR, 2=VER."""
    if isp == 0:
        return False
    if isp == 1:
        tw, th_ = cu_w, isp_split_dim(cu_w, cu_h, True)
    else:
        tw, th_ = isp_split_dim(cu_w, cu_h, False), cu_h
    return tw >= 4 and th_ >= 4


def predict_isp(top, left, *, cu_w, cu_h, pw, ph, mode, bit_depth=10):
    """ISP prediction-region prediction (numpy, per-region host loop).

    ``top``/``left``: 1-D int arrays, index 0 = corner sample, followed by
    the region's reference samples with >=2 replication slots appended by
    the caller (initIntraPatternChTypeISP layout).  Wide-angle remap uses
    the CU dims (initPredIntraParams blockSize=cuSize, :382); reference
    smoothing and Gaussian interpolation are off for ISP (:427); PDPC per
    the pred-region dims (:390).  Returns (ph, pw) int64.
    """
    pel_max = (1 << bit_depth) - 1
    top = np.asarray(top, np.int64)
    left = np.asarray(left, np.int64)
    pred_mode = wide_angle(cu_w, cu_h, mode)

    if mode == PLANAR_IDX:
        log2w, log2h = _flog2(pw), _flog2(ph)
        t = top[1:pw + 2]
        l = left[1:ph + 2]
        xs, ys = np.arange(pw), np.arange(ph)
        hor = (l[:ph, None] << log2w) + (xs[None, :] + 1) * (t[pw] - l[:ph, None])
        ver = (t[None, :pw] << log2h) + (ys[:, None] + 1) * (l[ph] - t[None, :pw])
        off = 1 << (log2w + log2h)
        pred = ((hor << log2h) + (ver << log2w) + off) >> (1 + log2w + log2h)
    elif mode == DC_IDX:
        denom = (pw << 1) if pw == ph else max(pw, ph)
        s = 0
        if pw >= ph:
            s += int(top[1:pw + 1].sum())
        if pw <= ph:
            s += int(left[1:ph + 1].sum())
        dc = (s + (denom >> 1)) >> _flog2(denom)
        pred = np.full((ph, pw), dc, np.int64)
    else:
        is_ver = pred_mode >= DIA_IDX
        ang_mode = (pred_mode - VER_IDX) if is_ver else -(pred_mode - HOR_IDX)
        abs_mode = abs(ang_mode)
        sign = -1 if ang_mode < 0 else 1
        angle = sign * int(ANG_TABLE[abs_mode])
        inv_angle = int(INV_ANG_TABLE[abs_mode])
        main = top if is_ver else left
        side = left if is_ver else top
        wp, hp = (pw, ph) if is_ver else (ph, pw)
        apply_pdpc = pw >= 4 and ph >= 4
        scale = 0
        if ang_mode < 0:
            apply_pdpc = False
        elif ang_mode > 0:
            side_sz = ph if is_ver else pw
            scale = min(2, _flog2(side_sz) - (_flog2(3 * inv_angle - 2) - 8))
            apply_pdpc = apply_pdpc and scale >= 0

        if angle < 0:
            size_side = hp
            neg_j = np.arange(1, size_side + 1)
            proj = np.minimum((neg_j * inv_angle + 256) >> 9, size_side)
            ref_main = np.concatenate([side[proj[::-1]], main])
            off = size_side
        else:
            ref_main = main
            off = 0
        L = len(ref_main)
        xs = np.arange(wp)
        if angle == 0:
            pred = np.broadcast_to(ref_main[off + 1:off + 1 + wp],
                                   (hp, wp)).astype(np.int64).copy()
            if apply_pdpc:
                sc = (_flog2(wp) + _flog2(hp) - 2) >> 2
                top_left = ref_main[off]
                l = side[1:hp + 1][:, None]
                wl = 32 >> np.minimum(31, (2 * xs) >> sc)
                adj = (wl[None, :] * (l - top_left) + 32) >> 6
                adj[:, min(3 << sc, wp):] = 0
                pred = np.clip(pred + adj, 0, pel_max)
        else:
            ys = np.arange(hp)
            delta_pos = angle * (1 + ys)
            delta_int = delta_pos >> 5
            delta_frac = delta_pos & 31
            if (abs(angle) & 31) == 0:
                idx = np.clip(off + delta_int[:, None] + xs[None, :] + 1,
                              0, L - 1)
                pred = ref_main[idx]
            else:
                fs = np.asarray(CHROMA_FILTER, np.int64)[delta_frac]
                base = off + delta_int[:, None] + xs[None, :]
                acc = np.zeros((hp, wp), np.int64)
                for k in range(4):
                    acc += fs[:, k:k + 1] * ref_main[np.clip(base + k,
                                                             0, L - 1)]
                pred = np.clip((acc + 32) >> 6, 0, pel_max)
            if apply_pdpc:
                inv_sum = 256 + (xs + 1) * inv_angle
                side_idx = np.clip(ys[:, None] + (inv_sum[None, :] >> 9) + 1,
                                   0, len(side) - 1)
                sval = side[side_idx]
                wl = (32 >> np.minimum(31, (2 * xs) >> scale))[None, :]
                adj = (wl * (sval - pred) + 32) >> 6
                adj[:, min(3 << scale, wp):] = 0
                pred = pred + adj
        if not is_ver:
            pred = pred.T

    if mode in (PLANAR_IDX, DC_IDX) and pw >= 4 and ph >= 4:
        sc = (_flog2(pw) - 2 + _flog2(ph) - 2 + 2) >> 2
        xs, ys = np.arange(pw), np.arange(ph)
        wt = 32 >> np.minimum(31, (ys[:, None] << 1) >> sc)
        wl = 32 >> np.minimum(31, (xs[None, :] << 1) >> sc)
        t = top[1:pw + 1][None, :]
        l = left[1:ph + 1][:, None]
        pred = pred + ((wl * (l - pred) + wt * (t - pred) + 32) >> 6)
    return pred


def predict_mrl(top, left, *, w, h, mode, mri, bit_depth=10):
    """Angular prediction from reference line ``mri`` (1 or 2).

    ``top``/``left``: substituted reference lines of line mri, index 0 =
    the corner sample (x0-1-mri, y0-1-mri); lengths >= 2w+1+mri /
    2h+1+mri.  Contract: xPredIntraAng (:476-660) with refMain/refSide
    += multiRefIdx and deltaPos starting at intraPredAngle*(1+mri); PDPC
    and reference smoothing are off for mri != 0 (initPredIntraParams
    :388-431).  Modes: DC or angular (MRL implies an MPM mode, which
    excludes planar but NOT DC — xGetPredValDc :152-181 sums line
    ``mri`` at offset mri+1, i.e. the samples aligned with the block).
    """
    pel_max = (1 << bit_depth) - 1
    if mode == DC_IDX:
        t = np.asarray(top, np.int64)
        l = np.asarray(left, np.int64)
        s = 0
        if w >= h:
            s += int(t[mri + 1: mri + 1 + w].sum())
        if w <= h:
            s += int(l[mri + 1: mri + 1 + h].sum())
        denom = (w << 1) if w == h else max(w, h)
        dc = (s + (denom >> 1)) >> _flog2(denom)
        return np.full((h, w), dc, np.int64)
    p = mode_params(w, h, mode, is_luma=True, mrl=mri)
    main = np.asarray(top if p.is_ver else left, np.int64)
    side = np.asarray(left if p.is_ver else top, np.int64)
    wp, hp = (w, h) if p.is_ver else (h, w)
    angle, inv_angle = p.angle, p.inv_angle

    if angle < 0:
        size_side = hp
        neg_j = np.arange(1, size_side + 1)
        proj = np.minimum((neg_j * inv_angle + 256) >> 9, size_side)
        ref_main = np.concatenate([side[proj[::-1]], main])
        off = size_side + mri
        last = off - mri + 2 * wp + mri      # refLength + mri in concat space
    else:
        ref_main = main
        off = mri
        last = 2 * wp + mri
    # beyond ``last`` VTM replicates ref_main[last] (xPredIntraAng
    # :530-536); clamp indices there, never into provided tail storage
    L = last + 1
    xs = np.arange(wp)

    if angle == 0:
        pred = np.broadcast_to(ref_main[off + 1: off + 1 + wp],
                               (hp, wp)).copy()
    else:
        ys = np.arange(hp)
        delta_pos = angle * (1 + mri + ys)
        delta_int = delta_pos >> 5
        delta_frac = delta_pos & 31
        if (abs(angle) & 31) == 0:
            idx = np.clip(off + delta_int[:, None] + xs[None, :] + 1,
                          0, L - 1)
            pred = ref_main[idx]
        else:
            fs = np.asarray(CHROMA_FILTER, np.int64)[delta_frac]  # (hp, 4)
            base = off + delta_int[:, None] + xs[None, :]
            acc = np.zeros((hp, wp), np.int64)
            for k in range(4):
                acc += fs[:, k:k + 1] * ref_main[np.clip(base + k, 0, L - 1)]
            pred = np.clip((acc + 32) >> 6, 0, pel_max)
    return pred if p.is_ver else pred.T
