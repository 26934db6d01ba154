"""Size-generic VVC intra prediction — CU size and mode as *data*.

The per-size batched predictor in ``ops/intra.py`` specialises the XLA
program on (w, h): fine for a handful of geometries, but the wavefront
frame encoder sees every legal CU shape (4..64 per dim), and compiling
one program per shape is what made the round-2 TPU path pay ~900 s of
compile for a single frame geometry.  This module instead treats the CU
width/height (and the prediction mode) as per-CU *tensor data* on a
square padded tile, so ONE compiled program covers every CU shape:

- per-(size, mode) scalar parameters of initPredIntraParams
  (IntraPrediction.cpp:371-443) — wide-angle remap, intraPredAngle,
  inverse angle, MDIS reference-filter selection, Gaussian-vs-DCT-IF
  interpolation, PDPC enable + scale — are precomputed into small
  (6, 6, 67) tables and *gathered* per CU;
- orientation (vertical vs horizontal prediction) becomes a data-driven
  select: horizontal modes are computed in transposed space on the same
  square tile and transposed back with ``jnp.where`` — no shape change;
- reference lines are padded to 2*pad+3; the substitution fill
  (fill_reference_samples) replicates the last real sample into the
  padded tail when the availability mask is zeroed beyond 2w/2h, which
  reproduces VTM's replication-slot semantics for any actual size.

Bit-exactness: for every (w, h, mode) the valid (h, w) region equals
``ops.intra.predict_block`` (itself oracle-verified against VTM), see
tests/test_intra_generic.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .intra import (CHROMA_FILTER, mode_params)

NUM_LUMA_MODE = 67
_SIZES = (2, 4, 8, 16, 32, 64)


def _li(v):
    """log2(size)-1 index into the (6,6,...) tables for v in 2..64."""
    return ((v > 2).astype(jnp.int32) + (v > 4) + (v > 8)
            + (v > 16) + (v > 32))


@functools.cache
def param_tables(is_luma: bool):
    """(6*6*67,) numpy tables of ModeParams fields, flat-indexed by
    (log2w-1)*6*67 + (log2h-1)*67 + mode."""
    n = 6 * 6 * 67
    t = {k: np.zeros(n, np.int32) for k in
         ("angle", "inv_angle", "is_ver", "use_filt", "gauss",
          "pdpc", "scale")}
    for iw, w in enumerate(_SIZES):
        for ih, h in enumerate(_SIZES):
            for m in range(NUM_LUMA_MODE):
                p = mode_params(w, h, m, is_luma=is_luma)
                f = (iw * 6 + ih) * 67 + m
                t["angle"][f] = p.angle
                t["inv_angle"][f] = p.inv_angle
                t["is_ver"][f] = int(p.is_ver)
                t["use_filt"][f] = int(p.use_filtered)
                t["gauss"][f] = int(p.interpolate_gauss)
                t["pdpc"][f] = int(p.apply_pdpc)
                t["scale"][f] = max(p.pdpc_scale, 0)
    return t


def filter_reference_samples_generic(top, left, w, h):
    """[1 2 1]/4 smoothing with per-CU real lengths (2w / 2h as data).

    top/left: (B, 2*pad+3), index 0 = corner.  Samples at index >= 2w
    (2h) are copied unfiltered (VTM leaves the last real sample
    unfiltered; the padded tail replicates it, so copying preserves the
    replication semantics)."""
    corner = (top[:, 0] + top[:, 1] + left[:, 0] + left[:, 1] + 2) >> 2

    def one(row, n_real):
        mid = (row[:, :-2] + 2 * row[:, 1:-1] + row[:, 2:] + 2) >> 2
        out = jnp.concatenate([corner[:, None], mid], axis=1)
        idx = np.arange(row.shape[1] - 1)[None, :]
        out = jnp.where(idx >= n_real[:, None], row[:, :-1], out)
        return jnp.concatenate([out, row[:, -1:]], axis=1)

    return one(top, 2 * w), one(left, 2 * h)


def _planar_dc(top_u, left_u, top_f, left_f, w, h, pad, is_luma,
               tabs):
    """Planar and DC prediction, size as data.  Returns two (B, P, P)."""
    P = pad
    iw, ih = _li(w), _li(h)
    lw, lh = iw + 1, ih + 1
    base = (iw * 6 + ih) * 67
    use_f = jnp.take(tabs["use_filt"], base + 0) > 0
    pdpc_ok = jnp.take(tabs["pdpc"], base + 0) > 0

    tp = jnp.where(use_f[:, None], top_f, top_u).astype(jnp.int32)
    lp = jnp.where(use_f[:, None], left_f, left_u).astype(jnp.int32)
    t = tp[:, 1:P + 2]
    l = lp[:, 1:P + 2]
    top_right = jnp.take_along_axis(t, w[:, None], axis=1)      # (B,1)
    bottom_left = jnp.take_along_axis(l, h[:, None], axis=1)
    xs = np.arange(P)
    ys = np.arange(P)
    hor = jnp.left_shift(l[:, :P, None], lw[:, None, None]) + \
        (xs[None, None, :] + 1) * (top_right[:, :, None] - l[:, :P, None])
    ver = jnp.left_shift(t[:, None, :P], lh[:, None, None]) + \
        (ys[None, :, None] + 1) * (bottom_left[:, :, None] - t[:, None, :P])
    offset = jnp.left_shift(1, (lw + lh))[:, None, None]
    planar = (jnp.left_shift(hor, lh[:, None, None])
              + jnp.left_shift(ver, lw[:, None, None]) + offset) \
        >> (1 + lw + lh)[:, None, None]

    # DC on unfiltered refs
    tu = top_u[:, 1:P + 1].astype(jnp.int32)
    lu = left_u[:, 1:P + 1].astype(jnp.int32)
    sum_t = jnp.sum(jnp.where(xs[None, :] < w[:, None], tu, 0), axis=1)
    sum_l = jnp.sum(jnp.where(ys[None, :] < h[:, None], lu, 0), axis=1)
    s = jnp.where(w >= h, sum_t, 0) + jnp.where(w <= h, sum_l, 0)
    denom = jnp.where(w == h, w << 1, jnp.maximum(w, h))
    ld = _li(denom) + 1 + (denom > 64)   # denom can reach 128
    dc_v = (s + (denom >> 1)) >> ld
    dc = jnp.broadcast_to(dc_v[:, None, None], planar.shape)

    # PDPC for planar/DC (predIntraAng :248-271), per-CU scale
    scale = ((lw - 2) + (lh - 2) + 2) >> 2
    wT = 32 >> jnp.minimum(31, (ys[None, :, None] * 2) >> scale[:, None, None])
    wL = 32 >> jnp.minimum(31, (xs[None, None, :] * 2) >> scale[:, None, None])

    def _pdpc(pred, t_sel, l_sel):
        tt = t_sel[:, 1:P + 1].astype(jnp.int32)[:, None, :]
        ll = l_sel[:, 1:P + 1].astype(jnp.int32)[:, :, None]
        adj = (wL * (ll - pred) + wT * (tt - pred) + 32) >> 6
        return jnp.where(pdpc_ok[:, None, None], pred + adj, pred)

    return _pdpc(planar, tp, lp), _pdpc(dc, top_u, left_u)


def predict_generic(top_u, left_u, top_f, left_f, modes, w, h, *,
                    pad: int, is_luma: bool = True, bit_depth: int = 10):
    """Predict (B, M) (CU, mode) pairs on a (pad, pad) tile.

    top_u/left_u/top_f/left_f: (B, 2*pad+3) int32 reference rows, index
    0 = the corner, built with availability masks zeroed beyond the
    actual 2w / 2h so the tail replicates the last real sample.
    modes: (B, M) int32 in 0..66; w, h: (B,) int32 powers of two <= pad.
    Returns (B, M, pad, pad) int32; only [:h, :w] is meaningful.
    """
    P = pad
    B, M = modes.shape
    pel_max = (1 << bit_depth) - 1
    tabs = param_tables(is_luma)
    modes = jnp.clip(modes, 0, 66)
    iw, ih = _li(w), _li(h)
    flat = ((iw * 6 + ih)[:, None]) * 67 + modes                  # (B,M)
    gat = lambda k: jnp.take(tabs[k], flat)
    angle = gat("angle")
    inv_angle = gat("inv_angle")
    is_ver = gat("is_ver") > 0
    use_filt = gat("use_filt") > 0
    gauss = gat("gauss") > 0
    pdpc = gat("pdpc") > 0
    scale = gat("scale")

    # orientation-resolved references: main = top for vertical modes
    stack_u = jnp.stack([top_u, left_u], axis=1).astype(jnp.int32)
    stack_f = jnp.stack([top_f, left_f], axis=1).astype(jnp.int32)
    m_idx = jnp.where(is_ver, 0, 1)[:, :, None]                   # (B,M,1)
    main_u = jnp.take_along_axis(stack_u, m_idx, axis=1)
    main_f = jnp.take_along_axis(stack_f, m_idx, axis=1)
    side_u = jnp.take_along_axis(stack_u, 1 - m_idx, axis=1)
    side_f = jnp.take_along_axis(stack_f, 1 - m_idx, axis=1)
    fsel = use_filt[:, :, None]
    main = jnp.where(fsel, main_f, main_u)                        # (B,M,L)
    side = jnp.where(fsel, side_f, side_u)
    L = main.shape[2]
    wp = jnp.where(is_ver, w[:, None], h[:, None])                # (B,M)
    hp = jnp.where(is_ver, h[:, None], w[:, None])
    lwp = jnp.where(is_ver, iw[:, None], ih[:, None]) + 1
    lhp = jnp.where(is_ver, ih[:, None], iw[:, None]) + 1

    # negative-angle extension: ref[off - k] = side[min((k*invAngle+256)>>9, hp)]
    ps = np.arange(P)
    j = (P - ps)[None, None, :]                        # (B,M,P)
    proj = jnp.minimum((j * inv_angle[:, :, None] + 256) >> 9, hp[:, :, None])
    neg = jnp.take_along_axis(side, jnp.clip(proj, 0, L - 1), axis=2)
    ref = jnp.concatenate([neg, main], axis=2)                    # (B,M,P+L)
    ltot = P + L
    off = P

    ys = ps
    delta_pos = angle[:, :, None] * (1 + ys)[None, None, :]       # (B,M,P)
    delta_int = delta_pos >> 5
    delta_frac = delta_pos & 31
    if is_luma:
        half = delta_frac >> 1
        g = jnp.stack([16 - half, 32 - half, 16 + half, half], axis=-1)
        c = jnp.take(CHROMA_FILTER, delta_frac, axis=0)
        fs = jnp.where(gauss[:, :, None, None], g, c)             # (B,M,P,4)
    else:
        zf = jnp.zeros_like(delta_frac)
        fs = jnp.stack([zf, 64 - 2 * delta_frac, 2 * delta_frac, zf],
                       axis=-1)

    # Gather-free 4-tap interpolation: correlate the reference with the
    # per-row taps via STATIC shifted slices (G[b,m,y,j] = sum_k
    # fs[y,k] * ref[j+k]), then read each output row as ONE contiguous
    # window (vmapped dynamic_slice -> a slice-sized gather, which the
    # TPU handles far better than the per-element take_along_axis this
    # replaces).  Edge semantics: ref's tail replicates the last
    # sample, so right-padding ref by 3 and G by P reproduces the
    # original per-tap index clamp exactly (all-clamped taps sum to
    # 64 * last because every filter's taps sum to 64).
    xs = ps
    refp = jnp.concatenate([ref, jnp.repeat(ref[:, :, -1:], 3, axis=2)],
                           axis=2)
    G = jnp.zeros((B, M, P, ltot), jnp.int32)
    for k in range(4):
        G = G + fs[:, :, :, k, None] * refp[:, :, None, k:ltot + k]
    Gp = jnp.concatenate(
        [G, jnp.repeat(G[:, :, :, -1:], P, axis=3)], axis=3)
    starts = jnp.clip(off + delta_int, 0, ltot)           # (B, M, P)
    # one fused XLA gather (NOT a vmapped dynamic_slice — XLA lowers
    # that to a serial while loop of B*M*P scalar slices on TPU)
    idx = starts[:, :, :, None] + xs[None, None, None, :]
    win = jnp.take_along_axis(Gp, idx, axis=3)
    pred = jnp.clip((win + 32) >> 6, 0, pel_max)

    # ---- PDPC, angular ----
    zero = angle == 0
    # variant A (angle > 0): side-projected gather.  PDPC reaches at
    # most 3 << scale <= 12 columns (scale is clipped to 2 in
    # initPredIntraParams; asserted over the whole param table in
    # tests), so only the first 16 columns are gathered — beyond that
    # the adjustment is identically zero.
    PD = min(16, P)
    xsd = np.arange(PD)
    inv_sum = 256 + (xsd[None, None, :] + 1) * inv_angle[:, :, None]
    side_idx = ys[None, None, :, None] + (inv_sum >> 9)[:, :, None, :] + 1
    side_idx = jnp.clip(side_idx, 0, L - 1)
    sv = jnp.take_along_axis(side, side_idx.reshape(B, M, P * PD),
                             axis=2).reshape(B, M, P, PD)
    w_l = 32 >> jnp.minimum(31,
                            (2 * xsd[None, None, :]) >> scale[:, :, None])
    adj_pos = (w_l[:, :, None, :] * (sv - pred[..., :PD]) + 32) >> 6
    lim = jnp.minimum(3 << scale, wp)
    adj_pos = jnp.where(xsd[None, None, None, :] < lim[:, :, None, None],
                        adj_pos, 0)
    if PD < P:
        adj_pos = jnp.pad(adj_pos,
                          ((0, 0), (0, 0), (0, 0), (0, P - PD)))
    pred_pos = pred + adj_pos
    # variant B (angle == 0): pure hor/ver top-left form
    scale0 = (lwp + lhp - 2) >> 2
    top_left = ref[:, :, off][:, :, None, None]
    lvals = side[:, :, 1:P + 1][:, :, :, None]
    wl0 = 32 >> jnp.minimum(31, (2 * xs[None, None, :]) >> scale0[:, :, None])
    adj0 = (wl0[:, :, None, :] * (lvals - top_left) + 32) >> 6
    lim0 = jnp.minimum(3 << scale0, wp)
    adj0 = jnp.where(xs[None, None, None, :] < lim0[:, :, None, None],
                     adj0, 0)
    pred_zero = jnp.clip(pred + adj0, 0, pel_max)
    which = jnp.where(~pdpc, 0, jnp.where(zero, 2, 1))[:, :, None, None]
    pred = jnp.where(which == 2, pred_zero,
                     jnp.where(which == 1, pred_pos, pred))

    # horizontal modes were computed in transposed space
    pred = jnp.where(is_ver[:, :, None, None], pred,
                     jnp.swapaxes(pred, -1, -2))

    planar, dc = _planar_dc(top_u, left_u, top_f, left_f, w, h, P,
                            is_luma, tabs)
    msel = modes[:, :, None, None]
    return jnp.where(msel == 0, planar[:, None],
                     jnp.where(msel == 1, dc[:, None], pred))
