"""Batched wavefront frame encoder — the TPU execution path.

Replaces the reference's sequential CTU raster + CU recursion
(EncSlice.cpp:1686 -> EncCu.cpp:531) with a dependency-levelled batched
schedule.  The PMP partition map fixes the whole CU tree before coding
starts, so every leaf CU of the frame is known up front.

Round-4 design (v3): the ENTIRE wave loop is ONE compiled program — a
``lax.scan`` over the packed schedule, one step per wave segment, with
per-tile-class bodies guarded by ``lax.cond`` (a step runs exactly one
class; the other class's row is all-invalid and skipped).  CU
width/height and prediction mode are per-CU tensor data
(ops/intra_generic.py, ops/tq_generic.py), so the program is
content-independent per (geometry, tile classes).  Host<->device
traffic per frame batch:

  up:   originals (F, H, W), the coding-order grid, and one packed
        (S, B, 7) schedule array per tile class;
  loop: nothing — the scan is device-resident (round 3 dispatched one
        device call per segment; over a tunneled chip the ~55 dispatch
        round-trips per frame dominated wall-clock 10:1);
  down: ONE fetch of the packed result planes (recon as uint16, levels
        as int16, modes as uint8).

Multiple frames are encoded per pass (AI frames are independent), so
thin waves of one frame batch with the same wave of the other frames —
the segment count is geometry-bound, not frame-count-bound.

Each wave step: reference gather + availability masking (computed on
device from the coding-order grid) -> substitution/smoothing -> 67-mode
batched intra prediction -> SATD mode select -> DCT-II transform/quant/
dequant/inverse roundtrip -> RD zeroing -> recon/level/mode scatter.
The host then replays the precomputed decisions through the CABAC
writer (record/replay; BinEncoder semantics unchanged) and the standard
loop-filter / NAL tail of FrameEncoder.

Supported envelope: single or dual tree, map- or QT-driven
partitioning, DCT2 or MTS (DST7/DCT8 candidate batching) TU coding
with scalar quant + RDOQ-lite zeroing, SAO/ALF/deblocking (frame-level
post passes).  Everything else falls back to the sequential
FrameEncoder.
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from ..ops.intra import fill_reference_samples
from ..ops.intra_generic import (filter_reference_samples_generic,
                                 predict_generic)
from ..ops.mip_generic import MAX_MODES as MIP_MAX, predict_mip_generic
from ..ops.tq_generic import (dequantize_generic, forward_transform_generic,
                              inverse_transform_generic, quantize_generic,
                              rd_cleanup_generic, satd_generic)
from .encoder import RDO, CuInfo, FrameEncoder
from .mtt import Split, SplitState, get_implicit_split
from .residual import ctx

TILE_CLASSES = (32, 64)        # pad = smallest class >= max(w, h)
DEFAULT_BATCH = {32: 16, 64: 8}
_OOB = 1 << 24                 # out-of-bounds scatter index (mode="drop")


def _bits_proxy(lev):
    """Order-independent residual-rate proxy (bits) for the zero-TU
    decision; stands in for the live-context estimate the sequential
    path uses (the wavefront path fixes recon before entropy coding)."""
    a = jnp.abs(lev).astype(jnp.float32)
    nz = (a > 0).sum(axis=(-1, -2)).astype(jnp.float32)
    mag = jnp.where(a > 0, 2.0 * jnp.ceil(jnp.log2(a + 1.0)) + 1.0, 0.0)
    return 8.0 + mag.sum(axis=(-1, -2)) + nz


# ---------------------------------------------------------------------------
# device-side wave step (one compiled program per tile class)
# ---------------------------------------------------------------------------

def _avail_from_order(og, fi, oi, px, py, ok):
    """Availability of reference samples at map-grid positions: a sample
    is available iff its covering leaf precedes leaf ``oi`` in coding
    order (og: (F, H/4, W/4) coding-order grid, -1 = uncoded)."""
    r = jnp.clip(py, 0, og.shape[1] - 1)
    c = jnp.clip(px, 0, og.shape[2] - 1)
    ids = og[fi, r, c]
    return ok & (ids >= 0) & (ids < oi)


def _gather_plane(plane, fi, rows, cols):
    return plane[fi, jnp.clip(rows, 0, plane.shape[1] - 1),
                 jnp.clip(cols, 0, plane.shape[2] - 1)]


def _refs_generic(plane, og4, fi, oi, xs, ys, ws, hs, P, scale, bd):
    """Reference rows for B blocks at (xs, ys) size (ws, hs) in
    ``plane`` coords; og4 maps plane coords -> coding-order ids at the
    4-sample map grid of the LUMA plane (scale 2 for chroma)."""
    H, W = plane.shape[1], plane.shape[2]
    j2 = np.arange(2 * P)
    # top row y-1, x..x+2P-1
    t_ok = ((xs[:, None] + j2) < W) & (ys[:, None] > 0) \
        & (j2[None, :] < 2 * ws[:, None])
    at = _avail_from_order(og4, fi[:, None], oi[:, None],
                           (xs[:, None] + j2) * scale // 4,
                           jnp.maximum(ys[:, None] - 1, 0) * scale // 4,
                           t_ok)
    top_raw = _gather_plane(plane, fi[:, None], ys[:, None] - 1,
                            xs[:, None] + j2)
    # left col x-1, y..y+2P-1
    l_ok = ((ys[:, None] + j2) < H) & (xs[:, None] > 0) \
        & (j2[None, :] < 2 * hs[:, None])
    al = _avail_from_order(og4, fi[:, None], oi[:, None],
                           jnp.maximum(xs[:, None] - 1, 0) * scale // 4,
                           (ys[:, None] + j2) * scale // 4,
                           l_ok)
    left_raw = _gather_plane(plane, fi[:, None], ys[:, None] + j2,
                             xs[:, None] - 1)
    c_ok = (xs > 0) & (ys > 0)
    ac = _avail_from_order(og4, fi, oi,
                           jnp.maximum(xs - 1, 0) * scale // 4,
                           jnp.maximum(ys - 1, 0) * scale // 4, c_ok)
    corner = _gather_plane(plane, fi, ys - 1, xs - 1)
    tu, lu = fill_reference_samples(top_raw.astype(jnp.int32),
                                    left_raw.astype(jnp.int32),
                                    at, al, ac, corner.astype(jnp.int32),
                                    bit_depth=bd)
    tf, lf = filter_reference_samples_generic(tu, lu, ws, hs)
    return tu, lu, tf, lf


def _tq_generic(orgs, pred, ws, hs, qp, bd, lam, dw, rd_quant, inside,
                lev_region=None, sdh=False, return_rr=False, crs=None):
    """Fused transform->quant->(RD zeroing)->dequant->inverse roundtrip
    with the zero-TU candidate competing (cost = dw*SSE + lam*bits).
    ``lev_region``: optional (B, P, P) bool — levels outside it are
    quantized to zero (an always-legal encoder choice; used for the
    single-tree LFNST chroma constraint).  ``crs``: optional (B,)
    LMCS chroma-residual scale (CSCALE_FP_PREC fixed point) — the
    residual is forward-scaled before the transform and the
    reconstructed residual inverse-scaled back (Reshape scaleSignal;
    identity when the scale is 1 << 11)."""
    resid_u = (orgs - pred) * inside
    if crs is not None:
        c3 = crs[:, None, None]
        sgn = jnp.sign(resid_u)
        mx = (1 << bd) - 1
        resid = sgn * jnp.clip(
            ((jnp.abs(resid_u) << 11) + (c3 >> 1)) // c3, 0, mx)
    else:
        resid = resid_u
    coef = forward_transform_generic(resid, ws, hs, bit_depth=bd)
    lev = quantize_generic(coef, ws, hs, qp, bit_depth=bd)
    if rd_quant:
        lev = rd_cleanup_generic(lev, coef, ws, hs, qp, lam, bit_depth=bd)
    if lev_region is not None:
        lev = lev * lev_region
    if sdh:
        from ..ops.sdh_generic import apply_sdh_generic
        lev = apply_sdh_generic(lev, coef, ws, hs, qp, bit_depth=bd)
    deq = dequantize_generic(lev, ws, hs, qp, bit_depth=bd)
    rr = inverse_transform_generic(deq, ws, hs, bit_depth=bd)
    if crs is not None:
        rs = jnp.clip(rr, -(1 << bd), (1 << bd) - 1)
        rr = jnp.sign(rs) * ((jnp.abs(rs) * c3 + (1 << 10)) >> 11)
        rr = jnp.clip(rr, -32768, 32767)
    err = ((rr - resid_u) * inside).astype(jnp.float32)
    cost_code = dw * (err * err).sum(axis=(-1, -2)) + lam * _bits_proxy(lev)
    rz = resid_u.astype(jnp.float32)
    cost_zero = dw * (rz * rz).sum(axis=(-1, -2)) + lam * 2.0
    zero = cost_zero <= cost_code
    lev = jnp.where(zero[:, None, None], 0, lev)
    rr = jnp.where(zero[:, None, None], 0, rr)
    rec = jnp.clip(pred + rr, 0, (1 << bd) - 1)
    if return_rr:
        return lev, rec, rr
    return lev, rec


# mtsIdx -> (trTypeHor, trTypeVer) in transforms.py kind order
# (0 DCT2, 1 DCT8, 2 DST7); TypeDef MtsType / EncModeCtrl trial set
_MTS_COMBOS = ((0, (0, 0), 1.0), (2, (2, 2), 2.0), (3, (1, 2), 3.0),
               (4, (2, 1), 4.0), (5, (1, 1), 4.0))


def _tq_luma_mts(orgs, pred, ws, hs, qp, bd, lam, rd_quant, inside,
                 mts, lfnst=False, modes=None, lfnst_ok=None, sdh=False,
                 ts_max=0):
    """Luma TQ with MTS candidate batching (TrQuant.cpp:826 trial set):
    DCT2 plus the four DST7/DCT8 combinations compete under
    cost = SSE + lam * (residual-bits proxy + mts_idx bins); a non-DCT2
    winner must have a non-DC coefficient (mts_idx is only signalled
    when lastScanPos >= 1, CABACWriter mts_idx:2721 — otherwise the
    decoder would infer DCT2).  With ``lfnst``, DCT2+LFNST idx 1/2
    join the trial set (xFwdLfnst after the primary transform,
    TrQuant.cpp:460; only signallable with a beyond-DC coefficient and
    where ``lfnst_ok``).  The zero-TU candidate competes last.
    Returns (lev, rec, mts_idx, lfnst_idx)."""
    resid = (orgs - pred) * inside
    combos = _MTS_COMBOS if mts else _MTS_COMBOS[:1]
    levs, rrs, costs, idxs, lfs = [], [], [], [], []
    coef_dct2 = None
    for mts_idx, (kw, kh), bins in combos:
        coef = forward_transform_generic(resid, ws, hs, bit_depth=bd,
                                         kind_w=kw, kind_h=kh)
        if mts_idx == 0:
            coef_dct2 = coef
        lev = quantize_generic(coef, ws, hs, qp, bit_depth=bd)
        if rd_quant:
            lev = rd_cleanup_generic(lev, coef, ws, hs, qp, lam,
                                     bit_depth=bd)
        if sdh:
            from ..ops.sdh_generic import apply_sdh_generic
            lev = apply_sdh_generic(lev, coef, ws, hs, qp, bit_depth=bd)
        deq = dequantize_generic(lev, ws, hs, qp, bit_depth=bd)
        rr = inverse_transform_generic(deq, ws, hs, bit_depth=bd,
                                       kind_w=kw, kind_h=kh)
        err = ((rr - resid) * inside).astype(jnp.float32)
        cost = (err * err).sum(axis=(-1, -2)) \
            + lam * (_bits_proxy(lev) + bins)
        if mts_idx != 0:
            n_nz = (lev != 0).sum(axis=(-1, -2))
            beyond_dc = n_nz - (lev[..., 0, 0] != 0).astype(n_nz.dtype)
            # mts_idx is only signallable for TUs <= 32 (mts_idx gate,
            # CABACWriter:2721) — matters when one tile class mixes
            # sizes above 32 (the spatial stripe path)
            ok = (beyond_dc > 0) & (ws <= 32) & (hs <= 32)
            cost = jnp.where(ok, cost, jnp.inf)
        levs.append(lev)
        rrs.append(rr)
        costs.append(cost)
        idxs.append(mts_idx)
        lfs.append(0)
    if lfnst:
        from ..ops.lfnst_generic import (fwd_lfnst_generic,
                                         inv_lfnst_generic)
        for li in (1, 2):
            sec = fwd_lfnst_generic(coef_dct2, modes, ws, hs, li)
            lev = quantize_generic(sec, ws, hs, qp, bit_depth=bd)
            if rd_quant:
                lev = rd_cleanup_generic(lev, sec, ws, hs, qp, lam,
                                         bit_depth=bd)
            if sdh:
                from ..ops.sdh_generic import apply_sdh_generic
                lev = apply_sdh_generic(lev, sec, ws, hs, qp,
                                        bit_depth=bd)
            deq = dequantize_generic(lev, ws, hs, qp, bit_depth=bd)
            pri = inv_lfnst_generic(deq, modes, ws, hs, li)
            rr = inverse_transform_generic(pri, ws, hs, bit_depth=bd)
            err = ((rr - resid) * inside).astype(jnp.float32)
            cost = (err * err).sum(axis=(-1, -2)) \
                + lam * (_bits_proxy(lev) + 2.0)   # lfnst_idx bins
            n_nz = (lev != 0).sum(axis=(-1, -2))
            beyond_dc = n_nz - (lev[..., 0, 0] != 0).astype(n_nz.dtype)
            ok = beyond_dc > 0
            if lfnst_ok is not None:
                ok = ok & lfnst_ok
            cost = jnp.where(ok, cost, jnp.inf)
            levs.append(lev)
            rrs.append(rr)
            costs.append(cost)
            idxs.append(0)
            lfs.append(li)
    if ts_max:
        # transform skip as MTS_SKIP (mtsIdx 1): identity transform +
        # TS quant (Quant.cpp TS branch, iTransformShift = 0, no sqrt2;
        # QP clamped to >= 4), residual coded by the TS coder at
        # replay.  No RD cleanup / SDH on the TS path (the sequential
        # _tq_roundtrip mts_idx==1 branch does neither).
        from ..ops.quant import (COEFF_MAX, COEFF_MIN, INV_QUANT_SCALES,
                                 IQUANT_SHIFT, QUANT_SCALES, QUANT_SHIFT,
                                 ts_qp)
        qpt = ts_qp(qp)
        q_bits = QUANT_SHIFT + qpt // 6
        scale = int(QUANT_SCALES[0][qpt % 6])
        add = 171 << (q_bits - 9)
        mag = jnp.minimum((jnp.abs(resid) * scale + add) >> q_bits,
                          COEFF_MAX)
        lev = jnp.where(resid < 0, -mag, mag)
        iscale = int(INV_QUANT_SCALES[0][qpt % 6])
        shift = IQUANT_SHIFT - qpt // 6
        lvl = jnp.clip(lev, COEFF_MIN, COEFF_MAX)
        if shift > 0:
            rr = (lvl * iscale + (1 << (shift - 1))) >> shift
        else:
            rr = (lvl * iscale) << (-shift)
        rr = jnp.clip(rr, COEFF_MIN, COEFF_MAX)
        err = ((rr - resid) * inside).astype(jnp.float32)
        cost = (err * err).sum(axis=(-1, -2)) \
            + lam * (_bits_proxy(lev) + 1.0)    # transform_skip_flag
        ok = (ws <= ts_max) & (hs <= ts_max) \
            & (lev != 0).any(axis=(-1, -2))
        cost = jnp.where(ok, cost, jnp.inf)
        levs.append(lev)
        rrs.append(rr)
        costs.append(cost)
        idxs.append(1)
        lfs.append(0)
    costs = jnp.stack(costs, axis=1)                      # (B, C)
    k = jnp.argmin(costs, axis=1)
    lev = jnp.take_along_axis(jnp.stack(levs, 1),
                              k[:, None, None, None], axis=1)[:, 0]
    rr = jnp.take_along_axis(jnp.stack(rrs, 1),
                             k[:, None, None, None], axis=1)[:, 0]
    tr = jnp.take(jnp.asarray(idxs, jnp.int32), k)
    lf = jnp.take(jnp.asarray(lfs, jnp.int32), k)
    cost_code = jnp.take_along_axis(costs, k[:, None], axis=1)[:, 0]
    rz = resid.astype(jnp.float32)
    cost_zero = (rz * rz).sum(axis=(-1, -2)) + lam * 2.0
    zero = cost_zero <= cost_code
    lev = jnp.where(zero[:, None, None], 0, lev)
    rr = jnp.where(zero[:, None, None], 0, rr)
    tr = jnp.where(zero, 0, tr)
    lf = jnp.where(zero, 0, lf)
    rec = jnp.clip(pred + rr, 0, (1 << bd) - 1)
    return lev, rec, tr, lf


def _make_class_apply(P, bsz, qp_y, qp_c, bd, lam, dw_c, rd_quant,
                      kind="st", mts=False, mip=False, cclm=False,
                      lfnst=False, sdh=False, jccr=False, qp_j=0,
                      crs_cfg=None, ts_max=0):
    """Wave-segment body for the P-pad tile class.  ``kind``:

    - "st"     single tree — luma RMD + TQ, then chroma DM + TQ of the
               co-located half-res block (one CU covers both channels);
    - "luma"   dual-tree luma pass only;
    - "chroma" dual-tree chroma pass: DM mode read from the mode grid
               at the CU centre (PU::getCoLocatedIntraLumaMode), its
               own availability grid (the chroma tree has its own
               coding order).

    Pure function of (state planes, schedule row, originals, order
    grids); traced once inside the fused scan program."""
    Pc = P // 2
    crs_lut = None
    if crs_cfg is not None:
        # sample -> CRS scale LUT (chromaAdjHelpLUT over the PWL-inverse
        # bin of the neighbour average), built from the same AI model
        # the headers signal; crs_cfg = (bit_depth, lmcs_offset) so the
        # cached trace key stays hashable
        from .lmcs import Reshaper, derive_ai_model
        rsh = Reshaper(derive_ai_model(crs_cfg[0], crs_cfg[1]),
                       crs_cfg[0])
        samples = np.arange(1 << crs_cfg[0])
        crs_lut = rsh.chroma_adj_lut[rsh._pwl_idx_inv(samples)] \
            .astype(np.int32)
    # RMD mode subsampling (IntraSearch.cpp:370 does the same): SATD
    # over planar/DC + the 33 even angulars, then refine the best
    # angular's two odd neighbours.  Decisions are free (any mode is
    # conformant); only the CHOSEN mode's prediction feeds recon, and
    # every candidate here is computed by the exact predictor.
    rmd_modes = np.array([0, 1] + list(range(2, 67, 2)), np.int32)
    modes_rmd = np.broadcast_to(rmd_modes, (bsz, rmd_modes.size))

    def f(state, row, oy, ou, ov, og4, og4c):
        ry, ru, rv, cY, cU, cV, mg, tg, pg, cg, lg = state
        fi, xs, ys, ws, hs, oi, okv, flg = [row[:, k] for k in range(8)]
        ok = okv > 0
        if kind == "chroma":
            best = mg[fi, jnp.clip((ys + hs // 2) // 4, 0,
                                   mg.shape[1] - 1),
                      jnp.clip((xs + ws // 2) // 4, 0,
                               mg.shape[2] - 1)].astype(jnp.int32)
            return _chroma_part(state, fi, xs, ys, ws, hs, oi, ok, best,
                                ou, ov, og4c, Pc, qp_c, bd, lam, dw_c,
                                rd_quant, cclm=cclm,
                                cclm_ok=(flg & 1) > 0, sdh=sdh,
                                jccr=jccr, qp_j=qp_j, crs_lut=crs_lut)
        # ---- luma ----
        refs = _refs_generic(ry, og4, fi, oi, xs, ys, ws, hs, P, 1, bd)
        preds = predict_generic(*refs, modes_rmd,
                                ws, hs, pad=P, is_luma=True, bit_depth=bd)
        dy = np.arange(P)
        o_rows = ys[:, None, None] + dy[None, :, None]
        o_cols = xs[:, None, None] + dy[None, None, :]
        orgs = _gather_plane(oy, fi[:, None, None], o_rows, o_cols)
        costs = satd_generic(orgs[:, None], preds, ws, hs)
        bi = jnp.argmin(costs, axis=1)
        m_a = jnp.take(jnp.asarray(rmd_modes), bi)
        ang = m_a >= 2
        modes_ref = jnp.stack(
            [jnp.where(ang, jnp.clip(m_a - 1, 2, 66), m_a),
             jnp.where(ang, jnp.clip(m_a + 1, 2, 66), m_a)], axis=1)
        preds_r = predict_generic(*refs, modes_ref, ws, hs, pad=P,
                                  is_luma=True, bit_depth=bd)
        costs_r = satd_generic(orgs[:, None], preds_r, ws, hs)
        cand_c = jnp.concatenate(
            [jnp.take_along_axis(costs, bi[:, None], axis=1), costs_r],
            axis=1)
        cand_p = jnp.concatenate(
            [jnp.take_along_axis(preds, bi[:, None, None, None],
                                 axis=1), preds_r], axis=1)
        cand_m = jnp.concatenate([m_a[:, None], modes_ref], axis=1)
        k = jnp.argmin(cand_c, axis=1)
        best = jnp.take_along_axis(cand_m, k[:, None],
                                   axis=1)[:, 0].astype(jnp.int32)
        pred = jnp.take_along_axis(cand_p, k[:, None, None, None],
                                   axis=1)[:, 0]
        if mip:
            # MIP candidates compete by SATD (the sequential
            # _choose_luma contract); winner coded as mip flag +
            # transpose + trunc-bin mode, mode grid shows PLANAR
            # (neighbour MPM / chroma DM view)
            cost_ang = jnp.take_along_axis(cand_c, k[:, None],
                                           axis=1)[:, 0]
            mip_preds, n_m = predict_mip_generic(
                refs[0], refs[1], ws, hs, pad=P, bit_depth=bd)
            mip_costs = satd_generic(orgs[:, None], mip_preds, ws, hs)
            mi = np.arange(2 * MIP_MAX)
            valid = (mi[None, :] % MIP_MAX) < n_m[:, None]
            mip_costs = jnp.where(valid, mip_costs, jnp.inf)
            mb = jnp.argmin(mip_costs, axis=1)
            mip_c = jnp.take_along_axis(mip_costs, mb[:, None],
                                        axis=1)[:, 0]
            use_mip = mip_c < cost_ang
            mpred = jnp.take_along_axis(
                mip_preds, mb[:, None, None, None], axis=1)[:, 0]
            pred = jnp.where(use_mip[:, None, None], mpred, pred)
            best = jnp.where(use_mip, 0, best)
            mip_code = jnp.where(use_mip, 1 + mb, 0).astype(jnp.int32)
        else:
            mip_code = jnp.zeros_like(best)
        inside = ((dy[None, :, None] < hs[:, None, None])
                  & (dy[None, None, :] < ws[:, None, None]))
        lfnst_ok = None
        if lfnst:
            # residual_lfnst_mode MIP gate (CABACWriter:2776): not
            # coded for MIP CUs below 16x16
            lfnst_ok = ~(use_mip & ~((ws >= 16) & (hs >= 16))) \
                if mip else jnp.ones(ws.shape, bool)
        lev_y, rec_y, tr_y, lf_y = _tq_luma_mts(
            orgs, pred, ws, hs, qp_y, bd, lam, rd_quant, inside, mts,
            lfnst=lfnst, modes=best, lfnst_ok=lfnst_ok, sdh=sdh,
            ts_max=ts_max)
        okm = ok[:, None, None] & inside
        srows = jnp.where(okm, o_rows, _OOB)
        fi3 = fi[:, None, None]
        ry = ry.at[fi3, srows, o_cols].set(rec_y, mode="drop")
        cY = cY.at[fi3, srows, o_cols].set(lev_y.astype(jnp.int16),
                                           mode="drop")
        d4 = np.arange(P // 4)
        m_rows = ys[:, None, None] // 4 + d4[None, :, None]
        m_cols = xs[:, None, None] // 4 + d4[None, None, :]
        m_ok = ok[:, None, None] & (d4[None, :, None] < hs[:, None, None] // 4) \
            & (d4[None, None, :] < ws[:, None, None] // 4)
        msafe = jnp.where(m_ok, m_rows, _OOB)
        mg = mg.at[fi3, msafe, m_cols].set(
            jnp.broadcast_to(best[:, None, None].astype(jnp.uint8),
                             m_rows.shape), mode="drop")
        tg = tg.at[fi3, msafe, m_cols].set(
            jnp.broadcast_to(tr_y[:, None, None].astype(jnp.uint8),
                             m_rows.shape), mode="drop")
        pg = pg.at[fi3, msafe, m_cols].set(
            jnp.broadcast_to(mip_code[:, None, None].astype(jnp.uint8),
                             m_rows.shape), mode="drop")
        lg = lg.at[fi3, msafe, m_cols].set(
            jnp.broadcast_to(lf_y[:, None, None].astype(jnp.uint8),
                             m_rows.shape), mode="drop")

        state = (ry, ru, rv, cY, cU, cV, mg, tg, pg, cg, lg)
        if kind == "luma":
            return state
        # ---- single tree: chroma DM/CCLM at half res, same order ----
        return _chroma_part(state, fi, xs, ys, ws, hs, oi, ok, best,
                            ou, ov, og4c, Pc, qp_c, bd, lam, dw_c,
                            rd_quant, cclm=cclm,
                            cclm_ok=(flg & 1) > 0,
                            lfnst_active=(lf_y > 0) if lfnst else None,
                            sdh=sdh, jccr=jccr, qp_j=qp_j,
                            crs_lut=crs_lut)

    return f


def _chroma_part(state, fi, xs, ys, ws, hs, oi, ok, best, ou, ov, og4c,
                 Pc, qp_c, bd, lam, dw_c, rd_quant, cclm=False,
                 cclm_ok=None, lfnst_active=None, sdh=False,
                 jccr=False, qp_j=0, crs_lut=None):
    """Chroma half of a wave segment: DM vs CCLM (LM_CHROMA) prediction
    by joint U+V SATD, TQ + scatter.  Coordinates are LUMA-unit
    (x, y, w, h); ``best`` the DM luma mode; ``og4c`` the availability
    order grid of the CHROMA coding order (the luma grid for single
    tree); ``cclm_ok``: (B,) per-CU bool gate (checkCCLMAllowed for
    the dual chroma tree); ``lfnst_active``: (B,) single-tree CUs whose
    luma chose LFNST — their chroma levels are confined to the
    signallable region (scan pos <= 7/15) so residual_lfnst_mode's
    last-position gate cannot be violated by chroma
    (CABACWriter:2796-2808; an encoder-side zeroing choice)."""
    ry, ru, rv, cY, cU, cV, mg, tg, pg, cg, lg = state
    cxs, cys, cws, chs = xs // 2, ys // 2, ws // 2, hs // 2
    dc_ = np.arange(Pc)
    co_rows = cys[:, None, None] + dc_[None, :, None]
    co_cols = cxs[:, None, None] + dc_[None, None, :]
    c_in = ((dc_[None, :, None] < chs[:, None, None])
            & (dc_[None, None, :] < cws[:, None, None]))
    c_ok = ok[:, None, None] & c_in
    csr = jnp.where(c_ok, co_rows, _OOB)
    fi3 = fi[:, None, None]

    crefs_u = _refs_generic(ru, og4c, fi, oi, cxs, cys, cws, chs,
                            Pc, 2, bd)
    crefs_v = _refs_generic(rv, og4c, fi, oi, cxs, cys, cws, chs,
                            Pc, 2, bd)
    pred_u = predict_generic(*crefs_u, best[:, None], cws, chs,
                             pad=Pc, is_luma=False, bit_depth=bd)[:, 0]
    pred_v = predict_generic(*crefs_v, best[:, None], cws, chs,
                             pad=Pc, is_luma=False, bit_depth=bd)[:, 0]
    corg_u = _gather_plane(ou, fi[:, None, None], co_rows, co_cols)
    corg_v = _gather_plane(ov, fi[:, None, None], co_rows, co_cols)
    use_lm = jnp.zeros(fi.shape, bool)
    if cclm:
        from ..ops.cclm_generic import cclm_predict_generic
        # neighbour availability from the order grid (NOT raw coords —
        # spatially-sharded stripes run in halo-offset local coords)
        la = _avail_from_order(og4c, fi, oi,
                               jnp.maximum(cxs - 1, 0) * 2 // 4,
                               cys * 2 // 4, cxs > 0)
        aa = _avail_from_order(og4c, fi, oi, cxs * 2 // 4,
                               jnp.maximum(cys - 1, 0) * 2 // 4,
                               cys > 0)
        lm_u, lm_v = cclm_predict_generic(
            ry, fi, cxs, cys, cws, chs, pad_c=Pc,
            top_u=crefs_u[0], left_u=crefs_u[1],
            top_v=crefs_v[0], left_v=crefs_v[1], bit_depth=bd,
            left_avail=la, above_avail=aa)
        cost_dm = satd_generic(corg_u[:, None], pred_u[:, None], cws,
                               chs)[:, 0] \
            + satd_generic(corg_v[:, None], pred_v[:, None], cws,
                           chs)[:, 0]
        cost_lm = satd_generic(corg_u[:, None], lm_u[:, None], cws,
                               chs)[:, 0] \
            + satd_generic(corg_v[:, None], lm_v[:, None], cws,
                           chs)[:, 0]
        use_lm = (cost_lm < cost_dm)
        if cclm_ok is not None:
            use_lm = use_lm & cclm_ok
        pred_u = jnp.where(use_lm[:, None, None], lm_u, pred_u)
        pred_v = jnp.where(use_lm[:, None, None], lm_v, pred_v)

    lev_region = None
    if lfnst_active is not None:
        # allowed scan region per TB: diag pos < 8 for 4x4/8x8 TBs,
        # else the top-left 4x4 CG (first 16 diag positions)
        from ..ops.lfnst import _DIAG4
        diag_idx = np.full((Pc, Pc), 99, np.int32)
        for k, (yy_, xx_) in enumerate(_DIAG4):
            if yy_ < Pc and xx_ < Pc:
                diag_idx[yy_, xx_] = k
        small = (((cws == 4) & (chs == 4)) | ((cws == 8) & (chs == 8)))
        n_allow = jnp.where(small, 8, 16)
        no_gate = ~lfnst_active | (cws < 4) | (chs < 4)
        lev_region = (jnp.asarray(diag_idx)[None]
                      < n_allow[:, None, None]) \
            | no_gate[:, None, None]
    crs = None
    if crs_lut is not None:
        # LMCS chroma-residual scale per 64x64 VPDU: average of the
        # VPDU's above-row/left-column MAPPED luma recon neighbours ->
        # chromaAdjHelpLUT (calculateChromaAdjVpduNei,
        # Reshape.cpp:106-190).  The wave schedule guarantees those
        # neighbours are reconstructed (vpdu_dep), and the z-scan
        # property makes the sequential path's single-unit coded check
        # equivalent to id < oi at the segment's first sample.
        ry_pl = state[0]
        vx, vy = (xs // 64) * 64, (ys // 64) * 64
        l_ok = _avail_from_order(og4c, fi, oi,
                                 jnp.maximum(vx - 4, 0) // 4,
                                 vy // 4, vx > 0)
        t_ok = _avail_from_order(og4c, fi, oi, vx // 4,
                                 jnp.maximum(vy - 4, 0) // 4, vy > 0)
        i64 = np.arange(64)
        Hl, Wl = ry_pl.shape[1], ry_pl.shape[2]
        lrows = jnp.minimum(vy[:, None] + i64, Hl - 1)
        s_l = _gather_plane(ry_pl, fi[:, None], lrows,
                            jnp.maximum(vx - 1, 0)[:, None]).sum(-1)
        tcols = jnp.minimum(vx[:, None] + i64, Wl - 1)
        s_t = _gather_plane(ry_pl, fi[:, None],
                            jnp.maximum(vy - 1, 0)[:, None], tcols).sum(-1)
        s = jnp.where(l_ok, s_l, 0) + jnp.where(t_ok, s_t, 0)
        n = l_ok.astype(jnp.int32) + t_ok.astype(jnp.int32)
        avg = jnp.where(
            n == 0, 1 << (bd - 1),
            (s + (32 << jnp.maximum(n - 1, 0))) >> (5 + n))
        crs_all = jnp.take(jnp.asarray(crs_lut),
                           jnp.clip(avg, 0, crs_lut.shape[0] - 1))
        # gate: TUs of <= 4 chroma samples are not scaled (DecCu.cpp)
        crs = jnp.where(cws * chs > 4, crs_all, 1 << 11)
    lev_u, rec_u = _tq_generic(corg_u, pred_u, cws, chs, qp_c, bd,
                               lam, dw_c, rd_quant, c_in,
                               lev_region=lev_region, sdh=sdh, crs=crs)
    lev_v, rec_v = _tq_generic(corg_v, pred_v, cws, chs, qp_c, bd,
                               lam, dw_c, rd_quant, c_in,
                               lev_region=lev_region, sdh=sdh, crs=crs)
    use_joint = jnp.zeros(fi.shape, bool)
    if jccr:
        # JCCR mask 3 (Cr = -Cb, ph sign flag 1): one joint residual
        # (resCb - resCr)/2 coded at the JOINT QP, Cr reconstructed by
        # negation — invTransformCbCr<-2> (TrQuant.cpp:139), joint
        # flag CABACWriter.cpp:2610; mirrors the sequential
        # _try_joint_cbcr trial under the wave-path rate proxy
        res_u = (corg_u - pred_u) * c_in
        res_v = (corg_v - pred_v) * c_in
        joint_res = jnp.round((res_u - res_v) / 2.0).astype(jnp.int32)
        lev_j, rec_ju, rr_j = _tq_generic(
            pred_u + joint_res, pred_u, cws, chs, qp_j, bd, lam, dw_c,
            rd_quant, c_in, lev_region=lev_region, sdh=sdh,
            return_rr=True, crs=crs)
        # the decoder derives Cr from the UNCLIPPED joint residual
        # (invTransformCbCr negates res_cb before the Cr clip)
        rec_jv = jnp.clip(pred_v - rr_j, 0, (1 << bd) - 1)
        cbf_j = (lev_j != 0).any(axis=(-1, -2))

        def _sse(a, b):
            d = ((a - b) * c_in).astype(jnp.float32)
            return (d * d).sum(axis=(-1, -2))
        cbf_u = (lev_u != 0).any(axis=(-1, -2))
        cbf_v = (lev_v != 0).any(axis=(-1, -2))
        bits_s = jnp.where(cbf_u, _bits_proxy(lev_u), 1.0) \
            + jnp.where(cbf_v, _bits_proxy(lev_v), 1.0) + 1.0
        bits_j = _bits_proxy(lev_j) + 3.0      # cbfs + joint flag
        cost_s = dw_c * (_sse(rec_u, corg_u) + _sse(rec_v, corg_v)) \
            + lam * bits_s
        cost_j = dw_c * (_sse(rec_ju, corg_u) + _sse(rec_jv, corg_v)) \
            + lam * bits_j
        use_joint = cbf_j & (cost_j < cost_s)
        uj = use_joint[:, None, None]
        lev_u = jnp.where(uj, lev_j, lev_u)
        rec_u = jnp.where(uj, rec_ju, rec_u)
        lev_v = jnp.where(uj, lev_j, lev_v)
        rec_v = jnp.where(uj, rec_jv, rec_v)
    ru = ru.at[fi3, csr, co_cols].set(rec_u, mode="drop")
    cU = cU.at[fi3, csr, co_cols].set(lev_u.astype(jnp.int16),
                                      mode="drop")
    rv = rv.at[fi3, csr, co_cols].set(rec_v, mode="drop")
    cV = cV.at[fi3, csr, co_cols].set(lev_v.astype(jnp.int16),
                                      mode="drop")
    # record the chroma choices on the luma-unit grid: bit 0 = CCLM,
    # bit 1 = joint Cb-Cr residual
    d4 = np.arange(Pc // 2)
    g_rows = ys[:, None, None] // 4 + d4[None, :, None]
    g_cols = xs[:, None, None] // 4 + d4[None, None, :]
    g_ok = ok[:, None, None] & (d4[None, :, None] < hs[:, None, None] // 4) \
        & (d4[None, None, :] < ws[:, None, None] // 4)
    code = (use_lm.astype(jnp.uint8)
            + 2 * use_joint.astype(jnp.uint8))
    cg = cg.at[fi3, jnp.where(g_ok, g_rows, _OOB), g_cols].set(
        jnp.broadcast_to(code[:, None, None], g_rows.shape),
        mode="drop")
    return ry, ru, rv, cY, cU, cV, mg, tg, pg, cg, lg


@functools.cache
def _wave_scan(classes, bszs, qp_y, qp_c, bd, lam, dw_c, rd_quant,
               mts=False, mip=False, cclm=False, lfnst=False,
               sdh=False, jccr=False, qp_j=0, crs_cfg=None, ts_max=0,
               mesh=None):
    """ONE jitted program running every wave segment of a frame batch:
    ``lax.scan`` over the packed per-class schedules.  ``classes``:
    (kind, pad) tuples.  Each scan step carries one (B, 7) row per
    class; inactive rows (ok flags clear) are skipped via ``lax.cond``.
    Result planes are packed for the single down-transfer."""
    applies = [_make_class_apply(p, b, qp_y, qp_c, bd, lam, dw_c,
                                 rd_quant, kind=k,
                                 mts=mts and p <= 32, mip=mip,
                                 cclm=cclm, lfnst=lfnst, sdh=sdh,
                                 jccr=jccr, qp_j=qp_j, crs_cfg=crs_cfg,
                                 # the 64-pad class only holds CUs with
                                 # a side > 32 — TS can never fire there
                                 ts_max=ts_max if p <= 32 else 0)
               for (k, p), b in zip(classes, bszs)]

    def f(ry, ru, rv, cY, cU, cV, mg, tg, pg, cg, lg, oy, ou, ov, og4,
          og4c, *scheds):
        def step(state, rows):
            for app, row in zip(applies, rows):
                if len(applies) == 1:
                    # single tile class: every step's row is live
                    state = app(state, row, oy, ou, ov, og4, og4c)
                else:
                    state = jax.lax.cond(
                        jnp.any(row[:, 6] > 0),
                        lambda s, r, a=app: a(s, r, oy, ou, ov, og4,
                                              og4c),
                        lambda s, r: s,
                        state, row)
            return state, None
        state, _ = jax.lax.scan(
            step, (ry, ru, rv, cY, cU, cV, mg, tg, pg, cg, lg),
            tuple(scheds))
        ry, ru, rv, cY, cU, cV, mg, tg, pg, cg, lg = state
        return (ry.astype(jnp.uint16), ru.astype(jnp.uint16),
                rv.astype(jnp.uint16), cY, cU, cV, mg, tg, pg, cg, lg)

    donate = tuple(range(11))   # state planes
    if mesh is not None:
        from ..parallel.wavefront_dp import wave_scan_shardings
        ins, outs = wave_scan_shardings(mesh, len(classes))
        return jax.jit(f, donate_argnums=donate, in_shardings=ins,
                       out_shardings=outs)
    return jax.jit(f, donate_argnums=donate)


def _collect_leaves_chroma(enc, decide, decide_luma=None):
    """Dual-tree CHROMA leaf collection (luma-unit coords) — mirrors
    FrameEncoder._encode_tree_ch's chroma walk incl. the implicit-BV
    chroma-width-4 ban.  Each leaf carries its checkCCLMAllowed flag
    (Unit.cpp:378-443), derived from the chroma split path and the
    co-located 64x64 luma node's split (re-derived from the luma
    decider — the wavefront path has no ISP, so the ISP clause is
    moot)."""
    cfg = enc.cfg
    leaves = []
    luma_root = {"split": Split.NONE}

    def walk(x, y, w, h, state, depth64=0, path=(None, None)):
        if x >= cfg.width or y >= cfg.height:
            return
        implicit = get_implicit_split(x, y, w, h, state, cfg, True)
        if implicit != Split.NONE:
            split = implicit
            if split == Split.BT_V and w // 2 == 4:
                split = Split.QT
        else:
            split = decide(x, y, w, h, state)
        if split is RDO:
            raise NotImplementedError(
                "RDO fallback inside the wavefront path")
        if split != Split.NONE:
            npath = (split if depth64 == 0 else path[0],
                     split if depth64 == 1 else path[1])
            imp_bt = state.implicit_bt_depth + (
                1 if split == implicit
                and split in (Split.BT_H, Split.BT_V) else 0)
            for i, (cx, cy, cw, chh) in enumerate(
                    enc._children(x, y, w, h, split)):
                cstate = SplitState(
                    last_split=split, part_idx=i,
                    qt_depth=state.qt_depth
                    + (1 if split == Split.QT else 0),
                    mtt_depth=state.mtt_depth
                    + (0 if split == Split.QT else 1),
                    implicit_bt_depth=imp_bt)
                walk(cx, cy, cw, chh, cstate, depth64 + 1, npath)
            return
        npath = (path[0] if depth64 > 0 else None,
                 path[1] if depth64 > 1 else None)
        enc._luma_root_split = luma_root["split"]
        enc._luma_root_isp = False
        cok = 1 if (cfg.cclm and enc._cclm_allowed_dual(npath)) else 0
        leaves.append((x, y, w, h, state.qt_depth, cok))

    n_ctu_x = (cfg.width + 127) // 128
    n_ctu_y = (cfg.height + 127) // 128
    for cty in range(n_ctu_y):
        for ctx_i in range(n_ctu_x):
            for (qx, qy, qw, qh) in enc._children(
                    ctx_i * 128, cty * 128, 128, 128, Split.QT):
                if qx >= cfg.width or qy >= cfg.height:
                    continue
                st = SplitState(last_split=Split.QT, qt_depth=1)
                if decide_luma is not None:
                    imp = get_implicit_split(qx, qy, qw, qh, st, cfg)
                    luma_root["split"] = imp if imp != Split.NONE \
                        else decide_luma(qx, qy, qw, qh, st)
                walk(qx, qy, qw, qh, st)
    return leaves


# ---------------------------------------------------------------------------
# host-side scheduling
# ---------------------------------------------------------------------------

def _order_grid(leaves, width, height):
    """(H/4, W/4) grid of each unit's leaf index in coding order."""
    g = np.full((height // 4, width // 4), -1, np.int32)
    for i, leaf in enumerate(leaves):
        x, y, w, h = leaf[:4]
        g[y // 4:(y + h) // 4, x // 4:(x + w) // 4] = i
    return g


def _schedule_waves(leaves, order, width, height, vpdu_dep=False):
    """Wave level per leaf: 1 + max level over earlier-coding-order
    leaves intersecting the intra reference template (above row
    x-1..x+2w-1, left column y..y+2h-1).  ``vpdu_dep``: additionally
    wait for the leaf's 64x64 VPDU's above-row/left-column neighbours
    — the LMCS chroma-residual scale averages them
    (calculateChromaAdjVpduNei, Reshape.cpp:106), so they must be
    reconstructed before the CU's wave step."""
    r4, c4 = order.shape
    wave = np.zeros(len(leaves), np.int32)
    for i, leaf in enumerate(leaves):
        x, y, w, h = leaf[:4]
        lvl = 0
        if y > 0:
            c0 = max(0, (x - 4) // 4)
            c1 = min(c4, (x + 2 * w + 3) // 4)
            row = order[(y - 4) // 4, c0:c1]
            m = row[(row >= 0) & (row < i)]
            if m.size:
                lvl = int(wave[m].max()) + 1
        if x > 0:
            r0 = y // 4
            r1 = min(r4, (y + 2 * h + 3) // 4)
            col = order[r0:r1, (x - 4) // 4]
            m = col[(col >= 0) & (col < i)]
            if m.size:
                lvl = max(lvl, int(wave[m].max()) + 1)
        if vpdu_dep:
            vx, vy = (x // 64) * 64, (y // 64) * 64
            if vx > 0:
                col = order[vy // 4:min(r4, (vy + 64) // 4), (vx - 4) // 4]
                m = col[(col >= 0) & (col < i)]
                if m.size:
                    lvl = max(lvl, int(wave[m].max()) + 1)
            if vy > 0:
                row = order[(vy - 4) // 4, vx // 4:min(c4, (vx + 64) // 4)]
                m = row[(row >= 0) & (row < i)]
                if m.size:
                    lvl = max(lvl, int(wave[m].max()) + 1)
        wave[i] = lvl
    return wave


class WavefrontEncoder(FrameEncoder):
    """FrameEncoder with the CU compute lifted onto the device as
    batched wavefronts.  Conformance-equivalent streams (decodable by
    the stock VTM decoder); decisions may differ from the sequential
    path (pure-SATD RMD, order-independent rate proxies)."""

    _UNSUPPORTED = ("mrl", "isp", "dep_quant")

    def _set_mip_fields(self, cu, code):
        """Decode the device mip plane value (0 = angular, else
        1 + t*MAX_MODES + mode)."""
        if code:
            idx = code - 1
            cu.mip = True
            cu.mip_transpose = idx >= 16
            cu.mip_mode = idx % 16

    def __init__(self, cfg, *, mesh=None, batch=None, **kw):
        kw.setdefault("mode_select", "satd")
        super().__init__(cfg, **kw)
        self.mesh = mesh          # optional dp mesh for CU-batch sharding
        self.batch = dict(DEFAULT_BATCH)
        if batch:
            self.batch.update(batch)
        if mesh is not None:
            nd = mesh.size
            for p in self.batch:
                self.batch[p] = ((self.batch[p] + nd - 1) // nd) * nd
        bad = [f for f in self._UNSUPPORTED if getattr(cfg, f)]
        if bad:
            raise NotImplementedError(
                f"wavefront path does not support: {bad}; "
                "use FrameEncoder")

    # ---- phase A: leaf collection (geometry only) ----------------------

    def _collect_leaves(self, decide):
        cfg = self.cfg
        leaves = []

        def walk(x, y, w, h, state):
            if x >= cfg.width or y >= cfg.height:
                return
            implicit = get_implicit_split(x, y, w, h, state, cfg)
            split = implicit if implicit != Split.NONE \
                else decide(x, y, w, h, state)
            if split is RDO:
                raise NotImplementedError(
                    "RDO fallback inside the wavefront path")
            if (not cfg.dual_tree and split != Split.NONE
                    and self._scipu_cond(w, h, split)):
                # single tree: refuse SCIPU-triggering splits — must
                # mirror _encode_tree's guard or the replay tree would
                # diverge from the collected leaves
                if split == implicit:
                    raise NotImplementedError(
                        "implicit boundary split triggers SCIPU")
                split = Split.NONE
            if split != Split.NONE:
                imp_bt = state.implicit_bt_depth + (
                    1 if split == implicit
                    and split in (Split.BT_H, Split.BT_V) else 0)
                for i, (cx, cy, cw, chh) in enumerate(
                        self._children(x, y, w, h, split)):
                    cstate = SplitState(
                        last_split=split, part_idx=i,
                        qt_depth=state.qt_depth
                        + (1 if split == Split.QT else 0),
                        mtt_depth=state.mtt_depth
                        + (0 if split == Split.QT else 1),
                        implicit_bt_depth=imp_bt)
                    walk(cx, cy, cw, chh, cstate)
                return
            leaves.append((x, y, w, h, state.qt_depth))

        n_ctu_x = (cfg.width + 127) // 128
        n_ctu_y = (cfg.height + 127) // 128
        for cty in range(n_ctu_y):
            for ctx_i in range(n_ctu_x):
                walk(ctx_i * 128, cty * 128, 128, 128, SplitState())
        return leaves

    # ---- phase B: batched device waves ----------------------------------

    def _qps(self):
        cfg = self.cfg
        qp_y = cfg.qp + self.qp_bd_offset
        qpi = max(-self.qp_bd_offset, min(63, cfg.qp))
        qp_c = int(self.qp_table[qpi + self.qp_bd_offset]) \
            + cfg.chroma_qp_offset
        qp_c = max(-self.qp_bd_offset, min(63, qp_c)) + self.qp_bd_offset
        return qp_y, qp_c

    def _batched_pass(self, frames, fetch=True):
        """frames: list of (leaves_luma, leaves_chroma_or_None, y, u, v).
        Encodes all frames' waves together; returns per-frame packed
        result planes.  Dual tree appends the chroma tree's wave levels
        after the frame's luma levels (DM reads the luma mode grid).
        ``fetch=False`` returns the un-read device arrays — dispatch is
        asynchronous, so the caller can overlap host work (CABAC
        replay) with the device scan and ``jax.device_get`` later."""
        cfg = self.cfg
        bd = cfg.bit_depth
        qp_y, qp_c = self._qps()
        F = len(frames)
        H, W = cfg.height, cfg.width

        import collections
        ogs, ogcs, per_frame = [], [], []
        crs_on = bool(cfg.lmcs and cfg.lmcs_chroma_scaling)
        for f, (leaves, cleaves, *_d) in enumerate(frames):
            order = _order_grid(leaves, W, H)
            # single tree codes chroma inside the luma wave step, so
            # the CRS VPDU-neighbour dependency applies there; the
            # dual-tree chroma schedule runs after the whole luma
            # plane and needs none
            wave = _schedule_waves(leaves, order, W, H,
                                   vpdu_dep=crs_on and cleaves is None)
            ogs.append(order)
            by_lvl = collections.defaultdict(list)
            kind = "st" if cleaves is None else "luma"
            st_cclm = 1 if (cleaves is None and cfg.cclm) else 0
            for i, (x, y, w, h, _) in enumerate(leaves):
                p = 32 if max(w, h) <= 32 else 64
                by_lvl[int(wave[i])].append(
                    ((kind, p), f, x, y, w, h, i, st_cclm))
            q = collections.deque(
                collections.deque(by_lvl[lv]) for lv in sorted(by_lvl))
            if cleaves is None:
                ogcs.append(order)       # single tree: shared order
            else:
                orderc = _order_grid(cleaves, W, H)
                wavec = _schedule_waves(cleaves, orderc, W, H)
                ogcs.append(orderc)
                by_lvl_c = collections.defaultdict(list)
                for i, (x, y, w, h, _, cok) in enumerate(cleaves):
                    p = 32 if max(w, h) <= 32 else 64
                    by_lvl_c[int(wavec[i])].append(
                        (("chroma", p), f, x, y, w, h, i, cok))
                q.extend(collections.deque(by_lvl_c[lv])
                         for lv in sorted(by_lvl_c))
            per_frame.append(q)

        # greedy cross-frame packing: CUs only depend on earlier wave
        # levels of their OWN frame, so different frames' levels
        # interleave freely — a step mixes frame A's level 3 with frame
        # B's level 7, filling the batch slots that a per-(level, class)
        # segmentation left mostly empty (~2 of 16 at 416x240).  A
        # frame's next level becomes schedulable the step after its
        # current level finishes.
        ready = [0] * F
        steps = []
        while any(per_frame):
            t = len(steps)
            step = collections.defaultdict(list)
            for f in range(F):
                q = per_frame[f]
                while q and ready[f] <= t:
                    ents = q[0]
                    while ents and len(step[ents[0][0]]) \
                            < self.batch[ents[0][0][1]]:
                        step[ents[0][0]].append(ents.popleft())
                    if ents:
                        break              # class slots full this step
                    q.popleft()
                    ready[f] = t + 1       # next level waits a step
            steps.append(step)

        active = tuple(sorted({k2 for st in steps for k2 in st
                               if st[k2]}))
        S = max(len(steps), 1)
        step_arr = {k2: np.zeros((S, self.batch[k2[1]], 8), np.int32)
                    for k2 in active}
        for t, st in enumerate(steps):
            for k2, ents in st.items():
                for k, (_c, f, x, y, w, h, i, flg) in enumerate(ents):
                    step_arr[k2][t, k] = (f, x, y, w, h, i, 1, flg)
        scheds = [jnp.asarray(step_arr[k2]) for k2 in active]

        # LMCS: luma is coded in the MAPPED domain — fwd-map the source
        # once on upload; recon planes stay mapped (intra refs read
        # them) and the shared encode_frame tail inverse-maps before
        # the in-loop filters (Reshape.cpp; encoder.py:2332)
        if self.reshaper is not None:
            oy = jnp.asarray(np.stack(
                [self.reshaper.fwd(np.asarray(fr[2], np.int32))
                 .astype(np.int32) for fr in frames]))
        else:
            oy = jnp.asarray(np.stack([np.asarray(fr[2], np.int32)
                                       for fr in frames]))
        ou = jnp.asarray(np.stack([np.asarray(fr[3], np.int32)
                                   for fr in frames]))
        ov = jnp.asarray(np.stack([np.asarray(fr[4], np.int32)
                                   for fr in frames]))
        og4 = jnp.asarray(np.stack(ogs))
        og4c = jnp.asarray(np.stack(ogcs))
        ry = jnp.zeros((F, H, W), jnp.int32)
        ru = jnp.zeros((F, H // 2, W // 2), jnp.int32)
        rv = jnp.zeros_like(ru)
        cY = jnp.zeros((F, H, W), jnp.int16)
        cU = jnp.zeros((F, H // 2, W // 2), jnp.int16)
        cV = jnp.zeros_like(cU)
        mg = jnp.zeros((F, H // 4, W // 4), jnp.uint8)
        tg = jnp.zeros_like(mg)
        pg = jnp.zeros_like(mg)
        cg = jnp.zeros_like(mg)
        lg = jnp.zeros_like(mg)

        fn = _wave_scan(active, tuple(self.batch[k2[1]] for k2 in active),
                        qp_y, qp_c, bd, float(self.lam), float(self.dw_c),
                        bool(cfg.rd_quant), mts=bool(cfg.mts_intra),
                        mip=bool(cfg.mip), cclm=bool(cfg.cclm),
                        lfnst=bool(cfg.lfnst),
                        sdh=bool(cfg.sign_hiding),
                        jccr=bool(cfg.joint_cbcr),
                        qp_j=qp_c - cfg.chroma_qp_offset
                        + cfg.jccr_qp_offset,
                        crs_cfg=(bd, cfg.lmcs_offset) if crs_on
                        else None,
                        ts_max=(1 << cfg.ts_max_log2)
                        if cfg.transform_skip else 0, mesh=self.mesh)
        packed = fn(ry, ru, rv, cY, cU, cV, mg, tg, pg, cg, lg, oy, ou,
                    ov, og4, og4c, *scheds)
        if not fetch:
            return packed          # async: device arrays, not yet read
        return jax.device_get(packed)

    # ---- phase C: CABAC replay ------------------------------------------

    def _encode_cu(self, enc, rc, org_y, org_u, org_v, cu: CuInfo):
        x, y, w, h = cu.x, cu.y, cu.w, cu.h
        f = self._cur_frame
        ry, ru, rv, cY, cU, cV, mg, tg, pg, cg, lg = self._dev_result
        cu.mode = int(mg[f, y // 4, x // 4])
        mts_idx = int(tg[f, y // 4, x // 4])
        lfnst_idx = int(lg[f, y // 4, x // 4])
        self._set_mip_fields(cu, int(pg[f, y // 4, x // 4]))
        cg_code = int(cg[f, y // 4, x // 4])
        cclm_flag = bool(cg_code & 1)
        joint = bool(cg_code & 2)
        lev_y = cY[f, y:y + h, x:x + w].astype(np.int32)
        cx, cy, cw, chh = x // 2, y // 2, w // 2, h // 2
        lev_u = cU[f, cy:cy + chh, cx:cx + cw].astype(np.int32)
        lev_v = cV[f, cy:cy + chh, cx:cx + cw].astype(np.int32)
        cbf_y = bool(lev_y.any())
        cbf_u = bool(lev_u.any())
        cbf_v = bool(lev_v.any())

        self._write_intra_luma_mode(enc, cu)
        self._write_intra_chroma_mode(enc, cclm=cclm_flag, lm_symbol=0)
        enc.encode_bin(1 if cbf_u else 0, ctx("QtCbf1", 0))
        enc.encode_bin(1 if cbf_v else 0,
                       ctx("QtCbf2", 1 if cbf_u else 0))
        enc.encode_bin(1 if cbf_y else 0, ctx("QtCbf0", 0))
        cbf_mask = (2 if cbf_u else 0) + (1 if cbf_v else 0)
        if self.cfg.joint_cbcr and cbf_mask:
            enc.encode_bin(1 if joint else 0,
                           ctx("JointCbCrFlag", cbf_mask - 1))
        ts_y = mts_idx == 1              # MTS_SKIP = transform skip
        last_pos_y, violates = -1, False
        if cbf_y:
            last_pos_y, violates = self._write_resid(rc, lev_y, w, h,
                                                     True, ts=ts_y)
        if cbf_u:
            self._write_resid(rc, lev_u, cw, chh, False)
        if cbf_v and not joint:
            self._write_resid(rc, lev_v, cw, chh, False)
        comps = [(w, h, lev_y)] if cbf_y and not ts_y else []
        comps += ([(cw, chh, lev_u)] if cbf_u else [])
        comps += ([(cw, chh, lev_v)] if cbf_v else [])
        if not cbf_y:
            lfnst_idx = 0
        self._write_lfnst_idx(enc, cu, lfnst_idx, comps, False,
                              ts_used=cbf_y and ts_y)
        if lfnst_idx == 0 and not ts_y:
            self._write_mts_idx(enc, mts_idx, w, h, cbf_y, last_pos_y,
                                violates)

        self.recon_y[y:y + h, x:x + w] = ry[f, y:y + h, x:x + w]
        self.recon_u[cy:cy + chh, cx:cx + cw] = ru[f, cy:cy + chh,
                                                   cx:cx + cw]
        self.recon_v[cy:cy + chh, cx:cx + cw] = rv[f, cy:cy + chh,
                                                   cx:cx + cw]
        self.unit_joint2[cy // 2:(cy + chh) // 2,
                         cx // 2:(cx + cw) // 2] = \
            bool(joint and cbf_u and cbf_v)
        r, c = y // 4, x // 4
        self.coded[r:r + h // 4, c:c + w // 4] = True
        self.unit_mode[r:r + h // 4, c:c + w // 4] = cu.mode
        self.unit_w[r:r + h // 4, c:c + w // 4] = w
        self.unit_h[r:r + h // 4, c:c + w // 4] = h
        self.unit_qt[r:r + h // 4, c:c + w // 4] = cu.qt_depth
        self.unit_mip[r:r + h // 4, c:c + w // 4] = cu.mip
        self.leaf_l.append((x, y, w, h))
        self.leaf_c.append((cx, cy, cw, chh))

    def _encode_luma_cu(self, enc, rc, org_y, cu: CuInfo):
        """Dual-tree luma CU replay from device results."""
        x, y, w, h = cu.x, cu.y, cu.w, cu.h
        f = self._cur_frame
        ry, ru, rv, cY, cU, cV, mg, tg, pg, cg, lg = self._dev_result
        cu.mode = int(mg[f, y // 4, x // 4])
        mts_idx = int(tg[f, y // 4, x // 4])
        lfnst_idx = int(lg[f, y // 4, x // 4])
        self._set_mip_fields(cu, int(pg[f, y // 4, x // 4]))
        lev_y = cY[f, y:y + h, x:x + w].astype(np.int32)
        cbf_y = bool(lev_y.any())
        ts_y = mts_idx == 1              # MTS_SKIP = transform skip
        self._write_intra_luma_mode(enc, cu)
        enc.encode_bin(1 if cbf_y else 0, ctx("QtCbf0", 0))
        last_pos_y, violates = -1, False
        if cbf_y:
            last_pos_y, violates = self._write_resid(rc, lev_y, w, h,
                                                     True, ts=ts_y)
        if not cbf_y:
            lfnst_idx = 0
        self._write_lfnst_idx(enc, cu, lfnst_idx,
                              [(w, h, lev_y)] if cbf_y and not ts_y
                              else [], True, ts_used=cbf_y and ts_y)
        if lfnst_idx == 0 and not ts_y:
            self._write_mts_idx(enc, mts_idx, w, h, cbf_y, last_pos_y,
                                violates)
        self.recon_y[y:y + h, x:x + w] = ry[f, y:y + h, x:x + w]
        r, c = y // 4, x // 4
        self.coded[r:r + h // 4, c:c + w // 4] = True
        self.unit_mode[r:r + h // 4, c:c + w // 4] = cu.mode
        self.unit_w[r:r + h // 4, c:c + w // 4] = w
        self.unit_h[r:r + h // 4, c:c + w // 4] = h
        self.unit_qt[r:r + h // 4, c:c + w // 4] = cu.qt_depth
        self.unit_mip[r:r + h // 4, c:c + w // 4] = cu.mip
        self.leaf_l.append((x, y, w, h))

    def _encode_chroma_cu(self, enc, rc, org_u, org_v, cu: CuInfo,
                          split_path=(None, None)):
        """Dual-tree chroma CU replay from device results (DM mode)."""
        x, y, w, h = cu.x, cu.y, cu.w, cu.h
        cx, cy, cw, chh = x // 2, y // 2, w // 2, h // 2
        f = self._cur_frame
        ry, ru, rv, cY, cU, cV, mg, tg, pg, cg, lg = self._dev_result
        cu.mode = int(self.unit_mode[(y + h // 2) // 4,
                                     (x + w // 2) // 4])
        lev_u = cU[f, cy:cy + chh, cx:cx + cw].astype(np.int32)
        lev_v = cV[f, cy:cy + chh, cx:cx + cw].astype(np.int32)
        cbf_u = bool(lev_u.any())
        cbf_v = bool(lev_v.any())
        cg_code = int(cg[f, y // 4, x // 4])
        cclm_flag = bool(cg_code & 1)
        joint = bool(cg_code & 2)
        self._write_intra_chroma_mode(
            enc, cclm=cclm_flag,
            cclm_allowed=self.cfg.cclm
            and self._cclm_allowed_dual(split_path),
            lm_symbol=0, luma_mode=cu.mode)
        enc.encode_bin(1 if cbf_u else 0, ctx("QtCbf1", 0))
        enc.encode_bin(1 if cbf_v else 0, ctx("QtCbf2", 1 if cbf_u else 0))
        cbf_mask = (2 if cbf_u else 0) + (1 if cbf_v else 0)
        if self.cfg.joint_cbcr and cbf_mask:
            enc.encode_bin(1 if joint else 0,
                           ctx("JointCbCrFlag", cbf_mask - 1))
        if cbf_u:
            self._write_resid(rc, lev_u, cw, chh, False)
        if cbf_v and not joint:
            self._write_resid(rc, lev_v, cw, chh, False)
        if min(cw, chh) >= 4:
            comps = ([(cw, chh, lev_u)] if cbf_u else []) \
                + ([(cw, chh, lev_v)] if cbf_v else [])
            self._write_lfnst_idx(enc, cu, 0, comps, True)
        self.recon_u[cy:cy + chh, cx:cx + cw] = ru[f, cy:cy + chh,
                                                   cx:cx + cw]
        self.recon_v[cy:cy + chh, cx:cx + cw] = rv[f, cy:cy + chh,
                                                   cx:cx + cw]
        self.unit_joint2[cy // 2:(cy + chh) // 2,
                         cx // 2:(cx + cw) // 2] = \
            bool(joint and cbf_u and cbf_v)
        r, c = y // 4, x // 4
        self.coded_c[r:r + h // 4, c:c + w // 4] = True
        self.unit_w_c[r:r + h // 4, c:c + w // 4] = w
        self.unit_h_c[r:r + h // 4, c:c + w // 4] = h
        self.unit_qt_c[r:r + h // 4, c:c + w // 4] = cu.qt_depth
        self.leaf_c.append((cx, cy, cw, chh))

    # ---- driver ----------------------------------------------------------

    def _decider(self, qt_map, maps):
        if maps is not None:
            return self._apply_ablations(self._map_decider(*maps))
        qm = qt_map if qt_map is not None else \
            np.ones((self.cfg.height // 8, self.cfg.width // 8), np.int32)
        return self._apply_ablations(self._qt_map_decider(qm))

    def _decider_chroma(self, qt_map, maps, chroma_maps):
        """Chroma-tree decider (mirror of FrameEncoder.encode_frame's
        decide_c construction)."""
        cfg = self.cfg
        cmaps = chroma_maps or maps
        if cmaps is not None:
            return self._map_decider(*cmaps, chroma=True)
        cqt = qt_map if qt_map is not None else \
            np.ones((cfg.height // 8, cfg.width // 8), np.int32)

        def decide_c(x, yy, w, h, state, _q=cqt):
            if w > 64:
                return Split.QT
            if state.mtt_depth == 0 and w == h \
                    and w > cfg.chroma_min_qt:
                pred = int(_q[min(yy, cfg.height - 1) // 8,
                              min(x, cfg.width - 1) // 8]) + 1
                if state.qt_depth < pred:
                    return Split.QT
            return Split.NONE
        return decide_c

    @staticmethod
    def _hybrid(map_decide, rdo_decide):
        """Map decision inside the gate, device-RDO outside — the
        wavefront counterpart of EncModeCtrl.cpp:1242-1252's L<3
        stock-RDO re-enable (the map decider returns the RDO sentinel
        for needs_rdo nodes when rdo_fallback is on)."""
        def decide(x, y, w, h, state):
            s = map_decide(x, y, w, h, state)
            return rdo_decide(x, y, w, h, state) if s is RDO else s
        return decide

    def _rdo_decides(self, frames, maps=None, chroma_maps=None):
        """Per-frame (luma, chroma) device-RDO fallback deciders, LAZY:
        the batched open-loop search only runs if some node actually
        defers (at L3 with full map coverage nothing does, so the
        fallback costs nothing there).  At L0 the predicted QT map
        bans QT re-splits in the fallback (tryMode,
        EncModeCtrl.cpp:2017-2035)."""
        cache = {}
        qt_ban = maps[2] if (self.accel_level == 0
                             and maps is not None) else None
        cmaps = chroma_maps or maps
        qt_ban_c = cmaps[2] if (self.accel_level == 0
                                and cmaps is not None) else None

        def solve():
            if "l" not in cache:
                from .rdo_device import DeviceRDO
                rdo = DeviceRDO(self)
                cache["l"] = rdo.search_frames(
                    frames, qt_ban_map=qt_ban)[0]
                cache["c"] = (rdo.search_frames_chroma(
                    frames, qt_ban_map=qt_ban_c)[0]
                    if self.cfg.dual_tree else None)
            return cache

        def mk(f, chroma):
            def decide(x, y, w, h, state):
                c = solve()
                d = (c["c"] if chroma else c["l"])[f]
                return d(x, y, w, h, state)
            return decide

        return [(mk(f, False), mk(f, True))
                for f in range(len(frames))]

    def _collect_all(self, qt_map, maps, chroma_maps, rdo_dec=None):
        decide = self._decider(qt_map, maps)
        if rdo_dec is not None:
            decide = self._hybrid(decide, rdo_dec[0])
        leaves = self._collect_leaves(decide)
        cleaves = None
        if self.cfg.dual_tree:
            decide_c = self._decider_chroma(qt_map, maps, chroma_maps)
            if rdo_dec is not None:
                decide_c = self._hybrid(decide_c, rdo_dec[1])
            cleaves = _collect_leaves_chroma(
                self, decide_c, decide_luma=decide)
        return leaves, cleaves

    def encode_frames(self, frames, qt_map=None, maps=None,
                      chroma_maps=None, poc0: int = 0,
                      pipeline_chunk: int | None = None):
        """Encode a batch of (y, u, v) frames in one device pass.

        Returns a list of (bitstream_bytes, recon) — one per frame; the
        caller concatenates payloads after the parameter sets.  With
        ``rdo_fallback`` the trees are content-dependent (device-RDO
        beyond map coverage at accel level < 3), so leaves are
        collected per frame; otherwise the map tree is shared.

        ``pipeline_chunk``: split the frame set into chunks of this
        size, dispatch ALL chunks' wave scans up front (XLA queues them
        on the device), and fetch+replay chunk k while chunks k+1.. are
        still executing — the host CABAC replay (BinEncoder semantics,
        ~0.1-0.2 s/frame serial) leaves the critical path (SURVEY §7.4
        north star; VERDICT r4 weak #8)."""
        F = len(frames)
        per_frame_maps = isinstance(maps, list) \
            or isinstance(chroma_maps, list)
        if not per_frame_maps and not self.rdo_fallback:
            leaves, cleaves = self._collect_all(qt_map, maps, chroma_maps)
            deciders = [(None, None, maps, chroma_maps)] * F
            packed = [(leaves, cleaves, y, u, v) for (y, u, v) in frames]
        else:
            maps_l = maps if isinstance(maps, list) else [maps] * F
            cmaps_l = chroma_maps if isinstance(chroma_maps, list) \
                else [chroma_maps] * F
            deciders, packed = [], []
            for f, (y, u, v) in enumerate(frames):
                rdo_dec = self._rdo_decides(
                    [(y, u, v)], maps_l[f], cmaps_l[f])[0] \
                    if self.rdo_fallback else None
                decide = self._decider(qt_map, maps_l[f])
                decide_c = None
                if rdo_dec is not None:
                    decide = self._hybrid(decide, rdo_dec[0])
                leaves = self._collect_leaves(decide)
                cleaves = None
                if self.cfg.dual_tree:
                    decide_c = self._decider_chroma(
                        qt_map, maps_l[f], cmaps_l[f])
                    if rdo_dec is not None:
                        decide_c = self._hybrid(decide_c, rdo_dec[1])
                    cleaves = _collect_leaves_chroma(
                        self, decide_c, decide_luma=decide)
                deciders.append(
                    (decide if rdo_dec is not None else None,
                     decide_c if rdo_dec is not None else None,
                     maps_l[f], cmaps_l[f]))
                packed.append((leaves, cleaves, y, u, v))
        if pipeline_chunk:
            # dispatch every chunk's scan first (async), then replay in
            # order while later chunks execute on the device
            chunks = [(c0, self._batched_pass(
                packed[c0:c0 + pipeline_chunk], fetch=False))
                for c0 in range(0, F, pipeline_chunk)]
            out = []
            for c0, dev in chunks:
                self._dev_result = jax.device_get(dev)
                for k in range(c0, min(c0 + pipeline_chunk, F)):
                    self._cur_frame = k - c0
                    y, u, v = frames[k]
                    dfn, dcfn, m, cm = deciders[k]
                    out.append(super().encode_frame(
                        y, u, v, qt_map=qt_map, maps=m, chroma_maps=cm,
                        poc=poc0 + k, decide_fn=dfn, decide_c_fn=dcfn))
            return out
        self._dev_result = self._batched_pass(packed)
        out = []
        for f, (y, u, v) in enumerate(frames):
            self._cur_frame = f
            dfn, dcfn, m, cm = deciders[f]
            out.append(super().encode_frame(
                y, u, v, qt_map=qt_map, maps=m, chroma_maps=cm,
                poc=poc0 + f, decide_fn=dfn, decide_c_fn=dcfn))
        return out

    def encode_frame(self, y, u, v, qt_map=None, maps=None,
                     chroma_maps=None, poc: int = 0,
                     collect_bin_stats: bool = False, rdo: bool = False):
        if rdo:
            # device-batched open-loop QTMT search, then the standard
            # closed-loop wavefront coding of the chosen tree
            from .rdo_device import DeviceRDO
            drdo = DeviceRDO(self)
            decide = drdo.search(y, u, v)
            decide_c = None
            cleaves = None
            leaves = self._collect_leaves(decide)
            if self.cfg.dual_tree:
                decide_c = drdo.search_frames_chroma([(y, u, v)])[0][0]
                cleaves = _collect_leaves_chroma(self, decide_c,
                                                 decide_luma=decide)
            self._dev_result = self._batched_pass(
                [(leaves, cleaves, y, u, v)])
            self._cur_frame = 0
            return super().encode_frame(
                y, u, v, poc=poc, collect_bin_stats=collect_bin_stats,
                decide_fn=decide, decide_c_fn=decide_c)
        rdo_dec = None
        decide_fn = decide_c_fn = None
        if self.rdo_fallback:
            rdo_dec = self._rdo_decides([(y, u, v)], maps,
                                        chroma_maps)[0]
            decide_fn = self._hybrid(self._decider(qt_map, maps),
                                     rdo_dec[0])
            if self.cfg.dual_tree:
                decide_c_fn = self._hybrid(
                    self._decider_chroma(qt_map, maps, chroma_maps),
                    rdo_dec[1])
        leaves, cleaves = self._collect_all(qt_map, maps, chroma_maps,
                                            rdo_dec=rdo_dec)
        self._dev_result = self._batched_pass([(leaves, cleaves, y, u, v)])
        self._cur_frame = 0
        return super().encode_frame(
            y, u, v, qt_map=qt_map, maps=maps, chroma_maps=chroma_maps,
            poc=poc, collect_bin_stats=collect_bin_stats,
            decide_fn=decide_fn, decide_c_fn=decide_c_fn)
