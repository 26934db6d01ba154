"""Batched wavefront frame encoder — the TPU execution path.

Replaces the reference's sequential CTU raster + CU recursion
(EncSlice.cpp:1686 -> EncCu.cpp:531) with a dependency-levelled batched
schedule.  The PMP partition map fixes the whole CU tree before coding
starts, so every leaf CU of the frame is known up front; the encoder

  1. collects the leaf CUs in coding order (host, pure geometry),
  2. levels them into *waves*: CU A waits only for earlier-coding-order
     CUs whose reconstruction intersects A's intra reference template —
     reference-sample *availability* is precomputed from the coding
     order (a static per-4x4 "coding time" grid), so wave scheduling can
     run ahead of coding order without changing normative semantics,
  3. runs each wave as a handful of fused, jitted, size-bucketed device
     programs: reference gather -> substitution/smoothing -> 67-mode
     batched intra prediction -> SATD mode select -> DCT-II
     transform/quant/dequant/inverse roundtrip -> RD zeroing -> recon
     scatter, with the recon planes resident on the device the whole
     time (one host->device transfer of the originals at the start, one
     device->host fetch of all levels/modes/recon at the end — the wave
     loop itself never synchronises, so dispatch latency pipelines),
  4. replays the precomputed decisions through the host CABAC writer
     (record/replay; BinEncoder semantics unchanged) and the standard
     loop-filter / NAL tail of FrameEncoder.

Supported envelope (v1): single tree, map- or QT-driven partitioning,
tools-off TU coding (DCT2, scalar quant + RDOQ-lite zeroing), SAO/ALF/
deblocking allowed (frame-level post passes).  Everything else falls
back to the sequential FrameEncoder.
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from ..ops.distortion import satd as satd_kernel
from ..ops.intra import (fill_reference_samples, filter_reference_samples,
                         predict_block)
from ..ops.quant import (INV_QUANT_SCALES, IQUANT_SHIFT, _geom, dequantize,
                         quantize)
from ..ops.transforms import DCT2, forward_transform, inverse_transform
from .encoder import RDO, CuInfo, FrameEncoder
from .mtt import Split, SplitState, get_implicit_split
from .residual import ctx, grouped_scan, log2_sbb_size


# ---------------------------------------------------------------------------
# device-side helpers
# ---------------------------------------------------------------------------

def _bits_proxy(lev):
    """Order-independent residual-rate proxy (bits) for the zero-TU
    decision; stands in for the live-context estimate the sequential
    path uses (the wavefront path fixes recon before entropy coding)."""
    a = jnp.abs(lev).astype(jnp.float32)
    nz = (a > 0).sum(axis=(-1, -2)).astype(jnp.float32)
    mag = jnp.where(a > 0, 2.0 * jnp.ceil(jnp.log2(a + 1.0)) + 1.0, 0.0)
    return 8.0 + mag.sum(axis=(-1, -2)) + nz


def _rd_cleanup(lev, coef, w, h, qp, bd, lam):
    """jnp port of residual.rd_quant_cleanup (RDOQ-lite zeroing):
    per-coding-group and isolated-|1| zeroing with the same ~3 bits per
    nonzero rate model, batched over the CU dimension."""
    t_shift, sqrt2 = _geom(w, h, bd)
    # transform energy gain: 4^t_shift, halved for odd-log2-area TUs
    # (the sqrt(2) compensation is folded into the quantiser scale)
    divisor = float(4.0 ** t_shift) / (2.0 if sqrt2 else 1.0)
    iscale = int(INV_QUANT_SCALES[sqrt2][qp % 6])
    rshift = IQUANT_SHIFT - ((t_shift - sqrt2) + qp // 6)
    b = lev.shape[0]
    fl = lev.reshape(b, -1).astype(jnp.int32)
    fc = coef.reshape(b, -1).astype(jnp.float32)
    if rshift > 0:
        deq = (fl * iscale + (1 << (rshift - 1))) >> rshift
    else:
        deq = (fl * iscale) << (-rshift)
    gain = (fc * fc - (fc - deq.astype(jnp.float32)) ** 2) / divisor
    # the grouped scan covers only the non-zeroed-out coefficient area
    # (32x32 for 64-point transforms); everything outside is already 0
    scan = grouped_scan(w, h)[:, 0]
    log2w, log2h = w.bit_length() - 1, h.bit_length() - 1
    cgl2w, cgl2h = log2_sbb_size(log2w, log2h)
    cg = 1 << (cgl2w + cgl2h)
    gl = fl[:, scan].reshape(b, -1, cg)
    gg = gain[:, scan].reshape(b, -1, cg)
    k = (gl != 0).sum(axis=-1).astype(jnp.float32)
    kill_cg = gg.sum(axis=-1) < lam * (3.0 * k + 1.5)
    gl = jnp.where(kill_cg[..., None], 0, gl)
    gl = jnp.where((jnp.abs(gl) == 1) & (gg < lam * 3.0), 0, gl)
    return fl.at[:, scan].set(gl.reshape(b, -1)).reshape(lev.shape)


def _gather_refs(plane, xs, ys, at, al, ac, w, h, bd):
    """Batched reference construction for B blocks of (w, h) at
    (xs, ys) in ``plane``: raw gather + availability-masked
    substitution + MDIS smoothing (xFillReferenceSamples +
    xFilterReferenceSamples, batched)."""
    hh, ww = plane.shape
    t_rows = jnp.clip(ys - 1, 0, hh - 1)[:, None]
    t_cols = jnp.clip(xs[:, None] + jnp.arange(2 * w)[None, :], 0, ww - 1)
    top_raw = plane[jnp.broadcast_to(t_rows, t_cols.shape), t_cols]
    l_rows = jnp.clip(ys[:, None] + jnp.arange(2 * h)[None, :], 0, hh - 1)
    l_cols = jnp.clip(xs - 1, 0, ww - 1)[:, None]
    left_raw = plane[l_rows, jnp.broadcast_to(l_cols, l_rows.shape)]
    corner_raw = plane[jnp.clip(ys - 1, 0, hh - 1), jnp.clip(xs - 1, 0, ww - 1)]
    top, left = fill_reference_samples(
        top_raw.astype(jnp.int32), left_raw.astype(jnp.int32),
        at, al, ac, corner_raw.astype(jnp.int32), bit_depth=bd)
    top_f, left_f = filter_reference_samples(top, left)
    return top, left, top_f, left_f


def _tq_zero(orgs, pred, w, h, qp, bd, lam, dw, rd_quant):
    """Fused transform->quant->(RD zeroing)->dequant->inverse roundtrip
    with the zero-TU candidate competing (cost = dw*SSE + lam*bits)."""
    resid = orgs - pred
    coef = forward_transform(resid, DCT2, DCT2, bit_depth=bd)
    lev = quantize(coef, w=w, h=h, qp=qp, bit_depth=bd)
    if rd_quant:
        lev = _rd_cleanup(lev, coef, w, h, qp, bd, lam)
    deq = dequantize(lev, w=w, h=h, qp=qp, bit_depth=bd)
    rr = inverse_transform(deq, DCT2, DCT2, bit_depth=bd)
    err = (rr - resid).astype(jnp.float32)
    cost_code = dw * (err * err).sum(axis=(-1, -2)) \
        + lam * _bits_proxy(lev)
    rz = resid.astype(jnp.float32)
    cost_zero = dw * (rz * rz).sum(axis=(-1, -2)) + lam * 2.0
    zero = cost_zero <= cost_code
    lev = jnp.where(zero[:, None, None], 0, lev)
    rr = jnp.where(zero[:, None, None], 0, rr)
    rec = jnp.clip(pred + rr, 0, (1 << bd) - 1)
    return lev, rec


@functools.cache
def _wave_step(w, h, bsz, qp_y, qp_c, bd, lam, dw_c, rd_quant,
               mesh=None):
    """One jitted wave step for a (w, h) size bucket of ``bsz`` CUs:
    luma RMD + TQ + chroma DM + TQ + recon scatter.  Donates the recon
    planes so the buffers stay device-resident across waves.

    ``mesh``: optional 1-D device mesh — per-CU arrays are sharded over
    its ``dp`` axis (parallel/wavefront_dp.py), planes replicated;
    integer math keeps sharded and single-device bitstreams identical."""
    modes = tuple(range(67))
    cw, chh = w // 2, h // 2

    def f(ry, ru, rv, oy, ou, ov, xs, ys, at, al, ac, cat, cal, cac,
          s_ok):
        # ---- luma: refs -> 67-mode pred -> SATD argmin ----
        refs = _gather_refs(ry, xs, ys, at, al, ac, w, h, bd)
        preds = predict_block(*refs, w=w, h=h, modes=modes, is_luma=True,
                              bit_depth=bd)                  # (B, 67, h, w)
        o_rows = ys[:, None, None] + jnp.arange(h)[None, :, None]
        o_cols = xs[:, None, None] + jnp.arange(w)[None, None, :]
        orgs = oy[o_rows, o_cols]
        costs = satd_kernel(orgs[:, None], preds, bit_depth=bd)
        best = jnp.argmin(costs, axis=1)                     # (B,)
        pred = jnp.take_along_axis(
            preds, best[:, None, None, None], axis=1)[:, 0]
        lev_y, rec_y = _tq_zero(orgs, pred, w, h, qp_y, bd, lam, 1.0,
                                rd_quant)
        # invalid (padding) CUs: push the scatter row genuinely out of
        # bounds — negative indices would WRAP to the last row
        oob = 1 << 24
        sr = jnp.where(s_ok[:, None, None], o_rows, oob)
        ry = ry.at[sr, o_cols].set(rec_y, mode="drop")

        # ---- chroma: DM mode at half res ----
        cxs, cys = xs // 2, ys // 2
        co_rows = cys[:, None, None] + jnp.arange(chh)[None, :, None]
        co_cols = cxs[:, None, None] + jnp.arange(cw)[None, None, :]
        csr = jnp.where(s_ok[:, None, None], co_rows, 1 << 24)
        out_c = []
        for plane, org_p in ((ru, ou), (rv, ov)):
            crefs = _gather_refs(plane, cxs, cys, cat, cal, cac,
                                 cw, chh, bd)
            cpreds = predict_block(*crefs, w=cw, h=chh, modes=modes,
                                   is_luma=False, bit_depth=bd)
            cpred = jnp.take_along_axis(
                cpreds, best[:, None, None, None], axis=1)[:, 0]
            corgs = org_p[co_rows, co_cols]
            lev_c, rec_c = _tq_zero(corgs, cpred, cw, chh, qp_c, bd, lam,
                                    dw_c, rd_quant)
            plane = plane.at[csr, co_cols].set(rec_c, mode="drop")
            out_c.append((plane, lev_c))
        (ru, lev_u), (rv, lev_v) = out_c
        return ry, ru, rv, best, lev_y, lev_u, lev_v

    if mesh is not None:
        from ..parallel.wavefront_dp import cu_batch_shardings
        ins, outs = cu_batch_shardings(mesh)
        return jax.jit(f, donate_argnums=(0, 1, 2), in_shardings=ins,
                       out_shardings=outs)
    return jax.jit(f, donate_argnums=(0, 1, 2))


# ---------------------------------------------------------------------------
# host-side scheduling
# ---------------------------------------------------------------------------

def _order_grid(leaves, width, height):
    """(H/4, W/4) grid of each unit's leaf index in coding order."""
    g = np.full((height // 4, width // 4), -1, np.int32)
    for i, (x, y, w, h, _) in enumerate(leaves):
        g[y // 4:(y + h) // 4, x // 4:(x + w) // 4] = i
    return g


def _schedule_waves(leaves, order, width, height):
    """Wave level per leaf: 1 + max level over earlier-coding-order
    leaves intersecting the intra reference template (above row
    x-1..x+2w-1, left column y..y+2h-1)."""
    r4, c4 = order.shape
    wave = np.zeros(len(leaves), np.int32)
    for i, (x, y, w, h, _) in enumerate(leaves):
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
        wave[i] = lvl
    return wave


def _avail_masks(order, i, x, y, w, h, scale, width, height):
    """(avail_top (2w,), avail_left (2h,), avail_corner) for block
    (x, y, w, h) in plane coords at ``scale``, per coding order:
    a sample is available iff its covering leaf precedes leaf i."""
    fw, fh = width // scale, height // scale
    r4, c4 = order.shape

    def run(px0, py, n, horizontal):
        out = np.zeros(n, bool)
        if horizontal:
            if not (0 <= py < fh):
                return out
            xs = np.arange(px0, px0 + n)
            ok = (xs >= 0) & (xs < fw)
            cs = np.clip(xs * scale // 4, 0, c4 - 1)
            ids = order[py * scale // 4, cs[ok]]
            out[ok] = (ids >= 0) & (ids < i)
        else:
            if not (0 <= px0 < fw):
                return out
            ys = np.arange(py, py + n)
            ok = (ys >= 0) & (ys < fh)
            rs = np.clip(ys * scale // 4, 0, r4 - 1)
            ids = order[rs[ok], px0 * scale // 4]
            out[ok] = (ids >= 0) & (ids < i)
        return out

    at = run(x, y - 1, 2 * w, True)
    al = run(x - 1, y, 2 * h, False)
    ac = run(x - 1, y - 1, 1, True)[0]
    return at, al, ac


class WavefrontEncoder(FrameEncoder):
    """FrameEncoder with the CU compute lifted onto the device as
    batched wavefronts.  Conformance-equivalent streams (decodable by
    the stock VTM decoder); decisions may differ from the sequential
    path (pure-SATD RMD, order-independent rate proxies)."""

    _UNSUPPORTED = ("dual_tree", "mts_intra", "lfnst", "mip", "mrl",
                    "isp", "cclm", "joint_cbcr", "lmcs", "dep_quant",
                    "sign_hiding")

    def __init__(self, cfg, *, mesh=None, **kw):
        kw.setdefault("mode_select", "satd")
        super().__init__(cfg, **kw)
        self.mesh = mesh          # optional dp mesh for CU-batch sharding
        bad = [f for f in self._UNSUPPORTED if getattr(cfg, f)]
        if bad:
            raise NotImplementedError(
                f"wavefront path does not support: {bad}; "
                "use FrameEncoder")
        if self.rdo_fallback:
            raise NotImplementedError("wavefront path is map-driven only "
                                      "(no RDO fallback)")

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

    def _batched_pass(self, leaves, y_cod, u, v):
        cfg = self.cfg
        bd = cfg.bit_depth
        qp_y = cfg.qp + self.qp_bd_offset
        qpi = max(-self.qp_bd_offset, min(63, cfg.qp))
        qp_c = int(self.qp_table[qpi + self.qp_bd_offset]) \
            + cfg.chroma_qp_offset
        qp_c = max(-self.qp_bd_offset, min(63, qp_c)) + self.qp_bd_offset

        order = _order_grid(leaves, cfg.width, cfg.height)
        wave = _schedule_waves(leaves, order, cfg.width, cfg.height)
        n_waves = int(wave.max()) + 1 if len(leaves) else 0

        ry = jnp.zeros((cfg.height, cfg.width), jnp.int32)
        ru = jnp.zeros((cfg.height // 2, cfg.width // 2), jnp.int32)
        rv = jnp.zeros_like(ru)
        oy = jnp.asarray(y_cod, jnp.int32)
        ou = jnp.asarray(u, jnp.int32)
        ov = jnp.asarray(v, jnp.int32)

        pending = []      # (leaf index list, device outputs)
        for wv in range(n_waves):
            buckets = {}
            for i in np.nonzero(wave == wv)[0]:
                x, y, w, h, _ = leaves[i]
                buckets.setdefault((w, h), []).append(int(i))
            for (w, h), idxs in sorted(buckets.items()):
                n = len(idxs)
                bsz = 1 << (n - 1).bit_length() if n > 1 else 1
                if self.mesh is not None:
                    nd = self.mesh.size
                    bsz = max(bsz, nd)
                    bsz = ((bsz + nd - 1) // nd) * nd
                xs = np.zeros(bsz, np.int32)
                ys = np.zeros(bsz, np.int32)
                s_ok = np.zeros(bsz, bool)
                at = np.zeros((bsz, 2 * w), bool)
                al = np.zeros((bsz, 2 * h), bool)
                ac = np.zeros(bsz, bool)
                cat = np.zeros((bsz, w), bool)
                cal = np.zeros((bsz, h), bool)
                cac = np.zeros(bsz, bool)
                for k, i in enumerate(idxs):
                    x, y, _, _, _ = leaves[i]
                    xs[k], ys[k], s_ok[k] = x, y, True
                    at[k], al[k], ac[k] = _avail_masks(
                        order, i, x, y, w, h, 1, cfg.width, cfg.height)
                    cat[k], cal[k], cac[k] = _avail_masks(
                        order, i, x // 2, y // 2, w // 2, h // 2, 2,
                        cfg.width, cfg.height)
                step = _wave_step(w, h, bsz, qp_y, qp_c, bd,
                                  float(self.lam), float(self.dw_c),
                                  bool(cfg.rd_quant), mesh=self.mesh)
                ry, ru, rv, best, ly, lu, lv = step(
                    ry, ru, rv, oy, ou, ov,
                    jnp.asarray(xs), jnp.asarray(ys),
                    jnp.asarray(at), jnp.asarray(al), jnp.asarray(ac),
                    jnp.asarray(cat), jnp.asarray(cal), jnp.asarray(cac),
                    jnp.asarray(s_ok))
                pending.append((idxs, best, ly, lu, lv))

        fetched = jax.device_get([p[1:] for p in pending])
        pre = {}
        for (idxs, *_), (best, ly, lu, lv) in zip(pending, fetched):
            for k, i in enumerate(idxs):
                x, y, w, h, _ = leaves[i]
                pre[(x, y, w, h)] = (int(best[k]),
                                     np.asarray(ly[k], np.int32),
                                     np.asarray(lu[k], np.int32),
                                     np.asarray(lv[k], np.int32))
        final = jax.device_get((ry, ru, rv))
        return pre, tuple(np.asarray(p, np.int32) for p in final)

    # ---- phase C: CABAC replay ------------------------------------------

    def _encode_cu(self, enc, rc, org_y, org_u, org_v, cu: CuInfo):
        x, y, w, h = cu.x, cu.y, cu.w, cu.h
        mode, lev_y, lev_u, lev_v = self._pre[(x, y, w, h)]
        cu.mode = mode
        cbf_y = bool(lev_y.any())
        cbf_u = bool(lev_u.any())
        cbf_v = bool(lev_v.any())

        self._write_intra_luma_mode(enc, cu)
        self._write_intra_chroma_mode(enc, cclm=False)
        enc.encode_bin(1 if cbf_u else 0, ctx("QtCbf1", 0))
        enc.encode_bin(1 if cbf_v else 0,
                       ctx("QtCbf2", 1 if cbf_u else 0))
        enc.encode_bin(1 if cbf_y else 0, ctx("QtCbf0", 0))
        if cbf_y:
            rc.code(lev_y, is_luma=True)
        if cbf_u:
            rc.code(lev_u, is_luma=False)
        if cbf_v:
            rc.code(lev_v, is_luma=False)

        cx, cy, cw, chh = x // 2, y // 2, w // 2, h // 2
        fy, fu, fv = self._final
        self.recon_y[y:y + h, x:x + w] = fy[y:y + h, x:x + w]
        self.recon_u[cy:cy + chh, cx:cx + cw] = fu[cy:cy + chh, cx:cx + cw]
        self.recon_v[cy:cy + chh, cx:cx + cw] = fv[cy:cy + chh, cx:cx + cw]
        r, c = y // 4, x // 4
        self.coded[r:r + h // 4, c:c + w // 4] = True
        self.unit_mode[r:r + h // 4, c:c + w // 4] = cu.mode
        self.unit_w[r:r + h // 4, c:c + w // 4] = w
        self.unit_h[r:r + h // 4, c:c + w // 4] = h
        self.unit_qt[r:r + h // 4, c:c + w // 4] = cu.qt_depth
        self.leaf_l.append((x, y, w, h))
        self.leaf_c.append((cx, cy, cw, chh))

    # ---- driver ----------------------------------------------------------

    def encode_frame(self, y, u, v, qt_map=None, maps=None,
                     chroma_maps=None, poc: int = 0,
                     collect_bin_stats: bool = False, rdo: bool = False):
        if rdo:
            raise NotImplementedError("wavefront path is map-driven only")
        cfg = self.cfg
        if maps is not None:
            decide = self._map_decider(*maps)
        else:
            qm = qt_map if qt_map is not None else \
                np.ones((cfg.height // 8, cfg.width // 8), np.int32)
            decide = self._qt_map_decider(qm)
        leaves = self._collect_leaves(decide)
        y_orig = np.asarray(y, np.int32)
        self._pre, self._final = self._batched_pass(
            leaves, y_orig, np.asarray(u, np.int32),
            np.asarray(v, np.int32))
        return super().encode_frame(
            y, u, v, qt_map=qt_map, maps=maps, chroma_maps=chroma_maps,
            poc=poc, collect_bin_stats=collect_bin_stats)
