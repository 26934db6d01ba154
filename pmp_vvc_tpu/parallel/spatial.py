"""Spatially-sharded wavefront encode — CTU-column stripes + ppermute
recon-halo exchange (SURVEY §5 "long-context" row; the multi-chip
formulation that stops replicating frame planes on every device).

Each device owns one vertical stripe of the frame (a multiple of the
128 CTU width) plus two halo buffers:

  [ left halo 8 | stripe | right halo 128 ]

- the LEFT halo holds the left neighbour's rightmost recon columns
  (left reference column + corner + CCLM taps reach <= 8 luma);
- the RIGHT halo holds the right neighbour's leftmost columns (the
  above-right reference reach of a 64-wide CU is 2*64 = 128 luma).

The wave schedule is computed globally (levels are device-independent);
each scan step runs one batch per device via ``shard_map`` and then
exchanges both halos with ``jax.lax.ppermute`` — recon crosses the
stripe boundary exactly once per wave level, riding ICI, instead of
every device holding every plane.  Integer math keeps the result
bit-identical to the single-device encode (tested on the virtual CPU
mesh).

Envelope: single tree, QT-/map-driven partitioning, with the device
TU toolset — MTS (size-masked inside the shared kernel), MIP, CCLM
(its luma taps stay inside the CU + the 1-column/row halo) and LFNST.
The dual-tree chroma schedule is not spatially sharded yet.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
try:
    from jax import shard_map
except ImportError:                      # pragma: no cover
    from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

HL = 8          # left halo (luma columns)
HR = 128        # right halo (above-right reach of a 64-wide CU)


def spatial_wave_planes(enc, leaves, y, u, v, mesh, axis="sp"):
    """Run the wave compute spatially sharded; returns the same packed
    result planes as WavefrontEncoder._batched_pass for one frame.

    ``enc``: a WavefrontEncoder with a tools-off config; ``leaves``:
    its collected luma leaves; mesh: 1-D mesh over ``axis``.
    """
    from ..codec.wavefront import (DEFAULT_BATCH, _make_class_apply,
                                   _order_grid, _schedule_waves)
    cfg = enc.cfg
    D = mesh.devices.size
    H, W = cfg.height, cfg.width
    assert W % (128 * D) == 0, "stripes must be CTU-column multiples"
    stripe = W // D
    We = HL + stripe + HR
    bd = cfg.bit_depth
    qp_y, qp_c = enc._qps()
    bsz = DEFAULT_BATCH[64]

    order = _order_grid(leaves, W, H)
    wave = _schedule_waves(leaves, order, W, H)

    # per-device, per-level segments of local-coordinate rows
    per_dev = [[] for _ in range(D)]
    n_lvl = int(wave.max()) + 1 if len(leaves) else 1
    by_lvl_dev = [[[] for _ in range(D)] for _ in range(n_lvl)]
    st_cclm = 1 if cfg.cclm else 0
    for i, (x, yy, w, h, _q) in enumerate(leaves):
        d = x // stripe
        by_lvl_dev[int(wave[i])][d].append(
            (0, x - d * stripe + HL, yy, w, h, i, 1, st_cclm))
    steps = []          # list of (D, bsz, 8) rows
    for lvl in range(n_lvl):
        n_seg = max((len(v) + bsz - 1) // bsz for v in by_lvl_dev[lvl])
        n_seg = max(n_seg, 1)
        for s in range(n_seg):
            rows = np.zeros((D, bsz, 8), np.int32)
            for d in range(D):
                for k, e in enumerate(
                        by_lvl_dev[lvl][d][s * bsz:(s + 1) * bsz]):
                    rows[d, k] = e
            steps.append(rows)
    sched = np.stack(steps)                      # (S, D, bsz, 8)

    def _ext(plane, hl, hr, strd):
        """(D, H', hl+strd+hr) stripes with halos cut from the global
        plane (zeros outside)."""
        ph = np.asarray(plane, np.int32)
        hh = ph.shape[0]
        out = np.zeros((D, hh, hl + strd + hr), np.int32)
        for d in range(D):
            x0 = d * strd - hl
            x1 = d * strd + strd + hr
            s0, s1 = max(x0, 0), min(x1, ph.shape[1])
            out[d, :, s0 - x0:s0 - x0 + (s1 - s0)] = ph[:, s0:s1]
        return out

    oy_l = _ext(y, HL, HR, stripe)
    ou_l = _ext(u, HL // 2, HR // 2, stripe // 2)
    ov_l = _ext(v, HL // 2, HR // 2, stripe // 2)
    og_l = np.full((D, H // 4, We // 4), -1, np.int32)
    for d in range(D):
        x0 = d * stripe - HL
        x1 = d * stripe + stripe + HR
        s0, s1 = max(x0, 0), min(x1, W)
        og_l[d, :, (s0 - x0) // 4:(s0 - x0) // 4 + (s1 - s0) // 4] = \
            order[:, s0 // 4:s1 // 4]

    assert not cfg.lmcs, \
        "spatial stripes: LMCS vpdu_dep scheduling not wired"
    apply = _make_class_apply(64, bsz, qp_y, qp_c, bd, float(enc.lam),
                              float(enc.dw_c), bool(cfg.rd_quant),
                              kind="st", mts=bool(cfg.mts_intra),
                              mip=bool(cfg.mip), cclm=bool(cfg.cclm),
                              lfnst=bool(cfg.lfnst),
                              sdh=bool(cfg.sign_hiding),
                              jccr=bool(cfg.joint_cbcr),
                              qp_j=qp_c - cfg.chroma_qp_offset
                              + cfg.jccr_qp_offset,
                              ts_max=(1 << cfg.ts_max_log2)
                              if cfg.transform_skip else 0)
    perm_r = [(d, d + 1) for d in range(D - 1)]   # send right
    perm_l = [(d + 1, d) for d in range(D - 1)]   # send left

    def device_fn(sched_d, oy_d, ou_d, ov_d, og_d):
        # local extended state planes (one pseudo-frame)
        ry = jnp.zeros((1, H, We), jnp.int32)
        ru = jnp.zeros((1, H // 2, We // 2), jnp.int32)
        rv = jnp.zeros_like(ru)
        cY = jnp.zeros((1, H, We), jnp.int16)
        cU = jnp.zeros((1, H // 2, We // 2), jnp.int16)
        cV = jnp.zeros_like(cU)
        mg = jnp.zeros((1, H // 4, We // 4), jnp.uint8)
        tg = jnp.zeros_like(mg)
        pg = jnp.zeros_like(mg)
        cg = jnp.zeros_like(mg)
        lg = jnp.zeros_like(mg)
        # the carry becomes device-varying through the halo exchange;
        # mark the (replicated-zero) initial planes varying up front so
        # scan's carry typing is stable
        def _vary(a):
            try:
                return jax.lax.pcast(a, (axis,), to="varying")
            except (AttributeError, TypeError):   # older jax
                return jax.lax.pvary(a, (axis,))
        ry, ru, rv, cY, cU, cV, mg, tg, pg, cg, lg = jax.tree.map(
            _vary, (ry, ru, rv, cY, cU, cV, mg, tg, pg, cg, lg))
        me = jax.lax.axis_index(axis)

        def exchange(plane, hl, hr, strd):
            # left halo <- left neighbour's rightmost hl stripe columns
            send_r = jax.lax.dynamic_slice_in_dim(
                plane, hl + strd - hl, hl, axis=2)
            recv_l = jax.lax.ppermute(send_r, axis, perm_r)
            keep = plane[:, :, :hl]
            plane = plane.at[:, :, :hl].set(
                jnp.where(me > 0, recv_l, keep))
            # right halo <- right neighbour's leftmost hr columns
            send_l = jax.lax.dynamic_slice_in_dim(plane, hl, hr, axis=2)
            recv_r = jax.lax.ppermute(send_l, axis, perm_l)
            keep_r = plane[:, :, hl + strd:]
            plane = plane.at[:, :, hl + strd:].set(
                jnp.where(me < D - 1, recv_r, keep_r))
            return plane

        def step(state, row):
            state = apply(state, row[0], oy_d, ou_d, ov_d, og_d, og_d)
            ry, ru, rv, cY, cU, cV, mg, tg, pg, cg, lg = state
            ry = exchange(ry, HL, HR, stripe)
            ru = exchange(ru, HL // 2, HR // 2, stripe // 2)
            rv = exchange(rv, HL // 2, HR // 2, stripe // 2)
            return (ry, ru, rv, cY, cU, cV, mg, tg, pg, cg, lg), None

        state, _ = jax.lax.scan(
            step, (ry, ru, rv, cY, cU, cV, mg, tg, pg, cg, lg), sched_d)
        ry, ru, rv, cY, cU, cV, mg, tg, pg, cg, lg = state
        # return the owned stripe region only
        return (ry[0, :, HL:HL + stripe].astype(jnp.uint16),
                ru[0, :, HL // 2:(HL + stripe) // 2],
                rv[0, :, HL // 2:(HL + stripe) // 2],
                cY[0, :, HL:HL + stripe],
                cU[0, :, HL // 2:(HL + stripe) // 2],
                cV[0, :, HL // 2:(HL + stripe) // 2],
                mg[0, :, HL // 4:(HL + stripe) // 4],
                tg[0, :, HL // 4:(HL + stripe) // 4],
                pg[0, :, HL // 4:(HL + stripe) // 4],
                cg[0, :, HL // 4:(HL + stripe) // 4],
                lg[0, :, HL // 4:(HL + stripe) // 4])

    sp = P(axis)
    f = shard_map(device_fn, mesh=mesh,
                  in_specs=(P(None, axis), sp, sp, sp, sp),
                  out_specs=tuple([P(None, axis)] * 11))
    outs = f(jnp.asarray(sched), jnp.asarray(oy_l), jnp.asarray(ou_l),
             jnp.asarray(ov_l), jnp.asarray(og_l))
    got = jax.device_get(outs)
    # reassemble (1, H, W) result planes (shard_map already concatenated
    # stripes along the last axis)
    ruu = got[1].astype(np.uint16)
    rvv = got[2].astype(np.uint16)
    return (got[0][None], ruu[None], rvv[None], got[3][None],
            got[4][None], got[5][None], got[6][None], got[7][None],
            got[8][None], got[9][None], got[10][None])
