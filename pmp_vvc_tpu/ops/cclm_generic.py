"""Size-generic CCLM (LM_CHROMA) — block geometry as *data*.

Device companion to ops/cclm.py (host, oracle-exact) for the wavefront
path.  Everything is branchless over the CU batch:

- 6-tap {1 2 1 / 1 2 1} luma downsampling of the co-located recon (the
  CTU-top 3-tap special case and the no-left padding rule are data
  selects, xGetLumaRecPixels IntraPrediction.cpp:1384-1464);
- the 4-point min/max template fit runs the EXACT VTM compare-swap
  network on (luma, chroma) lanes so tie-breaks match bit-for-bit
  (xGetLMParameters :1640-1866), with the 4-bit-significand division
  LUT gathered per CU;
- bit_length() becomes a comparison ladder (values are <= 16 bits).

Bit-exact vs ops.cclm for every geometry/availability combination
(tests/test_cclm_generic.py).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .cclm import _DIV_SIG


def _bitlen(v, nbits=17):
    """bit_length() for non-negative data values < 2**nbits."""
    v = v.astype(jnp.int32)
    out = jnp.zeros_like(v)
    for k in range(nbits):
        out = out + (v >= (1 << k)).astype(jnp.int32)
    return out


def _g(plane, fi, rows, cols):
    return plane[fi, jnp.clip(rows, 0, plane.shape[1] - 1),
                 jnp.clip(cols, 0, plane.shape[2] - 1)].astype(jnp.int32)


def cclm_predict_generic(ry, fi, cxs, cys, cws, chs, *, pad_c: int,
                         top_u, left_u, top_v, left_v,
                         bit_depth: int = 10, ctu_size: int = 128,
                         left_avail=None, above_avail=None):
    """LM_CHROMA predictions for B chroma blocks.

    ry: (F, H, W) luma recon; cxs/cys/cws/chs: (B,) chroma coords/sizes;
    top_u/left_u/top_v/left_v: (B, 2*pad_c+3) substituted chroma
    reference rows (index 0 = corner).  Returns (pred_u, pred_v),
    each (B, pad_c, pad_c) int32 (valid region [:ch, :cw]).
    ``left_avail``/``above_avail``: (B,) neighbour availability — pass
    order-grid-derived values under spatial sharding, where local
    stripe coordinates are halo-offset and ``cxs > 0`` no longer means
    the frame edge."""
    Pc = pad_c
    B = cxs.shape[0]
    lx, ly = 2 * cxs, 2 * cys
    la = (cxs > 0) if left_avail is None else left_avail
    aa = (cys > 0) if above_avail is None else above_avail
    i = np.arange(Pc)

    idx = lx[:, None] + 2 * i[None, :]                      # (B, Pc)
    lidx = idx - 1
    lidx = jnp.where((~la[:, None]) & (i[None, :] == 0), idx, lidx)

    def six(row0, cols_c, cols_r, cols_l):
        a_c = _g(ry, fi[:, None], row0, cols_c)
        a_r = _g(ry, fi[:, None], row0, cols_r)
        a_l = _g(ry, fi[:, None], row0, cols_l)
        b_c = _g(ry, fi[:, None], row0 + 1, cols_c)
        b_r = _g(ry, fi[:, None], row0 + 1, cols_r)
        b_l = _g(ry, fi[:, None], row0 + 1, cols_l)
        return (4 + 2 * a_c + a_r + a_l + 2 * b_c + b_r + b_l) >> 3

    # interior (B, Pc, Pc) — one 3-D gather per tap
    j = np.arange(Pc)
    r3 = (ly[:, None] + 2 * j[None, :])[:, :, None]         # (B, Pc, 1)
    c3 = idx[:, None, :]
    l3 = lidx[:, None, :]

    def g3(rr, cc):
        return _g(ry, fi[:, None, None], rr, cc)

    interior = (4 + 2 * g3(r3, c3) + g3(r3, c3 + 1) + g3(r3, l3)
                + 2 * g3(r3 + 1, c3) + g3(r3 + 1, c3 + 1)
                + g3(r3 + 1, l3)) >> 3

    # ds_above (B, Pc)
    ab6 = six(jnp.maximum(ly - 2, 0)[:, None], idx, idx + 1, lidx)
    r1 = jnp.maximum(ly - 1, 0)[:, None]
    ab3 = (2 + 2 * _g(ry, fi[:, None], r1, idx)
           + _g(ry, fi[:, None], r1, idx + 1)
           + _g(ry, fi[:, None], r1, lidx)) >> 2
    ds_above = jnp.where((ly % ctu_size == 0)[:, None], ab3, ab6)

    # ds_left (B, Pc): 6 taps at luma columns lx-1, lx-2, lx-3
    j2 = ly[:, None] + 2 * i[None, :]
    c2 = jnp.maximum(lx - 2, 0)[:, None]
    c1 = jnp.maximum(lx - 1, 0)[:, None]
    c3 = jnp.maximum(lx - 3, 0)[:, None]
    ds_left = (4 + 2 * _g(ry, fi[:, None], j2, c2)
               + _g(ry, fi[:, None], j2, c1)
               + _g(ry, fi[:, None], j2, c3)
               + 2 * _g(ry, fi[:, None], j2 + 1, c2)
               + _g(ry, fi[:, None], j2 + 1, c1)
               + _g(ry, fi[:, None], j2 + 1, c3)) >> 3

    def params(top_ref, left_ref):
        """(a, b, shift) per CU — xGetLMParameters LM path."""
        above_is4 = jnp.where(la, 0, 1)
        left_is4 = jnp.where(aa, 0, 1)
        cnt_t = jnp.where(aa, jnp.minimum(cws, (1 + above_is4) << 1), 0)
        start_t = cws >> (2 + above_is4)
        step_t = jnp.maximum(1, cws >> (1 + above_is4))
        cnt_l = jnp.where(la, jnp.minimum(chs, (1 + left_is4) << 1), 0)
        start_l = chs >> (2 + left_is4)
        step_l = jnp.maximum(1, chs >> (1 + left_is4))

        k4 = np.arange(4)
        use_t = k4[None, :] < cnt_t[:, None]
        pos_t = jnp.clip(start_t[:, None] + k4 * step_t[:, None],
                         0, Pc - 1)
        pos_l = jnp.clip(start_l[:, None]
                         + (k4[None, :] - cnt_t[:, None])
                         * step_l[:, None], 0, Pc - 1)
        sel_l = jnp.where(use_t,
                          jnp.take_along_axis(ds_above, pos_t, axis=1),
                          jnp.take_along_axis(ds_left, pos_l, axis=1))
        tc = jnp.take_along_axis(top_ref.astype(jnp.int32),
                                 1 + pos_t, axis=1)
        lc = jnp.take_along_axis(left_ref.astype(jnp.int32),
                                 1 + pos_l, axis=1)
        sel_c = jnp.where(use_t, tc, lc)
        # two-sample case -> [b0, a0, b0, a0]
        two = (cnt_t + cnt_l) == 2
        dup_l = jnp.stack([sel_l[:, 1], sel_l[:, 0],
                           sel_l[:, 1], sel_l[:, 0]], axis=1)
        dup_c = jnp.stack([sel_c[:, 1], sel_c[:, 0],
                           sel_c[:, 1], sel_c[:, 0]], axis=1)
        sel_l = jnp.where(two[:, None], dup_l, sel_l)
        sel_c = jnp.where(two[:, None], dup_c, sel_c)

        # VTM compare-swap network on (luma, chroma) lanes
        def cswap(al, ac, bl, bc):
            sw = al > bl
            return (jnp.where(sw, bl, al), jnp.where(sw, bc, ac),
                    jnp.where(sw, al, bl), jnp.where(sw, ac, bc))

        n0l, n0c, n1l, n1c = cswap(sel_l[:, 0], sel_c[:, 0],
                                   sel_l[:, 2], sel_c[:, 2])
        x0l, x0c, x1l, x1c = cswap(sel_l[:, 1], sel_c[:, 1],
                                   sel_l[:, 3], sel_c[:, 3])
        sw = n0l > x1l
        n0l, n1l, x0l, x1l, n0c, n1c, x0c, x1c = (
            jnp.where(sw, x0l, n0l), jnp.where(sw, x1l, n1l),
            jnp.where(sw, n0l, x0l), jnp.where(sw, n1l, x1l),
            jnp.where(sw, x0c, n0c), jnp.where(sw, x1c, n1c),
            jnp.where(sw, n0c, x0c), jnp.where(sw, n1c, x1c))
        sw2 = n1l > x0l
        n1l, x0l = jnp.where(sw2, x0l, n1l), jnp.where(sw2, n1l, x0l)
        n1c, x0c = jnp.where(sw2, x0c, n1c), jnp.where(sw2, n1c, x0c)

        min_l = (n0l + n1l + 1) >> 1
        min_c = (n0c + n1c + 1) >> 1
        max_l = (x0l + x1l + 1) >> 1
        max_c = (x0c + x1c + 1) >> 1

        diff = max_l - min_l
        diff_c = max_c - min_c
        x = _bitlen(jnp.maximum(diff, 1)) - 1
        norm = ((diff << 4) >> x) & 15
        v = jnp.take(jnp.asarray(_DIV_SIG, jnp.int32), norm) | 8
        x = x + (norm != 0).astype(jnp.int32)
        y = _bitlen(jnp.abs(diff_c))
        add = (1 << y) >> 1
        a = jnp.where(y > 0, (diff_c * v + add) >> y, diff_c * v)
        shift = 3 + x - y
        a = jnp.where(shift < 1,
                      jnp.where(a == 0, 0, jnp.where(a < 0, -15, 15)),
                      a)
        shift = jnp.maximum(shift, 1)
        b = min_c - ((a * min_l) >> shift)
        # degenerate cases
        flat = diff <= 0
        a = jnp.where(flat, 0, a)
        b = jnp.where(flat, min_c, b)
        shift = jnp.where(flat, 0, shift)
        none = (~la) & (~aa)
        a = jnp.where(none, 0, a)
        b = jnp.where(none, 1 << (bit_depth - 1), b)
        shift = jnp.where(none, 0, shift)
        return a, b, shift

    mx = (1 << bit_depth) - 1

    def pred(top_ref, left_ref):
        a, b, sh = params(top_ref, left_ref)
        p = ((a[:, None, None] * interior) >> sh[:, None, None]) \
            + b[:, None, None]
        return jnp.clip(p, 0, mx)

    return pred(top_u, left_u), pred(top_v, left_v)
