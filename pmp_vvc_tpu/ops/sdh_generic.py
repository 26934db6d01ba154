"""Sign-data-hiding level adjustment — batched, size-generic, device.

Encoder counterpart of ``Quant::xSignBitHidingHDQ`` (Quant.cpp:261)
for the wavefront path: per coefficient group whose first/last
significant scan positions are >= SBH_THRESHOLD (4) apart, the decoder
infers the sign of the first significant level from the parity of the
CG's absolute-level sum (codec/residual.py:392 reads it back), so the
encoder must nudge one level by +-1 whenever that parity disagrees.

The candidate set here is the always-legal subset

  {+1 in magnitude on any nonzero level, -1 on any |level| >= 2 one}

— neither move can change the CG's significant-position envelope (no
level is created or destroyed), so the hide condition and the hidden
position are invariant and no legality re-check is needed.  The winner
is the minimum added dequantisation error, computed with the exact
integer dequant (Quant::dequant math).  This is a conformant,
slightly sub-optimal stand-in for the reference's full candidate sweep
(which also tries creating/destroying levels) that keeps the kernel
free of data-dependent control flow: everything is a fixed 32-way
argmin per CG, vectorised over (batch, CG).

Scan geometry (grouped 4x4-or-smaller CGs, diagonal order) is looked
up from a per-(log2w, log2h) table built on the host from the same
``grouped_scan`` the entropy coder uses, so the within-CG slot index
IS the scan position the parity rule is defined over.
"""
from __future__ import annotations

import functools

import numpy as np

import jax.numpy as jnp

from .quant import INV_QUANT_SCALES, IQUANT_SHIFT
from .tq_generic import _geom_v, _log2

_SLOT = 16          # max CG size (g_log2SbbSize caps at 2+2)
_OOB = 1 << 24


@functools.cache
def _cg_tables(P: int):
    """(49, NCG, 16) int32: flat P-plane index of scan slot ``k`` of CG
    ``g`` for a (2**lw, 2**lh) TB, -1 where absent.  NCG covers the
    zero-out-limited scanned region (grouped_scan stops at 32)."""
    from ..codec.residual import grouped_scan, log2_sbb_size
    ncg = (min(32, P) * min(32, P) + _SLOT - 1) // _SLOT
    tab = np.full((49, ncg, _SLOT), -1, np.int64)
    for lw in range(1, P.bit_length()):
        for lh in range(1, P.bit_length()):
            w, h = 1 << lw, 1 << lh
            if w > P or h > P:
                continue
            cgl2w, cgl2h = log2_sbb_size(lw, lh)
            cg_size = 1 << (cgl2w + cgl2h)
            scan = grouped_scan(w, h)
            for s in range(scan.shape[0]):
                x, y = int(scan[s, 1]), int(scan[s, 2])
                tab[lw * 7 + lh, s // cg_size, s % cg_size] = y * P + x
    return tab


def apply_sdh_generic(lev, coef, ws, hs, qp: int, *, bit_depth: int = 10):
    """Adjust (B, P, P) levels so every sign-hiding CG's parity encodes
    the sign of its first significant level.  ``coef`` are the
    pre-quant transform coefficients in the same domain as ``lev``
    (primary or LFNST-secondary); ``qp`` is the static plane QP."""
    B, P, _ = lev.shape
    tab = jnp.asarray(_cg_tables(P))
    ti = _log2(ws) * 7 + _log2(hs)
    idx = jnp.take(tab, ti, axis=0)                      # (B, NCG, 16)
    valid = idx >= 0
    flat_l = lev.reshape(B, P * P)
    flat_c = coef.reshape(B, P * P).astype(jnp.int32)
    safe = jnp.clip(idx, 0, P * P - 1).reshape(B, -1)
    levg = jnp.where(valid, jnp.take_along_axis(
        flat_l, safe, axis=1).reshape(idx.shape), 0)
    coefg = jnp.where(valid, jnp.take_along_axis(
        flat_c, safe, axis=1).reshape(idx.shape), 0)

    t_shift, sqrt2 = _geom_v(ws, hs, bit_depth)
    scale = jnp.take(INV_QUANT_SCALES[:, qp % 6], sqrt2)[:, None, None]
    rs = (IQUANT_SHIFT - ((t_shift - sqrt2) + qp // 6))[:, None, None]

    def deq(l):
        pos = (l * scale + (1 << jnp.maximum(rs - 1, 0)) * (rs > 0)) \
            >> jnp.maximum(rs, 0)
        neg = (l * scale) << jnp.maximum(-rs, 0)
        return jnp.where(rs > 0, pos, neg)

    slots = np.arange(_SLOT)
    nz = levg != 0
    first = jnp.min(jnp.where(nz, slots, 99), axis=-1)   # (B, NCG)
    last = jnp.max(jnp.where(nz, slots, -1), axis=-1)
    hide = (last - first) >= 4                           # SBH_THRESHOLD
    parity = (jnp.abs(levg).sum(-1) & 1).astype(jnp.int32)
    firstlev = jnp.take_along_axis(
        levg, jnp.clip(first, 0, _SLOT - 1)[..., None], -1)[..., 0]
    want = (firstlev < 0).astype(jnp.int32)
    mismatch = hide & (parity != want)

    sgn = jnp.sign(levg)
    nl_up = levg + sgn
    nl_dn = levg - sgn
    # added-error selection in float32 (x64 off): only the CHOICE of
    # candidate depends on it — any candidate is conformant
    cf = coefg.astype(jnp.float32)
    base = (deq(levg).astype(jnp.float32) - cf) ** 2
    e_up = (deq(nl_up).astype(jnp.float32) - cf) ** 2 - base
    e_dn = (deq(nl_dn).astype(jnp.float32) - cf) ** 2 - base
    big = jnp.float32(np.inf)
    e_up = jnp.where(nz & valid, e_up, big)
    e_dn = jnp.where((jnp.abs(levg) >= 2) & valid, e_dn, big)
    k = jnp.argmin(jnp.concatenate([e_up, e_dn], -1), -1)   # (B, NCG)
    nl_all = jnp.concatenate([nl_up, nl_dn], -1)
    chosen = jnp.take_along_axis(nl_all, k[..., None], -1)[..., 0]
    tgt = jnp.take_along_axis(
        idx, jnp.clip(k % _SLOT, 0, _SLOT - 1)[..., None], -1)[..., 0]
    bi = jnp.arange(B)[:, None]
    flat_l = flat_l.at[bi, jnp.where(mismatch, tgt, _OOB)].set(
        jnp.where(mismatch, chosen, 0), mode="drop")
    return flat_l.reshape(B, P, P)
