"""Size-generic LFNST vs the scalar oracle-exact ops (ops/lfnst.py)."""
import numpy as np

import jax.numpy as jnp

from pmp_vvc_tpu.ops import lfnst as s
from pmp_vvc_tpu.ops.lfnst_generic import (fwd_lfnst_generic,
                                           inv_lfnst_generic)


def _cases():
    rng = np.random.RandomState(3)
    sizes = [(4, 4), (8, 8), (4, 8), (8, 4), (16, 16), (16, 8), (4, 16),
             (32, 32), (32, 8), (64, 64), (16, 64)]
    modes = [0, 1, 2, 18, 34, 40, 50, 66]
    out = []
    for (w, h) in sizes:
        for m in modes:
            c = rng.randint(-512, 512, (h, w)).astype(np.int64)
            out.append((w, h, m, c))
    return out


def test_fwd_inv_parity():
    cases = _cases()
    P = 64
    for lfnst_idx in (1, 2):
        B = len(cases)
        coef = np.zeros((B, P, P), np.int32)
        ws = np.zeros(B, np.int32)
        hs = np.zeros(B, np.int32)
        ms = np.zeros(B, np.int32)
        for i, (w, h, m, c) in enumerate(cases):
            coef[i, :h, :w] = c
            ws[i], hs[i], ms[i] = w, h, m
        fwd = np.asarray(fwd_lfnst_generic(
            jnp.asarray(coef), jnp.asarray(ms), jnp.asarray(ws),
            jnp.asarray(hs), lfnst_idx))
        inv = np.asarray(inv_lfnst_generic(
            jnp.asarray(fwd), jnp.asarray(ms), jnp.asarray(ws),
            jnp.asarray(hs), lfnst_idx))
        for i, (w, h, m, c) in enumerate(cases):
            ref_f = s.fwd_lfnst(c, m, lfnst_idx, w, h)
            assert (fwd[i, :h, :w] == ref_f).all(), (w, h, m, lfnst_idx)
            ref_i = s.inv_lfnst(ref_f, m, lfnst_idx, w, h)
            assert (inv[i, :h, :w] == ref_i).all(), (w, h, m, lfnst_idx)
            assert not fwd[i, h:, :].any() and not fwd[i, :, w:].any()
