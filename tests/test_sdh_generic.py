"""Device sign-data-hiding (ops/sdh_generic.py) postcondition checks.

The decoder (codec/residual.py:392) infers sign(first significant
level) of every CG whose first/last significant scan positions are
>= 4 apart from the parity of the CG's absolute-level sum — so after
the encoder-side adjustment EVERY such CG must satisfy
parity == (first level < 0).  Quant.cpp:261 xSignBitHidingHDQ.
"""
import numpy as np

import jax.numpy as jnp

from pmp_vvc_tpu.codec.residual import grouped_scan, log2_sbb_size
from pmp_vvc_tpu.ops.sdh_generic import apply_sdh_generic
from pmp_vvc_tpu.ops.tq_generic import quantize_generic


def _check_parity(lev, w, h):
    """Returns (#hide CGs, #parity violations) for one TB."""
    lw, lh = w.bit_length() - 1, h.bit_length() - 1
    cgl2w, cgl2h = log2_sbb_size(lw, lh)
    cg = 1 << (cgl2w + cgl2h)
    scan = grouped_scan(w, h)
    flat = lev[:h, :w].reshape(-1)
    n_hide = n_bad = 0
    for s0 in range(0, scan.shape[0], cg):
        levels = flat[scan[s0:s0 + cg, 0]]
        nz = np.nonzero(levels)[0]
        if nz.size == 0 or int(nz[-1]) - int(nz[0]) < 4:
            continue
        n_hide += 1
        parity = int(np.abs(levels).sum()) & 1
        want = 1 if levels[int(nz[0])] < 0 else 0
        if parity != want:
            n_bad += 1
    return n_hide, n_bad


def test_sdh_generic_parity_postcondition():
    rng = np.random.RandomState(11)
    sizes = [(4, 4), (8, 8), (16, 16), (32, 32), (64, 64), (16, 4),
             (4, 32), (8, 2), (2, 8), (2, 2), (32, 8), (64, 16)]
    P = 64
    B = len(sizes)
    coef = np.zeros((B, P, P), np.int32)
    ws = np.zeros(B, np.int32)
    hs = np.zeros(B, np.int32)
    for i, (w, h) in enumerate(sizes):
        coef[i, :h, :w] = rng.randint(-4000, 4000, (h, w))
        ws[i], hs[i] = w, h
    qp = 27
    lev = np.asarray(quantize_generic(jnp.asarray(coef), jnp.asarray(ws),
                                      jnp.asarray(hs), qp))
    adj = np.asarray(apply_sdh_generic(jnp.asarray(lev),
                                       jnp.asarray(coef), jnp.asarray(ws),
                                       jnp.asarray(hs), qp))
    tot_hide = tot_bad_before = tot_changed = 0
    for i, (w, h) in enumerate(sizes):
        nh, nb = _check_parity(adj[i], w, h)
        assert nb == 0, (w, h, nb)
        tot_hide += nh
        _, bb = _check_parity(lev[i], w, h)
        tot_bad_before += bb
        if not np.array_equal(adj[i], lev[i]):
            tot_changed += 1
        # adjustment must stay within the TB and only move by +-1
        assert not adj[i, h:, :].any() and not adj[i, :, w:].any()
        assert np.abs(adj[i] - lev[i]).max() <= 1
    # the input must actually have exercised the rule
    assert tot_hide > 10 and tot_bad_before > 0 and tot_changed > 0
