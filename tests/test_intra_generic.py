"""Size-generic intra predictor == per-size predictor, every (size, mode).

ops/intra.predict_block is oracle-verified against VTM (test_intra.py);
this locks the data-driven generic kernel to it bit-for-bit, including
wide-angle remap, MDIS filtering, PDPC variants and the substitution
fill's replication tail under padding.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from pmp_vvc_tpu.ops.intra import (fill_reference_samples,
                                   filter_reference_samples, predict_block)
from pmp_vvc_tpu.ops.intra_generic import (
    filter_reference_samples_generic, predict_generic)


def _mk_refs(rng, w, h, pad, bit_depth=10):
    """Random raw refs + availability; returns (exact refs, padded refs)."""
    mx = (1 << bit_depth) - 1
    top_raw = rng.randint(0, mx + 1, (1, 2 * w)).astype(np.int32)
    left_raw = rng.randint(0, mx + 1, (1, 2 * h)).astype(np.int32)
    corner = rng.randint(0, mx + 1, (1,)).astype(np.int32)
    at = rng.rand(1, 2 * w) < 0.8
    al = rng.rand(1, 2 * h) < 0.8
    ac = rng.rand(1) < 0.8

    tu, lu = fill_reference_samples(
        jnp.asarray(top_raw), jnp.asarray(left_raw), jnp.asarray(at),
        jnp.asarray(al), jnp.asarray(ac), jnp.asarray(corner),
        bit_depth=bit_depth)
    tf, lf = filter_reference_samples(tu, lu)

    tp = np.zeros((1, 2 * pad), np.int32)
    lp = np.zeros((1, 2 * pad), np.int32)
    tp[:, :2 * w] = top_raw
    lp[:, :2 * h] = left_raw
    atp = np.zeros((1, 2 * pad), bool)
    alp = np.zeros((1, 2 * pad), bool)
    atp[:, :2 * w] = at
    alp[:, :2 * h] = al
    gu_t, gu_l = fill_reference_samples(
        jnp.asarray(tp), jnp.asarray(lp), jnp.asarray(atp),
        jnp.asarray(alp), jnp.asarray(ac), jnp.asarray(corner),
        bit_depth=bit_depth)
    gf_t, gf_l = filter_reference_samples_generic(
        gu_t, gu_l, jnp.asarray([w]), jnp.asarray([h]))
    return (tu, lu, tf, lf), (gu_t, gu_l, gf_t, gf_l)


@pytest.mark.parametrize("is_luma", [True, False])
def test_generic_matches_per_size(is_luma):
    rng = np.random.RandomState(11)
    pad = 64 if is_luma else 32
    sizes = (4, 8, 16, 32, 64) if is_luma else (2, 4, 8, 16, 32)
    modes = tuple(range(67))
    for w in sizes:
        for h in sizes:
            (tu, lu, tf, lf), (gt, gl, gft, gfl) = _mk_refs(rng, w, h, pad)
            exact = np.asarray(predict_block(
                tu, lu, tf, lf, w=w, h=h, modes=modes, is_luma=is_luma))
            gen = np.asarray(predict_generic(
                gt, gl, gft, gfl,
                jnp.asarray(np.arange(67)[None, :].astype(np.int32)),
                jnp.asarray([w]), jnp.asarray([h]),
                pad=pad, is_luma=is_luma))
            bad = [m for m in range(67)
                   if not np.array_equal(gen[0, m, :h, :w], exact[0, m])]
            assert not bad, (w, h, bad[:8])


def test_generic_filter_matches_static():
    rng = np.random.RandomState(3)
    for w, h in ((4, 16), (32, 8), (64, 64)):
        (tu, lu, tf, lf), (gt, gl, gft, gfl) = _mk_refs(rng, w, h, 64)
        assert np.array_equal(np.asarray(gft)[0, :2 * w + 1],
                              np.asarray(tf)[0, :2 * w + 1])
        assert np.array_equal(np.asarray(gfl)[0, :2 * h + 1],
                              np.asarray(lf)[0, :2 * h + 1])


def test_generic_mixed_batch():
    """One batch with mixed sizes/modes equals per-CU evaluation."""
    rng = np.random.RandomState(5)
    pad = 64
    cus = [(4, 32), (64, 4), (16, 16), (8, 64), (32, 32)]
    picks = rng.randint(0, 67, (len(cus), 7)).astype(np.int32)
    g_t, g_l, g_ft, g_fl = [], [], [], []
    exact = []
    for i, (w, h) in enumerate(cus):
        (tu, lu, tf, lf), (gt, gl, gft, gfl) = _mk_refs(rng, w, h, pad)
        g_t.append(gt)
        g_l.append(gl)
        g_ft.append(gft)
        g_fl.append(gfl)
        exact.append(np.asarray(predict_block(
            tu, lu, tf, lf, w=w, h=h, modes=tuple(picks[i]),
            is_luma=True)))
    gen = np.asarray(predict_generic(
        jnp.concatenate(g_t), jnp.concatenate(g_l),
        jnp.concatenate(g_ft), jnp.concatenate(g_fl),
        jnp.asarray(picks),
        jnp.asarray([c[0] for c in cus]), jnp.asarray([c[1] for c in cus]),
        pad=pad, is_luma=True))
    for i, (w, h) in enumerate(cus):
        for k in range(picks.shape[1]):
            assert np.array_equal(gen[i, k, :h, :w], exact[i][0, k]), \
                (i, k, cus[i], picks[i, k])


def test_pdpc_scale_bound():
    """predict_generic's PDPC gather covers only the first 16 columns;
    exactness relies on 3 << scale <= 12 for every (size, mode)."""
    from pmp_vvc_tpu.ops.intra_generic import param_tables
    for luma in (True, False):
        assert param_tables(luma)["scale"].max() <= 2
