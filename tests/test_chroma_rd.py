"""Chroma mode RD search (IntraSearch::estIntraPredChromaQT counterpart,
IntraSearch.cpp:1224-1400): the encoder must trial the non-DM chroma list
(planar/ver/hor/DC with VDIA replacement) + CCLM under RD, emit non-DM
modes where they win, and stay conformant (native decode bit-exact)."""
import numpy as np
import pytest


def _content(w, h, seed=11):
    """Luma with diagonal texture, chroma with strong horizontal bands:
    DM (diagonal) is a poor chroma predictor, HOR/VER should win CUs."""
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    y = np.clip(512 + 300 * np.sin((xx + yy) / 6.0)
                + rng.randn(h, w) * 12, 0, 1023).astype(np.int32)
    cyy = yy[::2, ::2]
    u = np.clip(512 + 320 * np.sin(cyy / 5.0)
                + rng.randn(h // 2, w // 2) * 8, 0, 1023).astype(np.int32)
    v = np.clip(512 - 320 * np.sin(cyy / 7.0)
                + rng.randn(h // 2, w // 2) * 8, 0, 1023).astype(np.int32)
    return y, u, v


@pytest.mark.parametrize("dual_tree", [False, True])
def test_nondm_chroma_modes_roundtrip(dual_tree):
    from pmp_vvc_tpu.codec.decoder import decode_stream
    from pmp_vvc_tpu.codec.encoder import FrameEncoder
    from pmp_vvc_tpu.codec.headers import VVCConfig

    w, h = 128, 64
    y, u, v = _content(w, h)
    cfg = VVCConfig(width=w, height=h, qp=32, cclm=True,
                    dual_tree=dual_tree)
    enc = FrameEncoder(cfg, mode_select="satd",
                       rmd_modes=(0, 1, 18, 34, 50, 63))
    bs, recon = enc.encode_frame(y, u, v,
                                 qt_map=np.ones((h // 8, w // 8),
                                                np.int32))
    assert enc.n_nondm > 0, "no non-DM chroma mode chosen on content " \
        "built to favour them"
    _, got = decode_stream(bs, verify_hash=True)
    for a, b in zip(got[0], recon):
        np.testing.assert_array_equal(a, b)


def test_chroma_rd_improves_rate_or_distortion():
    """On the banded-chroma content, the RD search must not lose to a
    DM/CCLM-only encoder (same luma decisions): compare bits at equal
    or better chroma SSE."""
    from pmp_vvc_tpu.codec.encoder import FrameEncoder
    from pmp_vvc_tpu.codec.headers import VVCConfig

    w, h = 128, 64
    y, u, v = _content(w, h)
    qt = np.ones((h // 8, w // 8), np.int32)

    class _NoNonDm(FrameEncoder):
        @staticmethod
        def _chroma_cand_list(luma_mode):
            return []

    cfg = VVCConfig(width=w, height=h, qp=32, cclm=True)
    kw = dict(mode_select="satd", rmd_modes=(0, 1, 18, 34, 50, 63))
    bs_new, rec_new = FrameEncoder(cfg, **kw).encode_frame(
        y, u, v, qt_map=qt)
    bs_old, rec_old = _NoNonDm(cfg, **kw).encode_frame(y, u, v, qt_map=qt)

    def chroma_sse(rec):
        return (float(((rec[1].astype(np.int64) - u) ** 2).sum())
                + float(((rec[2].astype(np.int64) - v) ** 2).sum()))

    # RD cost with the encoder's own lambda: the search must win overall
    lam = FrameEncoder(cfg, **kw).dw_c
    enc = FrameEncoder(cfg, **kw)
    j_new = chroma_sse(rec_new) * enc.dw_c + enc.lam * 8 * len(bs_new)
    j_old = chroma_sse(rec_old) * enc.dw_c + enc.lam * 8 * len(bs_old)
    assert j_new <= j_old * 1.001
