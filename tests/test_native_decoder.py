"""Native decoder: encode -> decode_stream must reproduce the encoder's
recon bit-exactly (and the decoded-picture-hash SEI must verify) across
the tool matrix. Complements the stock-VTM conformance suite: VTM proves
our streams are standard; this proves our own decoder parses them."""
import numpy as np
import pytest

from pmp_vvc_tpu.codec.headers import VVCConfig


def _synth(w, h, seed=7):
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    y8 = np.clip(128 + 60 * np.sin(xx / 17.0) * np.cos(yy / 23.0)
                 + rng.randn(h, w) * 6, 0, 255)
    y = (y8.astype(np.int32) << 2)
    u = ((128 + 40 * np.sin(xx[::2, ::2] / 31.0)).astype(np.int32) << 2)
    v = ((128 + 40 * np.cos(yy[::2, ::2] / 29.0)).astype(np.int32) << 2)
    return y, u, v


def _roundtrip(cfg, mode_select="satd", rmd=(0, 1, 18, 34, 50, 63),
               seed=7, maps=None, chroma_maps=None, qt_map=None,
               frames=1):
    from pmp_vvc_tpu.codec.decoder import decode_stream
    from pmp_vvc_tpu.codec.encoder import FrameEncoder

    w, h = cfg.width, cfg.height
    enc = FrameEncoder(cfg, mode_select=mode_select, rmd_modes=rmd)
    bs = b""
    recons = []
    for poc in range(frames):
        y, u, v = _synth(w, h, seed + poc)
        b, recon = enc.encode_frame(y, u, v, maps=maps,
                                    chroma_maps=chroma_maps,
                                    qt_map=qt_map, poc=poc)
        bs += b
        recons.append(recon)
    dcfg, got = decode_stream(bs, verify_hash=True)
    assert len(got) == frames
    for f in range(frames):
        for plane, (a, b) in enumerate(zip(got[f], recons[f])):
            assert np.array_equal(a, b), \
                (f, plane, np.argwhere(a != b)[:4])


def _mtt_maps(w, h, chroma_factor, seed0):
    from pmp_vvc_tpu.pmp.map2partition import MapToPartition
    hor = np.zeros((h // 4, w // 4), np.uint8)
    ver = np.zeros_like(hor)
    qt = np.zeros((h // 8, w // 8), np.int32)
    dire = np.zeros((3, h // 4, w // 4), np.int8)
    for bx in range(h // 64):
        for by in range(w // 64):
            r = np.random.RandomState(seed0 + bx * 31 + by)
            qtb = np.full((8, 8), r.randint(0, 2), float)
            msbt = np.clip(r.randn(3, 16, 16) * 0.3
                           + np.cumsum(r.rand(3, 1, 1) < 0.6, 0), 0, 3)
            p, d = MapToPartition(qtb, msbt, r.randn(3, 16, 16) * 0.9,
                                  chroma_factor).get_partition()
            hor[bx*16:(bx+1)*16, by*16:(by+1)*16] = p[0][:16, :16]
            ver[bx*16:(bx+1)*16, by*16:(by+1)*16] = p[1][:16, :16]
            qt[bx*8:(bx+1)*8, by*8:(by+1)*8] = qtb.astype(int)
            dire[:, bx*16:(bx+1)*16, by*16:(by+1)*16] = d
    return hor, ver, qt, dire


def test_qt_only_two_frames():
    qt = np.ones((16, 24), np.int32)
    qt[:8, :8] = 2
    _roundtrip(VVCConfig(width=192, height=128, qp=32), qt_map=qt,
               frames=2)


def test_mtt_map_driven():
    cfg = VVCConfig(width=128, height=128, qp=32, log2_min_cb=3,
                    max_mtt_depth_intra=3, max_bt_intra=32,
                    max_tt_intra=32)
    _roundtrip(cfg, rmd=(0, 1, 18, 50), maps=_mtt_maps(128, 128, 1, 0))


def test_dual_tree_mts_lfnst():
    cfg = VVCConfig(width=128, height=128, qp=32, dual_tree=True,
                    mts_intra=True, lfnst=True, log2_min_cb=3,
                    max_mtt_depth_intra=3, max_bt_intra=32,
                    max_tt_intra=32, chroma_max_mtt_depth=3,
                    chroma_max_bt=32, chroma_max_tt=32)
    _roundtrip(cfg, maps=_mtt_maps(128, 128, 1, 0),
               chroma_maps=_mtt_maps(128, 128, 2, 100), seed=9)


def test_mip_mrl_isp():
    qt = np.full((16, 16), 2, np.int32)
    cfg = VVCConfig(width=128, height=128, qp=32, mip=True, mrl=True,
                    isp=True, mts_intra=True)
    _roundtrip(cfg, qt_map=qt, seed=11)


def test_cclm_jccr_sign_hiding_deblock():
    qt = np.full((16, 16), 2, np.int32)
    cfg = VVCConfig(width=128, height=128, qp=27, cclm=True,
                    joint_cbcr=True, sign_hiding=True,
                    deblocking_disabled=False)
    _roundtrip(cfg, qt_map=qt, seed=5)


def test_dep_quant_lfnst():
    qt = np.full((16, 16), 2, np.int32)
    cfg = VVCConfig(width=128, height=128, qp=32, dep_quant=True,
                    lfnst=True)
    _roundtrip(cfg, qt_map=qt, seed=13)


def test_sao_deblock_ctc_chroma_qp():
    qt = np.full((16, 24), 1, np.int32)
    qt[4:, 4:] = 2
    cfg = VVCConfig(width=192, height=128, qp=37, sao=True,
                    deblocking_disabled=False,
                    chroma_qp_start_minus26=-9,
                    chroma_qp_points=((9, 12), (4, 5), (11, 7)))
    _roundtrip(cfg, qt_map=qt, seed=3)


def test_lmcs_crs_kitchen_sink():
    rngqt = np.full((16, 16), 2, np.int32)
    cfg = VVCConfig(width=128, height=128, qp=30, lmcs=True,
                    lmcs_chroma_scaling=True, sao=True,
                    deblocking_disabled=False, mts_intra=True,
                    lfnst=True, mip=True, isp=True, joint_cbcr=True)
    _roundtrip(cfg, qt_map=rngqt, seed=5)


def test_boundary_frame_implicit_splits():
    cfg = VVCConfig(width=160, height=96, qp=32)
    _roundtrip(cfg, seed=21)


@pytest.mark.parametrize("mode", ["fixed", "aps", "ccalf", "full"])
def test_alf_native_decode(mode):
    from pmp_vvc_tpu.codec.decoder import decode_stream
    from pmp_vvc_tpu.codec.encoder import FrameEncoder

    rng = np.random.RandomState(5)
    w, h = 128, 128
    yy, xx = np.mgrid[0:h, 0:w]
    y = np.clip(500 + 300 * np.sin(xx / 7.) * np.cos(yy / 9.)
                + rng.randn(h, w) * 40, 0, 1023).astype(np.int32)
    u = np.clip(512 + (y[::2, ::2] - 512) // 3
                + rng.randn(h // 2, w // 2) * 20, 0, 1023).astype(np.int32)
    v = np.clip(512 - (y[::2, ::2] - 512) // 4
                + rng.randn(h // 2, w // 2) * 20, 0, 1023).astype(np.int32)
    kw = dict(width=w, height=h, qp=32, alf=True)
    if mode == "aps":
        kw.update(alf_chroma=True)
    elif mode == "ccalf":
        kw.update(ccalf=True)
    elif mode == "full":
        kw.update(alf_chroma=True, ccalf=True, sao=True,
                  deblocking_disabled=False, lmcs=True,
                  lmcs_chroma_scaling=True)
    cfg = VVCConfig(**kw)
    enc = FrameEncoder(cfg, mode_select="satd",
                       rmd_modes=tuple(range(0, 67, 4)))
    qt = np.full((h // 8, w // 8), 2, np.int32)
    bs, recon = enc.encode_frame(y, u, v, qt_map=qt, poc=0)
    dcfg, frames = decode_stream(bs, verify_hash=True)
    for plane, (a, b) in enumerate(zip(frames[0], recon)):
        assert np.array_equal(a, b), (plane, np.argwhere(a != b)[:4])
