"""Wavefront (batched device) encoder: streams must decode bit-exactly in
our native decoder (and, when the VTM oracle is built, in the stock
DecoderApp) — proving the batched schedule + availability-masked device
reference construction preserves normative semantics."""
import os
import pathlib
import subprocess

import numpy as np
import pytest

from pmp_vvc_tpu.codec.headers import VVCConfig

_DEC = pathlib.Path("/tmp/vtm_oracle/DecoderApp")


def _synth(w, h, seed=7):
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    y8 = np.clip(128 + 60 * np.sin(xx / 17.0) * np.cos(yy / 23.0)
                 + rng.randn(h, w) * 6, 0, 255)
    y = (y8.astype(np.int32) << 2)
    u = ((128 + 40 * np.sin(xx[::2, ::2] / 31.0)).astype(np.int32) << 2)
    v = ((128 + 40 * np.cos(yy[::2, ::2] / 29.0)).astype(np.int32) << 2)
    return y, u, v


def _mtt_maps(w, h, chroma_factor=1, seed0=0):
    """Deterministic MTT partition maps exercising rect CU buckets
    (same synthesis as tests/test_native_decoder.py)."""
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


def _roundtrip(cfg, frames=1, maps=None, qt_map=None):
    from pmp_vvc_tpu.codec.decoder import decode_stream
    from pmp_vvc_tpu.codec.wavefront import WavefrontEncoder

    enc = WavefrontEncoder(cfg)
    bs = b""
    recons = []
    for poc in range(frames):
        y, u, v = _synth(cfg.width, cfg.height, 7 + poc)
        b, recon = enc.encode_frame(y, u, v, maps=maps, qt_map=qt_map,
                                    poc=poc)
        bs += b
        recons.append(recon)
    dcfg, got = decode_stream(bs, verify_hash=True)
    assert len(got) == frames
    for f in range(frames):
        for plane, (a, b) in enumerate(zip(got[f], recons[f])):
            assert np.array_equal(a, b), (f, plane)
    return bs, recons


def test_wavefront_qt_only_bit_exact():
    cfg = VVCConfig(width=192, height=128, qp=32)
    _roundtrip(cfg, frames=2)


def test_wavefront_mtt_maps_bit_exact():
    cfg = VVCConfig(width=192, height=128, qp=27)
    maps = _mtt_maps(192, 128)
    _roundtrip(cfg, maps=maps)


def test_wavefront_filters_bit_exact():
    cfg = VVCConfig(width=192, height=128, qp=32, sao=True,
                    deblocking_disabled=False)
    _roundtrip(cfg)


def test_wavefront_matches_sequential_decisions_shape():
    """The wavefront path must produce the same partition (leaf set) as
    the sequential encoder for identical maps."""
    from pmp_vvc_tpu.codec.encoder import FrameEncoder
    from pmp_vvc_tpu.codec.wavefront import WavefrontEncoder

    cfg = VVCConfig(width=192, height=128, qp=32)
    y, u, v = _synth(192, 128)
    maps = _mtt_maps(192, 128)
    wf = WavefrontEncoder(cfg)
    wf.encode_frame(y, u, v, maps=maps)
    seq = FrameEncoder(cfg, mode_select="satd")
    seq.encode_frame(y, u, v, maps=maps)
    assert sorted(wf.leaf_l) == sorted(seq.leaf_l)


def test_wavefront_dual_tree_bit_exact():
    """Dual-tree wavefront: separate chroma-tree wave schedule (DM from
    the luma mode grid), decode bit-exact + sane fidelity (guards
    against encoding the wrong plane data, which a pure round-trip
    check cannot see)."""
    cfg = VVCConfig(width=192, height=128, qp=32, dual_tree=True,
                    sao=True, deblocking_disabled=False)
    bs, recons = _roundtrip(cfg)
    y, _, _ = _synth(192, 128)
    err = (recons[0][0].astype(np.int64) - y) ** 2
    psnr = 10 * np.log10(1023 * 1023 / err.mean())
    assert psnr > 30, psnr


def test_wavefront_dual_tree_mtt_maps():
    cfg = VVCConfig(width=192, height=128, qp=27, dual_tree=True)
    maps = _mtt_maps(192, 128)
    cmaps = _mtt_maps(192, 128, chroma_factor=2, seed0=5)
    from pmp_vvc_tpu.codec.decoder import decode_stream
    from pmp_vvc_tpu.codec.wavefront import WavefrontEncoder
    enc = WavefrontEncoder(cfg)
    y, u, v = _synth(192, 128)
    bs, recon = enc.encode_frame(y, u, v, maps=maps, chroma_maps=cmaps)
    dcfg, got = decode_stream(bs, verify_hash=True)
    for plane, (a, b) in enumerate(zip(got[0], recon)):
        assert np.array_equal(a, b), plane


def test_wavefront_mts_bit_exact():
    """Device-batched MTS trials: the chosen mts_idx must survive the
    signalling constraints (non-DC coefficient present) so the decoder
    reproduces the transform choice; stream must also be SMALLER than
    DCT2-only on this content (the point of the tool)."""
    y, u, v = _synth(192, 128)
    from pmp_vvc_tpu.codec.wavefront import WavefrontEncoder
    cfg0 = VVCConfig(width=192, height=128, qp=32)
    bs0, _ = WavefrontEncoder(cfg0).encode_frame(y, u, v)
    cfg = VVCConfig(width=192, height=128, qp=32, mts_intra=True)
    bs, recons = _roundtrip(cfg)
    assert len(bs) < len(bs0), (len(bs), len(bs0))


def test_wavefront_unsupported_cfg_raises():
    from pmp_vvc_tpu.codec.wavefront import WavefrontEncoder
    with pytest.raises(NotImplementedError):
        WavefrontEncoder(VVCConfig(width=64, height=64, qp=32,
                                   isp=True))


@pytest.mark.skipif(not _DEC.exists(), reason="VTM oracle not built")
def test_wavefront_stock_vtm_decode(tmp_path):
    cfg = VVCConfig(width=192, height=128, qp=32, sao=True,
                    deblocking_disabled=False)
    bs, recons = _roundtrip(cfg, frames=2, maps=_mtt_maps(192, 128))
    bit = tmp_path / "wf.bin"
    bit.write_bytes(bs)
    r = subprocess.run([str(_DEC), "-b", str(bit), "-o",
                        str(tmp_path / "out.yuv")],
                       capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    assert "(OK)" in r.stdout


def test_wavefront_ctc_tools_rate_parity():
    """VERDICT r3 item 3 criterion (widened round 5): dual tree + MTS +
    MIP + CCLM + LFNST + ALF/CC-ALF on the device path, hash-OK, within
    1.3x the sequential encoder's rate on the same toolset/maps."""
    import numpy as np
    from pmp_vvc_tpu.codec.encoder import FrameEncoder
    from pmp_vvc_tpu.codec.wavefront import WavefrontEncoder
    y, u, v = _synth(192, 128)
    kw = dict(width=192, height=128, qp=32, dual_tree=True,
              mts_intra=True, mip=True, cclm=True, lfnst=True,
              alf=True, ccalf=True, alf_chroma=True)
    cfg = VVCConfig(**kw)
    bs_w, recons = _roundtrip(cfg)
    seq = FrameEncoder(VVCConfig(**kw), mode_select="satd")
    bs_s, _ = seq.encode_frame(y, u, v)
    assert len(bs_w) <= 1.3 * len(bs_s), (len(bs_w), len(bs_s))


def test_wavefront_sign_hiding_bit_exact(tmp_path):
    """SDH on the device path (ops/sdh_generic.py): the adjusted-parity
    levels must survive the native decoder's sign inference AND the
    stock VTM decoder, with the full device toolset + random MTT
    maps."""
    cfg = VVCConfig(width=192, height=128, qp=32, sign_hiding=True,
                    dual_tree=True, mts_intra=True, mip=True, cclm=True,
                    lfnst=True, sao=True, deblocking_disabled=False,
                    chroma_qp_start_minus26=-9,
                    chroma_qp_points=((9, 12), (4, 5), (11, 7)))
    bs, _ = _roundtrip(cfg, maps=_mtt_maps(192, 128))
    bit = tmp_path / "sdh.bin"
    bit.write_bytes(bs)
    r = subprocess.run([str(_DEC), "-b", str(bit), "-o",
                        str(tmp_path / "out.yuv")],
                       capture_output=True, text=True, timeout=300)
    assert r.returncode == 0 and "(OK)" in r.stdout, r.stdout[-1500:]


def test_wavefront_joint_cbcr_bit_exact(tmp_path):
    """JCCR (mask 3, Cr = -Cb) on the device path: anti-correlated
    chroma content must actually trigger joint TUs, and the streams
    must decode hash-verified natively and on the stock decoder, in
    both tree modes (TrQuant.cpp:139 invTransformCbCr;
    CABACWriter.cpp:2610 joint_cb_cr)."""
    import numpy as np
    from pmp_vvc_tpu.codec.decoder import decode_stream
    from pmp_vvc_tpu.codec.wavefront import WavefrontEncoder
    rng = np.random.RandomState(3)
    w, h = 192, 128
    yy, xx = np.mgrid[0:h, 0:w]
    y = (np.clip(128 + 60 * np.sin(xx / 13.) * np.cos(yy / 17.)
                 + rng.randn(h, w) * 8, 0, 255).astype(np.int32) << 2)
    base = 30 * np.sin(xx[::2, ::2] / 9.) + rng.randn(h // 2, w // 2) * 6
    u = (np.clip(128 + base, 0, 255).astype(np.int32) << 2)
    v = (np.clip(128 - base, 0, 255).astype(np.int32) << 2)
    for dual in (False, True):
        cfg = VVCConfig(width=w, height=h, qp=32, joint_cbcr=True,
                        sign_hiding=True, dual_tree=dual, mts_intra=True,
                        mip=True, cclm=True, lfnst=True, sao=True,
                        deblocking_disabled=False,
                        chroma_qp_start_minus26=-9,
                        chroma_qp_points=((9, 12), (4, 5), (11, 7)))
        enc = WavefrontEncoder(cfg)
        bs, rec = enc.encode_frame(y, u, v, maps=_mtt_maps(w, h))
        assert (np.asarray(enc._dev_result[9]) & 2).any(), dual
        dcfg, got = decode_stream(bs, verify_hash=True)
        for p, (a, b) in enumerate(zip(got[0], rec)):
            assert np.array_equal(a, b), (dual, p)
        bit = tmp_path / f"jccr{int(dual)}.bin"
        bit.write_bytes(bs)
        r = subprocess.run([str(_DEC), "-b", str(bit), "-o",
                            str(tmp_path / "out.yuv")],
                           capture_output=True, text=True, timeout=300)
        assert r.returncode == 0 and "(OK)" in r.stdout, \
            (dual, r.stdout[-1000:])


def test_wavefront_lmcs_bit_exact(tmp_path):
    """LMCS on the device path: luma coded in the mapped domain (fwd
    LUT at upload, picture-level inverse before the loop filters) and
    chroma residual scaling from the device-computed VPDU-neighbour
    average (Reshape.cpp:106 calculateChromaAdjVpduNei).  CRS is
    DECODER-DERIVED (no syntax), so the hash-verified decode proves
    the device derivation matches the normative one sample-for-sample;
    the AI model's scale LUT is non-identity over >99% of the sample
    range, so the check is not vacuous."""
    import numpy as np
    from pmp_vvc_tpu.codec.decoder import decode_stream
    from pmp_vvc_tpu.codec.wavefront import WavefrontEncoder
    w, h = 192, 128
    y, u, v = _synth(w, h)
    maps = _mtt_maps(w, h)
    for dual in (False, True):
        cfg = VVCConfig(width=w, height=h, qp=32, lmcs=True,
                        lmcs_chroma_scaling=True, joint_cbcr=True,
                        sign_hiding=True, dual_tree=dual, mts_intra=True,
                        mip=True, cclm=True, lfnst=True, sao=True,
                        deblocking_disabled=False,
                        chroma_qp_start_minus26=-9,
                        chroma_qp_points=((9, 12), (4, 5), (11, 7)))
        enc = WavefrontEncoder(cfg)
        bs, rec = enc.encode_frame(y, u, v, maps=maps)
        dcfg, got = decode_stream(bs, verify_hash=True)
        for p, (a, b) in enumerate(zip(got[0], rec)):
            assert np.array_equal(a, b), (dual, p)
        bit = tmp_path / f"lmcs{int(dual)}.bin"
        bit.write_bytes(bs)
        r = subprocess.run([str(_DEC), "-b", str(bit), "-o",
                            str(tmp_path / "out.yuv")],
                           capture_output=True, text=True, timeout=300)
        assert r.returncode == 0 and "(OK)" in r.stdout, \
            (dual, r.stdout[-1000:])


def test_wavefront_transform_skip_bit_exact(tmp_path):
    """Transform skip on the device path (MTS_SKIP candidate in the
    luma trial set: identity transform + TS quant, TS residual coding
    at replay).  Screen-content-like input must actually choose TS for
    some TUs; streams decode hash-verified natively and on the stock
    decoder."""
    import numpy as np
    from pmp_vvc_tpu.codec.decoder import decode_stream
    from pmp_vvc_tpu.codec.wavefront import WavefrontEncoder
    rng = np.random.RandomState(9)
    w, h = 192, 128
    y8 = np.full((h, w), 60, np.int32)
    for _ in range(40):
        x0, y0 = rng.randint(0, w - 16), rng.randint(0, h - 16)
        y8[y0:y0 + rng.randint(4, 16),
           x0:x0 + rng.randint(4, 16)] = rng.randint(0, 255)
    y8[::7, ::3] = 240
    y = y8 << 2
    u = np.full((h // 2, w // 2), 128, np.int32) << 2
    v = u.copy()
    cfg = VVCConfig(width=w, height=h, qp=32, transform_skip=True,
                    dual_tree=True, mts_intra=True, mip=True, cclm=True,
                    lfnst=True, sign_hiding=True, joint_cbcr=True,
                    lmcs=True, lmcs_chroma_scaling=True, sao=True,
                    deblocking_disabled=False,
                    chroma_qp_start_minus26=-9,
                    chroma_qp_points=((9, 12), (4, 5), (11, 7)))
    enc = WavefrontEncoder(cfg)
    bs, rec = enc.encode_frame(y, u, v, maps=_mtt_maps(w, h))
    assert (np.asarray(enc._dev_result[7]) == 1).any()
    dcfg, got = decode_stream(bs, verify_hash=True)
    for p, (a, b) in enumerate(zip(got[0], rec)):
        assert np.array_equal(a, b), p
    bit = tmp_path / "ts.bin"
    bit.write_bytes(bs)
    r = subprocess.run([str(_DEC), "-b", str(bit), "-o",
                        str(tmp_path / "out.yuv")],
                       capture_output=True, text=True, timeout=300)
    assert r.returncode == 0 and "(OK)" in r.stdout, r.stdout[-1000:]


def test_device_rdo_split_search():
    """VERDICT r3 item 4: device-batched QTMT split search — decodes
    hash-verified and beats QT-only coding by a wide rate margin at
    matched quality (the point of RDO partitioning); warm runtime is
    seconds, not the host recursion's minutes."""
    from pmp_vvc_tpu.codec.decoder import decode_stream
    from pmp_vvc_tpu.codec.wavefront import WavefrontEncoder
    y, u, v = _synth(192, 128)
    enc = WavefrontEncoder(VVCConfig(width=192, height=128, qp=32))
    bs, recon = enc.encode_frame(y, u, v, rdo=True)
    dcfg, got = decode_stream(bs, verify_hash=True)
    for plane, (a, b) in enumerate(zip(got[0], recon)):
        assert np.array_equal(a, b), plane
    bs_qt, recon_qt = enc.encode_frame(y, u, v)
    err = (recon[0].astype(np.int64) - y) ** 2
    err_qt = (recon_qt[0].astype(np.int64) - y) ** 2
    assert len(bs) < 0.8 * len(bs_qt), (len(bs), len(bs_qt))
    assert err.mean() <= err_qt.mean() * 1.05
