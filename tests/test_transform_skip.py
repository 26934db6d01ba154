"""Transform-skip residual coding (VERDICT round-2 item 4).

Contracts:
- writer byte-exact vs the real VTM-10.0 CABACWriter::residual_codingTS
  (oracle_residual_code_ts, tests/oracle/oracle_api.cpp)
- parser mirrors the writer (round-trip) on every TU geometry incl.
  context-budget exhaustion
- end-to-end: encoder trials TS under RD; streams decode bit-exact in
  our decoder (hash-verified) and in the stock VTM DecoderApp
"""
import ctypes
import pathlib
import subprocess

import numpy as np
import pytest

from pmp_vvc_tpu.codec.cabac import BinDecoder, BinEncoder, ContextStore
from pmp_vvc_tpu.codec.residual import (TSResidualCoder, TSResidualParser,
                                        ctx)

DEC = pathlib.Path("/tmp/vtm_oracle/DecoderApp")


def _rand_levels(rng, w, h, dense=False):
    lev = np.zeros((h, w), np.int32)
    n = int(rng.integers(1, w * h if dense else max(2, w * h // 2)))
    idx = rng.choice(w * h, n, replace=False)
    mags = rng.choice([1, 1, 1, 2, 2, 3, 5, 12, 60, 400, 3000], n) \
        * rng.choice([-1, 1], n)
    lev.reshape(-1)[idx] = mags
    if not lev.any():
        lev[0, 0] = 1
    return lev


def test_ts_roundtrip_all_geometries():
    rng = np.random.default_rng(0)
    n = 0
    for w in (2, 4, 8, 16, 32):
        for h in (2, 4, 8, 16, 32):
            if w * h < 16:
                continue
            for dense in (False, True):
                lev = _rand_levels(rng, w, h, dense)
                enc = BinEncoder(ContextStore.standard_init(32, 0))
                TSResidualCoder(enc).code(lev, is_luma=True)
                enc.encode_bin_trm(1)
                dec = BinDecoder(enc.finish(),
                                 ContextStore.standard_init(32, 0))
                out = TSResidualParser(dec).parse(w, h, is_luma=True)
                assert np.array_equal(out, lev), (w, h)
                n += 1
    assert n == 44


def test_ts_writer_oracle_byte_exact():
    from tests.oracle.loader import get_oracle
    lib = get_oracle()
    if lib is None or not hasattr(lib, "oracle_residual_code_ts"):
        pytest.skip("oracle unavailable")
    lib.oracle_residual_code_ts.restype = ctypes.c_int
    lib.oracle_residual_code_ts.argtypes = [
        ctypes.POINTER(ctypes.c_int), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_ubyte)]
    rng = np.random.default_rng(7)
    n = 0
    for trial in range(200):
        w = int(rng.choice([2, 4, 8, 16, 32]))
        h = int(rng.choice([2, 4, 8, 16, 32]))
        if w * h < 16:
            continue
        is_luma = bool(rng.integers(0, 2))
        lev = _rand_levels(rng, w, h, dense=bool(rng.integers(0, 2)))
        qp = int(rng.choice([22, 27, 32, 37]))
        cbuf = (ctypes.c_int * (w * h))(*lev.reshape(-1).tolist())
        out = (ctypes.c_ubyte * 65536)()
        nb = lib.oracle_residual_code_ts(cbuf, w, h, int(is_luma), qp, 0,
                                         out)
        enc = BinEncoder(ContextStore.standard_init(qp, 0))
        enc.encode_bin(1, ctx("TransformSkipFlag", 0 if is_luma else 1))
        TSResidualCoder(enc).code(lev, is_luma=is_luma)
        enc.encode_bin_trm(1)
        assert enc.finish() == bytes(out[:nb]), (w, h, is_luma, qp)
        n += 1
    assert n > 100


def _content(W, H):
    """Screen-content-like frame (flat regions + noise stripes: TS
    territory)."""
    rng = np.random.RandomState(3)
    y = np.full((H, W), 512, np.int32)
    y[8:40, 8:60] = 900
    y[20:28, 70:120] = rng.randint(0, 2, (8, 50)) * 700 + 100
    y[40:, :] += np.arange(W) % 7 * 60
    u = np.full((H // 2, W // 2), 480, np.int32)
    u[5:20, 5:30] = 700
    v = np.full((H // 2, W // 2), 530, np.int32)
    v[10:25, 20:50] = 200
    return y, u, v


_CONFIGS = [
    dict(),
    dict(mts_intra=True, lfnst=True),
    dict(dep_quant=True),
    dict(sign_hiding=True),
    dict(dual_tree=True, cclm=True, mip=True, isp=True, mrl=True,
         joint_cbcr=True, lfnst=True, mts_intra=True, sao=True,
         lmcs=True, lmcs_chroma_scaling=True, dep_quant=True,
         deblocking_disabled=False),
]


@pytest.mark.parametrize("extra", _CONFIGS)
def test_ts_encode_decode_bit_exact(extra):
    from pmp_vvc_tpu.codec.decoder import decode_stream
    from pmp_vvc_tpu.codec.encoder import FrameEncoder
    from pmp_vvc_tpu.codec.headers import VVCConfig
    W, H = 128, 64
    y, u, v = _content(W, H)
    qt = np.ones((H // 8, W // 8), np.int32)
    cfg = VVCConfig(width=W, height=H, qp=27, transform_skip=True, **extra)
    enc = FrameEncoder(cfg, mode_select="satd",
                       rmd_modes=tuple(range(0, 67, 4)))
    bs, recon = enc.encode_frame(y, u, v, qt_map=qt, poc=0)
    _, frames = decode_stream(bs, verify_hash=True)
    for got, want in zip(frames[0], recon):
        assert np.array_equal(got, want)
    # TS must actually be selected on this content (flag-off control)
    cfg0 = VVCConfig(width=W, height=H, qp=27, **extra)
    enc0 = FrameEncoder(cfg0, mode_select="satd",
                        rmd_modes=tuple(range(0, 67, 4)))
    bs0, _ = enc0.encode_frame(y, u, v, qt_map=qt, poc=0)
    assert len(bs) < len(bs0), "TS trial never won on TS-friendly content"


@pytest.mark.skipif(not DEC.exists(), reason="VTM decoder oracle not built")
@pytest.mark.parametrize("extra", [_CONFIGS[0], _CONFIGS[2], _CONFIGS[4]])
def test_ts_stream_stock_decoder_hash_ok(tmp_path, extra):
    from pmp_vvc_tpu.codec.encoder import FrameEncoder
    from pmp_vvc_tpu.codec.headers import VVCConfig
    W, H = 128, 64
    y, u, v = _content(W, H)
    qt = np.ones((H // 8, W // 8), np.int32)
    cfg = VVCConfig(width=W, height=H, qp=27, transform_skip=True, **extra)
    enc = FrameEncoder(cfg, mode_select="satd",
                       rmd_modes=tuple(range(0, 67, 4)))
    bs, _ = enc.encode_frame(y, u, v, qt_map=qt, poc=0)
    bit = tmp_path / "o.bin"
    bit.write_bytes(bs)
    r = subprocess.run([str(DEC), "-b", str(bit),
                        "-o", str(tmp_path / "d.yuv")],
                       capture_output=True, text=True, timeout=120)
    assert r.returncode == 0 and "(OK)" in r.stdout, \
        (r.stderr or r.stdout)[-500:]
