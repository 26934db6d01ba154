"""SCIPU (local dual tree) in single-tree streams.

VVC forbids chroma intra blocks below 16 samples or of width 2: at a
single-tree node whose split would create them (modeTypeCondition !=
0, UnitTools.cpp CU::checkModeTypeCondition), the decoder switches to
a LOCAL DUAL TREE — luma-only CUs inside the region, then ONE
region-sized chroma CU.  Covered cases: area-64 any-split, area-32 BT,
area-128 TT, 8-wide BT_V, 16-wide TT_V.

Decode side: stock VTM single-tree streams with deep MTT must decode
hash-verified through the local-dual-tree parse.  Encode side: this
encoder refuses SCIPU-triggering splits (always conformant), so its
single-tree streams stay stock-decodable at any partition envelope —
before the guard, a 4x16-leaf stream crashed the stock DecoderApp.
"""
import pathlib
import subprocess

import numpy as np
import pytest

from pmp_vvc_tpu.codec.headers import VVCConfig

_ENC = pathlib.Path("/tmp/vtm_oracle/EncoderApp")
_DEC = pathlib.Path("/tmp/vtm_oracle/DecoderApp")

_ENVELOPE = ["--MinQTISlice=4", "--MaxMTTHierarchyDepthI=3",
             "--MaxBTLumaISlice=32", "--MaxTTLumaISlice=32"]


def _content(w, h):
    rng = np.random.RandomState(7)
    yy, xx = np.mgrid[0:h, 0:w]
    y8 = np.clip(128 + 60 * np.sin(xx / 7.0) * np.cos(yy / 5.0)
                 + rng.randn(h, w) * 25, 0, 255).astype(np.uint8)
    u8 = (128 + 40 * np.sin(xx[::2, ::2] / 9.0)).astype(np.uint8)
    v8 = (128 + 40 * np.cos(yy[::2, ::2] / 8.0)).astype(np.uint8)
    return y8, u8, v8


def _stock_stream(tmp_path, w, h, dire_fill):
    """Encode with the reference EncoderApp, dense maps steering MTT."""
    from pmp_vvc_tpu.data.yuv import write_yuv420
    from pmp_vvc_tpu.pmp.map2partition import write_partition_txt
    from tests.test_stock_vtm_decode import TOOLS_OFF
    y8, u8, v8 = _content(w, h)
    write_yuv420(tmp_path / "in.yuv", y8[None], u8[None], v8[None])
    (tmp_path / "seq.cfg").write_text(
        f"InputFile: in.yuv\nInputBitDepth: 8\nInputChromaFormat: 420\n"
        f"FrameRate: 30\nSourceWidth: {w}\nSourceHeight: {h}\n"
        "FramesToBeEncoded: 1\nLevel: 2.1\n")
    pm = tmp_path / "PartitionMat"
    pm.mkdir(exist_ok=True)
    hor = np.ones((h // 4, w // 4), np.int32)
    ver = np.ones((h // 4, w // 4), np.int32)
    qt = np.full((h // 8, w // 8), 2, np.int32)
    dire = np.zeros((3, h // 4, w // 4), np.int32)
    for d, v in enumerate(dire_fill):
        dire[d] = v
    for comp in ("Luma", "Chroma"):
        write_partition_txt(pm / f"in_{comp}_QP22_PartitionMat.txt",
                            [(hor, ver, qt, dire)])
    tools = [t for t in TOOLS_OFF
             if not t.startswith(("--MinQT", "--MaxMTT", "--MaxBT",
                                  "--MaxTT"))] + _ENVELOPE
    r = subprocess.run(
        [str(_ENC), "-c", "seq.cfg", "-c",
         "/root/reference/codec/demo/cfg/encoder_intra_vtm.cfg",
         "-q", "22", "-ts", "1", "--SEIDecodedPictureHash=1",
         "-b", "out.bin", "-o", "/dev/null"] + tools,
        capture_output=True, text=True, cwd=tmp_path, timeout=400)
    assert r.returncode == 0, r.stdout[-1200:]
    return (tmp_path / "out.bin").read_bytes()


@pytest.mark.skipif(not _ENC.exists(), reason="VTM oracle not built")
@pytest.mark.parametrize("dire_fill,min_scipu", [
    ((1, -1, 1), 3),       # BT chains -> area-64 BT regions
    ((0, 0, 0), 3),        # TT-heavy -> area-128 TT, 16-wide TT_V
    ((-1, -1, -1), 3),     # BT_V chains -> 8-wide BT_V regions
])
def test_decode_stock_scipu_stream(tmp_path, dire_fill, min_scipu):
    from pmp_vvc_tpu.codec.decoder import decode_stream
    data = _stock_stream(tmp_path, 64, 64, dire_fill)
    cfg, frames = decode_stream(data, verify_hash=True)
    assert decode_stream.n_scipu >= min_scipu, decode_stream.n_scipu


@pytest.mark.skipif(not _DEC.exists(), reason="VTM oracle not built")
def test_encoder_refuses_scipu_splits(tmp_path):
    """Single-tree encode with a deep-MTT envelope and all-BT_V maps:
    the guard must stop at 8x16 leaves (no inline 2x8 chroma) and the
    stream must satisfy the stock decoder."""
    from pmp_vvc_tpu.codec.encoder import FrameEncoder
    y8, u8, v8 = _content(64, 64)
    y, u, v = (y8.astype(np.int32) << 2, u8.astype(np.int32) << 2,
               v8.astype(np.int32) << 2)
    hor = np.ones((16, 16), np.int32)
    ver = np.ones((16, 16), np.int32)
    qt = np.full((8, 8), 2, np.int32)
    dire = np.full((3, 16, 16), -1, np.int32)
    enc = FrameEncoder(VVCConfig(width=64, height=64, qp=22,
                                 log2_min_cb=2, min_qt_intra=4,
                                 max_mtt_depth_intra=3, max_bt_intra=32,
                                 max_tt_intra=32), mode_select="satd")
    bs, _ = enc.encode_frame(y, u, v, maps=(hor, ver, qt, dire))
    assert all(w >= 8 for (_, _, w, _) in enc.leaf_l)
    bit = tmp_path / "guard.bin"
    bit.write_bytes(bs)
    r = subprocess.run([str(_DEC), "-b", str(bit), "-o",
                        str(tmp_path / "out.yuv")],
                       capture_output=True, text=True, timeout=300)
    assert r.returncode == 0 and "(OK)" in r.stdout, r.stdout[-1000:]
