"""Header writers validated through VTM's own HLSyntaxReader."""
import ctypes

import numpy as np
import pytest

from pmp_vvc_tpu.codec.headers import VVCConfig, write_pps, write_sps
from tests.oracle.loader import get_oracle


def _lib():
    lib = get_oracle()
    if lib is None or not hasattr(lib, "oracle_parse_sps"):
        pytest.skip("oracle unavailable")
    for fn in ("oracle_parse_sps", "oracle_parse_pps"):
        getattr(lib, fn).restype = ctypes.c_int
        getattr(lib, fn).argtypes = [ctypes.POINTER(ctypes.c_ubyte),
                                     ctypes.c_int,
                                     ctypes.POINTER(ctypes.c_int)]
    return lib


@pytest.mark.parametrize("w,h,qp", [(192, 128, 32), (1920, 1080 + 8, 27),
                                    (256, 256, 22)])
def test_sps_parses_in_vtm(w, h, qp):
    if w % 8 or h % 8:
        pytest.skip("conformance window unsupported")
    lib = _lib()
    cfg = VVCConfig(width=w, height=h, qp=qp)
    sps = np.frombuffer(write_sps(cfg), np.uint8).copy()
    out = np.zeros(16, np.int32)
    r = lib.oracle_parse_sps(
        sps.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)), len(sps),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int)))
    assert r == 0
    assert out[0] == w and out[1] == h
    assert out[2] == cfg.bit_depth
    assert out[3] == cfg.ctu_size
    assert out[4] == cfg.min_qt_intra
    assert out[5] == cfg.max_mtt_depth_intra
    assert out[11] == cfg.log2_max_tb


@pytest.mark.parametrize("qp", [22, 32, 42])
def test_pps_parses_in_vtm(qp):
    lib = _lib()
    cfg = VVCConfig(width=192, height=128, qp=qp)
    pps = np.frombuffer(write_pps(cfg), np.uint8).copy()
    out = np.zeros(8, np.int32)
    r = lib.oracle_parse_pps(
        pps.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)), len(pps),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int)))
    assert r == 0
    assert out[0] == 192 and out[1] == 128
    assert out[2] == qp
    assert out[3] == 1   # deblocking disabled
    assert out[5] == 1   # no pic partition
