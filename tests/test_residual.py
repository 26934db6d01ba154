"""Residual coefficient coding: byte-exact parity vs VTM CABACWriter."""
import ctypes

import numpy as np
import pytest

from pmp_vvc_tpu.codec.cabac import BinEncoder, ContextStore
from pmp_vvc_tpu.codec.residual import ResidualCoder, diag_scan, grouped_scan
from tests.oracle.loader import get_oracle


def _oracle_bytes(lib, coeff, is_luma, qp=32, init_id=0):
    h, w = coeff.shape
    c = np.ascontiguousarray(coeff, np.int32)
    out = np.zeros(w * h * 4 + 256, np.uint8)
    n = lib.oracle_residual_code(
        c.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), w, h,
        1 if is_luma else 0, qp, init_id,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)))
    return bytes(out[:n])


def _ours_bytes(coeff, is_luma, qp=32, init_id=0):
    enc = BinEncoder(ContextStore.standard_init(qp, init_id))
    rc = ResidualCoder(enc)
    rc.code(coeff, is_luma=is_luma)
    enc.encode_bin_trm(1)
    return enc.finish()


def _lib():
    lib = get_oracle()
    if lib is None or not hasattr(lib, "oracle_residual_code"):
        pytest.skip("oracle unavailable")
    lib.oracle_residual_code.restype = ctypes.c_int
    lib.oracle_residual_code.argtypes = [
        ctypes.POINTER(ctypes.c_int), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_ubyte)]
    return lib


def test_scan_orders_basic():
    s = diag_scan(4, 4)
    assert tuple(s[0]) == (0, 0, 0)
    assert tuple(s[1]) == (4, 0, 1)      # (x=0, y=1) -> idx 4
    assert tuple(s[2]) == (1, 1, 0)
    g = grouped_scan(8, 8)
    assert g.shape == (64, 3)
    assert tuple(g[0]) == (0, 0, 0)
    # second CG starts after 16 positions
    assert (g[16][1] >= 4) or (g[16][2] >= 4)


@pytest.mark.parametrize("w,h", [(4, 4), (8, 8), (16, 16), (32, 32),
                                 (4, 8), (16, 4), (8, 32), (64, 64),
                                 (64, 16)])
@pytest.mark.parametrize("is_luma", [True, False])
@pytest.mark.parametrize("density", [0.05, 0.4, 0.9])
def test_residual_matches_vtm(w, h, is_luma, density):
    lib = _lib()
    rng = np.random.RandomState(hash((w, h, is_luma, density)) % 2**31)
    mag = rng.randint(-40, 41, (h, w))
    mask = rng.rand(h, w) < density
    coeff = (mag * mask).astype(np.int32)
    # zero-out region must be empty (transform guarantees this)
    coeff[min(32, h):, :] = 0
    coeff[:, min(32, w):] = 0
    if not coeff.any():
        coeff[0, 0] = 1
    ours = _ours_bytes(coeff, is_luma)
    theirs = _oracle_bytes(lib, coeff, is_luma)
    assert ours == theirs, (w, h, is_luma, density,
                            ours[:12].hex(), theirs[:12].hex())


def test_residual_large_values_and_dc_only():
    lib = _lib()
    for coeff in [
        np.array([[1000, 0, 0, 0]] + [[0] * 4] * 3, np.int32),
        np.array([[-32768, 32767, 3, 0]] + [[0] * 4] * 3, np.int32),
        np.eye(16, dtype=np.int32) * 500,
    ]:
        ours = _ours_bytes(coeff, True)
        theirs = _oracle_bytes(lib, coeff, True)
        assert ours == theirs, coeff[:2, :4]
