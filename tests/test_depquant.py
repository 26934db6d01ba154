"""Dependent quantization: residual syntax vs oracle + greedy/dequant."""
import ctypes
import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/repo")
from tests.oracle.loader import get_oracle  # noqa: E402


def _lib():
    lib = get_oracle()
    if lib is None or not hasattr(lib, "oracle_residual_code_dq"):
        pytest.skip("oracle unavailable")
    lib.oracle_residual_code_dq.restype = ctypes.c_int
    lib.oracle_residual_code_dq.argtypes = \
        [ctypes.POINTER(ctypes.c_int)] + [ctypes.c_int] * 6 \
        + [ctypes.POINTER(ctypes.c_ubyte)]
    return lib


@pytest.mark.parametrize("w,h", [(4, 4), (8, 8), (16, 16), (32, 8),
                                 (64, 64)])
def test_residual_dep_quant_byte_exact(w, h):
    """State-dependent sig contexts + rice pos0 (CoeffCodingContext with
    stateTransTab 32040) must match CABACWriter::residual_coding."""
    from pmp_vvc_tpu.codec.cabac import BinEncoder, ContextStore
    from pmp_vvc_tpu.codec.residual import ResidualCoder

    lib = _lib()
    rng = np.random.RandomState(w + h)
    for density in (0.05, 0.4, 0.9):
        for is_luma in (1, 0):
            coeff = (rng.randn(h, w) * 9
                     * (rng.rand(h, w) < density)).astype(np.int32)
            coeff[:, 32:] = 0
            coeff[32:, :] = 0
            if not coeff.any():
                coeff[0, 0] = 1
            c = np.ascontiguousarray(coeff, np.int32)
            out = np.zeros(w * h * 4 + 256, np.uint8)
            n = lib.oracle_residual_code_dq(
                c.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), w, h,
                is_luma, 32, 0, 1,
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)))
            enc = BinEncoder(ContextStore.standard_init(32, 0))
            rc = ResidualCoder(enc, dep_quant=True)
            rc.code(coeff, is_luma=bool(is_luma))
            enc.encode_bin_trm(1)
            assert enc.finish() == bytes(out[:n]), (w, h, is_luma, density)


def test_greedy_levels_roundtrip_states():
    """dep_dequant must replay the exact states the levels imply, and
    greedy quantization must reduce distortion vs zero."""
    from pmp_vvc_tpu.codec.residual import grouped_scan
    from pmp_vvc_tpu.ops.depquant import dep_dequant, dep_quant_greedy

    rng = np.random.RandomState(0)
    w = h = 16
    scan = grouped_scan(w, h)[:, 0]
    coef = (rng.randn(h, w) * 2000).astype(np.int64)
    lev = dep_quant_greedy(coef, scan, w=w, h=h, qp=44)
    rec = dep_dequant(lev, scan, w=w, h=h, qp=44)
    assert ((rec - coef) ** 2).sum() < (coef ** 2).sum()
    # zero block stays zero
    z = dep_dequant(np.zeros((h, w), np.int64), scan, w=w, h=h, qp=44)
    assert not z.any()
