"""MRL prediction vs the VTM oracle (xPredIntraAng, ref lines 1/2)."""
import ctypes
import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/repo")
from tests.oracle.loader import get_oracle  # noqa: E402


@pytest.mark.parametrize("w,h", [(4, 4), (16, 16), (4, 16), (32, 8),
                                 (64, 64)])
@pytest.mark.parametrize("mri", [1, 2])
def test_mrl_all_angular_modes(w, h, mri):
    lib = get_oracle()
    if lib is None or not hasattr(lib, "oracle_intra_pred_mrl"):
        pytest.skip("oracle unavailable")
    lib.oracle_intra_pred_mrl.argtypes = \
        [ctypes.POINTER(ctypes.c_short)] * 3 + [ctypes.c_int] * 5
    from pmp_vvc_tpu.ops.intra import predict_mrl

    rng = np.random.RandomState(w * 7 + h + mri)
    top = rng.randint(0, 1024, (2 * w + 3 + mri,)).astype(np.int16)
    left = rng.randint(0, 1024, (2 * h + 3 + mri,)).astype(np.int16)
    tp = top.ctypes.data_as(ctypes.POINTER(ctypes.c_short))
    lp = left.ctypes.data_as(ctypes.POINTER(ctypes.c_short))
    for mode in range(2, 67):
        out = np.zeros(w * h, np.int16)
        lib.oracle_intra_pred_mrl(
            tp, lp, out.ctypes.data_as(ctypes.POINTER(ctypes.c_short)),
            w, h, mode, mri, 10)
        got = predict_mrl(top.astype(np.int64), left.astype(np.int64),
                          w=w, h=h, mode=mode, mri=mri)
        np.testing.assert_array_equal(out.reshape(h, w), got,
                                      err_msg=f"{w}x{h} m{mode} r{mri}")
