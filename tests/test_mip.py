"""MIP prediction vs the VTM oracle (MatrixIntraPrediction.cpp)."""
import ctypes
import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/repo")
from tests.oracle.loader import get_oracle  # noqa: E402


@pytest.mark.parametrize("w,h", [(4, 4), (8, 8), (4, 16), (16, 4),
                                 (16, 16), (8, 32), (64, 64), (16, 64)])
def test_mip_all_modes_bit_exact(w, h):
    lib = get_oracle()
    if lib is None or not hasattr(lib, "oracle_mip_pred"):
        pytest.skip("oracle unavailable")
    import jax.numpy as jnp

    from pmp_vvc_tpu.ops import mip as mip_ops

    rng = np.random.RandomState(w * 100 + h)
    top = rng.randint(0, 1024, (2 * w + 3,)).astype(np.int16)
    left = rng.randint(0, 1024, (2 * h + 3,)).astype(np.int16)
    ours = np.asarray(mip_ops.predict_mip_all(
        jnp.asarray(top, jnp.int32), jnp.asarray(left, jnp.int32),
        w=w, h=h, bit_depth=10))
    n = mip_ops.num_modes(w, h)
    tp = top.ctypes.data_as(ctypes.POINTER(ctypes.c_short))
    lp = left.ctypes.data_as(ctypes.POINTER(ctypes.c_short))
    for t in (0, 1):
        for m in range(n):
            out = np.zeros(w * h, np.int32)
            lib.oracle_mip_pred(
                tp, lp, out.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
                w, h, m, t, 10)
            np.testing.assert_array_equal(out.reshape(h, w),
                                          ours[t * n + m],
                                          err_msg=f"{w}x{h} m{m} t{t}")
