"""Transform kernels: properties + bit-exact parity vs the VTM oracle."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from pmp_vvc_tpu.ops.transforms import (  # noqa: E402
    DCT2, DCT8, DST7, core_matrix, forward_transform, inverse_transform,
    nonzero_out_size,
)
from tests.oracle.loader import c_int_array, get_oracle  # noqa: E402


def test_core_matrices_sanity():
    t4 = core_matrix(DCT2, 4)
    np.testing.assert_array_equal(t4[0], [64, 64, 64, 64])
    np.testing.assert_array_equal(t4[1], [83, 36, -36, -83])
    for kind, sizes in ((DCT2, (2, 4, 8, 16, 32, 64)),
                       (DST7, (4, 8, 16, 32)), (DCT8, (4, 8, 16, 32))):
        for n in sizes:
            t = core_matrix(kind, n).astype(np.int64)
            gram = t @ t.T
            diag = np.diag(gram)
            # near-orthogonal integer matrices, ||row||^2 ~ n * 64^2
            assert abs(diag - n * 64 * 64).max() < n * 64 * 3
            off = gram - np.diag(diag)
            assert np.abs(off).max() < diag.min() / 64


def test_dc_only_for_flat_block():
    x = jnp.full((1, 8, 8), 100, jnp.int32)
    c = np.asarray(forward_transform(x, DCT2, DCT2, bit_depth=10)).copy()
    assert c[0, 0, 0] != 0
    c[0, 0, 0] = 0
    assert (c == 0).all()


@pytest.mark.parametrize("w,h", [(4, 4), (8, 8), (16, 16), (32, 32),
                                 (4, 8), (16, 4), (32, 8), (64, 64),
                                 (64, 32), (8, 32)])
def test_roundtrip_error_bounded(w, h):
    rng = np.random.RandomState(0)
    x = rng.randint(-512, 512, (2, h, w)).astype(np.int32)
    c = forward_transform(jnp.asarray(x), DCT2, DCT2, bit_depth=10)
    r = np.asarray(inverse_transform(c, DCT2, DCT2, bit_depth=10))
    kept_w, kept_h = nonzero_out_size(DCT2, w), nonzero_out_size(DCT2, h)
    if (kept_w, kept_h) == (w, h):  # no zero-out -> near-lossless
        # 6-bit matrices give a few counts of rounding noise; a scale or
        # orientation bug would produce errors in the hundreds
        assert np.abs(r - x).max() <= 8, np.abs(r - x).max()
        assert np.abs(r - x).mean() < 2.5


@pytest.mark.parametrize("trh,trv", [(DCT2, DCT2), (DST7, DST7),
                                     (DCT8, DST7), (DST7, DCT8)])
@pytest.mark.parametrize("w,h", [(4, 4), (8, 8), (16, 16), (32, 32),
                                 (4, 16), (32, 4)])
def test_forward_matches_vtm_oracle(trh, trv, w, h):
    lib = get_oracle()
    if lib is None:
        pytest.skip("oracle unavailable")
    rng = np.random.RandomState(1)
    for bd in (8, 10):
        x = rng.randint(-(1 << bd) + 1, 1 << bd, (h, w)).astype(np.int32)
        ours = np.asarray(forward_transform(
            jnp.asarray(x[None]), trh, trv, bit_depth=bd))[0]
        src, src_p = c_int_array(x)
        dst, dst_p = c_int_array(np.zeros((h, w), np.int32))
        lib.oracle_fwd_transform(src_p, dst_p, w, h, trh, trv, bd)
        np.testing.assert_array_equal(ours, dst, err_msg=f"{trh},{trv},{w}x{h},bd{bd}")


@pytest.mark.parametrize("trh,trv", [(DCT2, DCT2), (DST7, DCT8)])
@pytest.mark.parametrize("w,h", [(4, 4), (8, 16), (32, 32), (64, 64),
                                 (64, 8)])
def test_inverse_matches_vtm_oracle(trh, trv, w, h):
    if trh != DCT2 and (w > 32 or h > 32):
        pytest.skip("MTS only up to 32")
    lib = get_oracle()
    if lib is None:
        pytest.skip("oracle unavailable")
    rng = np.random.RandomState(2)
    kept_w = nonzero_out_size(trh, w)
    kept_h = nonzero_out_size(trv, h)
    for bd in (8, 10):
        c = np.zeros((h, w), np.int32)
        c[:kept_h, :kept_w] = rng.randint(-5000, 5000, (kept_h, kept_w))
        ours = np.asarray(inverse_transform(
            jnp.asarray(c[None]), trh, trv, bit_depth=bd))[0]
        src, src_p = c_int_array(c)
        dst, dst_p = c_int_array(np.zeros((h, w), np.int32))
        lib.oracle_inv_transform(src_p, dst_p, w, h, trh, trv, bd)
        np.testing.assert_array_equal(ours, dst, err_msg=f"{trh},{trv},{w}x{h},bd{bd}")
