"""Distortion kernels vs the VTM oracle and basic properties."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from pmp_vvc_tpu.ops.distortion import sad, satd, sse  # noqa: E402
from tests.oracle.loader import c_short_array, get_oracle  # noqa: E402


@pytest.mark.parametrize("w,h", [(4, 4), (8, 8), (16, 16), (32, 32),
                                 (64, 64), (8, 4), (4, 8), (16, 8), (8, 16),
                                 (32, 8), (8, 32), (16, 4), (4, 16),
                                 (64, 16), (32, 16)])
@pytest.mark.parametrize("bd", [8, 10])
def test_satd_matches_vtm(w, h, bd):
    lib = get_oracle()
    if lib is None or not hasattr(lib, "oracle_satd"):
        pytest.skip("oracle unavailable")
    rng = np.random.RandomState(w * h + bd)
    hi = (1 << bd) - 1
    org = rng.randint(0, hi, (3, h, w)).astype(np.int16)
    cur = rng.randint(0, hi, (3, h, w)).astype(np.int16)
    ours = np.asarray(satd(jnp.asarray(org.astype(np.int32)),
                           jnp.asarray(cur.astype(np.int32)), bit_depth=bd))
    for i in range(3):
        o, op = c_short_array(org[i])
        c, cp = c_short_array(cur[i])
        ref = lib.oracle_satd(op, cp, w, h, bd)
        assert int(ours[i]) == ref, (w, h, bd, i, int(ours[i]), ref)


def test_satd_zero_for_identical():
    x = jnp.asarray(np.random.RandomState(0).randint(0, 1023, (2, 16, 16)))
    assert (np.asarray(satd(x, x)) == 0).all()


def test_sad_sse_basic():
    org = jnp.asarray([[[10, 20], [30, 40]]], jnp.int32)
    cur = jnp.asarray([[[11, 18], [30, 44]]], jnp.int32)
    assert int(sad(org, cur, bit_depth=8)[0]) == 1 + 2 + 0 + 4
    assert int(sse(org, cur, bit_depth=8)[0]) == 1 + 4 + 0 + 16
    # full-precision distortion: bit depth does not rescale (TypeDef.h:379)
    assert int(sse(org, cur, bit_depth=10)[0]) == 1 + 4 + 0 + 16
