"""Scalar quant/dequant properties (formula mirrors Quant.cpp exactly)."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from pmp_vvc_tpu.ops.quant import dequantize, quantize  # noqa: E402


@pytest.mark.parametrize("qp", [22, 27, 32, 37])
@pytest.mark.parametrize("w,h", [(4, 4), (16, 16), (32, 8), (64, 64)])
def test_roundtrip_error_scales_with_qp(qp, w, h):
    rng = np.random.RandomState(qp)
    c = rng.randint(-2000, 2000, (2, h, w)).astype(np.int32)
    lv = quantize(jnp.asarray(c), w=w, h=h, qp=qp)
    dq = np.asarray(dequantize(lv, w=w, h=h, qp=qp))
    # effective coefficient-domain step = dequant of level 1; intra
    # dead-zone rounding keeps |error| below one step
    one = np.zeros((1, h, w), np.int32)
    one[0, 0, 0] = 1
    step = int(np.asarray(dequantize(jnp.asarray(one), w=w, h=h, qp=qp))[0, 0, 0])
    assert np.abs(dq - c).max() <= step


def test_zero_maps_to_zero():
    z = jnp.zeros((1, 8, 8), jnp.int32)
    assert (np.asarray(quantize(z, w=8, h=8, qp=32)) == 0).all()
    assert (np.asarray(dequantize(z, w=8, h=8, qp=32)) == 0).all()


def test_sign_symmetry_of_dequant():
    c = jnp.asarray(np.arange(-100, 100).reshape(1, 10, 20), jnp.int32)
    dq = np.asarray(dequantize(c, w=20, h=10, qp=30))
    # dequant is odd: deq(-l) == -deq(l) when no rounding add asymmetry
    dq2 = np.asarray(dequantize(-c, w=20, h=10, qp=30))
    assert np.abs(dq + dq2).max() <= 1


def test_dead_zone_monotonic():
    """Larger |coef| never yields smaller |level|."""
    c = jnp.asarray(np.arange(0, 5000, 7)[None, None, :], jnp.int32)
    lv = np.asarray(quantize(c, w=c.shape[-1], h=1, qp=27))
    assert (np.diff(lv[0, 0]) >= 0).all()


@pytest.mark.parametrize("qp", [0, 12, 51, 63])
def test_extreme_qps_finite(qp):
    c = jnp.asarray(np.array([[[32767, -32768, 1, -1]]]), jnp.int32)
    lv = quantize(c, w=4, h=1, qp=qp)
    dq = dequantize(lv, w=4, h=1, qp=qp)
    assert np.isfinite(np.asarray(dq)).all()
