"""Intra prediction vs the VTM oracle, plus reference-prep properties."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from pmp_vvc_tpu.ops.intra import (  # noqa: E402
    fill_reference_samples, filter_reference_samples, mode_params,
    predict_block, wide_angle,
)
from tests.oracle.loader import c_short_array, get_oracle  # noqa: E402

ALL_MODES = tuple(range(67))


def _rand_refs(rng, w, h, bd=10):
    hi = (1 << bd) - 1
    top = rng.randint(0, hi, (1, 2 * w + 3)).astype(np.int32)
    left = rng.randint(0, hi, (1, 2 * h + 3)).astype(np.int32)
    left[:, 0] = top[:, 0]  # shared corner
    # replication slots
    top[:, -2:] = top[:, -3:-2]
    left[:, -2:] = left[:, -3:-2]
    return top, left


def test_wide_angle_mapping():
    assert wide_angle(8, 8, 2) == 2
    assert wide_angle(16, 8, 3) == 3 + 65   # wide-angle remap low modes
    assert wide_angle(8, 16, 66) == 66 - 65
    assert wide_angle(8, 8, 0) == 0


@pytest.mark.parametrize("w,h", [(4, 4), (8, 8), (16, 16), (32, 32),
                                 (64, 64), (8, 4), (4, 8), (16, 4),
                                 (32, 8), (4, 32), (16, 64)])
def test_luma_all_modes_match_vtm(w, h):
    lib = get_oracle()
    if lib is None or not hasattr(lib, "oracle_intra_pred"):
        pytest.skip("oracle unavailable")
    rng = np.random.RandomState(w * 131 + h)
    top, left = _rand_refs(rng, w, h)
    top_f, left_f = filter_reference_samples(jnp.asarray(top), jnp.asarray(left))
    ours = np.asarray(predict_block(
        jnp.asarray(top), jnp.asarray(left), top_f, left_f,
        w=w, h=h, modes=ALL_MODES, is_luma=True, bit_depth=10))[0]

    t16, tp = c_short_array(top[0])
    l16, lp = c_short_array(left[0])
    for mode in ALL_MODES:
        out, op = c_short_array(np.zeros((h, w), np.int16))
        lib.oracle_intra_pred(tp, lp, op, w, h, mode, 10, 1)
        np.testing.assert_array_equal(
            ours[mode], out, err_msg=f"mode {mode} {w}x{h}")


@pytest.mark.parametrize("w,h", [(4, 4), (8, 8), (16, 8), (8, 32)])
def test_chroma_modes_match_vtm(w, h):
    lib = get_oracle()
    if lib is None or not hasattr(lib, "oracle_intra_pred"):
        pytest.skip("oracle unavailable")
    rng = np.random.RandomState(w * 7 + h)
    top, left = _rand_refs(rng, w, h)
    top_j, left_j = jnp.asarray(top), jnp.asarray(left)
    modes = (0, 1, 18, 50, 66, 34, 2, 40)
    ours = np.asarray(predict_block(
        top_j, left_j, top_j, left_j,
        w=w, h=h, modes=modes, is_luma=False, bit_depth=10))[0]
    t16, tp = c_short_array(top[0])
    l16, lp = c_short_array(left[0])
    for i, mode in enumerate(modes):
        out, op = c_short_array(np.zeros((h, w), np.int16))
        lib.oracle_intra_pred(tp, lp, op, w, h, mode, 10, 0)
        np.testing.assert_array_equal(
            ours[i], out, err_msg=f"chroma mode {mode} {w}x{h}")


def test_fill_reference_all_available():
    rng = np.random.RandomState(0)
    w = h = 8
    top_raw = jnp.asarray(rng.randint(0, 1023, (2, 2 * w)))
    left_raw = jnp.asarray(rng.randint(0, 1023, (2, 2 * h)))
    corner = jnp.asarray(rng.randint(0, 1023, (2,)))
    ones = jnp.ones((2, 2 * w), bool)
    top, left = fill_reference_samples(
        top_raw, left_raw, ones, jnp.ones((2, 2 * h), bool),
        jnp.ones((2,), bool), corner)
    np.testing.assert_array_equal(np.asarray(top)[:, 1:2 * w + 1], top_raw)
    np.testing.assert_array_equal(np.asarray(left)[:, 1:2 * h + 1], left_raw)
    np.testing.assert_array_equal(np.asarray(top)[:, 0], corner)
    np.testing.assert_array_equal(np.asarray(top)[:, -1], top_raw[:, -1])


def test_fill_reference_none_available():
    w = h = 4
    z = jnp.zeros((1, 2 * w), jnp.int32)
    f = jnp.zeros((1, 2 * w), bool)
    top, left = fill_reference_samples(
        z, z, f, f, jnp.zeros((1,), bool), jnp.zeros((1,), jnp.int32),
        bit_depth=10)
    assert (np.asarray(top) == 512).all()
    assert (np.asarray(left) == 512).all()


def test_fill_reference_partial_padding():
    """Top unavailable -> padded from corner/left chain (spec substitution)."""
    w = h = 4
    rng = np.random.RandomState(1)
    top_raw = jnp.asarray(rng.randint(0, 1023, (1, 2 * w)))
    left_raw = jnp.asarray(rng.randint(0, 1023, (1, 2 * h)))
    corner = jnp.asarray([700])
    top, left = fill_reference_samples(
        top_raw, left_raw, jnp.zeros((1, 2 * w), bool),
        jnp.ones((1, 2 * h), bool), jnp.ones((1,), bool), corner)
    # top should replicate the corner (last available in scan order)
    assert (np.asarray(top)[0, 1:] == 700).all()
    np.testing.assert_array_equal(np.asarray(left)[0, 1:2 * h + 1],
                                  np.asarray(left_raw)[0])
