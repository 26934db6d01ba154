"""Size-generic MIP vs the static oracle-exact predictor."""
import numpy as np
import jax.numpy as jnp
import pytest

from pmp_vvc_tpu.ops.mip import num_modes, predict_mip_all
from pmp_vvc_tpu.ops.mip_generic import MAX_MODES, predict_mip_generic

SIZES = [(4, 4), (4, 8), (8, 4), (8, 8), (4, 16), (16, 4), (8, 16),
         (16, 16), (8, 32), (32, 8), (32, 32), (16, 64), (64, 64)]


@pytest.mark.parametrize("w,h", SIZES)
def test_mip_generic_matches_static(w, h):
    pad = 32 if max(w, h) <= 32 else 64
    rng = np.random.RandomState(w * 131 + h)
    top = rng.randint(0, 1024, (2 * pad + 3,)).astype(np.int32)
    left = rng.randint(0, 1024, (2 * pad + 3,)).astype(np.int32)
    want = np.asarray(predict_mip_all(jnp.asarray(top), jnp.asarray(left),
                                      w=w, h=h))          # (2M, h, w)
    got, nm = predict_mip_generic(jnp.asarray(top)[None],
                                  jnp.asarray(left)[None],
                                  jnp.asarray([w]), jnp.asarray([h]),
                                  pad=pad)
    got = np.asarray(got)[0]
    n = num_modes(w, h)
    assert int(nm[0]) == n
    for t in range(2):
        for m in range(n):
            assert np.array_equal(got[t * MAX_MODES + m, :h, :w],
                                  want[t * n + m]), (t, m)


def test_mip_generic_batched_mixed_sizes():
    rng = np.random.RandomState(0)
    pad = 32
    sizes = [(4, 4), (8, 8), (16, 32), (32, 16)]
    tops = rng.randint(0, 1024, (len(sizes), 2 * pad + 3)).astype(np.int32)
    lefts = rng.randint(0, 1024, (len(sizes), 2 * pad + 3)).astype(np.int32)
    ws = jnp.asarray([s[0] for s in sizes])
    hs = jnp.asarray([s[1] for s in sizes])
    got, nm = predict_mip_generic(jnp.asarray(tops), jnp.asarray(lefts),
                                  ws, hs, pad=pad)
    for b, (w, h) in enumerate(sizes):
        want = np.asarray(predict_mip_all(jnp.asarray(tops[b]),
                                          jnp.asarray(lefts[b]),
                                          w=w, h=h))
        n = num_modes(w, h)
        for t in range(2):
            for m in range(n):
                assert np.array_equal(
                    np.asarray(got)[b, t * MAX_MODES + m, :h, :w],
                    want[t * n + m]), (b, t, m)
