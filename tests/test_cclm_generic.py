"""Size-generic CCLM vs the host oracle-exact ops.cclm."""
import numpy as np
import jax.numpy as jnp
import pytest

from pmp_vvc_tpu.ops import cclm as C
from pmp_vvc_tpu.ops.cclm_generic import cclm_predict_generic

CASES = [
    # (cx, cy, cw, ch) chroma coords within a 128x96 chroma plane
    (8, 8, 8, 8),
    (0, 8, 4, 8),          # no left
    (8, 0, 8, 4),          # no above
    (0, 0, 16, 16),        # neither
    (2, 2, 2, 2),          # minimum block
    (8, 64, 16, 8),        # CTU top row (ly = 128)
    (32, 16, 4, 16),
    (16, 32, 16, 4),
]


def _refs_line(plane, cx, cy, cw, ch, pad_c):
    """(top, left) (2*pad_c+3,) with index 0 = corner (all-available)."""
    hh, ww = plane.shape
    top = np.zeros(2 * pad_c + 3, np.int64)
    left = np.zeros(2 * pad_c + 3, np.int64)
    top[0] = plane[max(cy - 1, 0), max(cx - 1, 0)]
    left[0] = top[0]
    for k in range(2 * pad_c + 2):
        top[1 + k] = plane[max(cy - 1, 0), min(cx + k, ww - 1)]
        left[1 + k] = plane[min(cy + k, hh - 1), max(cx - 1, 0)]
    return top, left


@pytest.mark.parametrize("cx,cy,cw,ch", CASES)
def test_cclm_generic_matches_host(cx, cy, cw, ch):
    rng = np.random.RandomState(cx * 7 + cy * 13 + cw)
    H, W = 192, 256
    ry = rng.randint(0, 1024, (H, W)).astype(np.int32)
    cu = rng.randint(0, 1024, (H // 2, W // 2)).astype(np.int32)
    cv = rng.randint(0, 1024, (H // 2, W // 2)).astype(np.int32)
    la, aa = cx > 0, cy > 0
    interior, dsa, dsl = C.downsample_luma(ry, cx, cy, cw, ch, la, aa, 128)
    pad_c = 16
    want = []
    for plane in (cu, cv):
        top, left = _refs_line(plane, cx, cy, cw, ch, pad_c)
        a, b, sh = C.lm_parameters(dsa, dsl, top, left, cw, ch, aa, la)
        want.append(C.cclm_pred(interior, a, b, sh))

    tus, lus = _refs_line(cu, cx, cy, cw, ch, pad_c)
    tvs, lvs = _refs_line(cv, cx, cy, cw, ch, pad_c)
    pu, pv = cclm_predict_generic(
        jnp.asarray(ry)[None], jnp.asarray([0]),
        jnp.asarray([cx]), jnp.asarray([cy]),
        jnp.asarray([cw]), jnp.asarray([ch]), pad_c=pad_c,
        top_u=jnp.asarray(tus)[None], left_u=jnp.asarray(lus)[None],
        top_v=jnp.asarray(tvs)[None], left_v=jnp.asarray(lvs)[None])
    assert np.array_equal(np.asarray(pu)[0, :ch, :cw], want[0]), "U"
    assert np.array_equal(np.asarray(pv)[0, :ch, :cw], want[1]), "V"
