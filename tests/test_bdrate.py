import numpy as np
import pytest

from pmp_vvc_tpu.utils.bdrate import bd_psnr, bd_rate


def test_identical_curves_zero():
    r = [100, 200, 400, 800]
    p = [30, 33, 36, 39]
    assert abs(bd_rate(r, p, r, p)) < 1e-9
    assert abs(bd_psnr(r, p, r, p)) < 1e-9


def test_known_shift():
    # test curve = anchor at exactly 10% less rate at equal PSNR
    r = np.array([100, 200, 400, 800], float)
    p = [30, 33, 36, 39]
    got = bd_rate(r, p, r * 0.9, p)
    assert abs(got - (-10.0)) < 0.2


def test_psnr_shift():
    r = [100, 200, 400, 800]
    p = np.array([30, 33, 36, 39], float)
    got = bd_psnr(r, p, r, p + 0.5)
    assert abs(got - 0.5) < 0.05


def test_no_overlap_raises():
    with pytest.raises(ValueError):
        bd_rate([100, 200, 300, 400], [30, 31, 32, 33],
                [1000, 2000, 3000, 4000], [40, 41, 42, 43])
