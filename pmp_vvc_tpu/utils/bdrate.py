"""Bjøntegaard-delta metrics (BD-rate / BD-PSNR).

The reference reports quality as BD-rate over the 4 CTC QPs {22,27,32,37}
(paper protocol; the repo itself ships no calculator — Analyze.h:191 only
prints per-run PSNR/bitrate).  This is the standard cubic-fit Bjøntegaard
computation (VCEG-M33) used by JVET common test conditions.
"""
from __future__ import annotations

import numpy as np


def _bd_fit(rate, psnr):
    lr = np.log(np.asarray(rate, np.float64))
    p = np.asarray(psnr, np.float64)
    return lr, p


def bd_rate(rate_anchor, psnr_anchor, rate_test, psnr_test) -> float:
    """BD-rate (%) of test vs anchor: negative = test saves rate.

    Cubic polynomial fit of log-rate as a function of PSNR, integrated
    over the overlapping PSNR interval (VCEG-M33).
    """
    la, pa = _bd_fit(rate_anchor, psnr_anchor)
    lt, pt = _bd_fit(rate_test, psnr_test)
    ca = np.polyfit(pa, la, 3)
    ct = np.polyfit(pt, lt, 3)
    lo = max(pa.min(), pt.min())
    hi = min(pa.max(), pt.max())
    if hi <= lo:
        raise ValueError("no PSNR overlap between curves")
    ia = np.polyint(ca)
    it = np.polyint(ct)
    avg_a = (np.polyval(ia, hi) - np.polyval(ia, lo)) / (hi - lo)
    avg_t = (np.polyval(it, hi) - np.polyval(it, lo)) / (hi - lo)
    return float((np.exp(avg_t - avg_a) - 1.0) * 100.0)


def bd_psnr(rate_anchor, psnr_anchor, rate_test, psnr_test) -> float:
    """BD-PSNR (dB) of test vs anchor: positive = test gains quality."""
    la, pa = _bd_fit(rate_anchor, psnr_anchor)
    lt, pt = _bd_fit(rate_test, psnr_test)
    ca = np.polyfit(la, pa, 3)
    ct = np.polyfit(lt, pt, 3)
    lo = max(la.min(), lt.min())
    hi = min(la.max(), lt.max())
    if hi <= lo:
        raise ValueError("no rate overlap between curves")
    ia = np.polyint(ca)
    it = np.polyint(ct)
    avg_a = (np.polyval(ia, hi) - np.polyval(ia, lo)) / (hi - lo)
    avg_t = (np.polyval(it, hi) - np.polyval(it, lo)) / (hi - lo)
    return float(avg_t - avg_a)
