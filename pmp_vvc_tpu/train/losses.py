"""Training losses for the Down-Up-CNN.

Functional contracts: Train_QBD.py:35-90 — QP-dependent direction weighting
(``luma_weight_mat``/``chroma_weight_mat``), per-branch L1 terms and
residual-depth coupling terms.

Layout convention: NHWC. ``bt_label``/``dire_label`` are (N,16,16,3) with the
MTT-layer on the channel axis; branch outputs ``bd_i`` are (N,16,16,2) with
channels (mtt-depth, direction).
"""
from __future__ import annotations

from dataclasses import dataclass, field

import jax.numpy as jnp
import numpy as np

# Weight of the non-zero direction class per (QP index, MTT layer), derived by
# the reference from the 0/1 class ratio in the training set
# (Train_QBD.py:35-42). Rows: QP 22/27/32/37.
LUMA_WEIGHT_MAT = 0.5 * np.array([[1.0, 0.73, 0.15],
                                  [2.43, 0.35, 0.10],
                                  [0.96, 0.23, 0.07],
                                  [0.59, 0.16, 0.05]])
CHROMA_WEIGHT_MAT = 0.5 * np.array([[17.83, 0.49, 0.11],
                                    [1.20, 0.25, 0.07],
                                    [0.58, 0.17, 0.05],
                                    [0.38, 0.12, 0.04]])

QPS = (22, 27, 32, 37)


@dataclass(frozen=True)
class LossWeights:
    """Per-term lambdas (Train_QBD.py:448-457 defaults)."""

    q: float = 1.0
    b: tuple = (0.8, 1.0, 1.2)
    d: tuple = (1.0, 1.0, 1.0)
    resb: tuple = (0.5, 0.5, 0.5)


def _l1(a, b):
    return jnp.mean(jnp.abs(a - b))


def direction_weights(dire_label, qp: int, is_luma: bool):
    """Per-layer weights w_i = dire_i^2 + weight_mat[qp][i] (w_0 = 1 at QP22)."""
    mat = LUMA_WEIGHT_MAT if is_luma else CHROMA_WEIGHT_MAT
    qi = QPS.index(qp)
    ws = [dire_label[..., i:i + 1] ** 2 + mat[qi][i] for i in range(3)]
    if qp == 22:
        ws[0] = jnp.ones_like(ws[0])
    return ws


def msbd_loss(bd_outs, bt_label, dire_label, *, qp: int, is_luma: bool,
              w: LossWeights = LossWeights()):
    """MTT pretrain loss (Train_QBD.py:44-66). ``bd_outs`` = (bd0, bd1, bd2)."""
    wd = direction_weights(dire_label, qp, is_luma)
    loss = 0.0
    prev_depth = None
    prev_label = None
    for i, bd in enumerate(bd_outs):
        depth, dire = bd[..., 0:1], bd[..., 1:2]
        bt_i = bt_label[..., i:i + 1]
        d_i = dire_label[..., i:i + 1]
        loss = loss + w.b[i] * _l1(depth, bt_i)
        loss = loss + w.d[i] * _l1(wd[i] * dire, wd[i] * d_i)
        if i == 0:
            loss = loss + w.resb[0] * _l1(wd[0] * depth, wd[0] * bt_i)
        else:
            loss = loss + w.resb[i] * _l1(wd[i] * (depth - prev_depth),
                                          wd[i] * (bt_i - prev_label))
        prev_depth, prev_label = depth, bt_i
    return loss


def qbd_loss(qt_out, bd_outs, qt_label, bt_label, dire_label, *, qp: int,
             is_luma: bool, w: LossWeights = LossWeights()):
    """Joint loss (Train_QBD.py:68-90): QT L1 + MSBD terms."""
    return w.q * _l1(qt_out, qt_label) + msbd_loss(
        bd_outs, bt_label, dire_label, qp=qp, is_luma=is_luma, w=w)
