"""Down-Up-CNN partition predictors (flax, NHWC, TPU-first).

Four nets with the reference's functional contracts
(/root/reference/Model_QBD.py):

- LumaQNet      : (N,68,68,1) luma CTU+halo -> (N,8,8,1)  QT-depth map
- LumaMSBDNet   : ((N,68,68,1), (N,8,8,1))  -> 3 x (N,16,16,2) (mtt-depth, direction)
- ChromaQNet    : (N,34,34,3) (pooled-Y,U,V) -> (N,8,8,1)
- ChromaMSBDNet : ((N,34,34,3), (N,8,8,1))  -> 3 x (N,16,16,2)

Design notes (TPU):
- NHWC layout end to end; convs lower to XLA TPU convolutions on the MXU.
- The reference's in-place residual coupling between output branches
  (Model_QBD.py:146,153 ``out1[:,0:1] += out0[:,0:1]``) is expressed
  functionally via concat of channel slices.
- Valid-padding stem convs consume the same asymmetric zero-pads as the
  reference (right/bottom for the stem, left/top for the upsampled QT map)
  so the 4-px top-left halo geometry is preserved exactly.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import ResBlock, ResTrunk, max_pool2d, nearest_upsample, zero_pad2d


class LumaQNet(nn.Module):
    """Luma QT-depth predictor. Contract: Model_QBD.py:59-98."""

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:  # (N,68,68,1)
        x = zero_pad2d(x, 0, 4, 0, 4)                                   # 72x72
        x = nn.relu(nn.Conv(32, (9, 9), padding="VALID", name="conv_q1")(x))  # 64x64x32
        x = max_pool2d(ResBlock(64, 5, name="resblock_q1")(x), 2)       # 32x32x64
        x = max_pool2d(ResBlock(64, 5, name="resblock_q2")(x), 2)       # 16x16x64
        x = ResBlock(32, 3, name="resblock_q3")(x)                      # 16x16x32
        p1 = nearest_upsample(max_pool2d(x, 2), 2)
        p2 = nearest_upsample(max_pool2d(x, 4), 4)
        p3 = nearest_upsample(max_pool2d(x, 8), 8)
        x = jnp.concatenate([x, p1, p2, p3], axis=-1)                   # 16x16x128
        x = ResBlock(32, 3, name="resblock_q4")(x)
        x = max_pool2d(ResBlock(32, 3, name="resblock_q5")(x), 2)       # 8x8x32
        x = ResBlock(8, 3, name="resblock_q6")(x)
        return nn.Conv(1, (3, 3), padding="SAME", name="conv_q2")(x)    # 8x8x1


class ChromaQNet(nn.Module):
    """Chroma QT-depth predictor. Contract: Model_QBD.py:157-196."""

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:  # (N,34,34,3)
        x = zero_pad2d(x, 0, 2, 0, 2)                                   # 36x36
        x = nn.relu(nn.Conv(32, (5, 5), padding="VALID", name="conv_q1")(x))  # 32x32x32
        x = ResBlock(64, 3, name="resblock_q1")(x)                      # 32x32x64
        x = max_pool2d(ResBlock(64, 3, name="resblock_q2")(x), 2)       # 16x16x64
        x = ResBlock(32, 3, name="resblock_q3")(x)
        p1 = nearest_upsample(max_pool2d(x, 2), 2)
        p2 = nearest_upsample(max_pool2d(x, 4), 4)
        p3 = nearest_upsample(max_pool2d(x, 8), 8)
        x = jnp.concatenate([x, p1, p2, p3], axis=-1)                   # 16x16x128
        x = ResBlock(32, 3, name="resblock_q4")(x)
        x = max_pool2d(ResBlock(32, 3, name="resblock_q5")(x), 2)       # 8x8x32
        x = ResBlock(8, 3, name="resblock_q6")(x)
        return nn.Conv(1, (3, 3), padding="SAME", name="conv_q2")(x)    # 8x8x1


_TRUNK_M1 = ((64, 5), (64, 3), (64, 3), (64, 3), (64, 3), (64, 3))
_TRUNK_M2 = ((64, 3), (64, 3), (64, 3), (64, 3))
_TRUNK_B = ((32, 3), (16, 3), (8, 3))
_TRUNK_ATT = ((32, 3), (64, 3))


class _MSBDCore(nn.Module):
    """Shared multi-scale depth+direction head ("Up" part of Down-Up-CNN).

    Three output branches B1/B2/B3 with attention trunks gating the main
    trunk features, and residual inter-branch coupling of the depth channel.
    Contract: Model_QBD.py:100-155 (luma) / :198-253 (chroma).
    """

    halo: int            # 4 for luma, 2 for chroma
    qt_up: int           # upsample factor taking 8x8 QT map to input size
    stem_k: tuple        # (square, tall, wide) stem kernel sizes
    pool_m1: bool        # luma pools after trunk_M1; chroma does not

    @nn.compact
    def __call__(self, x: jax.Array, qt: jax.Array):
        k, h = self.stem_k, self.halo
        qt_full = zero_pad2d(nearest_upsample(qt, self.qt_up), h, 0, h, 0)
        x2 = jnp.concatenate([x, qt_full], axis=-1)
        s1 = nn.relu(nn.Conv(16, (k[0], k[0]), padding="VALID", name="conv_b1_1")(
            zero_pad2d(x2, 0, h, 0, h)))
        s2 = nn.relu(nn.Conv(8, (k[1], k[0]), padding="VALID", name="conv_b1_2")(
            zero_pad2d(x2, 0, h, 0, 0)))
        s3 = nn.relu(nn.Conv(8, (k[0], k[1]), padding="VALID", name="conv_b1_3")(
            zero_pad2d(x2, 0, 0, 0, h)))
        x3 = jnp.concatenate([s1, s2, s3], axis=-1)          # 32ch @ 64(32)^2

        m1 = ResTrunk(_TRUNK_M1, name="trunk_M1")(x3)
        x4 = max_pool2d(m1, 2) if self.pool_m1 else m1       # 64ch @ 32x32
        x5 = max_pool2d(ResTrunk(_TRUNK_M2, name="trunk_M2")(x4), 2)  # 64ch @ 16x16

        # Branch 1
        b1 = ResTrunk(_TRUNK_B, name="trunk_B1")(x5)
        out0 = nn.Conv(2, (3, 3), padding="SAME", name="conv_B1")(b1)   # (N,16,16,2)

        # Branch 2: attention over (qt, out0)
        att_in0 = jnp.concatenate([nearest_upsample(qt, 2), out0], axis=-1)
        att0 = ResTrunk(_TRUNK_ATT, name="trunk_Att1")(att_in0)
        b2 = ResTrunk(_TRUNK_B, name="trunk_B2")(x5 * att0)
        out1 = nn.Conv(2, (3, 3), padding="SAME", name="conv_B2")(b2)
        out1 = jnp.concatenate(
            [out1[..., 0:1] + out0[..., 0:1], out1[..., 1:2]], axis=-1)

        # Branch 3: attention at 32x32 over (qt, out1)
        att_in1 = jnp.concatenate(
            [nearest_upsample(qt, 4), nearest_upsample(out1, 2)], axis=-1)
        att1 = ResTrunk(_TRUNK_ATT, name="trunk_Att2")(att_in1)
        b3 = max_pool2d(ResTrunk(_TRUNK_B, name="trunk_B3")(x4 * att1), 2)
        out2 = nn.Conv(2, (3, 3), padding="SAME", name="conv_B3")(b3)
        out2 = jnp.concatenate(
            [out2[..., 0:1] + out1[..., 0:1], out2[..., 1:2]], axis=-1)

        return out0, out1, out2


class LumaMSBDNet(nn.Module):
    """Luma MTT depth+direction predictor. Contract: Model_QBD.py:100-155."""

    @nn.compact
    def __call__(self, x: jax.Array, qt: jax.Array):
        return _MSBDCore(halo=4, qt_up=8, stem_k=(9, 5), pool_m1=True,
                         name="core")(x, qt)


class ChromaMSBDNet(nn.Module):
    """Chroma MTT depth+direction predictor. Contract: Model_QBD.py:198-253."""

    @nn.compact
    def __call__(self, x: jax.Array, qt: jax.Array):
        return _MSBDCore(halo=2, qt_up=4, stem_k=(5, 3), pool_m1=False,
                         name="core")(x, qt)
