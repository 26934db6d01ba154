"""Building blocks for the Down-Up-CNN partition predictors.

TPU-first conventions:
- NHWC activation layout (XLA's native TPU conv layout; channels on the
  128-lane minor dimension).
- All shapes static; every op lowers to XLA convolution / reduce-window /
  elementwise, which XLA fuses and tiles onto MXU/VPU.

Functional contracts mirror the reference nets' ops
(/root/reference/Model_QBD.py:23-44 ResidualBlock; zero pads :63-66;
max-pool/nearest-interpolate pyramid :84-87) without copying their torch
structure — the residual block here is a flax module with named convs so
checkpoint import is a pure name/axis remap.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


def zero_pad2d(x: jax.Array, left: int, right: int, top: int, bottom: int) -> jax.Array:
    """Zero-pad an NHWC tensor on the spatial dims."""
    return jnp.pad(x, ((0, 0), (top, bottom), (left, right), (0, 0)))


def max_pool2d(x: jax.Array, window: int) -> jax.Array:
    """Non-overlapping max pool over NHWC spatial dims (window == stride)."""
    return nn.max_pool(x, (window, window), strides=(window, window))


def nearest_upsample(x: jax.Array, factor: int) -> jax.Array:
    """Integer-factor nearest-neighbour upsample of an NHWC tensor.

    Equivalent to ``F.interpolate(x, scale_factor=factor)`` (mode='nearest')
    on NCHW in the reference; implemented as reshape+broadcast which XLA
    lowers to a cheap layout op.
    """
    n, h, w, c = x.shape
    x = x[:, :, None, :, None, :]
    x = jnp.broadcast_to(x, (n, h, factor, w, factor, c))
    return x.reshape(n, h * factor, w * factor, c)


class ResBlock(nn.Module):
    """conv-relu-conv residual block with optional 1x1 projection shortcut.

    Matches the reference ResidualBlock contract (Model_QBD.py:23-44):
    both convs bias-free, shortcut projection iff stride != 1 or
    channel count changes, ReLU after the residual add.
    """

    out_ch: int
    kernel: int
    stride: int = 1

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_ch = x.shape[-1]
        k = (self.kernel, self.kernel)
        y = nn.Conv(self.out_ch, k, strides=(self.stride, self.stride),
                    padding="SAME", use_bias=False, name="conv1")(x)
        y = nn.relu(y)
        y = nn.Conv(self.out_ch, k, strides=(1, 1),
                    padding="SAME", use_bias=False, name="conv2")(y)
        if self.stride != 1 or in_ch != self.out_ch:
            x = nn.Conv(self.out_ch, (1, 1), strides=(self.stride, self.stride),
                        use_bias=False, name="conv_sc")(x)
        return nn.relu(y + x)


class ResTrunk(nn.Module):
    """A sequence of ResBlocks; ``specs`` is a list of (out_ch, kernel)."""

    specs: Sequence[tuple[int, int]]

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        for i, (out_ch, kernel) in enumerate(self.specs):
            x = ResBlock(out_ch, kernel, name=f"block{i}")(x)
        return x
