"""VVC primary transforms (DCT-II / DST-VII / DCT-VIII) as batched matmuls.

Bit-exact integer semantics of the standard / VTM pipeline
(TrQuant.cpp:806-846 forward, :848-893 inverse; 6-bit core matrices,
``g_transformMatrixShift = {6,6}``, ``maxLog2TrDynamicRange = 15``):

forward:  C = rs2( Tv  @ rs1( X @ Th^T ) )         rs = round-shift
inverse:  R = clip_pel( rs2'( clip15( rs1'( Tv^T @ C ) ) @ Th ) )

with  s1  = log2(W) + bitDepth + 6 - 15,   s2  = log2(H) + 6
      s1' = 7,                             s2' = 20 - bitDepth

The core matrices are normative H.266 constants loaded from
``codec/data/transform_cores.npz`` (see tools/extract_vtm_tables.py).
High-frequency zero-out: DCT2 keeps 32 of 64, DST7/DCT8 keep 16 of 32
coefficients per dimension (TrQuant.cpp:777-804) — expressed here by
slicing the transform matrices, which also skips the dead MACs.

All math is int32; lowers to XLA integer dot_general. (A split-f32 MXU
formulation is a planned optimization; semantics stay identical.)
"""
from __future__ import annotations

import functools
import pathlib

import jax
import jax.numpy as jnp
import numpy as np

DATA = pathlib.Path(__file__).resolve().parent.parent / "codec" / "data"

# trType codes follow the standard's order (mtsIdx mapping): DCT2=0, DCT8=1, DST7=2
DCT2, DCT8, DST7 = 0, 1, 2
_KIND_NAME = {DCT2: "dct2", DST7: "dst7", DCT8: "dct8"}

MAX_LOG2_DYN_RANGE = 15
COEFF_MIN = -(1 << MAX_LOG2_DYN_RANGE)
COEFF_MAX = (1 << MAX_LOG2_DYN_RANGE) - 1
MATRIX_SHIFT = 6


@functools.cache
def _cores() -> dict:
    with np.load(DATA / "transform_cores.npz") as z:
        return {k: z[k] for k in z.files}


@functools.cache
def core_matrix(kind: int, n: int) -> np.ndarray:
    """(n, n) int32 core matrix; rows are basis vectors."""
    return _cores()[f"{_KIND_NAME[kind]}_{n}"].astype(np.int32)


def nonzero_out_size(kind: int, n: int) -> int:
    """Coefficients kept per dimension (zero-out rule, TrQuant.cpp:777)."""
    if kind == DCT2:
        return min(n, 32)
    return min(n, 16)


def _rshift(x, s):
    add = (1 << (s - 1)) if s > 0 else 0
    return (x + add) >> s if s > 0 else x << (-s)


@functools.partial(jax.jit, static_argnames=("kind_h", "kind_v", "bit_depth"))
def forward_transform(x: jax.Array, kind_h: int = DCT2, kind_v: int = DCT2,
                      bit_depth: int = 10) -> jax.Array:
    """Batched 2-D forward transform.

    x: (..., H, W) int32 residual -> (..., H, W) int32 coeffs
    ([vfreq, hfreq]; zeroed-out region stays zero).
    """
    h, w = x.shape[-2], x.shape[-1]
    if w == 1 or h == 1:
        # 1-D transform (ISP 1xN/Nx1 sub-TUs, TrQuant.cpp:860-876):
        # single stage with the first-stage shift over the coded dim
        n = h if w == 1 else w
        kind = kind_v if w == 1 else kind_h
        t = jnp.asarray(core_matrix(kind, n))
        k = nonzero_out_size(kind, n)
        s = (n.bit_length() - 1) + bit_depth + MATRIX_SHIFT \
            - MAX_LOG2_DYN_RANGE
        ax = -2 if w == 1 else -1
        v = jnp.moveaxis(x.astype(jnp.int32), ax, -1)
        o = _rshift(jax.lax.dot_general(
            v, t[:k].T, (((v.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32), s)
        out = jnp.zeros(v.shape[:-1] + (n,), jnp.int32).at[..., :k].set(o)
        return jnp.moveaxis(out, -1, ax)
    th = jnp.asarray(core_matrix(kind_h, w))
    tv = jnp.asarray(core_matrix(kind_v, h))
    kw, kh = nonzero_out_size(kind_h, w), nonzero_out_size(kind_v, h)
    th = th[:kw]                       # keep only surviving hfreqs
    tv = tv[:kh]
    s1 = (w.bit_length() - 1) + bit_depth + MATRIX_SHIFT - MAX_LOG2_DYN_RANGE
    s2 = (h.bit_length() - 1) + MATRIX_SHIFT

    x = x.astype(jnp.int32)
    t1 = _rshift(
        jax.lax.dot_general(x, th.T, (((x.ndim - 1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32), s1)
    # t1: (..., H, kw); vertical: Tv @ t1 over H axis
    t2 = _rshift(
        jax.lax.dot_general(tv, t1, (((1,), (t1.ndim - 2,)), ((), ())),
                            preferred_element_type=jnp.int32), s2)
    # t2: (kh, ..., kw) -> move axis back
    t2 = jnp.moveaxis(t2, 0, -2)
    out = jnp.zeros(x.shape[:-2] + (h, w), jnp.int32)
    return out.at[..., :kh, :kw].set(t2)


@functools.partial(jax.jit, static_argnames=("kind_h", "kind_v", "bit_depth"))
def inverse_transform(c: jax.Array, kind_h: int = DCT2, kind_v: int = DCT2,
                      bit_depth: int = 10) -> jax.Array:
    """Batched 2-D inverse transform: (..., H, W) coeffs -> residual."""
    h, w = c.shape[-2], c.shape[-1]
    if w == 1 or h == 1:
        # 1-D inverse (TrQuant.cpp:889-902): shift+1 = 21 - bitDepth
        n = h if w == 1 else w
        kind = kind_v if w == 1 else kind_h
        t = jnp.asarray(core_matrix(kind, n))
        s = (MATRIX_SHIFT + MAX_LOG2_DYN_RANGE - 1) - bit_depth + 1
        ax = -2 if w == 1 else -1
        v = jnp.moveaxis(c.astype(jnp.int32), ax, -1)
        r = jax.lax.dot_general(v, t, (((v.ndim - 1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        r = jnp.clip(_rshift(r, s), COEFF_MIN, COEFF_MAX)
        return jnp.moveaxis(r, -1, ax)
    th = jnp.asarray(core_matrix(kind_h, w))
    tv = jnp.asarray(core_matrix(kind_v, h))
    s1 = MATRIX_SHIFT + 1
    s2 = MATRIX_SHIFT + MAX_LOG2_DYN_RANGE - 1 - bit_depth
    pel_min, pel_max = COEFF_MIN, COEFF_MAX  # residual clip (16-bit range)

    c = c.astype(jnp.int32)
    # vertical inverse: E = clip15(rs1(Tv^T @ C))  over the H axis
    e = jax.lax.dot_general(tv.T, c, (((1,), (c.ndim - 2,)), ((), ())),
                            preferred_element_type=jnp.int32)
    e = jnp.moveaxis(e, 0, -2)
    e = jnp.clip(_rshift(e, s1), COEFF_MIN, COEFF_MAX)
    # horizontal inverse: R = clip(rs2(E @ Th))
    r = jax.lax.dot_general(e, th, (((e.ndim - 1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    return jnp.clip(_rshift(r, s2), pel_min, pel_max)


def transform_shift_fwd(w: int, h: int, bit_depth: int = 10):
    s1 = (w.bit_length() - 1) + bit_depth + MATRIX_SHIFT - MAX_LOG2_DYN_RANGE
    s2 = (h.bit_length() - 1) + MATRIX_SHIFT
    return s1, s2
