"""Size-generic transform/quant == per-size ops (oracle-verified ones)."""
import numpy as np

import jax.numpy as jnp

from pmp_vvc_tpu.ops.quant import dequantize, quantize
from pmp_vvc_tpu.ops.tq_generic import (dct2_matrices,
                                        dequantize_generic,
                                        forward_transform_generic,
                                        inverse_transform_generic,
                                        quantize_generic, satd_generic)
from pmp_vvc_tpu.ops.transforms import (DCT2, core_matrix, forward_transform,
                                        inverse_transform)
from pmp_vvc_tpu.ops.distortion import satd

SIZES = (4, 8, 16, 32, 64)


def test_dct2_nesting():
    d64 = core_matrix(DCT2, 64)
    for n in (2, 4, 8, 16, 32):
        assert np.array_equal(core_matrix(DCT2, n), d64[::64 // n, :n])


def _pad(x, P):
    out = np.zeros((1, P, P), np.int32)
    out[0, :x.shape[0], :x.shape[1]] = x
    return out


def test_forward_inverse_quant_parity():
    rng = np.random.RandomState(0)
    P = 64
    for w in SIZES:
        for h in SIZES:
            x = rng.randint(-512, 512, (h, w)).astype(np.int32)
            ref_c = np.asarray(forward_transform(
                jnp.asarray(x[None]), DCT2, DCT2, bit_depth=10))[0]
            gen_c = np.asarray(forward_transform_generic(
                jnp.asarray(_pad(x, P)), jnp.asarray([w]), jnp.asarray([h]),
                bit_depth=10))[0]
            assert np.array_equal(gen_c[:h, :w], ref_c), (w, h, "fwd")
            assert not gen_c[h:, :].any() and not gen_c[:, w:].any()

            for qp in (22, 37, 51):
                ref_l = np.asarray(quantize(jnp.asarray(ref_c[None]),
                                            w=w, h=h, qp=qp))[0]
                gen_l = np.asarray(quantize_generic(
                    jnp.asarray(_pad(ref_c, P)), jnp.asarray([w]),
                    jnp.asarray([h]), qp))[0]
                assert np.array_equal(gen_l[:h, :w], ref_l), (w, h, qp, "q")
                ref_d = np.asarray(dequantize(jnp.asarray(ref_l[None]),
                                              w=w, h=h, qp=qp))[0]
                gen_d = np.asarray(dequantize_generic(
                    jnp.asarray(_pad(ref_l, P)), jnp.asarray([w]),
                    jnp.asarray([h]), qp))[0]
                assert np.array_equal(gen_d[:h, :w], ref_d), (w, h, qp, "dq")
                ref_r = np.asarray(inverse_transform(
                    jnp.asarray(ref_d[None]), DCT2, DCT2))[0]
                gen_r = np.asarray(inverse_transform_generic(
                    jnp.asarray(_pad(ref_d, P)), jnp.asarray([w]),
                    jnp.asarray([h])))[0]
                assert np.array_equal(gen_r[:h, :w], ref_r), (w, h, qp, "inv")


def test_forward_ignores_padding_garbage():
    rng = np.random.RandomState(1)
    w, h, P = 16, 8, 64
    x = rng.randint(-512, 512, (h, w)).astype(np.int32)
    padded = rng.randint(-9999, 9999, (1, P, P)).astype(np.int32)
    padded[0, :h, :w] = x
    ref_c = np.asarray(forward_transform(jnp.asarray(x[None]), DCT2, DCT2))[0]
    gen_c = np.asarray(forward_transform_generic(
        jnp.asarray(padded), jnp.asarray([w]), jnp.asarray([h])))[0]
    assert np.array_equal(gen_c[:h, :w], ref_c)


def test_satd_generic_square_parity():
    """For square >= 8 (8x8 tiling) and 4x4 the generic SATD equals the
    exact VTM tiling; rectangular extreme ratios use the uniform tiling
    (decision heuristic, no parity claim)."""
    rng = np.random.RandomState(2)
    P = 64
    for n in (4, 8, 16, 32, 64):
        a = rng.randint(0, 1024, (n, n)).astype(np.int32)
        b = rng.randint(0, 1024, (n, n)).astype(np.int32)
        ref = int(np.asarray(satd(jnp.asarray(a[None]),
                                  jnp.asarray(b[None])))[0])
        pa, pb = _pad(a, P), _pad(b, P)
        gen = int(np.asarray(satd_generic(
            jnp.asarray(pa[:, None]), jnp.asarray(pb[:, None]),
            jnp.asarray([n]), jnp.asarray([n])))[0, 0])
        assert gen == ref, n
    # 8x32 uses 8x8 tiles in both (w<h needs w%8==0 h%16==0 -> 16x8 in VTM;
    # just assert the generic value is positive and stable)
    a = rng.randint(0, 1024, (8, 32)).astype(np.int32)
    b = rng.randint(0, 1024, (8, 32)).astype(np.int32)
    g = int(np.asarray(satd_generic(
        jnp.asarray(_pad(a, P)[:, None]), jnp.asarray(_pad(b, P)[:, None]),
        jnp.asarray([32]), jnp.asarray([8])))[0, 0])
    assert g > 0


def test_dct2_matrix_builder():
    for n in SIZES:
        m = np.asarray(dct2_matrices(jnp.asarray([n]), 64))[0]
        ref = core_matrix(DCT2, n)
        keep = min(n, 32)
        assert np.array_equal(m[:keep, :n], ref[:keep])
        assert not m[keep:, :].any() and not m[:, n:].any()
