"""YUV ingest + blocking vs the reference blocking oracle."""
import sys

import numpy as np
import pytest

from pmp_vvc_tpu.data.yuv import (
    blocks_for_sequence, extract_blocks, read_yuv420, squash_10bit,
    write_yuv420,
)


def _make_seq(tmp_path, n=2, w=128, h=64, is10bit=False):
    rng = np.random.RandomState(7)
    dtype = np.uint16 if is10bit else np.uint8
    hi = 1024 if is10bit else 256
    y = rng.randint(0, hi, (n, h, w)).astype(dtype)
    u = rng.randint(0, hi, (n, h // 2, w // 2)).astype(dtype)
    v = rng.randint(0, hi, (n, h // 2, w // 2)).astype(dtype)
    path = tmp_path / "seq.yuv"
    write_yuv420(path, y, u, v)
    return path, y, u, v


def test_read_roundtrip(tmp_path):
    path, y, u, v = _make_seq(tmp_path)
    ry, ru, rv = read_yuv420(path, 128, 64)
    np.testing.assert_array_equal(ry, y)
    np.testing.assert_array_equal(ru, u)
    np.testing.assert_array_equal(rv, v)


def test_read_subsample(tmp_path):
    path, y, _, _ = _make_seq(tmp_path, n=5)
    ry, _, _ = read_yuv420(path, 128, 64, subsample=2)
    np.testing.assert_array_equal(ry, y[::2])


def test_blocking_matches_reference(reference_root, tmp_path):
    sys.path.insert(0, str(reference_root))
    try:
        import Inference_QBD as ref  # type: ignore
    finally:
        sys.path.pop(0)
    path, y, u, v = _make_seq(tmp_path, n=2, w=128, h=128)
    ref_y, ref_u, ref_v = ref.output_block_yuv(
        str(path), 128, 128, block_size=64, in_overlap=4, numfrm=2,
        SubSampleRatio=1, is10bit=False)
    ours_y = extract_blocks(y, 64, 4)
    ours_u = extract_blocks(u, 32, 2)
    ours_v = extract_blocks(v, 32, 2)
    np.testing.assert_array_equal(ours_y, ref_y)
    np.testing.assert_array_equal(ours_u, ref_u)
    np.testing.assert_array_equal(ours_v, ref_v)


def test_blocks_for_sequence_shapes_and_pool(tmp_path):
    path, y, u, v = _make_seq(tmp_path, n=1, w=128, h=64)
    luma_in, chroma_in = blocks_for_sequence(y, u, v)
    assert luma_in.shape == (2, 68, 68, 1)
    assert chroma_in.shape == (2, 34, 34, 3)
    # pooled-Y channel == 2x2 max of the luma block
    blk = luma_in[0, :, :, 0]
    np.testing.assert_array_equal(
        chroma_in[0, :, :, 0], blk.reshape(34, 2, 34, 2).max(axis=(1, 3)))


def test_squash_10bit():
    x = np.array([0, 1, 2, 3, 4, 1023], dtype=np.uint16)
    np.testing.assert_array_equal(squash_10bit(x), [0, 0, 0, 1, 1, 255])
