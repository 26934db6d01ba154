"""Structural-vote parity vs the reference torch implementation."""
import sys

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from pmp_vvc_tpu.pmp.structural import structural_vote  # noqa: E402


def test_structural_vote_matches_reference(reference_root):
    torch = pytest.importorskip("torch")
    sys.path.insert(0, str(reference_root))
    try:
        import Metrics as ref  # type: ignore
    finally:
        sys.path.pop(0)

    # reference uses .cuda() inside check_square_unity; patch to CPU no-op
    orig_cuda = torch.Tensor.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    try:
        rng = np.random.RandomState(3)
        x = (rng.randn(64, 1, 8, 8) * 1.2 + 1.2).astype(np.float32)
        theirs = ref.eli_structual_error(torch.from_numpy(x).clone()).numpy()
    finally:
        torch.Tensor.cuda = orig_cuda

    ours = np.asarray(structural_vote(jnp.asarray(x.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(ours.transpose(0, 3, 1, 2), theirs, atol=1e-6)


def test_structural_vote_consistency_properties():
    """Output is a valid quadtree depth field: constant over 2x2 cells."""
    rng = np.random.RandomState(0)
    x = (rng.randn(16, 8, 8) * 1.5 + 1.0).astype(np.float32)
    out = np.asarray(structural_vote(jnp.asarray(x)))
    assert out.shape == (16, 8, 8)
    assert set(np.unique(out)).issubset({0.0, 1.0, 2.0, 3.0})
    cells = out.reshape(16, 4, 2, 4, 2)
    assert (cells == cells[:, :, :1, :, :1]).all()
