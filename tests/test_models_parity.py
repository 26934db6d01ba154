"""Numerical parity of the flax Down-Up-CNN nets vs the reference torch nets.

The reference implementation is imported (read-only) purely as a test oracle;
our nets are independent NHWC/flax implementations.
"""
import sys

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from pmp_vvc_tpu.models import (  # noqa: E402
    ChromaMSBDNet, ChromaQNet, LumaMSBDNet, LumaQNet,
    load_reference_net, torch_pickle_to_flat, import_torch_state_dict,
)


def _torch_reference(reference_root):
    torch = pytest.importorskip("torch")
    sys.path.insert(0, str(reference_root))
    try:
        import Model_QBD  # type: ignore
    finally:
        sys.path.pop(0)
    return torch, Model_QBD


@pytest.mark.parametrize("comp", ["Luma", "Chroma"])
def test_q_net_parity_with_checkpoint(reference_root, comp):
    torch, Model_QBD = _torch_reference(reference_root)
    pkl = reference_root / "trained_models" / f"{comp}_Q_32.pkl"

    t_net = getattr(Model_QBD, f"{comp}_Q_Net")()
    state = torch.load(pkl, map_location="cpu", weights_only=True)
    state = {k.split("module.", 1)[-1]: v for k, v in state.items()}
    t_net.load_state_dict(state)
    t_net.eval()

    net = LumaQNet() if comp == "Luma" else ChromaQNet()
    shape = (2, 68, 68, 1) if comp == "Luma" else (2, 34, 34, 3)
    rng = np.random.RandomState(0)
    x = rng.uniform(0, 255, size=shape).astype(np.float32)

    variables, n_loaded, n_skipped = load_reference_net(
        net, (jnp.zeros(shape),), pkl)
    assert n_skipped == 0
    assert n_loaded == len(state)

    ours = np.asarray(net.apply(variables, jnp.asarray(x)))[..., 0]
    with torch.no_grad():
        theirs = t_net(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()[:, 0]
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-3)


@pytest.mark.parametrize("comp", ["Luma", "Chroma"])
def test_msbd_net_parity_random_weights(reference_root, comp):
    """No BD checkpoints in the snapshot; verify architecture parity by
    exporting randomly-initialized torch weights into our net."""
    torch, Model_QBD = _torch_reference(reference_root)
    torch.manual_seed(0)
    t_net = getattr(Model_QBD, f"{comp}_MSBD_Net")()
    t_net.eval()

    net = LumaMSBDNet() if comp == "Luma" else ChromaMSBDNet()
    if comp == "Luma":
        xs, qs = (2, 68, 68, 1), (2, 8, 8, 1)
    else:
        xs, qs = (2, 34, 34, 3), (2, 8, 8, 1)
    rng = np.random.RandomState(1)
    x = rng.uniform(0, 255, size=xs).astype(np.float32)
    q = rng.uniform(0, 3, size=qs).astype(np.float32)

    params = net.init(jax.random.PRNGKey(0), jnp.zeros(xs), jnp.zeros(qs))["params"]
    flat = {k: v.numpy() for k, v in t_net.state_dict().items()}
    params, n_loaded, n_skipped = import_torch_state_dict(
        params, flat, wrap_core=True)
    assert n_skipped == 0, "all torch params must map"
    assert n_loaded == len(flat)

    outs = net.apply({"params": params}, jnp.asarray(x), jnp.asarray(q))
    with torch.no_grad():
        t_outs = t_net(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                       torch.from_numpy(q.transpose(0, 3, 1, 2)))
    for ours, theirs in zip(outs, t_outs):
        np.testing.assert_allclose(
            np.asarray(ours).transpose(0, 3, 1, 2), theirs.numpy(),
            rtol=1e-4, atol=1e-3)


def test_param_counts(reference_root):
    """Q-net param count should match the reference checkpoint exactly."""
    flat = torch_pickle_to_flat(reference_root / "trained_models" / "Luma_Q_32.pkl")
    n_ref = sum(int(np.prod(v.shape)) for v in flat.values())
    net = LumaQNet()
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 68, 68, 1)))["params"]
    n_ours = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))
    assert n_ours == n_ref
