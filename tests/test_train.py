"""Training-step smoke tests on the 8-device virtual CPU mesh."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from pmp_vvc_tpu.models import LumaMSBDNet, LumaQNet  # noqa: E402
from pmp_vvc_tpu.train.losses import LossWeights, msbd_loss, qbd_loss  # noqa: E402
from pmp_vvc_tpu.train.trainer import (  # noqa: E402
    TrainState, data_mesh, init_state, make_bd_train_step,
    make_optimizer, make_q_train_step, make_qbd_train_step,
    step_decay_schedule,
)


def _fake_batch(n=16):
    rng = np.random.RandomState(0)
    x = rng.uniform(0, 255, (n, 68, 68, 1)).astype(np.float32)
    qt = rng.randint(0, 4, (n, 8, 8, 1)).astype(np.float32)
    bt = rng.randint(0, 3, (n, 16, 16, 3)).astype(np.float32)
    dire = rng.randint(-1, 2, (n, 16, 16, 3)).astype(np.float32)
    return x, qt, bt, dire


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def test_step_decay_schedule():
    s = step_decay_schedule(1e-3, 20)
    assert s(0) == 1e-3
    assert s(19) == 1e-3
    assert s(20) == 5e-4
    assert s(40) == 2.5e-4
    # frozen at the last value above 1e-6
    assert s(1000) > 1e-6


def test_q_train_step_descends():
    mesh = data_mesh()
    net = LumaQNet()
    x, qt, _, _ = _fake_batch()
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 68, 68, 1)))["params"]
    opt = make_optimizer(1e-3)
    state = init_state(opt, params)
    run = make_q_train_step(net, opt, mesh)
    losses = []
    for _ in range(5):
        state, loss = run(state, x, qt, 1e-3)
        losses.append(float(loss))
    assert losses[-1] < losses[0]


def test_loss_parity_with_reference_formula(reference_root):
    """Our NHWC losses equal the reference NCHW torch formulas."""
    import sys
    torch = pytest.importorskip("torch")
    sys.path.insert(0, str(reference_root))
    try:
        import Metrics as ref  # type: ignore
    finally:
        sys.path.pop(0)
    rng = np.random.RandomState(1)
    n = 4
    bd = [rng.randn(n, 16, 16, 2).astype(np.float32) for _ in range(3)]
    bt = rng.randint(0, 3, (n, 16, 16, 3)).astype(np.float32)
    dire = rng.randint(-1, 2, (n, 16, 16, 3)).astype(np.float32)
    qt_out = rng.randn(n, 8, 8, 1).astype(np.float32)
    qt_lab = rng.randint(0, 4, (n, 8, 8, 1)).astype(np.float32)

    for qp in (22, 27, 32, 37):
        ours = float(qbd_loss(
            jnp.asarray(qt_out), [jnp.asarray(b) for b in bd],
            jnp.asarray(qt_lab), jnp.asarray(bt), jnp.asarray(dire),
            qp=qp, is_luma=True,
            w=LossWeights(q=1.0, b=(0.8, 1.0, 1.2), d=(1, 1, 1),
                          resb=(0.5, 0.5, 0.5))))
        t = lambda a: torch.from_numpy(a.transpose(0, 3, 1, 2))
        theirs = float(ref.loss_func_QBD_val(
            t(qt_out), t(bd[0]), t(bd[1]), t(bd[2]), t(qt_lab), t(bt),
            t(dire), qp))
        assert abs(ours - theirs) < 1e-4, (qp, ours, theirs)


def test_qbd_joint_step_runs():
    mesh = data_mesh()
    q_net, bd_net = LumaQNet(), LumaMSBDNet()
    x, qt, bt, dire = _fake_batch(8)
    params = {
        "q": q_net.init(jax.random.PRNGKey(0), jnp.zeros((1, 68, 68, 1)))["params"],
        "bd": bd_net.init(jax.random.PRNGKey(1), jnp.zeros((1, 68, 68, 1)),
                          jnp.zeros((1, 8, 8, 1)))["params"],
    }
    opt = make_optimizer(1e-4)
    state = init_state(opt, params)
    run = make_qbd_train_step(q_net, bd_net, opt, mesh, qp=32, is_luma=True)
    state, loss = run(state, x, qt, bt, dire, 1e-4)
    assert np.isfinite(float(loss))


def test_predict_mesh_matches_single_device():
    """Inference dp-sharding: the meshed CompPredictor forward must equal
    the single-device forward (incl. ragged-batch padding)."""
    import numpy as np
    from pmp_vvc_tpu.pmp.predict import CompPredictor
    from pmp_vvc_tpu.train.trainer import data_mesh

    pkl = "/root/reference/trained_models/Luma_Q_32.pkl"
    p1 = CompPredictor.from_reference_checkpoints(True, pkl)
    p8 = CompPredictor.from_reference_checkpoints(True, pkl,
                                                  mesh=data_mesh())
    rng = np.random.RandomState(0)
    x = rng.uniform(0, 255, (13, 68, 68, 1)).astype(np.float32)
    a = p1.predict(x)
    b = p8.predict(x)
    for ai, bi in zip(a, b):
        np.testing.assert_allclose(ai, bi, atol=1e-4)
