"""Training driver: epoch loop, lr schedule, validation metrics,
loss CSV, checkpoint cadence (Train_QBD.py:117-429 + Metrics.py:197-385
counterpart, rebuilt around the jitted pjit-dp steps in trainer.py).

Dataset layout mirrors the reference ``.npy`` convention
(Metrics.py:76-141): per split (Train/Validate) —
  <split>_Y_Block68.npy               (N, 68, 68)   luma inputs
  <split>_<comp>_QP<q>_QTdepth_Block8.npy    (N, 8, 8)
  <split>_<comp>_QP<q>_MSBTdepth_Block16.npy (N, 3, 16, 16)
  <split>_<comp>_QP<q>_MSdirection_Block16.npy (N, 3, 16, 16)
The QT label is shifted by -1 (QT depth starts at 1 under CTU-128,
Metrics.py:95).  ``synth_dataset`` fabricates a small learnable set
(variance-driven labels) for smoke-training without the reference data.
"""
from __future__ import annotations

import pathlib
import time

import numpy as np

import jax
import jax.numpy as jnp


def load_npy_split(data_dir, split, comp="Luma", qp=32):
    d = pathlib.Path(data_dir)
    if comp == "Chroma":
        # (N, 34, 34, 3) = (2x2-pooled Y, U, V) channel stack — the
        # chroma-net input contract (Model_QBD.py:157-253)
        x = np.load(d / f"{split}_Chroma_Block34.npy") \
            .astype(np.float32)
    else:
        x = np.load(d / f"{split}_Y_Block68.npy") \
            .astype(np.float32)[..., None]
    qt = np.load(d / f"{split}_{comp}_QP{qp}_QTdepth_Block8.npy") \
        .astype(np.float32) - 1.0
    bt = np.load(d / f"{split}_{comp}_QP{qp}_MSBTdepth_Block16.npy") \
        .astype(np.float32)
    dire = np.load(d / f"{split}_{comp}_QP{qp}_MSdirection_Block16.npy") \
        .astype(np.float32)
    return (x, qt[..., None],
            np.moveaxis(bt, 1, -1), np.moveaxis(dire, 1, -1))


def synth_dataset(n, seed=0):
    """Learnable toy set: QT depth follows local 8x8 variance quantiles,
    MTT depth follows 4x4 variance, direction follows the sign of the
    horizontal-vs-vertical gradient-energy difference."""
    rng = np.random.RandomState(seed)
    base = rng.uniform(0, 255, (n, 9, 9)).astype(np.float32)
    x = np.stack([np.kron(b, np.ones((8, 8)))[:68, :68] for b in base])
    x += rng.randn(n, 68, 68).astype(np.float32) * \
        rng.uniform(0, 24, (n, 1, 1)).astype(np.float32)
    core = x[:, 4:68, 4:68]
    v8 = core.reshape(n, 8, 8, 8, 8).std(axis=(3, 4))
    qt = np.digitize(v8, [8, 16]).astype(np.float32)        # 0..2
    v4 = core.reshape(n, 16, 4, 16, 4).std(axis=(2, 4))
    bt1 = (v4 > 12).astype(np.float32)
    gy = np.abs(np.diff(core, axis=1)).reshape(n, -1, 16, 4).mean((1, 3))
    gx = np.abs(np.diff(core, axis=2)).reshape(n, 16, 4, -1).mean((2, 3))
    dire1 = np.sign(gy[:, :, None] - gx[:, None, :]).astype(np.float32)
    bt = np.stack([bt1, bt1, bt1], axis=-1)
    dire = np.stack([dire1 * bt1, dire1 * bt1, dire1 * bt1], axis=-1)
    return x[..., None], qt[..., None], bt, dire


def rounded_accuracy(pred, label):
    """Reference validation metric (Metrics.py:207, :344-362): share of
    positions whose ROUNDED prediction equals the label."""
    return float(np.mean(np.round(np.asarray(pred)) == np.asarray(label)))


def validate(q_net, bd_net, params, data, batch=256,
             label_qt_input=False):
    """Per-head rounded accuracy over a (x, qt, bt, dire) split.

    ``label_qt_input=True`` feeds the ground-truth QT labels to the
    BD-net (matching the stage-"bd" training step, which trains on
    label QT inputs) instead of running a possibly-untrained Q-net;
    the qt accuracy row is omitted in that mode."""
    x, qt, bt, dire = data
    accs = {"qt": [], "bt0": [], "bt1": [], "bt2": [],
            "dir0": [], "dir1": [], "dir2": []}
    if label_qt_input:
        del accs["qt"]

    @jax.jit
    def fwd(p, xb, qtb):
        if label_qt_input:
            return None, bd_net.apply({"params": p["bd"]}, xb, qtb)
        qt_out = q_net.apply({"params": p["q"]}, xb)
        outs = bd_net.apply({"params": p["bd"]}, xb, qt_out)
        return qt_out, outs

    for i in range(0, len(x), batch):
        xb = jnp.asarray(x[i:i + batch])
        n = xb.shape[0]
        qt_out, outs = fwd(params, xb, jnp.asarray(qt[i:i + n]))
        if not label_qt_input:
            accs["qt"].append(rounded_accuracy(qt_out, qt[i:i + n]))
        for k, bd in enumerate(outs):
            accs[f"bt{k}"].append(
                rounded_accuracy(bd[..., 0], bt[i:i + n, ..., k]))
            accs[f"dir{k}"].append(
                rounded_accuracy(bd[..., 1], dire[i:i + n, ..., k]))
    return {k: float(np.mean(v)) for k, v in accs.items()}


def train(stage, train_data, val_data, *, qp=32, is_luma=True, epochs=20,
          lr=1e-3, decay_every=10, batch=64, ckpt_dir=None, ckpt_every=10,
          log_path=None, mesh=None, init_params=None, seed=0,
          print_fn=print):
    """Run one training stage ("q" | "bd" | "qbd"); returns params.

    Matches Train_QBD.py's structure: Adam + step-halving lr
    (adjust_learning_rate, Metrics.py:53), per-epoch train loss +
    validation accuracies, loss CSV, checkpoint every ``ckpt_every``.
    """
    from ..models import LumaMSBDNet, LumaQNet, ChromaMSBDNet, ChromaQNet
    from ..models.checkpoint import save_params
    from .trainer import (TrainState, data_mesh, init_state,
                          make_bd_train_step, make_optimizer,
                          make_q_train_step, make_qbd_train_step,
                          step_decay_schedule)

    mesh = mesh or data_mesh()
    q_net = LumaQNet() if is_luma else ChromaQNet()
    bd_net = LumaMSBDNet() if is_luma else ChromaMSBDNet()
    x, qt, bt, dire = train_data
    if init_params is None:
        k0, k1 = jax.random.split(jax.random.PRNGKey(seed))
        init_params = {
            "q": q_net.init(k0, jnp.zeros((1,) + x.shape[1:]))["params"],
            "bd": bd_net.init(k1, jnp.zeros((1,) + x.shape[1:]),
                              jnp.zeros((1,) + qt.shape[1:]))["params"],
        }
    opt = make_optimizer(lr)
    if stage == "q":
        run = make_q_train_step(q_net, opt, mesh)
        params = init_params["q"]
    elif stage == "bd":
        run = make_bd_train_step(bd_net, opt, mesh, qp=qp, is_luma=is_luma)
        params = init_params["bd"]
    else:
        run = make_qbd_train_step(q_net, bd_net, opt, mesh, qp=qp,
                                  is_luma=is_luma)
        params = init_params
    state = init_state(opt, params)
    sched = step_decay_schedule(lr, decay_every)
    n = len(x)
    rng = np.random.RandomState(seed)
    log_rows = []
    for epoch in range(epochs):
        cur_lr = sched(epoch)
        perm = rng.permutation(n)
        losses = []
        t0 = time.time()
        for i in range(0, n - batch + 1, batch):
            sl = perm[i:i + batch]
            if stage == "q":
                state, loss = run(state, x[sl], qt[sl], cur_lr)
            else:
                state, loss = run(state, x[sl], qt[sl], bt[sl], dire[sl],
                                  cur_lr)
            losses.append(float(loss))
        row = {"epoch": epoch, "lr": cur_lr,
               "train_loss": float(np.mean(losses)),
               "time_s": round(time.time() - t0, 2)}
        if val_data is not None and stage == "bd":
            # validate with the ground-truth QT input, matching the
            # training step (init_params["q"] may be untrained)
            row.update(validate(q_net, bd_net,
                                {"bd": state.params}, val_data,
                                label_qt_input=True))
        elif val_data is not None and stage == "qbd":
            row.update(validate(q_net, bd_net, state.params, val_data))
        elif val_data is not None:
            qp_ = {"q": state.params, "bd": init_params["bd"]}
            row["qt"] = validate(q_net, bd_net, qp_, val_data)["qt"]
        log_rows.append(row)
        print_fn(" ".join(f"{k}={v:.4g}" if isinstance(v, float) else
                          f"{k}={v}" for k, v in row.items()))
        if ckpt_dir and (epoch + 1) % ckpt_every == 0:
            p = pathlib.Path(ckpt_dir)
            p.mkdir(parents=True, exist_ok=True)
            save_params(p / f"{stage}_epoch{epoch + 1}.msgpack",
                        state.params)
    if log_path:
        import csv
        keys = sorted({k for r in log_rows for k in r})
        with open(log_path, "w", newline="") as f:
            wcsv = csv.DictWriter(f, fieldnames=keys)
            wcsv.writeheader()
            wcsv.writerows(log_rows)
    if ckpt_dir:
        from ..models.checkpoint import save_params
        save_params(pathlib.Path(ckpt_dir) / f"{stage}_final.msgpack",
                    state.params)
    return state.params, log_rows
