"""Multi-stage trainer with pjit data parallelism.

The reference trains with single-host ``nn.DataParallel``
(Train_QBD.py:130,207,325-326). TPU-native equivalent: a 1-D ``dp`` device
mesh; the CTU batch is sharded across chips with ``NamedSharding``, weights
and optimizer state are replicated, and XLA inserts the gradient ``psum``.

Three stages mirror Train_QBD.py:
- stage "q"   : pretrain the QT net, plain L1           (:117-191)
- stage "bd"  : pretrain the MTT net on QT *labels*     (:193-303)
- stage "qbd" : joint fine-tune, QT output feeds MTT    (:305-429)
"""
from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .losses import LossWeights, msbd_loss, qbd_loss


def step_decay_schedule(lr: float, decay_every: int):
    """lr * 0.5**(epoch // decay_every), frozen once below 1e-6.

    Contract: Metrics.py:53-58 (adjust_learning_rate). Returns f(epoch)->lr.
    """
    def sched(epoch: int) -> float:
        e = int(epoch)
        while e > 0 and lr * (0.5 ** (e // decay_every)) <= 1e-6:
            e -= 1
        return lr * (0.5 ** (e // decay_every))
    return sched


def data_mesh(devices=None) -> Mesh:
    import numpy as np
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices).reshape(-1), ("dp",))


@dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: int = 0


def make_optimizer(lr: float = 1e-3):
    # Adam with injectable lr so the host-side step-decay schedule
    # (epoch-granular, reference semantics) can drive it.
    return optax.inject_hyperparams(optax.adam)(learning_rate=lr)


def init_state(optimizer, params) -> TrainState:
    return TrainState(params=params, opt_state=optimizer.init(params))


def _shard_batch(mesh: Mesh, tree):
    if jax.process_count() > 1:
        # multi-host: each process holds its slice of the global batch
        from ..parallel.distributed import host_shard
        return host_shard(mesh, tree)
    sharding = NamedSharding(mesh, P("dp"))
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree)


def make_q_train_step(net, optimizer, mesh: Mesh):
    """Stage-"q" jitted step: (state, x, qt_label, lr) -> (state, loss)."""

    def step(params, opt_state, x, qt_label, lr):
        def loss_fn(p):
            out = net.apply({"params": p}, x)
            return jnp.mean(jnp.abs(out - qt_label))
        loss, grads = jax.value_and_grad(loss_fn)(params)
        opt_state.hyperparams["learning_rate"] = lr
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    jitted = jax.jit(step, donate_argnums=(0, 1))

    def run(state: TrainState, x, qt_label, lr):
        x, qt_label = _shard_batch(mesh, (x, qt_label))
        params, opt_state, loss = jitted(
            state.params, state.opt_state, x, qt_label, jnp.asarray(lr))
        return TrainState(params, opt_state, state.step + 1), loss

    return run


def make_bd_train_step(net, optimizer, mesh: Mesh, *, qp: int, is_luma: bool,
                       w: LossWeights = LossWeights()):
    """Stage-"bd" jitted step using QT labels as net input."""

    def step(params, opt_state, x, qt_label, bt_label, dire_label, lr):
        def loss_fn(p):
            outs = net.apply({"params": p}, x, qt_label)
            return msbd_loss(outs, bt_label, dire_label, qp=qp,
                             is_luma=is_luma, w=w)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        opt_state.hyperparams["learning_rate"] = lr
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    jitted = jax.jit(step, donate_argnums=(0, 1))

    def run(state: TrainState, x, qt_label, bt_label, dire_label, lr):
        batch = _shard_batch(mesh, (x, qt_label, bt_label, dire_label))
        params, opt_state, loss = jitted(
            state.params, state.opt_state, *batch, jnp.asarray(lr))
        return TrainState(params, opt_state, state.step + 1), loss

    return run


def make_qbd_train_step(q_net, bd_net, optimizer, mesh: Mesh, *, qp: int,
                        is_luma: bool, w: LossWeights = LossWeights()):
    """Joint stage: one optimizer over both param trees (Train_QBD.py:339)."""

    def step(params, opt_state, x, qt_label, bt_label, dire_label, lr):
        def loss_fn(p):
            qt_out = q_net.apply({"params": p["q"]}, x)
            outs = bd_net.apply({"params": p["bd"]}, x, qt_out)
            return qbd_loss(qt_out, outs, qt_label, bt_label, dire_label,
                            qp=qp, is_luma=is_luma, w=w)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        opt_state.hyperparams["learning_rate"] = lr
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    jitted = jax.jit(step, donate_argnums=(0, 1))

    def run(state: TrainState, x, qt_label, bt_label, dire_label, lr):
        batch = _shard_batch(mesh, (x, qt_label, bt_label, dire_label))
        params, opt_state, loss = jitted(
            state.params, state.opt_state, *batch, jnp.asarray(lr))
        return TrainState(params, opt_state, state.step + 1), loss

    return run
