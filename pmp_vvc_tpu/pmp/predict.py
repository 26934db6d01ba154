"""Batched partition-map prediction (the reference's Inference_QBD core).

One jitted program runs Q-net + MSBD-net + structural vote for a whole CTU
batch (Metrics.py:388-419 + eli_structual_error), sharded over the device
mesh on the batch axis. Outputs arrive as reference-layout numpy arrays
(qt [B,8,8], bt [B,3,16,16], dire [B,3,16,16]) ready for reconciliation.
"""
from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models import (
    ChromaMSBDNet, ChromaQNet, LumaMSBDNet, LumaQNet, load_reference_net,
)
from .structural import structural_vote


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


@dataclass
class CompPredictor:
    """Predictor for one component (luma or chroma) at one QP."""

    q_net: object
    bd_net: object
    q_params: dict
    bd_params: dict
    mesh: Mesh | None = None

    @classmethod
    def from_trained(cls, is_luma: bool, q_pkl, bd_msgpack, mesh=None):
        """Reference Q-net .pkl + OUR trained BD-net .msgpack (the
        reference snapshot ships no BD checkpoints; ours come from
        train/driver.py on gen_dataset labels)."""
        from ..models import (ChromaMSBDNet, ChromaQNet, LumaMSBDNet,
                              LumaQNet)
        from ..models.checkpoint import load_params, load_reference_net
        if is_luma:
            q_net, bd_net = LumaQNet(), LumaMSBDNet()
            xs, qs = (1, 68, 68, 1), (1, 8, 8, 1)
        else:
            q_net, bd_net = ChromaQNet(), ChromaMSBDNet()
            xs, qs = (1, 34, 34, 3), (1, 8, 8, 1)
        if str(q_pkl).endswith(".msgpack"):
            tq = q_net.init(jax.random.PRNGKey(0),
                            jnp.zeros(xs))["params"]
            q_params = load_params(q_pkl, tq)
        else:
            q_vars, _, _ = load_reference_net(q_net, (jnp.zeros(xs),),
                                              q_pkl)
            q_params = q_vars["params"]
        tmpl = bd_net.init(jax.random.PRNGKey(0), jnp.zeros(xs),
                           jnp.zeros(qs))["params"]
        bd_params = load_params(bd_msgpack, tmpl)
        return cls(q_net, bd_net, q_params, bd_params, mesh)

    @classmethod
    def from_reference_checkpoints(cls, is_luma: bool, q_pkl, bd_pkl=None,
                                   mesh=None):
        """Build from reference .pkl files (BD optional — random if missing)."""
        if is_luma:
            q_net, bd_net = LumaQNet(), LumaMSBDNet()
            xs, qs = (1, 68, 68, 1), (1, 8, 8, 1)
        else:
            q_net, bd_net = ChromaQNet(), ChromaMSBDNet()
            xs, qs = (1, 34, 34, 3), (1, 8, 8, 1)
        q_vars, _, _ = load_reference_net(q_net, (jnp.zeros(xs),), q_pkl)
        if bd_pkl is not None:
            bd_vars, _, _ = load_reference_net(
                bd_net, (jnp.zeros(xs), jnp.zeros(qs)), bd_pkl, wrap_core=True)
        else:
            bd_vars = {"params": bd_net.init(
                jax.random.PRNGKey(0), jnp.zeros(xs), jnp.zeros(qs))["params"]}
        return cls(q_net, bd_net, q_vars["params"], bd_vars["params"], mesh)

    @functools.cached_property
    def _forward(self):
        q_net, bd_net = self.q_net, self.bd_net

        def fwd(q_params, bd_params, x):
            qt_raw = q_net.apply({"params": q_params}, x)
            bd0, bd1, bd2 = bd_net.apply({"params": bd_params}, x, qt_raw)
            bt = jnp.concatenate(
                [bd0[..., 0:1], bd1[..., 0:1], bd2[..., 0:1]], axis=-1)
            dire = jnp.concatenate(
                [bd0[..., 1:2], bd1[..., 1:2], bd2[..., 1:2]], axis=-1)
            qt = structural_vote(qt_raw)
            return qt, bt, dire

        if self.mesh is not None:
            data = NamedSharding(self.mesh, P("dp"))
            return jax.jit(fwd, in_shardings=(None, None, data),
                           out_shardings=data)
        return jax.jit(fwd)

    def predict(self, x: np.ndarray, batch_size: int = 512):
        """x: (B, H, W, C) float32 -> (qt [B,8,8], bt [B,3,16,16], dire)."""
        n = x.shape[0]
        n_dev = 1 if self.mesh is None else self.mesh.size
        qts, bts, dires = [], [], []
        for i in range(0, n, batch_size):
            chunk = x[i:i + batch_size]
            pad = _round_up(chunk.shape[0], n_dev) - chunk.shape[0]
            if pad:
                chunk = np.concatenate(
                    [chunk, np.repeat(chunk[-1:], pad, axis=0)], axis=0)
            qt, bt, dire = self._forward(
                self.q_params, self.bd_params, jnp.asarray(chunk))
            m = chunk.shape[0] - pad
            qts.append(np.asarray(qt)[:m, ..., 0])
            bts.append(np.asarray(bt)[:m].transpose(0, 3, 1, 2))
            dires.append(np.asarray(dire)[:m].transpose(0, 3, 1, 2))
        return (np.concatenate(qts), np.concatenate(bts),
                np.concatenate(dires))
