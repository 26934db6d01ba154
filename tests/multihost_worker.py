"""Worker for test_multihost.py: one process of a 2-process CPU mesh.

Runs 3 dp-sharded train steps of a tiny conv net through the REAL
trainer step (make_q_train_step) on a global 8-device mesh (4 virtual
CPU devices per process), feeding each process its half of the global
batch.  Process 0 dumps the final params for comparison against the
single-process run.

Usage: python multihost_worker.py <coordinator> <n_proc> <pid> <out.npz>
"""
import os
import sys

os.environ["XLA_FLAGS"] = ("--xla_force_host_platform_device_count=4 "
                           + os.environ.get("XLA_FLAGS", ""))

import numpy as np  # noqa: E402


def tiny_net():
    import flax.linen as nn

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = nn.Conv(4, (12, 12), strides=(8, 8),
                        padding="VALID")(x)
            return nn.Conv(1, (1, 1))(x)

    return Tiny()


def make_data(seed=0, n=16):
    rng = np.random.RandomState(seed)
    x = rng.uniform(0, 255, (n, 68, 68, 1)).astype(np.float32)
    qt = rng.randint(0, 3, (n, 8, 8, 1)).astype(np.float32)
    return x, qt


def run_steps(mesh, x, qt, steps=3):
    import jax
    import jax.numpy as jnp
    from pmp_vvc_tpu.train.trainer import (init_state, make_optimizer,
                                           make_q_train_step)
    net = tiny_net()
    params = net.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, 68, 68, 1)))["params"]
    opt = make_optimizer(1e-3)
    state = init_state(opt, params)
    run = make_q_train_step(net, opt, mesh)
    for _ in range(steps):
        state, loss = run(state, x, qt, 1e-3)
    return jax.tree_util.tree_map(
        lambda a: np.asarray(jax.device_get(a)), state.params), loss


def main():
    coordinator, n_proc, pid, out = (sys.argv[1], int(sys.argv[2]),
                                     int(sys.argv[3]), sys.argv[4])
    import jax
    jax.config.update("jax_platforms", "cpu")
    from pmp_vvc_tpu.parallel.distributed import (global_mesh,
                                                  initialize)
    initialize(coordinator, n_proc, pid)
    assert jax.device_count() == 4 * n_proc, jax.device_count()
    mesh = global_mesh()
    x, qt = make_data()
    per = len(x) // n_proc
    sl = slice(pid * per, (pid + 1) * per)
    params, loss = run_steps(mesh, x[sl], qt[sl])
    if pid == 0:
        flat = {"/".join(map(str, k)): v for k, v in
                jax.tree_util.tree_flatten_with_path(params)[0]}
        np.savez(out, loss=float(loss),
                 **{str(i): v for i, v in enumerate(
                     jax.tree_util.tree_leaves(params))})
    print("done", pid)


if __name__ == "__main__":
    main()
