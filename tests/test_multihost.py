"""Multi-host (2-process) mesh bootstrap test — SURVEY §2.4 last row.

Two OS processes, 4 virtual CPU devices each, form one global 8-device
dp mesh via jax.distributed; each feeds its half of the batch through
the REAL pjit train step (gradient psum crosses the process boundary —
the DCN analog).  The resulting parameters must match a single-process
8-device run on the full batch."""
import pathlib
import socket
import subprocess
import sys

import numpy as np
import pytest

_WORKER = pathlib.Path(__file__).parent / "multihost_worker.py"


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    p = s.getsockname()[1]
    s.close()
    return p


def test_two_process_mesh_matches_single(tmp_path):
    coord = f"127.0.0.1:{_free_port()}"
    out = tmp_path / "mh.npz"
    env = {"PATH": "/usr/bin:/bin", "HOME": "/root",
           "PYTHONPATH": str(_WORKER.parent.parent)}
    import os
    env.update({k: v for k, v in os.environ.items()
                if k.startswith(("JAX_", "XLA_")) is False
                and k not in env})
    env.pop("JAX_PLATFORMS", None)
    procs = [subprocess.Popen(
        [sys.executable, str(_WORKER), coord, "2", str(pid), str(out)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True) for pid in (0, 1)]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, o[-2000:]
    assert out.exists()
    multi = np.load(out)

    # single-process reference: 8 local devices, full batch
    ref = tmp_path / "single.npz"
    script = (
        "import os;"
        "os.environ['XLA_FLAGS']="
        "'--xla_force_host_platform_device_count=8';"
        "import sys; sys.path.insert(0, %r);"
        "import jax; jax.config.update('jax_platforms','cpu');"
        "sys.path.insert(0, %r);"
        "import multihost_worker as w;"
        "from pmp_vvc_tpu.parallel.distributed import global_mesh;"
        "import numpy as np;"
        "x, qt = w.make_data();"
        "params, loss = w.run_steps(global_mesh(), x, qt);"
        "np.savez(%r, loss=float(loss), **{str(i): v for i, v in "
        "enumerate(jax.tree_util.tree_leaves(params))})"
    ) % (str(_WORKER.parent.parent), str(_WORKER.parent), str(ref))
    r = subprocess.run([sys.executable, "-c", script], env=env,
                       capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    single = np.load(ref)
    for k in single.files:
        np.testing.assert_allclose(multi[k], single[k], rtol=1e-5,
                                   atol=1e-6, err_msg=k)
