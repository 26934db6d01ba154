"""Benchmark: partition-map prediction throughput on the real chip.

Prints one JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline metric (round 1): CTU partition predictions per second through the
fused Luma Q+MSBD forward (the reference's per-CTU CNN inference path,
Inference_QBD.py:226). Baseline: the reference's torch-CPU equivalent
measured here on the same host (their GPU timings are not published).
"""
import json
import time

import numpy as np


def bench_tpu(batch=128, iters=10):
    import jax
    import jax.numpy as jnp

    # persistent compilation cache: first tunnel compile is ~4 min; any
    # rerun on this host should hit the cache
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/jax_comp_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from pmp_vvc_tpu.models import LumaMSBDNet, LumaQNet
    from pmp_vvc_tpu.pmp.structural import structural_vote

    q_net, bd_net = LumaQNet(), LumaMSBDNet()
    xs, qs = (batch, 68, 68, 1), (batch, 8, 8, 1)
    q_params = q_net.init(jax.random.PRNGKey(0), jnp.zeros(xs))["params"]
    bd_params = bd_net.init(jax.random.PRNGKey(1), jnp.zeros(xs),
                            jnp.zeros(qs))["params"]

    @jax.jit
    def fwd(x):
        qt_raw = q_net.apply({"params": q_params}, x)
        bd0, bd1, bd2 = bd_net.apply({"params": bd_params}, x, qt_raw)
        return structural_vote(qt_raw), bd0, bd1, bd2

    import time as _t
    x = jnp.asarray(np.random.RandomState(0)
                    .uniform(0, 255, xs).astype(np.float32))
    t0 = _t.perf_counter()
    jax.block_until_ready(fwd(x))  # compile
    import sys
    print(f"compile: {_t.perf_counter()-t0:.1f}s", file=sys.stderr)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fwd(x)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    return batch * iters / dt


def bench_torch_cpu(batch=32, iters=2):
    """Reference-equivalent torch-CPU forward as the baseline anchor."""
    import sys
    sys.path.insert(0, "/root/reference")
    try:
        import torch
        import Model_QBD  # type: ignore
    except Exception:
        return None
    finally:
        sys.path.pop(0)
    with torch.no_grad():
        q = Model_QBD.Luma_Q_Net().eval()
        bd = Model_QBD.Luma_MSBD_Net().eval()
        x = torch.rand(batch, 1, 68, 68) * 255
        q(x)  # warm
        t0 = time.perf_counter()
        for _ in range(iters):
            qt = q(x)
            bd(x, qt)
        dt = time.perf_counter() - t0
    return batch * iters / dt


def main():
    tpu_rate = bench_tpu()
    base_rate = bench_torch_cpu()
    vs = tpu_rate / base_rate if base_rate else None
    print(json.dumps({
        "metric": "ctu_partition_predictions_per_s",
        "value": round(tpu_rate, 1),
        "unit": "CTU/s",
        "vs_baseline": round(vs, 2) if vs else None,
    }))


if __name__ == "__main__":
    main()
