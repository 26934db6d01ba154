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


def _synth_frames(w, h, n):
    frames = []
    yy, xx = np.mgrid[0:h, 0:w]
    for i in range(n):
        rng = np.random.RandomState(7 + i)
        y = (np.clip(128 + 60 * np.sin(xx / 17.0 + i * 0.3)
                     * np.cos(yy / 23.0)
                     + rng.randn(h, w) * 6, 0, 255).astype(np.int32) << 2)
        u = ((128 + 40 * np.sin(xx[::2, ::2] / 31.0)).astype(np.int32) << 2)
        v = ((128 + 40 * np.cos(yy[::2, ::2] / 29.0)).astype(np.int32) << 2)
        frames.append((y, u, v))
    return frames


def _ensure_anchor(w, h, y, u, v, qp=32):
    """Self-contained anchor inputs for the VTM+PMP EncoderApp (it
    hard-requires PartitionMat files, EncAppCfg.cpp:4255): YUV + cfg +
    Q-net-predicted PartitionMat under /tmp/bench_anchor416."""
    import pathlib
    d = pathlib.Path(f"/tmp/bench_anchor{w}")
    if (d / "seq.cfg").exists():
        return d
    from pmp_vvc_tpu.data.yuv import blocks_for_sequence, write_yuv420
    from pmp_vvc_tpu.pmp.map2partition import (blocks_to_frame_partition,
                                               write_partition_txt)
    from pmp_vvc_tpu.pmp.predict import CompPredictor
    d.mkdir(parents=True, exist_ok=True)
    y8 = (y >> 2).astype(np.uint8)[None]
    u8 = (u >> 2).astype(np.uint8)[None]
    v8 = (v >> 2).astype(np.uint8)[None]
    write_yuv420(d / "in.yuv", y8, u8, v8)
    lin, cin = blocks_for_sequence(y8, u8, v8)
    pm = d / "PartitionMat"
    pm.mkdir(exist_ok=True)
    for comp, blocks in (("Luma", lin), ("Chroma", cin)):
        pred = CompPredictor.from_reference_checkpoints(
            comp == "Luma",
            f"/root/reference/trained_models/{comp}_Q_{qp}.pkl")
        qt, bt, dire = pred.predict(blocks)
        maps = blocks_to_frame_partition(qt, bt, dire, w, h,
                                         comp == "Luma")
        write_partition_txt(pm / f"in_{comp}_QP{qp}_PartitionMat.txt",
                            [maps])
    (d / "seq.cfg").write_text(
        f"InputFile: {d / 'in.yuv'}\nInputBitDepth: 8\n"
        f"InputChromaFormat: 420\nFrameRate: 30\nSourceWidth: {w}\n"
        f"SourceHeight: {h}\nFramesToBeEncoded: 1\nLevel: 2.1\n")
    return d


def bench_encoder(frames=16):
    """Headline: all-intra ENCODE throughput of the batched wavefront
    path (device CU compute + host CABAC) on class-D-sized content
    (416x240, the reference demo sequence geometry; codec/demo/README).
    Frames are batched through encode_frames — AI frames are
    independent, so waves of all frames fuse into one device scan.

    Baseline: the reference VTM-10.0+PMP EncoderApp (CTC all-intra, L3)
    on identical content/QP, measured live on this host; the anchor
    inputs are generated here (no pre-existing /tmp state needed)."""
    import pathlib
    import subprocess
    import sys

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from pmp_vvc_tpu.codec.headers import VVCConfig
    from pmp_vvc_tpu.codec.wavefront import WavefrontEncoder

    w, h = 416, 240
    fr = _synth_frames(w, h, frames)

    enc = WavefrontEncoder(VVCConfig(width=w, height=h, qp=32, sao=True,
                                     deblocking_disabled=False))
    t0 = time.perf_counter()
    enc.encode_frames(fr)                # compile at the MEASURED batch
    print(f"encoder compile+first: {time.perf_counter()-t0:.1f}s",
          file=sys.stderr)
    t0 = time.perf_counter()
    outs = enc.encode_frames(fr)
    dt = time.perf_counter() - t0
    assert len(outs) == frames
    fps = frames / dt
    print(f"warm batched encode: {dt:.2f}s for {frames} frames",
          file=sys.stderr)

    # anchor: live-measured VTM+PMP EncoderApp on the same content
    anchor_fps = None
    exe = pathlib.Path("/tmp/vtm_oracle/EncoderApp")
    if exe.exists():
        try:
            d = _ensure_anchor(w, h, *fr[0])
            t0 = time.perf_counter()
            r = subprocess.run(
                [str(exe), "-c", str(d / "seq.cfg"), "-c",
                 "/root/reference/codec/demo/cfg/encoder_intra_vtm.cfg",
                 "-q", "32", "-ts", "1", "-b", "/dev/null",
                 "-o", "/dev/null"],
                cwd=d, capture_output=True, text=True, timeout=1200)
            if r.returncode == 0:
                anchor_fps = 1.0 / (time.perf_counter() - t0)
            else:
                print(f"anchor failed: {r.stdout[-500:]}", file=sys.stderr)
        except Exception as e:
            print(f"anchor skipped: {e}", file=sys.stderr)
    return fps, anchor_fps


def main():
    fps, anchor_fps = bench_encoder()
    print(json.dumps({
        "metric": "ai_encode_frames_per_s_416x240",
        "value": round(fps, 3),
        "unit": "frames/s/chip",
        "vs_baseline": round(fps / anchor_fps, 2) if anchor_fps else None,
        "anchor": "live VTM+PMP EncoderApp" if anchor_fps else "absent",
    }))
    # secondary (stderr): CNN partition-prediction throughput
    import sys
    try:
        tpu_rate = bench_tpu()
        base_rate = bench_torch_cpu()
        vs = tpu_rate / base_rate if base_rate else None
        print(json.dumps({
            "metric": "ctu_partition_predictions_per_s",
            "value": round(tpu_rate, 1),
            "unit": "CTU/s",
            "vs_baseline": round(vs, 2) if vs else None,
        }), file=sys.stderr)
    except Exception as e:
        print(f"cnn bench skipped: {e}", file=sys.stderr)


if __name__ == "__main__":
    main()
