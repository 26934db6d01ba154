#!/usr/bin/env python3
"""CTC-protocol evaluation harness: 4-QP sweep, ours vs the VTM(+PMP)
anchor, BD-rate/BD-PSNR summary (Analyze.h:191 + VCEG-M33 counterpart —
the reference ships no calculator; its paper protocol is QP {22,27,32,37}
over the JVET CTC classes, VVC_Test_Sequences.txt).

Content: a real YUV (--input WxH) or the synthetic baseline frame.
Anchor: the locally built VTM-10.0+PMP EncoderApp driven by the same
predicted PartitionMat (the end-to-end reference flow); skipped (ours
only) when the binary is absent.

  python tools/ctc_eval.py --qps 22,27,32,37 --config rdo-tools-off
  python tools/ctc_eval.py --input BQSquare_416x240.yuv --width 416 \\
      --height 240 --config maps-satd --out results.md
"""
import argparse
import pathlib
import re
import subprocess
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

VTM_ENC = pathlib.Path("/tmp/vtm_oracle/EncoderApp")
CTC_CFG = "/root/reference/codec/demo/cfg/encoder_intra_vtm.cfg"


def synth(w, h, seed=7):
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    y8 = np.clip(128 + 60 * np.sin(xx / 17.0) * np.cos(yy / 23.0)
                 + rng.randn(h, w) * 6, 0, 255)
    return ((y8.astype(np.int32) << 2),
            ((128 + 40 * np.sin(xx[::2, ::2] / 31.0)).astype(np.int32) << 2),
            ((128 + 40 * np.cos(yy[::2, ::2] / 29.0)).astype(np.int32) << 2))


def psnr(a, b, peak=1023):
    mse = ((a.astype(np.int64) - b.astype(np.int64)) ** 2).mean()
    return 10 * np.log10(peak * peak / mse) if mse else 99.0


def predicted_maps(y, u, v, w, h, qp):
    from pmp_vvc_tpu.data.yuv import blocks_for_sequence
    from pmp_vvc_tpu.pmp.map2partition import blocks_to_frame_partition
    from pmp_vvc_tpu.pmp.predict import CompPredictor
    y8 = (y >> 2).astype(np.uint8)[None]
    u8 = (u >> 2).astype(np.uint8)[None]
    v8 = (v >> 2).astype(np.uint8)[None]
    lin, cin = blocks_for_sequence(y8, u8, v8)
    out = {}
    for comp, blocks in (("Luma", lin), ("Chroma", cin)):
        pred = CompPredictor.from_reference_checkpoints(
            comp == "Luma",
            f"/root/reference/trained_models/{comp}_Q_{qp}.pkl")
        qt, bt, dire = pred.predict(blocks)
        out[comp] = blocks_to_frame_partition(qt, bt, dire, w, h,
                                              comp == "Luma")
    return out


def run_ours(y, u, v, w, h, qp, config):
    from pmp_vvc_tpu.codec.encoder import FrameEncoder
    from pmp_vvc_tpu.codec.headers import VVCConfig
    from pmp_vvc_tpu.codec.wavefront import WavefrontEncoder
    kw = dict(width=w, height=h, qp=qp, chroma_qp_start_minus26=-9,
              chroma_qp_points=((9, 12), (4, 5), (11, 7)))
    t0 = time.time()
    if config == "rdo-tools-off":
        enc = FrameEncoder(VVCConfig(deblocking_disabled=True, **kw),
                           mode_select="rd")
        bs, rec = enc.encode_frame(y, u, v, rdo=True)
    elif config == "wavefront":
        enc = WavefrontEncoder(VVCConfig(sao=True, **kw))
        bs, rec = enc.encode_frame(y, u, v)
    elif config == "maps-satd":
        maps = predicted_maps(y, u, v, w, h, qp)
        enc = FrameEncoder(VVCConfig(sao=True, **kw), mode_select="satd")
        bs, rec = enc.encode_frame(y, u, v, maps=maps["Luma"])
    else:
        raise SystemExit(f"unknown config {config}")
    return (len(bs) * 8, psnr(rec[0], y), psnr(rec[1], u),
            psnr(rec[2], v), time.time() - t0)


def run_anchor(y, u, v, w, h, qp):
    from pmp_vvc_tpu.data.yuv import write_yuv420
    from pmp_vvc_tpu.pmp.map2partition import write_partition_txt
    td = pathlib.Path(tempfile.mkdtemp(prefix="ctc_anchor_"))
    seq = td / "in.yuv"
    write_yuv420(seq, (y >> 2).astype(np.uint8)[None],
                 (u >> 2).astype(np.uint8)[None],
                 (v >> 2).astype(np.uint8)[None])
    maps = predicted_maps(y, u, v, w, h, qp)
    pm = td / "PartitionMat"
    pm.mkdir()
    for comp in ("Luma", "Chroma"):
        write_partition_txt(pm / f"in_{comp}_QP{qp}_PartitionMat.txt",
                            [maps[comp]])
    (td / "seq.cfg").write_text(
        f"InputFile: {seq}\nInputBitDepth: 8\nInputChromaFormat: 420\n"
        f"FrameRate: 30\nSourceWidth: {w}\nSourceHeight: {h}\n"
        f"FramesToBeEncoded: 1\nLevel: 2.1\n")
    t0 = time.time()
    r = subprocess.run(
        [str(VTM_ENC), "-c", str(td / "seq.cfg"), "-c", CTC_CFG,
         "-q", str(qp), "-ts", "1", "--SEIDecodedPictureHash=1",
         "-b", str(td / "out.bin"), "-o", "/dev/null"],
        cwd=td, capture_output=True, text=True, timeout=1200)
    assert r.returncode == 0, r.stdout[-1500:]
    m = re.search(r"POC\s+0.*?(\d+)\s+bits\s+\[Y\s+([\d.]+)\s+dB\s+"
                  r"U\s+([\d.]+)\s+dB\s+V\s+([\d.]+)", r.stdout)
    return (int(m.group(1)), float(m.group(2)), float(m.group(3)),
            float(m.group(4)), time.time() - t0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--qps", default="22,27,32,37")
    ap.add_argument("--config", default="rdo-tools-off")
    ap.add_argument("--input", default=None)
    ap.add_argument("--width", type=int, default=192)
    ap.add_argument("--height", type=int, default=128)
    ap.add_argument("--out", default=None, help="append markdown here")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    from pmp_vvc_tpu.utils.bdrate import bd_psnr, bd_rate

    w, h = args.width, args.height
    if args.input:
        from pmp_vvc_tpu.data.yuv import read_yuv420
        y, u, v = (p[0].astype(np.int32) << 2 for p in
                   read_yuv420(args.input, w, h, 1))
    else:
        y, u, v = synth(w, h)

    qps = [int(q) for q in args.qps.split(",")]
    ours, anch = [], []
    lines = [f"## CTC eval: {args.config} {w}x{h} QPs {qps}", "",
             "| QP | ours bits / Y dB / s | anchor bits / Y dB / s |",
             "|---|---|---|"]
    for qp in qps:
        o = run_ours(y, u, v, w, h, qp, args.config)
        ours.append(o)
        a = None
        if VTM_ENC.exists():
            a = run_anchor(y, u, v, w, h, qp)
            anch.append(a)
        lines.append(
            f"| {qp} | {o[0]} / {o[1]:.2f} / {o[4]:.0f} | "
            + (f"{a[0]} / {a[1]:.2f} / {a[4]:.0f} |" if a else "- |"))
        print(lines[-1], flush=True)
    if len(anch) == len(qps) and len(qps) >= 4:
        bdr = bd_rate([a[0] for a in anch], [a[1] for a in anch],
                      [o[0] for o in ours], [o[1] for o in ours])
        bdp = bd_psnr([a[0] for a in anch], [a[1] for a in anch],
                      [o[0] for o in ours], [o[1] for o in ours])
        ts = 1 - sum(o[4] for o in ours) / sum(a[4] for a in anch)
        lines += ["", f"**BD-rate (luma): {bdr:+.1f}%  "
                  f"BD-PSNR: {bdp:+.2f} dB  time saving: {ts:+.0%}**"]
        print(lines[-1])
    if args.out:
        with open(args.out, "a") as f:
            f.write("\n".join(lines) + "\n")


if __name__ == "__main__":
    main()
