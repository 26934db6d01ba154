#!/usr/bin/env python3
"""CTC-protocol evaluation harness: 4-QP sweep, ours vs the VTM(+PMP)
anchor, BD-rate/BD-PSNR summary (Analyze.h:191 + VCEG-M33 counterpart —
the reference ships no calculator; its paper protocol is QP {22,27,32,37}
over the JVET CTC classes, VVC_Test_Sequences.txt; per-level operating
points per EncModeCtrl.cpp:1242-1337).

Protocol (round 4): multi-frame (>= 8), trained BD-nets REQUIRED for
map-driven configs (pmp/predict.CompPredictor.from_trained — never
random MSBD), and two anchor arms:

- "matched": the VTM+PMP EncoderApp restricted to our device toolset
  (dual tree, MTS, MIP, CCLM, SAO, deblocking) — apples-to-apples;
- "full": the untouched CTC config — the honest absolute gap.

  python tools/ctc_eval.py --qps 22,27,32,37 --frames 8 \\
      --bd-ckpt-dir trained_models/bd --out results.md
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
MATCHED_OFF = ["--ISP=0", "--MRL=0", "--DepQuant=0", "--RDOQ=0",
               "--RDOQTS=0", "--SignHideFlag=1"]


def synth_frames(w, h, n, seed0=7):
    """Natural-statistics eval content (data/synthcontent.py) — the
    round-4 sinusoid fields could not support BD-rate conclusions
    (their 'full' anchor lost to its own 'matched' arm, BASELINE r4
    caveat (c))."""
    from pmp_vvc_tpu.data.synthcontent import natural_sequence
    return natural_sequence(w, h, n, seed0=seed0)


def psnr(a, b, peak=1023):
    mse = ((a.astype(np.int64) - b.astype(np.int64)) ** 2).mean()
    return 10 * np.log10(peak * peak / mse) if mse else 99.0


def predictors(qp, bd_dir):
    """(Luma, Chroma) CompPredictors — BD nets from OUR checkpoints
    (required: random-init MSBD is not an operating point)."""
    from pmp_vvc_tpu.pmp.predict import CompPredictor
    out = {}
    for comp in ("Luma", "Chroma"):
        q_pkl = f"/root/reference/trained_models/{comp}_Q_{qp}.pkl"
        qm = pathlib.Path(bd_dir) / f"{comp}_Q_QP{qp}.msgpack" \
            if bd_dir else None
        if qm is not None and qm.exists():
            q_pkl = str(qm)              # jointly fine-tuned Q
        bd = pathlib.Path(bd_dir) / f"{comp}_BD_QP{qp}.msgpack" \
            if bd_dir else None
        if bd is not None and bd.exists():
            out[comp] = CompPredictor.from_trained(comp == "Luma",
                                                   q_pkl, bd)
        elif comp == "Chroma":
            # chroma tree defaults to the luma maps when no chroma BD
            out[comp] = None
        else:
            raise SystemExit(
                f"missing trained BD checkpoint for {comp} QP{qp} "
                f"(looked in {bd_dir}); run tools/gen_dataset.py + "
                "tools/train_bd.py first")
    return out


def maps_for(frames, w, h, qp, bd_dir):
    """Per-frame (luma_maps, chroma_maps_or_None): chroma maps come
    from the TRAINED chroma nets when their checkpoints exist
    (Inference_QBD.py:208-239 runs both components; round 4 copied the
    luma maps into the chroma files — VERDICT r4 weak #4)."""
    from pmp_vvc_tpu.data.yuv import blocks_for_sequence
    from pmp_vvc_tpu.pmp.map2partition import blocks_to_frame_partition
    preds = predictors(qp, bd_dir)
    y8 = np.stack([(f[0] >> 2).astype(np.uint8) for f in frames])
    u8 = np.stack([(f[1] >> 2).astype(np.uint8) for f in frames])
    v8 = np.stack([(f[2] >> 2).astype(np.uint8) for f in frames])
    lin, cin = blocks_for_sequence(y8, u8, v8)
    nblk = lin.shape[0] // len(frames)
    out_l, out_c = [], []
    for i in range(len(frames)):
        qt, bt, dire = preds["Luma"].predict(
            lin[i * nblk:(i + 1) * nblk])
        out_l.append(blocks_to_frame_partition(qt, bt, dire, w, h, True))
        if preds["Chroma"] is not None:
            qt, bt, dire = preds["Chroma"].predict(
                cin[i * nblk:(i + 1) * nblk])
            out_c.append(blocks_to_frame_partition(qt, bt, dire, w, h,
                                                   False))
    return out_l, (out_c or None)


def run_ours(frames, w, h, qp, level, bd_dir):
    """Wavefront encode with the device toolset at accel level L."""
    from pmp_vvc_tpu.codec.headers import VVCConfig
    from pmp_vvc_tpu.codec.wavefront import WavefrontEncoder
    kw = dict(width=w, height=h, qp=qp, sao=True,
              deblocking_disabled=False, dual_tree=True, mts_intra=True,
              mip=True, cclm=True, lfnst=True, alf=True, ccalf=True,
              alf_chroma=True, sign_hiding=True, joint_cbcr=True,
              lmcs=True, lmcs_chroma_scaling=True, transform_skip=True,
              chroma_qp_start_minus26=-9,
              chroma_qp_points=((9, 12), (4, 5), (11, 7)),
              # CTC partition envelope (encoder_intra_vtm.cfg): without
              # these the map decider banned every MTT split and the
              # round-4 eval silently ran QT-only trees
              log2_min_cb=2, max_mtt_depth_intra=3, max_bt_intra=32,
              max_tt_intra=32)
    fmaps_l, fmaps_c = maps_for(frames, w, h, qp, bd_dir)
    # rdo_fallback = the reference's L<3 semantics (EncModeCtrl.cpp:1242
    # re-enables stock RDO beyond map coverage); lazy, free at L3
    enc = WavefrontEncoder(VVCConfig(**kw), accel_level=level,
                           rdo_fallback=True)
    cm0 = fmaps_c[0] if fmaps_c else None
    enc.encode_frame(*frames[0], maps=fmaps_l[0],
                     chroma_maps=cm0)                # compile warmup
    t0 = time.time()
    bits = 0
    ys = []
    for i, (y, u, v) in enumerate(frames):
        bs, rec = enc.encode_frame(
            y, u, v, maps=fmaps_l[i],
            chroma_maps=fmaps_c[i] if fmaps_c else None, poc=i)
        bits += len(bs) * 8
        ys.append(psnr(rec[0], y))
    return bits, float(np.mean(ys)), time.time() - t0


def run_anchor(frames, w, h, qp, bd_dir, matched):
    from pmp_vvc_tpu.data.yuv import write_yuv420
    from pmp_vvc_tpu.pmp.map2partition import write_partition_txt
    td = pathlib.Path(tempfile.mkdtemp(prefix="ctc_anchor_"))
    write_yuv420(td / "in.yuv",
                 np.stack([(f[0] >> 2).astype(np.uint8) for f in frames]),
                 np.stack([(f[1] >> 2).astype(np.uint8) for f in frames]),
                 np.stack([(f[2] >> 2).astype(np.uint8) for f in frames]))
    fmaps_l, fmaps_c = maps_for(frames, w, h, qp, bd_dir)
    pm = td / "PartitionMat"
    pm.mkdir()
    for comp, fm in (("Luma", fmaps_l),
                     ("Chroma", fmaps_c or fmaps_l)):
        write_partition_txt(pm / f"in_{comp}_QP{qp}_PartitionMat.txt",
                            fm)
    (td / "seq.cfg").write_text(
        f"InputFile: {td / 'in.yuv'}\nInputBitDepth: 8\n"
        f"InputChromaFormat: 420\nFrameRate: 30\nSourceWidth: {w}\n"
        f"SourceHeight: {h}\nFramesToBeEncoded: {len(frames)}\n"
        "Level: 2.1\n")
    t0 = time.time()
    cmd = [str(VTM_ENC), "-c", str(td / "seq.cfg"), "-c", CTC_CFG,
           "-q", str(qp), "-ts", "1", "--SEIDecodedPictureHash=1",
           "-b", str(td / "out.bin"), "-o", "/dev/null"]
    if matched:
        cmd += MATCHED_OFF
    r = subprocess.run(cmd, cwd=td, capture_output=True, text=True,
                       timeout=3600)
    assert r.returncode == 0, r.stdout[-1500:]
    dt = time.time() - t0
    bits, ydb = 0, []
    for m in re.finditer(r"POC\s+\d+.*?(\d+)\s+bits\s+\[Y\s+([\d.]+)\s+dB",
                         r.stdout):
        bits += int(m.group(1))
        ydb.append(float(m.group(2)))
    return bits, float(np.mean(ydb)), dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--qps", default="22,27,32,37")
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--width", type=int, default=192)
    ap.add_argument("--height", type=int, default=128)
    ap.add_argument("--levels", default="3",
                    help="comma accel levels (0-3) for the ours arm")
    ap.add_argument("--bd-ckpt-dir", default="trained_models/bd")
    ap.add_argument("--input", default=None)
    ap.add_argument("--out", default=None, help="append markdown here")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    # NOTE: no persistent compilation cache here — XLA:CPU AOT cache
    # entries on this host reload with a machine-feature mismatch
    # warning and have produced SIGSEGVs mid-sweep; the in-process jit
    # cache already shares compiles across levels within a QP
    from pmp_vvc_tpu.utils.bdrate import bd_psnr, bd_rate

    w, h = args.width, args.height
    if args.input:
        from pmp_vvc_tpu.data.yuv import read_yuv420
        planes = read_yuv420(args.input, w, h, args.frames)
        frames = [tuple(p[i].astype(np.int32) << 2 for p in planes)
                  for i in range(args.frames)]
    else:
        frames = synth_frames(w, h, args.frames)

    qps = [int(q) for q in args.qps.split(",")]
    levels = [int(l) for l in args.levels.split(",")]
    lines = [f"## CTC eval: {w}x{h} x{len(frames)} frames, QPs {qps}",
             "", "| QP | arm | bits | Y dB | s |", "|---|---|---|---|---|"]
    ours = {lv: [] for lv in levels}
    anch_m, anch_f = [], []
    for qp in qps:
        for lv in levels:
            o = run_ours(frames, w, h, qp, lv, args.bd_ckpt_dir)
            ours[lv].append(o)
            lines.append(f"| {qp} | ours L{lv} | {o[0]} | {o[1]:.2f} "
                         f"| {o[2]:.0f} |")
            print(lines[-1], flush=True)
        if VTM_ENC.exists():
            m = run_anchor(frames, w, h, qp, args.bd_ckpt_dir, True)
            anch_m.append(m)
            lines.append(f"| {qp} | anchor matched | {m[0]} | {m[1]:.2f}"
                         f" | {m[2]:.0f} |")
            print(lines[-1], flush=True)
            fl = run_anchor(frames, w, h, qp, args.bd_ckpt_dir, False)
            anch_f.append(fl)
            lines.append(f"| {qp} | anchor full CTC | {fl[0]} | "
                         f"{fl[1]:.2f} | {fl[2]:.0f} |")
            print(lines[-1], flush=True)
    if len(qps) >= 4 and anch_m:
        lines.append("")
        for name, anch in (("matched", anch_m), ("full-CTC", anch_f)):
            for lv in levels:
                o = ours[lv]
                bdr = bd_rate([a[0] for a in anch], [a[1] for a in anch],
                              [x[0] for x in o], [x[1] for x in o])
                bdp = bd_psnr([a[0] for a in anch], [a[1] for a in anch],
                              [x[0] for x in o], [x[1] for x in o])
                ts = 1 - sum(x[2] for x in o) / sum(a[2] for a in anch)
                lines.append(
                    f"**L{lv} vs {name} anchor: BD-rate {bdr:+.1f}%  "
                    f"BD-PSNR {bdp:+.2f} dB  time saving {ts:+.0%}**")
                print(lines[-1])
    if args.out:
        with open(args.out, "a") as f:
            f.write("\n".join(lines) + "\n")


if __name__ == "__main__":
    main()
