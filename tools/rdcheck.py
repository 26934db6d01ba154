#!/usr/bin/env python3
"""RD spot-check on the baseline synthetic content (BASELINE.md round-1
table): encodes the 192x128 synth frame at QP 32 in a few configs and
prints bits / PSNR, for tracking the RD gap vs the VTM+PMP anchor
(anchor on this content: 1,944 bits, 32.60 dB luma; see BASELINE.md)."""
import argparse
import pathlib
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def synth(w, h, seed=7):
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    y8 = np.clip(128 + 60 * np.sin(xx / 17.0) * np.cos(yy / 23.0)
                 + rng.randn(h, w) * 6, 0, 255)
    y = (y8.astype(np.int32) << 2)
    u = ((128 + 40 * np.sin(xx[::2, ::2] / 31.0)).astype(np.int32) << 2)
    v = ((128 + 40 * np.cos(yy[::2, ::2] / 29.0)).astype(np.int32) << 2)
    return y, u, v


def psnr(a, b, peak=1023):
    mse = ((a.astype(np.int64) - b.astype(np.int64)) ** 2).mean()
    return 10 * np.log10(peak * peak / mse) if mse else 99.0


def run_anchor(y, u, v, qp, get_maps):
    """Encode the same frame with the reference VTM+PMP EncoderApp driven
    by the same predicted PartitionMat files (codec/demo/README.md flow);
    returns (bits, psnrY, psnrU, psnrV) parsed from the encoder log."""
    import re
    import tempfile

    from pmp_vvc_tpu.data.yuv import write_yuv420
    from pmp_vvc_tpu.pmp.map2partition import write_partition_txt

    get_maps()   # ensure the same map derivation ran (not strictly needed)
    td = pathlib.Path(tempfile.mkdtemp(prefix="rdanchor_"))
    h, w = y.shape
    seq = td / f"synth_{w}x{h}_30.yuv"
    write_yuv420(seq, (y >> 2).astype(np.uint8)[None],
                 (u >> 2).astype(np.uint8)[None],
                 (v >> 2).astype(np.uint8)[None])
    # PartitionMat via the full pipeline (same as the e2e test)
    from pmp_vvc_tpu.pmp.pipeline import predict_sequence
    from pmp_vvc_tpu.pmp.predict import CompPredictor
    preds = {
        (comp, qp): CompPredictor.from_reference_checkpoints(
            comp == "Luma",
            f"/root/reference/trained_models/{comp}_Q_{qp}.pkl")
        for comp in ("Luma", "Chroma")
    }
    predict_sequence(seq, w, h, predictors=preds,
                     out_dir=td / "PartitionMat",
                     seq_name=f"synth_{w}x{h}_30", subsample=1, qps=(qp,))
    seq_cfg = td / "seq.cfg"
    seq_cfg.write_text(f"""InputFile: {seq}
InputBitDepth: 8
InputChromaFormat: 420
FrameRate: 30
FrameSkip: 0
SourceWidth: {w}
SourceHeight: {h}
FramesToBeEncoded: 1
Level: 2.1
""")
    r = subprocess.run(
        ["/tmp/vtm_oracle/EncoderApp", "-c", str(seq_cfg), "-c",
         "/root/reference/codec/demo/cfg/encoder_intra_vtm.cfg",
         "-q", str(qp), "-ts", "1", "--SEIDecodedPictureHash=1",
         "-b", str(td / "out.bin"), "-o", "/dev/null"],
        cwd=td, capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    m = re.search(r"POC\s+0.*?(\d+)\s+bits\s+\[Y\s+([\d.]+)\s+dB\s+"
                  r"U\s+([\d.]+)\s+dB\s+V\s+([\d.]+)\s+dB",
                  r.stdout)
    assert m, r.stdout[-3000:]
    return (int(m.group(1)), float(m.group(2)), float(m.group(3)),
            float(m.group(4)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--qp", type=int, default=32)
    ap.add_argument("--configs", default="qt-satd,qt-rd,ctc-rd")
    ap.add_argument("--decode", action="store_true",
                    help="verify each stream in the stock VTM decoder")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    from pmp_vvc_tpu.codec.encoder import FrameEncoder
    from pmp_vvc_tpu.codec.headers import VVCConfig

    w, h = 192, 128
    y, u, v = synth(w, h)

    def ctc_cfg():
        return VVCConfig(
            width=w, height=h, qp=args.qp, dual_tree=True, mts_intra=True,
            lfnst=True, mip=True, mrl=True, isp=True, cclm=True,
            joint_cbcr=True, dep_quant=True, sign_hiding=False,
            lmcs=True, lmcs_chroma_scaling=True, sao=True, alf=True,
            alf_chroma=True, ccalf=True, deblocking_disabled=False,
            chroma_qp_start_minus26=-9,
            chroma_qp_points=((9, 12), (4, 5), (11, 7)))

    maps_cache = {}

    def get_maps():
        """Predicted partition maps from the bundled trained Q-nets
        (luma + chroma), identical to what drives the anchor."""
        if "m" in maps_cache:
            return maps_cache["m"]
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
                f"/root/reference/trained_models/{comp}_Q_{args.qp}.pkl")
            qt, bt, dire = pred.predict(blocks)
            out[comp] = blocks_to_frame_partition(qt, bt, dire, w, h,
                                                  comp == "Luma")
        maps_cache["m"] = (out["Luma"], out["Chroma"])
        return maps_cache["m"]

    rows = []
    for name in args.configs.split(","):
        t0 = time.time()
        if name == "anchor":
            bits, py_, pu, pv = run_anchor(y, u, v, args.qp, get_maps)
            rows.append((name, bits, py_, pu, pv, time.time() - t0))
            continue
        if name == "qt-satd":
            enc = FrameEncoder(VVCConfig(width=w, height=h, qp=args.qp),
                               mode_select="satd")
            bs, rec = enc.encode_frame(y, u, v)
        elif name == "qt-rd":
            enc = FrameEncoder(VVCConfig(width=w, height=h, qp=args.qp),
                               mode_select="rd")
            bs, rec = enc.encode_frame(y, u, v)
        elif name == "ctc-rd":
            enc = FrameEncoder(ctc_cfg(), mode_select="rd")
            bs, rec = enc.encode_frame(y, u, v)
        elif name == "ctc-satd":
            enc = FrameEncoder(ctc_cfg(), mode_select="satd")
            bs, rec = enc.encode_frame(y, u, v)
        elif name in ("maps-rd", "maps-satd"):
            lmaps, cmaps = get_maps()
            enc = FrameEncoder(ctc_cfg(), mode_select=name.split("-")[1])
            bs, rec = enc.encode_frame(y, u, v, maps=lmaps,
                                       chroma_maps=cmaps)
        elif name == "maps-rd-fb":
            lmaps, cmaps = get_maps()
            enc = FrameEncoder(ctc_cfg(), mode_select="rd",
                               rdo_fallback=True)
            bs, rec = enc.encode_frame(y, u, v, maps=lmaps,
                                       chroma_maps=cmaps)
        elif name == "rdo":
            enc = FrameEncoder(ctc_cfg(), mode_select="rd")
            bs, rec = enc.encode_frame(y, u, v, rdo=True)
        else:
            print("unknown config", name, file=sys.stderr)
            continue
        dt = time.time() - t0
        rows.append((name, len(bs) * 8, psnr(rec[0], y), psnr(rec[1], u),
                     psnr(rec[2], v), dt))
        if args.decode:
            open(f"/tmp/rdcheck_{name}.bin", "wb").write(bs)
            r = subprocess.run(["/tmp/vtm_oracle/DecoderApp", "-b",
                                f"/tmp/rdcheck_{name}.bin", "-o",
                                f"/tmp/rdcheck_{name}.yuv"],
                               capture_output=True, text=True)
            ok = "(OK)" in r.stdout and r.returncode == 0
            print(f"  {name}: decode {'OK' if ok else 'FAIL'}")
            if not ok:
                sys.exit(1)

    print(f"{'config':10s} {'bits':>7s} {'Y':>6s} {'U':>6s} {'V':>6s} "
          f"{'sec':>6s}")
    for name, bits, py_, pu, pv, dt in rows:
        print(f"{name:10s} {bits:7d} {py_:6.2f} {pu:6.2f} {pv:6.2f} "
              f"{dt:6.1f}")
    print("anchor (VTM+PMP CTC, BASELINE.md): 1944 bits  32.60 dB luma")


if __name__ == "__main__":
    main()
