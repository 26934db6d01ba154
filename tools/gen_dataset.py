#!/usr/bin/env python3
"""Dataset generation from OUR encoder's RDO decisions — the native
counterpart of the reference's Save_Depth pipeline (DecLib.cpp:998 dump
-> CreateDataSet.py -> GenMSBtMap.py): encode frames with the full RDO
split search, reconstruct each 64x64 block's tree from the chosen
leaves, derive (QT-depth, 3-layer MTT-depth, 3-layer direction) labels,
and write the reference .npy layout that cli/train.py consumes.

  python tools/gen_dataset.py --out data/ --frames 8 --size 128 \\
      --qp 32 [--input seq.yuv --width W --height H] [--mtt]

The QTMT search runs on the device-batched open-loop RDO
(codec/rdo_device.py, seconds per frame); --host-rdo selects the exact
sequential host recursion instead (minutes per frame).
"""
import argparse
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def synth_frame(w, h, seed):
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    fx, fy = rng.uniform(8, 40, 2)
    amp = rng.uniform(20, 80)
    y8 = np.clip(128 + amp * np.sin(xx / fx) * np.cos(yy / fy)
                 + rng.randn(h, w) * rng.uniform(2, 12), 0, 255)
    u8 = 128 + 40 * np.sin(xx[::2, ::2] / (fx * 2))
    v8 = 128 + 40 * np.cos(yy[::2, ::2] / (fy * 2))
    return (y8.astype(np.int32) << 2, u8.astype(np.int32) << 2,
            v8.astype(np.int32) << 2)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--size", type=int, default=128,
                    help="synthetic frame size (square)")
    ap.add_argument("--qp", type=int, default=32)
    ap.add_argument("--mtt", action="store_true",
                    help="full QTMT RDO instead of QT-only")
    ap.add_argument("--host-rdo", action="store_true",
                    help="exact sequential host RDO (slow)")
    ap.add_argument("--input", default=None)
    ap.add_argument("--width", type=int, default=None)
    ap.add_argument("--height", type=int, default=None)
    ap.add_argument("--split", default="Train",
                    help="output split prefix (Train/Validate/TestSub)")
    ap.add_argument("--seed0", type=int, default=100,
                    help="base seed for synthetic frames")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    from pmp_vvc_tpu.codec.encoder import FrameEncoder
    from pmp_vvc_tpu.codec.headers import VVCConfig
    from pmp_vvc_tpu.data.labels import labels_from_tree, tree_from_leaves
    from pmp_vvc_tpu.data.yuv import blocks_for_sequence, read_yuv420

    out = pathlib.Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    xs, qts, bts, dires = [], [], [], []
    for f in range(args.frames):
        if args.input:
            w, h = args.width, args.height
            y, u, v = (p[f].astype(np.int32) << 2 for p in
                       read_yuv420(args.input, w, h, f + 1))
        else:
            w = h = args.size
            y, u, v = synth_frame(w, h, seed=args.seed0 + f)
        kw = dict(width=w, height=h, qp=args.qp, deblocking_disabled=True,
                  chroma_qp_start_minus26=-9,
                  chroma_qp_points=((9, 12), (4, 5), (11, 7)))
        if args.mtt:
            kw.update(log2_min_cb=3, max_mtt_depth_intra=3,
                      max_bt_intra=32, max_tt_intra=32)
        t0 = time.time()
        if args.host_rdo:
            enc = FrameEncoder(VVCConfig(**kw), mode_select="rd")
            enc.encode_frame(y, u, v, rdo=True)
        else:
            from pmp_vvc_tpu.codec.wavefront import WavefrontEncoder
            enc = WavefrontEncoder(VVCConfig(**kw))
            enc.encode_frame(y, u, v, rdo=True)
        print(f"frame {f}: RDO encode {time.time()-t0:.0f}s, "
              f"{len(enc.leaf_l)} CUs", file=sys.stderr)
        # input blocks (68x68 luma with 4-px TL halo) + per-block labels
        lin, _ = blocks_for_sequence((y >> 2).astype(np.uint8)[None],
                                     (u >> 2).astype(np.uint8)[None],
                                     (v >> 2).astype(np.uint8)[None])
        bi = 0
        for by in range(0, h, 64):
            for bx in range(0, w, 64):
                tree = tree_from_leaves(enc.leaf_l, bx, by)
                qt8, msbt, msdire = labels_from_tree(tree)
                xs.append(lin[bi])
                qts.append(qt8)
                bts.append(msbt)
                dires.append(msdire)
                bi += 1
    pre = f"{args.split}"
    np.save(out / f"{pre}_Y_Block68.npy",
            np.asarray(xs, np.float32).reshape(len(xs), 68, 68))
    np.save(out / f"{pre}_Luma_QP{args.qp}_QTdepth_Block8.npy",
            np.asarray(qts, np.uint8))
    np.save(out / f"{pre}_Luma_QP{args.qp}_MSBTdepth_Block16.npy",
            np.asarray(bts, np.uint8))
    np.save(out / f"{pre}_Luma_QP{args.qp}_MSdirection_Block16.npy",
            np.asarray(dires, np.int8))
    print(f"wrote {len(xs)} samples to {out}")


if __name__ == "__main__":
    main()
