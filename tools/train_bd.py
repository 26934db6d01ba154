#!/usr/bin/env python3
"""Train the Q+BD (QT + MTT depth/direction) nets — the checkpoints
missing from the reference snapshot (/root/reference/
.MISSING_LARGE_BLOBS), for BOTH components.

Follows Train_QBD.py's staging (:193-429): pretrain the BD net with the
ground-truth QT input, then joint QBD fine-tune starting from the
reference Q-net weights (Luma_Q_*.pkl / Chroma_Q_*.pkl are in the
snapshot).  Saves per-QP msgpack checkpoints that
pmp/predict.CompPredictor.from_trained consumes:

  python tools/train_bd.py --data /tmp/corpus --out trained_models/bd \\
      --qps 22,27,32,37 --comps Luma,Chroma
"""
import argparse
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--qps", default="22,27,32,37")
    ap.add_argument("--comps", default="Luma")
    ap.add_argument("--bd-epochs", type=int, default=60)
    ap.add_argument("--joint-epochs", type=int, default=30)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (default: the session's "
                         "platform, i.e. the TPU chip when tunnelled)")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from pmp_vvc_tpu.models import (ChromaQNet, LumaQNet)
    from pmp_vvc_tpu.models.checkpoint import (load_reference_net,
                                               save_params)
    from pmp_vvc_tpu.train.driver import load_npy_split, train

    out = pathlib.Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    for comp in args.comps.split(","):
        is_luma = comp == "Luma"
        tag = "" if is_luma else "c"
        for qp in (int(q) for q in args.qps.split(",")):
            tr = load_npy_split(args.data, "Train", comp, qp)
            va = load_npy_split(args.data, "Validate", comp, qp)
            print(f"== {comp} QP{qp}: {len(tr[0])} train / "
                  f"{len(va[0])} val CTUs")
            # stage 2 (pre_train_BD): BD with ground-truth QT input
            bd_params, _ = train(
                "bd", tr, va, qp=qp, is_luma=is_luma,
                epochs=args.bd_epochs, lr=1e-3, decay_every=20,
                batch=args.batch,
                log_path=str(out / f"bd{tag}_qp{qp}_loss.csv"))
            # stage 3 (train_QBD): joint from the reference Q weights
            q_net = LumaQNet() if is_luma else ChromaQNet()
            shape = (1, 68, 68, 1) if is_luma else (1, 34, 34, 3)
            q_vars, _, _ = load_reference_net(
                q_net, (jnp.zeros(shape),),
                f"/root/reference/trained_models/{comp}_Q_{qp}.pkl")
            init = {"q": q_vars["params"], "bd": bd_params}
            params, rows = train(
                "qbd", tr, va, qp=qp, is_luma=is_luma,
                epochs=args.joint_epochs, lr=2e-4, decay_every=10,
                batch=args.batch, init_params=init,
                log_path=str(out / f"qbd{tag}_qp{qp}_loss.csv"))
            save_params(out / f"{comp}_BD_QP{qp}.msgpack", params["bd"])
            save_params(out / f"{comp}_Q_QP{qp}.msgpack", params["q"])
            last = rows[-1] if rows else {}
            print(f"{comp} QP{qp} final: {last}")


if __name__ == "__main__":
    main()
