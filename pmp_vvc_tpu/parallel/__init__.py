"""Multi-device execution strategies.

The reference's only parallelism is single-host multi-GPU
``nn.DataParallel`` for the CNN (Train_QBD.py:130) plus a disabled
CU-split scheduler (TypeDef.h:241 ENABLE_SPLIT_PARALLELISM=0).  The
TPU-native equivalents here:

- CNN train/inference dp: NamedSharding over the CTU batch
  (train/trainer.py, pmp/predict.py — mesh-aware already).
- Encoder CU-batch dp (this package): the wavefront engine's per-wave
  size buckets are sharded across a device mesh — every CU of a wave
  bucket runs its reference gather / 67-mode prediction / SATD select /
  TQ roundtrip on its own shard while the recon planes stay replicated
  (integer math -> shard placement cannot change the bits).
- Frame dp: all-intra frames are independent; the CLI exposes a host
  process pool (--jobs) and frames can also be round-robined across
  meshes by the caller.
"""
from .wavefront_dp import wave_scan_shardings, make_mesh

__all__ = ["wave_scan_shardings", "make_mesh"]
