"""pmp_vvc_tpu — TPU-native partition-map-prediction framework for fast VVC intra encoding.

A from-scratch JAX/XLA/Pallas rebuild with the capabilities of the
PMP-VVC-TIP2023 reference (Down-Up-CNN partition prediction + map-driven
VVC all-intra encoder acceleration), designed TPU-first:

- ``models``   : Down-Up-CNN partition predictors (flax, NHWC, MXU-friendly)
- ``ops``      : Pallas/XLA compute kernels (SATD, transforms, intra pred, quant)
- ``pmp``      : partition-map post-processing (map -> partition reconciliation)
- ``train``    : losses + multi-stage training with pjit data parallelism
- ``data``     : YUV ingest, CTU blocking, dataset/label synthesis
- ``codec``    : map-driven VVC all-intra encoder (RDO, entropy, pipeline)
- ``parallel`` : device mesh, shardings, halo exchange collectives
- ``core``     : frame/partition tensor model and constants
"""

__version__ = "0.1.0"
