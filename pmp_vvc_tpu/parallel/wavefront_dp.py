"""CU-batch data parallelism for the wavefront encoder.

Shards the per-wave size-bucket arrays (CU coordinates, availability
masks, validity) across a 1-D ``dp`` device mesh while the frame planes
(recon + originals) stay replicated.  XLA then partitions the whole
fused wave step — reference gather, substitution, 67-mode intra
prediction, SATD argmin, transform/quant roundtrip — over the CU axis
and all-gathers only the tiny recon scatter, riding ICI.

Replaces the reference's disabled CU-split job scheduler
(Lib/CommonLib/TypeDef.h:241 ENABLE_SPLIT_PARALLELISM, Picture.h:295)
with a data-parallel formulation: the PMP map makes CU *decisions*
independent, so no inter-device mode negotiation is needed — only the
recon halo, which the wave schedule already serialises.

Everything is integer arithmetic, so sharded and single-device encodes
produce identical bitstreams (tested on an 8-virtual-device CPU mesh in
tests/test_multichip_encode.py).
"""
from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "dp") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(devs, (axis,))


def cu_batch_shardings(mesh: Mesh, axis: str = "dp"):
    """(in_shardings, out_shardings) for wavefront._wave_step's
    signature: planes/orgs replicated, per-CU arrays sharded on the CU
    axis; outputs mirror the inputs (planes replicated, levels
    sharded)."""
    rep = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P(axis))
    ins = (rep, rep, rep,          # recon y/u/v
           rep, rep, rep,          # org y/u/v
           shard, shard,           # xs, ys
           shard, shard, shard,    # luma avail top/left/corner
           shard, shard, shard,    # chroma avail top/left/corner
           shard)                  # valid
    outs = (rep, rep, rep,         # recon planes
            shard, shard, shard, shard)   # best, lev_y, lev_u, lev_v
    return ins, outs
