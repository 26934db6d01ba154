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


def wave_scan_shardings(mesh: Mesh, n_classes: int, axis: str = "dp"):
    """(in_shardings, out_shardings) for wavefront._wave_scan's fused
    signature ``f(ry, ru, rv, cY, cU, cV, mg, tg, pg, cg, lg, oy, ou, ov,
    og4, og4c, *scheds)``: every frame plane replicated, each packed (S, B, 7)
    schedule sharded on its per-CU batch axis — XLA partitions every
    step of the device-resident scan (reference gather, substitution,
    67-mode intra prediction, SATD argmin, transform/quant roundtrip)
    over the CU axis and all-gathers only the tiny recon/level
    scatters, riding ICI.  Integer math keeps sharded and
    single-device bitstreams identical."""
    rep = NamedSharding(mesh, P())
    shard_b = NamedSharding(mesh, P(None, axis))   # sched (S, B, 7)
    ins = (rep,) * 11 + (rep,) * 5 + (shard_b,) * n_classes
    outs = (rep,) * 11
    return ins, outs
