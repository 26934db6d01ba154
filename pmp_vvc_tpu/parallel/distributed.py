"""Multi-host (multi-process) bootstrap — the DCN story.

The reference has no distributed backend at all (SURVEY §2.4: single
process, file-based handoff; ``nn.DataParallel`` hides single-host GPU
comm).  The TPU-native design (SURVEY §7.7) shards FRAMES and CTU
batches across hosts over DCN while each host's chips form the
ICI mesh:

- ``initialize()`` brings up the JAX distributed runtime
  (coordinator + process grid, ``jax.distributed.initialize``);
- ``global_mesh()`` builds the 1-D dp mesh over ALL hosts' devices;
- ``host_shard()`` turns process-LOCAL numpy batches into global
  sharded arrays (``jax.make_array_from_process_local_data``), so the
  existing pjit train/infer steps run unchanged — XLA inserts the
  gradient psum across hosts (DCN) exactly as it does across chips
  (ICI).

All-intra frames are independent, so the encoder's multi-host mode is
frame sharding: each host encodes its own POC range (bitstreams
concatenate after the parameter sets) and only training/eval traffic
crosses hosts.  Tested with a 2-process CPU mesh
(tests/test_multihost.py) reproducing the single-process parameters
bit-for-bit.
"""
from __future__ import annotations

import os

import numpy as np


def initialize(coordinator: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> bool:
    """Bring up jax.distributed from args or env (JAX_COORDINATOR,
    JAX_NUM_PROCESSES, JAX_PROCESS_ID).  Returns True if a multi-
    process runtime was started, False for the single-process case."""
    import jax
    coordinator = coordinator or os.environ.get("JAX_COORDINATOR")
    num_processes = num_processes if num_processes is not None else \
        int(os.environ.get("JAX_NUM_PROCESSES", "1"))
    process_id = process_id if process_id is not None else \
        int(os.environ.get("JAX_PROCESS_ID", "0"))
    if num_processes <= 1:
        return False
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)
    return True


def global_mesh(axis: str = "dp"):
    """1-D mesh over every device of every process."""
    import jax
    from jax.sharding import Mesh
    return Mesh(np.asarray(jax.devices()).reshape(-1), (axis,))


def host_shard(mesh, tree, axis: str = "dp"):
    """Process-local numpy batch shards -> global sharded arrays.

    Each process passes ITS slice of the global batch (equal sizes);
    the result is one logical array sharded over the global mesh."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(
            sharding, np.asarray(x)), tree)


def process_frame_range(n_frames: int) -> range:
    """The POC range THIS process encodes under frame sharding (AI
    frames are independent; SURVEY §7.7 'exploit first')."""
    import jax
    pid, n = jax.process_index(), jax.process_count()
    per = (n_frames + n - 1) // n
    return range(pid * per, min((pid + 1) * per, n_frames))
