"""Checkpoint I/O.

Two formats:
- Native: flax msgpack (``save_params``/``load_params``) — used by our
  training loop.
- Import: the reference's torch ``state_dict`` pickles
  (/root/reference/trained_models/*.pkl, saved by Train_QBD.py:423-429 with
  a DataParallel ``module.`` prefix and tolerant partial load semantics,
  Metrics.py:682-700). ``import_torch_state_dict`` remaps names and
  conv-kernel axes (OIHW -> HWIO) into our flax NHWC param trees.

torch is used only to unpickle; nothing in the compute path depends on it.
"""
from __future__ import annotations

import pathlib
import re
from typing import Any, Mapping

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization
from flax.core import freeze, unfreeze


def save_params(path: str | pathlib.Path, params) -> None:
    path = pathlib.Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_bytes(serialization.to_bytes(params))


def load_params(path: str | pathlib.Path, template):
    return serialization.from_bytes(template, pathlib.Path(path).read_bytes())


def _strip_prefix(state: Mapping[str, Any]) -> dict[str, Any]:
    if "state_dict" in state:
        state = state["state_dict"]
    return {re.sub(r"^module\.", "", k): v for k, v in state.items()}


def _torch_key_to_flax_path(key: str) -> tuple[str, ...] | None:
    """Map a reference state_dict key to a flax param path (sans leaf name).

    Examples:
      conv_q1.weight                -> (conv_q1,)
      resblock_q1.left.0.weight     -> (resblock_q1, conv1)
      resblock_q1.left.2.weight     -> (resblock_q1, conv2)
      resblock_q1.shortcut.0.weight -> (resblock_q1, conv_sc)
      trunk_M1.3.left.0.weight      -> (trunk_M1, block3, conv1)
    """
    parts = key.split(".")
    leafless = parts[:-1]
    out: list[str] = []
    i = 0
    while i < len(leafless):
        p = leafless[i]
        if p == "left":
            idx = leafless[i + 1]
            out.append({"0": "conv1", "2": "conv2"}[idx])
            i += 2
        elif p == "shortcut":
            assert leafless[i + 1] == "0"
            out.append("conv_sc")
            i += 2
        elif p.isdigit():  # Sequential index inside a trunk
            out.append(f"block{p}")
            i += 1
        else:
            out.append(p)
            i += 1
    return tuple(out)


def torch_pickle_to_flat(path: str | pathlib.Path) -> dict[str, np.ndarray]:
    """Unpickle a reference checkpoint to a flat {key: ndarray} dict."""
    import torch  # local import: only needed for interop

    state = torch.load(path, map_location="cpu", weights_only=True)
    return {k: v.numpy() for k, v in _strip_prefix(state).items()}


def import_torch_state_dict(
    params, flat: Mapping[str, np.ndarray], *, wrap_core: bool = False
):
    """Fill a flax param tree from a reference torch state_dict.

    Mirrors the reference's tolerant loader (Metrics.py:682-700): entries
    whose mapped path is missing or shape-mismatched are skipped; returns
    (new_params, n_loaded, n_skipped).
    """
    tree = unfreeze(params)
    n_loaded = n_skipped = 0
    for key, value in flat.items():
        path = _torch_key_to_flax_path(key)
        if path is None:
            n_skipped += 1
            continue
        if wrap_core:
            path = ("core",) + path
        leaf = "kernel" if key.endswith("weight") else "bias"
        node = tree
        ok = True
        for p in path:
            if not isinstance(node, dict) or p not in node:
                ok = False
                break
            node = node[p]
        if not ok or leaf not in node:
            n_skipped += 1
            continue
        if leaf == "kernel" and value.ndim == 4:
            value = np.transpose(value, (2, 3, 1, 0))  # OIHW -> HWIO
        if node[leaf].shape != value.shape:
            n_skipped += 1
            continue
        node[leaf] = jnp.asarray(value, dtype=node[leaf].dtype)
        n_loaded += 1
    return freeze(tree) if hasattr(params, "unfreeze") else tree, n_loaded, n_skipped


def load_reference_net(net, example_args, pkl_path, *, wrap_core: bool = False):
    """Init ``net`` and load a reference checkpoint into it."""
    params = net.init(jax.random.PRNGKey(0), *example_args)["params"]
    flat = torch_pickle_to_flat(pkl_path)
    params, n_loaded, n_skipped = import_torch_state_dict(
        params, flat, wrap_core=wrap_core)
    if n_loaded == 0:
        raise ValueError(f"no parameters imported from {pkl_path}")
    return {"params": params}, n_loaded, n_skipped
