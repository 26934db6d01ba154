"""Test configuration: force an 8-device virtual CPU mesh before JAX initializes.

Multi-chip sharding paths (pjit/shard_map over a Mesh) are exercised on virtual
CPU devices; real-TPU benchmarks run separately via bench.py.
"""
import os

# Force CPU: the ambient environment pins JAX_PLATFORMS=axon (tunneled TPU)
# via sitecustomize, which would run un-jitted test code op-by-op over the
# wire. The env var alone is overridden by the plugin, so also update the
# config after import.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pathlib
import sys

REPO_ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))

REFERENCE_ROOT = pathlib.Path("/root/reference")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def reference_root():
    if not REFERENCE_ROOT.exists():
        pytest.skip("reference snapshot not mounted")
    return REFERENCE_ROOT
