"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Mirrors how the reference tests everything through in-memory fakes
(diskstore.Open("") memstore, single-node cluster stand-in) — here the
"fake backend" is XLA's host platform with 8 forced devices so multi-chip
sharding paths compile and execute without TPU hardware.
"""

import os
import sys

# The container's sitecustomize (axon TPU tunnel) imports jax at interpreter
# start with JAX_PLATFORMS=axon, so env vars set here are too late — but the
# backend itself is initialized lazily, so post-import config steering works.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", "tests must run on the CPU backend"
assert len(jax.devices()) == 8, "expected 8 virtual CPU devices for sharding tests"

# Persistent compilation cache: graph kernels are expensive to compile and
# shapes repeat across tests/runs.
jax.config.update("jax_compilation_cache_dir", "/tmp/semadb_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
