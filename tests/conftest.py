"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Mirrors how the reference tests everything through in-memory fakes
(diskstore.Open("") memstore, single-node cluster stand-in) — here the
"fake backend" is XLA's host platform with 8 forced devices so multi-chip
sharding paths compile and execute without TPU hardware.
"""

import os
import sys

# Must be set before jax is imported anywhere. Force CPU even if the outer
# environment points JAX at a TPU tunnel — tests must be hermetic and fast.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
