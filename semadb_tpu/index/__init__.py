"""Concrete indices: vamana, flat, ivf, fused, inverted, text + the
dispatch/search manager."""

from semadb_tpu.index.flat import IndexFlat  # noqa: F401
from semadb_tpu.index.fused import FusedHybridIVF  # noqa: F401
from semadb_tpu.index.ivf import IndexIVF  # noqa: F401
from semadb_tpu.index.vamana import IndexVamana  # noqa: F401
