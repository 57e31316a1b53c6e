"""Vector store with pluggable quantization (plain / binary / product)."""

from semadb_tpu.vectorstore.kmeans import (  # noqa: F401
    kmeans_fit,
    kmeans_fit_subvectors,
)
from semadb_tpu.vectorstore.store import (  # noqa: F401
    BINARY,
    PLAIN,
    PRODUCT,
    QuantConfig,
    QuantState,
    VectorStore,
    bq_encode,
    bq_fit_threshold,
    pq_encode,
    pq_fit,
    pq_gather_distance,
    pq_query_table,
    pq_scan_distance,
)
