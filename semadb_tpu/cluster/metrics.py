"""Cluster Prometheus metrics.

Parity reference: cluster/metrics.go — per-handler RPC request counts and
durations, plus point insert/update/delete/search counters
(metrics.go:16-67). No-ops gracefully when prometheus_client is absent.
"""

from __future__ import annotations

import time
from contextlib import contextmanager

try:
    from prometheus_client import Counter, Histogram

    RPC_REQUESTS = Counter(
        "semadb_cluster_rpc_requests_total", "RPC requests", ["handler"]
    )
    RPC_DURATION = Histogram(
        "semadb_cluster_rpc_request_duration_seconds",
        "RPC request duration",
        ["handler"],
    )
    POINT_OPS = Counter(
        "semadb_cluster_point_operations_total",
        "Point operations routed through the cluster",
        ["operation"],
    )
    _HAVE = True
except Exception:  # pragma: no cover
    _HAVE = False


@contextmanager
def observe_rpc(handler: str):
    if not _HAVE:
        yield
        return
    start = time.perf_counter()
    try:
        yield
    finally:
        RPC_REQUESTS.labels(handler=handler).inc()
        RPC_DURATION.labels(handler=handler).observe(time.perf_counter() - start)


def count_point_op(operation: str, n: int = 1) -> None:
    if _HAVE:
        POINT_OPS.labels(operation=operation).inc(n)
