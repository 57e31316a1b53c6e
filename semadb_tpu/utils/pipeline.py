"""Streaming pipelines: bounded async device dispatch + host combinators.

Parity reference: utils/pipeline.go — the channel combinators
(Produce/Transform/TransformMultiple/Merge/Sink) are the concurrency
backbone of the reference's shard writes. The TPU-native equivalent of
that backbone is :class:`AsyncDispatcher`: JAX dispatch is asynchronous,
so submitting batch i+1 while batch i computes overlaps the host→device
upload (~60 ms per 4096x128 batch through a tunnelled link) with device
compute — the single biggest query-throughput lever measured in round 1
(24k → 53k QPS). The dispatcher bounds in-flight batches so result
buffers don't accumulate in HBM on long streams.

The generator combinators below keep pipeline.go's early-error semantics
for host-side streaming work (ingest parsing, chunked shard transfer).
"""

from __future__ import annotations

from collections import deque
from typing import Any, Callable, Iterable, Iterator, List, Optional, Tuple, TypeVar

T = TypeVar("T")
U = TypeVar("U")


class AsyncDispatcher:
    """Pipelined dispatch of device work with bounded in-flight depth.

    ``submit(fn, *args)`` calls ``fn`` immediately (JAX queues the work
    and returns device-array futures) and remembers the handle. When more
    than ``depth`` handles are un-materialised, the oldest is forced to
    host — backpressure that caps HBM held by pending results while still
    overlapping upload, compute, and readback across batches.

    ``results()`` returns all outputs in submission order, materialised
    to numpy (``jax.tree`` structure preserved).
    """

    def __init__(self, depth: int = 4):
        self.depth = depth
        self._pending: deque = deque()  # (index, handle)
        self._done: dict[int, Any] = {}
        self._n = 0

    @staticmethod
    def _materialise(handle):
        import jax
        import numpy as np

        return jax.tree.map(np.asarray, handle)

    def submit(self, fn: Callable[..., Any], *args, **kwargs) -> int:
        idx = self._n
        self._n += 1
        self._pending.append((idx, fn(*args, **kwargs)))
        while len(self._pending) > self.depth:
            i, h = self._pending.popleft()
            self._done[i] = self._materialise(h)
        return idx

    def results(self) -> List[Any]:
        while self._pending:
            i, h = self._pending.popleft()
            self._done[i] = self._materialise(h)
        out = [self._done[i] for i in range(self._n)]
        self._done.clear()
        self._n = 0
        return out


def produce(items: Iterable[T]) -> Iterator[T]:
    yield from items


def transform(
    source: Iterable[T], fn: Callable[[T], Tuple[Optional[U], bool]]
) -> Iterator[U]:
    """fn returns (value, skip); exceptions abort the pipeline
    (TransformWithContext semantics)."""
    for item in source:
        value, skip = fn(item)
        if not skip:
            yield value


def transform_multiple(
    source: Iterable[T], fn: Callable[[T], Iterable[U]]
) -> Iterator[U]:
    for item in source:
        yield from fn(item)


def merge(*sources: Iterable[T]) -> Iterator[T]:
    for src in sources:
        yield from src


def sink(source: Iterable[T], fn: Callable[[T], None]) -> Optional[Exception]:
    """Drain the pipeline, RETURNING the first error instead of raising
    (SinkWithContext / MergeErrorsWithContext semantics, pipeline.go:169-205).

    The return value MUST be checked — ignoring it silently swallows the
    error. Callers that want exception flow should use :func:`sink_raise`.
    """
    try:
        for item in source:
            fn(item)
        return None
    except Exception as e:
        return e


def sink_raise(source: Iterable[T], fn: Callable[[T], None]) -> None:
    """Drain the pipeline, propagating the first error as an exception —
    the misuse-proof form of :func:`sink` for callers without a Go-style
    error-channel contract."""
    for item in source:
        fn(item)


def collect(source: Iterable[T]) -> List[T]:
    return list(source)
