"""Streaming pipeline combinators (host-side shim).

Parity reference: utils/pipeline.go — the channel combinators
(Produce/Transform/TransformMultiple/Merge/Sink) are the concurrency
backbone of the reference's shard writes. In the TPU-native design the
write path is *batched* (whole change batches become single device
programs), so these combinators survive only as a thin generator-based
shim for host-side streaming work (ingest parsing, chunked file transfer)
with the same early-error-propagation semantics.
"""

from __future__ import annotations

from typing import Callable, Iterable, Iterator, List, Optional, Tuple, TypeVar

T = TypeVar("T")
U = TypeVar("U")


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
    """Drain the pipeline; returns the first error instead of raising
    (SinkWithContext / MergeErrorsWithContext semantics)."""
    try:
        for item in source:
            fn(item)
        return None
    except Exception as e:
        return e


def collect(source: Iterable[T]) -> List[T]:
    return list(source)
