"""Process-wide XLA compile-time meter.

Bench transparency: build wall-clock through a jitted pipeline mixes XLA
compilation (host, one-time, persistent-cacheable) with device execution.
BENCH_r03's build_s jumped 20.7 -> 55.0 purely from cold compiles + an
honest sync, which an auditor reads as a 2.7x regression; splitting the
two in the emitted JSON makes the artifact self-explaining.

JAX emits ``/jax/core/compile/*_duration`` monitoring events for the
trace, MLIR lowering, and backend-compile stages of every jit cache miss
(including persistent-cache *writes*; cache hits skip backend compile).
:func:`install` registers one listener summing them; :func:`seconds`
reads the accumulated total, so a caller brackets any window with two
reads.
"""

from __future__ import annotations

import threading

_lock = threading.Lock()
_total = 0.0
_installed = False


def install() -> None:
    """Register the listener (idempotent; cheap enough to call eagerly)."""
    global _installed
    if _installed:
        return
    import jax.monitoring as monitoring

    def _cb(event: str, duration: float, **_kw) -> None:
        global _total
        if event.startswith("/jax/core/compile/"):
            with _lock:
                _total += duration

    monitoring.register_event_duration_secs_listener(_cb)
    _installed = True


def seconds() -> float:
    """Total compile seconds accumulated in this process so far."""
    with _lock:
        return _total
