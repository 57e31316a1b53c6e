"""Microbenchmark: XLA row gather vs the Pallas pipelined-DMA gather.

Measures the Vamana hop's dominant primitive — random 512 B row gather
from an HBM-resident [cap, D] matrix — at hop-shaped sizes (batch x W x R
rows per hop). Decides whether ops/pallas/gather.py earns a place on the
hot path (BENCHMARKS.md "negative results": XLA does ~42 GB/s here).

Usage:  python -m semadb_tpu.tools.gatherbench [--cap 1000000] [--dim 128]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def _time(fn, *args, reps: int = 20) -> float:
    """Seconds per call: `reps` back-to-back dispatches then one 4-byte
    readback (block_until_ready alone does not await remote execution on
    a tunnelled backend, and a per-call readback would be RTT-bound —
    ~40 ms per round trip vs ~10 ms of expected kernel time)."""
    np.asarray(fn(*args)[:1, :1])  # warmup + sync
    t0 = time.perf_counter()
    out = None
    for _ in range(reps):
        out = fn(*args)
    np.asarray(out[:1, :1])  # drain the queue
    return (time.perf_counter() - t0) / reps


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cap", type=int, default=1_000_000)
    ap.add_argument("--dim", type=int, default=128)
    ap.add_argument("--rows", type=int, default=8192 * 128)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from semadb_tpu.ops.pallas.gather import gather_rows

    rng = np.random.default_rng(0)
    vectors = jnp.asarray(
        rng.standard_normal((args.cap, args.dim)).astype(np.float32)
    )
    ids = jnp.asarray(rng.integers(0, args.cap, args.rows).astype(np.int32))
    bytes_moved = args.rows * args.dim * 4

    xla_take = jax.jit(lambda v, i: v[i])
    t_xla = _time(xla_take, vectors, ids)

    t_pl = _time(gather_rows, vectors, ids)

    # correctness spot check
    out = np.asarray(gather_rows(vectors, ids)[:64])
    ref = np.asarray(vectors)[np.asarray(ids)[:64]]
    ok = bool(np.array_equal(out, ref))

    print(
        json.dumps(
            {
                "rows": args.rows,
                "row_bytes": args.dim * 4,
                "xla_s": round(t_xla, 4),
                "xla_gbps": round(bytes_moved / t_xla / 1e9, 1),
                "pallas_s": round(t_pl, 4),
                "pallas_gbps": round(bytes_moved / t_pl / 1e9, 1),
                "pallas_correct": ok,
                "platform": jax.devices()[0].platform,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
