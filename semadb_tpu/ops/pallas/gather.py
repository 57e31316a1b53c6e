"""Pallas TPU kernel: pipelined random row gather from HBM.

The Vamana hop is bound by ``vectors[nbr]`` — XLA's row gather of 512-byte
rows runs at ~42 GB/s on a v5e (issue-bound ~13 ns/row; BENCHMARKS.md
"negative results"). This kernel tests whether explicitly pipelined
per-row DMAs (NBUF descriptors in flight, issued by the scalar core) can
beat the XLA gather path. Reference analog: the hot pointer-chase the
reference does one row at a time from the Go heap (shard/index/vamana/
search.go:63-98); on TPU the row source is an HBM matrix.

Used behind a measured flag: ops.distance.gather_distance switches to this
kernel only where the microbenchmark (tools/gatherbench.py) shows a win.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 1024  # ids per grid program (matches XLA's 1-D s32 tile layout)
NBUF = 16  # DMA descriptors in flight


def _gather_kernel(ids_ref, hbm_ref, out_ref, sems):
    """One grid program gathers TILE rows: ids_ref i32[TILE] (this
    program's id block, SMEM — the full id list would blow the 1 MB SMEM
    as a scalar-prefetch operand), hbm_ref f32[cap, D] (stays in HBM),
    out_ref f32[TILE, D] (VMEM block). Row DMAs are issued NBUF ahead of
    the in-order wait so the DMA engines always have a full queue."""

    def dma(j):
        return pltpu.make_async_copy(
            hbm_ref.at[ids_ref[j]],
            out_ref.at[j],
            sems.at[jax.lax.rem(j, NBUF)],
        )

    def warm(j, carry):
        dma(j).start()
        return carry

    jax.lax.fori_loop(0, NBUF, warm, 0, unroll=True)

    def body(j, carry):
        dma(j).wait()

        @pl.when(j + NBUF < TILE)
        def _():
            dma(j + NBUF).start()

        return carry

    jax.lax.fori_loop(0, TILE, body, 0)


@functools.partial(jax.jit, static_argnames=())
def gather_rows(vectors: jax.Array, ids: jax.Array) -> jax.Array:
    """``vectors[ids]`` via pipelined row DMAs.

    ``vectors``: f32[cap, D]; ``ids``: i32[n] with n a multiple of TILE
    (caller pads; out-of-range ids must already be clipped). Returns
    f32[n, D].
    """
    n = ids.shape[0]
    assert n % TILE == 0, n
    d = vectors.shape[1]
    return pl.pallas_call(
        _gather_kernel,
        out_shape=jax.ShapeDtypeStruct((n, d), vectors.dtype),
        grid=(n // TILE,),
        in_specs=[
            pl.BlockSpec((TILE,), lambda i: (i,), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((TILE, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SemaphoreType.DMA((NBUF,))],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(ids, vectors)


def gather_rows_padded(vectors: jax.Array, ids: jax.Array) -> jax.Array:
    """gather_rows for arbitrary n: pads ids to a TILE multiple with 0."""
    n = ids.shape[0]
    pad = (-n) % TILE
    if pad:
        ids = jnp.pad(ids, (0, pad))
    out = gather_rows(vectors, ids)
    return out[:n] if pad else out
