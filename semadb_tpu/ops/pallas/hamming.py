"""Pallas TPU kernel: blocked hamming/jaccard distance scan.

The XLA formulation of the all-pairs bit distance
(``popcount(q[:,None,:] ^ x[None,:,:]).sum(-1)``) materializes a
``[B, N, W]`` intermediate in HBM — at B=1024 queries over N=1M codes of
W=48 words that is ~200GB of traffic. This kernel tiles the scan so each
``(TB, TN)`` output block reads its query/code tiles into VMEM once and
reduces the word axis in-register.

Used by the flat index's binary-quantized scan (flat.go's role with a BQ
vectorstore); falls back to the XLA version off-TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from semadb_tpu.models import constants as C

TILE_B = 128
TILE_N = 512


def _hamming_kernel(q_ref, x_ref, out_ref):
    # q_ref: u32[TB, W], x_ref: u32[TN, W] → out u32 accumulated over W
    q = q_ref[:]  # [TB, W]
    x = x_ref[:]  # [TN, W]
    xor = jnp.bitwise_xor(q[:, None, :], x[None, :, :])  # [TB, TN, W] in VMEM
    pc = jax.lax.population_count(xor)
    out_ref[:] = jnp.sum(pc, axis=-1).astype(jnp.float32)


def _jaccard_kernel(q_ref, x_ref, out_ref):
    q = q_ref[:]
    x = x_ref[:]
    inter = jnp.sum(
        jax.lax.population_count(jnp.bitwise_and(q[:, None, :], x[None, :, :])), axis=-1
    )
    union = jnp.sum(
        jax.lax.population_count(jnp.bitwise_or(q[:, None, :], x[None, :, :])), axis=-1
    )
    out_ref[:] = jnp.where(
        union == 0, 0.0, 1.0 - inter.astype(jnp.float32) / jnp.maximum(union, 1)
    )


def _pad_to(x, size, axis):
    pad = size - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


@functools.partial(jax.jit, static_argnames=("metric",))
def pairwise_bit_distance_pallas(
    queries: jax.Array, corpus: jax.Array, metric: str
) -> jax.Array:
    """All-pairs bit distance via the blocked Pallas kernel.

    ``queries`` u32[B, W], ``corpus`` u32[N, W] → f32[B, N]. Inputs are
    padded up to tile multiples; padding words are zero so hamming pads are
    exact and jaccard pads are masked by the caller via live masks.
    """
    B, W = queries.shape
    N = corpus.shape[0]
    Bp = ((B + TILE_B - 1) // TILE_B) * TILE_B
    Np = ((N + TILE_N - 1) // TILE_N) * TILE_N
    q = _pad_to(queries, Bp, 0)
    x = _pad_to(corpus, Np, 0)

    kernel = _hamming_kernel if metric == C.DISTANCE_HAMMING else _jaccard_kernel
    out = pl.pallas_call(
        kernel,
        grid=(Bp // TILE_B, Np // TILE_N),
        in_specs=[
            pl.BlockSpec((TILE_B, W), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_N, W), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (TILE_B, TILE_N), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((Bp, Np), jnp.float32),
    )(q, x)
    return out[:B, :N]


def supports_pallas() -> bool:
    return jax.default_backend() == "tpu"
