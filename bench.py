"""Headline benchmark: Vamana recall@10 + QPS on one real TPU chip.

Mirrors the reference's ann-benchmarks protocol (README.md:184-200, run via
internal/shardpy): build an index at searchSize 75 / degreeBound 64 /
alpha 1.2, then measure recall@10 and QPS. Zero-egress environment → the
dataset is synthetic SIFT-like data (128-d, euclidean) with exact ground
truth computed on device.

Baseline: sift-128-euclidean v1 = 0.999 recall / 1537.7 QPS on an i7-6700
single thread (BASELINE.md). vs_baseline = our QPS / 1537.7 (recall must
hold >= ~0.99 for the comparison to be fair; it is printed alongside).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

N = int(os.environ.get("BENCH_N", 100_000))
DIM = int(os.environ.get("BENCH_DIM", 128))
N_QUERIES = int(os.environ.get("BENCH_QUERIES", 1024))
QUERY_BATCH = int(os.environ.get("BENCH_QUERY_BATCH", 256))
K = 10
BASELINE_QPS = 1537.7  # reference sift-128 v1 (README.md:196)


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/semadb_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from semadb_tpu.index.vamana import IndexVamana, exact_search
    from semadb_tpu.models.schema import VectorVamanaParams

    rng = np.random.default_rng(42)
    # SIFT-like synthetic data: positive, non-centered (real SIFT vectors are
    # uint8 histograms). Centered gaussians are adversarial for Vamana's
    # random-unit-vector start node (it lands near the centroid and
    # alpha-prunes every other candidate) — a pathology the reference shares
    # (vamana.go:93-120) and real datasets avoid.
    base = (rng.random((N, DIM)) * 2.0).astype(np.float32)
    queries = (
        base[rng.integers(0, N, N_QUERIES)]
        + 0.15 * rng.standard_normal((N_QUERIES, DIM)).astype(np.float32)
    ).astype(np.float32)

    params = VectorVamanaParams(
        vector_size=DIM,
        distance_metric="euclidean",
        search_size=75,
        degree_bound=64,
        alpha=1.2,
    )
    idx = IndexVamana(params)
    ids = np.arange(2, N + 2, dtype=np.int32)

    t0 = time.time()
    idx.insert_update_delete(zip(ids, base))
    build_s = time.time() - t0

    # Ground truth: exact top-k on device over the same state
    gt_ids = []
    for i in range(0, N_QUERIES, QUERY_BATCH):
        q = jnp.asarray(queries[i : i + QUERY_BATCH])
        _, gi = exact_search(idx.state, q, idx.config, K)
        gt_ids.append(np.asarray(gi))
    gt_ids = np.concatenate(gt_ids)

    # Warmup (compile)
    idx.search_batch(queries[:QUERY_BATCH], k=K)

    t0 = time.time()
    out_ids = []
    for i in range(0, N_QUERIES, QUERY_BATCH):
        _, oi = idx.search_batch(queries[i : i + QUERY_BATCH], k=K)
        out_ids.append(oi)
    wall = time.time() - t0
    out_ids = np.concatenate(out_ids)

    recall = float(
        np.mean(
            [
                len(set(out_ids[b].tolist()) & set(gt_ids[b].tolist())) / K
                for b in range(N_QUERIES)
            ]
        )
    )
    qps = N_QUERIES / wall

    print(
        json.dumps(
            {
                "metric": f"sift{N//1000}k_d{DIM}_vamana_qps",
                "value": round(qps, 1),
                "unit": "qps",
                "vs_baseline": round(qps / BASELINE_QPS, 2),
                "recall@10": round(recall, 4),
                "build_s": round(build_s, 1),
                "n": N,
                "query_batch": QUERY_BATCH,
                "platform": jax.devices()[0].platform,
            }
        )
    )


if __name__ == "__main__":
    main()
