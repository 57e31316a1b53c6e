"""Vector store / quantizer tests.

Mirrors shard/vectorstore/vectorstore_test.go coverage: plain/binary/product
set+get+distance, fit triggers, and recall sanity through the flat and
vamana indices.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from semadb_tpu.index.flat import IndexFlat
from semadb_tpu.index.vamana import IndexVamana
from semadb_tpu.models.quantizer import (
    BinaryQuantizerParams,
    ProductQuantizerParams,
    Quantizer,
)
from semadb_tpu.models.schema import VectorFlatParams, VectorVamanaParams
from semadb_tpu.vectorstore import (
    QuantConfig,
    VectorStore,
    kmeans_fit,
    pq_encode,
    pq_fit,
    pq_gather_distance,
    pq_query_table,
)

RNG = np.random.default_rng(11)


def test_kmeans_clusters_separated_data():
    # 4 well-separated blobs must produce 4 distinct centroids
    centers = np.array([[0, 0], [10, 0], [0, 10], [10, 10]], np.float32)
    data = np.concatenate(
        [c + 0.1 * RNG.standard_normal((50, 2)).astype(np.float32) for c in centers]
    )
    cent, labels = kmeans_fit(jnp.asarray(data), 4, seed=0)
    cent = np.asarray(cent)
    labels = np.asarray(labels)
    # every blob maps to exactly one cluster
    for blob in range(4):
        blob_labels = labels[blob * 50 : (blob + 1) * 50]
        assert len(set(blob_labels.tolist())) == 1
    # centroids near blob centers
    d = np.abs(cent[:, None, :] - centers[None, :, :]).sum(-1).min(axis=0)
    assert np.all(d < 1.0)


def test_kmeans_empty_cluster_keeps_centroid():
    data = np.zeros((10, 2), np.float32)  # degenerate: all same point
    cent, labels = kmeans_fit(jnp.asarray(data), 4, seed=1)
    assert np.isfinite(np.asarray(cent)).all()


def test_kmeans_large_blocked_matches_unblocked():
    """The row-blocked assignment path (used when [N, K] would blow HBM —
    137 GB at 1M x 32768) must be bit-compatible with the single-block
    path, including non-multiple row counts (weight-0 padding)."""
    from semadb_tpu.vectorstore.kmeans import kmeans_fit_large

    data = jnp.asarray(RNG.standard_normal((1500, 32)).astype(np.float32))
    c1, l1 = kmeans_fit_large(data, 32, iters=8)
    c2, l2 = kmeans_fit_large(data, 32, iters=8, block_rows=256)
    assert np.allclose(np.asarray(c1), np.asarray(c2), atol=1e-4)
    assert np.array_equal(np.asarray(l1), np.asarray(l2))


def test_binary_store_fit_and_scan():
    dim = 64
    cfg = QuantConfig(kind="binary", dim=dim, metric="euclidean", trigger=50)
    store = VectorStore(cfg)
    vectors = jnp.asarray(RNG.standard_normal((128, dim)).astype(np.float32))
    exists = jnp.asarray(np.arange(128) < 100)
    assert not store.fitted
    # under trigger → no fit
    assert not store.maybe_fit(vectors, jnp.asarray(np.arange(128) < 10))
    assert store.maybe_fit(vectors, exists)
    assert store.fitted
    # threshold is the per-dim mean of live rows
    thr = np.asarray(store.state.aux)
    expect = np.asarray(vectors)[:100].mean(0)
    assert np.allclose(thr, expect, atol=1e-4)
    # hamming distance of a vector to itself is 0
    d = np.asarray(store.scan_distances(vectors[:4], vectors, exists))
    assert np.allclose(np.diag(d[:, :4]), 0.0)


def test_binary_fixed_threshold():
    cfg = QuantConfig(kind="binary", dim=8, metric="euclidean", threshold=0.0)
    store = VectorStore(cfg)
    assert store.fitted  # fixed threshold → fitted immediately


def test_pq_roundtrip_distance():
    dim, m, k = 32, 8, 16
    vectors = RNG.standard_normal((500, dim)).astype(np.float32)
    cb = pq_fit(jnp.asarray(vectors), jnp.ones(500, bool), m, k)
    codes = pq_encode(jnp.asarray(vectors), cb, m, k, "euclidean")
    assert codes.shape == (500, m)
    table = pq_query_table(jnp.asarray(vectors[:4]), cb, m, k, "euclidean")
    assert table.shape == (4, m, k)
    d = np.asarray(
        pq_gather_distance(codes, jnp.arange(4)[:, None].astype(jnp.int32), table, k)
    )
    # ADC distance of a point to itself should be small (quantization error)
    mean_self = float(np.mean(d[:, 0]))
    rand_pair = float(
        np.mean(
            np.asarray(
                pq_gather_distance(
                    codes, jnp.asarray([[100, 200, 300, 400]], jnp.int32), table[:1], k
                )
            )
        )
    )
    assert mean_self < rand_pair * 0.5


def test_flat_index_plain():
    params = VectorFlatParams(vector_size=16, distance_metric="euclidean")
    idx = IndexFlat(params)
    vecs = RNG.standard_normal((50, 16)).astype(np.float32)
    ids = np.arange(2, 52)
    idx.insert_update_delete(zip(ids, vecs))
    assert len(idx) == 50
    d, i = idx.search_batch(vecs[:5], k=3)
    assert list(i[:, 0]) == list(ids[:5])
    # delete and confirm gone
    idx.insert_update_delete([(2, None)])
    d, i = idx.search_batch(vecs[:1], k=3)
    assert 2 not in i[0]
    # filter
    fmask = np.zeros(idx.capacity, bool)
    fmask[[10, 20]] = True
    d, i = idx.search_batch(vecs[:1], k=5, filter_mask=fmask)
    assert set(i[0][i[0] != -1].tolist()) <= {10, 20}


def test_flat_index_binary_quantized():
    q = Quantizer(
        type="binary",
        binary=BinaryQuantizerParams(distance_metric="hamming", trigger_threshold=30),
    )
    params = VectorFlatParams(vector_size=32, distance_metric="euclidean", quantizer=q)
    idx = IndexFlat(params)
    vecs = RNG.standard_normal((64, 32)).astype(np.float32)
    ids = np.arange(2, 66)
    idx.insert_update_delete(zip(ids, vecs))
    assert idx.store.fitted
    d, i = idx.search_batch(vecs[:8], k=1)
    # hamming self-distance = 0 → the point itself must rank first
    assert np.sum(i[:, 0] == ids[:8]) >= 7
    assert np.allclose(d[i[:, 0] == ids[:8], 0], 0)


def test_vamana_binary_quantized_search():
    q = Quantizer(
        type="binary",
        binary=BinaryQuantizerParams(distance_metric="hamming", trigger_threshold=100),
    )
    params = VectorVamanaParams(
        vector_size=32,
        distance_metric="euclidean",
        search_size=36,
        degree_bound=32,
        quantizer=q,
    )
    idx = IndexVamana(params)
    ids = np.arange(2, 302, dtype=np.int32)
    vecs = (RNG.random((300, 32)) * 2).astype(np.float32)
    idx.insert_update_delete(zip(ids, vecs))
    assert idx.store.fitted
    d, i = idx.search_batch(vecs[:16], k=5)
    hits = np.mean([ids[b] in i[b] for b in range(16)])
    assert hits >= 0.8, f"BQ self-recall too low: {hits}"
    # traversal runs on hamming codes; final distances are full-precision
    # reranked (beats the reference, which returns raw hamming)
    for b in range(16):
        self_pos = np.where(i[b] == ids[b])[0]
        if len(self_pos):
            assert d[b, self_pos[0]] == pytest.approx(0.0, abs=1e-4)


def test_vamana_product_quantized_search():
    q = Quantizer(
        type="product",
        product=ProductQuantizerParams(
            num_centroids=32, num_subvectors=4, trigger_threshold=1000
        ),
    )
    params = VectorVamanaParams(
        vector_size=32,
        distance_metric="euclidean",
        search_size=36,
        degree_bound=32,
        quantizer=q,
    )
    # lower the trigger artificially for the test via config override
    idx = IndexVamana(params)
    object.__setattr__(idx.store.config, "trigger", 100) if False else None
    import dataclasses

    idx.store.config = dataclasses.replace(idx.store.config, trigger=100)
    ids = np.arange(2, 302, dtype=np.int32)
    vecs = (RNG.random((300, 32)) * 2).astype(np.float32)
    idx.insert_update_delete(zip(ids, vecs))
    assert idx.store.fitted
    d, i = idx.search_batch(vecs[:16], k=5)
    hits = np.mean([ids[b] in i[b] for b in range(16)])
    assert hits >= 0.8, f"PQ self-recall too low: {hits}"


def test_user_hamming_metric():
    """hamming as the user-facing metric: float 0/1 vectors auto-binarised
    via a forced threshold-0.5 binary store (vectorstore.go:56-67)."""
    params = VectorVamanaParams(
        vector_size=64, distance_metric="hamming", search_size=36, degree_bound=32
    )
    idx = IndexVamana(params)
    assert idx.store.fitted and idx.store.config.user_bit_metric
    vecs = RNG.integers(0, 2, (200, 64)).astype(np.float32)
    ids = np.arange(2, 202, dtype=np.int32)
    idx.insert_update_delete(zip(ids, vecs))
    d, i = idx.search_batch(vecs[:8], k=3)
    # self-distance = hamming 0, and distances are integral bit counts
    assert np.sum(i[:, 0] == ids[:8]) >= 7
    finite = d[np.isfinite(d)]
    assert np.allclose(finite, np.round(finite))


def test_user_jaccard_metric_flat():
    params = VectorFlatParams(vector_size=32, distance_metric="jaccard")
    idx = IndexFlat(params)
    vecs = RNG.integers(0, 2, (50, 32)).astype(np.float32)
    ids = np.arange(2, 52)
    idx.insert_update_delete(zip(ids, vecs))
    d, i = idx.search_batch(vecs[:5], k=1)
    assert list(i[:, 0]) == list(ids[:5])
    assert np.allclose(d[:, 0], 0.0)  # jaccard self-distance


def test_vamana_quantized_filtered_rerank():
    """Filtered quantized search reranks in full precision, matching the
    unfiltered path: returned distances are true euclidean, and the
    planted self-point comes back at distance ~0 even though the graph
    walk used hamming codes."""
    q = Quantizer(
        type="binary",
        binary=BinaryQuantizerParams(distance_metric="hamming", trigger_threshold=100),
    )
    params = VectorVamanaParams(
        vector_size=32,
        distance_metric="euclidean",
        search_size=36,
        degree_bound=32,
        quantizer=q,
    )
    idx = IndexVamana(params)
    ids = np.arange(2, 302, dtype=np.int32)
    vecs = (RNG.random((300, 32)) * 2).astype(np.float32)
    idx.insert_update_delete(zip(ids, vecs))
    assert idx.store.fitted
    # admit only even node ids
    fmask = np.zeros(512, dtype=bool)
    fmask[ids[ids % 2 == 0]] = True
    queries = vecs[ids % 2 == 0][:8]
    qids = ids[ids % 2 == 0][:8]
    d, i = idx.search_batch(queries, k=5, filter_mask=fmask)
    assert np.all((i == -1) | (i % 2 == 0)), "filter violated"
    hits = 0
    for b in range(8):
        self_pos = np.where(i[b] == qids[b])[0]
        if len(self_pos):
            hits += 1
            assert d[b, self_pos[0]] == pytest.approx(0.0, abs=1e-4)
    assert hits >= 6, f"filtered BQ self-recall too low: {hits}/8"
    # distances are exact euclidean, not hamming integers
    vec_by_id = {int(n): vecs[n - 2] for n in ids}
    for b in range(8):
        for pos in range(5):
            if i[b, pos] == -1:
                continue
            ref = np.sum((queries[b] - vec_by_id[int(i[b, pos])]) ** 2)
            assert d[b, pos] == pytest.approx(ref, rel=1e-3, abs=1e-3)


def test_quantized_recall_on_fair_data():
    """BQ/PQ recall on embedding-like data with harder-than-SIFT margins
    must beat the reference's published floors (BQ 0.667 mnist, PQ 0.696
    sift, README.md:191-196) — the f32 rerank over the ~3L visited pool is
    what closes the gap the reference's rerank-free quantized search eats."""
    import numpy as np

    from semadb_tpu.index.vamana import IndexVamana
    from semadb_tpu.models.quantizer import (
        BinaryQuantizerParams,
        ProductQuantizerParams,
        Quantizer,
    )
    from semadb_tpu.models.schema import VectorVamanaParams
    from semadb_tpu.tools.datasets import compute_ground_truth, embedding_like

    ds = embedding_like(8000, 128, 64, seed=3)
    gt = compute_ground_truth(ds, 10)
    ids = np.arange(2, len(ds.train) + 2, dtype=np.int32)
    floors = {"BQ": 0.70, "PQ": 0.80}
    quants = {
        "BQ": Quantizer(
            type="binary",
            binary=BinaryQuantizerParams(
                trigger_threshold=1000, distance_metric="hamming"
            ),
        ),
        "PQ": Quantizer(
            type="product",
            product=ProductQuantizerParams(
                num_centroids=256, num_subvectors=16, trigger_threshold=1000
            ),
        ),
    }
    for name, quant in quants.items():
        p = VectorVamanaParams(
            vector_size=128, distance_metric="euclidean",
            search_size=75, degree_bound=64, alpha=1.2, quantizer=quant,
        )
        idx = IndexVamana(p)
        idx.insert_update_delete(zip(ids, ds.train))
        d_, i_ = idx.search_batch(ds.test, k=10, search_size=75)
        rec = np.mean(
            [len(set(i_[b]) & set(ids[gt[b]])) / 10 for b in range(len(ds.test))]
        )
        assert rec >= floors[name], f"{name} recall@10 {rec:.3f} < {floors[name]}"


def test_opq_beats_plain_pq_on_correlated_data():
    """OPQ's learned rotation must cut quantization error vs plain PQ on
    dimension-correlated data (the regime real embeddings live in): the
    fit alternates codebook fits with Procrustes rotation updates."""
    from semadb_tpu.vectorstore.store import _pq_decode, opq_fit

    dim, m, k = 32, 8, 16
    n = 4096
    # Correlated data: low-rank latent + tiny noise — plain PQ's axis-
    # aligned subvector split straddles the correlations
    z = RNG.standard_normal((n, 8)).astype(np.float32)
    mix = RNG.standard_normal((8, dim)).astype(np.float32)
    x = (z @ mix + 0.05 * RNG.standard_normal((n, dim))).astype(np.float32)
    xv = jnp.asarray(x)
    ones = jnp.ones(n, bool)

    cb_p = pq_fit(xv, ones, m, k)
    codes_p = pq_encode(xv, cb_p, m, k, "euclidean")
    err_plain = float(jnp.mean(jnp.sum((_pq_decode(codes_p, cb_p) - xv) ** 2, -1)))

    rot, cb_o = opq_fit(xv, ones, m, k, iters=4)
    # Rotation is orthonormal: R Rᵀ = I (distances preserved)
    eye = np.asarray(rot @ rot.T)
    assert np.allclose(eye, np.eye(dim), atol=1e-4)
    xr = xv @ rot
    codes_o = pq_encode(xr, cb_o, m, k, "euclidean")
    err_opq = float(jnp.mean(jnp.sum((_pq_decode(codes_o, cb_o) - xr) ** 2, -1)))
    assert err_opq < err_plain * 0.9, (err_opq, err_plain)


def test_opq_store_roundtrip_and_self_distance():
    """VectorStore with opq=True: fit trigger learns the rotation, ADC
    self-distances stay near zero, and persistence carries the rotation."""
    from semadb_tpu.models.quantizer import ProductQuantizerParams, Quantizer

    dim = 32
    q = Quantizer(
        type="product",
        product=ProductQuantizerParams(
            num_centroids=16, num_subvectors=8, trigger_threshold=1000, opq=True
        ),
    )
    cfg = QuantConfig.from_params(q, dim, "euclidean")
    assert cfg.opq
    store = VectorStore(cfg)
    z = RNG.standard_normal((1200, 8)).astype(np.float32)
    mix = RNG.standard_normal((8, dim)).astype(np.float32)
    vectors = jnp.asarray((z @ mix + 0.05 * RNG.standard_normal((1200, dim))).astype(np.float32))
    exists = jnp.ones(1200, bool)
    assert store.maybe_fit(vectors, exists)
    assert store.state.rot is not None
    d = np.asarray(store.scan_distances(vectors[:4], vectors, exists))
    # self ADC distance far below random-pair distance
    assert np.mean(np.diag(d[:, :4])) < np.mean(d[:, 500:520]) * 0.2
    # persistence round-trip keeps the rotation
    store2 = VectorStore(cfg)
    store2.load_arrays(store.to_arrays())
    d2 = np.asarray(store2.scan_distances(vectors[:4], vectors, exists))
    assert np.allclose(d, d2, atol=1e-4)


def test_two_level_assign_matches_flat():
    """kmeans_assign_two_level with full super coverage (n_sup=supers) must
    agree with the flat top-t assignment — the grouped scoring + device
    scatter is a pure reorganisation of the same distance computation.
    Covers both the direct-data and row_ids (gather) paths."""
    from semadb_tpu.vectorstore.kmeans import (
        kmeans_assign,
        kmeans_assign_two_level,
        kmeans_fit_two_level,
    )

    n, d, supers, kc = 3000, 16, 4, 8
    data = jnp.asarray(RNG.standard_normal((n, d)).astype(np.float32))
    cents, labels, sup_cents = kmeans_fit_two_level(
        data, supers * kc, iters=6, supers=supers
    )
    flat = np.asarray(kmeans_assign(data, cents, 2))
    two = np.asarray(
        kmeans_assign_two_level(data, sup_cents, cents, 2, n_sup=supers)
    )
    assert np.array_equal(flat, two)
    # labels returned by the fit agree with a fresh full-coverage assign
    assert np.array_equal(np.asarray(labels), flat[:, 0])
    # row_ids path: a permuted view through a backing matrix
    perm = np.random.default_rng(3).permutation(n)[: n // 2].astype(np.int32)
    two_r = np.asarray(
        kmeans_assign_two_level(
            data, sup_cents, cents, 2, row_ids=jnp.asarray(perm), n_sup=supers
        )
    )
    assert np.array_equal(flat[perm], two_r)
