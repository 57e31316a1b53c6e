"""FusedHybridIVF: exact weighted score fusion via augmented-space dot
search (index/fused.py). The key property under test: recall vs the
EXACT combined-score ground truth — the metric on which partial-score
fusion (reference search.go:211-298) and pooled-rerank hybrids are
structurally lossy — is ~1.0, including under per-query weight
overrides that differ from the build-time defaults."""

import numpy as np
import pytest

from semadb_tpu.index.fused import FusedHybridIVF
from semadb_tpu.models.errors import ValidationError


def _clustered(rng, n, d, n_centers=40, scale=0.5):
    centers = rng.standard_normal((n_centers, d)).astype(np.float32) * 4
    lab = rng.integers(0, n_centers, n)
    return (
        centers[lab] + rng.standard_normal((n, d)).astype(np.float32) * scale
    ).astype(np.float32)


def _fused_gt(views, qviews, metrics, w, k):
    total = np.zeros((qviews[0].shape[0], views[0].shape[0]), np.float64)
    for i, (x, q) in enumerate(zip(views, qviews)):
        if metrics[i] == "euclidean":
            d = ((q[:, None, :] - x[None, :, :]) ** 2).sum(-1)
        elif metrics[i] == "cosine":
            d = 1.0 - q @ x.T
        else:
            d = -(q @ x.T)
        total += w[i] * d
    order = np.argsort(total, axis=1)[:, :k]
    return order, np.take_along_axis(total, order, axis=1)


def _recall(res_ids, gt_rows, ids, k):
    gt_ids = ids[gt_rows]
    hits = [
        len(set(np.asarray(res_ids[i]).tolist()) & set(gt_ids[i].tolist()))
        for i in range(len(gt_rows))
    ]
    return np.mean(hits) / k


@pytest.fixture(scope="module")
def dual_eucl():
    rng = np.random.default_rng(7)
    n = 4000
    v1 = _clustered(rng, n, 48)
    v2 = _clustered(rng, n, 24)
    ids = np.arange(2, n + 2, dtype=np.int64)
    idx = FusedHybridIVF([48, 24], ["euclidean", "euclidean"], [0.7, 0.3])
    idx.insert_bulk(ids, [v1, v2])
    return idx, ids, v1, v2


def test_exact_fusion_recall(dual_eucl):
    idx, ids, v1, v2 = dual_eucl
    rng = np.random.default_rng(8)
    nq = 64
    q1 = v1[:nq] + rng.standard_normal((nq, 48)).astype(np.float32) * 0.05
    q2 = v2[:nq] + rng.standard_normal((nq, 24)).astype(np.float32) * 0.05
    gt, gt_d = _fused_gt([v1, v2], [q1, q2], ["euclidean", "euclidean"], [0.7, 0.3], 10)
    d, i = idx.search_batch([q1, q2], 10)
    assert _recall(i, gt, ids, 10) >= 0.99
    # reported distances are the true fused combined distances
    np.testing.assert_allclose(d[:, 0], gt_d[:, 0], rtol=1e-3, atol=1e-2)


def test_per_query_weight_override(dual_eucl):
    """Weights far from the build default still yield exact fusion: the
    augmented query divides the baked-in scaling back out."""
    idx, ids, v1, v2 = dual_eucl
    rng = np.random.default_rng(9)
    nq = 48
    q1 = v1[100 : 100 + nq] + rng.standard_normal((nq, 48)).astype(np.float32) * 0.05
    q2 = v2[100 : 100 + nq] + rng.standard_normal((nq, 24)).astype(np.float32) * 0.05
    for w in ([0.2, 0.8], [0.9, 0.1], [1.0, 1.0]):
        gt, _ = _fused_gt([v1, v2], [q1, q2], ["euclidean", "euclidean"], w, 10)
        _, i = idx.search_batch([q1, q2], 10, weights=w)
        assert _recall(i, gt, ids, 10) >= 0.95, w


def test_mixed_metric_views():
    """euclidean + cosine views fuse exactly (cosine contributes no norm
    column; its per-query +w constant is rank-invariant)."""
    rng = np.random.default_rng(11)
    n = 3000
    v1 = _clustered(rng, n, 32)
    v2 = _clustered(rng, n, 16)
    v2 /= np.linalg.norm(v2, axis=1, keepdims=True)
    ids = np.arange(2, n + 2, dtype=np.int64)
    idx = FusedHybridIVF([32, 16], ["euclidean", "cosine"], [0.6, 0.4])
    idx.insert_bulk(ids, [v1, v2])
    nq = 48
    q1 = v1[:nq] + rng.standard_normal((nq, 32)).astype(np.float32) * 0.05
    q2 = v2[:nq] + rng.standard_normal((nq, 16)).astype(np.float32) * 0.02
    q2 /= np.linalg.norm(q2, axis=1, keepdims=True)
    gt, gt_d = _fused_gt([v1, v2], [q1, q2], ["euclidean", "cosine"], [0.6, 0.4], 10)
    d, i = idx.search_batch([q1, q2], 10)
    assert _recall(i, gt, ids, 10) >= 0.98
    np.testing.assert_allclose(d[:, 0], gt_d[:, 0], rtol=1e-3, atol=1e-2)


def test_incremental_write_and_delete(dual_eucl):
    rng = np.random.default_rng(12)
    n = 2000
    v1 = _clustered(rng, n, 48)
    v2 = _clustered(rng, n, 24)
    ids = np.arange(2, n + 2, dtype=np.int64)
    idx = FusedHybridIVF([48, 24], ["euclidean", "euclidean"], [0.7, 0.3])
    idx.insert_bulk(ids, [v1, v2])
    # insert a point identical to a probe query: must come back rank 1
    nv1 = v1[17] + 0.001
    nv2 = v2[17] + 0.001
    idx.insert_update_delete([(99999, (nv1, nv2))])
    _, i = idx.search_batch([v1[17:18], v2[17:18]], 3)
    assert 99999 in np.asarray(i[0]).tolist()
    # delete it: must disappear
    idx.insert_update_delete([(99999, None)])
    _, i = idx.search_batch([v1[17:18], v2[17:18]], 3)
    assert 99999 not in np.asarray(i[0]).tolist()


def test_filter_mask(dual_eucl):
    idx, ids, v1, v2 = dual_eucl
    mask = np.zeros(idx.capacity, bool)
    allowed = ids[::7]
    mask[allowed] = True
    _, i = idx.search_batch([v1[:8], v2[:8]], 5, filter_mask=mask)
    got = np.asarray(i)
    assert np.all(np.isin(got[got >= 0], allowed))


def test_persistence_roundtrip(dual_eucl):
    idx, ids, v1, v2 = dual_eucl
    arrays = idx.to_arrays()
    idx2 = FusedHybridIVF.from_arrays(arrays)
    assert idx2.view_dims == [48, 24]
    assert idx2.view_metrics == ["euclidean", "euclidean"]
    q1, q2 = v1[:16], v2[:16]
    d_a, i_a = idx.search_batch([q1, q2], 10)
    d_b, i_b = idx2.search_batch([q1, q2], 10)
    np.testing.assert_array_equal(np.asarray(i_a), np.asarray(i_b))
    np.testing.assert_allclose(np.asarray(d_a), np.asarray(d_b), rtol=1e-5)


def test_validation():
    with pytest.raises(ValidationError):
        FusedHybridIVF([32], ["euclidean"])
    with pytest.raises(ValidationError):
        FusedHybridIVF([32, 16], ["euclidean", "haversine"])
    with pytest.raises(ValidationError):
        FusedHybridIVF([32, 16], ["euclidean", "euclidean"], [0.5, -1.0])
    idx = FusedHybridIVF([32, 16], ["euclidean", "euclidean"])
    with pytest.raises(ValidationError):
        idx.insert_bulk([2], [np.zeros((1, 32), np.float32)])
    with pytest.raises(ValidationError):
        idx.search_batch(
            [np.zeros((1, 32), np.float32), np.zeros((1, 16), np.float32)],
            5,
            weights=[1.0],
        )
