"""Tests for top-k / sorted merge primitives (DistSet replacement).

Mirrors shard/index/vamana/distset_test.go semantics: ordered candidate
lists with dedup on insert.
"""

import numpy as np

from semadb_tpu.ops import topk


def test_top_k_smallest():
    d = np.array([[5.0, 1.0, 3.0, 2.0, 4.0]], dtype=np.float32)
    vals, idx = topk.top_k_smallest(d, 3)
    assert np.allclose(np.asarray(vals)[0], [1.0, 2.0, 3.0])
    assert list(np.asarray(idx)[0]) == [1, 3, 2]


def test_sort_by_distance_tie_break():
    d = np.array([[2.0, 1.0, 2.0]], dtype=np.float32)
    i = np.array([[7, 5, 3]], dtype=np.int32)
    sd, si = topk.sort_by_distance(d, i)
    assert list(np.asarray(sd)[0]) == [1.0, 2.0, 2.0]
    assert list(np.asarray(si)[0]) == [5, 3, 7]  # ties by id ascending


def test_merge_topk_dedup():
    da = np.array([[1.0, 3.0]], dtype=np.float32)
    ia = np.array([[10, 20]], dtype=np.int32)
    db = np.array([[2.0, 3.0]], dtype=np.float32)
    ib = np.array([[10, 30]], dtype=np.int32)
    md, mi = topk.merge_topk(da, ia, db, ib, 3)
    # id 10 duplicated: keep best (1.0); results sorted
    assert list(np.asarray(mi)[0]) == [10, 20, 30]
    assert np.allclose(np.asarray(md)[0], [1.0, 3.0, 3.0])


def test_merge_topk_invalid_slots():
    da = np.array([[np.inf, 1.0]], dtype=np.float32)
    ia = np.array([[-1, 4]], dtype=np.int32)
    db = np.array([[np.inf, np.inf]], dtype=np.float32)
    ib = np.array([[-1, -1]], dtype=np.int32)
    md, mi = topk.merge_topk(da, ia, db, ib, 2)
    assert np.asarray(mi)[0, 0] == 4
    assert np.asarray(mi)[0, 1] == -1
    assert np.isinf(np.asarray(md)[0, 1])


def test_dedup_keeps_best():
    d = np.array([[3.0, 1.0, 3.0, 1.0]], dtype=np.float32)
    i = np.array([[5, 5, 5, 5]], dtype=np.int32)
    dd, di = topk.dedup_by_id(d, i)
    di = np.asarray(di)[0]
    # Only one survivor: the first occurrence of the minimum
    keep = di == 5
    assert keep.sum() == 1
    assert np.asarray(dd)[0][keep][0] == 1.0


def test_masked_top_k():
    d = np.array([[1.0, 2.0, 3.0, 4.0]], dtype=np.float32)
    m = np.array([[False, True, False, True]])
    vals, idx = topk.masked_top_k(d, m, 2)
    assert list(np.asarray(idx)[0]) == [1, 3]
