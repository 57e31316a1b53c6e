"""Distance kernel parity tests.

Mirrors distance/distance_test.go + distance_amd64_test.go: kernels checked
against straightforward NumPy implementations at several dims.
"""

import numpy as np
import pytest

from semadb_tpu.models import constants as C
from semadb_tpu.ops import bitops
from semadb_tpu.ops.distance import (
    distance,
    gather_distance,
    pairwise_bit_distance,
    pairwise_distance,
)

RNG = np.random.default_rng(42)


def np_sq_euclidean(x, y):
    d = x - y
    return float(np.sum(d * d))


def np_dot_dist(x, y):
    return float(-np.dot(x, y))


def np_cosine_dist(x, y):
    return float(1 - np.dot(x, y))


def np_haversine(x, y):
    lat1, lon1, lat2, lon2 = np.radians([x[0], x[1], y[0], y[1]]).astype(np.float64)
    dlat, dlon = lat1 - lat2, lon1 - lon2
    a = np.sin(dlat / 2) ** 2 + np.cos(lat1) * np.cos(lat2) * np.sin(dlon / 2) ** 2
    return float(6371000.0 * 2 * np.arcsin(np.sqrt(a)))


@pytest.mark.parametrize("dim", [25, 128, 768, 1536])
def test_euclidean_dot_cosine_parity(dim):
    x = RNG.standard_normal(dim).astype(np.float32)
    y = RNG.standard_normal(dim).astype(np.float32)
    assert distance(x, y, C.DISTANCE_EUCLIDEAN) == pytest.approx(
        np_sq_euclidean(x, y), rel=1e-3
    )
    assert distance(x, y, C.DISTANCE_DOT) == pytest.approx(np_dot_dist(x, y), rel=1e-3, abs=1e-3)
    xn = x / np.linalg.norm(x)
    yn = y / np.linalg.norm(y)
    assert distance(xn, yn, C.DISTANCE_COSINE) == pytest.approx(
        np_cosine_dist(xn, yn), rel=1e-3, abs=1e-4
    )


def test_haversine_parity():
    # London → Paris approx 343.5 km
    london = np.array([51.5074, -0.1278], dtype=np.float32)
    paris = np.array([48.8566, 2.3522], dtype=np.float32)
    d = float(distance(london, paris, C.DISTANCE_HAVERSINE))
    assert d == pytest.approx(np_haversine(london, paris), rel=1e-3)
    assert 330_000 < d < 360_000


def test_pairwise_matches_single():
    B, N, D = 7, 33, 64
    q = RNG.standard_normal((B, D)).astype(np.float32)
    x = RNG.standard_normal((N, D)).astype(np.float32)
    for metric in [C.DISTANCE_EUCLIDEAN, C.DISTANCE_DOT, C.DISTANCE_COSINE]:
        mat = np.asarray(pairwise_distance(q, x, metric))
        assert mat.shape == (B, N)
        for i in [0, 3, 6]:
            for j in [0, 17, 32]:
                assert mat[i, j] == pytest.approx(
                    float(distance(q[i], x[j], metric)), rel=1e-3, abs=1e-3
                )


def test_euclidean_nonnegative():
    # Expansion formula must not go negative on identical vectors
    x = RNG.standard_normal((5, 32)).astype(np.float32)
    mat = np.asarray(pairwise_distance(x, x, C.DISTANCE_EUCLIDEAN))
    assert np.all(mat >= 0)
    assert np.allclose(np.diag(mat), 0, atol=1e-3)


def test_gather_distance():
    cap, D, B, K = 50, 16, 4, 8
    vectors = RNG.standard_normal((cap, D)).astype(np.float32)
    ids = RNG.integers(0, cap, size=(B, K)).astype(np.int32)
    q = RNG.standard_normal((B, D)).astype(np.float32)
    out = np.asarray(gather_distance(vectors, ids, q, C.DISTANCE_EUCLIDEAN))
    for b in range(B):
        for k in range(K):
            assert out[b, k] == pytest.approx(
                np_sq_euclidean(q[b], vectors[ids[b, k]]), rel=1e-3
            )


def test_hamming_jaccard():
    dim = 100
    a_bits = RNG.integers(0, 2, dim).astype(bool)
    b_bits = RNG.integers(0, 2, dim).astype(bool)
    a = np.asarray(bitops.pack_bits(a_bits, dim))[None, :]
    b = np.asarray(bitops.pack_bits(b_bits, dim))[None, :]
    ham = float(pairwise_bit_distance(a, b, C.DISTANCE_HAMMING)[0, 0])
    assert ham == np.sum(a_bits != b_bits)
    inter = np.sum(a_bits & b_bits)
    union = np.sum(a_bits | b_bits)
    jac = float(pairwise_bit_distance(a, b, C.DISTANCE_JACCARD)[0, 0])
    expected = 0.0 if union == 0 else 1 - inter / union
    assert jac == pytest.approx(expected, rel=1e-5)


def test_jaccard_zero_union():
    z = np.zeros((1, 4), dtype=np.uint32)
    assert float(pairwise_bit_distance(z, z, C.DISTANCE_JACCARD)[0, 0]) == 0.0


def test_pack_unpack_roundtrip():
    for dim in [1, 31, 32, 33, 100, 256]:
        bits = RNG.integers(0, 2, dim).astype(bool)
        packed = bitops.pack_bits(bits, dim)
        assert packed.shape[-1] == bitops.packed_width(dim)
        out = np.asarray(bitops.unpack_bits(packed, dim))
        assert np.array_equal(out, bits)
