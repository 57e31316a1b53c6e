"""Concurrency stress tests.

Mirrors shard/shard_vector_test.go TestShard_SearchWhileInsert /
DeleteWhileInsert / ConcurrentCRUD — the reference runs these under the Go
race detector; here threads hammer one shard through its public API and we
assert invariants hold (no exceptions, consistent counts, searches always
answer with valid points).
"""

import threading
import uuid

import numpy as np
import pytest

from semadb_tpu.models import Collection, IndexSchema, Point, SearchRequest, UserPlan
from semadb_tpu.shard import Shard
from semadb_tpu.store import open_store

RNG = np.random.default_rng(21)


def schema():
    return IndexSchema.from_dict(
        {
            "v": {
                "type": "vectorVamana",
                "vectorVamana": {
                    "vectorSize": 2,
                    "distanceMetric": "euclidean",
                    "searchSize": 36,
                    "degreeBound": 32,
                },
            },
            "n": {"type": "integer"},
        }
    )


def make_shard():
    return Shard(
        open_store(""),
        Collection(user_id="u", id="c", index_schema=schema(), user_plan=UserPlan()),
    )


def pts(n, offset):
    return [
        Point.from_map(
            {"v": [float(offset + i), float(offset + i)], "n": offset + i},
            uuid.UUID(int=offset + i + 1),
        )
        for i in range(n)
    ]


def search_req(x, limit=5):
    return SearchRequest.from_dict(
        {
            "query": {
                "property": "v",
                "vectorVamana": {
                    "vector": [x, x],
                    "operator": "near",
                    "searchSize": 36,
                    "limit": limit,
                },
            },
            "limit": limit,
            "select": ["*"],
        }
    )


def run_threads(fns):
    errors = []

    def wrap(fn):
        try:
            fn()
        except Exception as e:  # pragma: no cover
            errors.append(e)

    threads = [threading.Thread(target=wrap, args=(fn,)) for fn in fns]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert not errors, f"thread errors: {errors[:3]}"


def test_search_while_insert():
    shard = make_shard()
    shard.insert_points(pts(30, 0))

    stop = threading.Event()

    def inserter():
        for batch in range(3):
            shard.insert_points(pts(20, 100 + batch * 20))
        stop.set()

    def searcher():
        while not stop.is_set():
            res = shard.search_points(search_req(10.0))
            assert len(res) > 0
            for r in res:
                assert r.point is not None and r.point.data

    run_threads([inserter, searcher, searcher])
    assert shard.point_count() == 90


def test_delete_while_insert():
    shard = make_shard()
    shard.insert_points(pts(50, 0))

    def deleter():
        shard.delete_points({uuid.UUID(int=i + 1) for i in range(0, 50, 2)})

    def inserter():
        shard.insert_points(pts(30, 200))

    run_threads([deleter, inserter])
    assert shard.point_count() == 50 - 25 + 30


def test_concurrent_crud():
    shard = make_shard()
    shard.insert_points(pts(40, 0))

    def updater():
        ups = [
            Point.from_map({"n": 9000 + i}, uuid.UUID(int=i + 1)) for i in range(10)
        ]
        shard.update_points(ups)

    def deleter():
        shard.delete_points({uuid.UUID(int=i + 1) for i in range(30, 40)})

    def inserter():
        shard.insert_points(pts(20, 500))

    def searcher():
        for _ in range(5):
            shard.search_points(search_req(3.0))

    run_threads([updater, deleter, inserter, searcher])
    assert shard.point_count() == 40 - 10 + 20
    # updated points hold merged data
    res = shard.search_points(
        SearchRequest.from_dict(
            {
                "query": {
                    "property": "n",
                    "integer": {"value": 9000, "operator": "greaterThanOrEquals"},
                },
                "limit": 100,
            }
        )
    )
    assert len(res) == 10


def test_large_insert_delete_insert_search():
    """shard_vector_test.go LargeInsertDeleteInsertSearch — random 2-D
    points like the reference's randPoints fixture."""
    shard = make_shard()

    def rpts(n, offset):
        vec = RNG.random((n, 2)).astype(np.float32)
        return [
            Point.from_map(
                {"v": vec[i].tolist(), "n": offset + i}, uuid.UUID(int=offset + i + 1)
            )
            for i in range(n)
        ]

    first = rpts(200, 0)
    shard.insert_points(first)
    shard.delete_points({p.id for p in first[:100]})
    second = rpts(100, 1000)
    shard.insert_points(second)
    assert shard.point_count() == 200
    # every reinserted point must be findable by its own vector
    hits = 0
    for p in second[:20]:
        v = p.as_map()["v"]
        res = shard.search_points(search_req_vec(v, limit=1))
        if res and res[0].point.id == p.id:
            hits += 1
    assert hits >= 19, f"reinserted points unsearchable: {20 - hits}/20 missing"


def search_req_vec(v, limit=5):
    return SearchRequest.from_dict(
        {
            "query": {
                "property": "v",
                "vectorVamana": {
                    "vector": list(v),
                    "operator": "near",
                    "searchSize": 36,
                    "limit": limit,
                },
            },
            "limit": limit,
        }
    )


def test_ivf_search_while_insert():
    """The IVF engine under concurrent readers/writers through the shard
    API: searches must always answer with valid live points while another
    thread streams inserts (triggering at least one device-side refit)."""
    ivf_schema = IndexSchema.from_dict(
        {
            "v": {
                "type": "vectorIVF",
                "vectorIVF": {
                    "vectorSize": 8,
                    "distanceMetric": "euclidean",
                    "assignCopies": 2,
                },
            }
        }
    )
    shard = Shard(
        open_store(""),
        Collection(user_id="u", id="c", index_schema=ivf_schema, user_plan=UserPlan()),
    )
    base = [
        Point.from_map({"v": RNG.standard_normal(8).astype(float).tolist()},
                       uuid.UUID(int=i + 1))
        for i in range(700)
    ]
    shard.insert_points(base)  # past MIN_FIT: fitted state

    stop = threading.Event()
    def writer():
        for r in range(6):
            more = [
                Point.from_map({"v": RNG.standard_normal(8).astype(float).tolist()},
                               uuid.UUID(int=10_000 + r * 100 + i))
                for i in range(100)
            ]
            shard.insert_points(more)
        stop.set()

    def reader():
        req = SearchRequest.from_dict(
            {"query": {"property": "v", "vectorIVF": {
                "vector": [0.0] * 8, "limit": 5}}, "limit": 5}
        )
        while not stop.is_set():
            res = shard.search_points(req)
            assert 1 <= len(res) <= 5
            assert all(r.point.id is not None for r in res)

    run_threads([writer, reader, reader])
    shard.close()


def test_parallel_subquery_fanout_deterministic():
    """_and/_or children now run in a thread pool (search.go:211-241
    goroutine parity): repeated combined queries — themselves issued from
    multiple threads — must agree with each other and respect the AND
    semantics."""
    import msgpack

    shard = make_shard()
    pts = [
        Point(
            id=uuid.uuid4(),
            data=msgpack.packb({"v": [float(i), float(i)], "n": i}),
        )
        for i in range(40)
    ]
    shard.insert_points(pts)
    req = SearchRequest.from_dict(
        {
            "query": {
                "property": "_and",
                "_and": [
                    {
                        "property": "v",
                        "vectorVamana": {
                            "vector": [5.0, 5.0],
                            "operator": "near",
                            "searchSize": 36,
                            "limit": 15,
                        },
                    },
                    {"property": "n", "integer": {"value": 10, "operator": "lessThan"}},
                    {"property": "n", "integer": {"value": 2, "operator": "greaterThan"}},
                ],
            },
            "limit": 10,
            "select": ["*"],
        }
    )
    results = []
    errors = []

    def worker():
        try:
            for _ in range(5):
                res = shard.search_points(req)
                results.append([str(r.point.id) for r in res])
        except Exception as e:  # pragma: no cover
            errors.append(e)

    threads = [threading.Thread(target=worker) for _ in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors
    assert len(results) == 20
    first = results[0]
    assert all(r == first for r in results), "non-deterministic fan-out"
    res = shard.search_points(req)
    for r in res:
        assert 2 < r.point.as_map()["n"] < 10


def test_ivf_concurrent_writers_donation_safe():
    """TWO writer threads plus searchers on one IVF engine: donated
    scatters (read->donate->rebind under the per-index lock) must never
    hand a deleted buffer to a concurrent dispatch, and every inserted
    point must be findable afterwards."""
    from semadb_tpu.index.ivf import IndexIVF
    from semadb_tpu.models.schema import VectorIVFParams

    idx = IndexIVF(
        VectorIVFParams(vector_size=8, distance_metric="euclidean",
                        assign_copies=2)
    )
    base = RNG.standard_normal((800, 8)).astype("float32")
    idx.insert_update_delete(zip(range(2, 802), base))
    assert idx._n_at_fit > 0
    errors = []

    def writer(start):
        try:
            for r in range(4):
                vs = RNG.standard_normal((100, 8)).astype("float32")
                idx.insert_update_delete(
                    zip(range(start + r * 100, start + (r + 1) * 100), vs)
                )
        except Exception as e:  # pragma: no cover
            errors.append(e)

    def searcher():
        try:
            for _ in range(25):
                d, i = idx.search_batch(base[:8], k=5)
                assert i.shape == (8, 5)
        except Exception as e:  # pragma: no cover
            errors.append(e)

    ts = [
        threading.Thread(target=writer, args=(20_000,)),
        threading.Thread(target=writer, args=(40_000,)),
        threading.Thread(target=searcher),
        threading.Thread(target=searcher),
    ]
    for t in ts:
        t.start()
    for t in ts:
        t.join(timeout=300)
    assert not errors, f"thread errors: {errors[:3]}"
    assert len(idx) == 800 + 2 * 400
    # every concurrent insert is findable by exact self-search
    for start in (20_000, 40_000):
        nid = start + 137
        loc = idx._loc.get(nid)
        assert loc is not None, f"point {nid} lost"
