"""Shard engine tests.

Mirrors shard/shard_vector_test.go + shard_test.go: CRUD through the full
schema fixture, update merge with "_delete" tombstones, hybrid search,
select/sort/offset/limit, persistence across reopen.
"""

import uuid

import numpy as np
import pytest

from semadb_tpu.models import (
    Collection,
    ExistsError,
    IndexSchema,
    Point,
    SearchRequest,
    UserPlan,
    ValidationError,
    encode_point_data,
)
from semadb_tpu.shard import Shard
from semadb_tpu.store import open_store

RNG = np.random.default_rng(5)


def sample_schema() -> IndexSchema:
    return IndexSchema.from_dict(
        {
            "vector": {
                "type": "vectorVamana",
                "vectorVamana": {
                    "vectorSize": 2,
                    "distanceMetric": "euclidean",
                    "searchSize": 36,
                    "degreeBound": 32,
                    "alpha": 1.2,
                },
            },
            "flat": {
                "type": "vectorFlat",
                "vectorFlat": {"vectorSize": 2, "distanceMetric": "euclidean"},
            },
            "description": {"type": "text", "text": {"analyser": "standard"}},
            "category": {"type": "string", "string": {"caseSensitive": False}},
            "labels": {"type": "stringArray", "stringArray": {"caseSensitive": False}},
            "size": {"type": "integer"},
            "price": {"type": "float"},
        }
    )


def make_shard(path="") -> Shard:
    col = Collection(
        user_id="u1", id="c1", index_schema=sample_schema(), user_plan=UserPlan()
    )
    return Shard(open_store(path), col)


def make_points(n, offset=0):
    pts = []
    for i in range(n):
        x = offset + i
        data = {
            "vector": [float(x), float(x)],
            "flat": [float(x), float(x)],
            "description": f"point number {x} of the flock",
            "category": ["alpha", "beta", "gamma"][x % 3],
            "labels": [f"l{x % 2}", f"l{x % 5}"],
            "size": x,
            "price": float(x) / 2,
        }
        pts.append(Point.from_map(data, uuid.UUID(int=x + 1)))
    return pts


def vamana_query(vec, limit=10):
    return {
        "property": "vector",
        "vectorVamana": {
            "vector": list(vec),
            "operator": "near",
            "searchSize": 36,
            "limit": limit,
        },
    }


def test_insert_and_search():
    shard = make_shard()
    pts = make_points(30)
    shard.insert_points(pts)
    assert shard.point_count() == 30
    res = shard.search_points(
        SearchRequest.from_dict({"query": vamana_query([3.0, 3.0], 5), "limit": 5})
    )
    assert len(res) == 5
    assert res[0].point.id == pts[3].id
    assert res[0].distance == pytest.approx(0.0, abs=1e-5)


def test_insert_duplicates_rejected():
    shard = make_shard()
    p = make_points(1)[0]
    with pytest.raises(ValidationError):
        shard.insert_points([p, p])
    shard.insert_points([p])
    with pytest.raises(ExistsError):
        shard.insert_points([p])


def test_update_merge_and_tombstone():
    shard = make_shard()
    pts = make_points(10)
    shard.insert_points(pts)
    # Update point 0: change category, delete price
    up = Point(
        id=pts[0].id,
        data=encode_point_data({"category": "delta", "price": "_delete"}),
    )
    updated = shard.update_points([up])
    assert updated == [pts[0].id]
    res = shard.search_points(
        SearchRequest.from_dict(
            {
                "query": {
                    "property": "category",
                    "string": {"value": "delta", "operator": "equals"},
                },
                "limit": 10,
                "select": ["*"],
            }
        )
    )
    assert len(res) == 1
    m = res[0].point.as_map()
    assert m["category"] == "delta"
    assert "price" not in m
    assert m["size"] == 0  # untouched fields preserved
    # Unknown point → skipped
    ghost = Point(id=uuid.uuid4(), data=encode_point_data({"size": 1}))
    assert shard.update_points([ghost]) == []


def test_delete_points():
    shard = make_shard()
    pts = make_points(20)
    shard.insert_points(pts)
    deleted = shard.delete_points({pts[0].id, pts[1].id, uuid.uuid4()})
    assert set(deleted) == {pts[0].id, pts[1].id}
    assert shard.point_count() == 18
    res = shard.search_points(
        SearchRequest.from_dict({"query": vamana_query([0.0, 0.0], 5), "limit": 5})
    )
    ids = {r.point.id for r in res}
    assert pts[0].id not in ids and pts[1].id not in ids


def test_hybrid_and_search():
    shard = make_shard()
    shard.insert_points(make_points(30))
    req = SearchRequest.from_dict(
        {
            "query": {
                "property": "_and",
                "_and": [
                    vamana_query([5.0, 5.0], 10),
                    {
                        "property": "size",
                        "integer": {"value": 10, "operator": "lessThan"},
                    },
                ],
            },
            "limit": 10,
            "select": ["*"],
        }
    )
    res = shard.search_points(req)
    assert 0 < len(res) <= 10
    for r in res:
        assert r.point.as_map()["size"] < 10


def test_or_query_score_fusion():
    shard = make_shard()
    shard.insert_points(make_points(30))
    req = SearchRequest.from_dict(
        {
            "query": {
                "property": "_or",
                "_or": [
                    vamana_query([5.0, 5.0], 5),
                    {
                        "property": "flat",
                        "vectorFlat": {
                            "vector": [5.0, 5.0],
                            "operator": "near",
                            "limit": 5,
                        },
                    },
                ],
            },
            "limit": 10,
            "select": ["*"],
        }
    )
    res = shard.search_points(req)
    # Point 5 found by both searches → summed hybrid score ranks first
    assert res[0].point.as_map()["size"] == 5
    assert res[0].hybrid_score == pytest.approx(0.0, abs=1e-4)


def test_text_search():
    shard = make_shard()
    shard.insert_points(make_points(10))
    req = SearchRequest.from_dict(
        {
            "query": {
                "property": "description",
                "text": {
                    "value": "number 3",
                    "operator": "containsAll",
                    "limit": 5,
                },
            },
            "limit": 5,
            "select": ["*"],
        }
    )
    res = shard.search_points(req)
    assert len(res) == 1
    assert res[0].point.as_map()["size"] == 3
    assert res[0].score is not None and res[0].score > 0


def test_string_array_and_filters():
    shard = make_shard()
    shard.insert_points(make_points(20))
    req = SearchRequest.from_dict(
        {
            "query": {
                "property": "labels",
                "stringArray": {"value": ["l1"], "operator": "containsAny"},
            },
            "limit": 100,
            "select": ["*"],
        }
    )
    res = shard.search_points(req)
    for r in res:
        assert "l1" in r.point.as_map()["labels"]

    # Vector search with a filter subquery
    req2 = SearchRequest.from_dict(
        {
            "query": {
                "property": "vector",
                "vectorVamana": {
                    "vector": [5.0, 5.0],
                    "operator": "near",
                    "searchSize": 36,
                    "limit": 10,
                    "filter": {
                        "property": "category",
                        "string": {"value": "alpha", "operator": "equals"},
                    },
                },
            },
            "limit": 10,
            "select": ["*"],
        }
    )
    res2 = shard.search_points(req2)
    assert len(res2) > 0
    for r in res2:
        assert r.point.as_map()["category"] == "alpha"


def test_range_queries():
    shard = make_shard()
    shard.insert_points(make_points(20))
    req = SearchRequest.from_dict(
        {
            "query": {
                "property": "price",
                "float": {"value": 2.0, "endValue": 4.0, "operator": "inRange"},
            },
            "limit": 100,
            "select": ["*"],
        }
    )
    res = shard.search_points(req)
    prices = sorted(r.point.as_map()["price"] for r in res)
    assert prices == [2.0, 2.5, 3.0, 3.5, 4.0]


def test_id_query():
    shard = make_shard()
    pts = make_points(5)
    shard.insert_points(pts)
    req = SearchRequest.from_dict(
        {
            "query": {
                "property": "_id",
                "string": {"value": str(pts[2].id), "operator": "equals"},
            },
            "limit": 10,
        }
    )
    res = shard.search_points(req)
    assert len(res) == 1 and res[0].point.id == pts[2].id


def test_select_sort_offset_limit():
    shard = make_shard()
    shard.insert_points(make_points(20))
    req = SearchRequest.from_dict(
        {
            "query": {
                "property": "size",
                "integer": {"value": 100, "operator": "lessThan"},
            },
            "select": ["size"],
            "sort": [{"property": "size", "descending": True}],
            "offset": 2,
            "limit": 5,
        }
    )
    res = shard.search_points(req)
    sizes = [r.decoded_data["size"] for r in res]
    assert sizes == [17, 16, 15, 14, 13]
    # selected data excludes other properties
    assert "price" not in res[0].decoded_data


def test_persistence_across_reopen(tmp_path):
    path = str(tmp_path / "shard.sdb")
    shard = make_shard(path)
    pts = make_points(15)
    shard.insert_points(pts)
    shard.close()

    shard2 = make_shard(path)
    assert shard2.point_count() == 15
    res = shard2.search_points(
        SearchRequest.from_dict({"query": vamana_query([3.0, 3.0], 3), "limit": 3})
    )
    assert res[0].point.id == pts[3].id


@pytest.mark.parametrize("backend", ["python", "native"])
def test_crash_between_txns_recovers_device_state(tmp_path, backend):
    """Kill the process between committed write txns (simulated by dropping
    the shard without flush/close): reopening must show vector search
    results for exactly the committed points — the device-index journal
    replays on top of the last snapshot (bbolt per-txn durability parity)."""
    if backend == "native":
        pytest.importorskip("semadb_tpu.store.native")
        from semadb_tpu.store.native import load_library

        if load_library() is None:
            pytest.skip("native engine not built")
    path = str(tmp_path / "shard.db")
    col = Collection(
        user_id="u1", id="c1", index_schema=sample_schema(), user_plan=UserPlan()
    )
    shard = Shard(open_store(path, backend=backend), col)
    shard.insert_points(make_points(10))
    shard.flush()  # snapshot at 10 points
    shard.insert_points(make_points(10, offset=10))  # journaled txn 1
    shard.insert_points(make_points(5, offset=20))   # journaled txn 2
    shard.delete_points({uuid.UUID(int=3)})          # journaled txn 3 (point x=2)
    # Crash: no shard.flush()/close(); only release the file handle
    shard.db.close()

    shard2 = Shard(open_store(path, backend=backend), col)
    assert shard2.point_count() == 24
    res = shard2.search_points(
        SearchRequest.from_dict(
            {"query": vamana_query([22.0, 22.0], limit=5), "limit": 5}
        )
    )
    assert res[0].point.id == uuid.UUID(int=23)  # x=22, inserted post-snapshot
    # the deleted point must not be findable
    res = shard2.search_points(
        SearchRequest.from_dict({"query": vamana_query([2.0, 2.0], limit=3), "limit": 3})
    )
    assert uuid.UUID(int=3) not in [r.point.id for r in res]
    # flat index recovered too
    res = shard2.search_points(
        SearchRequest.from_dict(
            {
                "query": {
                    "property": "flat",
                    "vectorFlat": {"vector": [21.0, 21.0], "operator": "near", "limit": 2},
                },
                "limit": 2,
            }
        )
    )
    assert res[0].point.id == uuid.UUID(int=22)
    shard2.close()


def test_poisoned_batch_leaves_store_and_indices_unchanged(tmp_path):
    """A batch that fails mid-dispatch (after some device indices already
    mutated) must leave the store AND the device indices exactly as before:
    overlay rollback + device scrap/reload (diskstore.go txn rollback;
    cache/manager.go:207-235 scrap)."""
    path = str(tmp_path / "shard.db")
    col = Collection(
        user_id="u1", id="c1", index_schema=sample_schema(), user_plan=UserPlan()
    )
    shard = Shard(open_store(path), col)
    shard.insert_points(make_points(20))
    before_count = shard.point_count()

    # Poison: valid "vector" (vamana dispatches first in schema order and
    # mutates the device graph), invalid "flat" (string -> np.asarray raises)
    bad = []
    for i in range(3):
        data = {"vector": [100.0 + i, 100.0 + i], "flat": "not-a-vector"}
        bad.append(Point.from_map(data, uuid.UUID(int=1000 + i)))
    with pytest.raises(Exception):
        shard.insert_points(bad)

    assert shard.point_count() == before_count
    # the poisoned batch's vamana-side insert must have been scrapped
    res = shard.search_points(
        SearchRequest.from_dict(
            {"query": vamana_query([100.0, 100.0], limit=5), "limit": 5}
        )
    )
    assert uuid.UUID(int=1000) not in [r.point.id for r in res]
    assert all(r.point.id.int <= 20 for r in res)
    # and the shard still accepts + serves valid writes afterwards
    shard.insert_points(make_points(5, offset=50))
    res = shard.search_points(
        SearchRequest.from_dict(
            {"query": vamana_query([51.0, 51.0], limit=1), "limit": 1}
        )
    )
    assert res[0].point.id == uuid.UUID(int=52)
    shard.close()


def test_search_points_batch_matches_single():
    """Batch search must return exactly what N single searches return,
    including select/sort post-processing, with one read txn."""
    shard = make_shard()
    shard.insert_points(make_points(50))
    reqs = []
    for x in (5, 20, 41):
        reqs.append(
            SearchRequest.from_dict(
                {
                    "query": {
                        "property": "vector",
                        "vectorVamana": {
                            "vector": [float(x), float(x)],
                            "operator": "near",
                            "searchSize": 36,
                            "limit": 4,
                        },
                    },
                    "select": ["size", "category"],
                    "limit": 4,
                }
            )
        )
    batched = shard.search_points_batch(reqs)
    assert len(batched) == 3
    for req, out in zip(reqs, batched):
        single = shard.search_points(req)
        assert [r.node_id for r in out] == [r.node_id for r in single]
        assert [r.decoded_data for r in out] == [r.decoded_data for r in single]
    # first hit is the exact point
    for x, out in zip((5, 20, 41), batched):
        assert out[0].decoded_data["size"] == x


def test_search_points_batch_wire_parity():
    """The id-only wire fast path must emit documents IDENTICAL to the
    object path (models.point.result_doc over search_points_batch) — for
    the qualifying ANN shape, the select fallback, and a filtered batch."""
    from semadb_tpu.models.point import result_doc

    shard = make_shard()
    shard.insert_points(make_points(50))

    def vq(x, limit=4, **extra):
        return {
            "query": {
                "property": "vector",
                "vectorVamana": {
                    "vector": [float(x), float(x)],
                    "operator": "near",
                    "searchSize": 36,
                    "limit": limit,
                },
            },
            "limit": limit,
            **extra,
        }

    # Qualifying shape: no select/sort/offset → array fast path
    reqs = [SearchRequest.from_dict(vq(x)) for x in (5, 20, 41)]
    wire = shard.search_points_batch_wire(reqs)
    objs = shard.search_points_batch(reqs)
    assert wire == [[result_doc(r) for r in row] for row in objs]
    assert wire[0][0]["_id"] == str(uuid.UUID(int=6))
    assert set(wire[0][0]) == {"_id", "_distance", "_hybridScore"}

    # select → fallback path, docs still identical
    sel = [SearchRequest.from_dict(vq(x, select=["size"])) for x in (5, 20)]
    wire_sel = shard.search_points_batch_wire(sel)
    objs_sel = shard.search_points_batch(sel)
    assert wire_sel == [[result_doc(r) for r in row] for row in objs_sel]
    assert wire_sel[0][0]["size"] == 5

    # homogeneous filtered batch stays on the fast path and respects the
    # filter (category == beta → ids ≡ 1 mod 3)
    flt = {
        "property": "category",
        "string": {"value": "beta", "operator": "equals"},
    }
    freqs = []
    for x in (5, 20):
        d = vq(x)
        d["query"]["vectorVamana"]["filter"] = flt
        freqs.append(SearchRequest.from_dict(d))
    wire_f = shard.search_points_batch_wire(freqs)
    objs_f = shard.search_points_batch(freqs)
    assert wire_f == [[result_doc(r) for r in row] for row in objs_f]
    for row in wire_f:
        for doc in row:
            assert (uuid.UUID(doc["_id"]).int - 1) % 3 == 1
    shard.close()
