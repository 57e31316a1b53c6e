"""vectorFused through the full shard stack: schema validation/coercion,
dispatch into FusedHybridIVF, query execution (with per-query weights,
filters, hybrid combination), and snapshot+journal persistence. The
fused type has no reference counterpart (index/fused.py rationale); the
surface mirrors the other vector types (shard/shard_vector_test.go
style)."""

import uuid

import numpy as np
import pytest

from semadb_tpu.models import (
    Collection,
    IndexSchema,
    Point,
    SearchRequest,
    UserPlan,
    ValidationError,
)
from semadb_tpu.shard import Shard
from semadb_tpu.store import open_store

RNG = np.random.default_rng(21)
D1, D2 = 12, 6


def fused_schema() -> IndexSchema:
    return IndexSchema.from_dict(
        {
            "embeds": {
                "type": "vectorFused",
                "vectorFused": {
                    "views": [
                        {"vectorSize": D1, "distanceMetric": "euclidean", "weight": 0.7},
                        {"vectorSize": D2, "distanceMetric": "euclidean", "weight": 0.3},
                    ],
                },
            },
            "category": {"type": "string", "string": {"caseSensitive": False}},
        }
    )


def make_shard(path="") -> Shard:
    col = Collection(
        user_id="u1", id="cf", index_schema=fused_schema(), user_plan=UserPlan()
    )
    return Shard(open_store(path), col)


def make_points(n, offset=0):
    pts = []
    for i in range(n):
        x = offset + i
        data = {
            "embeds": [[float(x)] * D1, [float(x)] * D2],
            "category": ["alpha", "beta"][x % 2],
        }
        pts.append(Point.from_map(data, uuid.UUID(int=x + 1)))
    return pts


def fused_query(v1, v2, limit=5, weights=None, filter_=None):
    q = {
        "property": "embeds",
        "vectorFused": {
            "vectors": [v1, v2],
            "operator": "near",
            "limit": limit,
            **({"weights": weights} if weights else {}),
            **({"filter": filter_} if filter_ else {}),
        },
    }
    return q


def test_insert_and_search():
    shard = make_shard()
    pts = make_points(30)
    shard.insert_points(pts)
    res = shard.search_points(
        SearchRequest.from_dict(
            {"query": fused_query([3.0] * D1, [3.0] * D2), "limit": 5}
        )
    )
    assert len(res) == 5
    assert res[0].point.id == pts[3].id
    assert res[0].distance == pytest.approx(0.0, abs=1e-3)
    # Combined distance of the runner-up: 0.7*12 + 0.3*6 = 10.2 (unit gap
    # per dim in both views)
    assert res[1].distance == pytest.approx(10.2, rel=1e-3)


def test_weight_override_changes_ranking():
    shard = make_shard()
    pts = []
    # point A close in view 1, far in view 2; point B the reverse
    pts.append(
        Point.from_map(
            {"embeds": [[0.0] * D1, [10.0] * D2], "category": "alpha"},
            uuid.UUID(int=101),
        )
    )
    pts.append(
        Point.from_map(
            {"embeds": [[10.0] * D1, [0.0] * D2], "category": "beta"},
            uuid.UUID(int=102),
        )
    )
    shard.insert_points(pts)
    q1, q2 = [0.0] * D1, [0.0] * D2
    res = shard.search_points(
        SearchRequest.from_dict(
            {"query": fused_query(q1, q2, weights=[1.0, 0.01]), "limit": 2}
        )
    )
    assert res[0].point.id == pts[0].id  # view-1 wins
    res = shard.search_points(
        SearchRequest.from_dict(
            {"query": fused_query(q1, q2, weights=[0.01, 1.0]), "limit": 2}
        )
    )
    assert res[0].point.id == pts[1].id  # view-2 wins


def test_filtered_fused_search():
    shard = make_shard()
    shard.insert_points(make_points(20))
    res = shard.search_points(
        SearchRequest.from_dict(
            {
                "query": fused_query(
                    [4.0] * D1,
                    [4.0] * D2,
                    filter_={
                        "property": "category",
                        "string": {"value": "alpha", "operator": "equals"},
                    },
                ),
                "limit": 5,
                "select": ["*"],
            }
        )
    )
    assert len(res) == 5
    for r in res:
        assert r.point.as_map()["category"] == "alpha"


def test_update_delete_and_persistence(tmp_path):
    path = str(tmp_path / "fused.db")
    shard = make_shard(path)
    pts = make_points(12)
    shard.insert_points(pts)
    # update point 7's views
    up = Point.from_map(
        {"embeds": [[100.0] * D1, [100.0] * D2], "category": "alpha"}, pts[7].id
    )
    shard.update_points([up])
    res = shard.search_points(
        SearchRequest.from_dict(
            {"query": fused_query([100.0] * D1, [100.0] * D2, 1), "limit": 1}
        )
    )
    assert res[0].point.id == pts[7].id
    shard.delete_points([pts[3].id])
    shard.flush()
    shard.close()
    # reopen: snapshot + journal replay must restore the fused index
    shard2 = make_shard(path)
    res = shard2.search_points(
        SearchRequest.from_dict(
            {"query": fused_query([3.0] * D1, [3.0] * D2, 3), "limit": 3}
        )
    )
    got = {r.point.id for r in res}
    assert pts[3].id not in got
    assert pts[2].id in got or pts[4].id in got
    res = shard2.search_points(
        SearchRequest.from_dict(
            {"query": fused_query([100.0] * D1, [100.0] * D2, 1), "limit": 1}
        )
    )
    assert res[0].point.id == pts[7].id


def test_schema_rejects_bad_views():
    """check_compatible_map is the user-input gate (cluster actions call
    it before points reach a shard, actions.go parity)."""
    schema = fused_schema()
    with pytest.raises(ValidationError):
        schema.check_compatible_map({"embeds": [[1.0] * D1]})
    with pytest.raises(ValidationError):
        schema.check_compatible_map({"embeds": [[1.0] * D1, [1.0] * (D2 + 1)]})
    with pytest.raises(ValidationError):
        schema.check_compatible_map({"embeds": "nope"})
    with pytest.raises(ValidationError):
        schema.check_compatible_map({"embeds": [[1.0] * D1, ["x"] * D2]})
    # valid input is coerced to float lists in place
    m = {"embeds": [list(range(D1)), np.arange(D2)]}
    schema.check_compatible_map(m)
    assert m["embeds"][1] == [float(x) for x in range(D2)]


def test_query_validation():
    shard = make_shard()
    shard.insert_points(make_points(5))
    with pytest.raises(ValidationError):
        shard.search_points(
            SearchRequest.from_dict(
                {
                    "query": {
                        "property": "embeds",
                        "vectorFused": {
                            "vectors": [[1.0] * D1],  # one view only
                            "operator": "near",
                            "limit": 5,
                        },
                    },
                    "limit": 5,
                }
            )
        )
    with pytest.raises(ValidationError):
        shard.search_points(
            SearchRequest.from_dict(
                {
                    "query": fused_query(
                        [1.0] * D1, [1.0] * D2, weights=[0.5, 0.5, 0.5]
                    ),
                    "limit": 5,
                }
            )
        )
