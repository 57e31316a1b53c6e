"""Model/schema validation tests.

Mirrors models-level checks exercised in the reference's httpapi/v2 handler
tests (invalid schema, vector size mismatch, query validation).
"""

import uuid

import pytest

from semadb_tpu.models import (
    IndexSchema,
    Point,
    Query,
    SearchRequest,
    ValidationError,
    extract_id_field,
)


def sample_schema() -> IndexSchema:
    """Exhaustive schema fixture mirroring shard/shard_vector_test.go:22-94."""
    return IndexSchema.from_dict(
        {
            "vector": {
                "type": "vectorVamana",
                "vectorVamana": {
                    "vectorSize": 2,
                    "distanceMetric": "euclidean",
                    "searchSize": 75,
                    "degreeBound": 64,
                    "alpha": 1.2,
                },
            },
            "flat": {
                "type": "vectorFlat",
                "vectorFlat": {"vectorSize": 2, "distanceMetric": "euclidean"},
            },
            "nested.vector": {
                "type": "vectorVamana",
                "vectorVamana": {
                    "vectorSize": 2,
                    "distanceMetric": "cosine",
                    "searchSize": 75,
                    "degreeBound": 64,
                    "alpha": 1.2,
                },
            },
            "description": {"type": "text", "text": {"analyser": "standard"}},
            "category": {"type": "string", "string": {"caseSensitive": False}},
            "labels": {"type": "stringArray", "stringArray": {"caseSensitive": False}},
            "size": {"type": "integer"},
            "price": {"type": "float"},
        }
    )


def test_schema_validate_ok():
    sample_schema().validate()


def test_schema_bad_type():
    with pytest.raises(ValidationError):
        IndexSchema.from_dict({"x": {"type": "wizardry"}}).validate()


def test_schema_missing_params():
    with pytest.raises(ValidationError):
        IndexSchema.from_dict({"x": {"type": "vectorVamana"}}).validate()


def test_schema_param_bounds():
    with pytest.raises(ValidationError):
        IndexSchema.from_dict(
            {
                "x": {
                    "type": "vectorVamana",
                    "vectorVamana": {
                        "vectorSize": 2,
                        "distanceMetric": "euclidean",
                        "searchSize": 10,  # below 25
                    },
                }
            }
        ).validate()
    with pytest.raises(ValidationError):
        IndexSchema.from_dict(
            {
                "x": {
                    "type": "vectorFlat",
                    "vectorFlat": {"vectorSize": 3, "distanceMetric": "haversine"},
                }
            }
        ).validate()


def test_check_compatible_map_coercion():
    schema = sample_schema()
    m = {
        "vector": [1, 2],
        "size": 42.0,
        "price": 2,
        "labels": ("a", "b"),
        "nested": {"vector": [0.5, 0.5]},
    }
    schema.check_compatible_map(m)
    assert m["vector"] == [1.0, 2.0]
    assert m["size"] == 42 and isinstance(m["size"], int)
    assert m["price"] == 2.0 and isinstance(m["price"], float)
    assert m["labels"] == ["a", "b"]
    assert m["nested"]["vector"] == [0.5, 0.5]


def test_check_compatible_map_errors():
    schema = sample_schema()
    with pytest.raises(ValidationError):
        schema.check_compatible_map({"vector": [1, 2, 3]})  # wrong size
    with pytest.raises(ValidationError):
        schema.check_compatible_map({"vector": "memes"})
    with pytest.raises(ValidationError):
        schema.check_compatible_map({"category": 5})
    with pytest.raises(ValidationError):
        schema.check_compatible_map({"labels": ["ok", 7]})
    # Missing properties are fine
    schema.check_compatible_map({"unrelated": 1})


def test_extract_id_field():
    u = uuid.uuid4()
    m = {"_id": str(u), "a": 1}
    assert extract_id_field(m, False) == u
    assert "_id" not in m
    assert isinstance(extract_id_field({}, True), uuid.UUID)
    with pytest.raises(ValidationError):
        extract_id_field({}, False)
    with pytest.raises(ValidationError):
        extract_id_field({"_id": 42}, False)
    with pytest.raises(ValidationError):
        extract_id_field({"_id": "not-a-uuid"}, False)


def test_point_roundtrip():
    u = uuid.uuid4()
    p = Point.from_map({"a": 1, "nested": {"b": [1.0, 2.0]}}, u)
    assert p.as_map() == {"a": 1, "nested": {"b": [1.0, 2.0]}}
    assert p.get_field("nested.b") == [1.0, 2.0]
    assert p.get_field("missing") is None


def test_query_validation():
    q = Query.from_dict(
        {
            "property": "vector",
            "vectorVamana": {
                "vector": [1.0, 2.0],
                "operator": "near",
                "searchSize": 75,
                "limit": 10,
            },
        }
    )
    q.validate()
    q.validate_schema(sample_schema())

    # Wrong vector length vs schema
    q2 = Query.from_dict(
        {
            "property": "vector",
            "vectorVamana": {"vector": [1.0], "operator": "near", "searchSize": 75, "limit": 10},
        }
    )
    with pytest.raises(ValidationError):
        q2.validate_schema(sample_schema())

    # Unknown property
    q3 = Query.from_dict(
        {"property": "nope", "integer": {"value": 1, "operator": "equals"}}
    )
    with pytest.raises(ValidationError):
        q3.validate_schema(sample_schema())


def test_query_and_or():
    q = Query.from_dict(
        {
            "property": "_and",
            "_and": [
                {"property": "size", "integer": {"value": 3, "operator": "greaterThan"}},
                {"property": "category", "string": {"value": "x", "operator": "equals"}},
            ],
        }
    )
    q.validate()
    q.validate_schema(sample_schema())
    with pytest.raises(ValidationError):
        Query.from_dict({"property": "_and"}).validate()


def test_query_id():
    u = str(uuid.uuid4())
    Query.from_dict({"property": "_id", "string": {"value": u, "operator": "equals"}}).validate()
    with pytest.raises(ValidationError):
        Query.from_dict(
            {"property": "_id", "string": {"value": "nope", "operator": "equals"}}
        ).validate()
    with pytest.raises(ValidationError):
        Query.from_dict(
            {"property": "_id", "string": {"value": u, "operator": "startsWith"}}
        ).validate()


def test_search_request():
    req = SearchRequest.from_dict(
        {
            "query": {
                "property": "size",
                "integer": {"value": 1, "operator": "equals"},
            },
            "limit": 10,
        }
    )
    req.validate()
    with pytest.raises(ValidationError):
        SearchRequest.from_dict(
            {
                "query": {"property": "size", "integer": {"value": 1, "operator": "equals"}},
                "limit": 0,
            }
        ).validate()
    with pytest.raises(ValidationError):
        SearchRequest.from_dict(
            {
                "query": {"property": "size", "integer": {"value": 1, "operator": "equals"}},
                "limit": 10,
                "offset": -1,
            }
        ).validate()


def test_range_validation():
    with pytest.raises(ValidationError):
        Query.from_dict(
            {
                "property": "size",
                "integer": {"value": 5, "operator": "inRange", "endValue": 3},
            }
        ).validate()
