"""HTTP API tests through a real server socket.

Mirrors httpapi/v2/handlers_test.go + v1/handlers_test.go: full CRUD+search
through HTTP with X-User-Id/X-Plan-Id headers, auth errors, quota, invalid
schema, nonexistent collection, msgpack bodies.
"""

import json
import uuid

import msgpack
import pytest
import requests

from semadb_tpu.cluster.node import ClusterNode, ClusterNodeConfig
from semadb_tpu.httpapi.server import HttpApiConfig, HttpServer
from semadb_tpu.models.collection import UserPlan

HEADERS = {"X-User-Id": "testy", "X-Plan-Id": "BASIC"}


@pytest.fixture()
def server(tmp_path):
    node = ClusterNode(
        ClusterNodeConfig(root_dir=str(tmp_path), rpc_host="127.0.0.1", rpc_port=0)
    )
    node.serve()
    cfg = HttpApiConfig(
        http_host="127.0.0.1",
        http_port=0,
        user_plans={"BASIC": UserPlan(name="BASIC", max_collections=2)},
    )
    srv = HttpServer(node, cfg)
    srv.serve_background()
    yield f"http://127.0.0.1:{srv.port}"
    srv.shutdown()
    node.close()


def make_collection(base, cid="mycol"):
    return requests.post(
        f"{base}/v2/collections",
        json={
            "id": cid,
            "indexSchema": {
                "vector": {
                    "type": "vectorVamana",
                    "vectorVamana": {
                        "vectorSize": 2,
                        "distanceMetric": "euclidean",
                        "searchSize": 36,
                        "degreeBound": 32,
                    },
                },
                "size": {"type": "integer"},
            },
        },
        headers=HEADERS,
    )


def test_auth_required(server):
    r = requests.get(f"{server}/v2/collections")
    assert r.status_code == 400
    assert "X-User-Id" in r.json()["error"]
    r2 = requests.get(
        f"{server}/v2/collections", headers={"X-User-Id": "u", "X-Plan-Id": "NOPE"}
    )
    assert r2.status_code == 400
    assert "unknown user plan" in r2.json()["error"]


def test_v1_ping_no_auth(server):
    r = requests.get(f"{server}/v1/ping")
    assert r.status_code == 200
    assert "pong" in r.json()["message"]


def test_v2_ping_no_auth(server):
    # handlers.go:32: v2 exposes /ping as well
    r = requests.get(f"{server}/v2/ping")
    assert r.status_code == 200
    assert "pong" in r.json()["message"]


def test_collection_crud(server):
    assert make_collection(server).status_code == 200
    # duplicate
    assert make_collection(server).status_code == 409
    # invalid id
    r = requests.post(
        f"{server}/v2/collections",
        json={"id": "x", "indexSchema": {}},
        headers=HEADERS,
    )
    assert r.status_code == 400
    # invalid schema
    r = requests.post(
        f"{server}/v2/collections",
        json={"id": "badschema", "indexSchema": {"x": {"type": "wat"}}},
        headers=HEADERS,
    )
    assert r.status_code == 400
    # quota: max 2 collections
    assert make_collection(server, "second").status_code == 200
    assert make_collection(server, "third").status_code == 403
    # list
    r = requests.get(f"{server}/v2/collections", headers=HEADERS)
    assert {c["id"] for c in r.json()["collections"]} == {"mycol", "second"}
    # get
    r = requests.get(f"{server}/v2/collections/mycol", headers=HEADERS)
    assert r.status_code == 200
    assert r.json()["indexSchema"]["vector"]["type"] == "vectorVamana"
    # unknown
    assert (
        requests.get(f"{server}/v2/collections/ghost", headers=HEADERS).status_code
        == 404
    )
    # delete
    assert (
        requests.delete(f"{server}/v2/collections/second", headers=HEADERS).status_code
        == 200
    )
    r = requests.get(f"{server}/v2/collections", headers=HEADERS)
    assert {c["id"] for c in r.json()["collections"]} == {"mycol"}


def test_point_crud_and_search(server):
    make_collection(server)
    points = [{"vector": [float(i), float(i)], "size": i} for i in range(20)]
    points[0]["_id"] = str(uuid.UUID(int=99))
    r = requests.post(
        f"{server}/v2/collections/mycol/points", json={"points": points}, headers=HEADERS
    )
    assert r.status_code == 200, r.text
    assert r.json()["failedRanges"] == []

    # search
    r = requests.post(
        f"{server}/v2/collections/mycol/points/search",
        json={
            "query": {
                "property": "vector",
                "vectorVamana": {
                    "vector": [5.0, 5.0],
                    "operator": "near",
                    "searchSize": 36,
                    "limit": 3,
                },
            },
            "limit": 3,
            "select": ["*"],
        },
        headers=HEADERS,
    )
    assert r.status_code == 200, r.text
    pts = r.json()["points"]
    assert len(pts) == 3
    assert pts[0]["size"] == 5
    assert pts[0]["_distance"] == pytest.approx(0.0, abs=1e-5)
    assert "_id" in pts[0] and "_hybridScore" in pts[0]

    # update with explicit _id
    r = requests.put(
        f"{server}/v2/collections/mycol/points",
        json={"points": [{"_id": str(uuid.UUID(int=99)), "size": 1000}]},
        headers=HEADERS,
    )
    assert r.status_code == 200 and r.json()["failedPoints"] == []

    # delete
    r = requests.delete(
        f"{server}/v2/collections/mycol/points",
        json={"ids": [str(uuid.UUID(int=99))]},
        headers=HEADERS,
    )
    assert r.status_code == 200 and r.json()["failedPoints"] == []

    # invalid insert: wrong vector size
    r = requests.post(
        f"{server}/v2/collections/mycol/points",
        json={"points": [{"vector": [1.0, 2.0, 3.0]}]},
        headers=HEADERS,
    )
    assert r.status_code == 400


def test_msgpack_roundtrip(server):
    make_collection(server)
    body = msgpack.packb(
        {"points": [{"vector": [1.0, 1.0], "size": 7}]}, use_bin_type=True
    )
    r = requests.post(
        f"{server}/v2/collections/mycol/points",
        data=body,
        headers={**HEADERS, "Content-Type": "application/msgpack",
                 "Accept": "application/msgpack"},
    )
    assert r.status_code == 200
    out = msgpack.unpackb(r.content, raw=False)
    assert out["failedRanges"] == []


def test_v1_flow(server):
    r = requests.post(
        f"{server}/v1/collections",
        json={"id": "v1col", "vectorSize": 2, "distanceMetric": "euclidean"},
        headers=HEADERS,
    )
    assert r.status_code == 200, r.text
    r = requests.post(
        f"{server}/v1/collections/v1col/points",
        json={
            "points": [
                {"vector": [float(i), float(i)], "metadata": {"n": i}} for i in range(10)
            ]
        },
        headers=HEADERS,
    )
    assert r.status_code == 200, r.text
    r = requests.post(
        f"{server}/v1/collections/v1col/points/search",
        json={"vector": [4.0, 4.0], "limit": 2},
        headers=HEADERS,
    )
    assert r.status_code == 200, r.text
    pts = r.json()["points"]
    assert pts[0]["metadata"]["n"] == 4
    # v1 list shows v1 collections with their metric
    r = requests.get(f"{server}/v1/collections", headers=HEADERS)
    assert r.json()["collections"][0]["distanceMetric"] == "euclidean"


def test_haversine_e2e(server):
    """Geo search over [lat, lon] degrees through HTTP (ROADMAP item: e2e
    coverage for the haversine metric, unit-tested in ops only before).

    Mirrors the reference's haversine support (distance/distance.go:16-67,
    models/index.go vector size 2 check) end to end: flat exact search and
    vamana graph search must both rank Paris nearest to London with a
    great-circle distance in meters.
    """
    cities = {
        "london": [51.5074, -0.1278],
        "paris": [48.8566, 2.3522],
        "berlin": [52.52, 13.405],
        "madrid": [40.4168, -3.7038],
        "newyork": [40.7128, -74.0060],
        "tokyo": [35.6762, 139.6503],
    }
    r = requests.post(
        f"{server}/v2/collections",
        json={
            "id": "geo",
            "indexSchema": {
                "loc": {
                    "type": "vectorFlat",
                    "vectorFlat": {"vectorSize": 2, "distanceMetric": "haversine"},
                },
                "locGraph": {
                    "type": "vectorVamana",
                    "vectorVamana": {
                        "vectorSize": 2,
                        "distanceMetric": "haversine",
                        "searchSize": 36,
                        "degreeBound": 32,
                    },
                },
                "name": {"type": "string", "string": {"caseSensitive": False}},
            },
        },
        headers=HEADERS,
    )
    assert r.status_code == 200, r.text
    pts = [{"loc": v, "locGraph": v, "name": k} for k, v in cities.items()]
    r = requests.post(
        f"{server}/v2/collections/geo/points", json={"points": pts}, headers=HEADERS
    )
    assert r.status_code == 200, r.text

    # haversine vector size != 2 is rejected at schema level
    bad = requests.post(
        f"{server}/v2/collections",
        json={
            "id": "geobad",
            "indexSchema": {
                "loc": {
                    "type": "vectorFlat",
                    "vectorFlat": {"vectorSize": 3, "distanceMetric": "haversine"},
                }
            },
        },
        headers=HEADERS,
    )
    assert bad.status_code == 400

    for prop, opts_key in (("loc", "vectorFlat"), ("locGraph", "vectorVamana")):
        opts = {"vector": cities["london"], "operator": "near", "limit": 3}
        if opts_key == "vectorVamana":
            opts["searchSize"] = 36
        r = requests.post(
            f"{server}/v2/collections/geo/points/search",
            json={"query": {"property": prop, opts_key: opts}, "limit": 3,
                  "select": ["*"]},
            headers=HEADERS,
        )
        assert r.status_code == 200, r.text
        got = r.json()["points"]
        assert [p["name"] for p in got] == ["london", "paris", "berlin"], prop
        assert got[0]["_distance"] == pytest.approx(0.0, abs=1.0)
        # London–Paris great-circle distance is ~344 km
        assert 330_000 < got[1]["_distance"] < 360_000, prop


def test_fused_e2e(server):
    """vectorFused through the v2 HTTP surface: multi-view insert, exact
    weighted-fusion search, per-query weight overrides."""
    r = requests.post(
        f"{server}/v2/collections",
        json={
            "id": "fusedcol",
            "indexSchema": {
                "embeds": {
                    "type": "vectorFused",
                    "vectorFused": {
                        "views": [
                            {"vectorSize": 4, "distanceMetric": "euclidean", "weight": 0.7},
                            {"vectorSize": 2, "distanceMetric": "euclidean", "weight": 0.3},
                        ],
                    },
                },
            },
        },
        headers=HEADERS,
    )
    assert r.status_code == 200, r.text
    points = [
        {"embeds": [[float(i)] * 4, [float(i)] * 2], "_id": str(uuid.UUID(int=i + 1))}
        for i in range(10)
    ]
    r = requests.post(
        f"{server}/v2/collections/fusedcol/points",
        json={"points": points},
        headers=HEADERS,
    )
    assert r.status_code == 200, r.text
    assert r.json()["failedRanges"] == []

    r = requests.post(
        f"{server}/v2/collections/fusedcol/points/search",
        json={
            "query": {
                "property": "embeds",
                "vectorFused": {
                    "vectors": [[4.0] * 4, [4.0] * 2],
                    "operator": "near",
                    "limit": 3,
                },
            },
            "limit": 3,
        },
        headers=HEADERS,
    )
    assert r.status_code == 200, r.text
    pts = r.json()["points"]
    assert len(pts) == 3
    assert pts[0]["_id"] == str(uuid.UUID(int=5))
    assert pts[0]["_distance"] == pytest.approx(0.0, abs=1e-3)
    # combined distance to the runner-up: 0.7*4 + 0.3*2 = 3.4
    assert pts[1]["_distance"] == pytest.approx(3.4, rel=1e-3)

    # per-query weight override flips which view dominates
    r = requests.post(
        f"{server}/v2/collections/fusedcol/points/search",
        json={
            "query": {
                "property": "embeds",
                "vectorFused": {
                    "vectors": [[0.0] * 4, [9.0] * 2],
                    "operator": "near",
                    "weights": [0.01, 1.0],
                    "limit": 1,
                },
            },
            "limit": 1,
        },
        headers=HEADERS,
    )
    assert r.status_code == 200, r.text
    assert r.json()["points"][0]["_id"] == str(uuid.UUID(int=10))

    # wrong view count rejected
    r = requests.post(
        f"{server}/v2/collections/fusedcol/points",
        json={"points": [{"embeds": [[1.0] * 4]}]},
        headers=HEADERS,
    )
    assert r.status_code == 400


def test_batch_search(server):
    """Beyond-reference batch endpoint: N queries per call, responses in
    request order and identical to N single-query calls."""
    assert make_collection(server, "bat").status_code == 200
    pts = [
        {"_id": str(uuid.uuid5(uuid.NAMESPACE_URL, str(i))),
         "vector": [float(i), float(i)], "size": i}
        for i in range(40)
    ]
    r = requests.post(
        f"{server}/v2/collections/bat/points", json={"points": pts},
        headers=HEADERS,
    )
    assert r.status_code == 200, r.text
    queries = [
        {"query": {"property": "vector",
                   "vectorVamana": {"vector": [float(i), float(i)],
                                     "operator": "near", "searchSize": 36,
                                     "limit": 3}},
         "limit": 3, "select": ["*"]}
        for i in (3, 17, 31)
    ]
    rb = requests.post(
        f"{server}/v2/collections/bat/points/search/batch",
        json={"queries": queries}, headers=HEADERS,
    )
    assert rb.status_code == 200, rb.text
    results = rb.json()["results"]
    assert len(results) == 3
    for qi, i in enumerate((3, 17, 31)):
        got = results[qi]["points"]
        assert got and got[0]["size"] == i and got[0]["_distance"] < 1e-6
        # identical to the single-query endpoint
        rs = requests.post(
            f"{server}/v2/collections/bat/points/search",
            json=queries[qi], headers=HEADERS,
        )
        assert [p["_id"] for p in rs.json()["points"]] == [
            p["_id"] for p in got
        ]
    # validation: empty list and over-cap rejected
    r = requests.post(
        f"{server}/v2/collections/bat/points/search/batch",
        json={"queries": []}, headers=HEADERS,
    )
    assert r.status_code == 400
    # heterogeneous batches still work (per-query fallback path)
    mixed = [
        queries[0],
        {"query": {"property": "size",
                   "integer": {"operator": "equals", "value": 17}},
         "limit": 5, "select": ["*"]},
    ]
    rm = requests.post(
        f"{server}/v2/collections/bat/points/search/batch",
        json={"queries": mixed}, headers=HEADERS,
    )
    assert rm.status_code == 200, rm.text
    mres = rm.json()["results"]
    assert mres[0]["points"][0]["size"] == 3
    assert [p["size"] for p in mres[1]["points"]] == [17]


def test_packed_vector_query(server):
    """Query vectors may arrive as packed little-endian f32 msgpack bin;
    results must equal the float-list encoding."""
    import numpy as np

    assert make_collection(server, "packed").status_code == 200
    pts = [
        {"_id": str(uuid.uuid5(uuid.NAMESPACE_URL, f"p{i}")),
         "vector": [float(i), float(-i)], "size": i}
        for i in range(30)
    ]
    r = requests.post(
        f"{server}/v2/collections/packed/points", json={"points": pts},
        headers=HEADERS,
    )
    assert r.status_code == 200, r.text
    qv = np.array([7.0, -7.0], np.float32)
    body = msgpack.packb({
        "query": {"property": "vector",
                  "vectorVamana": {"vector": qv.tobytes(), "operator": "near",
                                    "searchSize": 36, "limit": 3}},
        "limit": 3,
        "select": ["*"],
    })
    h = dict(HEADERS, **{"Content-Type": "application/msgpack",
                         "Accept": "application/msgpack"})
    rb = requests.post(
        f"{server}/v2/collections/packed/points/search", data=body, headers=h
    )
    assert rb.status_code == 200, rb.text
    got = msgpack.unpackb(rb.content, raw=False)["points"]
    rj = requests.post(
        f"{server}/v2/collections/packed/points/search",
        json={"query": {"property": "vector",
                        "vectorVamana": {"vector": [7.0, -7.0],
                                          "operator": "near",
                                          "searchSize": 36, "limit": 3}},
              "limit": 3},
        headers=HEADERS,
    )
    assert [p["_id"] for p in got] == [p["_id"] for p in rj.json()["points"]]
    assert got[0]["size"] == 7
