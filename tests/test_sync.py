"""Startup sync tests: metadata re-homing and shard file shipping.

Mirrors cluster/sync.go behavior with a real two-node mesh.
"""

import uuid

import pytest

from semadb_tpu.cluster import ClusterNode, ClusterNodeConfig
from semadb_tpu.cluster.sync import sync
from semadb_tpu.models import Collection, IndexSchema, Point, SearchRequest, UserPlan


def schema():
    return IndexSchema.from_dict(
        {
            "vector": {
                "type": "vectorVamana",
                "vectorVamana": {
                    "vectorSize": 2,
                    "distanceMetric": "euclidean",
                    "searchSize": 36,
                    "degreeBound": 32,
                },
            }
        }
    )


def test_sync_rehomes_after_membership_change(tmp_path):
    # Phase 1: single node holds everything
    cfg_a = ClusterNodeConfig(root_dir=str(tmp_path / "a"), rpc_host="127.0.0.1", rpc_port=0)
    node_a = ClusterNode(cfg_a)
    node_a.serve()
    node_a.servers = [node_a.my_hostname]
    col = Collection(user_id="u1", id="c1", index_schema=schema(), user_plan=UserPlan())
    node_a.create_collection(col)
    pts = [
        Point.from_map({"vector": [float(i), float(i)]}, uuid.UUID(int=i + 1))
        for i in range(8)
    ]
    assert node_a.insert_points(col, pts) == []
    node_a.shard_manager.unload_all()  # flush shard files to disk

    # Phase 2: a second node joins; re-run sync on node A
    cfg_b = ClusterNodeConfig(root_dir=str(tmp_path / "b"), rpc_host="127.0.0.1", rpc_port=0)
    node_b = ClusterNode(cfg_b)
    node_b.serve()
    servers = [node_a.my_hostname, node_b.my_hostname]
    node_a.servers = servers
    node_b.servers = servers
    try:
        stats = sync(node_a)
        # Whatever re-homed must now be owned by its rendezvous owner and the
        # cluster must still answer queries from either node.
        col2 = node_b.get_collection("u1", "c1")
        sr = SearchRequest.from_dict(
            {
                "query": {
                    "property": "vector",
                    "vectorVamana": {
                        "vector": [4.0, 4.0],
                        "operator": "near",
                        "searchSize": 36,
                        "limit": 3,
                    },
                },
                "limit": 3,
            }
        )
        res = node_b.search_points(col2, sr)
        assert len(res) == 3
        assert res[0].point.id == pts[4].id
        # second sync is a no-op
        stats2 = sync(node_a)
        assert stats2 == {"collectionsMoved": 0, "shardsMoved": 0}
    finally:
        node_a.close()
        node_b.close()
